package graft.sql

import graft.table.IceLite
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}

/**
 * SQL `MERGE INTO` surface for IceLite tables — the statement-level analog
 * of the typed `table.merge(...)` API, injected via
 * `SparkSessionExtensions.injectParser` (see [[graft.GraftExtensions]]).
 *
 * Grammar (deliberately scoped to the engine's merge contract — the change
 * source must produce `(key, op, lsn, after)` columns, exactly like the
 * DataFrame API):
 *
 * {{{
 *   MERGE INTO icelite.`/path/to/table` USING (<query>) EPOCH '<stream/epoch>'
 * }}}
 *
 * Everything else passes through to the delegate parser untouched. Returns
 * one row of commit stats; a re-delivered epoch key is the usual
 * exactly-once no-op.
 */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val mergePattern =
    """(?is)^\s*MERGE\s+INTO\s+icelite\s*\.\s*`([^`]+)`\s+USING\s*\((.+)\)\s+EPOCH\s+'([^']+)'\s*;?\s*$""".r

  /** `ALTER TABLE icelite.`/path` RENAME COLUMN old TO new` — the SQL
    * surface of [[graft.table.IceLiteTable.renameColumn]] (metadata-only). */
  private val renamePattern =
    """(?is)^\s*ALTER\s+TABLE\s+icelite\s*\.\s*`([^`]+)`\s+RENAME\s+COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s+TO\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r

  /** `ALTER TABLE icelite.`/path` DROP COLUMN x` — the SQL surface of
    * [[graft.table.IceLiteTable.dropColumn]] (metadata-only). */
  private val dropPattern =
    """(?is)^\s*ALTER\s+TABLE\s+icelite\s*\.\s*`([^`]+)`\s+DROP\s+COLUMN\s+([A-Za-z_][A-Za-z0-9_]*)\s*;?\s*$""".r

  /** `ALTER TABLE icelite.`/path` SET TBLPROPERTIES ('k'='v', ...)` and
    * `... UNSET TBLPROPERTIES ('k', ...)` — the SQL surface of
    * [[graft.table.IceLiteTable.alterProperties]] (metadata-only). */
  private val setPropsPattern =
    """(?is)^\s*ALTER\s+TABLE\s+icelite\s*\.\s*`([^`]+)`\s+SET\s+TBLPROPERTIES\s*\(([^)]+)\)\s*;?\s*$""".r
  private val unsetPropsPattern =
    """(?is)^\s*ALTER\s+TABLE\s+icelite\s*\.\s*`([^`]+)`\s+UNSET\s+TBLPROPERTIES\s*\(([^)]+)\)\s*;?\s*$""".r
  private val propPair = """'([^']*)'\s*=\s*'([^']*)'""".r
  private val propKey = """'([^']*)'""".r

  /** `CREATE TABLE icelite.`/path` (<columns>) KEY <col> [BUCKETS <n>]
    * [TBLPROPERTIES ('k'='v', ...)]` — table creation without the Scala
    * API ([[graft.table.IceLite.create]]). The column list parses through
    * Spark's own schema grammar (`parseTableSchema`), so every Spark type
    * works; KEY names the merge-identity column and BUCKETS the hash
    * layout (default 16). The lazy column match is anchored on `) KEY`, so
    * parenthesized types (DECIMAL(10,2)) inside the list stay intact. */
  private val createPattern =
    """(?is)^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?icelite\s*\.\s*`([^`]+)`\s*\((.+?)\)\s+KEY\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+BUCKETS\s+(\d+))?(?:\s+TBLPROPERTIES\s*\(([^)]*)\))?\s*;?\s*$""".r
  private val ifNotExistsPattern = """(?is)^\s*CREATE\s+TABLE\s+IF\s+NOT\s+EXISTS\b.*""".r

  /** A statement that TARGETS an icelite table with one of this parser's
    * scoped verbs but does not match its full grammar. Without this guard
    * such a statement fell through to the delegate parser and died there
    * with a confusing unrelated error (e.g. "table not found: icelite");
    * known grammar restrictions that trigger it: a TBLPROPERTIES value
    * containing `)`, a column comment containing `) KEY`, a MERGE source
    * subquery containing the literal `) EPOCH '`. */
  private val iceliteDdlPrefix =
    """(?is)^\s*(?:CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?|ALTER\s+TABLE\s+|MERGE\s+INTO\s+|OPTIMIZE\s+|VACUUM\s+|(?:DESCRIBE|DESC)\s+(?:TABLE\s+)?)icelite\s*\.\s*`.*""".r

  /** `DESCRIBE [TABLE] icelite.`/path`` — schema + layout + properties in
    * the familiar DESCRIBE shape. */
  private val describePattern =
    """(?is)^\s*(?:DESCRIBE|DESC)\s+(?:TABLE\s+)?icelite\s*\.\s*`([^`]+)`\s*;?\s*$""".r

  /** `OPTIMIZE icelite.`/path`` (small-file compaction) and
    * `OPTIMIZE icelite.`/path` ZORDER BY (a, b)` (multi-column clustering
    * rewrite) — SQL surfaces of [[graft.table.IceLiteTable.compactSmallFiles]]
    * and [[graft.table.IceLiteTable.clusterZOrder]]. */
  private val optimizePattern =
    """(?is)^\s*OPTIMIZE\s+icelite\s*\.\s*`([^`]+)`\s*(?:ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*$""".r

  /** `VACUUM icelite.`/path` [RETAIN <n> SNAPSHOTS]` — expire old snapshots
    * and reap unreferenced files ([[graft.table.IceLiteTable.expireSnapshots]]
    * + [[graft.table.IceLiteTable.vacuum]]). */
  private val vacuumPattern =
    """(?is)^\s*VACUUM\s+icelite\s*\.\s*`([^`]+)`\s*(?:RETAIN\s+(\d+)\s+SNAPSHOTS)?\s*;?\s*$""".r

  /** Route DELETE/UPDATE on `icelite.\`/path\`` to the table's DML methods;
    * Spark's own parser supplies the grammar (conditions and assignment
    * expressions arrive unresolved and resolve against the live scan at
    * execution), so the full SQL expression language works in WHERE/SET. */
  private def interceptDml(plan: LogicalPlan): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, UpdateTable}
    def rootOf(t: LogicalPlan): Option[String] = t match {
      case r: UnresolvedRelation if r.multipartIdentifier.size == 2 &&
        r.multipartIdentifier.head.equalsIgnoreCase("icelite") =>
        Some(r.multipartIdentifier(1))
      case _ => None
    }
    plan match {
      case d: DeleteFromTable =>
        rootOf(d.table).map(DeleteIceLiteCommand(_, RawExpr(d.condition))).getOrElse(plan)
      case u: UpdateTable =>
        rootOf(u.table).map { root =>
          val set = u.assignments.map { a =>
            val name = a.key match {
              case att: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
                if att.nameParts.size == 1 => att.nameParts.head
              case other => throw new IllegalArgumentException(
                s"UPDATE icelite: only top-level column assignments are supported, got $other")
            }
            name -> RawExpr(a.value)
          }
          UpdateIceLiteCommand(root, set, u.condition.map(RawExpr))
        }.getOrElse(plan)
      case p => p
    }
  }

  override def parsePlan(sqlText: String): LogicalPlan = sqlText match {
    case mergePattern(root, sourceSql, epochKey) =>
      MergeIntoIceLiteCommand(root, delegate.parsePlan(sourceSql), epochKey)
    case renamePattern(root, from, to) =>
      RenameColumnIceLiteCommand(root, from, to)
    case dropPattern(root, name) =>
      DropColumnIceLiteCommand(root, name)
    case setPropsPattern(root, pairs) =>
      val set = propPair.findAllMatchIn(pairs).map(m => m.group(1) -> m.group(2)).toMap
      if (set.isEmpty) throw new IllegalArgumentException(
        s"SET TBLPROPERTIES: no 'key'='value' pairs in ($pairs)")
      AlterPropertiesIceLiteCommand(root, set, Nil)
    case unsetPropsPattern(root, keys) =>
      val unset = propKey.findAllMatchIn(keys).map(_.group(1)).toList
      if (unset.isEmpty) throw new IllegalArgumentException(
        s"UNSET TBLPROPERTIES: no 'key' entries in ($keys)")
      AlterPropertiesIceLiteCommand(root, Map.empty, unset)
    case createPattern(root, colDefs, key, buckets, props) =>
      val schema = delegate.parseTableSchema(colDefs)
      val properties = Option(props)
        .map(p => propPair.findAllMatchIn(p).map(m => m.group(1) -> m.group(2)).toMap)
        .getOrElse(Map.empty[String, String])
      CreateIceLiteCommand(root, schema, key,
        Option(buckets).map(_.toInt).getOrElse(16), properties,
        ifNotExists = ifNotExistsPattern.matches(sqlText))
    case describePattern(root) =>
      DescribeIceLiteCommand(root)
    case optimizePattern(root, zorderCols) =>
      val cols = Option(zorderCols).map(_.split(",").map(_.trim.stripPrefix("`")
        .stripSuffix("`")).filter(_.nonEmpty).toSeq).getOrElse(Nil)
      OptimizeIceLiteCommand(root, cols)
    case vacuumPattern(root, retain) =>
      VacuumIceLiteCommand(root, Option(retain).map(_.toInt).getOrElse(1))
    case stmt if iceliteDdlPrefix.matches(stmt) =>
      throw new IllegalArgumentException(
        "statement targets an icelite table but does not match the scoped icelite " +
          "grammar; supported forms: CREATE TABLE icelite.`p` (cols) KEY k [BUCKETS n] " +
          "[TBLPROPERTIES ('k'='v',...)] | ALTER TABLE icelite.`p` RENAME COLUMN a TO b " +
          "| DROP COLUMN c | SET/UNSET TBLPROPERTIES (...) | MERGE INTO icelite.`p` " +
          "USING (<query>) EPOCH 'e' | OPTIMIZE icelite.`p` [ZORDER BY (cols)] | " +
          "VACUUM icelite.`p` [RETAIN n SNAPSHOTS] | DESCRIBE icelite.`p`. " +
          "Known restrictions: TBLPROPERTIES values must not contain ')', column " +
          "comments must not contain ') KEY', and the MERGE source must not contain " +
          "the literal \") EPOCH '\" — statement: " + stmt.trim.take(200))
    case _ => interceptDml(delegate.parsePlan(sqlText))
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier = delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier = delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] = delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
}

/**
 * Eagerly-executed command: analyze the source query, run the MERGE, return
 * the commit stats. The source plan rides as a constructor argument (not a
 * child) and is analyzed through `Dataset.ofRows` at execution, which keeps
 * the command itself a leaf for the analyzer.
 */
case class MergeIntoIceLiteCommand(root: String, source: LogicalPlan, epochKey: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("epoch", StringType, nullable = false)(),
    AttributeReference("inserted", LongType, nullable = false)(),
    AttributeReference("updated", LongType, nullable = false)(),
    AttributeReference("deleted", LongType, nullable = false)(),
    AttributeReference("carried", LongType, nullable = false)(),
    AttributeReference("stale", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val table = IceLite.load(sparkSession, root)
    val changes = org.apache.spark.sql.graftbridge.Exprs.ofRows(sparkSession, source)
    val stats = table.merge(changes, epochKey)
    Seq(Row(stats.epochKey, stats.inserted, stats.updated, stats.deleted, stats.carried, stats.stale))
  }
}

/** `ALTER TABLE icelite.`/path` RENAME COLUMN a TO b`: metadata-only rename
  * evolution ([[graft.table.IceLiteTable.renameColumn]]); returns the
  * committed version. */
case class RenameColumnIceLiteCommand(root: String, from: String, to: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] =
    Seq(Row(IceLite.load(sparkSession, root).renameColumn(from, to)))
}

/** `ALTER TABLE icelite.`/path` DROP COLUMN x`: metadata-only drop
  * evolution ([[graft.table.IceLiteTable.dropColumn]]); returns the
  * committed version. */
case class DropColumnIceLiteCommand(root: String, name: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] =
    Seq(Row(IceLite.load(sparkSession, root).dropColumn(name)))
}

/** `ALTER TABLE icelite.`/path` SET|UNSET TBLPROPERTIES (...)`:
  * metadata-only property evolution
  * ([[graft.table.IceLiteTable.alterProperties]]); returns the committed
  * version. */
case class AlterPropertiesIceLiteCommand(root: String, set: Map[String, String],
                                         unset: Seq[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] =
    Seq(Row(IceLite.load(sparkSession, root).alterProperties(set, unset)))
}

/** Opaque expression holder: the DML conditions/assignments arrive
  * UNRESOLVED (they resolve against the table's live scan only inside
  * `run`), but `QueryPlan.expressions` reflects over constructor args and
  * CheckAnalysis would reject the command for carrying an unresolved
  * Expression before it ever executes. A non-Expression wrapper keeps them
  * out of that traversal — same trick as MergeIntoIceLiteCommand holding
  * its source as a non-child constructor arg. */
case class RawExpr(e: Expression)

/** `DELETE FROM icelite.`/path` WHERE <cond>`: row-level correction through
  * the merge path ([[graft.table.IceLiteTable.deleteWhere]]); returns the
  * commit stats row. The condition resolves against the table's live scan
  * at execution. */
case class DeleteIceLiteCommand(root: String, condition: RawExpr)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("epoch", StringType, nullable = false)(),
    AttributeReference("deleted", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val stats = IceLite.load(sparkSession, root)
      .deleteWhere(org.apache.spark.sql.graftbridge.Exprs.column(condition.e))
    Seq(Row(stats.epochKey, stats.deleted))
  }
}

/** `UPDATE icelite.`/path` SET a = <expr>, ... WHERE <cond>`: row-level
  * correction through the merge path
  * ([[graft.table.IceLiteTable.updateWhere]]); returns the commit stats
  * row. Assignment expressions may reference the row's current values. */
case class UpdateIceLiteCommand(root: String, set: Seq[(String, RawExpr)],
                                condition: Option[RawExpr])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("epoch", StringType, nullable = false)(),
    AttributeReference("updated", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.graftbridge.Exprs
    val cond = condition.map(c => Exprs.column(c.e))
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    val stats = IceLite.load(sparkSession, root)
      .updateWhere(set.map { case (k, v) => k -> Exprs.column(v.e) }, cond)
    // every DML event targets an existing live row: COW classifies them as
    // updates, MOR (delta append, no target join) as upserts — sum both
    Seq(Row(stats.epochKey, stats.updated + stats.inserted))
  }
}

/** `CREATE TABLE icelite.`/path` (cols) KEY k [BUCKETS n]
  * [TBLPROPERTIES (...)]`: creates the table
  * ([[graft.table.IceLite.create]]); returns the created version (0).
  * With IF NOT EXISTS an existing table is left untouched and its current
  * version returns instead. */
case class CreateIceLiteCommand(root: String, tableSchema: StructType, keyColumn: String,
                                numBuckets: Int, properties: Map[String, String],
                                ifNotExists: Boolean)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    if (IceLite.exists(root)) {
      if (!ifNotExists) throw new IllegalArgumentException(
        s"CREATE TABLE: icelite table already exists at $root (use IF NOT EXISTS)")
      Seq(Row(IceLite.load(sparkSession, root).snapshot.version))
    } else {
      val t = IceLite.create(sparkSession, root, tableSchema, keyColumn, numBuckets, properties)
      Seq(Row(t.snapshot.version))
    }
  }
}

/** `DESCRIBE [TABLE] icelite.`/path``: one row per column plus layout and
  * property rows, in the familiar DESCRIBE shape. */
case class DescribeIceLiteCommand(root: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("col_name", StringType, nullable = false)(),
    AttributeReference("data_type", StringType, nullable = false)(),
    AttributeReference("comment", StringType, nullable = true)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val s = IceLite.load(sparkSession, root).snapshot
    val cols = s.schema.fields.toSeq.map(f =>
      Row(f.name, f.dataType.simpleString,
        if (f.name == s.keyColumn) "key" else null))
    val layout = Seq(
      Row("# version", s.version.toString, null),
      Row("# key", s.keyColumn, null),
      Row("# buckets", s.numBuckets.toString, null),
      Row("# write.mode", s.writeMode, null))
    val props = s.properties.toSeq.sortBy(_._1).map { case (k, v) =>
      Row(s"# property:$k", v, null) }
    cols ++ layout ++ props
  }
}

/** `OPTIMIZE icelite.`/path` [ZORDER BY (a, b)]`: small-file compaction, or
  * a multi-column Z-order clustering rewrite when columns are given;
  * returns the number of rewritten files. */
case class OptimizeIceLiteCommand(root: String, zorderColumns: Seq[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("rewritten", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val table = IceLite.load(sparkSession, root)
    val n = if (zorderColumns.nonEmpty) table.clusterZOrder(zorderColumns)
            else table.compactSmallFiles().size
    Seq(Row(n.toLong))
  }
}

/** `VACUUM icelite.`/path` [RETAIN <n> SNAPSHOTS]`: expire history beyond
  * the retention horizon, then reap unreferenced data files and orphaned
  * manifests; returns (expired snapshots, reaped files). */
case class VacuumIceLiteCommand(root: String, retainSnapshots: Int)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("expired_snapshots", LongType, nullable = false)(),
    AttributeReference("reaped_files", LongType, nullable = false)())

  override def run(sparkSession: SparkSession): Seq[Row] = {
    val table = IceLite.load(sparkSession, root)
    val expired = table.expireSnapshots(retainSnapshots)
    val reaped = table.vacuum(retainSnapshots)
    Seq(Row(expired.toLong, reaped.toLong))
  }
}
