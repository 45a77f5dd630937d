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
    case _ => delegate.parsePlan(sqlText)
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
