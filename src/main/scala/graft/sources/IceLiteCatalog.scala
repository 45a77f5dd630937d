package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.table.IceLite

/**
 * V2 `TableCatalog` for IceLite tables — the STANDARD Spark SQL surface:
 *
 * {{{
 *   spark.sql.catalog.graft           = graft.sources.IceLiteCatalog
 *   spark.sql.catalog.graft.warehouse = /data/warehouse
 *
 *   CREATE TABLE graft.ns.t (doc_id STRING, tokens ARRAY<INT>, n_tok INT)
 *     TBLPROPERTIES ('key'='doc_id', 'buckets'='16', 'write.mode'='mor');
 *   INSERT INTO graft.ns.t SELECT ...;              -- upsert by LWW
 *   SELECT * FROM graft.ns.t;                       -- resolved live rows
 *   SELECT * FROM graft.ns.t VERSION AS OF 3;       -- time travel (or a tag)
 *   DELETE FROM graft.ns.t WHERE n_tok > 100;       -- merge-path correction
 *   ALTER TABLE graft.ns.t RENAME COLUMN a TO b;    -- metadata-only
 *   ALTER TABLE graft.ns.t ADD COLUMN score DOUBLE; -- metadata-only
 *   SHOW TABLES IN graft.ns; DESCRIBE graft.ns.t; DROP TABLE graft.ns.t;
 * }}}
 *
 * Identifier `ns.t` maps to `<warehouse>/ns/t`; a namespace is a warehouse
 * subdirectory, a table is a directory holding IceLite `meta/`. Spark's own
 * parser and analyzer drive everything — this catalog replaces the scoped
 * regex grammar (`GraftSqlParser`) for standard statements; the regex path
 * remains only for the engine-specific `MERGE ... EPOCH` / OPTIMIZE /
 * VACUUM verbs and path-addressed (`icelite.`) tables.
 *
 * Scale posture: every operation here is driver-side metadata (directory
 * listing, snapshot JSON read, optimistic metadata commit). Data movement
 * happens only through the returned [[IceLiteSparkTable]]'s scan/write,
 * which carry the connector's pruning and bounded-resolve guarantees.
 */
class IceLiteCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  private def spark: SparkSession = SparkSession.active
  private def hconf = spark.sessionState.newHadoopConf()
  private def fs = graft.table.IceLite.fsFor(new Path(warehouse), hconf)

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).map(_.stripSuffix("/")).getOrElse(
      throw new IllegalArgumentException(
        s"IceLiteCatalog '$name': set spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  private def checkSegment(s: String): String = {
    require(s.nonEmpty && !s.contains("/") && s != ".." && s != ".",
      s"IceLiteCatalog: illegal identifier segment '$s'")
    s
  }

  private def pathOf(ident: Identifier): String =
    (warehouse +: (ident.namespace.toSeq :+ ident.name).map(checkSegment)).mkString("/")

  private def pathOf(namespace: Array[String]): String =
    (warehouse +: namespace.toSeq.map(checkSegment)).mkString("/")

  // ---- tables -----------------------------------------------------------

  override def tableExists(ident: Identifier): Boolean = IceLite.exists(pathOf(ident))

  override def loadTable(ident: Identifier): Table = loadAt(ident, None)

  /** `VERSION AS OF x` time travel: a numeric version, or a tag name. */
  override def loadTable(ident: Identifier, version: String): Table =
    loadAt(ident, Some(version))

  override def loadTable(ident: Identifier, timestamp: Long): Table =
    throw new UnsupportedOperationException(
      "icelite: TIMESTAMP AS OF is not supported — use VERSION AS OF <version|tag> " +
        "(snapshots are versioned by commit, not wall clock)")

  private def loadAt(ident: Identifier, version: Option[String]): Table = {
    val path = pathOf(ident)
    if (!IceLite.exists(path)) throw new NoSuchTableException(ident)
    val t = IceLite.load(spark, path)
    // Tags resolve FIRST: tag names are user-chosen, version numbers are
    // engine-chosen, so an all-digit tag (e.g. "123") must not silently
    // read version 123 instead. Only a non-tag all-digit string is a
    // version; "" is neither (forall on an empty string is true).
    val snap = version match {
      case None => t.snapshot
      case Some(tag) if t.tags.contains(tag) => t.snapshotAt(t.tags(tag))
      case Some(v) if v.nonEmpty && v.forall(_.isDigit) => t.snapshotAt(v.toLong)
      case Some(tag) => throw new IllegalArgumentException(
        s"icelite: no version or tag '$tag' at $path (tags: ${t.tags.keys.mkString(", ")})")
    }
    new IceLiteSparkTable(path, Some(snap), hconf)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new Path(pathOf(namespace))
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => IceLite.exists(s"${pathOf(namespace)}/$n"))
      .sorted.map(Identifier.of(namespace, _))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: JMap[String, String]): Table = {
    require(partitions.isEmpty,
      "icelite: PARTITIONED BY is not supported — layout is key-hash buckets " +
        "(set 'buckets' in TBLPROPERTIES); clustering via OPTIMIZE ... ZORDER BY")
    val path = pathOf(ident)
    if (IceLite.exists(path)) throw new TableAlreadyExistsException(ident)
    val props = properties.asScala.toMap
    val key = props.getOrElse("key", throw new IllegalArgumentException(
      "icelite: CREATE TABLE requires TBLPROPERTIES ('key'='<merge identity column>')"))
    require(schema.fieldNames.contains(key),
      s"icelite: key column '$key' is not in the schema (${schema.fieldNames.mkString(", ")})")
    // The engine contract is STRING merge keys (MergeInto header; readers
    // use getUTF8String; the parquet key predicate pushes Binary/UTF8).
    // Failing here turns an opaque merge/read-time ClassCastException into
    // a clear CREATE-time error.
    require(schema(key).dataType == org.apache.spark.sql.types.StringType,
      s"icelite: key column '$key' must be STRING (merge identity keys are " +
        s"strings; got ${schema(key).dataType.catalogString}) — cast the key " +
        "or add a derived string column")
    val buckets = props.get("buckets").map(_.toInt).getOrElse(16)
    // Spark adds reserved bookkeeping props (provider, owner, ...): keep only
    // the engine's own write.* family plus anything user-namespaced.
    val reserved = Set("key", "buckets", TableCatalog.PROP_PROVIDER, TableCatalog.PROP_OWNER,
      TableCatalog.PROP_LOCATION, TableCatalog.PROP_EXTERNAL, TableCatalog.PROP_COMMENT,
      TableCatalog.PROP_TABLE_TYPE, TableCatalog.PROP_COLLATION, TableCatalog.PROP_IS_MANAGED_LOCATION)
    val tableProps = props.filterNot { case (k, _) => reserved.contains(k) }
    IceLite.create(spark, path, schema, key, buckets, tableProps)
    new IceLiteSparkTable(path, Some(IceLite.load(spark, path).snapshot), hconf)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val path = pathOf(ident)
    if (!IceLite.exists(path)) throw new NoSuchTableException(ident)
    val t = IceLite.load(spark, path)
    def top(fieldNames: Array[String], what: String): String = {
      require(fieldNames.length == 1,
        s"icelite: $what supports top-level columns only, got ${fieldNames.mkString(".")}")
      fieldNames(0)
    }
    val setProps = scala.collection.mutable.Map.empty[String, String]
    val unsetProps = scala.collection.mutable.ArrayBuffer.empty[String]
    changes.foreach {
      case c: TableChange.RenameColumn =>
        t.renameColumn(top(c.fieldNames(), "RENAME COLUMN"), c.newName()): Unit
      case c: TableChange.DeleteColumn =>
        t.dropColumn(top(c.fieldNames(), "DROP COLUMN")): Unit
      case c: TableChange.AddColumn =>
        require(c.position() == null,
          "icelite: ADD COLUMN position is not supported (columns append)")
        t.addColumn(top(c.fieldNames(), "ADD COLUMN"), c.dataType()): Unit
      case c: TableChange.SetProperty => setProps += (c.property() -> c.value())
      case c: TableChange.RemoveProperty => unsetProps += c.property()
      case other => throw new UnsupportedOperationException(
        s"icelite: unsupported ALTER TABLE change $other")
    }
    if (setProps.nonEmpty || unsetProps.nonEmpty)
      t.alterProperties(setProps.toMap, unsetProps.toSeq): Unit
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(pathOf(ident))
    IceLite.exists(pathOf(ident)) && fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    val dst = new Path(pathOf(newIdent))
    fs.mkdirs(dst.getParent): Unit
    if (!fs.rename(new Path(pathOf(oldIdent)), dst))
      throw new IllegalStateException(
        s"icelite: rename ${oldIdent} -> ${newIdent} failed")
  }

  // ---- namespaces -------------------------------------------------------

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs.exists(new Path(pathOf(namespace)))

  override def listNamespaces(): Array[Array[String]] = {
    val root = new Path(warehouse)
    if (!fs.exists(root)) return Array.empty
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => IceLite.exists(s"$warehouse/$n"))
      .sorted.map(Array(_))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else {
      if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
      val dir = new Path(pathOf(namespace))
      fs.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
        .filterNot(n => IceLite.exists(s"${pathOf(namespace)}/$n"))
        .sorted.map(namespace :+ _)
    }

  override def loadNamespaceMetadata(namespace: Array[String]): JMap[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION -> pathOf(namespace)).asJava
  }

  override def createNamespace(namespace: Array[String],
                               metadata: JMap[String, String]): Unit = {
    fs.mkdirs(new Path(pathOf(namespace))): Unit
  }

  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "icelite: namespaces are plain directories; nothing to alter")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    // Non-cascade must refuse CHILD NAMESPACES too, not just direct tables —
    // the recursive delete below would otherwise silently take nested
    // namespaces (and any tables inside them) with it.
    if (!cascade && (listTables(namespace).nonEmpty || listNamespaces(namespace).nonEmpty))
      throw new IllegalStateException(
        s"icelite: namespace ${namespace.mkString(".")} is not empty (use CASCADE)")
    fs.delete(new Path(pathOf(namespace)), true)
  }
}
