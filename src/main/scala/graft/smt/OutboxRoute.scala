package graft.smt

import graft.hashing.KafkaMurmur2
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType, StructType}

/**
 * Outbox routing — semantic port of the reference's `smt/Outbox.java:70-229`
 * as one declarative transform. Input rows carry the outbox-table envelope:
 *
 *   topic   : String            source topic (dbz_signal passthrough check)
 *   key     : String/Binary     record key (preserved verbatim)
 *   value   : Struct            outbox row; recognised fields:
 *             payload           emitted value (`Outbox.java:99-101`)
 *             __deleted         "true" => tombstone (`:94-97`)
 *             topic             per-record target topic (`:103-112`)
 *             partition_number  explicit partition (`:197-205`)
 *             partition_key     murmur2-hashed routing key (`:207-229`)
 *             headers           Struct or JSON String promoted to headers (`:147-181`)
 *   headers : Map[String,String] pre-existing record headers (optional)
 *   ts_ms   : Long              timestamp, preserved
 *
 * Output: (topic, partition, key, payload, headers, ts_ms, tombstone) —
 * passthrough rows (dbz_signal topics, heartbeat schemas) should be split
 * upstream with [[OutboxRoute.isPassthrough]]; Debezium null-value
 * tombstones are dropped (`:79-82`), `__deleted` rows become explicit
 * tombstones with key/partition preserved.
 */
final case class OutboxConfig(
    topic: Option[String] = None,
    topicPrefix: Option[String] = None,
    partitionByKey: Boolean = false, // false = partition-number (default, `Outbox.java:40`)
    numPartitions: Option[Int] = None)

final case class OutboxRoute(cfg: OutboxConfig) extends SmtStage {
  val name = "outbox"

  private def emptyHeaders: Column = typedLit(Map.empty[String, String])

  def apply(df: DataFrame): DataFrame = {
    val valueType = df.schema("value").dataType.asInstanceOf[StructType]
    def valueField(n: String): Option[Column] =
      if (valueType.fieldNames.contains(n)) Some(col(s"value.$n")) else None

    // A non-string topic field is a data error, not something to cast around
    // (`Outbox.java:107-109` throws DataException). Analysis-time here: the
    // whole column has one type, so the per-record check collapses to one.
    valueField("topic").foreach { _ =>
      val dt = valueType("topic").dataType
      if (dt != StringType) throw new IllegalArgumentException(
        s"The topic field in the value must be a string, got ${dt.catalogString}.")
    }

    // Tombstone semantics: null value dropped (`Outbox.java:79-82`);
    // __deleted == "true" or null payload => tombstone (`:94-101`).
    val dropped = df.filter(col("value").isNotNull)
    val deleted = valueField("__deleted").map(_ === "true").getOrElse(lit(false))
    val payload = valueField("payload").getOrElse(lit(null).cast(StringType))
    val tombstone = deleted || payload.isNull

    // Topic resolution (`Outbox.java:103-117,240-260`): per-record topic
    // overrides config; prefix applies to both; "name@N" carries partitions.
    val prefix = cfg.topicPrefix.map(p => s"$p.").getOrElse("")
    val cfgTopic: Column = cfg.topic match {
      case Some(t) => lit(prefix + t)
      case None => lit(null).cast(StringType)
    }
    val recordTopic = valueField("topic")
      .map(t => when(t.isNotNull, concat(lit(prefix), t)).otherwise(cfgTopic))
      .getOrElse(cfgTopic)
    val resolved = when(recordTopic.isNull,
      raise_error(lit("Target topic wasn't provided in the source table nor the configuration.")))
      .otherwise(recordTopic)
    val topicName = element_at(split(resolved, "@"), 1)
    val topicParts = when(size(split(resolved, "@")) > 1,
      element_at(split(resolved, "@"), 2).cast("int"))

    // Partition resolution (`Outbox.java:186-229`).
    val partition: Column =
      if (!cfg.partitionByKey) {
        valueField("partition_number").map(p =>
          when(p.isNull, raise_error(lit("Unable to find partition_number in source record")).cast("int"))
            .otherwise(p.cast("int")))
          .getOrElse(raise_error(lit("Unable to find partition_number in source record")).cast("int"))
      } else {
        val pk = valueField("partition_key").getOrElse(lit(null).cast(StringType))
        val n = coalesce(topicParts, cfg.numPartitions.map(lit(_)).getOrElse(lit(null).cast("int")))
        when(pk.isNull, raise_error(lit("Unable to find partition_key in source record")).cast("int"))
          .when(n.isNull, raise_error(lit("Unable to find the number of partitions for this target topic.")).cast("int"))
          .otherwise(pmod(KafkaMurmur2.murmur2(pk).bitwiseAND(lit(0x7fffffff)), n).cast("int"))
      }

    // Header promotion (`Outbox.java:134-184`): record headers + partition_key
    // echo (key mode, `:139-145`) + promoted struct/JSON-string headers.
    val baseHeaders: Column =
      if (df.schema.fieldNames.contains("headers")) coalesce(col("headers"), emptyHeaders)
      else emptyHeaders
    val pkEcho: Column =
      if (cfg.partitionByKey)
        valueField("partition_key")
          .map(pk => when(pk.isNotNull, map(lit("partition_key"), pk)).otherwise(emptyHeaders))
          .getOrElse(emptyHeaders)
      else emptyHeaders
    val promoted: Column = valueField("headers") match {
      case Some(h) =>
        valueType("headers").dataType match {
          case st: StructType =>
            when(h.isNotNull,
              map_from_arrays(
                array(st.fieldNames.map(lit(_)).toSeq: _*),
                array(st.fieldNames.map(f => col(s"value.headers.$f").cast(StringType)).toSeq: _*)))
              .otherwise(emptyHeaders)
          case StringType =>
            // JSON string headers; numeric values stringified, nulls kept;
            // unparseable -> skipped (`Outbox.java:165-176`)
            coalesce(from_json(h, MapType(StringType, StringType)), emptyHeaders)
          case _ => emptyHeaders // non-struct/string headers field: logged+ignored in reference (`:177-179`)
        }
      case None => emptyHeaders
    }
    val outHeaders = map_concat_distinct(map_concat_distinct(baseHeaders, pkEcho), promoted)

    dropped.select(
      topicName.as("topic"),
      partition.as("partition"),
      col("key"),
      when(tombstone, lit(null).cast(StringType)).otherwise(payload).as("payload"),
      outHeaders.as("headers"),
      (if (df.schema.fieldNames.contains("ts_ms")) col("ts_ms") else lit(null).cast("long")).as("ts_ms"),
      tombstone.as("tombstone"))
  }

  /** Last-wins concat (map_concat throws on duplicate keys by default). */
  private def map_concat_distinct(a: Column, b: Column): Column =
    map_from_entries(concat(
      filter(map_entries(a), e => !array_contains(map_keys(b), e.getField("key"))),
      map_entries(b)))
}

object OutboxRoute {
  import org.apache.spark.sql.functions._

  /** The value-schema name Debezium stamps on heartbeat records
    * (`smt/Outbox.java:84-88`). */
  val HeartbeatSchemaName = "io.debezium.connector.common.Heartbeat"

  /** Default column carrying the Connect value-schema name in the engine's
    * envelope (Spark types are anonymous, so the name rides as data). */
  val SchemaNameColumn = "value_schema_name"

  /** Signal/heartbeat passthrough predicate (`smt/Outbox.java:73-77,84-88`):
    * split these rows off before routing and re-union them unchanged.
    * Heartbeats are matched by VALUE SCHEMA NAME — the reference checks
    * `valueSchema.name().equals("io.debezium.connector.common.Heartbeat")`,
    * not the topic — carried in `schemaNameCol` when the envelope has one. */
  def isPassthrough(df: DataFrame, schemaNameCol: String = SchemaNameColumn): Column = {
    val sig = lower(col("topic")).contains("dbz_signal")
    // null-safe equality: a missing/null schema name means "not a heartbeat"
    // (the reference's Objects.equals-style check, never three-valued null)
    if (df.columns.contains(schemaNameCol)) sig || (col(schemaNameCol) <=> HeartbeatSchemaName)
    else sig
  }

  /** Topic-only variant for envelopes without a schema-name column. */
  def isPassthrough(): Column = lower(col("topic")).contains("dbz_signal")
}
