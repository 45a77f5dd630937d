package graft.smt

import org.apache.spark.sql.DataFrame

/**
 * A Single-Message-Transform stage, Spark-first: the reference's per-record
 * `R apply(R record)` (`smt/DebeziumJsonDeserializer.java:59`,
 * `smt/Outbox.java:70`, `smt/Jose.java:83`) becomes a whole-DataFrame
 * transform built from Catalyst expressions, so chains of stages stay inside
 * one optimized plan (predicate pushdown / column pruning / whole-stage
 * codegen across stage boundaries — nothing materializes between stages).
 */
trait SmtStage extends (DataFrame => DataFrame) with Serializable {
  def name: String
}

/** Ordered composition, the analog of Kafka Connect's `transforms=` list
  * (`doc/outbox.md:23-27`). */
final case class SmtChain(stages: Seq[SmtStage]) extends SmtStage {
  val name = stages.map(_.name).mkString("+")
  def apply(df: DataFrame): DataFrame = stages.foldLeft(df)((d, s) => s(d))
}

object Stages {
  import org.apache.spark.sql.functions._

  /**
   * Debezium envelope unwrap: (op, before, after, ts_ms, source.lsn, ...) ->
   * the MERGE contract (key, op, lsn, after). The engine-side analog of the
   * reference's payload extraction (`smt/Outbox.java:99-101`) for the
   * binlog-shaped stream.
   */
  final case class UnwrapDebezium(keyColumn: String = "doc_id") extends SmtStage {
    val name = "unwrap"
    def apply(df: DataFrame): DataFrame = {
      def structKey(c: String): Option[org.apache.spark.sql.Column] =
        df.schema.fields.find(_.name == c) match {
          case Some(f) if f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] &&
            f.dataType.asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.contains(keyColumn) =>
            Some(col(s"$c.$keyColumn"))
          case _ => None
        }
      val keySources = Seq(structKey("after"), structKey("before"),
        if (df.columns.contains(keyColumn)) Some(col(keyColumn)) else None).flatten
      require(keySources.nonEmpty, s"no source for key column $keyColumn in ${df.columns.mkString(",")}")
      df.select(
        coalesce(keySources: _*).as(keyColumn),
        col("op"),
        col("source.lsn").as("lsn"),
        col("after"))
    }
  }

  /** Tombstone drop (`smt/Outbox.java:79-82`): records with a null payload
    * that are not explicit deletes are dropped. */
  final case class TombstoneFilter() extends SmtStage {
    val name = "tombstone-filter"
    def apply(df: DataFrame): DataFrame =
      df.filter(col("after").isNotNull || col("op") === "d")
  }

  /** Rename payload columns (schema evolution / rename path of the SMT
    * chain; the engine-side analog of reworking field names upstream of the
    * sink so the table only ever evolves additively). */
  final case class RenameFields(renames: Map[String, String]) extends SmtStage {
    val name = "rename"
    def apply(df: DataFrame): DataFrame = {
      val afterType = df.schema("after").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      val cols = afterType.fields.map { f =>
        col(s"after.${f.name}").as(renames.getOrElse(f.name, f.name))
      }
      df.withColumn("after", when(col("after").isNotNull, struct(cols.toSeq: _*)))
    }
  }

  /** Arbitrary column-level transform on the payload struct. */
  final case class MapPayload(fieldName: String, fn: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      extends SmtStage {
    val name = s"map-$fieldName"
    def apply(df: DataFrame): DataFrame = {
      val afterType = df.schema("after").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      val cols = afterType.fields.map { f =>
        val c = col(s"after.${f.name}")
        (if (f.name == fieldName) fn(c) else c).as(f.name)
      }
      df.withColumn("after", when(col("after").isNotNull, struct(cols.toSeq: _*)))
    }
  }
}
