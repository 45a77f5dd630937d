package graft.stream

import graft.table.{CommitStats, IceLiteTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multi-table routed ingest: one mixed change stream (a Debezium connector
 * tails MANY source tables; the reference's outbox SMT routes each record
 * to a topic, `smt/Outbox.java:99-126`) fanned into per-topic IceLite
 * tables, each slice MERGEd under the shared epoch key.
 *
 * Exactly-once across crashes WITHOUT a cross-table transaction: each
 * table's own epoch ledger makes its slice idempotent, so a retry of a
 * partially-applied epoch no-ops the tables that already committed and
 * applies the rest — CONVERGENT atomicity (the end state after a full
 * retry equals one atomic transaction; mid-crash visibility is per-table,
 * which is exactly Kafka-connect-to-N-topics semantics, not weaker).
 *
 * Scale posture: each table's merge plans its own slice — filter by topic
 * pushes to the scan, and a key lives in exactly one table, so per-table
 * bucket clustering is undisturbed. Callers with many tables should
 * persist `changes` first (one materialization vs N re-scans); the replay
 * paths pass an already-cached batch.
 */
object MultiTable {

  /** MERGE each topic's slice into its table under `epochKey`. Topics
    * without a table are ignored (count them upstream via observe);
    * tables without rows this epoch still commit the epoch marker (their
    * ledger must advance, or a redelivery would double-apply a LATER
    * retry that coincides with new data). Returns per-topic stats. */
  def mergeRouted(changes: DataFrame, topicCol: String,
                  tables: Map[String, IceLiteTable],
                  epochKey: String): Map[String, CommitStats] =
    tables.map { case (topic, t) =>
      topic -> t.merge(changes.filter(col(topicCol) === topic).drop(topicCol), epochKey)
    }
}
