package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Keyed streaming state via `flatMapGroupsWithState` — per-key CDC activity
 * tracking (change counts, op breakdown, lsn watermarks) maintained across
 * micro-batches in Spark's state store. The schema-registry state is
 * deliberately driver/metadata-level (see SchemaRegistry); THIS is the
 * executor-partitioned keyed state path for per-key accounting at 10^10
 * keys — state shards with the shuffle, nothing driver-side.
 */
object KeyedState {

  case class KeyEvent(doc_id: String, op: String, lsn: Long)
  case class KeyActivity(
      doc_id: String,
      events: Long,
      inserts: Long,
      updates: Long,
      deletes: Long,
      firstLsn: Long,
      lastLsn: Long,
      live: Boolean)

  /** Per-key activity over a (streaming or batch) change-event frame with
    * (doc_id, op, lsn) columns. Update-mode output: one row per key per
    * batch with the running totals. */
  def trackActivity(events: DataFrame): Dataset[KeyActivity] = {
    implicit val eventEnc = Encoders.product[KeyEvent]
    implicit val actEnc = Encoders.product[KeyActivity]
    implicit val stringEnc = Encoders.STRING
    val typed = events.select(col("doc_id"), col("op"), col("lsn")).as[KeyEvent]
    typed
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyEvent], state: GroupState[KeyActivity]) =>
          var acc = state.getOption.getOrElse(
            KeyActivity(key, 0, 0, 0, 0, Long.MaxValue, Long.MinValue, live = false))
          rows.foreach { e =>
            acc = acc.copy(
              events = acc.events + 1,
              inserts = acc.inserts + (if (e.op == "c") 1 else 0),
              updates = acc.updates + (if (e.op == "u" || e.op == "r") 1 else 0),
              deletes = acc.deletes + (if (e.op == "d") 1 else 0),
              firstLsn = math.min(acc.firstLsn, e.lsn),
              lastLsn = math.max(acc.lastLsn, e.lsn),
              live = if (e.lsn >= acc.lastLsn) e.op != "d" else acc.live)
          }
          state.update(acc)
          Iterator.single(acc)
      }
  }
}
