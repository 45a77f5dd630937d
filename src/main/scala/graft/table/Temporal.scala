package graft.table

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Temporal derivations over a CDC change stream — the two standard
 * "history" consumers of a binlog tail (reference semantics: the per-key
 * total order the reference's outbox replay relies on,
 * `smt/Outbox.java:79-97`, generalized from latest-state to full history):
 *
 *  - [[scd2]]: slowly-changing-dimension type 2 — one row per version with
 *    `[valid_from, valid_to)` LSN intervals;
 *  - [[asofJoin]]: temporal point lookup — for each probe `(key, as_of)`,
 *    the latest version with `lsn <= as_of`.
 *
 * Both are single-shuffle window formulations: hash-partition by key, sort
 * within partition. At the 10^10-event design point the shuffle carries the
 * stream once (no join blow-up: the as-of join deliberately avoids the
 * naive `probes JOIN versions ON key AND lsn <= as_of` range join, whose
 * intermediate is O(probes x versions-per-key) and detonates on hot keys —
 * the union-window form is O(probes + versions) regardless of skew).
 */
object Temporal {

  /**
   * SCD2 history: each non-delete change event opens a version valid from
   * its LSN until the key's NEXT event (of any kind — an update supersedes,
   * a delete terminates); the key's last event, if not a delete, is the
   * current version (`valid_to` null, `is_current` true).
   *
   * Input: `(key, opCol in {c,u,d}, lsnCol, payloadCol struct)` — the
   * engine's canonical change-frame shape. Output: `key, payload.*,
   * valid_from, valid_to, is_current`.
   *
   * One exchange (hash by key) + one in-partition sort for the `lead`
   * window; deletes participate in the window (they close the prior
   * version) and are then dropped.
   */
  def scd2(changes: DataFrame, key: String, lsnCol: String, opCol: String,
           payloadCol: String): DataFrame = {
    // A payload field named like the key would duplicate the output column
    // (the canonical change frame repeats the key inside `after`) — skip it.
    val payloadFields = changes.schema(payloadCol).dataType
      .asInstanceOf[StructType].fieldNames.toSeq.filterNot(_ == key)
    val w = Window.partitionBy(col(key)).orderBy(col(lsnCol))
    changes
      .withColumn("__valid_to", lead(col(lsnCol), 1).over(w))
      .filter(col(opCol) =!= "d")
      .select(
        col(key) +:
          payloadFields.map(f => col(s"$payloadCol.$f").as(f)) :+
          col(lsnCol).as("valid_from") :+
          col("__valid_to").as("valid_to") :+
          col("__valid_to").isNull.as("is_current"): _*)
  }

  /**
   * As-of (temporal) join: for every probe row, the latest `versions` row
   * of the same key with `lsnCol <= asOfCol` (inclusive). Probes with no
   * qualifying version keep null version columns (left semantics).
   *
   * Implementation: tag-union both inputs into one frame, then a single
   * `last(_, ignoreNulls)` running window per key ordered by
   * `(time, tag)` — versions (tag 0) sort before probes (tag 1) at equal
   * time, which is exactly the inclusive bound. One exchange + one sort,
   * no per-key fan-out: the classic scalable as-of shape (vs. the range
   * join that is quadratic in versions-per-key).
   *
   * Output columns: probe columns (minus key/asOf) ++ `key, asOfCol` ++
   * the version's `lsnCol` and value columns (null on miss).
   */
  def asofJoin(versions: DataFrame, probes: DataFrame, key: String,
               lsnCol: String, asOfCol: String): DataFrame = {
    val valCols = versions.columns.filterNot(c => c == key || c == lsnCol).toSeq
    val probeCols = probes.columns.filterNot(c => c == key || c == asOfCol).toSeq
    val verStruct = struct(col(lsnCol) +: valCols.map(col): _*)
    val vs = versions.select(
      col(key) +: col(lsnCol).as("__t") +: lit(0).as("__tag") +:
        verStruct.as("__v") +:
        probeCols.map(c => lit(null).cast(probes.schema(c).dataType).as(c)): _*)
    val verType = vs.schema("__v").dataType
    val ps = probes.select(
      col(key) +: col(asOfCol).cast("long").as("__t") +: lit(1).as("__tag") +:
        lit(null).cast(verType).as("__v") +:
        probeCols.map(col): _*)
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    vs.unionByName(ps)
      .withColumn("__last", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(
        probeCols.map(col) ++
          Seq(col(key), col("__t").as(asOfCol), col(s"__last.$lsnCol").as(lsnCol)) ++
          valCols.map(c => col(s"__last.$c").as(c)): _*)
  }
}
