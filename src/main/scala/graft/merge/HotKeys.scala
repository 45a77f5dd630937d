package graft.merge

import graft.ops.Curate
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Heavy-hitter (hot key) detection for CDC batches — the input to skew
 * salting. A key hot enough to overwhelm its hash partition (one doc_id
 * carrying a double-digit share of a 10^8-event epoch) makes the dedup
 * fold's widest partition the epoch's critical path; detecting it needs
 * only a small sample, because any key worth salting is, by definition,
 * frequent enough to be visible in one.
 *
 * The sample is md5-keyed on the event id ([[Curate.hashSample]]), so
 * detection is deterministic: re-running the batch flags the same keys
 * (no re-rolled dice on retry), and the whole operator is reproducible in
 * plain SQL for the oracle gate. Cost: one sampled scan (codegen'd filter
 * + one small hash agg), no full-data shuffle.
 */
object HotKeys {

  /** Keys whose share of the SAMPLED batch is at least `minShare`.
    * Returns (key, n, share): sampled occurrence count and sampled share
    * (4 dp). `idCol` must be unique per event (the LSN) — it seeds the
    * sample die, so membership is a pure function of the event. */
  def detect(changes: DataFrame, key: String, idCol: Column, minShare: Double,
             sampleFraction: Double = 0.01, salt: String = "hot0"): DataFrame = {
    require(minShare > 0 && minShare <= 1, s"minShare out of (0,1]: $minShare")
    val sampled = Curate.hashSample(changes, idCol, sampleFraction, salt)
      .groupBy(col(key)).agg(count(lit(1)).as("n"))
    // total sampled count: tiny second agg over the per-key counts (already
    // collapsed — O(distinct keys)), broadcast back; no scalar collect on
    // the raw stream, no single-partition window.
    val total = sampled.agg(sum("n").as("total"))
    sampled.crossJoin(broadcast(total))
      .withColumn("share", round(col("n") / col("total"), 4))
      .filter(col("share") >= minShare)
      .select(col(key), col("n"), col("share"))
  }

  /** Salt factor that spreads the hottest key across enough partitions to
    * stop dominating one: ceil(maxShare x width), at least 2, capped (a
    * 64-way fan-out already reduces any single key below 2% of one wave).
    * 0 when nothing crosses `minShare` — salting off. */
  def recommendSalt(changes: DataFrame, key: String, idCol: Column, minShare: Double,
                    width: Int, sampleFraction: Double = 0.01): Int = {
    val hot = detect(changes, key, idCol, minShare, sampleFraction)
      .agg(max("share")).head()
    if (hot.isNullAt(0)) 0
    else math.min(64, math.max(2, math.ceil(hot.getDouble(0) * width).toInt))
  }
}
