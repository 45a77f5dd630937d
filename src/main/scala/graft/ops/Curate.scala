package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus curation operators for training-data pipelines: deterministic
 * sampling, per-stratum quotas, and a reproducible global shuffle. All
 * randomness is md5-derived from the row key + a caller salt, so (a) every
 * op is idempotent and re-runnable to the identical output — the property a
 * 100 TB curation pipeline actually needs (re-running a failed stage must
 * not re-roll the dice), and (b) every op is reproducible in plain SQL
 * (`md5_number_lower` / `md5`) for the DuckDB oracle gates.
 *
 * Scale posture: sampling is a pure filter (codegen'd expression, no
 * shuffle, pushed past scans when possible); quotas and shuffle are one
 * hash-partition on the stratum/shard key with intra-partition work bounded
 * by the stratum/shard size — no global sorts, no driver state.
 */
object Curate {

  /** Sampling granularity: keep-thresholds are integer per-million, so the
    * filter is pure integer arithmetic (no float comparisons to drift
    * between engines). */
  val SampleScale = 1000000

  private def die(keyCol: Column, salt: String): Column =
    TextHashExprs.md5Mod(concat(keyCol.cast("string"), lit(":" + salt)), SampleScale)

  private def thresholdOf(fraction: Double): Int = {
    require(fraction >= 0 && fraction <= 1, s"fraction out of [0,1]: $fraction")
    math.floor(fraction * SampleScale).toInt
  }

  /** Deterministic Bernoulli sample: keep a row iff its md5-derived
    * per-million die roll (on `keyCol` + salt) lands under `fraction`.
    * Unlike `df.sample`, membership is a pure function of the key — stable
    * across retries, partitionings, and Spark versions. */
  def hashSample(df: DataFrame, keyCol: Column, fraction: Double,
                 salt: String = "s0"): DataFrame =
    df.filter(die(keyCol, salt) < lit(thresholdOf(fraction)))

  /** Stratified deterministic sample: per-stratum keep fractions (e.g.
    * up-sample rare languages, down-sample boilerplate-heavy sources), with
    * `defaultFraction` for strata not in the map. The per-stratum threshold
    * is resolved by a small when-chain — codegen-friendly, no join. */
  def stratifiedSample(
      df: DataFrame,
      strataCol: Column,
      keyCol: Column,
      fractions: Map[String, Double],
      defaultFraction: Double,
      salt: String = "s0"): DataFrame = {
    val thresh = fractions.foldLeft(lit(thresholdOf(defaultFraction))) {
      case (acc, (stratum, frac)) =>
        when(strataCol === lit(stratum), lit(thresholdOf(frac))).otherwise(acc)
    }
    df.filter(die(keyCol, salt) < thresh)
  }

  /** Per-stratum quota: keep at most `n` rows per stratum, preferring the
    * first rows under `order` (ties must be broken by a unique column for
    * determinism — pass e.g. `Seq(qualityDesc, docId)`). One hash partition
    * on the stratum + an intra-partition top-n (Spark plans rank-limit
    * windows with a per-partition bounded heap via WindowGroupLimit, so the
    * full stratum is never sorted when n is small). */
  def quotaPerStratum(
      df: DataFrame,
      strataCol: Column,
      order: Seq[Column],
      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCol).orderBy(order: _*)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n)
      .drop("__rank")
  }

  /** Deterministic global shuffle for training-corpus export: each row gets
    * a stable (shard, pos) — shard by unsigned md5 mod `shards`, position by
    * the md5 hex digest order within the shard (unique keys => total order).
    * The physical plan is ONE hash exchange on shard + an intra-shard sort;
    * shard sizes are balanced by the hash, so partition memory is bounded by
    * corpus/shards regardless of input order or skew. Writers downstream
    * partition output files by `shard` and keep `pos` order within each. */
  def deterministicShuffle(
      df: DataFrame,
      keyCol: Column,
      shards: Int,
      salt: String = "s0"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shards > 0, s"shards must be positive: $shards")
    val tag = md5(concat(keyCol.cast("string"), lit(":" + salt)))
    val shard = TextHashExprs.md5Mod(concat(keyCol.cast("string"), lit(":" + salt)), shards)
    val w = Window.partitionBy(col("__shard")).orderBy(col("__tag"), keyCol)
    df.withColumn("__tag", tag)
      .withColumn("__shard", shard)
      .withColumn("pos", row_number().over(w))
      .withColumnRenamed("__shard", "shard")
      .drop("__tag")
  }

  /** One-call curation gate: keep rows passing the standard quality
    * filters — minimum token count, intra-doc repetition ratio, URL
    * character density, PII hits. All pure expressions, so the whole gate
    * is a single codegen'd scan-side filter: no shuffle, pushes past
    * column pruning, and composes with sampling/quotas downstream.
    * Empty/degenerate texts (zero segments) fail closed. */
  def qualityFilter(df: DataFrame, textCol: String = "text",
                    minWords: Int = 5, maxDupRatio: Double = 0.3,
                    maxUrlRatio: Double = 0.02, maxPii: Int = 0,
                    segmentDelim: String = "\\. "): DataFrame = {
    val t = col(textCol)
    df.filter(
      TextOps.wsTokenCount(t) >= minWords &&
        TextOps.segmentDupRatio(t, segmentDelim) <= maxDupRatio &&
        TextOps.urlCharRatio(t) <= maxUrlRatio &&
        TextOps.piiCount(t) <= maxPii)
  }
}
