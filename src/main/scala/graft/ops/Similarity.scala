package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Similarity search over embedding columns (`Array[Float]`).
 *
 * - [[cosine]]: pure-expression dot/norm in double precision (codegen'd,
 *   no UDF);
 * - [[bruteForceTopK]]: exact top-k — broadcast the (small) query side,
 *   rank per query; the scale baseline;
 * - [[lshTopK]]: random-hyperplane LSH bucketing; at 100 TB the candidate
 *   scan drops from O(N) per query to O(N / 2^bits) expected, trading
 *   recall for a bounded probe set. Hyperplanes are deterministic
 *   pseudo-random (hash-derived), so results are reproducible without
 *   storing a model.
 */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double. */
  def cosine(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast(DoubleType))
    val bd = transform(b, x => x.cast(DoubleType))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val na = sqrt(aggregate(ad, lit(0.0), (s, x) => s + x * x))
    val nb = sqrt(aggregate(bd, lit(0.0), (s, x) => s + x * x))
    dot / (na * nb)
  }

  /** Exact top-k neighbours for each query row. The query side is
    * broadcast — candidates stream through one stage with no shuffle of the
    * (huge) candidate table; only the per-query top-k rank shuffles. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                     qId: String = "vec_id", cId: String = "vec_id",
                     qVec: String = "embedding", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("qid"), col(qVec).as("qv"))
    val c = candidates.select(col(cId).as("cid"), col(cVec).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "sim", "rank")
  }

  /** Deterministic random hyperplane: component d of plane p derived from
    * xxhash64(p, d), mapped to [-1, 1). */
  private def hyperplaneSign(vec: Column, plane: Int, dim: Int): Column = {
    val comps = sequence(lit(0), lit(dim - 1))
    val dot = aggregate(
      zip_with(vec, comps, (x, d) =>
        x.cast(DoubleType) *
          (pmod(xxhash64(lit(plane), d), lit(1L << 32)).cast(DoubleType) / lit((1L << 31).toDouble) - 1.0)),
      lit(0.0), (s, x) => s + x)
    when(dot >= 0, 1L).otherwise(0L)
  }

  /** LSH bucket id: `bits` hyperplane signs packed into a long. */
  def lshBucket(vec: Column, bits: Int, dim: Int): Column =
    (0 until bits).map(p => hyperplaneSign(vec, p, dim) * (1L << p))
      .reduce(_ + _)

  /** Approximate top-k: candidates bucketed by LSH; each query probes only
    * its own bucket. Recall < 1 by construction; bits trades recall for
    * probe cost. */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int, bits: Int, dim: Int,
              qId: String = "vec_id", cId: String = "vec_id",
              qVec: String = "embedding", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("qid"), col(qVec).as("qv"),
      lshBucket(col(qVec), bits, dim).as("bucket"))
    val c = candidates.select(col(cId).as("cid"), col(cVec).as("cv"),
      lshBucket(col(cVec), bits, dim).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "cid", "sim", "rank", "bucket")
  }
}
