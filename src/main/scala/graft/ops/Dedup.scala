package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Deduplication operators for training-data pipelines, each designed for the
 * 100 TB posture:
 *
 *  - exact: one hash-shuffle on the content digest (map-side combined);
 *  - MinHash+LSH: near-dup candidate generation whose shuffle volume is
 *    O(docs x bands), never O(docs^2) — the only pairwise work happens
 *    inside LSH buckets; exact Jaccard verification runs on candidates only;
 *  - SimHash: 64-bit signature; near-dups collide on rotated prefix buckets;
 *  - embedding cosine near-dup via random-hyperplane LSH.
 *
 * Everything below is pure Catalyst expressions — shingling, hashing, and
 * signatures all run inside whole-stage codegen.
 */
object Dedup {

  /** Exact dedup on a content digest. Returns (kept rows, duplicate groups).
    * One shuffle on the digest; min/count partially aggregate map-side. */
  def exact(df: DataFrame, idCol: String, contentCols: Seq[String]): (DataFrame, DataFrame) = {
    val digest = md5(concat_ws("\u0000", contentCols.map(col): _*))
    val withH = df.withColumn("__h", digest)
    val groups = withH.groupBy(col("__h").as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))
    val kept = withH
      .join(groups.select(col("h"), col("keep_id")), withH("__h") === col("h"))
      .filter(col(idCol) === col("keep_id"))
      .drop("__h", "h", "keep_id")
    (kept, groups)
  }

  /** Word w-shingles of a text column (w consecutive lowercased words). */
  def shingles(text: Column, w: Int = 3): Column = {
    val words = split(lower(text), "\\s+")
    val n = size(words) - (w - 1)
    when(n <= 0, array(lower(text)))
      .otherwise(transform(sequence(lit(0), n - 1),
        i => concat_ws(" ", (0 until w).map(j => element_at(words, (i + j + 1))): _*)))
  }

  /** MinHash signature — native codegen expression (one string hash per
    * shingle, permutations as tight long mixes; see [[MinHashSigExpr]]). */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    MinHashSigExpr.minhash(shingleCol, numHashes)

  /**
   * MinHash+LSH near-duplicate pairs: signature -> `bands` band keys ->
   * explode -> group by band bucket -> candidate pairs -> exact Jaccard
   * verification at `threshold`. Returns (id_a, id_b, jaccard) with
   * id_a < id_b.
   */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int = 64, bands: Int = 16, shingleWidth: Int = 3,
                 threshold: Double = 0.5, hashKernel: String = "xx"): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    // Shingles as HASHES (native ShingleHashesExpr): one tokenize per row,
    // no shingle strings ever materialize; Jaccard over hash sets equals
    // Jaccard over shingle sets up to negligible 64-bit collisions.
    // hashKernel "xx" (default) = xxhash64 folds, the fast path;
    // "md5" = [[Md5MinHash]], same algorithm with SQL-reproducible hashes
    // (the correctness-oracle path).
    val base = df.select(col(idCol).as("id"),
      (if (hashKernel == "md5") Md5MinHash.shingleHashes(col(textCol), shingleWidth)
       else TextHashExprs.shingleHashes(col(textCol), shingleWidth)).as("sh"))
    // Band keys are one native expression per row; the shingle arrays do
    // NOT ride through the banding explode or the candidate self-join —
    // only (id, band, bucket) shuffles there. Shingles re-join by id for
    // the exact-Jaccard verification of the (small) candidate set.
    val bandCol =
      if (hashKernel == "md5") Md5MinHash.minhashBands(col("sh"), numHashes, bands)
      else MinHashSigExpr.minhashBands(col("sh"), numHashes, bands)
    val banded = base.select(col("id"), posexplode(bandCol).as(Seq("band", "bucket")))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val cand = a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    cand
      .join(base.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast(DoubleType) /
          size(array_union(col("sh_a"), col("sh_b"))).cast(DoubleType), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-duplicate pairs via MULTI-BAND random-hyperplane
    * LSH (same banding shape as [[minhashLsh]]): `bands` independent bucket
    * keys of `rowsPerBand` hyperplane signs each; a pair is a candidate when
    * ANY band collides. Exact cosine (double) verifies candidates only.
    *
    * 100 TB posture: the banding explode carries only (id, band, bucket) —
    * vectors re-join by id for the (small) candidate set; candidate volume is
    * O(docs x bands / 2^rowsPerBand) expected, and `maxBucket` drops
    * degenerate buckets (e.g. the all-zeros vector cloud) that would
    * otherwise go quadratic. Hyperplanes are md5-derived constants
    * ([[Similarity.hyperplane]]), so the whole candidate generation is
    * reproducible in the SQL oracle. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, bands: Int = 8, rowsPerBand: Int = 8,
                        threshold: Double = 0.95, maxBucket: Int = 4096): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val bandBuckets = (0 until bands).map(b =>
      Similarity.lshBucket(col("v"), rowsPerBand, dim, planeOffset = b * rowsPerBand))
    val banded = base.select(col("id"),
      posexplode(array(bandBuckets: _*)).as(Seq("band", "bucket")))
    val sizes = banded.groupBy("band", "bucket").agg(count(lit(1)).as("__bn"))
    val kept = banded.join(sizes.filter(col("__bn") <= maxBucket), Seq("band", "bucket"))
    val a = kept.select(col("band"), col("bucket"), col("id").as("id_a"))
    val b = kept.select(col("band"), col("bucket"), col("id").as("id_b"))
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    cand
      .join(base.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cosine", round(Similarity.cosine(col("v_a"), col("v_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** 64-bit SimHash over word tokens: per-word xxhash64; each bit
    * contributes +1/-1; sign of the sum becomes the signature bit.
    * Native expression — the HOF formulation interpreted 64 lambda steps
    * per word. */
  def simhash(text: Column): Column = TextHashExprs.simhash(text)

  /** SimHash near-dup candidates: equal signatures on any of 4 16-bit bands
    * (hamming-distance-tolerant banding). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sig"), b * 16).bitwiseAND(0xFFFFL))).as(Seq("band", "bucket")))
    val a = banded.alias("a"); val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
  }
}
