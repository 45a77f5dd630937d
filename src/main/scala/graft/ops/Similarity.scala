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
    * (huge) candidate table; ranking is a bounded-heap aggregate
    * ([[TopKAgg]]) whose partial (map-side) phase caps every partition's
    * contribution at k rows per query, so the only shuffle is O(partitions
    * x k x |queries|) — a window row_number() would shuffle ALL N x |q|
    * scored rows. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                     qId: String = "vec_id", cId: String = "vec_id",
                     qVec: String = "embedding", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("qid"), col(qVec).as("qv"))
    val c = candidates.select(col(cId).as("cid"), col(cVec).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    rankTopK(scored, Seq("qid"), k)
  }

  /** Bounded-heap ranking: groupBy(groupCols).top_k -> one row per (group,
    * candidate) with rank 1..k (score desc, id asc — same order as the
    * window formulation). */
  private def rankTopK(scored: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    scored.groupBy(groupCols.map(col): _*)
      .agg(TopKAgg.topK(col("sim"), col("cid").cast(LongType), k).as("top"))
      .select(groupCols.map(col) :+ posexplode(col("top")).as(Seq("pos", "e")): _*)
      .select(groupCols.map(col) ++ Seq(col("e.id").as("cid"), col("e.score").as("sim"),
        (col("pos") + 1).cast(IntegerType).as("rank")): _*)

  /** Little-endian uint64 of md5 bytes [8,16) — the same value DuckDB's
    * `md5_number_lower` returns, so hyperplanes derived from it are
    * reproducible in plain SQL (the correctness oracle recomputes them). */
  private[ops] def md5LowerLE(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 15
    while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }

  /** Unit double in [0,1): unsigned md5LowerLE / 2^64 (both steps exact /
    * correctly rounded in any IEEE-754 engine). */
  private[ops] def md5Unit(s: String): Double =
    new java.math.BigInteger(java.lang.Long.toUnsignedString(md5LowerLE(s)))
      .doubleValue() / 1.8446744073709552E19

  /** Deterministic hyperplane `p`: component d = md5Unit("hp_{p}_{d}")*2-1.
    * Computed once on the driver and inlined as a literal array — the per-row
    * work is one fused multiply-add pass, not a hash per component. */
  def hyperplane(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map(d => md5Unit(s"hp_${p}_$d") * 2 - 1)

  private def planeSign(vec: Column, plane: Seq[Double]): Column = {
    val dot = aggregate(
      zip_with(vec, typedlit(plane), (x, h) => x.cast(DoubleType) * h),
      lit(0.0), (s, x) => s + x)
    when(dot >= 0, 1L).otherwise(0L)
  }

  /** LSH bucket id: `bits` hyperplane signs packed into a long. `planeOffset`
    * selects a disjoint plane set (multi-band LSH uses offset b*bits for
    * band b). */
  def lshBucket(vec: Column, bits: Int, dim: Int, planeOffset: Int = 0): Column =
    if (bits == 0) lit(0L) // degenerate: one bucket = exhaustive probe
    else (0 until bits).map(p => planeSign(vec, hyperplane(planeOffset + p, dim)) * (1L << p))
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
    rankTopK(scored, Seq("qid", "bucket"), k)
      .select("qid", "cid", "sim", "rank", "bucket")
  }

  /** Persist the candidate side of [[lshTopK]] as a bucket-partitioned
    * parquet index (one directory per LSH bucket). Signatures are computed
    * ONCE here instead of per query call — at corpus scale this is the
    * difference between O(N) signature work per top-k run and O(probed
    * buckets) reads. The md5-derived hyperplanes are deterministic, so the
    * index needs no stored model and is trivially incremental (append new
    * vectors with the same planes). */
  def buildLshIndex(candidates: DataFrame, path: String, bits: Int, dim: Int,
                    cId: String = "vec_id", cVec: String = "embedding"): Unit =
    candidates.select(col(cId).as("cid"), col(cVec).as("cv"),
        lshBucket(col(cVec), bits, dim).cast(IntegerType).as("bucket"))
      .write.options(graft.table.IceLite.localFsOptions(path))
      .mode("overwrite").partitionBy("bucket").parquet(path)

  /** Incremental append to a persisted LSH index: new vectors are signed
    * with the SAME deterministic hyperplanes and appended into their bucket
    * partitions — no rewrite of existing data, no model to reconcile. A
    * probe over (build(A) + append(B)) equals a probe over build(A ∪ B)
    * exactly (bucket membership is a pure function of the vector), which
    * OpsSpec pins. At corpus scale this makes index maintenance O(new
    * vectors), the natural shape for a streaming ingest sink. */
  def appendToLshIndex(newCandidates: DataFrame, path: String, bits: Int, dim: Int,
                       cId: String = "vec_id", cVec: String = "embedding"): Unit =
    newCandidates.select(col(cId).as("cid"), col(cVec).as("cv"),
        lshBucket(col(cVec), bits, dim).cast(IntegerType).as("bucket"))
      .write.options(graft.table.IceLite.localFsOptions(path))
      .mode("append").partitionBy("bucket").parquet(path)

  /** Top-k against a persisted LSH index. The query side is small by
    * contract, so its buckets are computed driver-side and pushed as a
    * PARTITION filter — the scan plans O(|probed buckets|) directories of
    * the index, never the corpus (PlanSpec pins the PartitionFilters). */
  def lshTopKIndexed(queries: DataFrame, indexPath: String, k: Int, bits: Int, dim: Int,
                     qId: String = "vec_id", qVec: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val q = queries.select(col(qId).as("qid"), col(qVec).as("qv"),
      lshBucket(col(qVec), bits, dim).cast(IntegerType).as("bucket"))
    val probed = q.select("bucket").distinct().collect().map(_.getInt(0)).sorted
    val idx = spark.read.options(graft.table.IceLite.localFsOptions(indexPath)).parquet(indexPath)
      .filter(col("bucket").isin(probed.map(Integer.valueOf).toSeq: _*))
    val scored = idx.join(broadcast(q), Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    rankTopK(scored, Seq("qid", "bucket"), k)
      .select("qid", "cid", "sim", "rank", "bucket")
  }

  // ---- IVF-flat (inverted file) ----

  /** Deterministic IVF coarse quantizer: `nCells` md5-derived centroids
    * (component c,d = md5Unit("ivf_{c}_{d}")*2-1) — reproducible in plain
    * SQL like the LSH hyperplanes, no trained model to store. */
  def ivfCentroids(nCells: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nCells).map(c => (0 until dim).map(d => md5Unit(s"ivf_${c}_$d") * 2 - 1))

  private def dotWith(vec: Column, w: Seq[Double]): Column =
    aggregate(zip_with(vec, typedlit(w), (x, h) => x.cast(DoubleType) * h),
      lit(0.0), (s, x) => s + x)

  /** IVF-flat top-k: candidates partition into inverted lists by nearest
    * centroid (argmax dot — the coarse quantizer); each query probes its
    * `nprobe` nearest cells. At scale the probe cost is
    * O(N * nprobe / nCells) per query; nprobe trades recall for probe cost
    * exactly like multi-probe LSH (recall measured in OpsSpec;
    * nprobe = nCells degenerates to exact brute force). */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int, nCells: Int, nprobe: Int, dim: Int,
              qId: String = "vec_id", cId: String = "vec_id",
              qVec: String = "embedding", cVec: String = "embedding"): DataFrame = {
    val cents = ivfCentroids(nCells, dim)
    def dotsArr(vec: Column): Column = array(cents.map(c => dotWith(vec, c)): _*)
    // nearest cell = first argmax (exact double equality with array_max is
    // safe: same value, same bits)
    val argmaxCell = "CAST(array_position(__dots, array_max(__dots)) - 1 AS INT)"
    // nprobe nearest cells, by dot desc then cell asc (deterministic ties)
    val probeCells =
      s"""transform(slice(array_sort(
         |  transform(sequence(0, ${nCells - 1}), i -> struct(element_at(__dots, i + 1) AS d, i AS i)),
         |  (a, b) -> CASE WHEN a.d > b.d THEN -1 WHEN a.d < b.d THEN 1
         |            WHEN a.i < b.i THEN -1 ELSE 1 END), 1, $nprobe), x -> CAST(x.i AS INT))""".stripMargin
    val c = candidates.select(col(cId).as("cid"), col(cVec).as("cv"))
      .withColumn("__dots", dotsArr(col("cv")))
      .withColumn("cell", expr(argmaxCell)).drop("__dots")
    val q0 = queries.select(col(qId).as("qid"), col(qVec).as("qv"))
      .withColumn("__dots", dotsArr(col("qv")))
    val q =
      if (nprobe <= 1) q0.withColumn("cell", expr(argmaxCell)).drop("__dots")
      else q0.withColumn("cell", explode(expr(probeCells))).drop("__dots")
    // candidates live in exactly one inverted list -> no per-(qid,cid) dedup
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    rankTopK(scored, Seq("qid"), k).select("qid", "cid", "sim", "rank")
  }

  // ---- product quantization (PQ) ------------------------------------------
  // The compressed-index ANN path: a D-dim float vector becomes M small
  // integer codes (one per subspace), cutting candidate storage from 4D
  // bytes to M bytes — at 100 TB this is what makes the candidate side fit
  // in memory/cache. Scoring is asymmetric (ADC): the query stays exact, a
  // candidate is approximated by its per-subspace codebook centroids, so
  // each candidate costs M lookups instead of D multiplies. Codebooks are
  // md5-derived (deterministic, SQL-reproducible — same convention as the
  // IVF/LSH constants; a trained k-means codebook would slot in here
  // unchanged, determinism is what the oracle gates need). No-residual
  // variant (codes quantize the raw vector, not cell residuals) — the same
  // choice faiss exposes as IndexIVFPQ(by_residual=false).

  /** Codebook centroid (subspace `m`, code `j`): subDim components in
    * [-1, 1), md5-derived. */
  def pqCentroid(m: Int, j: Int, subDim: Int): Seq[Double] =
    (0 until subDim).map(d => md5Unit(s"pq_${m}_${j}_$d") * 2 - 1)

  /** ||centroid||^2 by the same left fold both engines use. */
  private def pqCentNorm2(m: Int, j: Int, subDim: Int): Double =
    pqCentroid(m, j, subDim).foldLeft(0.0)((s, x) => s + x * x)

  /** Encode a vector column to `m` PQ codes: code_m = argmin_j of the
    * squared distance between the m-th subvector and codebook entry j
    * (first argmin on exact-double ties -> deterministic). Adds `codes`
    * (array<int>, length m). */
  def pqEncode(df: DataFrame, vecCol: String, dim: Int, m: Int, ksub: Int): DataFrame = {
    require(m * (dim / m) == dim, s"dim $dim not divisible by m $m")
    df.withColumn("codes", PqExprs.pqCodes(col(vecCol), dim, m, ksub))
  }

  /** PQ-flat top-k by asymmetric distance: per query, a (m x ksub) lookup
    * table of subspace dots is computed ONCE and broadcast with the query;
    * each candidate is scored from its codes by m table lookups. The
    * approximate cosine is adc / (||q|| * ||reconstruction||), with the
    * reconstruction norm exact from per-centroid norms (subspaces are
    * orthogonal coordinate blocks). Candidates may arrive pre-encoded
    * (`codes` column, the persisted-index case) — encoded on the fly
    * otherwise. */
  def pqTopK(queries: DataFrame, candidates: DataFrame, k: Int, dim: Int, m: Int, ksub: Int,
             qId: String = "vec_id", cId: String = "vec_id",
             qVec: String = "embedding", cVec: String = "embedding"): DataFrame = {
    val subDim = dim / m
    val enc =
      if (candidates.columns.contains("codes")) candidates.select(col(cId).as("cid"), col("codes"))
      else pqEncode(candidates.select(col(cId).as("cid"), col(cVec)), cVec, dim, m, ksub)
        .select(col("cid"), col("codes"))
    // query-side LUT: lut[m][j] = dot(q_m, cent_{m,j}); qnorm over all dims
    val qnorm = sqrt((0 until dim).foldLeft(lit(0.0)) { (s, d) =>
      val x = element_at(col(qVec), d + 1).cast(DoubleType); s + x * x
    })
    val q = queries.select(col(qId).as("qid"),
      PqExprs.pqLut(col(qVec), dim, m, ksub).as("lut"), qnorm.as("qn"))
    // candidate-side: adc = left fold over m of lut[m][code_m]; rec norm
    // from the centroid-norm literal table, same fold order
    val norms = (0 until m).map(mm => (0 until ksub).map(j => pqCentNorm2(mm, j, subDim)))
    val adc = (0 until m).foldLeft(lit(0.0)) { (s, mm) =>
      s + element_at(element_at(col("lut"), mm + 1), element_at(col("codes"), mm + 1) + 1)
    }
    val rec2 = (0 until m).foldLeft(lit(0.0)) { (s, mm) =>
      s + element_at(typedlit(norms(mm)), element_at(col("codes"), mm + 1) + 1)
    }
    val scored = enc.crossJoin(broadcast(q))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", adc / (col("qn") * sqrt(rec2)))
    rankTopK(scored, Seq("qid"), k).select("qid", "cid", "rank")
  }

  /** IVF-PQ: coarse routing by nearest IVF cell (argmax dot, `nprobe`
    * nearest cells probed per query) + PQ/ADC scoring inside the probed
    * lists — the classical two-level compressed index: probe cost
    * O(N * nprobe / nCells) candidates x m lookups each. With
    * nprobe = nCells it degenerates to exactly [[pqTopK]] (pinned in
    * OpsSpec). */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                nCells: Int, nprobe: Int, dim: Int, m: Int, ksub: Int,
                qId: String = "vec_id", cId: String = "vec_id",
                qVec: String = "embedding", cVec: String = "embedding"): DataFrame = {
    val subDim = dim / m
    val cents = ivfCentroids(nCells, dim)
    def dotsArr(vec: Column): Column = array(cents.map(c => dotWith(vec, c)): _*)
    val argmaxCell = "CAST(array_position(__dots, array_max(__dots)) - 1 AS INT)"
    val probeCells =
      s"""transform(slice(array_sort(
         |  transform(sequence(0, ${nCells - 1}), i -> struct(element_at(__dots, i + 1) AS d, i AS i)),
         |  (a, b) -> CASE WHEN a.d > b.d THEN -1 WHEN a.d < b.d THEN 1
         |            WHEN a.i < b.i THEN -1 ELSE 1 END), 1, $nprobe), x -> CAST(x.i AS INT))""".stripMargin
    val c = pqEncode(
      candidates.select(col(cId).as("cid"), col(cVec))
        .withColumn("__dots", dotsArr(col(cVec)))
        .withColumn("cell", expr(argmaxCell)).drop("__dots"),
      cVec, dim, m, ksub).select(col("cid"), col("cell"), col("codes"))
    val qnorm = sqrt((0 until dim).foldLeft(lit(0.0)) { (s, d) =>
      val x = element_at(col("__qv"), d + 1).cast(DoubleType); s + x * x
    })
    val q = queries.select(col(qId).as("qid"), col(qVec).as("__qv"))
      .withColumn("lut", PqExprs.pqLut(col("__qv"), dim, m, ksub)).withColumn("qn", qnorm)
      .withColumn("__dots", dotsArr(col("__qv")))
      .withColumn("cell", explode(expr(probeCells)))
      .select("qid", "lut", "qn", "cell")
    val norms = (0 until m).map(mm => (0 until ksub).map(j => pqCentNorm2(mm, j, subDim)))
    val adc = (0 until m).foldLeft(lit(0.0)) { (s, mm) =>
      s + element_at(element_at(col("lut"), mm + 1), element_at(col("codes"), mm + 1) + 1)
    }
    val rec2 = (0 until m).foldLeft(lit(0.0)) { (s, mm) =>
      s + element_at(typedlit(norms(mm)), element_at(col("codes"), mm + 1) + 1)
    }
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", adc / (col("qn") * sqrt(rec2)))
    rankTopK(scored, Seq("qid"), k).select("qid", "cid", "rank")
  }

  /** Multi-probe LSH top-k: each query probes its own bucket PLUS the `bits`
    * buckets at Hamming distance 1 (one sign flipped) — the standard
    * multi-probe recall lever: a near neighbour that disagrees on exactly
    * one hyperplane is recovered at (bits+1)x probe cost instead of being
    * lost. Candidates stay uniquely bucketed, so no per-(qid,cid) dedup is
    * needed before ranking. Recall(single) <= recall(multi) by construction
    * (the probe set is a superset) — measured in OpsSpec. */
  def lshTopKMultiProbe(queries: DataFrame, candidates: DataFrame, k: Int, bits: Int, dim: Int,
                        qId: String = "vec_id", cId: String = "vec_id",
                        qVec: String = "embedding", cVec: String = "embedding"): DataFrame = {
    val q0 = queries.select(col(qId).as("qid"), col(qVec).as("qv"),
      lshBucket(col(qVec), bits, dim).as("b0"))
    val probes = array(Seq(col("b0")) ++
      (0 until bits).map(p => col("b0").bitwiseXOR(lit(1L << p))): _*)
    val q = q0.select(col("qid"), col("qv"), explode(probes).as("bucket"))
    val c = candidates.select(col(cId).as("cid"), col(cVec).as("cv"),
      lshBucket(col(cVec), bits, dim).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    rankTopK(scored, Seq("qid"), k).select("qid", "cid", "sim", "rank")
  }

  // ---- k-means-trained IVF -------------------------------------------------
  // The md5-derived IVF centroids above are data-independent; on real
  // corpora a TRAINED coarse quantizer cuts probe cost 2-5x at equal recall
  // (faiss's default). Training is Lloyd's iterations expressed as Spark
  // jobs: assignment is a map-side argmin against broadcast centroids (no
  // shuffle of the vectors), the update is one partial-aggregating
  // groupBy(cell, dim) whose shuffle is O(partitions x k x dim) rows —
  // a pass over 100 TB of vectors moves kilobytes. Determinism for the SQL
  // oracle: seeds are the k smallest-id vectors, every updated component is
  // rounded to 6 dp (absorbs float-summation order differences between
  // engines), empty cells keep their previous centroid, argmin ties break
  // to the lowest cell.

  /** Squared L2 distance of a double-array column to a literal centroid,
    * left-fold order (both engines reduce lists left-to-right). */
  private def l2With(vec: Column, cent: Seq[Double]): Column =
    aggregate(zip_with(vec, typedlit(cent), (x, c) => (x - c) * (x - c)),
      lit(0.0), (s, x) => s + x)

  /** Adds `out` = index of the nearest centroid (min L2, first-match ties ->
    * lowest cell). `vecCol` must already be array<double>. */
  private def withNearestCell(df: DataFrame, vecCol: String,
                              cents: Seq[Seq[Double]], out: String): DataFrame =
    df.withColumn("__d", array(cents.map(c => l2With(col(vecCol), c)): _*))
      .withColumn(out, expr("CAST(array_position(__d, array_min(__d)) - 1 AS INT)"))
      .drop("__d")

  /** Train `k` coarse-quantizer centroids with `iters` Lloyd's iterations.
    * Returns the k x dim centroid matrix (driver-held; k*dim doubles). */
  def kmeansCentroids(candidates: DataFrame, k: Int, iters: Int,
                      cId: String = "vec_id", cVec: String = "embedding"): Seq[Seq[Double]] = {
    // The seed pass + every Lloyd iteration scans the candidate set; an
    // uncached frame re-reads (and re-decodes) the source each time — the
    // standard k-means caching move (MLlib does the same). Lifecycle is
    // fully internal: every use below is an eager collect(), so the cache
    // is dropped before returning.
    val c = candidates.select(col(cId).cast(LongType).as("cid"),
      transform(col(cVec), x => x.cast(DoubleType)).as("cv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: Seq[Seq[Double]] = c.orderBy("cid").limit(k).collect()
        .map(r => r.getSeq[Double](1): Seq[Double]).toSeq
      var it = 0
      while (it < iters) {
        // per-(cell, dim) mean: posexplode keeps the whole update inside one
        // partial-aggregating hash agg; only k x dim x partitions rows shuffle
        // 6-dp quantization as PURE double arithmetic (floor(x*1e6+0.5)/1e6):
        // bit-identical in any IEEE engine given the same avg, unlike round()
        // whose BigDecimal-vs-C++ implementations differ in the last ulp
        val upd = withNearestCell(c, "cv", cents, "cell")
          .select(col("cell"), posexplode(col("cv")).as(Seq("pos", "x")))
          .groupBy("cell", "pos")
          .agg((floor(avg(col("x")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("m"))
          .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
        cents = cents.zipWithIndex.map { case (old, cell) =>
          old.indices.map(d => upd.getOrElse((cell, d), old(d)))
        }
        it += 1
      }
      cents
    } finally c.unpersist(blocking = false): Unit
  }

  /** IVF-flat top-k over a TRAINED quantizer: like [[ivfTopK]] but cells
    * come from [[kmeansCentroids]] (argmin L2 instead of argmax dot — the
    * standard k-means geometry). Each query probes its `nprobe` nearest
    * cells; candidates live in exactly one inverted list, so no per-pair
    * dedup is needed before ranking. */
  def kmeansIvfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
                    nCells: Int, nprobe: Int, iters: Int,
                    qId: String = "vec_id", cId: String = "vec_id",
                    qVec: String = "embedding", cVec: String = "embedding"): DataFrame = {
    val cents = kmeansCentroids(candidates, nCells, iters, cId, cVec)
    val c = withNearestCell(
      candidates.select(col(cId).as("cid"),
        transform(col(cVec), x => x.cast(DoubleType)).as("cv")),
      "cv", cents, "cell")
    val q0 = queries.select(col(qId).as("qid"),
      transform(col(qVec), x => x.cast(DoubleType)).as("qv"))
    // nprobe nearest cells, by distance asc then cell asc (deterministic)
    val probeCells =
      s"""transform(slice(array_sort(
         |  transform(sequence(0, ${nCells - 1}), i -> struct(element_at(__d, i + 1) AS d, i AS i)),
         |  (a, b) -> CASE WHEN a.d < b.d THEN -1 WHEN a.d > b.d THEN 1
         |            WHEN a.i < b.i THEN -1 ELSE 1 END), 1, $nprobe), x -> CAST(x.i AS INT))""".stripMargin
    val q =
      if (nprobe <= 1) withNearestCell(q0, "qv", cents, "cell")
      else q0.withColumn("__d", array(cents.map(cc => l2With(col("qv"), cc)): _*))
        .withColumn("cell", explode(expr(probeCells))).drop("__d")
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    rankTopK(scored, Seq("qid"), k).select("qid", "cid", "sim", "rank")
  }
}
