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
                 threshold: Double = 0.5, hashKernel: String = "xx",
                 maxBucket: Int = 100000,
                 dropObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
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
    val banded0 = base.select(col("id"), posexplode(bandCol).as(Seq("band", "bucket")))
    // Bucket-size cap: the banded self-join is O(n^2) WITHIN a bucket, so one
    // degenerate bucket (empty/boilerplate docs sharing a shingle set) would
    // go quadratic at corpus scale. Buckets above `maxBucket` are dropped —
    // their members are overwhelmingly mutual near-dups of one boilerplate
    // cluster, which exact dedup (or a lowered cap + re-run on the dropped
    // set) handles at O(n). `dropObs` piggybacks a dropped-bucket count onto
    // the job (no extra action).
    val banded = capBuckets(banded0, maxBucket, dropObs)
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

  /** Shared kernel for the persisted MinHash index: per-doc shingle hashes
    * and exploded (band, bucket) keys, under either hash kernel. */
  private def shingleBands(df: DataFrame, idCol: String, textCol: String,
                           numHashes: Int, bands: Int, shingleWidth: Int,
                           hashKernel: String): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val base = df.select(col(idCol).as("id"),
      (if (hashKernel == "md5") Md5MinHash.shingleHashes(col(textCol), shingleWidth)
       else TextHashExprs.shingleHashes(col(textCol), shingleWidth)).as("sh"))
    val bandCol =
      if (hashKernel == "md5") Md5MinHash.minhashBands(col("sh"), numHashes, bands)
      else MinHashSigExpr.minhashBands(col("sh"), numHashes, bands)
    base.select(col("id"), col("sh"), posexplode(bandCol).as(Seq("band", "bucket")))
  }

  /**
   * Persist a MinHash-LSH signature index for INCREMENTAL corpus dedup:
   * each doc's (band, bucket) keys with its shingle-hash set, written as
   * parquet partitioned by `p = pmod(bucket, nPartitions)` so a probe scans
   * only the partitions its own buckets can live in. Shingle hashes ride
   * next to the band keys (storage x bands) so candidate verification needs
   * NO second corpus lookup — the one partition-pruned join returns
   * everything the Jaccard check needs. This is the streaming-ingest shape:
   * dedup each incoming batch against a 100 TB corpus at
   * O(batch x bands + collided buckets), never O(corpus).
   *
   * On-disk layout is LSM-segment-shaped: `seg=<name>/p=<n>/part-*.parquet`.
   * The build writes `seg=base`; [[dedupAgainstIndex]] appends survivor
   * segments. A segment named by the ingest epoch can be idempotently
   * REWRITTEN (dynamic partition overwrite), which is what gives the
   * streaming sink exactly-once index maintenance under at-least-once
   * batch redelivery.
   */
  def buildMinhashIndex(df: DataFrame, idCol: String, textCol: String, path: String,
                        numHashes: Int = 64, bands: Int = 16, shingleWidth: Int = 3,
                        hashKernel: String = "xx", nPartitions: Int = 64,
                        maxBucket: Int = 100000,
                        dropObs: Option[org.apache.spark.sql.Observation] = None): Unit =
    // Same degenerate-bucket cap as [[minhashLsh]], applied at WRITE time:
    // a boilerplate bucket holding B corpus docs would otherwise add B
    // candidates to every future batch doc that touches it, forever. Capped
    // buckets are dropped whole (their members are mutual near-dups of one
    // boilerplate cluster — exact dedup handles those at O(n)).
    {
      val rows = capBuckets(
        shingleBands(df, idCol, textCol, numHashes, bands, shingleWidth, hashKernel),
        maxBucket, dropObs)
        .withColumn("seg", lit("base"))
        .withColumn("p", pmod(col("bucket"), lit(nPartitions.toLong)).cast(IntegerType))
      // Cluster by the partition column before the dynamic-partition write:
      // an unclustered input makes EVERY task open a file in every p= dir it
      // touches (up to tasks x nPartitions tiny files; a single-task input
      // writes all nPartitions directories serially). One file per p keeps
      // the index at O(nPartitions) files and the write parallel.
      clusterForPartitionedWrite(rows, "p", nPartitions)
        .write.options(graft.table.IceLite.localFsOptions(path))
        .mode("overwrite").partitionBy("seg", "p").parquet(path)
    }

  /**
   * Dedup a new batch against a persisted MinHash index: returns
   * (id, dup_of, jaccard) for every batch doc whose exact Jaccard against
   * some indexed doc reaches `threshold` (dup_of = the best match, ties on
   * the smaller indexed id). When `appendSurvivors` is set, the signatures
   * of NON-duplicate batch docs are appended into the index's bucket
   * partitions — sequential ingests then keep deduping against everything
   * accepted so far, the exactly-the-stream-sink shape. Intra-batch
   * near-dups are the caller's composition ([[minhashLsh]] + [[components]]
   * on the batch) — this probe is strictly batch-vs-corpus.
   *
   * Parameters must match the index build; they are not stored (the index
   * is plain parquet + layout convention, like [[Similarity.buildLshIndex]]).
   *
   * `segment` names the survivor segment for EXACTLY-ONCE ingest: the probe
   * excludes that segment from the corpus view (a redelivered batch must
   * not see its own first-attempt leftovers) and the append REWRITES it via
   * dynamic partition overwrite, so re-running the same batch converges to
   * the identical index state and the identical dupes frame. Without
   * `segment`, appends accumulate under `seg=append` (fast path, not
   * redelivery-safe). Self-matches (an indexed id probing itself) are
   * always excluded.
   */
  def dedupAgainstIndex(newDocs: DataFrame, path: String, idCol: String, textCol: String,
                        numHashes: Int = 64, bands: Int = 16, shingleWidth: Int = 3,
                        threshold: Double = 0.5, hashKernel: String = "xx",
                        nPartitions: Int = 64, appendSurvivors: Boolean = false,
                        maxBucket: Int = 100000, segment: Option[String] = None,
                        checkpointDir: Option[String] = None): DataFrame = {
    val spark = newDocs.sparkSession
    // The batch side carries the same degenerate-bucket cap as the index
    // build: candidates per bucket are then <= maxBucket^2 even when the
    // "batch" is itself corpus-sized (backfill runs), never unbounded.
    // The banded batch is read three times (probed-partition collect, the
    // candidate join, and the survivor anti-join) and its dominant cost is
    // the per-doc shingle hashing — cache it so the hashes compute ONCE per
    // probe instead of once per consumer. Size is O(batch x bands), the
    // stream-batch design point; MEMORY_AND_DISK spills backfill-sized
    // batches. The appendSurvivors path unpersists after its last use; the
    // probe-only return stays lazily dependent on the cache, which Spark's
    // ContextCleaner drops once the returned frame is unreachable.
    val batch = capBuckets(
      shingleBands(newDocs, idCol, textCol, numHashes, bands, shingleWidth, hashKernel),
      maxBucket, dropObs = None)
      .withColumn("p", pmod(col("bucket"), lit(nPartitions.toLong)).cast(IntegerType))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // probe only the partitions the batch's own buckets hash into — for a
    // stream-sized batch that is a strict subset of the index directories
    val probedPs = batch.select("p").distinct().collect().map(_.getInt(0)).sorted
    // Explicit schema (batch side + the seg partition column): an index
    // whose build dropped every bucket is an EMPTY parquet dir, and schema
    // inference cannot read one — an empty corpus index must mean "no
    // duplicates", not a crash.
    val idxSchema = org.apache.spark.sql.types.StructType(
      batch.schema.fields :+ org.apache.spark.sql.types.StructField("seg", StringType))
    // Enumerate the probed seg=/p= directories DRIVER-side instead of
    // pointing the reader at the whole root: a root read lists every
    // partition directory (above 32 paths Spark launches a distributed
    // listing job per probe), while the probe only ever touches
    // O(segments x probed buckets) of them. One listStatus per segment dir,
    // names intersected with the probed set — no per-path existence probes.
    val rootP = new org.apache.hadoop.fs.Path(path)
    val fs = graft.table.IceLite.fsFor(rootP, spark.sparkContext.hadoopConfiguration)
    val probedSet = probedPs.map(p => s"p=$p").toSet
    val probedDirs: Seq[String] =
      if (!fs.exists(rootP)) Nil
      else fs.listStatus(rootP).toSeq.filter(s => s.isDirectory && s.getPath.getName.startsWith("seg="))
        .flatMap(seg => fs.listStatus(seg.getPath).toSeq
          .filter(p => p.isDirectory && probedSet.contains(p.getPath.getName))
          .map(_.getPath.toString))
    val idx0 =
      if (probedDirs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], idxSchema)
      else {
        // Above spark.sql.sources.parallelPartitionDiscovery.threshold
        // (default 32) paths, building the read's file index launches a
        // DISTRIBUTED listing job — one task per directory, a full job
        // submission on every probe (measured 0.15-0.2 s per probe at 64
        // partitions). The probed dirs were just enumerated driver-side;
        // listing their files is O(probed dirs) metadata calls the driver's
        // own listing pool does in milliseconds, so raise the threshold for
        // the duration of the (eager) file-index build and restore it.
        // Backfill-scale probes over >1024 dirs keep the distributed job.
        val thresholdKey = "spark.sql.sources.parallelPartitionDiscovery.threshold"
        val prior = spark.conf.get(thresholdKey)
        val bump = probedDirs.size <= 1024 && probedDirs.size > prior.toInt
        if (bump) spark.conf.set(thresholdKey, (probedDirs.size + 1).toString)
        try spark.read.options(graft.table.IceLite.localFsOptions(path))
          .schema(idxSchema).option("basePath", path).parquet(probedDirs: _*)
        finally if (bump) spark.conf.set(thresholdKey, prior)
      }
    // A redelivered batch must not dedup against its own first-attempt
    // segment — partition-pruned out, then rewritten below.
    val idx = segment.fold(idx0)(s => idx0.filter(col("seg") =!= s))
      .select(col("id").as("dup_of"), col("sh").as("sh_i"), col("band"), col("bucket"))
    // Jaccard computes AT the collision site, before any exchange: a pair
    // colliding in several bands pays the (cheap, map-side) set arithmetic
    // once per band, but the pair-dedup exchange then carries only
    // (id, dup_of, jaccard) scalars instead of both shingle-hash arrays —
    // and the dedup becomes a map-side-combining HashAggregate instead of
    // the SortAggregate an array-typed first() buffer forces (guide §2.3:
    // shuffle metadata, not payloads). jaccard is a pure function of the
    // pair, so first() over identical values is exact.
    val cand = batch.join(idx, Seq("band", "bucket"))
      .filter(col("id") =!= col("dup_of")) // a doc is never its own dup
      .withColumn("jaccard", round(
        size(array_intersect(col("sh"), col("sh_i"))).cast(DoubleType) /
          size(array_union(col("sh"), col("sh_i"))).cast(DoubleType), 4))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("id"), col("dup_of"))
      .agg(first(col("jaccard")).as("jaccard"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("jaccard").desc, col("dup_of").asc)
    val dupes = cand
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select("id", "dup_of", "jaccard")
    if (appendSurvivors) {
      // materialize BEFORE mutating the index: the returned frame must not
      // lazily re-probe a directory that now contains this batch's own
      // signatures (every survivor would suddenly "match" itself at 1.0).
      // `checkpointDir` selects RELIABLE checkpointing (same contract as
      // [[components]]): on a real cluster an executor lost between this
      // materialize and the survivor append would otherwise recompute the
      // probe against the mutated index; local blocks are the cheap default
      // for local mode and rerun-tolerant jobs. KNOWN SIDE EFFECT: Spark
      // keeps ONE checkpoint dir per SparkContext, so passing a dir here
      // repoints the shared context's checkpoint location for the host
      // application too (df.checkpoint offers no per-call dir). Callers
      // that checkpoint elsewhere should pass that same dir — or None.
      val mat = checkpointDir match {
        case Some(dir) =>
          val sc = dupes.sparkSession.sparkContext
          if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
          dupes.checkpoint(true)
        case None => dupes.localCheckpoint(true)
      }
      // Appended survivors inherit the batch-side cap above; each append
      // still adds up to maxBucket rows per bucket, so a long-lived bucket
      // can exceed the cap across MANY appends — rebuild the index
      // periodically (buildMinhashIndex over accepted docs) the way any
      // LSM-shaped structure compacts.
      val survivors = clusterForPartitionedWrite(
        batch.join(mat.select(col("id")).distinct(), Seq("id"), "left_anti")
          .withColumn("seg", lit(segment.getOrElse("append"))), "p", nPartitions)
      segment match {
        case Some(_) =>
          // Idempotent: dynamic partition overwrite rewrites ONLY this
          // batch's seg=<key> partitions — redelivery converges.
          survivors.write.options(graft.table.IceLite.localFsOptions(path))
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("seg", "p").parquet(path)
        case None =>
          survivors.write.options(graft.table.IceLite.localFsOptions(path))
            .mode("append").partitionBy("seg", "p").parquet(path)
      }
      batch.unpersist(blocking = false): Unit // survivor write was the last read
      mat
    } else dupes
  }

  /**
   * Compact a MinHash index's accumulated survivor segments back into one
   * `seg=base` generation — the LSM maintenance step the per-epoch appends
   * assume. Re-applies the bucket cap GLOBALLY (per-append caps admit up to
   * `maxBucket` rows per bucket per epoch, so a long-lived boilerplate
   * bucket grows past the cap cumulatively). Rewrites via a sibling temp
   * dir + swap; run it offline (no probes in flight), like any table
   * compaction. No-op on an empty index.
   */
  def compactMinhashIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                          nPartitions: Int = 64, maxBucket: Int = 100000): Unit = {
    val cur = try spark.read.options(graft.table.IceLite.localFsOptions(path))
      .parquet(path).drop("seg", "p")
      catch { case _: org.apache.spark.sql.AnalysisException => return }
    val tmp = path.stripSuffix("/") + ".compacting"
    clusterForPartitionedWrite(
      capBuckets(cur, maxBucket, dropObs = None)
        .withColumn("seg", lit("base"))
        .withColumn("p", pmod(col("bucket"), lit(nPartitions.toLong)).cast(IntegerType)),
      "p", nPartitions)
      .write.options(graft.table.IceLite.localFsOptions(tmp))
      .mode("overwrite").partitionBy("seg", "p").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(conf)
    fs.delete(dst, true)
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dst))
      throw new java.io.IOException(s"compactMinhashIndex: rename $tmp -> $path failed")
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
    val kept = capBuckets(banded, maxBucket, dropObs = None)
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
    * (hamming-distance-tolerant banding). Same `maxBucket` posture as
    * [[minhashLsh]]: a degenerate band bucket (e.g. the all-zeros signature
    * of empty docs) is dropped instead of going quadratic. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxBucket: Int = 100000,
                   dropObs: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val sigs = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val banded0 = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sig"), b * 16).bitwiseAND(0xFFFFL))).as(Seq("band", "bucket")))
    val banded = capBuckets(banded0, maxBucket, dropObs)
    val a = banded.alias("a"); val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
  }

  /**
   * Duplicate-group resolution: connected components over a near-dup pair
   * graph — the step after any of the pair generators above, turning pairs
   * into groups with one canonical survivor (A~B, B~C => {A,B,C} keep the
   * min id).
   *
   * Algorithm: iterative min-label propagation with pointer jumping (label
   * <- label(label) each round), so even path-shaped graphs converge in
   * O(log n) rounds — each round is two joins + an aggregation, all
   * key-partitioned shuffles; no driver-side graph state, no RDDs. Lineage
   * is truncated per round: `checkpointDir` selects RELIABLE checkpointing
   * (`df.checkpoint()` to that directory — survives executor loss; the
   * right choice on a real cluster, pointed at HDFS/object storage);
   * when absent, `localCheckpoint` (executor-local blocks — cheapest, fine
   * in local mode and for fault-tolerance-via-rerun jobs).
   *
   * Returns (id, component, keep): every node of the pair graph, its group's
   * min id, and whether this row is the group's canonical survivor.
   */
  def components(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
                 maxIters: Int = 50, checkpointDir: Option[String] = None): DataFrame = {
    val truncate: DataFrame => DataFrame = checkpointDir match {
      case Some(dir) =>
        val sc = pairs.sparkSession.sparkContext
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df => df.checkpoint(true)
      case None => df => df.localCheckpoint(true)
    }
    val e0 = pairs.select(col(idA).cast(LongType).as("src"), col(idB).cast(LongType).as("dst"))
    val edges = truncate(
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst"))).distinct())
    // round 0: label(v) = min(v, neighbors)
    var labels = truncate(edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("__m"))
      .select(col("id"), least(col("id"), col("__m")).as("lbl")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // propagate the min label across edges; carry the pre-round label so
      // the convergence check can ride the same job
      val nbr = edges
        .join(labels.select(col("id").as("dst"), col("lbl").as("__nl")), Seq("dst"))
        .groupBy(col("src").as("id")).agg(min(col("__nl")).as("__pl"))
      val prop = labels.join(nbr, Seq("id"), "left")
        .select(col("id"), col("lbl").as("__ol"),
          least(col("lbl"), coalesce(col("__pl"), col("lbl"))).as("lbl"))
      // pointer jumping: lbl <- lbl(lbl) halves chain depth every round
      val jumped = prop.alias("u")
        .join(prop.select(col("id").as("__ji"), col("lbl").as("__jl")).alias("j"),
          col("u.lbl") === col("__ji"), "left")
        .select(col("u.id").as("id"), col("u.__ol").as("__ol"),
          least(col("u.lbl"), coalesce(col("__jl"), col("u.lbl"))).as("lbl"))
      // convergence count piggybacks on the checkpoint's materialization via
      // observe() — one action per round, not two (the old formulation ran a
      // separate join + limit(1).count() against the previous labels)
      val obs = new org.apache.spark.sql.Observation(s"cc_converge_$iter")
      val updated = truncate(
        jumped.observe(obs, count(when(col("lbl") =!= col("__ol"), 1)).as("changed"))
          .drop("__ol"))
      labels = updated
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      iter += 1
    }
    labels.select(col("id"), col("lbl").as("component"),
      (col("id") === col("lbl")).as("keep"))
  }

  /** Benchmark decontamination: drop every corpus document sharing at least
    * one w-word shingle with the benchmark/eval set — the standard guard
    * against test-set leakage into training data. Plan shape: corpus
    * shingles explode to (id, hash) and hash-join the DISTINCT benchmark
    * shingle set (eval suites are MBs vs a 100 TB corpus — broadcast by
    * construction); contaminated ids anti-join the corpus. Cost is one pass
    * over the corpus text plus a
    * semi-join keyed on the shingle hash, never an all-pairs comparison.
    * `hashKernel` "xx" (default, fastest) or "md5" (SQL-reproducible — the
    * oracle recomputes the hashes). */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    shingleWidth: Int = 3,
                    hashKernel: String = "xx"): DataFrame = {
    def sh(c: Column): Column =
      if (hashKernel == "md5") Md5MinHash.shingleHashes(c, shingleWidth)
      else TextHashExprs.shingleHashes(c, shingleWidth)
    val corpusShingles = corpus.select(col(idCol), explode(sh(col(textCol))).as("__h"))
    val benchShingles = benchmark
      .select(explode(sh(col(benchTextCol))).as("__h")).distinct()
    val contaminated = corpusShingles
      .join(broadcast(benchShingles), Seq("__h"))
      .select(idCol).distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Cluster rows by a partition column before a dynamic-partition write,
    * capped at the session's shuffle width (labels beyond it just share
    * tasks; partitions beyond the label count would be empty). */
  private def clusterForPartitionedWrite(df: DataFrame, partCol: String,
                                         nLabels: Int): DataFrame = {
    val sess = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartition(math.max(1, math.min(nLabels, sess)), col(partCol))
  }

  /** Drop (band, bucket) groups larger than `maxBucket` from a banded
    * (… , band, bucket) frame before its self-join. A window count over ONE
    * (band, bucket) exchange — the previous groupBy-sizes + join shape
    * planned the banded subtree TWICE (the shingle/band hashing is the
    * expensive part of every caller) plus a broadcast; the window's
    * exchange is also exactly the partitioning the candidate self-join
    * needs, so Spark's exchange reuse computes the banded side once for
    * both join inputs. When `dropObs` is given, the dropped-bucket/row
    * counts ride the same job via observe(). */
  private def capBuckets(banded: DataFrame, maxBucket: Int,
                         dropObs: Option[org.apache.spark.sql.Observation]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")
    val withN = banded.withColumn("__bn", count(lit(1)).over(w))
    val annotated = dropObs match {
      case Some(obs) => withN
        .withColumn("__rn", row_number().over(w.orderBy("id")))
        .observe(obs,
          count(when(col("__bn") > maxBucket && col("__rn") === 1, 1)).as("dropped_buckets"),
          sum(when(col("__bn") > maxBucket, lit(1L))).as("dropped_rows"))
        .drop("__rn")
      case None => withN
    }
    annotated.filter(col("__bn") <= maxBucket).drop("__bn")
  }
}
