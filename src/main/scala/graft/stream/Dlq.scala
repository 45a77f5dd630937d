package graft.stream

import graft.table.IceLite
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Dead-letter queue for the ingest path — the Spark-sink analog of Kafka
 * Connect's `errors.tolerance=all` + DLQ topic, the runtime the reference's
 * SMTs deploy under: where the reference THROWS on a contract violation
 * (`smt/Outbox.java:108,114,203` raise `DataException` and the worker's
 * error handling decides fail-vs-route), a set-at-a-time sink must not let
 * one poisoned event fail a whole epoch. [[split]] routes the violating
 * rows of a change batch to a parquet DLQ with an error label and returns
 * the clean remainder for the MERGE.
 *
 * Contract checks (the merge input contract, `MergeInto.scala` header):
 * null/empty key -> `null_key`; op outside c/u/r/d -> `bad_op`; null lsn ->
 * `null_lsn`; null payload on a non-delete -> `null_payload`. Checks are
 * ordered — a row reports its FIRST violation.
 *
 * Exactly-once without side state (the [[graft.table.CdcOut]] pattern): each
 * epoch's bad rows publish atomically as `epoch_<key>/` (staging dir +
 * `_committed` marker + rename), so a re-delivered epoch never doubles DLQ
 * rows — the re-run sees the marker and skips. A crash before the rename
 * leaves invisible staging residue the re-run overwrites. Epochs with zero
 * violations publish nothing.
 *
 * DLQ record schema is table-agnostic (payload carried as JSON, like a DLQ
 * topic's raw bytes + headers): (key, op, lsn, payload, error, epoch).
 */
object Dlq {

  private val Marker = "_committed"
  private val ConsumedMarker = "_consumed"
  private val DirRe = "^epoch_.*$".r

  /** DLQ record schema ([[read]] needs it up front: a DLQ holding only
    * empty epochs has no footers to infer from). */
  val schema: StructType = StructType(Seq(
    StructField("key", StringType), StructField("op", StringType),
    StructField("lsn", LongType), StructField("payload", StringType),
    StructField("error", StringType), StructField("epoch", StringType)))

  /** First violated contract rule as an error label; null for clean rows. */
  def errorOf(keyColumn: String): Column =
    when(col(keyColumn).isNull || col(keyColumn) === "", "null_key")
      .when(!col("op").isin("c", "u", "r", "d"), "bad_op")
      .when(col("lsn").isNull, "null_lsn")
      .when(col("op") =!= "d" && col("after").isNull, "null_payload")

  /** Route `batch`'s contract-violating rows to the DLQ under `epochKey`
    * (idempotently — a marker-committed epoch is never rewritten) and
    * return (clean remainder, violations routed). Scans the batch twice;
    * callers on the hot path should hand in a cached batch (the pipeline
    * does). */
  def split(batch: DataFrame, keyColumn: String, dlqRoot: String,
            epochKey: String): (DataFrame, Long) = {
    val err = errorOf(keyColumn)
    val clean = batch.filter(err.isNull)
    val bad = batch.withColumn("error", err).filter(col("error").isNotNull)
      .select(col(keyColumn).cast(StringType).as("key"), col("op"),
        col("lsn").cast(LongType).as("lsn"), to_json(col("after")).as("payload"),
        col("error"), lit(epochKey).as("epoch"))
    (clean, publishEpoch(batch.sparkSession, bad, dlqRoot, epochKey))
  }

  /** Kafka-Connect-style DESERIALIZATION error routing (the converter half
    * of `errors.tolerance=all`, upstream of [[split]]'s sink contract): rows
    * whose `jsonColumn` is non-null, non-empty, and NOT valid JSON route as
    * `parse_error` carrying the raw text; the clean remainder (valid JSON,
    * plus null/empty pass-through — the tombstone contract, reference O2)
    * continues to [[graft.smt.JsonDeserialize]]. Without this, lenient mode
    * silently nulls unparseable payloads and strict mode fails the epoch.
    * Validity is the codegen'd native `try_parse_json` — no UDF, no second
    * Jackson pass. Same marker-idempotent epoch publish as [[split]]. */
  def splitJson(batch: DataFrame, jsonColumn: String, keyColumn: String,
                dlqRoot: String, epochKey: String): (DataFrame, Long) = {
    val j = col(jsonColumn).cast(StringType)
    val isBad = j.isNotNull && j =!= "" && try_parse_json(j).isNull
    val clean = batch.filter(!isBad)
    val opCol = if (batch.columns.contains("op")) col("op") else lit(null).cast(StringType)
    val lsnCol = if (batch.columns.contains("lsn")) col("lsn").cast(LongType)
                 else lit(null).cast(LongType)
    val bad = batch.filter(isBad)
      .select(col(keyColumn).cast(StringType).as("key"), opCol.as("op"),
        lsnCol.as("lsn"), j.as("payload"),
        lit("parse_error").as("error"), lit(epochKey).as("epoch"))
    (clean, publishEpoch(batch.sparkSession, bad, dlqRoot, epochKey))
  }

  /** Atomic, idempotent publish of one epoch's bad rows: skip if the epoch's
    * marker already exists (redelivery), write nothing for a clean epoch,
    * else stage + marker + rename. Returns rows routed (0 on skip). */
  private def publishEpoch(spark: SparkSession, bad: DataFrame, dlqRoot: String,
                           epochKey: String): Long = {
    val seg = epochKey.replaceAll("[^A-Za-z0-9_.-]", "_")
    val fs = IceLite.fsFor(new Path(dlqRoot), spark.sparkContext.hadoopConfiguration)
    val finalP = new Path(dlqRoot, s"epoch_$seg")
    if (fs.exists(new Path(finalP, Marker)))
      return 0L // re-delivered epoch: already routed, never doubled
    // The routed count rides the write job via observe() — the previous
    // count-then-write scanned (and re-evaluated the violation checks on)
    // the batch twice. A clean epoch now writes an empty staging dir and
    // deletes it: same one pass, same "zero violations publish nothing"
    // contract (no marker, no epoch dir).
    val obs = org.apache.spark.sql.Observation()
    val staging = new Path(dlqRoot, s".stage_epoch_$seg")
    bad.observe(obs, count(lit(1)).as("n"))
      .write.options(IceLite.localFsOptions(dlqRoot))
      .mode("overwrite").parquet(staging.toString)
    val n = obs.get("n").asInstanceOf[Long]
    if (n == 0L) {
      fs.delete(staging, true): Unit
      return 0L
    }
    val out = fs.create(new Path(staging, Marker), true)
    try out.write(Array.emptyByteArray) finally out.close()
    if (fs.exists(finalP)) fs.delete(finalP, true): Unit
    if (!fs.rename(staging, finalP))
      throw new java.io.IOException(s"DLQ publish failed: $finalP")
    n
  }

  /** ACTIVE (committed, not yet re-injected) DLQ records under `dlqRoot`
    * (empty frame when none) — what an operator inspects, fixes, and
    * re-injects. `includeConsumed = true` adds epochs a [[reinject]] already
    * drained (the audit view). */
  def read(spark: SparkSession, dlqRoot: String,
           includeConsumed: Boolean = false): DataFrame = {
    val dirs = epochDirs(spark, dlqRoot, includeConsumed).map(_.toString)
    if (dirs.isEmpty) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.options(IceLite.localFsOptions(dlqRoot)).schema(schema).parquet(dirs: _*)
  }

  private def epochDirs(spark: SparkSession, dlqRoot: String,
                        includeConsumed: Boolean): Seq[Path] = {
    val root = new Path(dlqRoot)
    val fs = IceLite.fsFor(root, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.collect {
      case st if DirRe.matches(st.getPath.getName) &&
        fs.exists(new Path(st.getPath, Marker)) &&
        (includeConsumed || !fs.exists(new Path(st.getPath, ConsumedMarker))) => st.getPath
    }.sortBy(_.getName)
  }

  /** Fix-and-reinject: drain every ACTIVE DLQ epoch through `fix` back into
    * the table. `fix` receives the DLQ frame ([[schema]]) and must return
    * the merge contract (`keyColumn, op, lsn, after`); its output re-checks
    * the contract — still-violating rows go BACK to the DLQ as a fresh
    * residual epoch (they stay active for the next, better, fix), clean rows
    * MERGE under a deterministic epoch key, and the drained epochs are
    * marked consumed (invisible to [[read]], kept for audit). Returns
    * (reinjected, stillBad).
    *
    * Crash-safety without side state: the merge's epoch key is a digest of
    * the drained epoch set, so a crash BEFORE any consumed marker lands
    * makes the re-run an exact ledger no-op; a crash mid-marking re-merges
    * only the unmarked epochs' rows under a different key — value-idempotent
    * under the LWW fold (same key, same lsn, same payload can't change a
    * winner). */
  def reinject(table: graft.table.IceLiteTable, dlqRoot: String,
               fix: DataFrame => DataFrame,
               streamId: String = "dlq-reinject"): (Long, Long) = {
    val spark = table.spark
    val dirs = epochDirs(spark, dlqRoot, includeConsumed = false)
    if (dirs.isEmpty) return (0L, 0L)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dirs.map(_.getName).mkString("\n").getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    val records = spark.read.options(IceLite.localFsOptions(dlqRoot))
      .schema(schema).parquet(dirs.map(_.toString): _*)
    // Exact-duplicate rows collapse: a crash mid-marking can leave the same
    // logical record both in its original epoch and in a residual one — one
    // drain must not double it (identical (key, op, lsn, payload) IS the
    // same source event).
    val fixed = fix(records).distinct()
    val key = table.snapshot.keyColumn
    Seq(key, "op", "lsn", "after").foreach(c => require(fixed.columns.contains(c),
      s"reinject fix() must emit the merge contract ($key, op, lsn, after); missing $c"))
    val (clean, stillBad) = split(fixed, key, dlqRoot, s"${streamId}_residual_$digest")
    val cleanRows = clean.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      val n = cleanRows.count()
      if (n > 0) table.merge(cleanRows, s"$streamId/$digest",
        extraLineage = Map("dlq.reinjected" -> n)): Unit
      val fs = IceLite.fsFor(new Path(dlqRoot), spark.sparkContext.hadoopConfiguration)
      dirs.foreach { d =>
        val out = fs.create(new Path(d, ConsumedMarker), true)
        try out.write(Array.emptyByteArray) finally out.close()
      }
      (n, stillBad)
    } finally cleanRows.unpersist(): Unit
  }
}
