package graft

import graft.hashing.KafkaMurmur2
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import graft.schema.{InferOptions, SchemaRegistry}
import graft.smt.{JoseConfig, JoseDecrypt, JsonDeserialize, JsonDeserializeConfig, OutboxConfig, OutboxRoute}
import graft.stream.{ChangeGen, Pipeline}
import graft.table.IceLite
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Driver contract: every implemented operator from SURVEY.md §2 exposed as a
 * named query over the driver-provided parquet tables, with an equivalent
 * DuckDB oracle where the operation is SQL-expressible (the others get
 * rows-only checks).
 *
 * The `events` table doubles as a derived CDC stream for the engine-path
 * queries: key = user_id, lsn = event_id, op = signup->c / error->d / else u,
 * payload = the input_hint shape (doc_id, tokens, n_tok, source).
 */
object SparkEntry {

  /** Input-table DataFrames memoized per (session, dir, table): every
    * `read.parquet` call re-lists the path and re-reads the footer for
    * schema inference (driver-side, ~10-20 ms each) — metadata work, not
    * results; the returned frame recomputes from parquet on every action.
    * Same convention as [[embDimMemo]]/[[lsnMaxMemo]]. Keyed by session
    * identity too: cloned sessions (q_concurrent_merge) must not execute
    * plans bound to another session. */
  private val tableMemo = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    tableMemo.computeIfAbsent(s"${System.identityHashCode(s)}|$dir|$name",
      _ => s.read.parquet(s"$dir/$name.parquet"))

  /** Embedding dimensionality per data dir, probed once (one tiny job) and
    * memoized — the per-query `.head()` probes were five extra jobs per
    * suite run. */
  private val embDimMemo = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private def embDim(s: SparkSession, dir: String): Int =
    embDimMemo.computeIfAbsent(dir,
      _ => T(s, dir, "embeddings").select(size(col("embedding"))).head().getInt(0)).intValue

  /** Exclusive lsn upper bound of every derived change stream (all of them
    * use `lsn = event_id`), probed once per data dir and memoized — this
    * was ten separate one-row `agg(max).head()` jobs per suite run. Streams
    * that drop rows (DLQ-cleaned) still slice correctly under the global
    * bound: [[Pipeline.replayBatch]] only uses it for epoch ranges. */
  private val lsnMaxMemo = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def lsnMaxOf(s: SparkSession, dir: String): Long =
    lsnMaxMemo.computeIfAbsent(dir,
      _ => T(s, dir, "events").agg(max("event_id")).head().getLong(0) + 1).longValue

  /** One catalog warehouse per data dir per JVM (see q_catalog_sql). */
  private val catalogMemo = new java.util.concurrent.ConcurrentHashMap[String, String]()

  // JOSE fixtures pinned from the reference's public test suite
  // (`smt/JoseTest.java:22-56`): base64(JWK oct) keys + flattened JWEs whose
  // plaintexts are {"foo":"bar"} / {"bar":"baz"}.
  private val joseKey1 = "eyJrdHkiOiJvY3QiLCJraWQiOiJIMmg1WHlIM0dPSHQ4Wm5vTndBOUFoay1FQlJ3cTQxTHo3U01pWDJDLVRJIiwiYWxnIjoiQTI1NkdDTSIsImsiOiJkR2tQRU41YUhaQnFocDY5TmpVWGpjTUJST1R4amZ6Yl9hYldVeUo2ajBBIn0="
  private val joseKey2 = "eyJrdHkiOiJvY3QiLCJraWQiOiJjbmVkYXRXNEg4SFA4VjFFSVQ3QjJsdHk0TXFsM3FKV3ZPUmk1MFZVdWZvIiwiYWxnIjoiQTI1NkdDTSIsImsiOiJjYmtncEtVZ1c0RFRaS2RkQzAwcHJTSjl5UnZGSGc3OTFOa0V6R2RLTFlZIn0="
  private val joseJwe1 = """{"protected":"eyJlbmMiOiJBMjU2R0NNIiwiYWxnIjoiZGlyIiwia2lkIjoiSDJoNVh5SDNHT0h0OFpub053QTlBaGstRUJSd3E0MUx6N1NNaVgyQy1USSJ9","iv":"QsJ90lUJoBW05RN3","ciphertext":"4YQYK0F4LoFpP6-P0g","tag":"88OtNkM7CVsOX52rLxgl2Q"}"""
  private val joseJwe2 = """{"protected":"eyJlbmMiOiJBMjU2R0NNIiwiYWxnIjoiZGlyIiwia2lkIjoiY25lZGF0VzRIOEhQOFYxRUlUN0IybHR5NE1xbDNxSld2T1JpNTBWVXVmbyJ9","iv":"rhGttLfHmwq7beFr","ciphertext":"L4OQkrC1zagy2DLDtw","tag":"9T29uivX5K_O_503UKmicA"}"""

  private val derivedPayloadType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false)),
    StructField("n_tok", IntegerType),
    StructField("source", StringType)))

  /** Derived Debezium-shaped change stream from the events table. */
  private def derivedChanges(s: SparkSession, dir: String): DataFrame = {
    val ev = T(s, dir, "events")
    val op = when(col("event_type") === "error", "d")
      .when(col("event_type") === "signup", "c")
      .otherwise("u")
    val payload = struct(
      col("user_id").cast(StringType).as("doc_id"),
      array(col("user_id").cast(IntegerType), (col("event_id") % 97).cast(IntegerType)).as("tokens"),
      lit(2).as("n_tok"),
      col("event_type").as("source"))
    ev.select(
      col("user_id").cast(StringType).as("doc_id"),
      op.as("op"),
      col("event_id").as("lsn"),
      when(op === "d", lit(null).cast(derivedPayloadType)).otherwise(payload).as("after"))
  }

  /** [[derivedChanges]] with a VARYING n_tok (= event_id % 101): the
    * zone-scan query needs a value column whose winner actually changes. */
  private def zoneChanges(s: SparkSession, dir: String): DataFrame = {
    val ev = T(s, dir, "events")
    val op = when(col("event_type") === "error", "d")
      .when(col("event_type") === "signup", "c")
      .otherwise("u")
    val payload = struct(
      col("user_id").cast(StringType).as("doc_id"),
      array(col("user_id").cast(IntegerType), (col("event_id") % 97).cast(IntegerType)).as("tokens"),
      (col("event_id") % 101).cast(IntegerType).as("n_tok"),
      col("event_type").as("source"))
    ev.select(
      col("user_id").cast(StringType).as("doc_id"),
      op.as("op"),
      col("event_id").as("lsn"),
      when(op === "d", lit(null).cast(derivedPayloadType)).otherwise(payload).as("after"))
  }

  /** Derived PARTIAL-update stream (patch semantics: null column =
    * unchanged): signups carry the full row, other updates carry only ONE
    * column — source on even LSNs, n_tok (= lsn % 50) on odd — and errors
    * delete. Exercises the column-level fold end to end. */
  private def derivedPatchChanges(s: SparkSession, dir: String): DataFrame = {
    val ev = T(s, dir, "events")
    val op = when(col("event_type") === "error", "d")
      .when(col("event_type") === "signup", "c")
      .otherwise("u")
    val even = col("event_id") % 2 === 0
    val payload = struct(
      col("user_id").cast(StringType).as("doc_id"),
      when(op === "c",
        array(col("user_id").cast(IntegerType), (col("event_id") % 97).cast(IntegerType)))
        .as("tokens"),
      when(op === "c", lit(2))
        .when(op === "u" && !even, (col("event_id") % 50).cast(IntegerType))
        .as("n_tok"),
      when(op === "c" || (op === "u" && even), col("event_type")).as("source"))
    ev.select(
      col("user_id").cast(StringType).as("doc_id"),
      op.as("op"),
      col("event_id").as("lsn"),
      when(op === "d", lit(null).cast(derivedPayloadType)).otherwise(payload).as("after"))
  }

  /** Patch-mode replay (write.merge.fold = patch) in 4 epochs; final state
    * must equal the DuckDB column-level fold of the raw stream. */
  private def patchReplay(s: SparkSession, dir: String, mode: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(s"graft-patch-$mode").toString
    val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8,
      properties = Map("write.mode" -> mode, "write.merge.fold" -> "patch"))
    val changes = derivedPatchChanges(s, dir)
    val lsnMax = lsnMaxOf(s, dir)
    Pipeline.replayBatch(s, changes, table, s"patch-$mode", epochs = 4, lsnMax = lsnMax)
    table.read().select(col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
      col("n_tok"), col("source"))
  }

  /** Flagship: full CDC replay through the IceLite MERGE sink on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    cdcMergeReplay(spark, "/root/testdata/sf0.001")

  private def cdcMergeReplay(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8)
    val changes = derivedChanges(s, dir)
    val lsnMax = lsnMaxOf(s, dir)
    Pipeline.replayBatch(s, changes, table, "verify", epochs = 4, lsnMax = lsnMax)
    // tokens compared as a joined string: the driver's pandas-based compare
    // cannot sort/hash raw array columns; token content stays fully checked.
    table.read().select(col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
      col("n_tok"), col("source"))
  }

  /** [[derivedChanges]] with deterministic contract violations injected —
    * the DLQ gates' input. Rules (on lsn = event_id, first match wins, all
    * reconstructable in the oracle SQL): %37 -> null key; else %31 -> op
    * "x"; else %41 on a non-delete -> null payload. */
  private def dlqCorrupted(s: SparkSession, dir: String): DataFrame = {
    val ch = derivedChanges(s, dir)
    val a = col("lsn") % 37 === 0
    val b = !a && (col("lsn") % 31 === 0)
    val c = !a && !b && col("op") =!= "d" && (col("lsn") % 41 === 0)
    ch.select(
      when(a, lit(null)).otherwise(col("doc_id")).as("doc_id"),
      when(b, lit("x")).otherwise(col("op")).as("op"),
      col("lsn"),
      when(c, lit(null).cast(derivedPayloadType)).otherwise(col("after")).as("after"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- CDC engine path ----
    "q_cdc_replay" -> ((s, dir) => {
      // last-write-wins fold without the sink. Hash aggregate + equi-join
      // (max_by over a struct would force SortAggregate — two full sorts).
      val ch = derivedChanges(s, dir)
      val last = ch.groupBy(col("doc_id")).agg(max("lsn").as("lsn"))
      ch.join(last, Seq("doc_id", "lsn"))
        .filter(col("op") =!= "d")
        .select(col("doc_id"), col("lsn").as("last_lsn"),
          col("after.source").as("last_source"))
    }),
    "q_cdc_merge_replay" -> ((s, dir) => cdcMergeReplay(s, dir)),
    "q_bootstrap_handoff" -> ((s, dir) => {
      // Debezium-style snapshot->stream handoff: the source's state at W
      // (LWW fold of changes with lsn <= W, deletes dropped — input prep,
      // computed with window functions, NOT the engine under test)
      // bootstraps a fresh table as op="r" events at lsn = W in
      // bucket-disjoint resumable chunks; the binlog tail then replays only
      // lsn > W. Re-running the bootstrap AND the tail is an exact ledger
      // no-op. Final state == the full fold, indistinguishable from a
      // from-the-beginning replay (the oracle is the same full-fold SQL).
      val root = java.nio.file.Files.createTempDirectory("graft-bootstrap").toString
      val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8)
      val changes = derivedChanges(s, dir)
      val lsnMax = lsnMaxOf(s, dir)
      val w = lsnMax / 2
      val byLsn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("lsn").desc)
      val state = changes.filter(col("lsn") <= w)
        .withColumn("__rn", row_number().over(byLsn))
        .filter(col("__rn") === 1 && col("op") =!= "d")
        .select(col("after.*"))
      Pipeline.bootstrap(s, state, table, w, chunks = 4)
      Pipeline.bootstrap(s, state, table, w, chunks = 4) // resume/re-run: no-op
      val tail = changes.filter(col("lsn") > w)
      Pipeline.replayBatch(s, tail, table, "tail", epochs = 2, lsnMax = lsnMax)
      Pipeline.replayBatch(s, tail, table, "tail", epochs = 2, lsnMax = lsnMax) // redelivery
      table.read().select(col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
        col("n_tok"), col("source"))
    }),
    "q_dlq_route" -> ((s, dir) => {
      // Dead-letter queue: contract-violating events (null key, unknown op,
      // null payload on a non-delete) route to a parquet DLQ with an error
      // label instead of poisoning the epoch. A re-delivered epoch is a
      // marker no-op — routed rows never double.
      val dlqRoot = java.nio.file.Files.createTempDirectory("graft-dlq").toString
      val (_, n) = graft.stream.Dlq.split(dlqCorrupted(s, dir), "doc_id", dlqRoot, "route/0")
      val (_, n2) = graft.stream.Dlq.split(dlqCorrupted(s, dir), "doc_id", dlqRoot, "route/0")
      require(n > 0 && n2 == 0, s"DLQ redelivery must be a no-op (first=$n, redelivered=$n2)")
      graft.stream.Dlq.read(s, dlqRoot)
        .select(coalesce(col("key"), lit("<null>")).as("key"),
          col("op"), col("lsn"), col("error"))
    }),
    "q_dlq_clean_state" -> ((s, dir) => {
      // The clean remainder merges normally: final state == the LWW fold
      // over only the non-violating events.
      val root = java.nio.file.Files.createTempDirectory("graft-dlqclean").toString
      val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8)
      val dlqRoot = java.nio.file.Files.createTempDirectory("graft-dlq2").toString
      val (clean, _) = graft.stream.Dlq.split(dlqCorrupted(s, dir), "doc_id", dlqRoot, "all/0")
      val lsnMax = lsnMaxOf(s, dir)
      Pipeline.replayBatch(s, clean, table, "clean", epochs = 4, lsnMax = lsnMax)
      table.read().select(col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
        col("n_tok"), col("source"))
    }),
    "q_dlq_parse" -> ((s, dir) => {
      // Deserialization-error routing: a JSON payload column with
      // deterministic corruptions — %23 truncates the closing brace
      // (invalid, must route as parse_error); else %29 wraps in brackets
      // (STILL VALID json, must stay clean — routing is real parsing, not
      // an id rule). Both engines rebuild the identical strings.
      val ev = T(s, dir, "events")
      val base = concat(lit("{\"uid\":"), col("user_id").cast(StringType),
        lit(",\"etype\":\""), col("event_type"), lit("\"}"))
      val payload = when(col("lsn") % 23 === 0, expr("substring(s, 1, length(s)-1)"))
        .when(col("lsn") % 29 === 0, concat(lit("["), col("s"), lit("]")))
        .otherwise(col("s"))
      val framed = ev.select(col("user_id").cast(StringType).as("doc_id"),
          col("event_id").as("lsn"), base.as("s"))
        .select(col("doc_id"), col("lsn"), payload.as("payload_json"))
      val dlqRoot = java.nio.file.Files.createTempDirectory("graft-dlqparse").toString
      val (clean, n) = graft.stream.Dlq.splitJson(framed, "payload_json", "doc_id", dlqRoot, "p/0")
      // the wrapped-but-valid rows must survive on the clean side
      require(clean.filter(col("payload_json").startsWith("[")).count() > 0,
        "valid wrapped JSON must not route")
      require(n == graft.stream.Dlq.read(s, dlqRoot).count(), s"routed count drift")
      graft.stream.Dlq.read(s, dlqRoot).select(col("key"), col("lsn"), col("payload"), col("error"))
    }),
    "q_rename_evolve" -> ((s, dir) => {
      // Iceberg-style METADATA-ONLY rename evolution mid-stream: replay the
      // first half of the change stream, rename source -> origin (zero data
      // files rewritten), then replay the second half with batches that
      // speak the NEW schema. Pre- and post-rename files interoperate via
      // the snapshot's logical->physical column mapping; the final state is
      // the same LWW fold with the surviving column under its new name.
      val root = java.nio.file.Files.createTempDirectory("graft-rename").toString
      val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8)
      val changes = derivedChanges(s, dir)
      val lsnMax = lsnMaxOf(s, dir)
      val mid = lsnMax / 2
      Pipeline.replayBatch(s, changes.filter(col("lsn") < mid), table, "pre",
        epochs = 2, lsnMax = mid)
      table.renameColumn("source", "origin")
      val renamedPayload = StructType(derivedPayloadType.fields.map(f =>
        if (f.name == "source") f.copy(name = "origin") else f))
      val post = changes.filter(col("lsn") >= mid).withColumn("after",
        when(col("after").isNull, lit(null).cast(renamedPayload))
          .otherwise(struct(col("after.doc_id").as("doc_id"),
            col("after.tokens").as("tokens"), col("after.n_tok").as("n_tok"),
            col("after.source").as("origin"))))
      Pipeline.replayBatch(s, post, table, "post", epochs = 2, lsnMax = lsnMax)
      IceLite.load(s, root).read().select(col("doc_id"),
        array_join(col("tokens"), ",").as("tokens_s"), col("n_tok"), col("origin"))
    }),
    "q_widen_evolve" -> ((s, dir) => {
      // Iceberg-style TYPE-WIDENING evolution mid-stream (INT -> BIGINT):
      // the first half of the change stream writes n_tok as INT; the second
      // half arrives with n_tok as BIGINT carrying values beyond int range.
      // Metadata-only — no first-half file is rewritten; both vintages read
      // under the widened snapshot schema (parquet scan-time promotion).
      val root = java.nio.file.Files.createTempDirectory("graft-widen").toString
      val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8)
      val changes = derivedChanges(s, dir)
      val lsnMax = lsnMaxOf(s, dir)
      val mid = lsnMax / 2
      Pipeline.replayBatch(s, changes.filter(col("lsn") < mid), table, "pre",
        epochs = 2, lsnMax = mid)
      val filesBefore = IceLite.load(s, root).snapshot.files.map(_.path).toSet
      val widePayload = StructType(derivedPayloadType.fields.map(f =>
        if (f.name == "n_tok") f.copy(dataType = LongType) else f))
      val post = changes.filter(col("lsn") >= mid).withColumn("after",
        when(col("after").isNull, lit(null).cast(widePayload))
          .otherwise(struct(col("after.doc_id").as("doc_id"),
            col("after.tokens").as("tokens"),
            (lit(4000000000L) + col("lsn") % 97).as("n_tok"),
            col("after.source").as("source"))))
      Pipeline.replayBatch(s, post, table, "post", epochs = 2, lsnMax = lsnMax)
      val t2 = IceLite.load(s, root)
      // the widening itself rewrote nothing: every pre-widening file still
      // live unless the second half's DATA touched its bucket
      require(t2.snapshot.schema("n_tok").dataType == LongType, "schema must widen")
      require(filesBefore.nonEmpty, "first half must write files")
      t2.read().select(col("doc_id"),
        array_join(col("tokens"), ",").as("tokens_s"), col("n_tok"), col("source"))
    }),
    "q_tag_travel" -> ((s, dir) => {
      // Named snapshot tag as the reproducible-training-corpus handle: tag
      // the mid-stream version, keep ingesting, expire + vacuum everything
      // untagged — the tag still reads EXACTLY the first half's LWW fold.
      val root = java.nio.file.Files.createTempDirectory("graft-tag").toString
      val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8)
      val changes = derivedChanges(s, dir)
      val lsnMax = lsnMaxOf(s, dir)
      val mid = lsnMax / 2
      Pipeline.replayBatch(s, changes.filter(col("lsn") < mid), table, "pre",
        epochs = 2, lsnMax = mid)
      table.tagSnapshot("train-v1")
      Pipeline.replayBatch(s, changes.filter(col("lsn") >= mid), table, "post",
        epochs = 2, lsnMax = lsnMax)
      table.expireSnapshots(keepSnapshots = 1): Unit
      table.vacuum(keepSnapshots = 1): Unit
      IceLite.load(s, root).readTag("train-v1").select(col("doc_id"),
        array_join(col("tokens"), ",").as("tokens_s"), col("n_tok"), col("source"))
    }),
    "q_drop_evolve" -> ((s, dir) => {
      // Iceberg-style METADATA-ONLY drop evolution mid-stream: replay the
      // first half, DROP the source column (zero data files rewritten —
      // the bytes stay until compaction, invisible to reads), then replay
      // the second half with payloads that no longer carry it. The final
      // state is the same LWW fold minus the column.
      val root = java.nio.file.Files.createTempDirectory("graft-drop").toString
      val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8)
      val changes = derivedChanges(s, dir)
      val lsnMax = lsnMaxOf(s, dir)
      val mid = lsnMax / 2
      Pipeline.replayBatch(s, changes.filter(col("lsn") < mid), table, "pre",
        epochs = 2, lsnMax = mid)
      val filesBefore = IceLite.load(s, root).snapshot.files.map(_.path).toSet
      table.dropColumn("source")
      require(IceLite.load(s, root).snapshot.files.map(_.path).toSet == filesBefore,
        "drop must rewrite nothing")
      val droppedPayload = StructType(derivedPayloadType.fields.filterNot(_.name == "source"))
      val post = changes.filter(col("lsn") >= mid).withColumn("after",
        when(col("after").isNull, lit(null).cast(droppedPayload))
          .otherwise(struct(col("after.doc_id").as("doc_id"),
            col("after.tokens").as("tokens"), col("after.n_tok").as("n_tok"))))
      Pipeline.replayBatch(s, post, table, "post", epochs = 2, lsnMax = lsnMax)
      val t2 = IceLite.load(s, root)
      require(!t2.snapshot.schema.fieldNames.contains("source"), "column must be gone")
      t2.read().select(col("doc_id"),
        array_join(col("tokens"), ",").as("tokens_s"), col("n_tok"))
    }),
    "q_sql_scan" -> ((s, dir) => {
      // SQL-only consumption: replay, then read the table state PURELY
      // through the injected table-valued functions — icelite_scan for the
      // result, icelite_at (time travel) and icelite_history as sanity
      // pins. Catalyst sees the same scan plan as table.read().
      val root = java.nio.file.Files.createTempDirectory("graft-sqlscan").toString
      val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8)
      val changes = derivedChanges(s, dir)
      val lsnMax = lsnMaxOf(s, dir)
      Pipeline.replayBatch(s, changes, table, "sq", epochs = 3, lsnMax = lsnMax)
      GraftExtensions.register(s)
      val v = table.snapshot.version
      val atV = s.sql(s"SELECT count(*) AS c FROM icelite_at('$root', $v)").head().getLong(0)
      val now = s.sql(s"SELECT count(*) AS c FROM icelite_scan('$root')").head().getLong(0)
      require(atV == now, s"time travel to the current version must equal scan ($atV != $now)")
      require(s.sql(s"SELECT count(*) AS c FROM icelite_history('$root')").head().getLong(0) >= 3,
        "history must list the replay versions")
      require(s.sql(s"SELECT count(*) AS c FROM icelite_files('$root')").head().getLong(0) > 0,
        "files metadata table must be non-empty")
      s.sql(s"SELECT doc_id, array_join(tokens, ',') AS tokens_s, n_tok, source " +
        s"FROM icelite_scan('$root')")
    }),
    "q_dsv2_scan" -> ((s, dir) => {
      // STANDARD-API consumption: replay into a MOR table, then read it
      // back through the DataSource V2 connector — spark.read.format
      // ("icelite") — with a key-range predicate (pushed: prunes buckets
      // manifest-side before any file opens) plus a residual filter. The
      // LWW winners resolve INSIDE the partition readers with zero
      // shuffle; the result must equal the same fold recomputed in SQL.
      val root = java.nio.file.Files.createTempDirectory("graft-dsv2").toString
      val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8,
        properties = Map("write.mode" -> "mor"))
      val changes = derivedChanges(s, dir)
      val lsnMax = lsnMaxOf(s, dir)
      Pipeline.replayBatch(s, changes, table, "v2", epochs = 3, lsnMax = lsnMax)
      s.read.format("icelite").load(root)
        .filter(col("doc_id") >= "100" && col("source") =!= "purchase")
        .select(col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
          col("n_tok"), col("source"))
    }),
    "q_dsv2_write" -> ((s, dir) => {
      // STANDARD-API ingest: the whole derived change stream written
      // through df.write.format("icelite") in change shape — the table is
      // created on first append, the batch routes through the merge
      // engine, and the final state must equal the LWW fold.
      val root = java.nio.file.Files.createTempDirectory("graft-dsv2w").toString
      derivedChanges(s, dir).write.format("icelite")
        .option("key", "doc_id").option("buckets", "8")
        .option("write.mode", "mor").option("epoch", "w1")
        .mode("append").save(root)
      IceLite.load(s, root).read().select(col("doc_id"),
        array_join(col("tokens"), ",").as("tokens_s"), col("n_tok"), col("source"))
    }),
    "q_compact_replay" -> ((s, dir) => {
      // MOR replay WITH in-pipeline small-file compaction (bin-packing
      // cadence every 2 epochs): layout maintenance runs concurrently with
      // ingest and the final state must still equal the plain LWW fold.
      val root = java.nio.file.Files.createTempDirectory("graft-compact").toString
      val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8,
        properties = Map("write.mode" -> "mor"))
      val changes = derivedChanges(s, dir)
      val lsnMax = lsnMaxOf(s, dir)
      s.conf.set(Pipeline.CompactSmallEveryConf, "2")
      try Pipeline.replayBatch(s, changes, table, "cmp", epochs = 6, lsnMax = lsnMax)
      finally s.conf.unset(Pipeline.CompactSmallEveryConf)
      table.read().select(col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
        col("n_tok"), col("source"))
    }),
    "q_concurrent_merge" -> ((s, dir) => {
      // Two concurrent writer sessions replay key-disjoint halves of the
      // change stream into ONE table — optimistic commits: version-race
      // losers rebase disjoint-bucket deltas driver-side or recompute on
      // bucket overlap (IceLiteTable.commitRebasing). Whatever the
      // interleaving, the final state must equal the full LWW fold.
      val root = java.nio.file.Files.createTempDirectory("graft-conc").toString
      IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8)
      val lsnMax = lsnMaxOf(s, dir)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val ws = (0 until 2).map { parity =>
        new Thread(() => {
          try {
            val sess = s.newSession()
            val half = derivedChanges(sess, dir)
              .filter(pmod(col("doc_id").cast(LongType), lit(2L)) === parity)
            Pipeline.replayBatch(sess, half, IceLite.load(sess, root),
              s"w$parity", epochs = 3, lsnMax = lsnMax)
          } catch { case t: Throwable => errs.add(t): Unit }
        })
      }
      ws.foreach(_.start()); ws.foreach(_.join())
      if (!errs.isEmpty) throw new IllegalStateException("concurrent writer failed", errs.peek())
      IceLite.load(s, root).read().select(col("doc_id"),
        array_join(col("tokens"), ",").as("tokens_s"), col("n_tok"), col("source"))
    }),
    "q_smt_unwrap" -> ((s, dir) => {
      // unwrap + tombstone semantics over the derived envelope
      val env = derivedChanges(s, dir)
        .select(col("doc_id"), col("op"), lit(null).cast(StringType).as("before"),
          col("after"), struct(col("lsn").as("lsn")).as("source"))
      val chain = graft.smt.SmtChain(Seq(
        graft.smt.Stages.UnwrapDebezium("doc_id"),
        graft.smt.Stages.TombstoneFilter()))
      chain(env).select(col("doc_id"), col("op"), col("lsn"),
        col("after.n_tok").as("n_tok"))
    }),
    "q_json_extract" -> ((s, dir) =>
      T(s, dir, "events")
        .select(col("event_type"), get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).cast(LongType).as("sum_k"), count(lit(1)).as("n"))),
    "q_outbox_route" -> ((s, dir) => {
      // Outbox routing (O15, O17-O21, O23-O25) over an events-derived outbox
      // envelope: per-record topic override with @N suffix + prefix, config
      // topic fallback, __deleted -> tombstone, payload extraction, explicit
      // partition_number, JSON-string header promotion (numbers stringified),
      // null-value drop. Everything CASE/concat SQL for the oracle.
      val ev = T(s, dir, "events")
      val value = struct(
        concat(lit("{\"uid\":"), col("user_id"), lit("}")).as("payload"),
        when(col("event_type") === "error", lit("true")).otherwise(lit("false")).as("__deleted"),
        when(col("event_id") % 7 === 0,
          concat(lit("t"), pmod(col("user_id"), lit(3)).cast(StringType), lit("@4")))
          .otherwise(lit(null).cast(StringType)).as("topic"),
        pmod(col("event_id"), lit(16)).cast(IntegerType).as("partition_number"),
        col("props").as("headers"))
      val env = ev.select(
        // record key preserved verbatim through routing; event_id keeps rows
        // identifiable in the compare
        col("event_id").cast(StringType).as("key"),
        // every 13th record is a Debezium null-value tombstone -> dropped (O17)
        when(col("event_id") % 13 === 0, lit(null)).otherwise(value).as("value"))
      OutboxRoute(OutboxConfig(topic = Some("events"), topicPrefix = Some("pfx")))(env)
        .select(col("key"), col("topic"), col("partition"),
          col("payload"), element_at(col("headers"), "k").as("header_k"),
          col("tombstone"))
    }),
    "q_outbox_partition" -> ((s, dir) => {
      import s.implicits._
      // Key-mode murmur2 routing with the reference's pinned placements
      // (`smt/OutboxTest.java:265-268`: "some-partition-key" -> 1 of 3,
      // "another-partition-key" -> 2 of 3) + partition_key header echo (O25).
      val env = Seq(("k1", "some-partition-key"), ("k2", "another-partition-key"))
        .toDF("key", "pk")
        .select(col("key"), struct(
          lit("p").as("payload"), col("pk").as("partition_key"),
          // struct-typed headers field -> promoted with values stringified (O23)
          struct(lit("v1").as("h1"), (length(col("pk")) * 10).as("h2")).as("headers")).as("value"))
      OutboxRoute(OutboxConfig(topic = Some("target"), partitionByKey = true, numPartitions = Some(3)))(env)
        .select(col("key"), col("topic"), col("partition"),
          element_at(col("headers"), "partition_key").as("pk_header"),
          element_at(col("headers"), "h1").as("h1"),
          element_at(col("headers"), "h2").as("h2"))
    }),
    "q_jose_decrypt" -> ((s, dir) => {
      import s.implicits._
      // Reference-pinned JWE vectors (`smt/JoseTest.java:22-56`) decrypted
      // with a multi-key config (first key hits jwe1, second jwe2).
      val df = Seq(("jwe1", joseJwe1.getBytes("UTF-8")), ("jwe2", joseJwe2.getBytes("UTF-8")))
        .toDF("name", "value")
      JoseDecrypt(JoseConfig(Seq(joseKey1, joseKey2)))(df)
        .select(col("name"), col("value").cast(StringType).as("plaintext"))
    }),
    "q_json_evolve" -> ((s, dir) => {
      // Inference + union + repackage over a deterministically mixed-shape
      // JSON column: even ids carry {"a":<int>,"b-x":...,"noise":1}, odd ids
      // {"a":<int>.5,"b-x":...} — convert-numbers-to-double coerces `a` to
      // double so both shapes union into ONE class (O7/O10),
      // "b-x" is Avro-sanitized to b_x (O9), "noise" is config-ignored (O8),
      // every 13th row is a null tombstone passed through as null (O2), and
      // all rows re-emit under the widened schema (O11).
      val ev = T(s, dir, "events")
      val json = when(col("event_id") % 13 === 0, lit(null).cast(StringType))
        .when(col("event_id") % 2 === 0,
          concat(lit("{\"a\":"), col("user_id"), lit(",\"b-x\":\"s"), col("user_id"),
            lit("\",\"noise\":1}")))
        .otherwise(
          concat(lit("{\"a\":"), col("user_id"), lit(".5,\"b-x\":\"s"), col("user_id"), lit("\"}")))
      val df = ev.select(col("event_id"), json.as("j"))
      val reg = new SchemaRegistry(optionalStructFields = true)
      val stage = new JsonDeserialize(JsonDeserializeConfig(
        Seq("j"), "evolve",
        InferOptions(optionalStructFields = true, convertNumbersToDouble = true,
          sanitizeFieldNames = true, ignoredFields = Seq("noise"))), reg)
      stage(df).select(col("event_id"),
        col("j.a").cast(DoubleType).as("a"), col("j.b_x").as("b_x"))
    }),
    "q_schema_classes" -> ((s, dir) => {
      // Mutually incompatible classes (struct vs array) through the
      // multi-class path: per-row classification via the StrictMapper fast
      // path (O13), one typed output column per class (O10), and an O14
      // registry serde round-trip (n_classes re-read from serialized JSON).
      val ev = T(s, dir, "events")
      val json = when(col("event_id") % 3 === 0, concat(lit("["), col("user_id"), lit(",7]")))
        .otherwise(concat(lit("{\"a\":"), col("user_id"), lit("}")))
      val df = ev.select(col("event_id"), json.as("j"))
      val reg = new SchemaRegistry(optionalStructFields = false)
      val stage = new JsonDeserialize(JsonDeserializeConfig(Seq("j"), "classes"), reg)
      val parsed = stage(df)
      // class order in the registry is fold-order-dependent; find the struct
      // and array outputs by type, not by name
      val structCol = parsed.schema.fields
        .collectFirst { case f if f.name.startsWith("j") && f.dataType.isInstanceOf[StructType] => f.name }.get
      val arrayCol = parsed.schema.fields
        .collectFirst { case f if f.name.startsWith("j") && f.dataType.isInstanceOf[ArrayType] => f.name }.get
      val nClasses = SchemaRegistry.deserialize(reg.serialize, optionalStructFields = false)
        .get("classes", "j").size
      parsed.agg(
        count(col(structCol)).as("n_struct"),
        count(col(arrayCol)).as("n_array"),
        max(lit(nClasses)).cast(IntegerType).as("n_classes"))
    }),
    "q_json_variant" -> ((s, dir) => {
      // Multi-class fan-out in VARIANT output mode: ONE stable tagged-union
      // struct {class_id, v0, v1} instead of positional sibling columns —
      // exactly one vN non-null per row. Class indices are fold-order
      // dependent, so outputs are normalized by TYPE: the struct class
      // feeds a_val, the array class feeds arr0.
      val ev = T(s, dir, "events")
      val json = when(col("event_id") % 3 === 0, concat(lit("["), col("user_id"), lit(",7]")))
        .otherwise(concat(lit("{\"a\":"), col("user_id"), lit("}")))
      val df = ev.select(col("event_id"), json.as("j"))
      val reg = new SchemaRegistry(optionalStructFields = false)
      val stage = new JsonDeserialize(JsonDeserializeConfig(Seq("j"), "variant",
        outputMode = "variant"), reg)
      val parsed = stage(df)
      val vt = parsed.schema("j").dataType.asInstanceOf[StructType]
      val structV = vt.fields.collectFirst { case f if f.dataType.isInstanceOf[StructType] => f.name }.get
      val arrayV = vt.fields.collectFirst { case f if f.dataType.isInstanceOf[ArrayType] => f.name }.get
      parsed.select(col("event_id"),
        when(col(s"j.$structV").isNotNull, lit("struct")).otherwise(lit("array")).as("cls"),
        col(s"j.$structV.a").cast(LongType).as("a_val"),
        element_at(col(s"j.$arrayV"), 1).cast(LongType).as("arr0"))
    }),
    "q_heartbeat" -> ((s, dir) => {
      import s.implicits._
      // Signal/heartbeat passthrough (O16): heartbeats matched by VALUE
      // SCHEMA NAME (`smt/Outbox.java:84-88`), signals by topic.
      val env = Seq(
        ("k1", "orders-topic", null.asInstanceOf[String]),
        ("k2", "orders-topic", OutboxRoute.HeartbeatSchemaName),
        ("k3", "myapp.dbz_signal.x", null.asInstanceOf[String]),
        ("k4", "orders-topic", "some.other.Schema"))
        .toDF("key", "topic", OutboxRoute.SchemaNameColumn)
      env.select(col("key"), OutboxRoute.isPassthrough(env).as("passthrough"))
    }),
    "q_schema_infer" -> ((s, dir) => {
      // batch JSON schema inference + registry over the props column
      val reg = new SchemaRegistry(optionalStructFields = true)
      val stage = new JsonDeserialize(JsonDeserializeConfig(
        Seq("props"), "events", InferOptions(optionalStructFields = true)), reg)
      stage(T(s, dir, "events")).select(col("props.k").as("k"))
        .agg(count(lit(1)).as("n"), sum("k").cast(LongType).as("sum_k"))
    }),

    // ---- relational core ----
    "q1_pricing_summary" -> ((s, dir) =>
      T(s, dir, "lineitem").groupBy("l_returnflag", "l_linestatus").agg(
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        count(lit(1)).as("n"))),
    "q3_topk_orders" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val o = T(s, dir, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),
    "q_join_broadcast_dim" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val p = T(s, dir, "part")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
    }),
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      T(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        row_number().over(w).as("rn"),
        round(sum(col("o_totalprice")).over(w), 2).as("running"))
    }),
    "q_semi_anti" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .withColumn("kind", lit("with_orders"))
      val without = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .withColumn("kind", lit("without_orders"))
      withOrders.unionByName(without)
    }),
    "q_setops" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val signup = ev.filter(col("event_type") === "signup").select("user_id").distinct()
      val purchase = ev.filter(col("event_type") === "purchase").select("user_id").distinct()
      signup.intersect(purchase).orderBy("user_id")
    }),
    "q_sort_limit" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10)),

    // ---- training-data pipeline: dedup ----
    "q_dedup_exact" -> ((s, dir) => {
      val (_, groups) = Dedup.exact(T(s, dir, "documents"), "doc_id", Seq("text"))
      groups.select(col("h"), col("keep_id"), col("n"))
    }),
    "q_jaccard_pairs" -> ((s, dir) => {
      // word-set jaccard kernel over adjacent doc pairs (oracle-able; the
      // LSH variants below use the same kernel)
      val d = T(s, dir, "documents")
      val a = d.select(col("doc_id").as("id_a"), TextOps.words(col("text")).as("w_a"))
      val b = d.select(col("doc_id").as("id_b"), TextOps.words(col("text")).as("w_b"))
      a.join(b, col("id_b") === col("id_a") + 1)
        .select(col("id_a"), col("id_b"),
          round(size(array_intersect(col("w_a"), col("w_b"))).cast(DoubleType) /
            size(array_union(col("w_a"), col("w_b"))).cast(DoubleType), 4).as("jaccard"))
    }),
    "q_minhash_dedup" -> ((s, dir) =>
      // md5 kernel: same banding algorithm as the default xxhash64 path but
      // every hash is SQL-reproducible, so the full LSH candidate generation
      // + exact-Jaccard verification has a DuckDB oracle (ops/Md5MinHash.scala)
      Dedup.minhashLsh(T(s, dir, "documents"), "doc_id", "text",
        numHashes = 32, bands = 8, shingleWidth = 3, threshold = 0.4, hashKernel = "md5")),
    "q_dedup_components" -> ((s, dir) => {
      // duplicate-GROUP resolution: near-dup pairs (same md5 LSH kernel as
      // q_minhash_dedup) -> connected components -> (id, component, keep);
      // the oracle recomputes the transitive closure via a recursive CTE.
      val pairs = Dedup.minhashLsh(T(s, dir, "documents"), "doc_id", "text",
        numHashes = 32, bands = 8, shingleWidth = 3, threshold = 0.4, hashKernel = "md5")
      Dedup.components(pairs)
    }),
    "q_dedup_pipeline" -> ((s, dir) => {
      // End-to-end corpus dedup, the composition a user actually runs:
      // near-dup pairs -> connected components -> drop non-canonical group
      // members -> surviving corpus. The oracle recomputes the whole chain
      // (LSH kernel + transitive closure + anti-join) in SQL.
      val docs = T(s, dir, "documents")
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
        numHashes = 32, bands = 8, shingleWidth = 3, threshold = 0.4, hashKernel = "md5")
      val dupes = Dedup.components(pairs).filter(!col("keep"))
        .select(col("id").as("doc_id"))
      docs.join(dupes, Seq("doc_id"), "left_anti").select(col("doc_id"))
    }),
    "q_stream_dedup" -> ((s, dir) => {
      // Incremental ingest dedup: even doc_ids form the indexed corpus, odd
      // doc_ids arrive as a batch and are deduped against the persisted
      // index (partition-pruned probe). The oracle recomputes the collided
      // bands + exact Jaccard + best-match pick between the two halves.
      val docs = T(s, dir, "documents")
      val idxPath = java.nio.file.Files.createTempDirectory("graft-mhidx").toString
      Dedup.buildMinhashIndex(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        idxPath, numHashes = 32, bands = 8, shingleWidth = 3, hashKernel = "md5")
      Dedup.dedupAgainstIndex(docs.filter(col("doc_id") % 2 === 1), idxPath,
        "doc_id", "text", numHashes = 32, bands = 8, shingleWidth = 3,
        threshold = 0.4, hashKernel = "md5")
    }),
    "q_tokenize" -> ((s, dir) =>
      // deterministic md5-mod tokenizer (array<int> ids, SQL-reproducible);
      // the vocab-bounded ids stand in for a real BPE table with the right
      // column shape for downstream token ops
      T(s, dir, "documents").select(col("doc_id"),
        array_join(graft.ops.TextHashExprs.tokenizeMd5(col("text"), 32000)
          .cast("array<string>"), ",").as("tokens_s"))),
    "q_pack_chunks" -> ((s, dir) => {
      // context-window packing: docs -> md5 shards -> per-shard
      // concatenation order -> fixed 128-token training windows; the oracle
      // recomputes offsets, spans, and chunk contents with the same window
      // sum in SQL.
      val docs = T(s, dir, "documents")
        .select(col("doc_id"), graft.ops.TextHashExprs.tokenizeMd5(col("text"), 32000).as("tokens"))
      graft.ops.Packing.packChunks(docs, "tokens", "doc_id", chunkLen = 128, nShards = 8)
        .select(col("shard"), col("chunk"),
          array_join(col("tokens").cast("array<string>"), ",").as("tokens_s"),
          col("n_frags"))
    }),
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(T(s, dir, "documents"), "doc_id", "text")
        // hamming <= 3 makes the 4x16-bit banding EXHAUSTIVE (pigeonhole:
        // <= 3 differing bits cannot touch all 4 bands), so the LSH output
        // equals "all pairs with hamming <= 3" — which the all-pairs SQL
        // oracle recomputes from the same md5-derived signatures.
        .filter(col("hamming") <= 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast(IntegerType).as("hamming"))),

    // ---- training-data pipeline: similarity ----
    "q_embed_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
        .select(col("qid"), col("cid"), col("rank").cast(IntegerType).as("rank"))
    }),
    "q_embed_lsh_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val dim = embDim(s, dir)
      Similarity.lshTopK(emb.filter(col("vec_id") < 10), emb, k = 5, bits = 4, dim = dim)
        .select("qid", "cid", "rank", "bucket")
    }),
    "q_embed_lsh_persisted" -> ((s, dir) => {
      // Persisted-index ANN: signatures computed once into a
      // bucket-partitioned parquet index; the query reads ONLY its probed
      // bucket directories (partition pruning — pinned in PlanSpec). Same
      // results as q_embed_lsh_topk by construction.
      val emb = T(s, dir, "embeddings")
      val dim = embDim(s, dir)
      val idxPath = java.nio.file.Files.createTempDirectory("graft-lshidx").toString
      Similarity.buildLshIndex(emb, idxPath, bits = 4, dim = dim)
      Similarity.lshTopKIndexed(emb.filter(col("vec_id") < 10), idxPath, k = 5, bits = 4, dim = dim)
        .select(col("qid"), col("cid"), col("rank").cast(IntegerType).as("rank"),
          col("bucket").cast(LongType).as("bucket"))
    }),
    "q_embed_lsh_append" -> ((s, dir) => {
      // Incremental-index ANN: index half the corpus, APPEND the other half
      // (same deterministic hyperplanes, new bucket partitions only), then
      // probe. The oracle is the full-corpus LSH top-k — passing proves
      // probe(build(A) + append(B)) == probe(build(A ∪ B)) at the driver
      // gate, not just in OpsSpec.
      val emb = T(s, dir, "embeddings")
      val dim = embDim(s, dir)
      val idxPath = java.nio.file.Files.createTempDirectory("graft-lshappend").toString
      Similarity.buildLshIndex(emb.filter(col("vec_id") % 2 === 0), idxPath, bits = 4, dim = dim)
      Similarity.appendToLshIndex(emb.filter(col("vec_id") % 2 === 1), idxPath, bits = 4, dim = dim)
      Similarity.lshTopKIndexed(emb.filter(col("vec_id") < 10), idxPath, k = 5, bits = 4, dim = dim)
        .select(col("qid"), col("cid"), col("rank").cast(IntegerType).as("rank"),
          col("bucket").cast(LongType).as("bucket"))
    }),
    "q_embed_ivf" -> ((s, dir) => {
      // IVF-flat at nprobe=1: candidates in inverted lists by nearest
      // md5-derived centroid; the oracle recomputes the coarse quantizer
      // (arg_max of the same dots) and the per-cell ranking in SQL.
      val emb = T(s, dir, "embeddings")
      val dim = embDim(s, dir)
      Similarity.ivfTopK(emb.filter(col("vec_id") < 10), emb, k = 5, nCells = 8, nprobe = 1, dim = dim)
        .select(col("qid"), col("cid"), col("rank").cast(IntegerType).as("rank"))
    }),
    "q_embed_kmeans" -> ((s, dir) => {
      // TRAINED-quantizer IVF: 2 Lloyd's iterations from the 4 smallest-id
      // seeds, queries probe their 2 nearest cells. The oracle retrains the
      // identical k-means in SQL — centroid updates are quantized to 6 dp
      // with pure double arithmetic so engine summation-order drift can't
      // diverge the trajectories.
      val emb = T(s, dir, "embeddings")
      Similarity.kmeansIvfTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
        nCells = 4, nprobe = 2, iters = 2)
        .select(col("qid"), col("cid"), col("rank").cast(IntegerType).as("rank"))
    }),
    "q_embed_multiprobe" -> ((s, dir) => {
      // Multi-probe LSH: own bucket + all Hamming-distance-1 buckets; the
      // oracle recomputes the probe set (XOR of each bit) in SQL.
      val emb = T(s, dir, "embeddings")
      val dim = embDim(s, dir)
      Similarity.lshTopKMultiProbe(emb.filter(col("vec_id") < 10), emb, k = 5, bits = 4, dim = dim)
        .select(col("qid"), col("cid"), col("rank").cast(IntegerType).as("rank"))
    }),
    "q_embed_pq" -> ((s, dir) => {
      // Product quantization (ADC): 64 dims -> 4 codes over 8-entry
      // md5-derived codebooks; the oracle recomputes encode + LUT + the
      // exact fold-order arithmetic in SQL.
      val emb = T(s, dir, "embeddings")
      val dim = embDim(s, dir)
      Similarity.pqTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
        dim = dim, m = 4, ksub = 8)
    }),
    "q_embed_ivfpq" -> ((s, dir) => {
      // IVF routing + PQ scoring with nprobe = nCells: every list probed, so
      // the result must equal PQ-flat exactly (same oracle) while the
      // two-level plan (cell join instead of crossJoin) is exercised.
      val emb = T(s, dir, "embeddings")
      val dim = embDim(s, dir)
      Similarity.ivfPqTopK(emb.filter(col("vec_id") < 10), emb, k = 5,
        nCells = 4, nprobe = 4, dim = dim, m = 4, ksub = 8)
    }),
    "q_embed_dedup" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val dim = embDim(s, dir)
      // synthetic embeddings are near-orthogonal (cos p99.9 ~ 0.38); a low
      // threshold keeps the query non-trivial on this corpus. 8 bands x
      // 8 bits: candidate volume O(docs x bands / 256), never quadratic;
      // the oracle recomputes the md5-derived buckets + exact cosine in SQL.
      Dedup.embeddingNearDups(emb, "vec_id", "embedding", dim,
        bands = 8, rowsPerBand = 8, threshold = 0.3)
    }),

    // ---- training-data pipeline: text analysis ----
    "q_token_count" -> ((s, dir) =>
      T(s, dir, "documents").select(
        col("doc_id"),
        TextOps.wsTokenCount(col("text")).as("n_ws"),
        TextOps.bpeTokenCount(col("text")).as("n_bpe"))),
    "q_text_quality" -> ((s, dir) =>
      TextOps.qualityFeatures(T(s, dir, "documents"))
        .select("doc_id", "n_words", "punct_ratio", "digit_ratio", "mean_word_len")),
    "q_lang_stopwords" -> ((s, dir) =>
      T(s, dir, "documents").select(
        col("doc_id"),
        TextOps.stopwordHits(col("text"), "en").as("en_hits"),
        TextOps.stopwordHits(col("text"), "fr").as("fr_hits"),
        TextOps.stopwordHits(col("text"), "de").as("de_hits"),
        TextOps.stopwordHits(col("text"), "es").as("es_hits"))),
    "q_lang_id" -> ((s, dir) =>
      TextOps.langId(T(s, dir, "documents"))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))),
    "q_fingerprint" -> ((s, dir) =>
      T(s, dir, "documents").select(
        col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))),

    // ---- multimodal: REAL JDK-codec decode (PNG/WAV/frame container) ----
    "q_multimodal_features" -> ((s, dir) => {
      // Synthetic media are real PNG/WAV/frame-container bytes whose decoded
      // dimensions/means are arithmetic in the id, so the oracle verifies
      // the actual decode (ImageIO + javax.sound), not just plumbing.
      // n_bytes (PNG-encoder-dependent) is deliberately not compared.
      val media = Multimodal.syntheticMedia(s, 500)
      Multimodal.extractFeatures(media)
        .select("media_id", "modality", "width", "height", "mean_px",
          "sample_rate", "n_samples", "rms", "n_frames")
    }),

    "q_decontaminate" -> ((s, dir) => {
      // Benchmark decontamination: docs with doc_id % 10 == 0 play the eval
      // set; survivors share NO 3-word shingle with it (md5 kernel — the
      // oracle recomputes the hashes and the overlap test in SQL).
      val docs = T(s, dir, "documents")
      val bench = docs.filter(col("doc_id") % 10 === 0)
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      Dedup.decontaminate(corpus, "doc_id", "text", bench, "text",
        shingleWidth = 3, hashKernel = "md5")
        .select("doc_id", "lang", "source")
    }),
    "q_dedup_segments" -> ((s, dir) => {
      // Intra-doc repetition: the text is doubled sentence-wise, the op must
      // collapse it back and report the repetition ratio (first occurrences
      // kept, order preserved — the oracle rebuilds that with windows).
      val t2 = T(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(". "), col("text")).as("text2"))
      t2.select(col("doc_id"),
        TextOps.dedupSegments(col("text2"), "\\. ", ". ").as("clean"),
        TextOps.segmentDupRatio(col("text2"), "\\. ").as("dup_ratio"))
    }),
    "q_corpus_stats" -> ((s, dir) => {
      // Per-source corpus profile (exact mode: DISTINCT + linear-interpolated
      // quantiles — both engines share the definition; the approx mode is the
      // 100 TB path and is exercised in OpsSpec instead).
      TextOps.corpusProfile(T(s, dir, "documents"))
    }),
    "q_curate_filter" -> ((s, dir) => {
      // One-call quality gate over a corpus with synthesized defects: every
      // doc_id % 5 gets sentence-doubled (repetition gate), % 3 gets an
      // email (PII gate), % 7 gets link spam (URL gate); survivors pass all.
      val d = T(s, dir, "documents").select(col("doc_id"), concat(
        col("text"),
        when(pmod(col("doc_id"), lit(5)) === 0, concat(lit(". "), col("text"))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(3)) === 0, lit(" a@b.co")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7)) === 0,
          lit(" http://spam.spam/aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"))
          .otherwise(lit(""))).as("text"))
      graft.ops.Curate.qualityFilter(d).select("doc_id")
    }),
    "q_url_stats" -> ((s, dir) => {
      // URL density over text with synthesized links (the corpus itself is
      // URL-free): count + character fraction, exact int/int arithmetic.
      val t2 = T(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" visit https://ex"), col("doc_id"),
          lit(".org/x now or http://a.io")).as("t2"))
      t2.select(col("doc_id"), TextOps.urlCount(col("t2")).as("n_urls"),
        TextOps.urlCharRatio(col("t2")).as("url_ratio"))
    }),
    "q_token_ngrams" -> ((s, dir) => {
      // Top-20 token bigrams over the md5 tokenizer at a small vocab (1000:
      // collisions make real repeat counts); ties broken by the gram itself,
      // compared elementwise as int lists in both engines.
      val toks = T(s, dir, "documents")
        .select(graft.ops.TextHashExprs.tokenizeMd5(col("text"), 1000).as("tokens"))
      TextOps.topTokenNgrams(toks, "tokens", n = 2, topN = 20)
        .select(array_join(col("gram").cast("array<string>"), ",").as("gram_s"), col("cnt"))
    }),
    "q_redact" -> ((s, dir) => {
      // PII scrub over text with one synthesized email + phone per row (the
      // corpus itself is PII-free); global replacement + the pre-scrub count.
      val withPii = T(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact: user"), col("doc_id"),
          lit("@example.com or 555-123-4567")).as("text2"))
      withPii.select(col("doc_id"),
        TextOps.redactPii(col("text2")).as("clean"),
        TextOps.piiCount(col("text2")).as("n_pii"))
    }),

    // ---- event-time windowed aggregation (same plans run streaming with a
    // watermark — see graft.stream.Windowed and WindowedSpec) ----
    "q_window_tumbling" -> ((s, dir) =>
      graft.stream.Windowed.tumbling(T(s, dir, "events"),
        "ts", "1 hour", "10 minutes", Seq("event_type"))),
    "q_window_sliding" -> ((s, dir) =>
      graft.stream.Windowed.sliding(T(s, dir, "events"),
        "ts", "1 hour", "30 minutes", "10 minutes", Seq("event_type"))),
    "q_session_window" -> ((s, dir) =>
      graft.stream.Windowed.sessions(T(s, dir, "events"),
        "ts", "6 hours", "10 minutes", Seq("user_id"))),

    // ---- corpus curation: deterministic sampling / quotas / shuffle ----
    "q_sample_stratified" -> ((s, dir) =>
      graft.ops.Curate.stratifiedSample(T(s, dir, "documents"),
        col("lang"), col("doc_id"),
        Map("en" -> 0.25, "zh" -> 0.9), defaultFraction = 0.5, salt = "cur1")
        .select("doc_id", "lang", "source")),
    "q_quota_per_source" -> ((s, dir) =>
      graft.ops.Curate.quotaPerStratum(T(s, dir, "documents"),
        col("source"), Seq(col("n_chars").desc, col("doc_id")), n = 5)
        .select("doc_id", "source", "n_chars")),
    "q_shuffle_shards" -> ((s, dir) =>
      graft.ops.Curate.deterministicShuffle(T(s, dir, "documents"),
        col("doc_id"), shards = 8, salt = "sh1")
        .select("doc_id", "shard", "pos")),

    // ---- incremental CDC-out: net changes between two table snapshots ----
    "q_cdc_changes" -> ((s, dir) => {
      // Replay the derived stream in 4 epochs into a MOR table, snapshot the
      // version after epoch 2, then read the NET changes epoch-3..4 produced
      // (insert/update/delete per key; carried rows dropped). The oracle
      // recomputes both LWW states from the raw events and diffs them.
      val (table, midV) = replayedTable(s, dir)
      table.changesBetween(midV, table.snapshot.version)
        .select(col("doc_id"), col("change_op"), col("lsn"),
          array_join(col("tokens"), ",").as("tokens_s"), col("n_tok"), col("source"))
    }),
    "q_dsv2_changes" -> ((s, dir) => {
      // The same net-change read through the STANDARD API: the DataSource
      // V2 change feed (`format("icelite").option("changeFeed", "true")`)
      // with a startingVersion — resolution and diff run inside the
      // per-bucket partition readers with zero shuffle.
      val (table, midV) = replayedTable(s, dir)
      s.read.format("icelite").option("changeFeed", "true")
        .option("startingVersion", midV.toString).load(table.root)
        .select(col("doc_id"), col("change_op"), col("lsn"),
          array_join(col("tokens"), ",").as("tokens_s"), col("n_tok"), col("source"))
    }),
    "q_cdc_incr_agg" -> ((s, dir) => {
      // Incremental view maintenance: per-source (sum n_tok, count) kept
      // current from the mid-replay base aggregate + the pre/post-image
      // change frame — NO rescan of the final table. The oracle computes the
      // same aggregate from scratch over the final LWW state: incremental
      // must equal from-scratch exactly.
      val (table, midV) = replayedTable(s, dir)
      val base = table.readVersion(midV).groupBy(col("source"))
        .agg(sum(col("n_tok")).cast(LongType).as("sum_n_tok"), count(lit(1)).as("n"))
      val changes = table.changesBetween(midV, table.snapshot.version, includeBefore = true)
      graft.table.Maintain.sumCount(base, changes, "source", "n_tok")
    }),
    "q_scd2" -> ((s, dir) => {
      // SCD2 history from the derived change stream: one row per version
      // with [valid_from, valid_to) LSN intervals; deletes terminate the
      // prior version and emit nothing; a key's last non-delete event is
      // current. Single exchange + in-partition sort (lead window).
      graft.table.Temporal.scd2(derivedChanges(s, dir), "doc_id", "lsn", "op", "after")
        .select(col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
          col("n_tok"), col("source"), col("valid_from"), col("valid_to"),
          col("is_current"))
    }),
    "q_asof_join" -> ((s, dir) => {
      // Temporal point lookup: every 17th event probes its user's state 3
      // LSNs earlier. Union+window as-of (O(probes+versions), no range-join
      // fan-out); oracle = DuckDB's native ASOF LEFT JOIN — an independent
      // implementation of the same semantics.
      val versions = derivedChanges(s, dir)
        .select(col("doc_id"), col("lsn"), col("op"), col("after.source").as("source"))
      val probes = T(s, dir, "events")
        .filter(col("event_id") % 17 === 0)
        .select(col("event_id").as("probe_id"),
          col("user_id").cast(StringType).as("doc_id"),
          (col("event_id") - 3).as("as_of"))
      graft.table.Temporal.asofJoin(versions, probes, "doc_id", "lsn", "as_of")
        .select(col("probe_id"), col("doc_id"), col("as_of"),
          col("lsn").as("ver_lsn"), col("op").as("ver_op"), col("source").as("ver_source"))
    }),
    "q_merge_patch" -> ((s, dir) => patchReplay(s, dir, "cow")),
    "q_merge_patch_mor" -> ((s, dir) => patchReplay(s, dir, "mor")),
    "q_multi_table" -> ((s, dir) => {
      // One mixed stream routed into two tables by a stable per-key topic
      // (a key lives in exactly one source table), replayed in 2 epochs
      // through MultiTable.mergeRouted; result = both tables' final states
      // tagged. Oracle = the per-table LWW fold of the same routing.
      val ch = derivedChanges(s, dir)
        .withColumn("topic", concat(lit("t"), col("doc_id").cast(IntegerType) % 2))
      val lsnMax = lsnMaxOf(s, dir)
      def mk() = IceLite.create(s,
        java.nio.file.Files.createTempDirectory("graft-mt").toString,
        derivedPayloadType, "doc_id", numBuckets = 8)
      val (t0, t1) = (mk(), mk())
      val per = math.max(1L, (lsnMax + 1) / 2)
      (0 until 2).foreach { e =>
        val chunk = ch.filter(col("lsn") >= e * per && col("lsn") < math.min(lsnMax, (e + 1) * per))
        graft.stream.MultiTable.mergeRouted(chunk, "topic",
          Map("t0" -> t0, "t1" -> t1), s"mt/$e")
      }
      t0.read().withColumn("tbl", lit("t0"))
        .unionByName(t1.read().withColumn("tbl", lit("t1")))
        .select(col("tbl"), col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
          col("n_tok"), col("source"))
    }),
    "q_hot_keys" -> ((s, dir) =>
      // Heavy-hitter detection over a SKEW-SYNTHESIZED derivative of the
      // stream (every 5th event collapses onto one key — ~20% share, far
      // over the 2% trigger), so the driver gate asserts the detector's
      // FIRING path against the oracle, not just empty agreement; md5-keyed
      // 25% sample, deterministic, so the oracle recomputes the identical
      // sample. This is the skew-salting trigger (graft.merge.autoSaltShare).
      graft.merge.HotKeys.detect(
        derivedChanges(s, dir).withColumn("doc_id",
          when(col("lsn") % 5 === 0, lit("hot-0")).otherwise(col("doc_id"))),
        "doc_id", col("lsn"), minShare = 0.02, sampleFraction = 0.25)),
    "q_stream_join" -> ((s, dir) => {
      // Interval join (stream-stream shape, batch-verifiable): purchases
      // within 30 minutes AFTER a signup of the same user. The bounded
      // interval is what keeps streaming state finite — see StreamJoin.
      val ev = T(s, dir, "events")
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("id"))
      graft.stream.StreamJoin.interval(signups, purchases, "user_id", "ts", "ts",
        before = "0 seconds", after = "30 minutes", watermarkDelay = "10 minutes")
        .select(col("user_id"), col("id").as("s_id"), col("r_id").as("p_id"))
    }),
    "q_point_lookup" -> ((s, dir) => {
      // Point reads against the replayed MOR table: manifest prune (bucket
      // + key range) -> candidate files only -> winner resolve. Oracle =
      // the LWW final state restricted to the probed keys.
      val (table, _) = replayedTable(s, dir)
      table.lookup(Seq("3", "7", "11", "no-such-key"))
        .select(col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
          col("n_tok"), col("source"))
    }),
    "q_dsv2_point" -> ((s, dir) => {
      // Point read through the STANDARD connector API: the pushed key
      // IN-set prunes manifest-side to the keys' buckets AND rides into
      // the parquet readers as a row-group predicate (stats + dictionary +
      // bloom skipping inside candidate files) — the 10^10-row point-read
      // shape with zero library-specific calls. Oracle = the LWW fold
      // restricted to the probed keys (same as q_point_lookup).
      val (table, _) = replayedTable(s, dir)
      s.read.format("icelite").load(table.root)
        .filter(col("doc_id").isin("3", "7", "11", "no-such-key"))
        .select(col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
          col("n_tok"), col("source"))
    }),
    "q_zone_scan" -> ((s, dir) => {
      // Zone-map range scan: a stream whose n_tok varies per event replays
      // into a MOR table that collects per-file min/max for n_tok
      // (write.stats.columns); scanRange plans from the manifest, nominates
      // candidate keys from in-range files only, and resolves winners over
      // their buckets — sound under stale deltas (see IceLiteTable.scanRange
      // and ZoneScanSpec). Oracle = the LWW fold under the same predicate.
      val ch = zoneChanges(s, dir)
      val lsnMax = lsnMaxOf(s, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-zone").toString
      val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8,
        properties = Map("write.mode" -> "mor", "write.stats.columns" -> "n_tok"))
      Pipeline.replayBatch(s, ch, table, "zone", epochs = 4, lsnMax = lsnMax)
      table.scanRange("n_tok", 20, 40)
        .select(col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
          col("n_tok"), col("source"))
    }),

    "q_zorder_scan" -> ((s, dir) => {
      // Z-order clustering: the replayed table is rewritten along a Morton
      // curve over (n_tok, source), which tightens BOTH columns' per-file
      // zone maps at once (IceLiteTable.clusterZOrder; pruning pinned in
      // ZOrderSpec); the scan then ranges over the STRING column. Layout is
      // transparent to results — the oracle is the same LWW fold with the
      // same predicate, blind to the curve.
      val ch = zoneChanges(s, dir)
      val lsnMax = lsnMaxOf(s, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-zorder").toString
      val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8)
      Pipeline.replayBatch(s, ch, table, "zorder", epochs = 4, lsnMax = lsnMax)
      table.clusterZOrder(Seq("n_tok", "source"))
      table.scanRange("source", "purchase", "signup")
        .select(col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
          col("n_tok"), col("source"))
    }),

    "q_wap_publish" -> ((s, dir) => {
      // Write-audit-publish: the first 3 lsn-quarters replay normally; the
      // final quarter is STAGED (invisible to readers), audited over its net
      // delta, then published atomically via the rebasing protocol
      // (IceLiteTable.mergeStaged/publishStaged; isolation + drop/overlap
      // paths pinned in WapSpec). The published state must equal a plain
      // replay — the oracle is the same full LWW fold, blind to the gap.
      val root = java.nio.file.Files.createTempDirectory("graft-wap").toString
      val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8)
      val changes = derivedChanges(s, dir)
      val lsnMax = lsnMaxOf(s, dir)
      val w = lsnMax * 3 / 4
      Pipeline.replayBatch(s, changes.filter(col("lsn") < w), table, "wap", epochs = 3, lsnMax = w)
      table.mergeStaged(changes.filter(col("lsn") >= w), "wap/3", "audit-final")
      val published = table.publishStagedIf("audit-final") { delta =>
        delta.limit(1).count() > 0 // quality gate: a non-empty, readable delta
      }
      require(published.contains(graft.table.CommitOutcome.Committed),
        s"WAP publish failed: $published")
      table.read().select(col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
        col("n_tok"), col("source"))
    }),

    "q_sql_dml" -> ((s, dir) => {
      // Ad-hoc row-level corrections OUTSIDE the CDC stream (the GDPR /
      // bad-batch path): replay the full stream, then SQL-DELETE one
      // deterministic key slice and SQL-UPDATE another (assignments
      // referencing current values), both through the merge path
      // (IceLiteTable.deleteWhere/updateWhere via GraftSqlParser). The
      // oracle recomputes the LWW fold and applies the same corrections
      // relationally.
      val root = java.nio.file.Files.createTempDirectory("graft-dml").toString
      val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8)
      val changes = derivedChanges(s, dir)
      val lsnMax = lsnMaxOf(s, dir)
      Pipeline.replayBatch(s, changes, table, "dml", epochs = 2, lsnMax = lsnMax)
      val parser = new graft.sql.GraftSqlParser(s.sessionState.sqlParser)
      def runSql(stmt: String): Unit =
        org.apache.spark.sql.graftbridge.Exprs.ofRows(s, parser.parsePlan(stmt)).collect(): Unit
      runSql(s"DELETE FROM icelite.`$root` WHERE CAST(doc_id AS INT) % 10 = 3")
      runSql(s"UPDATE icelite.`$root` SET source = upper(source), n_tok = n_tok + 100 " +
        "WHERE CAST(doc_id AS INT) % 10 = 4")
      table.read().select(col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
        col("n_tok"), col("source"))
    }),

    "q_catalog_sql" -> ((s, dir) => {
      // STANDARD Spark SQL through the V2 TableCatalog (IceLiteCatalog):
      // CREATE TABLE graft.ns.t, engine replay into it, then INSERT INTO
      // (positional VALUES through the upsert write), DELETE FROM (merge-
      // path correction via SupportsDelete), and the final SELECT — all
      // parsed and analyzed by Spark's own grammar, no scoped regex parser
      // involved. Oracle = the LWW fold + the same relational corrections.
      // Setup is memoized per JVM: Spark caches the catalog plugin instance
      // on first reference, so a second run (the bench's warm pass) must
      // reuse the SAME warehouse rather than re-point the conf.
      catalogMemo.computeIfAbsent(dir, _ => {
        val wh = java.nio.file.Files.createTempDirectory("graft-cat").toString
        s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.IceLiteCatalog].getName)
        s.conf.set("spark.sql.catalog.graft.warehouse", wh)
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft.ds")
        s.sql("""CREATE TABLE graft.ds.docs (
                |  doc_id STRING, tokens ARRAY<INT>, n_tok INT, source STRING)
                |TBLPROPERTIES ('key'='doc_id', 'buckets'='8', 'write.mode'='mor')""".stripMargin)
        val table = IceLite.load(s, s"$wh/ds/docs")
        Pipeline.replayBatch(s, derivedChanges(s, dir), table, "cat",
          epochs = 2, lsnMax = lsnMaxOf(s, dir))
        s.sql("INSERT INTO graft.ds.docs VALUES ('cat-1', array(1,2,3), 3, 'manual')")
        s.sql("DELETE FROM graft.ds.docs WHERE doc_id LIKE '%7'")
        wh
      }): Unit
      s.sql("SELECT doc_id, array_join(tokens, ',') AS tokens_s, n_tok, source " +
        "FROM graft.ds.docs")
    })
  )

  /** Derived stream replayed in 4 epochs into a MOR IceLite table; returns
    * (table, snapshot version after epoch 2). Memoized per data dir — the
    * CDC-out queries share one replay per JVM. */
  private val replayMemo =
    new java.util.concurrent.ConcurrentHashMap[String, (graft.table.IceLiteTable, Long)]()
  private def replayedTable(s: SparkSession, dir: String): (graft.table.IceLiteTable, Long) =
    replayMemo.computeIfAbsent(dir, _ => {
      val ch = derivedChanges(s, dir)
      val lsnMax = lsnMaxOf(s, dir)
      val per = math.max(1L, (lsnMax + 3) / 4)
      val root = java.nio.file.Files.createTempDirectory("graft-changes").toString
      val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8,
        properties = Map("write.mode" -> "mor"))
      var midV = -1L
      (0 until 4).foreach { e =>
        val chunk = ch.filter(col("lsn") >= e * per && col("lsn") < math.min(lsnMax, (e + 1) * per))
        table.merge(chunk, s"chg/$e")
        if (e == 1) midV = table.snapshot.version
      }
      (table, midV)
    })

  def oracleSql: Map[String, String] = Map(
    "q_cdc_replay" ->
      """SELECT doc_id, last_lsn, last_source FROM (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id,
        |         CAST(event_id AS BIGINT) AS last_lsn,
        |         event_type AS last_source,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 AND last_source <> 'error'""".stripMargin,
    "q_cdc_merge_replay" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       2 AS n_tok,
        |       event_type AS source
        |FROM last WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    // The snapshot->stream handoff must be invisible: same full LWW fold as
    // a from-the-beginning replay.
    "q_bootstrap_handoff" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       2 AS n_tok,
        |       event_type AS source
        |FROM last WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    // The DLQ holds exactly the contract-violating rows, each labeled with
    // its FIRST violated rule (null_key > bad_op > null_payload).
    "q_dlq_route" ->
      """SELECT CASE WHEN event_id % 37 = 0 THEN '<null>'
        |            ELSE CAST(user_id AS VARCHAR) END AS key,
        |       CASE WHEN event_id % 37 <> 0 AND event_id % 31 = 0 THEN 'x'
        |            WHEN event_type = 'error' THEN 'd'
        |            WHEN event_type = 'signup' THEN 'c' ELSE 'u' END AS op,
        |       event_id AS lsn,
        |       CASE WHEN event_id % 37 = 0 THEN 'null_key'
        |            WHEN event_id % 31 = 0 THEN 'bad_op'
        |            ELSE 'null_payload' END AS error
        |FROM events
        |WHERE event_id % 37 = 0 OR event_id % 31 = 0
        |   OR (event_type <> 'error' AND event_id % 41 = 0)""".stripMargin,
    // With the violators routed away, the table must equal the LWW fold
    // over only the clean events.
    "q_dlq_clean_state" ->
      """WITH clean AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id
        |  FROM events
        |  WHERE NOT (event_id % 37 = 0 OR event_id % 31 = 0
        |             OR (event_type <> 'error' AND event_id % 41 = 0))),
        |last AS (
        |  SELECT doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY event_id DESC) AS rn
        |  FROM clean)
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       2 AS n_tok,
        |       event_type AS source
        |FROM last WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    // The rename is metadata-only relabeling: the fold is unchanged, the
    // surviving event_type column just reads back under its new name.
    // The DLQ holds exactly the rows whose (identically rebuilt) corrupted
    // payload fails a REAL JSON-validity check — the bracket-wrapped %29
    // rows are valid and must be absent.
    "q_dlq_parse" ->
      """WITH j AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key, event_id AS lsn,
        |         '{"uid":' || CAST(user_id AS VARCHAR) || ',"etype":"' || event_type || '"}' AS s
        |  FROM events),
        |c AS (
        |  SELECT key, lsn,
        |         CASE WHEN lsn % 23 = 0 THEN substr(s, 1, length(s)-1)
        |              WHEN lsn % 29 = 0 THEN '[' || s || ']'
        |              ELSE s END AS payload
        |  FROM j)
        |SELECT key, lsn, payload, 'parse_error' AS error
        |FROM c WHERE NOT json_valid(payload)""".stripMargin,
    "q_rename_evolve" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       2 AS n_tok,
        |       event_type AS origin
        |FROM last WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    // Widening is invisible to the fold: same LWW winners, n_tok BIGINT —
    // the beyond-int value for post-widening winners, the promoted stored
    // int for pre-widening winners.
    "q_widen_evolve" ->
      """WITH m AS (SELECT (MAX(event_id)+1)//2 AS mid FROM events),
        |last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       CAST(CASE WHEN event_id >= (SELECT mid FROM m)
        |                 THEN 4000000000 + event_id % 97 ELSE 2 END AS BIGINT) AS n_tok,
        |       event_type AS source
        |FROM last WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    // The tag pins the mid-stream snapshot: its read is the LWW fold over
    // only the first half, regardless of later ingest and maintenance.
    "q_tag_travel" ->
      """WITH m AS (SELECT (MAX(event_id)+1)//2 AS mid FROM events),
        |last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events WHERE event_id < (SELECT mid FROM m))
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       2 AS n_tok,
        |       event_type AS source
        |FROM last WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    // The drop is metadata-only relabeling: the fold is unchanged, the
    // surviving columns just come back without the dropped one.
    "q_drop_evolve" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       2 AS n_tok
        |FROM last WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    // The TVF read is the same LWW fold — SQL-only consumption changes
    // nothing about the state.
    "q_sql_scan" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       2 AS n_tok,
        |       event_type AS source
        |FROM last WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    // The DataSource V2 read is the same LWW fold under the query's
    // predicates — pushdown prunes, the residual filter re-applies.
    "q_dsv2_scan" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       2 AS n_tok,
        |       event_type AS source
        |FROM last WHERE rn = 1 AND event_type <> 'error'
        |  AND doc_id >= '100' AND event_type <> 'purchase'""".stripMargin,
    // The standard-API write is the same merge: the same LWW fold.
    "q_dsv2_write" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       2 AS n_tok,
        |       event_type AS source
        |FROM last WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    // Layout maintenance (bin-packing compaction mid-replay) must be
    // invisible to readers: the same LWW fold as the plain replay.
    "q_compact_replay" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       2 AS n_tok,
        |       event_type AS source
        |FROM last WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    // Concurrent writers partition the stream BY KEY, so the final table
    // state is interleaving-independent: the same full LWW fold.
    "q_concurrent_merge" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       2 AS n_tok,
        |       event_type AS source
        |FROM last WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    "q_smt_unwrap" ->
      """SELECT CAST(user_id AS VARCHAR) AS doc_id,
        |       CASE WHEN event_type = 'error' THEN 'd'
        |            WHEN event_type = 'signup' THEN 'c' ELSE 'u' END AS op,
        |       CAST(event_id AS BIGINT) AS lsn,
        |       CASE WHEN event_type = 'error' THEN NULL ELSE 2 END AS n_tok
        |FROM events""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type,
        |       CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k,
        |       count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |       CAST(round(sum(l_extendedprice), 2) AS DOUBLE) AS sum_base,
        |       CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS sum_disc_price,
        |       CAST(round(avg(l_quantity), 4) AS DOUBLE) AS avg_qty,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_topk_orders" ->
      """SELECT o_orderkey, o_orderpriority,
        |       CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_join_broadcast_dim" ->
      """SELECT p_brand,
        |       CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,
    "q_window_running" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(row_number() OVER w AS INT) AS rn,
        |       CAST(round(sum(o_totalprice) OVER w, 2) AS DOUBLE) AS running
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_semi_anti" ->
      """SELECT c_mktsegment, count(*) AS n, 'with_orders' AS kind FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT c_mktsegment, count(*) AS n, 'without_orders' AS kind FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,
    "q_setops" ->
      """SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
        |INTERSECT
        |SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,
    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""".stripMargin,
    "q_dedup_exact" ->
      """SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS keep_id, count(*) AS n
        |FROM documents GROUP BY md5(text)""".stripMargin,
    "q_jaccard_pairs" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(round(CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE) /
        |                  CAST(len(list_distinct(list_cat(a.ws, b.ws))) AS DOUBLE), 4) AS DOUBLE) AS jaccard
        |FROM w a JOIN w b ON b.doc_id = a.doc_id + 1""".stripMargin,
    "q_embed_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10),
        |     c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings),
        |     scored AS (
        |       SELECT qid, cid, list_cosine_similarity(qv, cv) AS sim
        |       FROM q CROSS JOIN c WHERE qid <> cid)
        |SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rank
        |FROM scored
        |QUALIFY rank <= 5""".stripMargin,
    "q_token_count" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_ws,
        |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe
        |FROM documents""".stripMargin,
    "q_text_quality" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_words,
        |       CAST(round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) / nullif(CAST(length(text) AS DOUBLE), 0), 4) AS DOUBLE) AS punct_ratio,
        |       CAST(round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) / nullif(CAST(length(text) AS DOUBLE), 0), 4) AS DOUBLE) AS digit_ratio,
        |       CAST(round(CAST(length(text) AS DOUBLE) / nullif(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 0), 4) AS DOUBLE) AS mean_word_len
        |FROM documents""".stripMargin,
    "q_lang_stopwords" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(ws, x -> x IN ('the','of','and','to','in','is','that','it','was','for','on','are','with','as','his','they','at','be','this','have'))) AS INT) AS en_hits,
        |  CAST(len(list_filter(ws, x -> x IN ('le','la','les','de','des','et','un','une','du','en','est','que','qui','dans','pour','pas','sur','avec','au','il'))) AS INT) AS fr_hits,
        |  CAST(len(list_filter(ws, x -> x IN ('der','die','das','und','ist','in','den','von','zu','mit','sich','des','auf','nicht','es','ein','eine','als','auch','an'))) AS INT) AS de_hits,
        |  CAST(len(list_filter(ws, x -> x IN ('el','la','los','las','de','y','en','un','una','que','es','del','se','por','con','para','su','al','lo','como'))) AS INT) AS es_hits
        |FROM w""".stripMargin,
    "q_fingerprint" ->
      """SELECT doc_id,
        |       CAST(COALESCE(list_sum(list_transform(regexp_extract_all(text, '\S+'),
        |            (x, i) -> CAST(i AS BIGINT) * CAST(length(x) AS BIGINT))), 0) % 1000000007 AS BIGINT) AS fp
        |FROM documents""".stripMargin,
    "q_json_evolve" ->
      """SELECT event_id,
        |       CASE WHEN event_id % 13 = 0 THEN NULL
        |            WHEN event_id % 2 = 0 THEN CAST(user_id AS DOUBLE)
        |            ELSE user_id + 0.5 END AS a,
        |       CASE WHEN event_id % 13 = 0 THEN NULL ELSE 's' || user_id END AS b_x
        |FROM events""".stripMargin,
    "q_schema_classes" ->
      """SELECT count(CASE WHEN event_id % 3 <> 0 THEN 1 END) AS n_struct,
        |       count(CASE WHEN event_id % 3 = 0 THEN 1 END) AS n_array,
        |       CAST(2 AS INT) AS n_classes
        |FROM events""".stripMargin,
    "q_json_variant" ->
      """SELECT event_id,
        |       CASE WHEN event_id % 3 = 0 THEN 'array' ELSE 'struct' END AS cls,
        |       CASE WHEN event_id % 3 = 0 THEN NULL ELSE CAST(user_id AS BIGINT) END AS a_val,
        |       CASE WHEN event_id % 3 = 0 THEN CAST(user_id AS BIGINT) ELSE NULL END AS arr0
        |FROM events""".stripMargin,
    "q_heartbeat" ->
      """SELECT 'k1' AS key, false AS passthrough
        |UNION ALL SELECT 'k2', true
        |UNION ALL SELECT 'k3', true
        |UNION ALL SELECT 'k4', false""".stripMargin,
    "q_schema_infer" ->
      """SELECT count(*) AS n,
        |       CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k
        |FROM events""".stripMargin,
    "q_lang_id" ->
      """WITH w AS (SELECT lang, regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
        |h AS (SELECT lang,
        |  len(list_filter(ws, x -> x IN ('the','of','and','to','in','is','that','it','was','for','on','are','with','as','his','they','at','be','this','have'))) AS en_h,
        |  len(list_filter(ws, x -> x IN ('le','la','les','de','des','et','un','une','du','en','est','que','qui','dans','pour','pas','sur','avec','au','il'))) AS fr_h,
        |  len(list_filter(ws, x -> x IN ('der','die','das','und','ist','in','den','von','zu','mit','sich','des','auf','nicht','es','ein','eine','als','auch','an'))) AS de_h,
        |  len(list_filter(ws, x -> x IN ('el','la','los','las','de','y','en','un','una','que','es','del','se','por','con','para','su','al','lo','como'))) AS es_h
        |FROM w)
        |SELECT lang,
        |       CASE WHEN greatest(en_h, fr_h, de_h, es_h) <= 0 THEN 'und'
        |            WHEN en_h >= fr_h AND en_h >= de_h AND en_h >= es_h THEN 'en'
        |            WHEN fr_h >= de_h AND fr_h >= es_h THEN 'fr'
        |            WHEN de_h >= es_h THEN 'de'
        |            ELSE 'es' END AS lang_pred,
        |       count(*) AS n
        |FROM h GROUP BY lang, lang_pred""".stripMargin,
    "q_outbox_route" ->
      """SELECT CAST(event_id AS VARCHAR) AS key,
        |       CASE WHEN event_id % 7 = 0 THEN 'pfx.t' || (user_id % 3) ELSE 'pfx.events' END AS topic,
        |       CAST(event_id % 16 AS INT) AS partition,
        |       CASE WHEN event_type = 'error' THEN NULL ELSE '{"uid":' || user_id || '}' END AS payload,
        |       CAST(props->>'$.k' AS VARCHAR) AS header_k,
        |       event_type = 'error' AS tombstone
        |FROM events WHERE event_id % 13 <> 0""".stripMargin,
    "q_outbox_partition" ->
      """SELECT 'k1' AS key, 'target' AS topic, 1 AS partition, 'some-partition-key' AS pk_header,
        |       'v1' AS h1, '180' AS h2
        |UNION ALL
        |SELECT 'k2' AS key, 'target' AS topic, 2 AS partition, 'another-partition-key' AS pk_header,
        |       'v1' AS h1, '210' AS h2""".stripMargin,
    "q_jose_decrypt" ->
      """SELECT 'jwe1' AS name, '{"foo":"bar"}' AS plaintext
        |UNION ALL
        |SELECT 'jwe2' AS name, '{"bar":"baz"}' AS plaintext""".stripMargin,
    "q_simhash_pairs" ->
      """WITH h AS (
        |  SELECT doc_id, list_transform(regexp_extract_all(lower(text), '\S+'), w ->
        |    (CASE WHEN md5_number_lower(w) >= 9223372036854775808
        |          THEN md5_number_lower(w)::HUGEINT - 18446744073709551616
        |          ELSE md5_number_lower(w)::HUGEINT END)::BIGINT) AS hs
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id, list_transform(range(0,64), b ->
        |    CASE WHEN 2 * len(list_filter(hs, x -> ((x >> b) & 1) = 1)) > len(hs) THEN 1 ELSE 0 END) AS bits
        |  FROM h)
        |SELECT * FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(list_sum(list_transform(range(0,64),
        |              i -> CASE WHEN a.bits[i+1] <> b.bits[i+1] THEN 1 ELSE 0 END)) AS INT) AS hamming
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
        |WHERE hamming <= 3""".stripMargin,
    "q_embed_dedup" ->
      """WITH p AS (
        |  SELECT pid, list_transform(range(0,64), d ->
        |    md5_number_lower('hp_' || pid || '_' || d)::DOUBLE / 18446744073709551616.0 * 2 - 1) AS comp
        |  FROM (SELECT unnest(range(0,64)) AS pid)),
        |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        |sig AS (
        |  SELECT e.vec_id, p.pid // 8 AS band,
        |         sum(CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0,64), d -> v[d+1] * comp[d+1])), (s, x) -> s + x) >= 0
        |             THEN (1::BIGINT << (p.pid % 8)) ELSE 0 END)::BIGINT AS bucket
        |  FROM e CROSS JOIN p GROUP BY e.vec_id, p.pid // 8),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM sig a JOIN sig b ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b, cosine FROM (
        |  SELECT id_a, id_b, round(list_cosine_similarity(ea.v, eb.v), 4) AS cosine
        |  FROM cand JOIN e ea ON ea.vec_id = id_a JOIN e eb ON eb.vec_id = id_b)
        |WHERE cosine >= 0.3""".stripMargin,
    "q_embed_lsh_topk" ->
      """WITH p AS (
        |  SELECT pid, list_transform(range(0,64), d ->
        |    md5_number_lower('hp_' || pid || '_' || d)::DOUBLE / 18446744073709551616.0 * 2 - 1) AS comp
        |  FROM (SELECT unnest(range(0,4)) AS pid)),
        |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        |sig AS (
        |  SELECT e.vec_id, e.v,
        |         sum(CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0,64), d -> v[d+1] * comp[d+1])), (s, x) -> s + x) >= 0
        |             THEN (1::BIGINT << pid) ELSE 0 END)::BIGINT AS bucket
        |  FROM e CROSS JOIN p GROUP BY e.vec_id, e.v),
        |scored AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid, q.bucket,
        |         list_cosine_similarity(q.v, c.v) AS sim
        |  FROM sig q JOIN sig c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10)
        |SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rank, bucket
        |FROM scored
        |QUALIFY rank <= 5""".stripMargin,
    "q_embed_lsh_persisted" ->
      // Identical semantics to q_embed_lsh_topk: the persisted index changes
      // WHERE signatures are computed (once, into bucket-partitioned
      // parquet), not WHAT the probe returns.
      """WITH p AS (
        |  SELECT pid, list_transform(range(0,64), d ->
        |    md5_number_lower('hp_' || pid || '_' || d)::DOUBLE / 18446744073709551616.0 * 2 - 1) AS comp
        |  FROM (SELECT unnest(range(0,4)) AS pid)),
        |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        |sig AS (
        |  SELECT e.vec_id, e.v,
        |         sum(CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0,64), d -> v[d+1] * comp[d+1])), (s, x) -> s + x) >= 0
        |             THEN (1::BIGINT << pid) ELSE 0 END)::BIGINT AS bucket
        |  FROM e CROSS JOIN p GROUP BY e.vec_id, e.v),
        |scored AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid, q.bucket,
        |         list_cosine_similarity(q.v, c.v) AS sim
        |  FROM sig q JOIN sig c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10)
        |SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rank, bucket
        |FROM scored
        |QUALIFY rank <= 5""".stripMargin,
    "q_embed_lsh_append" ->
      // The oracle is the FULL-corpus probe: bucket membership is a pure
      // function of the vector under the deterministic hyperplanes, so an
      // index built on half the corpus plus an append of the other half must
      // answer exactly like an index built on everything.
      """WITH p AS (
        |  SELECT pid, list_transform(range(0,64), d ->
        |    md5_number_lower('hp_' || pid || '_' || d)::DOUBLE / 18446744073709551616.0 * 2 - 1) AS comp
        |  FROM (SELECT unnest(range(0,4)) AS pid)),
        |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        |sig AS (
        |  SELECT e.vec_id, e.v,
        |         sum(CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0,64), d -> v[d+1] * comp[d+1])), (s, x) -> s + x) >= 0
        |             THEN (1::BIGINT << pid) ELSE 0 END)::BIGINT AS bucket
        |  FROM e CROSS JOIN p GROUP BY e.vec_id, e.v),
        |scored AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid, q.bucket,
        |         list_cosine_similarity(q.v, c.v) AS sim
        |  FROM sig q JOIN sig c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        |  WHERE q.vec_id < 10)
        |SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rank, bucket
        |FROM scored
        |QUALIFY rank <= 5""".stripMargin,
    "q_embed_ivf" ->
      // Cell assignment is tie/precision tolerant by construction: the dot
      // is the SAME left fold Spark's aggregate() computes (list_reduce with
      // 0.0 seed — bit-identical in both engines), and the argmax tie-break
      // is explicit (max dot, then MIN cell id — Spark's array_position
      // takes the first max).
      """WITH cent AS (
        |  SELECT cc, list_transform(range(0,64), d ->
        |    md5_number_lower('ivf_' || cc || '_' || d)::DOUBLE / 18446744073709551616.0 * 2 - 1) AS cv
        |  FROM (SELECT unnest(range(0,8)) AS cc)),
        |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        |dots AS (
        |  SELECT e.vec_id, e.v, cent.cc,
        |         list_reduce(list_prepend(0.0::DOUBLE,
        |           list_transform(range(0,64), d -> v[d+1] * cv[d+1])), (s, x) -> s + x) AS dot
        |  FROM e CROSS JOIN cent),
        |cells AS (
        |  SELECT vec_id, v, cc AS cell FROM (
        |    SELECT vec_id, v, cc,
        |           row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cc) AS rn
        |    FROM dots)
        |  WHERE rn = 1),
        |scored AS (
        |  SELECT q.vec_id AS qid, c.vec_id AS cid, list_cosine_similarity(q.v, c.v) AS sim
        |  FROM cells q JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10)
        |SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rank
        |FROM scored
        |QUALIFY rank <= 5""".stripMargin,
    // k-means retrained end-to-end in SQL: seeds = 4 smallest vec_ids,
    // 2 unrolled Lloyd's iterations, centroid updates quantized to 6 dp via
    // floor(x*1e6+0.5)/1e6 — PURE double arithmetic, bit-identical in both
    // engines, absorbing each engine's float-summation-order drift in avg().
    // Distances use the same left fold as Spark's aggregate(); argmin ties
    // break to the lowest cell (row_number ... ORDER BY dist, cell).
    "q_embed_kmeans" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        |dims AS (SELECT unnest(range(0,64)) AS d),
        |c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v AS cv
        |       FROM e QUALIFY row_number() OVER (ORDER BY vec_id) <= 4),
        |a0 AS (SELECT vec_id, v, cell FROM (
        |         SELECT e.vec_id, e.v, c0.cell,
        |                row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |                  list_reduce(list_prepend(0.0::DOUBLE,
        |                    list_transform(range(0,64), d -> (v[d+1] - cv[d+1]) * (v[d+1] - cv[d+1]))),
        |                    (s, x) -> s + x) ASC, c0.cell) AS rn
        |         FROM e CROSS JOIN c0) WHERE rn = 1),
        |m0 AS (SELECT cell, d, floor(avg(v[d+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
        |       FROM a0 CROSS JOIN dims GROUP BY cell, d),
        |c1 AS (SELECT c0.cell, list(COALESCE(m0.m, c0.cv[dims.d + 1]) ORDER BY dims.d) AS cv
        |       FROM c0 CROSS JOIN dims LEFT JOIN m0 ON m0.cell = c0.cell AND m0.d = dims.d
        |       GROUP BY c0.cell),
        |a1 AS (SELECT vec_id, v, cell FROM (
        |         SELECT e.vec_id, e.v, c1.cell,
        |                row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |                  list_reduce(list_prepend(0.0::DOUBLE,
        |                    list_transform(range(0,64), d -> (v[d+1] - cv[d+1]) * (v[d+1] - cv[d+1]))),
        |                    (s, x) -> s + x) ASC, c1.cell) AS rn
        |         FROM e CROSS JOIN c1) WHERE rn = 1),
        |m1 AS (SELECT cell, d, floor(avg(v[d+1]) * 1000000.0 + 0.5) / 1000000.0 AS m
        |       FROM a1 CROSS JOIN dims GROUP BY cell, d),
        |c2 AS (SELECT c1.cell, list(COALESCE(m1.m, c1.cv[dims.d + 1]) ORDER BY dims.d) AS cv
        |       FROM c1 CROSS JOIN dims LEFT JOIN m1 ON m1.cell = c1.cell AND m1.d = dims.d
        |       GROUP BY c1.cell),
        |af AS (SELECT vec_id, v, cell FROM (
        |         SELECT e.vec_id, e.v, c2.cell,
        |                row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |                  list_reduce(list_prepend(0.0::DOUBLE,
        |                    list_transform(range(0,64), d -> (v[d+1] - cv[d+1]) * (v[d+1] - cv[d+1]))),
        |                    (s, x) -> s + x) ASC, c2.cell) AS rn
        |         FROM e CROSS JOIN c2) WHERE rn = 1),
        |qp AS (SELECT vec_id AS qid, v AS qv, cell FROM (
        |         SELECT e.vec_id, e.v, c2.cell,
        |                row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |                  list_reduce(list_prepend(0.0::DOUBLE,
        |                    list_transform(range(0,64), d -> (v[d+1] - cv[d+1]) * (v[d+1] - cv[d+1]))),
        |                    (s, x) -> s + x) ASC, c2.cell) AS rn
        |         FROM e CROSS JOIN c2 WHERE e.vec_id < 10) WHERE rn <= 2),
        |scored AS (SELECT qp.qid, af.vec_id AS cid, list_cosine_similarity(qp.qv, af.v) AS sim
        |           FROM qp JOIN af ON af.cell = qp.cell AND af.vec_id <> qp.qid)
        |SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rank
        |FROM scored
        |QUALIFY rank <= 5""".stripMargin,
    "q_embed_multiprobe" ->
      """WITH p AS (
        |  SELECT pid, list_transform(range(0,64), d ->
        |    md5_number_lower('hp_' || pid || '_' || d)::DOUBLE / 18446744073709551616.0 * 2 - 1) AS comp
        |  FROM (SELECT unnest(range(0,4)) AS pid)),
        |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
        |sig AS (
        |  SELECT e.vec_id, e.v,
        |         sum(CASE WHEN list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0,64), d -> v[d+1] * comp[d+1])), (s, x) -> s + x) >= 0
        |             THEN (1::BIGINT << pid) ELSE 0 END)::BIGINT AS bucket
        |  FROM e CROSS JOIN p GROUP BY e.vec_id, e.v),
        |q AS (
        |  SELECT vec_id AS qid, v AS qv,
        |         unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4), xor(bucket, 8)]) AS bucket
        |  FROM sig WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.qid, c.vec_id AS cid, list_cosine_similarity(q.qv, c.v) AS sim
        |  FROM q JOIN sig c ON c.bucket = q.bucket AND c.vec_id <> q.qid)
        |SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INT) AS rank
        |FROM scored
        |QUALIFY rank <= 5""".stripMargin,
    "q_minhash_dedup" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
        |sh AS (
        |  SELECT doc_id, list_sort(list_distinct(list_transform(
        |    CASE WHEN len(ws) >= 3
        |         THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |         ELSE [array_to_string(ws, ' ')] END,
        |    s -> (CASE WHEN md5_number_lower(s) >= 9223372036854775808
        |               THEN md5_number_lower(s)::HUGEINT - 18446744073709551616
        |               ELSE md5_number_lower(s)::HUGEINT END)::BIGINT))) AS hs
        |  FROM w),
        |coef AS (
        |  SELECT
        |    list_transform(range(0,32), j -> (((CASE WHEN md5_number_lower('mh_a_' || j) >= 9223372036854775808
        |          THEN md5_number_lower('mh_a_' || j)::HUGEINT - 18446744073709551616
        |          ELSE md5_number_lower('mh_a_' || j)::HUGEINT END % 2147483646) + 2147483646) % 2147483646 + 1)::BIGINT) AS a,
        |    list_transform(range(0,32), j -> (((CASE WHEN md5_number_lower('mh_b_' || j) >= 9223372036854775808
        |          THEN md5_number_lower('mh_b_' || j)::HUGEINT - 18446744073709551616
        |          ELSE md5_number_lower('mh_b_' || j)::HUGEINT END % 2147483647) + 2147483647) % 2147483647)::BIGINT) AS b),
        |sig AS (
        |  SELECT doc_id, hs, list_transform(range(0,32), j ->
        |    list_min(list_transform(hs, h -> (a[j+1] * (((h % 2147483647) + 2147483647) % 2147483647) + b[j+1]) % 2147483647))) AS sg
        |  FROM sh CROSS JOIN coef),
        |banded AS (
        |  SELECT doc_id, t.band,
        |    md5_number_lower(array_to_string(sg[band*4+1 : band*4+4], ',')) AS bucket
        |  FROM sig CROSS JOIN (SELECT unnest(range(0,8)) AS band) t),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT id_a, id_b,
        |    round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) / CAST(len(list_distinct(list_cat(sa.hs, sb.hs))) AS DOUBLE), 4) AS jaccard
        |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b)
        |WHERE jaccard >= 0.4""".stripMargin,
    "q_dedup_components" ->
      """WITH RECURSIVE w AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
        |sh AS (
        |  SELECT doc_id, list_sort(list_distinct(list_transform(
        |    CASE WHEN len(ws) >= 3
        |         THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |         ELSE [array_to_string(ws, ' ')] END,
        |    s -> (CASE WHEN md5_number_lower(s) >= 9223372036854775808
        |               THEN md5_number_lower(s)::HUGEINT - 18446744073709551616
        |               ELSE md5_number_lower(s)::HUGEINT END)::BIGINT))) AS hs
        |  FROM w),
        |coef AS (
        |  SELECT
        |    list_transform(range(0,32), j -> (((CASE WHEN md5_number_lower('mh_a_' || j) >= 9223372036854775808
        |          THEN md5_number_lower('mh_a_' || j)::HUGEINT - 18446744073709551616
        |          ELSE md5_number_lower('mh_a_' || j)::HUGEINT END % 2147483646) + 2147483646) % 2147483646 + 1)::BIGINT) AS a,
        |    list_transform(range(0,32), j -> (((CASE WHEN md5_number_lower('mh_b_' || j) >= 9223372036854775808
        |          THEN md5_number_lower('mh_b_' || j)::HUGEINT - 18446744073709551616
        |          ELSE md5_number_lower('mh_b_' || j)::HUGEINT END % 2147483647) + 2147483647) % 2147483647)::BIGINT) AS b),
        |sig AS (
        |  SELECT doc_id, hs, list_transform(range(0,32), j ->
        |    list_min(list_transform(hs, h -> (a[j+1] * (((h % 2147483647) + 2147483647) % 2147483647) + b[j+1]) % 2147483647))) AS sg
        |  FROM sh CROSS JOIN coef),
        |banded AS (
        |  SELECT doc_id, t.band,
        |    md5_number_lower(array_to_string(sg[band*4+1 : band*4+4], ',')) AS bucket
        |  FROM sig CROSS JOIN (SELECT unnest(range(0,8)) AS band) t),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT id_a, id_b,
        |      round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) / CAST(len(list_distinct(list_cat(sa.hs, sb.hs))) AS DOUBLE), 4) AS jaccard
        |    FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b)
        |  WHERE jaccard >= 0.4),
        |e AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |r AS (
        |  SELECT src AS id, dst AS x FROM e
        |  UNION
        |  SELECT r.id, e.dst FROM r JOIN e ON e.src = r.x)
        |SELECT id, least(id, min(x)) AS component, least(id, min(x)) = id AS keep
        |FROM r GROUP BY id""".stripMargin,
    "q_dedup_pipeline" ->
      // Same pair kernel + transitive closure as q_dedup_components, then
      // the anti-join a user runs: keep only each group's canonical doc.
      """WITH RECURSIVE w AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
        |sh AS (
        |  SELECT doc_id, list_sort(list_distinct(list_transform(
        |    CASE WHEN len(ws) >= 3
        |         THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |         ELSE [array_to_string(ws, ' ')] END,
        |    s -> (CASE WHEN md5_number_lower(s) >= 9223372036854775808
        |               THEN md5_number_lower(s)::HUGEINT - 18446744073709551616
        |               ELSE md5_number_lower(s)::HUGEINT END)::BIGINT))) AS hs
        |  FROM w),
        |coef AS (
        |  SELECT
        |    list_transform(range(0,32), j -> (((CASE WHEN md5_number_lower('mh_a_' || j) >= 9223372036854775808
        |          THEN md5_number_lower('mh_a_' || j)::HUGEINT - 18446744073709551616
        |          ELSE md5_number_lower('mh_a_' || j)::HUGEINT END % 2147483646) + 2147483646) % 2147483646 + 1)::BIGINT) AS a,
        |    list_transform(range(0,32), j -> (((CASE WHEN md5_number_lower('mh_b_' || j) >= 9223372036854775808
        |          THEN md5_number_lower('mh_b_' || j)::HUGEINT - 18446744073709551616
        |          ELSE md5_number_lower('mh_b_' || j)::HUGEINT END % 2147483647) + 2147483647) % 2147483647)::BIGINT) AS b),
        |sig AS (
        |  SELECT doc_id, hs, list_transform(range(0,32), j ->
        |    list_min(list_transform(hs, h -> (a[j+1] * (((h % 2147483647) + 2147483647) % 2147483647) + b[j+1]) % 2147483647))) AS sg
        |  FROM sh CROSS JOIN coef),
        |banded AS (
        |  SELECT doc_id, t.band,
        |    md5_number_lower(array_to_string(sg[band*4+1 : band*4+4], ',')) AS bucket
        |  FROM sig CROSS JOIN (SELECT unnest(range(0,8)) AS band) t),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
        |pairs AS (
        |  SELECT id_a, id_b FROM (
        |    SELECT id_a, id_b,
        |      round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE) / CAST(len(list_distinct(list_cat(sa.hs, sb.hs))) AS DOUBLE), 4) AS jaccard
        |    FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b)
        |  WHERE jaccard >= 0.4),
        |e AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |r AS (
        |  SELECT src AS id, dst AS x FROM e
        |  UNION
        |  SELECT r.id, e.dst FROM r JOIN e ON e.src = r.x),
        |dup AS (SELECT id FROM r GROUP BY id HAVING least(id, min(x)) <> id)
        |SELECT d.doc_id FROM documents d
        |WHERE d.doc_id NOT IN (SELECT id FROM dup)""".stripMargin,
    "q_stream_dedup" ->
      // Incremental ingest probe: even-id corpus vs odd-id batch. Same md5
      // MinHash kernel; dupes = batch docs whose exact Jaccard against a
      // band-collided corpus doc reaches 0.4; best match wins ties by id.
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
        |sh AS (
        |  SELECT doc_id, list_sort(list_distinct(list_transform(
        |    CASE WHEN len(ws) >= 3
        |         THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |         ELSE [array_to_string(ws, ' ')] END,
        |    s -> (CASE WHEN md5_number_lower(s) >= 9223372036854775808
        |               THEN md5_number_lower(s)::HUGEINT - 18446744073709551616
        |               ELSE md5_number_lower(s)::HUGEINT END)::BIGINT))) AS hs
        |  FROM w),
        |coef AS (
        |  SELECT
        |    list_transform(range(0,32), j -> (((CASE WHEN md5_number_lower('mh_a_' || j) >= 9223372036854775808
        |          THEN md5_number_lower('mh_a_' || j)::HUGEINT - 18446744073709551616
        |          ELSE md5_number_lower('mh_a_' || j)::HUGEINT END % 2147483646) + 2147483646) % 2147483646 + 1)::BIGINT) AS a,
        |    list_transform(range(0,32), j -> (((CASE WHEN md5_number_lower('mh_b_' || j) >= 9223372036854775808
        |          THEN md5_number_lower('mh_b_' || j)::HUGEINT - 18446744073709551616
        |          ELSE md5_number_lower('mh_b_' || j)::HUGEINT END % 2147483647) + 2147483647) % 2147483647)::BIGINT) AS b),
        |sig AS (
        |  SELECT doc_id, hs, list_transform(range(0,32), j ->
        |    list_min(list_transform(hs, h -> (a[j+1] * (((h % 2147483647) + 2147483647) % 2147483647) + b[j+1]) % 2147483647))) AS sg
        |  FROM sh CROSS JOIN coef),
        |banded AS (
        |  SELECT doc_id, t.band,
        |    md5_number_lower(array_to_string(sg[band*4+1 : band*4+4], ',')) AS bucket
        |  FROM sig CROSS JOIN (SELECT unnest(range(0,8)) AS band) t),
        |cand AS (
        |  SELECT DISTINCT b.doc_id AS id, a.doc_id AS dup_of
        |  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1),
        |scored AS (
        |  SELECT id, dup_of, jaccard FROM (
        |    SELECT id, dup_of,
        |      round(CAST(len(list_intersect(sb.hs, sa.hs)) AS DOUBLE) / CAST(len(list_distinct(list_cat(sb.hs, sa.hs))) AS DOUBLE), 4) AS jaccard
        |    FROM cand JOIN sh sa ON sa.doc_id = dup_of JOIN sh sb ON sb.doc_id = id)
        |  WHERE jaccard >= 0.4)
        |SELECT id, dup_of, jaccard FROM scored
        |QUALIFY row_number() OVER (PARTITION BY id ORDER BY jaccard DESC, dup_of) = 1""".stripMargin,
    "q_tokenize" ->
      """SELECT doc_id,
        |       array_to_string(list_transform(regexp_extract_all(lower(text), '\S+'),
        |         w -> CAST(md5_number_lower(w) % 32000 AS INT)), ',') AS tokens_s
        |FROM documents""".stripMargin,
    "q_pack_chunks" ->
      // Context-window packing recomputed in SQL: same shard hash, same
      // per-shard running offsets (window sum over doc_id order), same
      // chunk spans and slices, chunks reassembled with list(ORDER BY pos).
      """WITH d0 AS (
        |  SELECT CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) % 8 AS INT) AS shard, doc_id,
        |         list_transform(regexp_extract_all(lower(text), '\S+'),
        |           w -> CAST(md5_number_lower(w) % 32000 AS INT)) AS toks
        |  FROM documents),
        |d AS (SELECT shard, doc_id, toks, CAST(len(toks) AS BIGINT) AS n FROM d0 WHERE len(toks) > 0),
        |o AS (SELECT *, CAST(sum(n) OVER (PARTITION BY shard ORDER BY doc_id) - n AS BIGINT) AS s FROM d),
        |sp0 AS (SELECT shard, s, n, toks,
        |               unnest(generate_series(s // 128, (s + n - 1) // 128)) AS c
        |        FROM o),
        |sp AS (
        |  SELECT shard, c AS chunk, greatest(s, c * 128) AS pos,
        |         list_slice(toks, CAST(greatest(s, c * 128) - s + 1 AS INT),
        |                    CAST(least(s + n, (c + 1) * 128) - s AS INT)) AS frag
        |  FROM sp0)
        |SELECT shard, chunk,
        |       array_to_string(flatten(list(frag ORDER BY pos)), ',') AS tokens_s,
        |       count(*) AS n_frags
        |FROM sp GROUP BY shard, chunk
        |HAVING len(flatten(list(frag ORDER BY pos))) = 128""".stripMargin,
    "q_multimodal_features" ->
      """WITH m AS (SELECT unnest(range(0, 500)) AS id),
        |d AS (SELECT id, CAST(id % 3 AS INT) AS md FROM m)
        |SELECT id AS media_id,
        |  CASE md WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  CASE WHEN md <> 1 THEN CAST(16 + id % 16 AS INT) END AS width,
        |  CASE WHEN md <> 1 THEN CAST(16 + id % 8 AS INT) END AS height,
        |  CASE WHEN md = 0 THEN CAST((id * 37) % 256 AS DOUBLE)
        |       WHEN md = 2 THEN round(CASE WHEN 2 + (id // 3) % 3 >= 3
        |            THEN ((id * 37) % 256 + (id * 37 + 22) % 256) / 2.0
        |            ELSE CAST((id * 37) % 256 AS DOUBLE) END, 4) END AS mean_px,
        |  CASE WHEN md = 1 THEN 16000 END AS sample_rate,
        |  CASE WHEN md = 1 THEN CAST(800 + (id % 10) * 160 AS INT) END AS n_samples,
        |  CASE WHEN md = 1 THEN CAST(1000 + (id % 50) * 100 AS DOUBLE) END AS rms,
        |  CASE WHEN md = 2 THEN CAST(2 + (id // 3) % 3 AS INT) END AS n_frames
        |FROM d""".stripMargin,

    // Decontamination: same md5 shingle construction as the dedup oracles
    // (lowercased words, 3-word windows, whole-text fallback under 3 words);
    // a survivor shares no shingle hash with any benchmark doc. Equality-only
    // use, so the unsigned md5_number_lower values compare directly.
    "q_decontaminate" ->
      """WITH w AS (SELECT doc_id, lang, source,
        |                 regexp_extract_all(lower(text), '\S+') AS ws FROM documents),
        |sh AS (
        |  SELECT doc_id, lang, source, list_distinct(list_transform(
        |    CASE WHEN len(ws) >= 3
        |         THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
        |         ELSE [array_to_string(ws, ' ')] END,
        |    s -> md5_number_lower(s))) AS hs
        |  FROM w)
        |SELECT c.doc_id, c.lang, c.source
        |FROM sh c
        |WHERE c.doc_id % 10 <> 0
        |  AND NOT EXISTS (
        |    SELECT 1 FROM sh b
        |    WHERE b.doc_id % 10 = 0 AND len(list_intersect(c.hs, b.hs)) > 0)""".stripMargin,
    "q_dedup_segments" ->
      """WITH t AS (SELECT doc_id, text || '. ' || text AS text2 FROM documents),
        |l AS (SELECT doc_id, string_split_regex(text2, '\. ') AS segs FROM t),
        |u AS (SELECT doc_id, unnest(list_transform(range(1, len(segs) + 1),
        |                            i -> {'pos': i, 'seg': segs[i]})) AS s FROM l),
        |f AS (SELECT doc_id, s.pos AS pos, s.seg AS seg,
        |             row_number() OVER (PARTITION BY doc_id, s.seg ORDER BY s.pos) AS rn
        |      FROM u),
        |clean AS (SELECT doc_id, string_agg(seg, '. ' ORDER BY pos) AS clean
        |          FROM f WHERE rn = 1 GROUP BY doc_id),
        |stats AS (SELECT doc_id, count(*) AS n, count(DISTINCT seg) AS nd FROM f GROUP BY doc_id)
        |SELECT c.doc_id, c.clean, CAST(st.n - st.nd AS DOUBLE) / st.n AS dup_ratio
        |FROM clean c JOIN stats st ON c.doc_id = st.doc_id""".stripMargin,
    "q_corpus_stats" ->
      """WITH w AS (SELECT source, text, len(regexp_extract_all(text, '\S+')) AS wc FROM documents)
        |SELECT source,
        |       count(*) AS n_docs,
        |       count(DISTINCT md5(text)) AS distinct_texts,
        |       CAST(sum(wc) AS BIGINT) AS total_tokens,
        |       floor(avg(wc) * 1000000.0 + 0.5) / 1000000.0 AS tok_mean,
        |       quantile_cont(wc, 0.5) AS tok_p50,
        |       quantile_cont(wc, 0.9) AS tok_p90
        |FROM w GROUP BY source""".stripMargin,
    "q_curate_filter" ->
      """WITH t AS (SELECT doc_id,
        |  text
        |  || CASE WHEN doc_id % 5 = 0 THEN '. ' || text ELSE '' END
        |  || CASE WHEN doc_id % 3 = 0 THEN ' a@b.co' ELSE '' END
        |  || CASE WHEN doc_id % 7 = 0 THEN ' http://spam.spam/aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa' ELSE '' END AS t2
        |  FROM documents),
        |s AS (SELECT doc_id, t2,
        |  len(regexp_extract_all(t2, '\S+')) AS nw,
        |  string_split_regex(t2, '\. ') AS segs,
        |  COALESCE(list_sum(list_transform(regexp_extract_all(t2, 'https?://\S+'), u -> len(u))), 0) AS uc,
        |  len(regexp_extract_all(t2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |    + len(regexp_extract_all(t2, '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS pii
        |  FROM t)
        |SELECT doc_id FROM s
        |WHERE nw >= 5
        |  AND CAST(len(segs) - len(list_distinct(segs)) AS DOUBLE) / len(segs) <= 0.3
        |  AND CAST(uc AS DOUBLE) / len(t2) <= 0.02
        |  AND pii <= 0""".stripMargin,
    "q_url_stats" ->
      """WITH t AS (SELECT doc_id,
        |  text || ' visit https://ex' || doc_id || '.org/x now or http://a.io' AS t2
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(t2, 'https?://\S+')) AS INT) AS n_urls,
        |       CAST(COALESCE(list_sum(list_transform(regexp_extract_all(t2, 'https?://\S+'),
        |                                             u -> len(u))), 0) AS DOUBLE)
        |         / len(t2) AS url_ratio
        |FROM t""".stripMargin,
    "q_token_ngrams" ->
      """WITH toks AS (
        |  SELECT list_transform(regexp_extract_all(lower(text), '\S+'),
        |    w -> CAST(md5_number_lower(w) % 1000 AS INT)) AS t
        |  FROM documents),
        |g AS (SELECT unnest(list_transform(range(0, len(t) - 1), i -> t[i+1:i+2])) AS gram
        |      FROM toks),
        |c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY gram)
        |SELECT array_to_string(list_transform(gram, x -> CAST(x AS VARCHAR)), ',') AS gram_s, cnt
        |FROM c ORDER BY cnt DESC, gram ASC LIMIT 20""".stripMargin,
    "q_redact" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         text || ' contact: user' || doc_id || '@example.com or 555-123-4567' AS text2
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(text2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g') AS clean,
        |  CAST(len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |     + len(regexp_extract_all(text2, '[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS INT) AS n_pii
        |FROM p""".stripMargin,

    // Tumbling windows: whole-second, hour-aligned starts — pure integer
    // epoch arithmetic on both sides.
    "q_window_tumbling" ->
      """SELECT CAST(epoch_us(ts) // 3600000000 * 3600 AS BIGINT) AS w_start,
        |       CAST(epoch_us(ts) // 3600000000 * 3600 + 3600 AS BIGINT) AS w_end,
        |       event_type, count(*) AS n,
        |       CAST(round(sum(value), 2) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    // Sliding 1h/30min: each event lands in exactly 2 windows (k = 0, 1).
    "q_window_sliding" ->
      """SELECT CAST((epoch_us(ts) // 1800000000 - offs.k) * 1800 AS BIGINT) AS w_start,
        |       CAST((epoch_us(ts) // 1800000000 - offs.k) * 1800 + 3600 AS BIGINT) AS w_end,
        |       event_type, count(*) AS n,
        |       CAST(round(sum(value), 2) AS DOUBLE) AS total_value
        |FROM events CROSS JOIN (VALUES (0), (1)) AS offs(k)
        |GROUP BY 1, 2, 3""".stripMargin,
    // Session windows (gap 6h): the SQL islands construction — a session
    // break is a silence STRICTLY longer than the gap; session start = first
    // event (exact integer microseconds). Spark's session merge is inclusive
    // at the boundary (windows [ts, ts+gap) merge when adjacent, verified in
    // WindowedSpec), so the break condition is > gap, not >=.
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us FROM events),
        |flagged AS (
        |  SELECT user_id, us,
        |         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |                   > 21600000000 THEN 1
        |              WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL THEN 1
        |              ELSE 0 END AS new_s
        |  FROM e),
        |sess AS (
        |  SELECT user_id, us,
        |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us
        |                          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, min(us) AS s_start_us, count(*) AS n
        |FROM sess GROUP BY user_id, sid""".stripMargin,

    // Deterministic stratified sampling: integer per-million die on the
    // md5-lower-64 of doc_id + salt, per-stratum thresholds.
    "q_sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE md5_number_lower(CAST(doc_id AS VARCHAR) || ':cur1') % 1000000 <
        |      CASE lang WHEN 'en' THEN 250000 WHEN 'zh' THEN 900000
        |                ELSE 500000 END""".stripMargin,
    "q_quota_per_source" ->
      """SELECT doc_id, source, n_chars FROM (
        |  SELECT doc_id, source, n_chars,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents) WHERE rn <= 5""".stripMargin,
    // Deterministic global shuffle: shard = unsigned md5 mod 8; position =
    // md5 hex order within the shard (lowercase hex sorts identically in
    // both engines).
    "q_shuffle_shards" ->
      """SELECT doc_id,
        |       CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || ':sh1') % 8 AS INT) AS shard,
        |       CAST(row_number() OVER (
        |         PARTITION BY md5_number_lower(CAST(doc_id AS VARCHAR) || ':sh1') % 8
        |         ORDER BY md5(CAST(doc_id AS VARCHAR) || ':sh1'), doc_id) AS INT) AS pos
        |FROM documents""".stripMargin,

    // CDC-out: diff of the two LWW folds (state after epoch 2 of 4 vs final)
    // over the derived change stream; carried keys (same winner lsn) drop.
    "q_cdc_changes" ->
      """WITH ch AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id,
        |         CASE event_type WHEN 'error' THEN 'd' WHEN 'signup' THEN 'c'
        |              ELSE 'u' END AS op,
        |         event_id AS lsn,
        |         CAST(user_id AS INT) AS t0, CAST(event_id % 97 AS INT) AS t1,
        |         event_type AS source
        |  FROM events),
        |cut AS (SELECT ((max(lsn) + 1 + 3) // 4) * 2 AS c FROM ch),
        |bw AS (SELECT doc_id, max(lsn) AS blsn, arg_max(op, lsn) AS bop
        |       FROM ch, cut WHERE lsn < c GROUP BY doc_id),
        |aw AS (SELECT doc_id, max(lsn) AS alsn, arg_max(op, lsn) AS aop,
        |              arg_max(t0, lsn) AS t0, arg_max(t1, lsn) AS t1,
        |              arg_max(source, lsn) AS src
        |       FROM ch GROUP BY doc_id)
        |SELECT aw.doc_id,
        |       CASE WHEN (bw.doc_id IS NULL OR bop = 'd') AND aop <> 'd' THEN 'insert'
        |            WHEN bop <> 'd' AND aop <> 'd' AND alsn <> blsn THEN 'update'
        |            WHEN bop <> 'd' AND aop = 'd' THEN 'delete' END AS change_op,
        |       alsn AS lsn,
        |       CASE WHEN aop <> 'd'
        |            THEN CAST(t0 AS VARCHAR) || ',' || CAST(t1 AS VARCHAR) END AS tokens_s,
        |       CASE WHEN aop <> 'd' THEN CAST(2 AS INT) END AS n_tok,
        |       CASE WHEN aop <> 'd' THEN src END AS source
        |FROM aw LEFT JOIN bw ON aw.doc_id = bw.doc_id
        |WHERE CASE WHEN (bw.doc_id IS NULL OR bop = 'd') AND aop <> 'd' THEN 'insert'
        |           WHEN bop <> 'd' AND aop <> 'd' AND alsn <> blsn THEN 'update'
        |           WHEN bop <> 'd' AND aop = 'd' THEN 'delete' END IS NOT NULL""".stripMargin,
    // The V2 change feed computes the SAME net diff as changesBetween —
    // identical oracle.
    "q_dsv2_changes" ->
      """WITH ch AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id,
        |         CASE event_type WHEN 'error' THEN 'd' WHEN 'signup' THEN 'c'
        |              ELSE 'u' END AS op,
        |         event_id AS lsn,
        |         CAST(user_id AS INT) AS t0, CAST(event_id % 97 AS INT) AS t1,
        |         event_type AS source
        |  FROM events),
        |cut AS (SELECT ((max(lsn) + 1 + 3) // 4) * 2 AS c FROM ch),
        |bw AS (SELECT doc_id, max(lsn) AS blsn, arg_max(op, lsn) AS bop
        |       FROM ch, cut WHERE lsn < c GROUP BY doc_id),
        |aw AS (SELECT doc_id, max(lsn) AS alsn, arg_max(op, lsn) AS aop,
        |              arg_max(t0, lsn) AS t0, arg_max(t1, lsn) AS t1,
        |              arg_max(source, lsn) AS src
        |       FROM ch GROUP BY doc_id)
        |SELECT aw.doc_id,
        |       CASE WHEN (bw.doc_id IS NULL OR bop = 'd') AND aop <> 'd' THEN 'insert'
        |            WHEN bop <> 'd' AND aop <> 'd' AND alsn <> blsn THEN 'update'
        |            WHEN bop <> 'd' AND aop = 'd' THEN 'delete' END AS change_op,
        |       alsn AS lsn,
        |       CASE WHEN aop <> 'd'
        |            THEN CAST(t0 AS VARCHAR) || ',' || CAST(t1 AS VARCHAR) END AS tokens_s,
        |       CASE WHEN aop <> 'd' THEN CAST(2 AS INT) END AS n_tok,
        |       CASE WHEN aop <> 'd' THEN src END AS source
        |FROM aw LEFT JOIN bw ON aw.doc_id = bw.doc_id
        |WHERE CASE WHEN (bw.doc_id IS NULL OR bop = 'd') AND aop <> 'd' THEN 'insert'
        |           WHEN bop <> 'd' AND aop <> 'd' AND alsn <> blsn THEN 'update'
        |           WHEN bop <> 'd' AND aop = 'd' THEN 'delete' END IS NOT NULL""".stripMargin,
    // PQ/ADC: encode (argmin of per-subspace squared distance to md5-derived
    // codebooks), query LUT, and the score arithmetic all recomputed with
    // the SAME left-fold order as the Spark expressions (bit-identical
    // doubles; ties broken by cid both sides). q_embed_ivfpq probes every
    // cell (nprobe = nCells) and must therefore match this same oracle.
    "q_embed_pq" -> pqOracleSql,
    "q_embed_ivfpq" -> pqOracleSql,
    // Incremental == from-scratch: the oracle aggregates the FINAL LWW state
    // directly; the Spark side maintained it from the mid-replay base plus
    // retraction deltas.
    "q_cdc_incr_agg" ->
      """WITH ch AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id,
        |         CASE event_type WHEN 'error' THEN 'd' WHEN 'signup' THEN 'c'
        |              ELSE 'u' END AS op,
        |         event_id AS lsn, event_type AS source
        |  FROM events),
        |aw AS (SELECT doc_id, arg_max(op, lsn) AS aop, arg_max(source, lsn) AS src
        |       FROM ch GROUP BY doc_id)
        |SELECT src AS source, CAST(sum(2) AS BIGINT) AS sum_n_tok,
        |       count(*) AS n
        |FROM aw WHERE aop <> 'd' GROUP BY src""".stripMargin,
    "q_scd2" ->
      """WITH ch AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id,
        |         CASE event_type WHEN 'error' THEN 'd' WHEN 'signup' THEN 'c'
        |              ELSE 'u' END AS op,
        |         CAST(event_id AS BIGINT) AS lsn, event_type, user_id, event_id
        |  FROM events),
        |v AS (SELECT *, lead(lsn) OVER (PARTITION BY doc_id ORDER BY lsn) AS valid_to
        |      FROM ch)
        |SELECT doc_id,
        |       CAST(CAST(user_id AS INT) AS VARCHAR) || ',' || CAST(CAST(event_id % 97 AS INT) AS VARCHAR) AS tokens_s,
        |       2 AS n_tok, event_type AS source,
        |       lsn AS valid_from, valid_to,
        |       valid_to IS NULL AS is_current
        |FROM v WHERE op <> 'd'""".stripMargin,
    "q_asof_join" ->
      """WITH ch AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id,
        |         CASE event_type WHEN 'error' THEN 'd' WHEN 'signup' THEN 'c'
        |              ELSE 'u' END AS op,
        |         CAST(event_id AS BIGINT) AS lsn,
        |         CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS source
        |  FROM events),
        |p AS (SELECT CAST(event_id AS BIGINT) AS probe_id,
        |             CAST(user_id AS VARCHAR) AS doc_id,
        |             CAST(event_id - 3 AS BIGINT) AS as_of
        |      FROM events WHERE event_id % 17 = 0)
        |SELECT p.probe_id, p.doc_id, p.as_of,
        |       ch.lsn AS ver_lsn, ch.op AS ver_op, ch.source AS ver_source
        |FROM p ASOF LEFT JOIN ch ON p.doc_id = ch.doc_id AND p.as_of >= ch.lsn""".stripMargin,
    "q_merge_patch" -> patchOracleSql,
    "q_merge_patch_mor" -> patchOracleSql,
    "q_multi_table" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT 't' || CAST(CAST(doc_id AS INT) % 2 AS VARCHAR) AS tbl,
        |       doc_id,
        |       CAST(CAST(doc_id AS INT) AS VARCHAR) || ',' || CAST(CAST(event_id % 97 AS INT) AS VARCHAR) AS tokens_s,
        |       2 AS n_tok,
        |       event_type AS source
        |FROM last WHERE rn = 1 AND event_type <> 'error'""".stripMargin,
    "q_hot_keys" ->
      """WITH s AS (
        |  SELECT CASE WHEN event_id % 5 = 0 THEN 'hot-0'
        |              ELSE CAST(user_id AS VARCHAR) END AS doc_id FROM events
        |  WHERE md5_number_lower(CAST(event_id AS VARCHAR) || ':hot0') % 1000000 < 250000),
        |c AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
        |t AS (SELECT sum(n) AS total FROM c)
        |SELECT doc_id, n, round(n / total, 4) AS share
        |FROM c, t WHERE round(n / total, 4) >= 0.02""".stripMargin,
    "q_stream_join" ->
      """SELECT l.user_id,
        |       CAST(l.event_id AS BIGINT) AS s_id,
        |       CAST(r.event_id AS BIGINT) AS p_id
        |FROM events l JOIN events r ON l.user_id = r.user_id
        |WHERE l.event_type = 'signup' AND r.event_type = 'purchase'
        |  AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE""".stripMargin,
    "q_point_lookup" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(CAST(doc_id AS INT) AS VARCHAR) || ',' || CAST(CAST(event_id % 97 AS INT) AS VARCHAR) AS tokens_s,
        |       2 AS n_tok,
        |       event_type AS source
        |FROM last
        |WHERE rn = 1 AND event_type <> 'error'
        |  AND doc_id IN ('3', '7', '11', 'no-such-key')""".stripMargin,
    // Connector point read = the same restricted fold as q_point_lookup;
    // the row-group predicate must be invisible to the result.
    "q_dsv2_point" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(CAST(doc_id AS INT) AS VARCHAR) || ',' || CAST(CAST(event_id % 97 AS INT) AS VARCHAR) AS tokens_s,
        |       2 AS n_tok,
        |       event_type AS source
        |FROM last
        |WHERE rn = 1 AND event_type <> 'error'
        |  AND doc_id IN ('3', '7', '11', 'no-such-key')""".stripMargin,
    // Zone-map range scan = the LWW fold under the value predicate; the
    // file skipping must be invisible to the result.
    "q_zone_scan" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       CAST(event_id % 101 AS INT) AS n_tok,
        |       event_type AS source
        |FROM last
        |WHERE rn = 1 AND event_type <> 'error'
        |  AND (event_id % 101) BETWEEN 20 AND 40""".stripMargin,

    "q_zorder_scan" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       CAST(event_id % 101 AS INT) AS n_tok,
        |       event_type AS source
        |FROM last
        |WHERE rn = 1 AND event_type <> 'error'
        |  AND event_type BETWEEN 'purchase' AND 'signup'""".stripMargin,

    // Write-audit-publish must be invisible in the final state: same full
    // LWW fold as an ungated replay.
    "q_wap_publish" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events)
        |SELECT doc_id,
        |       CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |       2 AS n_tok,
        |       event_type AS source
        |FROM last WHERE rn = 1 AND event_type <> 'error'""".stripMargin,

    // The LWW fold with the DML corrections applied relationally: the
    // %10=3 slice deleted, the %10=4 slice updated (n_tok += 100, source
    // uppercased) — tokens untouched by the UPDATE.
    "q_sql_dml" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events),
        |final AS (
        |  SELECT doc_id,
        |         CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |         2 AS n_tok,
        |         event_type AS source
        |  FROM last WHERE rn = 1 AND event_type <> 'error')
        |SELECT doc_id, tokens_s,
        |       CASE WHEN CAST(doc_id AS INT) % 10 = 4 THEN n_tok + 100 ELSE n_tok END AS n_tok,
        |       CASE WHEN CAST(doc_id AS INT) % 10 = 4 THEN upper(source) ELSE source END AS source
        |FROM final
        |WHERE CAST(doc_id AS INT) % 10 <> 3""".stripMargin,
    // Catalog path: LWW fold + the manual INSERT, minus the LIKE-deleted
    // slice — layout/API is invisible to the result by construction.
    "q_catalog_sql" ->
      """WITH last AS (
        |  SELECT CAST(user_id AS VARCHAR) AS doc_id, event_type, event_id,
        |         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |  FROM events),
        |state AS (
        |  SELECT doc_id,
        |         CAST(doc_id AS INT) || ',' || CAST(event_id % 97 AS INT) AS tokens_s,
        |         2 AS n_tok,
        |         event_type AS source
        |  FROM last WHERE rn = 1 AND event_type <> 'error'
        |  UNION ALL
        |  SELECT 'cat-1', '1,2,3', 3, 'manual')
        |SELECT doc_id, tokens_s, n_tok, source FROM state
        |WHERE doc_id NOT LIKE '%7'""".stripMargin
  )

  /** Column-level patch fold recomputed from the raw stream: per key, drop
    * everything at or before the last delete, then take each column's last
    * non-null value (tokens set only by creates, n_tok by creates/odd
    * updates, source by creates/even updates — mirroring
    * [[derivedPatchChanges]]). Shared by the COW and MOR patch queries:
    * both table modes must converge to this exact state. */
  private val patchOracleSql: String =
    """WITH ch AS (
      |  SELECT CAST(user_id AS VARCHAR) AS doc_id,
      |         CASE event_type WHEN 'error' THEN 'd' WHEN 'signup' THEN 'c'
      |              ELSE 'u' END AS op,
      |         CAST(event_id AS BIGINT) AS lsn, event_type, user_id, event_id
      |  FROM events),
      |dd AS (SELECT doc_id, coalesce(max(CASE WHEN op='d' THEN lsn END), -1) AS dl
      |       FROM ch GROUP BY doc_id),
      |live AS (SELECT c.* FROM ch c JOIN dd ON c.doc_id = dd.doc_id
      |         WHERE c.op <> 'd' AND c.lsn > dd.dl)
      |SELECT doc_id,
      |       max_by(CAST(CAST(user_id AS INT) AS VARCHAR) || ',' || CAST(CAST(event_id % 97 AS INT) AS VARCHAR), lsn)
      |         FILTER (WHERE op = 'c') AS tokens_s,
      |       max_by(CASE WHEN op='c' THEN 2 ELSE CAST(event_id % 50 AS INT) END, lsn)
      |         FILTER (WHERE op = 'c' OR (op = 'u' AND event_id % 2 = 1)) AS n_tok,
      |       max_by(event_type, lsn)
      |         FILTER (WHERE op = 'c' OR (op = 'u' AND event_id % 2 = 0)) AS source
      |FROM live GROUP BY doc_id""".stripMargin

  private val pqOracleSql: String =
    """WITH cent AS (
      |  SELECT ms.m, js.j, list_transform(range(0,16), d ->
      |    md5_number_lower('pq_' || ms.m || '_' || js.j || '_' || d)::DOUBLE / 18446744073709551616.0 * 2 - 1) AS comp
      |  FROM (SELECT unnest(range(0,4)) AS m) ms CROSS JOIN (SELECT unnest(range(0,8)) AS j) js),
      |cn AS (
      |  SELECT m, j,
      |         list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0,16), d -> comp[d+1]*comp[d+1])), (s,x) -> s+x) AS n2
      |  FROM cent),
      |e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
      |d2 AS (
      |  SELECT e.vec_id, c.m, c.j,
      |         list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0,16), d ->
      |           (v[c.m*16 + d + 1] - comp[d+1]) * (v[c.m*16 + d + 1] - comp[d+1]))), (s,x) -> s+x) AS dist2
      |  FROM e CROSS JOIN cent c),
      |enc AS (
      |  SELECT vec_id, m,
      |         CAST(list_position(list(dist2 ORDER BY j), list_min(list(dist2 ORDER BY j))) - 1 AS INT) AS code
      |  FROM d2 GROUP BY vec_id, m),
      |lut AS (
      |  SELECT e.vec_id AS qid, c.m, c.j,
      |         list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0,16), d -> v[c.m*16 + d + 1] * comp[d+1])), (s,x) -> s+x) AS dp
      |  FROM e CROSS JOIN cent c
      |  WHERE e.vec_id < 10),
      |qn AS (
      |  SELECT vec_id AS qid,
      |         sqrt(list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(0,64), d -> v[d+1]*v[d+1])), (s,x) -> s+x)) AS qnorm
      |  FROM e WHERE vec_id < 10),
      |parts AS (
      |  SELECT l.qid, en.vec_id AS cid, en.m, l.dp, n.n2
      |  FROM enc en
      |  JOIN lut l ON l.m = en.m AND l.j = en.code
      |  JOIN cn n ON n.m = en.m AND n.j = en.code),
      |agg AS (
      |  SELECT qid, cid,
      |         list_reduce(list_prepend(0.0::DOUBLE, list(dp ORDER BY m)), (s,x) -> s+x) AS adc,
      |         list_reduce(list_prepend(0.0::DOUBLE, list(n2 ORDER BY m)), (s,x) -> s+x) AS rec2
      |  FROM parts WHERE qid <> cid GROUP BY qid, cid),
      |sc AS (SELECT qid, cid, adc / (qn.qnorm * sqrt(rec2)) AS score FROM agg JOIN qn USING (qid))
      |SELECT qid, cid, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS INT) AS rank
      |FROM sc QUALIFY rank <= 5""".stripMargin
}
