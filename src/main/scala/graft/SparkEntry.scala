package graft

import graft.hashing.KafkaMurmur2
import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import graft.schema.{InferOptions, SchemaRegistry}
import graft.smt.{JsonDeserialize, JsonDeserializeConfig}
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

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

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

  /** Flagship: full CDC replay through the IceLite MERGE sink on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    cdcMergeReplay(spark, "/root/testdata/sf0.001")

  private def cdcMergeReplay(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-entry").toString
    val table = IceLite.create(s, root, derivedPayloadType, "doc_id", numBuckets = 8)
    val changes = derivedChanges(s, dir)
    val lsnMax = changes.agg(max("lsn")).head().getLong(0) + 1
    Pipeline.replayBatch(s, changes, table, "verify", epochs = 4, lsnMax = lsnMax)
    // tokens compared as a joined string: the driver's pandas-based compare
    // cannot sort/hash raw array columns; token content stays fully checked.
    table.read().select(col("doc_id"), array_join(col("tokens"), ",").as("tokens_s"),
      col("n_tok"), col("source"))
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
    "q_route_partition" -> ((s, dir) => {
      // Outbox-style murmur2 key routing over the events stream (no SQL oracle:
      // DuckDB has no kafka-murmur2; placement pinned by KafkaMurmur2Spec)
      T(s, dir, "events")
        .withColumn("partition", KafkaMurmur2.kafkaPartition(col("user_id").cast(StringType), 16))
        .groupBy("partition").agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("users"))
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
      Dedup.minhashLsh(T(s, dir, "documents"), "doc_id", "text",
        numHashes = 32, bands = 8, shingleWidth = 3, threshold = 0.4)),
    "q_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(T(s, dir, "documents"), "doc_id", "text")
        .filter(col("hamming") <= 8)
        .select("id_a", "id_b", "hamming")),

    // ---- training-data pipeline: similarity ----
    "q_embed_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
        .select(col("qid"), col("cid"), col("rank").cast(IntegerType).as("rank"))
    }),
    "q_embed_lsh_topk" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      Similarity.lshTopK(emb.filter(col("vec_id") < 10), emb, k = 5, bits = 4, dim = dim)
        .select("qid", "cid", "rank", "bucket")
    }),
    "q_embed_dedup" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      // synthetic embeddings are near-orthogonal (cos p99.9 ~ 0.38); a low
      // threshold keeps the query non-trivial on this corpus
      Dedup.embeddingNearDups(emb, "vec_id", "embedding", dim, bits = 2, threshold = 0.3)
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

    // ---- multimodal plumbing (decode stubbed; see ops/Multimodal.scala) ----
    "q_multimodal_features" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(s, 500)
      Multimodal.extractFeatures(media)
        .groupBy("modality")
        .agg(count(lit(1)).as("n"), sum("n_bytes").cast(LongType).as("total_bytes"))
    })
  )

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
        |FROM documents""".stripMargin
  )
}
