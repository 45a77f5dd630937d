package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session extensions exposing the engine's custom Catalyst expressions to
 * SQL (`SparkSession.builder.withExtensions(new GraftExtensions)` or
 * `spark.sql.extensions=graft.GraftExtensions`):
 *
 *   kafka_murmur2(bin)            -> INT   Kafka default-partitioner hash
 *   kafka_partition(key, n)       -> INT   toPositive(murmur2(key)) % n
 *   token_gen(lsn, doc, n)        -> ARRAY<INT> deterministic token array
 *
 * plus the dedup/ANN kernels, so a SQL-first user can build the full
 * MinHash-LSH / SimHash / hyperplane-LSH pipelines (band -> explode ->
 * self-join) without the Scala API:
 *
 *   simhash64(text)                     -> BIGINT 64-bit SimHash signature
 *   shingle_hashes(text, w)             -> ARRAY<BIGINT> sorted distinct
 *                                          word-shingle hashes (xx kernel)
 *   minhash_sig(hashes, k)              -> ARRAY<BIGINT> k-perm MinHash sig
 *   minhash_bands(hashes, k, bands)     -> ARRAY<BIGINT> banded bucket keys
 *   cosine_sim(a, b)                    -> DOUBLE cosine of two float arrays
 *   lsh_bucket(vec, bits, dim[, off])   -> BIGINT hyperplane-LSH bucket
 *
 * The first group are operators Spark's built-ins genuinely cannot express
 * (murmur2 placement is pinned by the reference's OutboxTest; token_gen is
 * the codegen'd generator kernel). Everything else in the engine is
 * DataFrame-level and already SQL-reachable through views.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    allDescriptors.foreach(ext.injectFunction)
    // Table-valued READ surface: icelite_scan / icelite_at (time travel) /
    // icelite_changes (CDC-out) / icelite_history / icelite_files
    allTableDescriptors.foreach(ext.injectTableFunction)
    // SQL `MERGE INTO icelite.`<path>` USING (<query>) EPOCH '<key>'`
    ext.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
  }
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  type Descriptor = (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)

  /** Fold a CONSTANT argument (bits, dim, band counts...) at registration:
    * these parameterize generated plans/literal hyperplanes, so they must
    * be foldable, not row-dependent. */
  private def constInt(e: Expression, fn: String, arg: String): Int = {
    require(e.foldable, s"$fn: argument '$arg' must be a constant")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be an integer constant, got $other")
    }
  }

  private def constStr(e: Expression, fn: String, arg: String): String = {
    require(e.foldable, s"$fn: argument '$arg' must be a constant")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be a string constant, got $other")
    }
  }

  private def asCol(e: Expression) = org.apache.spark.sql.graftbridge.Exprs.column(e)
  // eager conversion: the analyzer must see a plain Catalyst tree, not a
  // ColumnNodeExpression leaf, to resolve the HOF lambdas inside
  private def asExpr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.graftbridge.Exprs.catalystExpression(c)

  val kafkaMurmur2Descriptor: Descriptor = (
    FunctionIdentifier("kafka_murmur2"),
    info("kafka_murmur2", "kafka_murmur2(bin) - Kafka default-partitioner murmur2 hash of binary input."),
    (children: Seq[Expression]) => graft.hashing.KafkaMurmur2Expr(children.head))

  val kafkaPartitionDescriptor: Descriptor = (
    FunctionIdentifier("kafka_partition"),
    info("kafka_partition", "kafka_partition(key, n) - Kafka partition placement: toPositive(murmur2(utf8(key))) % n."),
    (children: Seq[Expression]) => {
      import org.apache.spark.sql.catalyst.expressions._
      import org.apache.spark.sql.types.{BinaryType, IntegerType, StringType}
      val keyBytes = Cast(Cast(children(0), StringType), BinaryType)
      Cast(Pmod(BitwiseAnd(graft.hashing.KafkaMurmur2Expr(keyBytes),
        Literal(0x7fffffff)), children(1)), IntegerType)
    })

  val tokenGenDescriptor: Descriptor = (
    FunctionIdentifier("token_gen"),
    info("token_gen", "token_gen(lsn, doc, n) - deterministic token array (engine generator kernel)."),
    (children: Seq[Expression]) =>
      graft.stream.TokenGenExpr(children(0), children(1), children(2)))

  val simhashDescriptor: Descriptor = (
    FunctionIdentifier("simhash64"),
    info("simhash64", "simhash64(text) - 64-bit SimHash signature over word tokens (native codegen)."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.TextHashExprs.simhash(asCol(children.head))))

  val shingleHashesDescriptor: Descriptor = (
    FunctionIdentifier("shingle_hashes"),
    info("shingle_hashes", "shingle_hashes(text, w) - sorted distinct xxhash64 hashes of word w-shingles."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.TextHashExprs.shingleHashes(asCol(children(0)),
        constInt(children(1), "shingle_hashes", "w"))))

  val minhashSigDescriptor: Descriptor = (
    FunctionIdentifier("minhash_sig"),
    info("minhash_sig", "minhash_sig(hashes, k) - k-permutation MinHash signature of a shingle-hash array."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.MinHashSigExpr.minhash(asCol(children(0)),
        constInt(children(1), "minhash_sig", "k"))))

  val minhashBandsDescriptor: Descriptor = (
    FunctionIdentifier("minhash_bands"),
    info("minhash_bands", "minhash_bands(hashes, k, bands) - banded LSH bucket keys of the k-hash MinHash signature."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.MinHashSigExpr.minhashBands(asCol(children(0)),
        constInt(children(1), "minhash_bands", "k"),
        constInt(children(2), "minhash_bands", "bands"))))

  val cosineSimDescriptor: Descriptor = (
    FunctionIdentifier("cosine_sim"),
    info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double arrays, computed in double."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.Similarity.cosine(asCol(children(0)), asCol(children(1)))))

  val lshBucketDescriptor: Descriptor = (
    FunctionIdentifier("lsh_bucket"),
    info("lsh_bucket", "lsh_bucket(vec, bits, dim[, planeOffset]) - random-hyperplane LSH bucket (md5-derived deterministic planes)."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.Similarity.lshBucket(asCol(children(0)),
        constInt(children(1), "lsh_bucket", "bits"),
        constInt(children(2), "lsh_bucket", "dim"),
        if (children.size > 3) constInt(children(3), "lsh_bucket", "planeOffset") else 0)))

  val tokenizeMd5Descriptor: Descriptor = (
    FunctionIdentifier("tokenize_md5"),
    info("tokenize_md5", "tokenize_md5(text, vocab) - deterministic token ids: md5(word) mod vocab over lowercased whitespace tokens."),
    (children: Seq[Expression]) =>
      graft.ops.TokenizeMd5Expr(children(0), constInt(children(1), "tokenize_md5", "vocab")))

  val md5ModDescriptor: Descriptor = (
    FunctionIdentifier("md5_mod"),
    info("md5_mod", "md5_mod(s, n) - unsigned md5-lower-64(s) mod n; SQL-reproducible deterministic shard assignment."),
    (children: Seq[Expression]) =>
      graft.ops.Md5ModExpr(children(0), constInt(children(1), "md5_mod", "n")))

  val pqCodesDescriptor: Descriptor = (
    FunctionIdentifier("pq_codes"),
    info("pq_codes", "pq_codes(vec, dim, m, ksub) - product-quantization codes: per-subspace argmin against md5-derived codebooks."),
    (children: Seq[Expression]) =>
      graft.ops.PqCodesExpr(children(0),
        constInt(children(1), "pq_codes", "dim"),
        constInt(children(2), "pq_codes", "m"),
        constInt(children(3), "pq_codes", "ksub")))

  val redactPiiDescriptor: Descriptor = (
    FunctionIdentifier("redact_pii"),
    info("redact_pii", "redact_pii(text) - global scrub of emails and phone-shaped numbers (<EMAIL>/<PHONE>)."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.TextOps.redactPii(asCol(children(0)))))

  val piiCountDescriptor: Descriptor = (
    FunctionIdentifier("pii_count"),
    info("pii_count", "pii_count(text) - count of email + phone matches redact_pii would scrub."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.TextOps.piiCount(asCol(children(0)))))

  val langIdDescriptor: Descriptor = (
    FunctionIdentifier("lang_id"),
    info("lang_id", "lang_id(text) - heuristic language id (en/fr/de/es/und) by stopword-hit argmax."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.TextOps.langIdCol(asCol(children(0)))))

  val tokenCountDescriptor: Descriptor = (
    FunctionIdentifier("token_count"),
    info("token_count", "token_count(text) - whitespace token count."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.TextOps.wsTokenCount(asCol(children(0)))))

  val bpeTokenCountDescriptor: Descriptor = (
    FunctionIdentifier("bpe_token_count"),
    info("bpe_token_count", "bpe_token_count(text) - GPT-2-style pretokenizer count (letter runs, digit runs, punct)."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.TextOps.bpeTokenCount(asCol(children(0)))))

  val docFingerprintDescriptor: Descriptor = (
    FunctionIdentifier("doc_fingerprint"),
    info("doc_fingerprint", "doc_fingerprint(text) - order-sensitive positional structural fingerprint mod 1e9+7."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.TextOps.fingerprint(asCol(children(0)))))

  val dedupSegmentsDescriptor: Descriptor = (
    FunctionIdentifier("dedup_segments"),
    info("dedup_segments", "dedup_segments(text, delimRegex, joiner) - drop repeated segments, keep first occurrences in order."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.TextOps.dedupSegments(asCol(children(0)),
        constStr(children(1), "dedup_segments", "delimRegex"),
        constStr(children(2), "dedup_segments", "joiner"))))

  val segmentDupRatioDescriptor: Descriptor = (
    FunctionIdentifier("segment_dup_ratio"),
    info("segment_dup_ratio", "segment_dup_ratio(text, delimRegex) - fraction of segments repeating an earlier one."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.TextOps.segmentDupRatio(asCol(children(0)),
        constStr(children(1), "segment_dup_ratio", "delimRegex"))))

  val urlCountDescriptor: Descriptor = (
    FunctionIdentifier("url_count"),
    info("url_count", "url_count(text) - number of http(s) URL matches."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.TextOps.urlCount(asCol(children(0)))))

  val urlCharRatioDescriptor: Descriptor = (
    FunctionIdentifier("url_char_ratio"),
    info("url_char_ratio", "url_char_ratio(text) - fraction of characters inside URLs."),
    (children: Seq[Expression]) =>
      asExpr(graft.ops.TextOps.urlCharRatio(asCol(children(0)))))

  val lastWriteWinsDescriptor: Descriptor = (
    FunctionIdentifier("last_write_wins"),
    info("last_write_wins",
      "last_write_wins(struct(lsn, ...)) - aggregate: the struct with the greatest lsn (row-level CDC winner)."),
    (children: Seq[Expression]) => graft.merge.LastWriteWinsAgg(children.head))

  val patchFoldDescriptor: Descriptor = (
    FunctionIdentifier("patch_fold"),
    info("patch_fold",
      "patch_fold(struct(lsn, op, after, reset)) - aggregate: column-level partial-update fold (null column = unchanged; deletes reset)."),
    (children: Seq[Expression]) => graft.merge.PatchFoldAgg(children.head))

  val allDescriptors: Seq[Descriptor] = Seq(
    lastWriteWinsDescriptor, patchFoldDescriptor,
    kafkaMurmur2Descriptor, kafkaPartitionDescriptor, tokenGenDescriptor,
    simhashDescriptor, shingleHashesDescriptor, minhashSigDescriptor,
    minhashBandsDescriptor, cosineSimDescriptor, lshBucketDescriptor,
    tokenizeMd5Descriptor, md5ModDescriptor,
    pqCodesDescriptor, redactPiiDescriptor, piiCountDescriptor,
    langIdDescriptor, tokenCountDescriptor, bpeTokenCountDescriptor,
    docFingerprintDescriptor, dedupSegmentsDescriptor, segmentDupRatioDescriptor,
    urlCountDescriptor, urlCharRatioDescriptor)

  // ---- Table-valued functions: the SQL READ surface for IceLite tables
  // (MERGE/ALTER already exist in GraftSqlParser; these close the loop so a
  // SQL-first user never needs the Scala API). Each builds the same logical
  // plan the DataFrame method declares — Catalyst sees an ordinary scan, so
  // pushdown/pruning are identical.

  type TableDescriptor =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)

  private def constLong(e: Expression, fn: String, arg: String): Long = {
    require(e.foldable, s"$fn: argument '$arg' must be a constant")
    e.eval() match {
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$arg' must be an integer constant, got $other")
    }
  }

  private def activeSession = org.apache.spark.sql.SparkSession.active

  private def planOf(df: org.apache.spark.sql.DataFrame) = df.queryExecution.logical

  val sqlScanDescriptor: TableDescriptor = (
    FunctionIdentifier("icelite_scan"),
    info("icelite_scan", "icelite_scan(path) - current state of the IceLite table at <path> (same plan as table.read())."),
    (args: Seq[Expression]) => {
      require(args.size == 1, "icelite_scan(path)")
      planOf(graft.table.IceLite.load(activeSession, constStr(args.head, "icelite_scan", "path")).read())
    })

  val sqlAtDescriptor: TableDescriptor = (
    FunctionIdentifier("icelite_at"),
    info("icelite_at", "icelite_at(path, version | 'tag') - TIME TRAVEL: table state at a snapshot version or named tag."),
    (args: Seq[Expression]) => {
      require(args.size == 2, "icelite_at(path, version | 'tag')")
      val t = graft.table.IceLite.load(activeSession, constStr(args.head, "icelite_at", "path"))
      val df = args(1).dataType match {
        case _: org.apache.spark.sql.types.StringType =>
          t.readTag(constStr(args(1), "icelite_at", "tag"))
        case _ => t.readVersion(constLong(args(1), "icelite_at", "version"))
      }
      planOf(df)
    })

  val sqlChangesDescriptor: TableDescriptor = (
    FunctionIdentifier("icelite_changes"),
    info("icelite_changes", "icelite_changes(path, fromVersion, toVersion) - net per-key insert/update/delete between two snapshots (CDC-out)."),
    (args: Seq[Expression]) => {
      require(args.size == 3, "icelite_changes(path, fromVersion, toVersion)")
      planOf(graft.table.IceLite.load(activeSession, constStr(args.head, "icelite_changes", "path"))
        .changesBetween(constLong(args(1), "icelite_changes", "fromVersion"),
          constLong(args(2), "icelite_changes", "toVersion")))
    })

  val sqlHistoryDescriptor: TableDescriptor = (
    FunctionIdentifier("icelite_history"),
    info("icelite_history", "icelite_history(path) - metadata table: one row per snapshot version (driver-side only)."),
    (args: Seq[Expression]) => {
      require(args.size == 1, "icelite_history(path)")
      planOf(graft.table.IceLite.load(activeSession, constStr(args.head, "icelite_history", "path")).history)
    })

  val sqlFilesDescriptor: TableDescriptor = (
    FunctionIdentifier("icelite_files"),
    info("icelite_files", "icelite_files(path) - metadata table: the current snapshot's data files with per-file stats."),
    (args: Seq[Expression]) => {
      require(args.size == 1, "icelite_files(path)")
      planOf(graft.table.IceLite.load(activeSession, constStr(args.head, "icelite_files", "path")).filesMeta)
    })

  val sqlStagedDescriptor: TableDescriptor = (
    FunctionIdentifier("icelite_staged"),
    info("icelite_staged", "icelite_staged(path, stage) - table state AS IF the staged commit <stage> were published (write-audit-publish audit view)."),
    (args: Seq[Expression]) => {
      require(args.size == 2, "icelite_staged(path, stage)")
      planOf(graft.table.IceLite.load(activeSession, constStr(args.head, "icelite_staged", "path"))
        .readStaged(constStr(args(1), "icelite_staged", "stage")))
    })

  val sqlStagedChangesDescriptor: TableDescriptor = (
    FunctionIdentifier("icelite_staged_changes"),
    info("icelite_staged_changes", "icelite_staged_changes(path, stage) - the net per-key delta the staged commit <stage> would publish (audit the batch, not the table)."),
    (args: Seq[Expression]) => {
      require(args.size == 2, "icelite_staged_changes(path, stage)")
      planOf(graft.table.IceLite.load(activeSession, constStr(args.head, "icelite_staged_changes", "path"))
        .stagedChanges(constStr(args(1), "icelite_staged_changes", "stage")))
    })

  val allTableDescriptors: Seq[TableDescriptor] = Seq(
    sqlScanDescriptor, sqlAtDescriptor, sqlChangesDescriptor,
    sqlHistoryDescriptor, sqlFilesDescriptor,
    sqlStagedDescriptor, sqlStagedChangesDescriptor)

  /** Register on an existing session (tests / REPL convenience). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    allDescriptors.foreach {
      case (id, _, builder) =>
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          id.funcName, builder, "scala_udf")
    }
    allTableDescriptors.foreach {
      case (id, _, builder) =>
        spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
          id.funcName, builder, "scala_udf")
    }
  }
}
