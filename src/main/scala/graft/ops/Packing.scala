package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

/**
 * Context-window packing: concatenate variable-length token sequences in a
 * deterministic order and re-emit fixed-length training chunks — the
 * standard pretraining batch-prep step (docs are concatenated, then cut
 * into `chunkLen`-token windows; the trailing partial window is dropped).
 *
 * Scale design (100 TB posture): a single global concatenation order would
 * force a one-partition window — instead the corpus is split into
 * `nShards` independent streams by a deterministic hash of the order key
 * (exactly how production packing shards: each shard packs its own docs,
 * shard count scales with the cluster). The whole operator is three
 * Catalyst stages, no RDDs, no driver data:
 *
 *  1. ONE hash-partitioned window per shard computes each doc's running
 *     token offset (sum over preceding docs in (shard, order) order);
 *  2. each doc explodes into the 1+ chunk spans it covers
 *     (`sequence(start/L, (start+n-1)/L)`) carrying only its slice — a doc
 *     never ships more than its own tokens;
 *  3. chunks assemble with ONE aggregation keyed (shard, chunk):
 *     `array_sort` on (position, fragment) then flatten. Chunk payloads are
 *     bounded (`chunkLen` tokens), so aggregation buffers are O(L).
 *
 * Determinism: shard = unsigned md5(order-key) mod nShards and the order
 * key itself are both SQL-reproducible, so the DuckDB oracle recomputes the
 * exact chunk contents (`q_pack_chunks`).
 */
object Packing {

  /** Pack `docs` into fixed-`chunkLen` token windows.
    *
    * @param docs      input with an array<int> token column
    * @param tokensCol token-array column name
    * @param orderCol  deterministic order key (also feeds shard assignment)
    * @param chunkLen  tokens per emitted chunk (trailing partial dropped)
    * @param nShards   independent packing streams; parallelism of the
    *                  window stage — size to the cluster, not the data
    * @return (shard, chunk, tokens, n_frags): chunk is the per-shard window
    *         index; n_frags = how many doc fragments the window spans
    */
  def packChunks(docs: DataFrame, tokensCol: String, orderCol: String,
                 chunkLen: Int, nShards: Int = 32): DataFrame = {
    require(chunkLen > 0, s"chunkLen must be positive, got $chunkLen")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val L = lit(chunkLen.toLong)
    val d = docs.select(
        TextHashExprs.md5Mod(col(orderCol).cast(StringType), nShards).as("shard"),
        col(orderCol).as("__ord"),
        col(tokensCol).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0)
    // running offset of each doc inside its shard's concatenated stream
    val w = Window.partitionBy("shard").orderBy("__ord")
    val withOff = d.withColumn("__start", sum(col("__n")).over(w) - col("__n"))
    // each doc covers chunks floor(start/L) .. floor((start+n-1)/L); emit
    // one (chunk, position, token-slice) fragment per covered chunk
    val spans = withOff
      .withColumn("chunk", explode(sequence(
        floor(col("__start") / L), floor((col("__start") + col("__n") - lit(1L)) / L))))
      .withColumn("__from", greatest(col("__start"), col("chunk") * L))
      .withColumn("__len",
        least(col("__start") + col("__n"), (col("chunk") + lit(1L)) * L) - col("__from"))
      .select(col("shard"), col("chunk"), col("__from").as("pos"),
        slice(col("__toks"),
          (col("__from") - col("__start") + lit(1L)).cast(IntegerType),
          col("__len").cast(IntegerType)).as("frag"))
    spans.groupBy("shard", "chunk")
      .agg(
        flatten(transform(array_sort(collect_list(struct(col("pos"), col("frag")))),
          x => x.getField("frag"))).as("tokens"),
        count(lit(1)).as("n_frags"))
      .filter(size(col("tokens")) === chunkLen)
  }
}
