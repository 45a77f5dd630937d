package graft

/**
 * Diagnostic main: one CDC replay leg at a chosen task width with per-phase
 * merge timing (SPARK_GRAFT_MERGE_VERBOSE=true). Args: width events epochs.
 * Used to attribute scaling loss between the parallel section and the
 * per-epoch serial fraction; not part of the driver contract.
 */
object Probe {
  def main(args: Array[String]): Unit = {
    val width = if (args.length > 0) args(0).toInt else 32
    val events = if (args.length > 1) args(1).toLong else 4000000L
    val epochs = if (args.length > 2) args(2).toInt else 1
    val warm = if (args.length > 3) args(3).toLong else math.max(events / 4, 500000L)
    val spark = Bench.mkSession(32)
    spark.conf.set("spark.sql.shuffle.partitions", width.toString)
    if (warm > 0) {
      System.err.println(s"[probe] warmup $warm events x2")
      Bench.cdcReplay(spark, warm, width)
      Bench.cdcReplay(spark, warm, width)
    }
    System.err.println(s"[probe] measuring width=$width events=$events epochs=$epochs (set SPARK_GRAFT_EPOCHS to match)")
    val _ = epochs
    val t0 = System.nanoTime()
    val (eps, elapsed) = Bench.cdcReplay(spark, events, width)
    println(f"""{"width":$width,"events":$events,"eps":$eps%.1f,"elapsed":$elapsed%.2f}""")
    spark.stop()
  }
}
