package graft

/**
 * N -> 4N scaling evidence (BASELINE.json north_rule): the same CDC replay
 * job at two parallelism levels on identical input. No real cluster exists
 * in-sandbox, so parallelism level = TASK WIDTH inside one warm local[hi]
 * JVM (generator partitions + shuffle partitions = level; in local mode the
 * number of concurrently-busy cores is the task width). One JVM removes
 * JIT/startup skew between levels, and back-to-back legs keep each pair
 * inside one host-noise window (the shared hypervisor drifts 2-10x over
 * minutes). Prints one JSON line with the best pair (quietest window),
 * the median efficiency, and every raw pair.
 */
object Scaling {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", (lo * 4).toString).toInt
    val events = sys.env.getOrElse("SPARK_GRAFT_SCALE_EVENTS", "16000000").toLong
    val rounds = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROUNDS", "7").toInt
    val budget = sys.env.getOrElse("SPARK_GRAFT_SCALE_BUDGET_SEC", "480").toInt

    val mode = sys.env.getOrElse("SPARK_GRAFT_MODE", "cow")
    val isolated = sys.env.getOrElse("SPARK_GRAFT_SCALE_ISOLATED", "true") == "true"
    val (pairs, best, effMedian, effNormMedian) =
      if (isolated) Bench.scalingPairsIsolated(lo, hi, events, maxPairs = rounds, budgetSec = budget, mode = mode)
      else Bench.scalingPairs(lo, hi, events, maxPairs = rounds, budgetSec = budget, mode = mode)
    val json =
      f"""{"metric":"scaling efficiency N->4N","mode":"$mode","n_cores":$lo,"n4_cores":$hi,"events":$events,"events_per_sec_n":${best.lo}%.1f,"events_per_sec_4n":${best.hi}%.1f,"efficiency":${best.eff}%.3f,"efficiency_median":$effMedian%.3f,"efficiency_cpu_normalized":${best.effCpuNorm}%.3f,"efficiency_cpu_normalized_median":$effNormMedian%.3f,"pairs":${Bench.pairsJson(pairs)}}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_SCALING_OUT", "SCALING_LOCAL.json")), json + "\n")
    catch { case _: Throwable => () }
    println(json)
  }
}
