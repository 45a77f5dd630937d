package graft

/**
 * N -> 4N scaling evidence (BASELINE.json north_rule): the same CDC replay
 * job at two parallelism levels on identical input. No real cluster exists
 * in-sandbox, so parallelism levels are local[8] vs local[32] (8 vs 32
 * executor threads), with shuffle partitions and generator parallelism
 * scaled alongside. Prints one JSON line with both throughputs and the
 * scaling efficiency eff = T(4N) / (4 * T(N)).
 */
object Scaling {
  def main(args: Array[String]): Unit = {
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt
    val events = sys.env.getOrElse("SPARK_GRAFT_BENCH_EVENTS", "2000000").toLong

    def run(cpus: Int): Double = {
      val spark = Bench.mkSession(cpus)
      try {
        // warmup pass (JIT/codegen caches), then the measured run
        Bench.cdcReplay(spark, math.max(events / 10, 100000L), cpus)
        val (eps, _) = Bench.cdcReplay(spark, events, cpus)
        eps
      } finally spark.stop()
    }

    val epsLo = run(lo)
    val epsHi = run(hi)
    val eff = epsHi / (epsLo * (hi.toDouble / lo))
    println(
      f"""{"metric":"scaling efficiency N->4N","n_cores":$lo,"n4_cores":$hi,"events":$events,"events_per_sec_n":$epsLo%.1f,"events_per_sec_4n":$epsHi%.1f,"efficiency":$eff%.3f}""")
  }
}
