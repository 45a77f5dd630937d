package graft

import org.apache.spark.sql.SparkSession

/**
 * Child process of the isolated scaling harness ([[Bench.scalingPairsIsolated]]).
 *
 * One worker = one "cluster size": a JVM pinned (by the parent, via taskset)
 * to exactly `width` CPUs, running a local[width] master. Everything the JVM
 * does — mutator threads, GC, shuffle/netty daemons, parquet writers — is
 * confined to those cores, the way a real N-core node would be. The
 * single-JVM harness measured the narrow leg with 24 idle cores absorbing
 * its GC and daemon work for free (G1 sizes its thread pools from the
 * MACHINE's 32 cores), which inflates the narrow leg and depresses the
 * measured N->4N ratio; process-level pinning removes that subsidy.
 *
 * Protocol (file-based, `pairsDir`): on `go_{id}_{seq}` run one replay leg
 * and write `res_{id}_{seq}` = "eps cpuNsPerEvent"; `ready_{id}` after
 * warmup; exit on `stop`.
 */
object ScalingWorker {
  def main(args: Array[String]): Unit = {
    // result files are parsed with split(" ").map(_.toDouble) — pin ROOT so
    // a comma-decimal default locale can never corrupt the wire format
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val Array(id, widthS, eventsS, dir) = args.take(4)
    val width = widthS.toInt
    val events = eventsS.toLong
    // bucket count is fixed for the whole series by the parent (a property
    // of the table, not of this leg's width); <= 0 → derive from width
    val buckets = if (args.length > 4) args(4).toInt else -1
    val mode = sys.env.getOrElse("SPARK_GRAFT_MODE", "cow")
    val spark = Bench.mkSession(width)
    val mult = sys.env.getOrElse("SPARK_GRAFT_PART_MULT", "1").toInt
    spark.conf.set("spark.sql.shuffle.partitions", (width * mult).toString)
    val tally = new java.util.concurrent.atomic.LongAdder
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) tally.add(m.executorCpuTime)
      }
    })
    def leg(ev: Long): (Double, Double) = {
      org.apache.spark.graftbridge.Listeners.drain(spark.sparkContext)
      val c0 = tally.sum()
      val eps = Bench.cdcReplay(spark, ev, width, mode = mode, buckets = buckets)._1
      org.apache.spark.graftbridge.Listeners.drain(spark.sparkContext)
      (eps, (tally.sum() - c0).toDouble / ev)
    }
    val p = java.nio.file.Paths.get(dir)
    // Orphan self-destruct: if the orchestrator is SIGKILLed (e.g. the host
    // OOM killer taking out the bench JVM) its finally-block cleanup never
    // runs and this worker would grind the host forever — round 3 left a
    // 32-thread worker running for hours. When the parent dies this
    // process is reparented (PPID flips to init), so poll parent liveness.
    val parent = ProcessHandle.current().parent()
    def orphaned: Boolean =
      parent.map(h => !h.isAlive).orElse(true) ||
        !java.nio.file.Files.isDirectory(p)
    var seq = 0
    // Deep JIT/codegen warmup (first runs in a fresh JVM are 2-10x slower).
    // Capped at 8M events: warmup only needs to reach steady-state JIT, and
    // BOTH workers warm simultaneously — the narrow worker runs starved of
    // its own cores while the wide one hammers all of them, so an
    // events/4-sized warmup at 64M-event legs blew the parent's ready
    // deadline. 2 x 8M reaches the same code paths in a fraction of the time.
    val warmEv = math.min(math.max(events / 4, 500000L),
      sys.env.getOrElse("SPARK_GRAFT_WARM_EVENTS", "8000000").toLong)
    leg(warmEv); leg(warmEv)
    java.nio.file.Files.writeString(p.resolve(s"ready_$id"), "ok")
    while (!java.nio.file.Files.exists(p.resolve("stop")) && !orphaned) {
      val go = p.resolve(s"go_${id}_$seq")
      if (java.nio.file.Files.exists(go)) {
        val (eps, cpu) = leg(events)
        val tmp = p.resolve(s".res_${id}_$seq.tmp")
        java.nio.file.Files.writeString(tmp,
          String.format(java.util.Locale.ROOT, "%.1f %.2f",
            Double.box(eps), Double.box(cpu)))
        java.nio.file.Files.move(tmp, p.resolve(s"res_${id}_$seq"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        seq += 1
      } else Thread.sleep(50)
    }
    spark.stop()
    sys.exit(0)
  }
}
