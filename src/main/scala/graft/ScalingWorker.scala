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
    val defaultMode = sys.env.getOrElse("SPARK_GRAFT_MODE", "cow")
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
    def leg(ev: Long, mode: String): (Double, Double) = {
      org.apache.spark.graftbridge.Listeners.drain(spark.sparkContext)
      val c0 = tally.sum()
      val eps = Bench.cdcReplay(spark, ev, width, mode = mode, buckets = buckets)._1
      org.apache.spark.graftbridge.Listeners.drain(spark.sparkContext)
      (eps, (tally.sum() - c0).toDouble / ev)
    }
    val p = java.nio.file.Paths.get(dir)
    // tmpfs BALLAST: this VM runs virtio-balloon free page reporting, so
    // guest-freed pages go back to the host and re-faulting host pages can
    // stall for minutes (host page-supply weather). Every leg writes GBs of
    // FRESH tmpfs pages (shuffle + table) — left alone, that fault cost is
    // a constant charged to both legs, which the wide leg feels 4x harder,
    // and any stall poisons the pair. So before each leg, fault a ballast
    // file of guest-owned pages (UNTIMED — the leg hasn't started), then
    // free it as the leg begins: the leg's tmpfs allocations recycle those
    // still-guest-owned pages from the free list faster than the reporter
    // returns them to the host.
    val ballastBytes = sys.env.getOrElse("SPARK_GRAFT_BALLAST_MB", "8192").toLong << 20
    // SHARED by default between the lo and hi workers: legs are serialized
    // by the parent's prep protocol, so one recyclable page pool serves
    // both — halving the bulk acquisition the host has to grant (the page
    // budget it grants quickly is finite). A leftover file from a previous
    // run is reused as-is (fillBallast is idempotent), pages already owned.
    val ballastTag = sys.env.getOrElse("SPARK_GRAFT_BALLAST_TAG", "shared")
    var ballastPath: java.nio.file.Path = null
    def fillBallast(): Unit = { ballastPath = Bench.fillBallast(ballastTag, ballastBytes) }
    def dropBallast(): Unit = if (ballastPath != null) Bench.dropBallast(ballastPath)
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
    var prepSeq = 0
    // Touch most of the heap ONCE, single-threaded, before warmup: with
    // Xms = Xmx the faulted pages stay process-owned forever (G1 never
    // uncommits, free page reporting never sees them), so the first BIG
    // measured leg doesn't fault 15+ GB of never-touched heap through the
    // host's stall-prone page-supply path mid-measurement (observed: 90%
    // kernel time for the whole leg). Single-threaded and in-code rather
    // than -XX:+AlwaysPreTouch: it lands inside the ready window the
    // parent controls, after the JVM is already serviceable.
    locally {
      // Recycle the ballast pool into the heap pre-touch: fault the shared
      // tmpfs ballast (idempotent — a pool left by a previous run or the
      // other worker is already guest-owned and costs nothing), then free
      // it so the heap faults below pull recycled guest pages from the
      // free list instead of trickling through the host's page-supply
      // path (observed 25 MB/s in bad windows vs ~1 GB/s recycled).
      fillBallast(); dropBallast(); ballastPath = null
      val target = (Runtime.getRuntime.maxMemory * 0.75).toLong
      val held = scala.collection.mutable.Buffer.empty[Array[Byte]]
      var t = 0L
      try while (t < target) {
        val a = new Array[Byte](256 << 20)
        var j = 0
        while (j < a.length) { a(j) = 1; j += 4096 }
        held += a
        t += a.length
      } catch { case _: OutOfMemoryError => () }
      held.clear()
      System.gc()
    }
    // Deep JIT/codegen warmup (first runs in a fresh JVM are 2-10x slower).
    // Capped at 8M events: warmup only needs to reach steady-state JIT, and
    // BOTH workers warm simultaneously — the narrow worker runs starved of
    // its own cores while the wide one hammers all of them, so an
    // events/4-sized warmup at 64M-event legs blew the parent's ready
    // deadline. 2 x 8M reaches the same code paths in a fraction of the time.
    val warmEv = math.min(math.max(events / 4, 500000L),
      sys.env.getOrElse("SPARK_GRAFT_WARM_EVENTS", "8000000").toLong)
    // One warmed worker pair can serve SEVERAL modes (the go file names the
    // leg's mode) — warm each of them, or the first measured leg of a cold
    // mode pays its JIT.
    val warmModes = sys.env.getOrElse("SPARK_GRAFT_WARM_MODES", defaultMode)
      .split(",").map(_.trim).filter(_.nonEmpty).distinct
    warmModes.foreach { m => leg(warmEv, m); leg(warmEv, m) }
    // Pre-create the ballast inside the ready window too: the first fill is
    // the expensive one (fresh host pages), and paying it here — while the
    // parent is still waiting on ready rather than on a pair — keeps every
    // prep after it a cheap recycle (fillBallast is idempotent).
    fillBallast()
    java.nio.file.Files.writeString(p.resolve(s"ready_$id"), "ok")
    def exists(name: String): Boolean = java.nio.file.Files.exists(p.resolve(name))
    while (!exists("stop") && !orphaned) {
      // prep phase (parent-orchestrated, separate deadline): fault the
      // ballast BEFORE the leg is dispatched, so a host page-supply stall
      // absorbed here can't eat the leg's own deadline, and the fill never
      // overlaps the other worker's measured leg. prep and go are tracked
      // by independent indices, each skipping forward when the parent has
      // abandoned an index (deadline hit) and moved on — otherwise a
      // missed index would deadlock both sides.
      if (exists(s"prep_${id}_$prepSeq") && !exists(s"prepped_${id}_$prepSeq")) {
        fillBallast()
        java.nio.file.Files.writeString(p.resolve(s"prepped_${id}_$prepSeq"), "ok")
        prepSeq += 1
      } else if (exists(s"prep_${id}_${prepSeq + 1}")) prepSeq += 1
      if (exists(s"go_${id}_$seq")) {
        if (!exists(s"prepped_${id}_$seq")) fillBallast() // parent skipped prep
        dropBallast() // free it: the leg's tmpfs writes recycle these pages
        // The go file's content is the leg's MODE (multi-mode series share
        // one warmed worker pair); blank or legacy "go" = the env default.
        val goMode = scala.util.Try(
          java.nio.file.Files.readString(p.resolve(s"go_${id}_$seq")).trim).getOrElse("")
        val (eps, cpu) = leg(events, if (goMode.isEmpty || goMode == "go") defaultMode else goMode)
        val tmp = p.resolve(s".res_${id}_$seq.tmp")
        java.nio.file.Files.writeString(tmp,
          String.format(java.util.Locale.ROOT, "%.1f %.2f",
            Double.box(eps), Double.box(cpu)))
        java.nio.file.Files.move(tmp, p.resolve(s"res_${id}_$seq"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        seq += 1
      } else if (exists(s"go_${id}_${seq + 1}") || exists(s"prep_${id}_${seq + 1}")) {
        seq += 1 // parent abandoned this index
      } else Thread.sleep(50)
    }
    // The ballast file is deliberately LEFT on exit: its pages stay
    // guest-owned, so the next run inherits a warm pool instead of
    // re-acquiring it from the host.
    spark.stop()
    sys.exit(0)
  }
}
