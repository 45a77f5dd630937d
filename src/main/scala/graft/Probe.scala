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
    spark.conf.set("spark.sql.shuffle.partitions",
      (width * sys.env.getOrElse("SPARK_GRAFT_PART_MULT", "1").toInt).toString)
    // Per-stage task-skew telemetry: median/max task time + GC share tell
    // whether parallel-section loss is stragglers, GC, or bandwidth.
    if (sys.env.get("SPARK_GRAFT_PROBE_STAGES").contains("true"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        private val tasks = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]]()
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null)
            tasks.computeIfAbsent(e.stageId, _ => new java.util.concurrent.ConcurrentLinkedQueue())
              .add((m.executorRunTime, m.jvmGCTime))
        }
        private val t0 = System.nanoTime()
        private def rel(ms: Long): Double = (ms - t0 / 1000000) / 1e3
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          System.err.println(f"[job ${e.jobId}%3d] START at ${rel(e.time)}%8.2fs")
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          System.err.println(f"[job ${e.jobId}%3d] END   at ${rel(e.time)}%8.2fs")
        override def onStageSubmitted(e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          System.err.println(f"[stage ${e.stageInfo.stageId}%3d] submitted at ${rel(e.stageInfo.submissionTime.getOrElse(0L))}%8.2fs tasks=${e.stageInfo.numTasks}")
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val q = tasks.remove(e.stageInfo.stageId)
          if (q != null && !q.isEmpty) {
            import scala.jdk.CollectionConverters._
            val ts = q.asScala.toSeq.sortBy(_._1)
            val run = ts.map(_._1)
            val gc = ts.map(_._2).sum
            val wall = e.stageInfo.completionTime.getOrElse(0L) - e.stageInfo.submissionTime.getOrElse(0L)
            System.err.println(f"[stage ${e.stageInfo.stageId}%3d] ${e.stageInfo.name.takeWhile(_ != '\n').take(40)}%-40s tasks=${run.size}%3d wall=${wall / 1e3}%6.2fs sumRun=${run.sum / 1e3}%7.2fs med=${run(run.size / 2) / 1e3}%6.2fs max=${run.last / 1e3}%6.2fs gcSum=${gc / 1e3}%5.2fs")
          }
        }
      })
    if (warm > 0) {
      System.err.println(s"[probe] warmup $warm events x2")
      Bench.cdcReplay(spark, warm, width)
      Bench.cdcReplay(spark, warm, width)
    }
    System.err.println(s"[probe] measuring width=$width events=$events epochs=$epochs")
    val (eps, elapsed) = Bench.cdcReplay(spark, events, width, epochs = epochs)
    println(f"""{"width":$width,"events":$events,"eps":$eps%.1f,"elapsed":$elapsed%.2f}""")
    spark.stop()
  }
}
