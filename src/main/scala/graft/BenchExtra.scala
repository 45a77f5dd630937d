package graft

import org.apache.spark.sql.SparkSession

/**
 * Optimization-round measurement harness (guide §1): the SAME query timing
 * methodology as [[Bench]] (one warm pass, then timed `collect()` on the
 * same session/confs), extended with
 *  - SPARK_GRAFT_ONLY=a,b,c       — time only the named queries;
 *  - SPARK_GRAFT_REPEATS=N        — N timed passes per query (min + all
 *                                   samples reported; default 3);
 *  - SPARK_GRAFT_EXPLAIN_DIR=dir  — dump `explain("formatted")` per query;
 *  - SPARK_GRAFT_NOOP=true        — time a noop-sink write instead of
 *                                   collect() (guide §1.4: isolates the
 *                                   computation from driver result transfer).
 * Bench.scala itself is frozen for measurement; every number cited from this
 * harness in OPTIMIZATION_r06.md says so explicitly.
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = sys.env.getOrElse("SPARK_GRAFT_REPEATS", "3").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val explainDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    val noop = sys.env.get("SPARK_GRAFT_NOOP").contains("true")
    val spark = Bench.mkSession(cpus)
    spark.conf.set("spark.sql.shuffle.partitions", cpus.toString)
    // Experiment knob: SPARK_GRAFT_EXTRA_CONFS="k=v;k=v" applied to the
    // session before anything runs (A/B a conf without touching Bench).
    sys.env.get("SPARK_GRAFT_EXTRA_CONFS").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })
    // Job/task tallies per timed pass: collect() wall minus job wall ≈
    // driver-side planning + codegen + commit work; job wall minus task sum
    // ≈ scheduling/stage gaps.
    val jobDetail = sys.env.get("SPARK_GRAFT_JOB_DETAIL").contains("true")
    val tally = new org.apache.spark.scheduler.SparkListener {
      val jobNs = new java.util.concurrent.atomic.LongAdder
      val taskNs = new java.util.concurrent.atomic.LongAdder
      val jobs = new java.util.concurrent.atomic.LongAdder
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val desc = Option(e.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")
        val nTasks = e.stageInfos.map(_.numTasks).sum
        starts.put(e.jobId, (System.nanoTime(), desc, nTasks)): Unit
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, desc, nTasks) =>
          val d = System.nanoTime() - t0
          jobNs.add(d)
          if (jobDetail)
            System.err.println(f"    [job ${e.jobId}%4d ${d / 1e9}%6.2fs tasks=$nTasks%4d] ${desc.take(90)}")
        }
        jobs.increment()
      }
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null) taskNs.add(e.taskInfo.duration * 1000000L)
    }
    spark.sparkContext.addSparkListener(tally)
    // Catalyst phase tally (analysis/optimization/planning ns) across every
    // query execution, via the public QueryExecutionListener surface.
    val phaseNs = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]()
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      private def add(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
        qe.tracker.phases.foreach { case (ph, t) =>
          phaseNs.computeIfAbsent(ph, _ => new java.util.concurrent.atomic.LongAdder)
            .add((t.endTimeMs - t.startTimeMs) * 1000000L)
        }
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = add(qe)
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = add(qe)
    })
    def phaseSnapshot(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      phaseNs.asScala.map { case (k, v) => k -> v.sum }.toMap
    }

    // Headline mode: SPARK_GRAFT_HEADLINE_EVENTS=N runs the same
    // cdcReplay the frozen Bench headlines (warm + N attempts per mode),
    // prints events/sec, and exits — for iterating on the merge path
    // without the full Bench phases.
    sys.env.get("SPARK_GRAFT_HEADLINE_EVENTS").foreach { evS =>
      val ev = evS.toLong
      val att = sys.env.getOrElse("SPARK_GRAFT_HEADLINE_ATTEMPTS", "3").toInt
      Bench.cdcReplay(spark, math.max(ev / 10, 100000L), cpus): Unit // warm
      Seq("cow", "mor").foreach { m =>
        val runs = (1 to att).map(_ => Bench.cdcReplay(spark, ev, cpus, mode = m)._1)
        System.err.println(f"[bench-extra] headline $m best=${runs.max}%.0f ev/s  ${runs.map(r => f"$r%.0f").mkString(" ")}")
      }
      spark.stop()
      return
    }
    val names = Bench.headlineQueries.filter(n => only.forall(_.contains(n)))
    // Suite-level warmup (SPARK_GRAFT_SUITE_WARM=true): one pass over every
    // selected query before any timing, so JIT/codegen state at timing time
    // matches the frozen Bench (whose headline replay deep-warms the merge
    // path before the query loop).
    if (sys.env.get("SPARK_GRAFT_SUITE_WARM").forall(_ == "true"))
      names.foreach { n =>
        try SparkEntry.queries(n)(spark, sfDir).collect(): Unit
        catch { case _: Throwable => () }
      }
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      if (noop) df.write.format("noop").mode("overwrite").save()
      else df.collect(): Unit
      (System.nanoTime() - t0) / 1e9
    }
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"bench-extra: $name")
      try { fn(spark, sfDir).collect(): Unit } catch { case _: Throwable => () } // warm
      explainDir.foreach { d =>
        try {
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          val txt = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          java.nio.file.Files.writeString(java.nio.file.Paths.get(d, s"$name.txt"), txt)
        } catch { case e: Throwable =>
          System.err.println(s"[bench-extra] explain $name failed: ${e.getMessage}")
        }
      }
      val statsPer = scala.collection.mutable.ArrayBuffer.empty[String]
      val samples =
        try (1 to repeats).map { _ =>
          org.apache.spark.graftbridge.Listeners.drain(spark.sparkContext)
          val (j0, t0n, n0) = (tally.jobNs.sum, tally.taskNs.sum, tally.jobs.sum)
          val c0 = org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
          val p0 = phaseSnapshot()
          val w = runOnce(fn)
          org.apache.spark.graftbridge.Listeners.drain(spark.sparkContext)
          val pd = phaseSnapshot().map { case (k, v) => k -> (v - p0.getOrElse(k, 0L)) }
            .filter(_._2 > 0).toSeq.sortBy(-_._2)
            .map { case (k, v) => f"$k=${v / 1e9}%.2f" }.mkString(",")
          statsPer += f"[jobs=${tally.jobs.sum - n0} jobWall=${(tally.jobNs.sum - j0) / 1e9}%.2f taskSum=${(tally.taskNs.sum - t0n) / 1e9}%.2f gen=${org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount - c0} $pd]"
          w
        }
        catch { case e: Throwable =>
          System.err.println(s"[bench-extra] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          Seq(-1.0)
        }
      System.err.println(f"[bench-extra] $name%-22s min=${samples.min}%.3f  ${samples.map(x => f"$x%.3f").mkString(" ")}  ${statsPer.mkString(" ")}")
      name -> samples
    }
    val json = results.map { case (n, ss) =>
      "\"" + n + "\":" + f"${ss.min}%.3f"
    }.mkString("{", ",", "}")
    val total = results.map(_._2.min).filter(_ >= 0).sum
    println(f"""{"queries_min":$json,"total_min_sec":$total%.2f,"repeats":$repeats,"noop":$noop,"sf":"$sfDir"}""")
    spark.stop()
  }
}
