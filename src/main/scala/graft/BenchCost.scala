package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Noise-robust cost accounting for A/B-ing plan changes on a shared
  * VM where wall-clock stalls swamp per-query timing: runs each named
  * query once (after a warmup pass) and reports, from a SparkListener,
  * the work the plan actually scheduled — jobs, stages, tasks, summed
  * task run time, summed executor CPU time, shuffle bytes written.
  * CPU time and task/stage/job counts are nearly immune to scheduler
  * stalls, so a structural optimization (fewer exchanges, no
  * recompute) shows up here even when wall time is noise.
  * Run: `sbt "runMain graft.BenchCost <query> [query ...]"`;
  * env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_BENCHCOST_OUT. */
object BenchCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger; val runMs = new AtomicLong
    val cpuNs = new AtomicLong; val shufWr = new AtomicLong
    val spill = new AtomicLong // disk spill — the r14 sf1 SHJ probe metric
    // opt-in per-stage breakdown (SPARK_GRAFT_BENCHCOST_STAGES=1):
    // prints each stage's summed task run/cpu so a hot stage is
    // attributable to its plan operator by name
    val perStage = sys.env.get("SPARK_GRAFT_BENCHCOST_STAGES").contains("1")
    val stageRun = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val stageCpu = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (perStage) {
          val r = Option(stageRun.get(s.stageInfo.stageId)).map(_.get).getOrElse(0L)
          val c = Option(stageCpu.get(s.stageInfo.stageId)).map(_.get).getOrElse(0L)
          if (r > 500)
            println(f"[benchcost-stage] id=${s.stageInfo.stageId} run=${r / 1e3}%.1fs " +
              f"cpu=${c / 1e9}%.1fs tasks=${s.stageInfo.numTasks} ${s.stageInfo.name.take(120)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          runMs.addAndGet(m.executorRunTime)
          cpuNs.addAndGet(m.executorCpuTime)
          shufWr.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.diskBytesSpilled)
          if (perStage) {
            stageRun.computeIfAbsent(t.stageId, _ => new AtomicLong)
              .addAndGet(m.executorRunTime)
            stageCpu.computeIfAbsent(t.stageId, _ => new AtomicLong)
              .addAndGet(m.executorCpuTime)
          }
        }
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    // drain the async listener bus BEFORE resetting/reading counters:
    // a fixed sleep can under- or over-count on a loaded box (r13
    // ADVICE). waitUntilEmpty is private[spark] (= public bytecode),
    // so reflect; fall back to the old sleep if the API ever moves.
    def drain(): Unit = try {
      val sc = spark.sparkContext
      val lb = sc.getClass.getMethod("listenerBus").invoke(sc)
      lb.getClass.getMethod("waitUntilEmpty", classOf[Long])
        .invoke(lb, java.lang.Long.valueOf(30000L))
    } catch { case _: Throwable => Thread.sleep(300) }
    val all = SparkEntry.queries ++ SparkEntry.benchQueries
    if (args.exists(SparkEntry.benchQueries.contains)) SparkEntry.benchPrepare(spark, sfDir)
    val rows = args.map { name =>
      // warmup (JIT + page cache), uncounted
      all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      drain() // let listener events drain
      jobs.set(0); stages.set(0); tasks.set(0); runMs.set(0); cpuNs.set(0); shufWr.set(0)
      spill.set(0)
      val t0 = System.nanoTime()
      all(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      drain() // listener is async — drain before reading
      val r = f"""{"name":"$name","jobs":${jobs.get},"stages":${stages.get},"tasks":${tasks.get},""" +
        f""""task_run_s":${runMs.get / 1e3}%.2f,"task_cpu_s":${cpuNs.get / 1e9}%.2f,""" +
        f""""shuffle_mb":${shufWr.get / 1e6}%.2f,"spill_mb":${spill.get / 1e6}%.2f,"wall_s":$wall%.2f}"""
      println(s"[benchcost] $r")
      r
    }
    sys.env.get("SPARK_GRAFT_BENCHCOST_OUT").foreach { out =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
        rows.mkString("[\n", ",\n", "\n]\n"))
    }
    spark.stop()
  }
}
