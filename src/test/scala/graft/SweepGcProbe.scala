package graft

import scala.jdk.CollectionConverters._

/** One instrumented full sweep (Test/runMain graft.SweepGcProbe [dir]):
  * executes every registered query once in Bench's sorted order after
  * the standard two-dir warmup, printing per query the wall time, the
  * JVM GC-time delta, and the storage-memory footprint — the
  * attribution tool for in-sweep-only inflation (a query that is fast
  * alone and slow mid-sweep is paying for SOMETHING accumulated; this
  * says whether it's GC, eviction, or neither).
  */
object SweepGcProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("sweepgc",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft-stress")
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def storageMb: Double = {
      val s = spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, free) => max - free }.sum
      s / 1048576.0
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
    // total executor task run time per query — wall ≫ taskTime means
    // the cores were IDLE (scheduler/IO/lock stall), wall ≈ taskTime/32
    // means genuine compute
    val taskTime = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) { taskTime.addAndGet(m.executorRunTime); (): Unit }
        }
      })
    Seq("/root/testdata/sf0.001", dir).foreach { d =>
      names.foreach { n =>
        try SparkEntry.queries(n)(spark, d).count()
        catch { case _: Throwable => () }
      }
    }
    println(f"[sweepgc] warmed; storage ${storageMb}%.0f MB")
    names.foreach { n =>
      val g0 = gcMs; val t0 = System.nanoTime(); val k0 = taskTime.get()
      @volatile var done = false
      // watchdog: one full thread dump if the query stalls >10 s — the
      // direct answer to WHAT the JVM is doing during a silent stall
      val watchdog = new Thread(() => {
        var dumped = false
        while (!done && !dumped) {
          Thread.sleep(500)
          if (!done && (System.nanoTime() - t0) / 1e9 > 10.0) {
            dumped = true
            println(s"[sweepgc] WATCHDOG $n >10s; dump:")
            Thread.getAllStackTraces.asScala.toSeq
              .sortBy(_._1.getName).foreach { case (t, st) =>
                if (st.nonEmpty && t.getName != "sweepgc-watchdog") {
                  println(s"[sweepgc-dump]  --- ${t.getName} ${t.getState}")
                  st.take(10).foreach(e => println(s"[sweepgc-dump]      $e"))
                }
              }
          }
        }
      }, "sweepgc-watchdog")
      watchdog.setDaemon(true)
      watchdog.start()
      // TIME the same path Bench times (count() — the optimizer elides
      // presentation sorts and never materializes wide answers; a
      // toRdd-driven first cut here read q121 at 94 s because it BUILT
      // the 4e9-row expansion Bench's count path never does — the
      // ShuffleAudit scope note re-learned the hard way)
      val ok = try { SparkEntry.queries(n)(spark, dir).count(); true }
        catch { case _: Throwable => false }
      done = true
      val dt = (System.nanoTime() - t0) / 1e9
      val dg = (gcMs - g0) / 1000.0
      val dk = (taskTime.get() - k0) / 1000.0
      if (dt > 0.5 || !ok)
        println(f"[sweepgc] $n%-34s ${dt}%6.2f s  gc ${dg}%5.2f s  task ${dk}%7.1f s  storage ${storageMb}%7.0f MB${if (ok) "" else "  CRASH"}")
      // slow count-path execution: best-effort metric capture via ONE
      // re-execution through toRdd on a fresh frame — the flip may not
      // recur there (that is the phenomenon), so the dump is labeled a
      // RE-execution; AQE partition counts, agg fallbacks, spills
      if (ok && dt > 4.0) {
        try {
          val df2 = SparkEntry.queries(n)(spark, dir)
          val r0 = System.nanoTime()
          df2.queryExecution.toRdd.foreach(_ => ())
          val rs = (System.nanoTime() - r0) / 1e9
          println(f"[sweepgc-plan] $n re-execution (toRdd path): ${rs}%.2f s")
          val interesting = Set("numOutputRows", "numPartitions",
            "spillSize", "shuffleBytesWritten", "dataSize",
            "numTasksFallBacked", "aggTime", "sortTime")
          ShuffleAudit.allNodes(df2.queryExecution.executedPlan)
            .foreach { node =>
              val ms = node.metrics.collect {
                case (k, m) if interesting(k) && m.value != 0 =>
                  s"$k=${m.value}"
              }
              if (ms.nonEmpty)
                println(s"[sweepgc-plan] $n ${node.getClass.getSimpleName} ${ms.mkString(" ")}")
            }
        } catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}
