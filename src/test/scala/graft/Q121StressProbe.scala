package graft

import org.apache.spark.sql.functions._

/** Ad-hoc phase profile of q121 on the 20x stress corpus (run via
  * Test/runMain): times the containment memo build, the rep-level pair
  * frame, and the member expansion separately, and prints the expanded
  * row count — the number that decides whether q121's stress cost is
  * compute or answer-size.
  */
object Q121StressProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft-stress")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q121probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // memo build (first q141 call materializes membership/groups/pairs/
    // memberLists)
    time("memo build (q141 count)") {
      println("  q141 rows: " + graft.ops.Dedup.q141ContainmentReps(spark, dir).count())
    }
    time("q141 again (memo warm)") {
      graft.ops.Dedup.q141ContainmentReps(spark, dir).count()
    }
    val full = graft.ops.Dedup.q121ContainmentExact(spark, dir)
    val agg = full.groupBy().count()
    time("q121 count via groupBy") { println("  q121 rows: " + agg.collect().toSeq) }
    println(agg.queryExecution.executedPlan.toString.take(4000))
  }
}
// (plan dump variant lives in main(); see PlanDump)
