package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.TextOps

/** MEASUREMENT main (Test/runMain graft.StopGramProbe [dir]): the q143
  * stop-gram guard's fan-out effect, measured — seed-join input volume
  * (the per-key tf_train·tf_bench product summed over shared grams)
  * and end-to-end q143 wall time, at a ladder of bench-df caps, on the
  * 20× dup-heavy stress corpus by default. The identity threshold (cap
  * ≥ max bench gram df) and the monotone-shrink property below it are
  * spec-pinned in TextDedupSimSpec; this probe supplies the NUMBERS —
  * how much seed volume a production cap actually buys.
  */
object StopGramProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft-stress")

    // the same exact-text contraction q143 runs, so the seed counts
    // below are THE seed join's input, not an uncontracted proxy
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        (col("doc_id") % 100 === 0).as("is_bench"), md5(col("text")).as("h"))
    val reps = base.groupBy("is_bench", "h").agg(min("doc_id").as("rep"))
    val g = base.join(reps.select(col("rep").as("doc_id")), Seq("doc_id"))
      .persist()
    try {
      val train = TextOps
        .positionedGrams(g.filter(!col("is_bench")), "train_doc", "pos_t")
        .persist()
      val bench = TextOps
        .positionedGrams(g.filter(col("is_bench")), "bench_doc", "pos_b")
        .persist()
      val maxDf = bench.groupBy("h")
        .agg(countDistinct("bench_doc").as("bdf"))
        .agg(max("bdf")).head().getLong(0)
      println(s"== stop-gram probe at $dir (max bench gram df = $maxDf) ==")
      println(f"${"cap"}%12s ${"seeds"}%12s ${"q143_sec"}%9s ${"rows"}%8s")
      for (cap <- Seq(Long.MaxValue, maxDf, 16L, 4L, 1L).distinct) {
        val seeds = train
          .join(TextOps.capBenchGrams(bench, cap), Seq("h")).count()
        val t0 = System.nanoTime()
        val rows = TextOps.q143ContaminationSpans(spark, dir, cap)
          .collect().length
        val sec = (System.nanoTime() - t0) / 1e9
        val capLabel = if (cap == Long.MaxValue) "none" else cap.toString
        println(f"$capLabel%12s $seeds%12d $sec%9.2f $rows%8d")
      }
    } finally g.unpersist()
  }
}
