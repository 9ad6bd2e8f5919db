package graft

import org.apache.spark.sql.functions._

/** Ad-hoc phase profile of the ANN-serving ingest twin on the 20x
  * stress corpus (run via Test/runMain): separates the index build
  * from the per-batch probe cost, and times one probeBatch at the
  * stream's batch size vs the whole corpus as a single batch — the
  * split that says whether the 20x throughput is probe compute or
  * per-micro-batch overhead.
  */
object IvfIngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft-stress")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val table = time("index build (ivfIndexTable)") {
      graft.ops.Similarity.ivfIndexTable(spark, dir)
    }
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = embs.count()
    println(s"[ivfprobe] corpus vectors: $n")
    val oneBatch = embs.limit((n / 8).toInt).cache()
    println("  batch rows: " + oneBatch.count())
    time("probeBatch 1/8 corpus (cold)") {
      println("  out rows: " +
        graft.ops.Similarity.probeBatch(spark, table, oneBatch).count())
    }
    time("probeBatch 1/8 corpus (warm)") {
      graft.ops.Similarity.probeBatch(spark, table, oneBatch).count()
    }
    time("probeBatch FULL corpus") {
      println("  out rows: " +
        graft.ops.Similarity.probeBatch(spark, table, embs).count())
    }
    println(graft.ops.Similarity.probeBatch(spark, table, oneBatch)
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Join") ||
        l.contains("Window") || l.contains("Scan") || l.contains("Sort"))
      .map(_.take(140)).mkString("\n"))
  }
}
