package graft

import org.apache.spark.sql.functions._

/** MEASUREMENT main (Test/runMain graft.PhashIngestProbe [dir]): stage
  * timings of the phash ingest twin's per-batch work on a
  * stress-batch-sized slice.
  */
object PhashIngestProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft-stress")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val n = docs.count()
    println(s"corpus: $n docs")
    val index = t("build index")(
      graft.streaming.StreamingOps.buildMediaPhashIndex(docs))
    println("index bands rows: " + index.bands.count())
    val batch = docs.filter(col("doc_id") % 8 === 0)
    t("batch count")(batch.count())
    val nb = graft.ops.Multimodal.phashBandsOf(batch)
    t("batch bands")(nb.count())
    val fps = nb.groupBy("bands")
      .agg(min("doc_id").as("fp"), collect_list("doc_id").as("ids"))
    t("batch fingerprints")(fps.count())
    val probed = fps
      .select(col("fp"), col("bands").as("ba"),
        posexplode(col("bands")).as(Seq("band", "bv")))
      .join(index.bands, Seq("band", "bv"))
    t("probe join rows (1st)")(println("  -> " + probed.count()))
    t("probe join rows (2nd)")(println("  -> " + probed.count()))
    val probedNoBa = fps
      .select(col("fp"), posexplode(col("bands")).as(Seq("band", "bv")))
      .join(index.bands.select("rep", "band", "bv"), Seq("band", "bv"))
    t("probe join WITHOUT arrays")(println("  -> " + probedNoBa.count()))
    println(probed.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Scan") || l.contains("InMemory"))
      .mkString("\n"))
    val verified = probed
      .withColumn("hamming", graft.ops.Multimodal.hamExpr)
      .filter(col("hamming") <= lit(7L))
    t("verify+filter rows")(println("  -> " + verified.count()))
    val dist = verified.select(col("fp"), col("rep"), col("hamming")).distinct()
    t("distinct")(println("  -> " + dist.count()))
    t("full phashMatchBatch")(println("  -> " +
      graft.streaming.StreamingOps.phashMatchBatch(batch, index, 7).count()))
    index.unpersist()
  }
}
