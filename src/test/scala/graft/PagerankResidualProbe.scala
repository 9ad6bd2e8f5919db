package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Dedup

/** MEASUREMENT main (Test/runMain graft.PagerankResidualProbe [dir...]):
  * the per-iteration residual curve behind q147's convergence story —
  * max |Δpr| (exact BIGINT micro-mass) after each power iteration, the
  * tolerance line (p0/10), and the iteration where the residual-based
  * stop fires, per corpus. This is the data that justifies the default
  * tolDiv=10 (hub-ordering stability, not full mass convergence) and
  * the claim that dense dup-heavy graphs converge FASTER than sparse
  * ones — the numbers land in NOTES round 9.
  */
object PagerankResidualProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val Scale = 1000000000000L
    for (d <- dirs) {
      val docs = Tables.documents(spark, d).select("doc_id")
      val n = docs.count()
      val p0 = Scale / n
      val tol = p0 / 10L
      val base = (Scale * 15L / 100L) / n
      val edges = Dedup.symmetrizeEdges(
        Dedup.verifiedPairs(spark, d).select("doc_a", "doc_b")).persist()
      val nEdges = edges.count()
      val deg = edges.groupBy(col("doc_a").as("doc_id"))
        .agg(count(lit(1)).as("deg"))
      println(s"== $d : n=$n docs, $nEdges directed edges, p0=$p0, tol=$tol ==")
      var pr = docs.withColumn("pr", lit(p0)).localCheckpoint(true)
      var fired = -1
      for (it <- 1 to 12 if fired < 0 || it <= fired + 2) {
        val next = Dedup.pagerankStep(pr, docs, edges, deg, base)
          .localCheckpoint(true)
        val resid = next
          .join(pr.select(col("doc_id"), col("pr").as("prev")), Seq("doc_id"))
          .agg(max(abs(col("pr") - col("prev")))).head().getLong(0)
        val mark = if (resid <= tol && fired < 0) { fired = it; "  <- stop fires" }
          else ""
        println(f"  iter $it%2d  max|dpr| = $resid%14d  (${resid.toDouble / p0}%8.4f x p0)$mark")
        pr = next
      }
      edges.unpersist()
      (): Unit
    }
  }
}
