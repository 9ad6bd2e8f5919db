package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Ad-hoc stage profile of q172 on the 20x stress corpus (run via
  * Test/runMain): times the hybrid index build, then each pipeline
  * boundary of the REAL core shape incrementally — the decomposition
  * that says where a serving-rate dollar goes.
  */
object Q172Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local("q172probe",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft-stress")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q172probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val idx = time("index build (postings+df materialize)") {
      val i = graft.ops.Similarity.buildHybridIndex(spark, dir)
      i.postings.count(); i.dfTable.count(); i
    }
    val queries = graft.core.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("query_id"), col("embedding"))
      .join(graft.core.Tables.documents(spark, dir)
          .select(col("doc_id").as("query_id"), col("text")),
        Seq("query_id"), "left_outer")
      .select("query_id", "text", "embedding")
    time("queries frame") { println("  queries: " + queries.count()) }
    import graft.functions.TextFunctions.tokens
    val qtok = queries.select(col("query_id"),
      explode(array_distinct(tokens(col("text")))).as("token"))
    val wTerm = Window.partitionBy("query_id").orderBy(col("df"), col("token"))
    val qsel = broadcast(qtok).join(idx.dfTable, Seq("token"))
      .withColumn("rn", row_number().over(wTerm))
      .filter(col("rn") <= 8)
      .select("query_id", "token", "df")
    time("qsel") { println("  qsel: " + qsel.count()) }
    val scored = idx.postings.join(broadcast(qsel), Seq("token"))
      .crossJoin(broadcast(idx.totals))
      .select(col("query_id"), col("rep"),
        expr("(((2 * n - 2 * df + 1) * 1000000) div (2 * df + 1) * " +
          "((22 * tf * avgdl_milli * 1000000) div " +
          "(10 * tf * avgdl_milli + 3 * avgdl_milli + 9000 * dl))) div 1000000")
          .as("contrib_micro"))
    time("scored fan-out") { println("  scored: " + scored.count()) }
    val agg = scored.groupBy("query_id", "rep")
      .agg(sum("contrib_micro").as("score_micro"))
    time("per-(q,rep) agg") { println("  agg: " + agg.count()) }
    val expanded = agg.join(idx.membership, Seq("rep"))
      .filter(col("doc_id") =!= col("query_id"))
    time("membership expand") { println("  expanded: " + expanded.count()) }
    val lex = expanded
      .groupBy("query_id")
      .agg(graft.functions.expressions.TopKAggregates
        .topKAscLong(-col("score_micro"), col("doc_id"), col("doc_id"), 12)
        .as("top"))
    time("lex TopK") { println("  lex: " + lex.count()) }
    time("lex TopK again") { lex.count() }
    val full = graft.ops.Similarity.q172HybridQueryRrf(spark, dir)
    time("FULL q172") { println("  rows: " + full.count()) }
    time("FULL q172 again") { full.count() }
    // bench-protocol replica: fresh DataFrame per pass, like timeAll
    (1 to 4).foreach { i =>
      time(s"bench-style pass $i") {
        graft.ops.Similarity.q172HybridQueryRrf(spark, dir).count()
      }
    }
    // and q171 interleaved, like the alphabetical stress sweep
    (1 to 2).foreach { i =>
      time(s"interleaved q171 pass $i") {
        graft.ops.Similarity.q171KcenterCoreset(spark, dir).count()
      }
      time(s"interleaved q172 pass $i") {
        graft.ops.Similarity.q172HybridQueryRrf(spark, dir).count()
      }
    }
    // twin-saturated simulation: the SAME core over a parquet-read
    // 400-query frame against a FRESH (non-memo) serving index — the
    // StreamStress saturated surface minus the streaming wrapper
    val freshIdx = time("fresh serving index build") {
      graft.streaming.StreamingOps.buildHybridServingIndex(spark, dir)
    }
    val hybIn = "/tmp/graft-stream-hyb-in"
    if (new java.io.File(hybIn).exists()) {
      val qf = spark.read.parquet(hybIn)
      (1 to 2).foreach { i =>
        time(s"core-on-parquet-queries pass $i (fresh idx)") {
          graft.ops.Similarity.hybridQueryCore(qf, freshIdx).count()
        }
      }
      // halves on the parquet frame, against the fresh index
      val pQtok = qf.select(col("query_id"),
        explode(array_distinct(tokens(col("text")))).as("token"))
      val pQsel = broadcast(pQtok).join(freshIdx.dfTable, Seq("token"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("query_id").orderBy(col("df"), col("token"))))
        .filter(col("rn") <= 8)
        .select("query_id", "token", "df")
      val pScored = freshIdx.postings.join(broadcast(pQsel), Seq("token"))
        .crossJoin(broadcast(freshIdx.totals))
        .select(col("query_id"), col("rep"),
          expr("(((2 * n - 2 * df + 1) * 1000000) div (2 * df + 1) * " +
            "((22 * tf * avgdl_milli * 1000000) div " +
            "(10 * tf * avgdl_milli + 3 * avgdl_milli + 9000 * dl))) div 1000000")
            .as("contrib_micro"))
        .groupBy("query_id", "rep")
        .agg(sum("contrib_micro").as("score_micro"))
        .join(freshIdx.membership, Seq("rep"))
        .filter(col("doc_id") =!= col("query_id"))
        .groupBy("query_id")
        .agg(graft.functions.expressions.TopKAggregates
          .topKAscLong(-col("score_micro"), col("doc_id"), col("doc_id"), 12)
          .as("top"))
      time("parquet lex half") { println("  lex: " + pScored.count()) }
      time("parquet lex half again") { pScored.count() }
      import graft.functions.VectorFunctions._
      val pQv = qf.filter(col("embedding").isNotNull)
        .select(col("query_id"), col("embedding").as("q_emb"),
          norm(col("embedding")).as("q_norm"))
      val pDen = broadcast(pQv)
        .join(freshIdx.corpus, col("query_id") =!= col("cand_id"))
        .select(col("query_id"),
          (-floor(cosinePrenormed(dot(col("q_emb"), col("c_emb")),
            col("q_norm"), col("c_norm")) * lit(1e6) + lit(0.5)).cast("long"))
            .as("neg_micro"),
          col("cand_id"))
        .groupBy("query_id")
        .agg(graft.functions.expressions.TopKAggregates
          .topKAscLong(col("neg_micro"), col("cand_id"), col("cand_id"), 12)
          .as("top"))
      time("parquet den half") { println("  den: " + pDen.count()) }
      time("parquet den half again") { pDen.count() }
    }
    freshIdx.unpersist()
  }
}
