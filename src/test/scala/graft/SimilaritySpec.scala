package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Similarity

/** ANN-quality invariants: the approximate paths must stay close to the
  * exact brute-force baseline.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q48 IVF: at most k rows per query, valid sims, recall@3 vs exact >= 0.3") {
    val ivf = Similarity.q48IvfAnn(spark, sf).cache()
    try {
      assert(ivf.filter(col("cos_sim") < -1.001 || col("cos_sim") > 1.001).count() == 0)
      val over = ivf.groupBy("query_id").agg(count(lit(1)).as("n"))
        .filter(col("n") > 3).count()
      assert(over == 0L)
      // exact top-3 for the same query set (vec_id % 25 == 0)
      val e = graft.core.Tables.embeddings(spark, sf)
      import graft.functions.VectorFunctions._
      val q = e.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
          norm(col("embedding")).as("q_norm"))
      val c = e.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"),
        norm(col("embedding")).as("c_norm"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("sim").desc, col("cand_id"))
      val exact = q.join(c, col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          cosinePrenormed(dot(col("q_emb"), col("c_emb")), col("q_norm"), col("c_norm")).as("sim"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("query_id", "cand_id")
      val hits = ivf.select("query_id", "cand_id").intersect(exact).count()
      val total = exact.count()
      assert(hits.toDouble / total >= 0.3, s"recall $hits/$total")
    } finally ivf.unpersist()
  }

  test("persisted IVF index: probe-from-table equals the in-session q48 result") {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("ivf_idx", "ivf_idx_centroids").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(warehouse, t)
      if (dir.exists()) { dir.listFiles().foreach(_.delete()); dir.delete() }
    }
    try {
      Similarity.buildIvfIndex(spark, sf, "ivf_idx")
      // the index table carries the physical layout claim
      val catalog = spark.sql("DESCRIBE EXTENDED ivf_idx").collect()
        .map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
      assert(catalog.contains("Bucket Columns") && catalog.contains("centroid"),
        s"index table must be bucketed by centroid:\n$catalog")
      // probing the persisted index (no KMeans fit on this path) must
      // reproduce the in-session result exactly — same quantizer, same
      // probe core; this transitively pins the recall bound above
      val fromIndex = Similarity.ivfProbeIndexed(spark, "ivf_idx")
      val inSession = Similarity.q48IvfAnn(spark, sf)
      assert(fromIndex.exceptAll(inSession).count() == 0L &&
        inSession.exceptAll(fromIndex).count() == 0L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS ivf_idx")
      spark.sql("DROP TABLE IF EXISTS ivf_idx_centroids")
    }
  }
}
