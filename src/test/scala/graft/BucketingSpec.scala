package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.sources.Bucketing

/** Bucketed co-located join: same-key bucketed tables must join without
  * any shuffle Exchange, and produce the same result as the plain join.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bucketed orders ⨝ lineitem plans with zero Exchange and matches plain join") {
    // a previous aborted run may have left the catalog-less CTAS
    // directories behind (the in-memory catalog forgets the tables but
    // saveAsTable refuses a non-empty location) — clean first, and keep
    // the writes inside the try so finally always drops
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(warehouse, t)
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, sf), "b_orders", "o_orderkey", 4, Some("o_orderkey"))
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
        "b_lineitem", "l_orderkey", 4, Some("l_orderkey"))
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .hint("merge") // force SMJ so broadcast doesn't mask the bucketing
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      val plain = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() == plain.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
