package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.functions.TextFunctions
import graft.ops.Skew

/** Salted operators must be result-identical to their plain
  * formulations — salting changes the shuffle layout, never the answer.
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private lazy val tokens = Tables.documents(spark, sf)
    .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("word"))

  test("saltedCount ≡ groupBy.count on Zipfian token counts") {
    val plain = tokens.groupBy(col("word").as("k")).agg(count(lit(1)).as("cnt"))
    val salted = Skew.saltedCount(tokens, col("word"), col("doc_id"), salts = 16)
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("saltedSum ≡ groupBy.sum") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_orderkey"),
        graft.functions.Round.cents(col("l_quantity")).as("q"))
    val plain = li.groupBy(col("l_returnflag").as("k")).agg(sum("q").as("total"))
    val salted = Skew.saltedSum(li, col("l_returnflag"), col("q"), col("l_orderkey"), 8)
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin ≡ plain inner join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
    val plain = li.join(o, Seq("o_orderkey")).select("o_orderkey", "l_quantity", "o_orderpriority")
    val salted = Skew.saltedJoin(li, o, "o_orderkey", col("l_quantity"), salts = 8)
      .select("o_orderkey", "l_quantity", "o_orderpriority")
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }
}
