package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.TypedPipeline
import graft.api.TypedPipeline.TopK

/** The typed Mapper/Reducer-equivalent surface (SURVEY §2.3): flatMap
  * multi-emit, reduceByKey fold, Aggregator-based per-key aggregation.
  */
class TypedPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flatMapRecords + reduceByKey reproduce the reference word count") {
    import spark.implicits._
    val lines = Seq("a b a", "b  c", "").toDS()
    val tokens = TypedPipeline.flatMapRecords(lines)(_.split(" ").filter(_.nonEmpty))
    val counts = TypedPipeline.reduceByKey(tokens.map(t => (t, 1)))(_._1) {
      case ((w, a), (_, b)) => (w, a + b)
    }.map { case (k, (_, n)) => (k, n) }.collect().toMap
    assert(counts == Map("a" -> 2, "b" -> 2, "c" -> 1))
  }

  test("IntSum aggregator wraps on int overflow like the reference reducer") {
    import spark.implicits._
    val ds = Seq(("k", Int.MaxValue), ("k", 1)).toDS()
    val got = TypedPipeline.foldByKey(ds.map(_._2))(_ => "k")(TypedPipeline.IntSum)
      .collect().head._2
    assert(got == Int.MinValue) // 2^31-1 + 1 wraps (ReduceClass.java:19 semantics)
  }

  test("TopK aggregator: bounded per-group top-k with deterministic ties") {
    import spark.implicits._
    val data = Seq(
      ("g1", 1.0, 10L), ("g1", 3.0, 11L), ("g1", 2.0, 12L), ("g1", 3.0, 9L),
      ("g2", 5.0, 20L)).toDS()
    val got = TypedPipeline.foldByKey(data.map(r => (r._2, r._3)))(
      r => if (r._2 < 20) "g1" else "g2")(new TopK(2))
      .collect().toMap
    assert(got("g1") == List((3.0, 9L), (3.0, 11L))) // ties → smaller id first
    assert(got("g2") == List((5.0, 20L)))
  }
}
