package graft.api

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed map/reduce surface — the idiomatic Spark equivalent of the
  * reference's entire UDF surface (subclassing Mapper / Reducer,
  * SURVEY §2.2 last row, §2.3):
  *
  *  - reference `Mapper.map` with multi-emit ≙ [[flatMapRecords]]
  *    (`MapClass.java:17-27` is exactly a flatMap from a line to tokens);
  *  - reference `Reducer.reduce` as a commutative fold ≙ [[reduceByKey]]
  *    (`ReduceClass.java:12-24` is `_ + _` over grouped ints);
  *  - the general "plug in your own aggregation" extension point ≙
  *    [[foldByKey]] with an [[Aggregator]] (partial aggregation /
  *    map-side combine comes free — the reference never even registered
  *    a combiner, so every pair crossed its shuffle).
  *
  * All of it stays in the Dataset world (Encoders, Tungsten rows,
  * whole-stage codegen where possible) — no RDDs.
  */
object TypedPipeline {

  /** Mapper-with-multi-emit (the reference mapper's shape). */
  def flatMapRecords[I, O: Encoder](ds: Dataset[I])(f: I => IterableOnce[O]): Dataset[O] =
    ds.flatMap(f)(implicitly[Encoder[O]])

  /** reduceByKey: group by a typed key, fold values with a commutative,
    * associative op. Spark plans groupByKey+reduceGroups with partial
    * aggregation before the shuffle.
    */
  def reduceByKey[I, K: Encoder](ds: Dataset[I])(key: I => K)(op: (I, I) => I)(
      implicit pair: Encoder[(K, I)]): Dataset[(K, I)] =
    ds.groupByKey(key).reduceGroups(op)

  /** Generalized per-key aggregation with an explicit Aggregator
    * (zero/reduce/merge/finish) — the typed twin of a Hadoop Reducer
    * that is NOT a simple fold.
    */
  def foldByKey[I, K: Encoder, B, O](ds: Dataset[I])(key: I => K)(
      agg: Aggregator[I, B, O])(implicit pair: Encoder[(K, O)]): Dataset[(K, O)] =
    ds.groupByKey(key).agg(agg.toColumn)

  /** The reference reducer, as an Aggregator: sum of ints with Java
    * `int` arithmetic (wraps on overflow exactly like
    * `ReduceClass.java:19`; SURVEY §2.5 documents the divergence choice
    * for the engine's long-typed default).
    */
  object IntSum extends Aggregator[Int, Int, Int] {
    def zero: Int = 0
    def reduce(b: Int, a: Int): Int = b + a
    def merge(b1: Int, b2: Int): Int = b1 + b2
    def finish(b: Int): Int = b
    def bufferEncoder: Encoder[Int] = Encoders.scalaInt
    def outputEncoder: Encoder[Int] = Encoders.scalaInt
  }

  /** Bounded top-k per group as an Aggregator (SURVEY §4.2's candidate
    * custom aggregate): keeps at most k (score, id) pairs, merging
    * buffers pairwise — state is O(k) regardless of group size, which is
    * what makes per-group top-k viable at 100 TB (a window + row_number
    * materializes and sorts the whole group instead).
    *
    * Ordering: higher score first; ties broken by smaller id
    * (deterministic).
    */
  class TopK(k: Int) extends Aggregator[(Double, Long), List[(Double, Long)], List[(Double, Long)]] {
    private def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def insert(buf: List[(Double, Long)], v: (Double, Long)): List[(Double, Long)] = {
      val (pre, post) = buf.span(better(_, v))
      (pre ::: v :: post).take(k)
    }
    def zero: List[(Double, Long)] = Nil
    def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] = insert(b, a)
    def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
      b2.foldLeft(b1)(insert)
    def finish(b: List[(Double, Long)]): List[(Double, Long)] = b
    def bufferEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
    def outputEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
  }

  /** Bounded bottom-k DISTINCT values per group — the KMV /
    * bottom-k-theta distinct-sketch state ([[graft.ops.TextOps]]
    * q160/q161): keeps the k smallest distinct longs seen, merging
    * buffers pairwise. State is O(k) regardless of group size AND of
    * duplicate volume (inserting a duplicate is a no-op), which is what
    * makes a per-source distinct sketch viable at 100 TB: the map-side
    * partial aggregation reduces each task's contribution to <= k values
    * per group before the only shuffle, so no corpus-wide DISTINCT (a
    * full shuffle of the value space) is ever planned.
    *
    * Buffer is sorted DESCENDING so the steady-state common case — a
    * value at least the current kth-smallest arriving at a full buffer —
    * is rejected by one head comparison, O(1).
    */
  object BottomKDistinct {
    /** The single definition of a sketch insert, shared by the batch
      * Aggregator below and the streaming twin
      * ([[graft.streaming.StreamingOps.kmvSketchStream]]) so the two
      * surfaces cannot diverge on what the sketch IS. Buffer carries
      * its size explicitly: the hot-path rejection must not pay
      * List.size's O(k) walk per input value.
      */
    def insert(k: Int)(buf: (Int, List[Long]), v: Long): (Int, List[Long]) = {
      val (n, vals) = buf
      if (n >= k && vals.nonEmpty && v >= vals.head) buf
      else {
        val (pre, post) = vals.span(_ > v)
        if (post.headOption.contains(v)) buf // distinct: drop duplicates
        else if (n >= k) (n, (pre ::: v :: post).tail) // evict the largest
        else (n + 1, pre ::: v :: post)
      }
    }
  }

  class BottomKDistinct(k: Int) extends Aggregator[Long, (Int, List[Long]), Seq[Long]] {
    require(k >= 1, s"BottomKDistinct: k must be >= 1, got $k")
    private val ins = BottomKDistinct.insert(k) _
    def zero: (Int, List[Long]) = (0, Nil)
    def reduce(b: (Int, List[Long]), a: Long): (Int, List[Long]) = ins(b, a)
    def merge(b1: (Int, List[Long]), b2: (Int, List[Long])): (Int, List[Long]) =
      b2._2.foldLeft(b1)(ins)
    def finish(b: (Int, List[Long])): Seq[Long] = b._2.reverse // ascending
    def bufferEncoder: Encoder[(Int, List[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Int, List[Long])]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
