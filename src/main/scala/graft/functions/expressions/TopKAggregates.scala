package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Mutable bounded top-k state over (metric, id, payload) BIGINT triples,
  * kept sorted ASCENDING by (metric, id) — k smallest metrics, ties to
  * the smaller id. Primitive arrays, no per-insert allocation; the
  * steady-state common case (a full buffer rejecting a value ≥ its
  * current worst) is one comparison.
  */
final class TopKAscState(val k: Int) {
  var n: Int = 0
  val m: Array[Long] = new Array[Long](k)
  val ids: Array[Long] = new Array[Long](k)
  val pay: Array[Long] = new Array[Long](k)

  def insert(mv: Long, iv: Long, pv: Long): Unit = {
    if (n == k) {
      val lm = m(k - 1); val li = ids(k - 1)
      if (mv > lm || (mv == lm && iv >= li)) return
    }
    var lo = 0
    while (lo < n && (m(lo) < mv || (m(lo) == mv && ids(lo) < iv))) lo += 1
    var j = math.min(n, k - 1)
    while (j > lo) {
      m(j) = m(j - 1); ids(j) = ids(j - 1); pay(j) = pay(j - 1); j -= 1
    }
    m(lo) = mv; ids(lo) = iv; pay(lo) = pv
    if (n < k) n += 1
  }
}

/** Bounded per-group top-k as a NATIVE [[TypedImperativeAggregate]] —
  * the SURVEY §7.3 candidate, built when measurement demanded it: on
  * q169's 4M-candidate frame the per-group top-3 cost ~6 s through
  * WindowExec AND ~6 s through a Dataset `Aggregator` (both pay
  * object-path row machinery per input row — the underlying sort is
  * 0.8 s), while this aggregate runs inside ObjectHashAggregateExec
  * with codegen'd child expression evaluation and a three-compare
  * primitive-array fold per row. State is O(k) regardless of group
  * size; partial mode folds map-side so the only shuffle carries ≤ k
  * triples per (group, partition).
  *
  * Ordering contract (exact — BIGINT, no Double ulp hazard): ascending
  * metric, ties to the smaller id; exactly what the ADC probe's oracle
  * replays (`ORDER BY adc_d2, cand_id`). Output: array&lt;struct&lt;
  * metric, id, payload&gt;&gt; in rank order, ready for `posexplode`.
  */
case class TopKAscLongAgg(
    metric: Expression, id: Expression, payload: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAscState] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(metric, id, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(new StructType()
    .add("metric", LongType, nullable = false)
    .add("id", LongType, nullable = false)
    .add("payload", LongType, nullable = false), containsNull = false)

  override def createAggregationBuffer(): TopKAscState = new TopKAscState(k)

  override def update(b: TopKAscState, input: InternalRow): TopKAscState = {
    val mv = metric.eval(input)
    val iv = id.eval(input)
    val pv = payload.eval(input)
    // null-skipping (the SQL agg convention); the ADC call sites are
    // non-null by construction
    if (mv != null && iv != null && pv != null)
      b.insert(mv.asInstanceOf[Long], iv.asInstanceOf[Long],
        pv.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKAscState, o: TopKAscState): TopKAscState = {
    var i = 0
    while (i < o.n) { b.insert(o.m(i), o.ids(i), o.pay(i)); i += 1 }
    b
  }

  override def eval(b: TopKAscState): Any = {
    val rows = new Array[Any](b.n)
    var i = 0
    while (i < b.n) { rows(i) = InternalRow(b.m(i), b.ids(i), b.pay(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(b: TopKAscState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + b.n * 24)
    bb.putInt(b.k); bb.putInt(b.n)
    var i = 0
    while (i < b.n) { bb.putLong(b.m(i)); bb.putLong(b.ids(i)); bb.putLong(b.pay(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAscState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new TopKAscState(bb.getInt)
    val n = bb.getInt
    var i = 0
    // entries arrive in sorted order and fit by construction — fill
    // directly, no re-insert
    while (i < n) {
      s.m(i) = bb.getLong; s.ids(i) = bb.getLong; s.pay(i) = bb.getLong
      i += 1
    }
    s.n = n
    s
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAscLongAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAscLongAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKAscLongAgg =
    copy(metric = c(0), id = c(1), payload = c(2))
}

object TopKAggregates {
  /** Column API for [[TopKAscLongAgg]]: per-group array of the k
    * smallest (metric, id, payload) triples in rank order.
    */
  def topKAscLong(metric: Column, id: Column, payload: Column, k: Int): Column =
    Bridge.column(TopKAscLongAgg(Bridge.expression(metric),
      Bridge.expression(id), Bridge.expression(payload), k)
      .toAggregateExpression())
}
