package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector primitives over `array<float>` embedding columns, built
  * from Spark's higher-order array functions (zip_with / aggregate —
  * evaluated inside codegen, no UDF, no driver-side math).
  *
  * All arithmetic is promoted to double BEFORE accumulation so the result
  * is a plain left-to-right double fold — the same value any other engine
  * computes with double accumulation (the DuckDB oracle casts to
  * DOUBLE[] for the same reason). Outputs that feed comparisons are
  * rounded to a fixed number of decimals to absorb last-ulp differences
  * in summation order.
  */
object VectorFunctions {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Reference formulation via higher-order built-ins (interpreted; kept
    * as the readable spec and for tests — [[dot]] is the hot path).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** Codegen'd dot product — bit-identical to [[dotHof]] (same
    * left-to-right double accumulation), ~50× faster per pair.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.FloatVecExpressions.floatDot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine from a precomputed dot and per-side norms. In all-pairs plans
    * compute `norm` once per ROW before the join (N ops), not once per
    * PAIR (N² ops) — same result bits, 3× fewer dot products.
    */
  def cosinePrenormed(dotAB: Column, normA: Column, normB: Column): Column =
    dotAB / (normA * normB)

  /** Sign-LSH bucket id from the first `nBits` dimensions: bit j is set
    * iff v[j] > 0. Axis-aligned random-hyperplane LSH — at 100 TB this is
    * the pre-partitioning that turns an O(n^2) similarity join into
    * per-bucket joins (bucket count 2^nBits bounds the fan-in).
    */
  def signBucket(v: Column, nBits: Int = 8): Column = signBucketAt(v, 0, nBits)

  /** Sign-LSH bucket over dimensions [offset+1 .. offset+nBits] — the
    * banded variant: independent buckets over disjoint dimension windows
    * give the OR-of-bands recall amplification (a pair is a candidate if
    * ANY band agrees), exactly the multi-table LSH construction.
    */
  def signBucketAt(v: Column, offset: Int, nBits: Int): Column =
    (0 until nBits)
      .map(j => when(element_at(v, offset + j + 1) > 0.0f, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
}
