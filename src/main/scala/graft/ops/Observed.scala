package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Single-pass pipeline INSTRUMENTATION via Spark's `observe` API: named
  * metrics (row counts, null counts, min/max) computed AS THE JOB RUNS,
  * with zero additional scan — the accumulator-backed alternative to
  * re-aggregating a 100 TB frame just to know how many rows a stage
  * passed. The returned [[Observation]] yields the metrics after the
  * frame's first action; the frame itself is unchanged (same rows, same
  * plan shape above the CollectMetrics node), so instrumentation
  * composes with any downstream operator.
  *
  * q91 is the deliberate-scan twin (ANALYZE-style stats as a QUERY);
  * this is the free-rider form a production pipeline attaches to every
  * stage boundary. Works on streaming frames too (metrics surface per
  * micro-batch via `StreamingQueryProgress.observedMetrics`).
  */
object Observed {

  /** Attach row count + per-column null counts + numeric min/max to a
    * frame. Metrics are exact and computed once per action, map-side
    * (Spark merges per-partition metric rows like any aggregate).
    */
  def withTableMetrics(df: DataFrame, numericCols: Seq[String],
      name: String = "graft_metrics"): (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        numericCols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
            min(col(c)).as(s"${c}_min"),
            max(col(c)).as(s"${c}_max"))
        }
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
