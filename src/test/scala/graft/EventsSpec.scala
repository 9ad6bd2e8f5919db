package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.ops.Events

/** Event-operator invariants (sessionize/running are covered in OpsSpec;
  * here: the as-of join and the HLL sketch).
  */
class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q42 as-of: one row per purchase, non-negative gaps") {
    val df = Events.q42AsofPurchaseClick(spark, sf).cache()
    try {
      val purchases = Tables.events(spark, sf)
        .filter(col("event_type") === "purchase").count()
      assert(df.count() == purchases)
      assert(df.filter(col("gap_s") < 0).count() == 0L)
    } finally df.unpersist()
  }

  test("q42 as-of: matched click is truly the latest at-or-before (spot check via join)") {
    val e = Tables.events(spark, sf)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), unix_micros(col("ts")).as("p_us"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("c_us"))
    val expected = purchases.join(clicks, Seq("user_id"), "left_outer")
      .filter(col("c_us").isNull || col("c_us") <= col("p_us"))
      .groupBy("user_id", "p_id", "p_us")
      .agg(max("c_us").as("last_click_us"))
      .select(col("p_id").as("event_id"),
        expr("(p_us - last_click_us) div 1000000").as("want_gap"))
    val got = Events.q42AsofPurchaseClick(spark, sf)
      .select(col("event_id"), col("gap_s"))
    val joined = got.join(expected, Seq("event_id"))
    assert(joined.filter(
      !(col("gap_s") <=> col("want_gap"))).count() == 0L)
  }

  test("session_window (streaming op, batch-evaluated) agrees with the window-based sessionizer") {
    // two independent formulations of 30-min-gap sessionization must
    // produce identical (user, n_events, session_value) multisets
    val viaWindows = Events.q15Sessionize(spark, sf)
      .select("user_id", "n_events", "session_value")
    val viaSessionWindow = graft.streaming.StreamingOps
      .sessionWindows(Tables.events(spark, sf))
      .select(col("user_id"), col("n_events"),
        graft.functions.Round.r2(col("session_value")).as("session_value"))
    assert(viaWindows.exceptAll(viaSessionWindow).count() == 0 &&
      viaSessionWindow.exceptAll(viaWindows).count() == 0)
  }

  test("q38 sketch: HLL distinct within 10% of exact") {
    val bad = Events.q38ApproxDistinct(spark, sf)
      .filter(abs(col("approx_users") - col("exact_users"))
        > col("exact_users") * 0.1)
      .count()
    assert(bad == 0L)
  }

  test("q38's exact column equals the oracle-gated exact twin (q63)") {
    // ties the sketch query's in-row exact_users to q63, which the
    // DuckDB gate hash-verifies — so the EventsSpec error bound above is
    // anchored to an oracle-checked value, not a self-reported one
    val sketch = Events.q38ApproxDistinct(spark, sf)
      .select("event_type", "exact_users", "n_events")
    val twin = Events.q63ExactDistinct(spark, sf)
    assert(sketch.exceptAll(twin).count() == 0 &&
      twin.exceptAll(sketch).count() == 0)
  }

  test("q93 retention: actives conserve, retained bounded by both cohort days, rate in [0,1]") {
    val rows = Events.q93RetentionCohorts(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // sum of daily actives = the distinct (day, user) universe
    val dailyDistinct = graft.core.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("day"), col("user_id"))
      .distinct().count()
    assert(rows.values.map(_._1).sum == dailyDistinct)
    rows.foreach { case (day, (active, retained, rate)) =>
      assert(retained <= active, s"$day retains more than its cohort")
      // retained users are also active the NEXT day
      val next = java.time.LocalDate.parse(day).plusDays(1).toString
      assert(retained <= rows.get(next).map(_._1).getOrElse(0L),
        s"$day retains more users than are active on $next")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }
}
