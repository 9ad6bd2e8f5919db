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

  test("q96 funnel: stage counts monotone, n_view independently recomputed") {
    val row = Events.q96EventFunnel(spark, sf).head()
    val (users, view, click, purchase) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    assert(users >= view && view >= click && click >= purchase)
    assert(purchase >= 0L)
    val ev = graft.core.Tables.events(spark, sf)
    assert(users == ev.select("user_id").distinct().count())
    assert(view == ev.filter(col("event_type") === "view")
      .select("user_id").distinct().count())
    // independent recomputation of the click stage: v is the per-user
    // first view, so "click stage" = users with some click at-or-after
    // v — a join formulation instead of the stacked windows
    val loose = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("v"))
      .join(ev.filter(col("event_type") === "click"), Seq("user_id"))
      .filter(col("ts") >= col("v"))
      .select("user_id").distinct().count()
    assert(click == loose) // min-view IS the stacked rule's v
  }

  test("q97 attribution: one row per purchase, gaps within the hour band, zero-click rows null") {
    val attr = Events.q97ClickAttribution(spark, sf).cache()
    try {
      val ev = graft.core.Tables.events(spark, sf)
      assert(attr.count() ==
        ev.filter(col("event_type") === "purchase").count())
      assert(attr.filter(col("n_clicks_1h") < 0L).count() == 0L)
      assert(attr.filter(col("min_gap_s") < 0L ||
        col("max_gap_s") > 3600L ||
        col("min_gap_s") > col("max_gap_s")).count() == 0L)
      assert(attr.filter(col("n_clicks_1h") === 0L &&
        (col("min_gap_s").isNotNull || col("max_gap_s").isNotNull))
        .count() == 0L)
      assert(attr.filter(col("n_clicks_1h") > 0L &&
        (col("min_gap_s").isNull || col("max_gap_s").isNull))
        .count() == 0L)
      // independent recount of one user's attributable clicks
      val u = attr.filter(col("n_clicks_1h") > 0L)
        .select("user_id").head().getLong(0)
      val clicks = ev.filter(col("event_type") === "click" &&
        col("user_id") === u).select(col("ts").as("cts"))
      val recount = ev.filter(col("event_type") === "purchase" &&
        col("user_id") === u)
        .select(col("event_id").as("purchase_id"), col("ts").as("pts"))
        .crossJoin(clicks)
        .filter(col("cts") <= col("pts") &&
          col("cts") >= col("pts") - expr("INTERVAL 1 HOUR"))
        .groupBy("purchase_id").agg(count(lit(1)).as("n2"))
      assert(attr.filter(col("user_id") === u)
        .join(recount, Seq("purchase_id"), "left")
        .filter(col("n_clicks_1h") =!= coalesce(col("n2"), lit(0L)))
        .count() == 0L)
    } finally attr.unpersist()
  }

  test("q100 trailing window: RANGE frame equals a self-join recount (peers included)") {
    val got = Events.q100TrailingWindow(spark, sf)
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        graft.functions.Round.cents(col("value")).as("value_c"))
    // RANGE semantics: for event e, ALL events of the user with
    // us in [e.us - 1h, e.us] — including same-timestamp peers that
    // sort after e. The join formulation has no tie-break at all, so
    // agreement proves the frame is value-based, not row-based.
    val other = ev.select(col("user_id").as("u2"), col("us").as("us2"),
      col("value_c").as("vc2"))
    val expect = ev.join(other,
        col("user_id") === col("u2") &&
          col("us2") <= col("us") &&
          col("us2") >= col("us") - lit(3600L * 1000000L))
      .groupBy("event_id", "user_id")
      .agg(count(lit(1)).as("n_1h"),
        graft.functions.Round.fromCents(sum("vc2")).as("sum_value_1h"))
    assert(got.exceptAll(expect).count() == 0 &&
      expect.exceptAll(got).count() == 0)
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

  test("q112 resample: dense daily grid per user, forward fill equals a JVM recount") {
    val rows = Events.q112ResampleFfill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2), r.getDouble(3)))
    val byUser = rows.groupBy(_._1)
    // dense, duplicate-free grid spanning first..last observed day
    byUser.foreach { case (u, rs) =>
      val days = rs.map(_._2).sorted
      assert(days.distinct.length == days.length, s"user $u has duplicate days")
      val span = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(days.head), java.time.LocalDate.parse(days.last)) + 1
      assert(days.length.toLong == span, s"user $u grid has gaps")
      assert(rs.minBy(_._2)._3 && rs.maxBy(_._2)._3,
        s"user $u span must start and end on observed days")
    }
    // JVM forward-fill recount from the raw events: last value per
    // (user, day) by (us, event_id), carried across gap days
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"),
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.to_date(col("ts")), "yyyy-MM-dd").as("day"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val lastPerDay = ev.groupBy(e => (e._1, e._2)).map { case (k, es) =>
      k -> es.maxBy(e => (e._3, e._4))._5
    }
    rows.foreach { case (u, day, observed, v) =>
      assert(observed == lastPerDay.contains((u, day)))
      val carriedFrom = lastPerDay.keys.filter(k => k._1 == u && k._2 <= day)
        .maxBy(_._2)
      assert(v == lastPerDay(carriedFrom),
        s"user $u day $day: ffill $v != last observed ${lastPerDay(carriedFrom)}")
    }
  }

  test("q111 unattributed purchases = q97's zero-click slice, partitioned exactly") {
    val anti = Events.q111UnattributedPurchases(spark, sf)
      .select("purchase_id").collect().map(_.getLong(0)).toSet
    val byCount = Events.q97ClickAttribution(spark, sf)
      .select("purchase_id", "n_clicks_1h").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the anti join and the aggregate agree row-for-row: NOT EXISTS is
    // exactly count == 0 (and the attributed rest is count > 0)
    assert(anti == byCount.filter(_._2 == 0L).keySet)
    assert(byCount.keySet.size == anti.size + byCount.count(_._2 > 0L))
  }

  test("q144 temporal split: matches a JVM reference; the guard admits no straddling user") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lo = evs.map(_._2).min
    val hi = evs.map(_._2).max
    val cut = lo + (hi - lo) * 8L / 10L
    val want = evs.groupBy(_._1).map { case (u, xs) =>
      val f = xs.map(_._2).min
      val l = xs.map(_._2).max
      u -> (xs.length.toLong, f, l,
        if (l < cut) "train" else if (f >= cut) "eval" else "excluded")
    }
    val got = Events.q144TemporalSplit(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(got == want && got.nonEmpty)
    // the leakage guard, stated as the invariant it exists for: every
    // train user's LAST event precedes the cutoff, every eval user's
    // FIRST event does not, and nothing else is labeled
    got.values.foreach {
      case (_, _, l, "train") => assert(l < cut)
      case (_, f, _, "eval") => assert(f >= cut)
      case (_, f, l, "excluded") => assert(f < cut && l >= cut)
      case (_, _, _, other) => fail(s"unknown split label $other")
    }
  }
}
