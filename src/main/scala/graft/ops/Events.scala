package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.Round._

/** Event-stream operators over the `events` fixture: JSON extraction,
  * running window frames, and gap-based sessionization. These are the
  * batch twins of the Structured Streaming pipelines in
  * `graft.streaming` — same logical transformations, so the streaming
  * path can be validated against these oracle-checked batch results.
  */
object Events {

  /** JSON field extraction (`props` is a JSON object like {"k": 87}) +
    * per-event-type aggregate.
    */
  def q13JsonAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum("k").as("sum_k"),
        r4(sum("k").cast("double") / count(lit(1))).as("avg_k"),
        fromCents(sum(cents(col("value")))).as("sum_value"))
      .orderBy("event_type")

  /** Running per-user cumulative value (ROWS frame, deterministic order by
    * (ts, event_id)). Running sums fold left-to-right in both engines, so
    * values are bit-identical; rounding is belt-and-braces.
    */
  def q14RunningValue(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("running_value", fromCents(sum(cents(col("value"))).over(w)))
      .withColumn("event_idx", row_number().over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")).cast("long"))
      .select(col("user_id"), col("event_idx"), col("event_id"), col("event_type"), col("running_value"))
      .orderBy("user_id", "event_idx")
  }

  /** As-of join, composed from built-ins (preference (a) of the custom-
    * operator ladder — no custom SparkPlan needed): each purchase event
    * picks up the most recent click AT OR BEFORE it by the same user,
    * via a running max of click timestamps over the ordered per-user
    * frame. One shuffle on user_id; no range cross-join. (DuckDB has a
    * native ASOF JOIN; the oracle uses the identical window formulation
    * for bit-parity.)
    */
  def q42AsofPurchaseClick(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("last_click_us",
        max(when(col("event_type") === "click", col("us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        expr("(us - last_click_us) div 1000000").as("gap_s"))
      .orderBy("user_id", "event_id")
  }

  /** Sketch aggregation: HyperLogLog++ distinct users per event type,
    * alongside the exact count. No DuckDB oracle — its HLL is a
    * different sketch — so the driver records a rows-only check. The
    * quantitative gate is two-piece instead: [[q63ExactDistinct]] is the
    * oracle-gated exact twin (pins the exact side against DuckDB), and
    * EventsSpec bounds the HLL relative error against it.
    */
  def q38ApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** The ORACLE-GATED shape of [[q38ApproxDistinct]] (registered as
    * q38): the raw HLL estimate is not DuckDB-expressible (different
    * sketch), but its ERROR BOUND is — the gated output carries the
    * exact columns plus `hll_within_10pct`, the in-query assertion
    * |approx − exact| ≤ 0.10·exact, which the oracle states as literal
    * TRUE. HLL++ hashes values deterministically (order- and
    * partition-invariant), so the boolean is deterministic: the
    * CORRECTNESS row goes red iff the sketch ever leaves its bound.
    * The raw estimate stays observable via [[q38ApproxDistinct]],
    * which EventsSpec bounds against the oracle-gated exact twin.
    */
  def q38ApproxDistinctGated(s: SparkSession, d: String): DataFrame =
    q38ApproxDistinct(s, d)
      .select(col("event_type"), col("exact_users"), col("n_events"),
        (abs(col("approx_users") - col("exact_users"))
          <= col("exact_users").cast("double") * lit(0.10))
          .as("hll_within_10pct"))
      .orderBy("event_type")

  /** Exact-distinct twin of [[q38ApproxDistinct]] — same grouping, exact
    * aggregates only, so DuckDB can oracle-gate it. Together with the
    * EventsSpec error-bound test this pins q38's accuracy: the exact
    * column is hash-verified here, and the sketch column is bounded
    * against that verified value.
    */
  def q63ExactDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")

  /** Gap-based sessionization: a new session starts when a user is idle
    * > 30 minutes. lag → boundary flag → running sum = session id; then
    * per-session aggregates. This is the classic batch formulation; the
    * streaming twin uses `session_window`/flatMapGroupsWithState.
    */
  def q15Sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull || unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("session_id", sum("new_session").over(run))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        fromCents(sum(cents(col("value")))).as("session_value"),
        date_format(min("ts"), "yyyy-MM-dd HH:mm:ss").as("session_start"))
      .orderBy("user_id", "session_id")
  }

  /** DAILY RETENTION COHORTS — the product-analytics staple: per day,
    * distinct active users, how many of them return the next day, and
    * the day-1 retention rate. Shape: ONE distinct pass reduces the
    * event stream to (day, user) — at 100 TB the only corpus-sized
    * shuffle, and partial aggregation shrinks it map-side first — then
    * the self-semi-join on (user, day+1) and the per-day counts run
    * over the reduced frame (days × daily-active rows, orders of
    * magnitude smaller than events). The last day retains 0 by
    * construction (no next day in the data), which the rate reflects
    * honestly rather than dropping the row.
    */
  def q93RetentionCohorts(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val active = daily.groupBy("day").agg(count(lit(1)).as("n_active"))
    val retained = daily
      .join(daily.select(date_sub(col("day"), 1).as("day"), col("user_id")),
        Seq("day", "user_id"), "left_semi")
      .groupBy("day").agg(count(lit(1)).as("n_retained"))
    active.join(retained, Seq("day"), "left")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_active"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        r4(coalesce(col("n_retained"), lit(0L)).cast("double")
          / col("n_active").cast("double")).as("retention_rate"))
      .orderBy("day")
  }

  /** Strict-order conversion FUNNEL view → click → purchase: a user
    * converts a stage only with an event at-or-after their previous
    * stage's first timestamp (a click before the first view does not
    * count). One exchange on user_id serves all three stacked window
    * minima — each stage's `min(when(...))` references the previous
    * stage's column, and Catalyst plans the three Window operators
    * over the same partitioning with no re-shuffle. The per-user
    * triple then reduces to one row of stage counts + conversion
    * rates. At 100 TB: one keyed shuffle of the events table, then a
    * partial-aggregated global fold — no per-user driver logic.
    */
  def q96EventFunnel(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    Tables.events(s, d)
      .withColumn("v",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("c",
        min(when(col("event_type") === "click" && col("ts") >= col("v"),
          col("ts"))).over(w))
      .withColumn("p",
        min(when(col("event_type") === "purchase" && col("ts") >= col("c"),
          col("ts"))).over(w))
      .select(col("user_id"), col("v"), col("c"), col("p")).distinct()
      .agg(
        count(lit(1)).as("n_users"),
        count(col("v")).as("n_view"),
        count(col("c")).as("n_click_after_view"),
        count(col("p")).as("n_purchase_after_click"),
        r4(when(count(col("v")) === 0L, lit(null))
          .otherwise(count(col("c")).cast("double") / count(col("v"))))
          .as("view_to_click"),
        r4(when(count(col("c")) === 0L, lit(null))
          .otherwise(count(col("p")).cast("double") / count(col("c"))))
          .as("click_to_purchase"))
  }

  /** The click→purchase candidate pairs behind [[q97ClickAttribution]]
    * and the stream-stream interval join
    * ([[graft.streaming.StreamingOps.attributionPairsStream]]): every
    * (purchase, click) of the same user with the click inside the
    * look-back horizon ending at the purchase. Equality key user_id →
    * hash join; the time band is a join-condition filter, never a
    * nested loop. Both inputs must carry (user_id, event_id, ts).
    * ONE source for the join condition — q97's LEFT report, the
    * stream-stream twin and any future consumer can't drift on the
    * band's inclusivity.
    */
  def attributionPairs(purchases: DataFrame, clicks: DataFrame,
      horizonMinutes: Int = 60, joinType: String = "inner"): DataFrame = {
    val p = purchases.select(col("user_id"),
      col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    val c = clicks.select(col("user_id").as("c_user_id"),
      col("event_id").as("click_id"), col("ts").as("click_ts"))
    val joined = p.join(c,
      expr(s"""user_id = c_user_id AND click_ts <= purchase_ts
              | AND click_ts >= purchase_ts - INTERVAL $horizonMinutes MINUTES
              |""".stripMargin.replace('\n', ' ')), joinType)
    // normalized the way Spark's own JoinType.apply does, so every
    // alias it accepts ("leftanti", "LEFT ANTI", …) routes correctly
    joinType.toLowerCase.replace("_", "").replace(" ", "") match {
      // existence forms keep only the purchase side (no click columns
      // survive an anti/semi join) — same condition, negated/tested
      case "leftanti" | "leftsemi" | "anti" | "semi" =>
        joined.select(col("purchase_id"), col("user_id"), col("purchase_ts"))
      case _ =>
        joined.select(col("purchase_id"), col("click_id"), col("user_id"),
          col("click_ts"), col("purchase_ts"))
    }
  }

  /** Trailing event-time window per user — the RANGE frame (every
    * other window in the engine uses ROWS frames or whole-partition
    * frames; this is the value-based one): for each event, the count
    * and exact value-sum of the same user's events in the preceding
    * hour INCLUDING peers at the same timestamp (RANGE semantics make
    * tie order irrelevant — the frame is defined by the ORDER BY
    * value, so the result is deterministic even with duplicate
    * timestamps, where a ROWS frame would depend on tie-break). The
    * frame bound is integer microseconds and the sum runs on integer
    * cents: bit-exact across engines, no double accumulation anywhere.
    * One exchange on user_id; at 100 TB the frame state per partition
    * is bounded by events-per-hour×user, not history.
    */
  def q100TrailingWindow(s: SparkSession, d: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-hourUs, 0L)
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"),
        cents(col("value")).as("value_c"))
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        fromCents(sum("value_c").over(w)).as("sum_value_1h"))
      .orderBy("event_id")
  }

  /** Multi-touch click ATTRIBUTION per purchase: how many clicks by
    * the same user landed in the hour before each purchase, with the
    * gap band (min/max seconds). LEFT join keeps zero-click purchases
    * (n_clicks_1h = 0, null gaps) — the report row a marketer asks
    * about first. Same-plan shape as the stream-stream interval join
    * twin in StreamingOps; q42 is the LAST-click (as-of) variant.
    */
  def q97ClickAttribution(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    attributionPairs(
      ev.where(col("event_type") === "purchase"),
      ev.where(col("event_type") === "click"),
      joinType = "left")
      .withColumn("gap_s",
        expr("(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000"))
      .groupBy("purchase_id", "user_id")
      .agg(
        count(col("click_id")).as("n_clicks_1h"),
        min("gap_s").as("min_gap_s"),
        max("gap_s").as("max_gap_s"))
      .orderBy("purchase_id")
  }

  /** Daily RESAMPLE + forward fill per user — the time-series
    * regularization pass (gaps-and-islands): take each user's LAST
    * event value per day (deterministic by (µs, event_id)), expand the
    * user's observed day span to a dense daily grid
    * (`sequence(min_day, max_day)` — generation is per-ROW, no
    * cross-row shuffle), and carry the last observation across gap
    * days with the FILL-GROUP trick: a running count of non-null
    * observations partitions each user's timeline into islands led by
    * exactly one observed row, so `max` over (user, island) IS the
    * forward fill — order-free, engine-portable, no
    * last_value(IGNORE NULLS) semantics to disagree on. The carried
    * value is copied, never recomputed — no float arithmetic anywhere.
    *
    * Scale: everything keys on user_id (grid size = span-days × users,
    * emitted map-side); both windows share one user-keyed exchange. A
    * user's state is their day span, never the event count.
    */
  def q112ResampleFfill(s: SparkSession, d: String): DataFrame = {
    val wLast = Window.partitionBy("user_id", "day")
      .orderBy(col("us").desc, col("event_id").desc)
    val obs = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day"), col("value").as("obs_value"))
    val grid = obs.groupBy("user_id")
      .agg(min("day").as("d0"), max("day").as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val wCum = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "day"), "left")
      .withColumn("fill_group", count("obs_value").over(wCum))
      .withColumn("value_ffill",
        max("obs_value").over(Window.partitionBy("user_id", "fill_group")))
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("obs_value").isNotNull.as("observed"),
        col("value_ffill"))
      .orderBy("user_id", "day")
  }

  /** UNATTRIBUTED purchases — the NEGATION pattern (NOT EXISTS over an
    * interval): purchases with no same-user click in the look-back
    * hour, as a LEFT ANTI interval join through the SAME
    * [[attributionPairs]] condition q97 and the stream-stream twin
    * use. Plan: equality key user_id → shuffled anti hash join with
    * the time band as the join-condition residual — the anti twin of
    * q17's equality-only NOT EXISTS, and informationally the
    * n_clicks_1h = 0 slice of q97 produced WITHOUT aggregating the
    * pair space (the anti join short-circuits on the first witness,
    * never counts).
    */
  def q111UnattributedPurchases(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    attributionPairs(
      ev.where(col("event_type") === "purchase"),
      ev.where(col("event_type") === "click"),
      joinType = "left_anti")
      .select(col("purchase_id"), col("user_id"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"))
      .orderBy("purchase_id")
  }

  /** TEMPORAL train/eval split with a user-level leakage guard (q144) —
    * the time-based counterpart of the hash split (q67), holdout (q99)
    * and component split (q82): evaluation data must postdate training
    * data, and a USER whose activity straddles the cutoff leaks
    * behavioral signal across the boundary (their train-side events
    * predict their own eval-side events), so the split is decided at
    * user granularity — `train` iff ALL the user's events precede the
    * cutoff, `eval` iff ALL follow it, `excluded` otherwise. The
    * excluded band is the price of leakage-freedom; its size (vs a
    * leaky event-level cut) is exactly what this query reports.
    *
    * Cutoff = min + (max − min)·8 div 10 over event-time microseconds —
    * exact BIGINT arithmetic end to end (unix_micros here, epoch_us in
    * the oracle; no float time math anywhere), the q100 discipline.
    * Plan: one user-keyed agg over one scan + the single-row bounds
    * frame cross-joined in (q120's documented pattern) — nothing at
    * event cardinality crosses the wire twice.
    */
  def q144TemporalSplit(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val bounds = e.agg(min("us").as("lo"), max("us").as("hi"))
      .select(expr("lo + ((hi - lo) * 8L) div 10L").as("cut"))
    e.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        min("us").as("first_us"), max("us").as("last_us"))
      .crossJoin(broadcast(bounds))
      .select(col("user_id"), col("n_events"), col("first_us"),
        col("last_us"),
        when(col("last_us") < col("cut"), "train")
          .when(col("first_us") >= col("cut"), "eval")
          .otherwise("excluded").as("split"))
      .orderBy("user_id")
  }
}
