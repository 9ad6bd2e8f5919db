package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.Round._

/** Relational operator coverage: scans with pushdown, projections,
  * filters, inner/broadcast/multi-way joins, hash aggregation (plain,
  * distinct, rollup), window functions (ranking, running frames, shares),
  * sorts, top-k, set operations, semi/anti joins, scalar date/string
  * functions.
  *
  * Conventions shared with the DuckDB oracle (see SparkEntry.oracleSql):
  *  - every query ends with a deterministic ORDER BY over a unique key;
  *  - money aggregates run on exact integer cents (graft.functions.Round)
  *    — results are EXACT, hence invariant to partition count and
  *    summation order (a plain double sum is not);
  *  - any remaining double is rounded with the engine-portable
  *    floor-based rounding, never Spark's decimal-string `round`;
  *  - integer-ish outputs are cast to long (DuckDB: BIGINT).
  *
  * Scale notes (the 100 TB lens): joins against small dimensions
  * (region/nation/customer/part/supplier) are broadcast — no shuffle of
  * the fact table; fact-fact joins (orders⨝lineitem) shuffle on the join
  * key once, and AQE coalesces post-shuffle partitions. Aggregations are
  * partial+final (map-side combine) automatically via HashAggregateExec.
  * Cent-sums use longs: overflow headroom is ~9e18, i.e. ~9e11 dollars of
  * charge-sum per group — beyond that swap the final sum to DecimalType.
  */
object Relational {

  /** lineitem with exact cent columns attached. */
  private def lineitemCents(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("qty_c", cents(col("l_quantity")))
      .withColumn("price_c", cents(col("l_extendedprice")))
      .withColumn("disc_c", cents(col("l_discount")))
      .withColumn("tax_c", cents(col("l_tax")))
      .withColumn("net_c", col("price_c") * (lit(100L) - col("disc_c")))

  /** TPC-H Q1-style pricing summary: scan → filter (pushed to parquet) →
    * hash agg (partial+final) → sort. One shuffle, exact integer sums.
    */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    lineitemCents(s, d)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        fromCents(sum("qty_c")).as("sum_qty"),
        fromCents(sum("price_c")).as("sum_base_price"),
        r2(sum("net_c").cast("double") / lit(10000.0)).as("sum_disc_price"),
        r2(sum(col("net_c") * (lit(100L) + col("tax_c"))).cast("double") / lit(1000000.0)).as("sum_charge"),
        r4(sum("qty_c").cast("double") / (lit(100.0) * count(lit(1)))).as("avg_qty"),
        r4(sum("price_c").cast("double") / (lit(100.0) * count(lit(1)))).as("avg_price"),
        r4(sum("disc_c").cast("double") / (lit(100.0) * count(lit(1)))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Projection + selective filter; both predicate and the read schema
    * push down to the parquet scan. net_price is exact (integer cents /
    * 10^4 — a 4-decimal value, no rounding needed).
    */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    lineitemCents(s, d)
      .filter(
        col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_quantity") > lit(45.0))
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"),
        (col("net_c").cast("double") / lit(10000.0)).as("net_price"))
      .orderBy("l_orderkey", "l_linenumber")

  /** customer ⨝ orders ⨝ lineitem revenue rollup per customer.
    * orders⨝lineitem is the fact-fact shuffle join; the customer dim is
    * broadcast so the join result never reshuffles on c_custkey.
    */
  def q03CustomerRevenue(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val l = lineitemCents(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(c("c_custkey"), c("c_name"))
      .agg(
        r2(sum("net_c").cast("double") / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("c_custkey")
  }

  /** Broadcast-join lineitem against the part dimension; revenue per brand. */
  def q04BrandRevenue(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    val l = lineitemCents(s, d)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(p("p_brand"))
      .agg(
        r2(sum("net_c").cast("double") / lit(10000.0)).as("revenue"),
        fromCents(sum("qty_c")).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** TPC-H Q5-style 5-way join: region ⨝ nation ⨝ customer ⨝ orders ⨝
    * lineitem, revenue per (region, nation). Every dimension chain is
    * broadcast; the only shuffles are orders⨝lineitem and the final agg.
    */
  def q05NationRevenue(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d)
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val l = lineitemCents(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name"), n("n_name"))
      .agg(
        r2(sum("net_c").cast("double") / lit(10000.0)).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Top-3 orders per customer by total price: ranking window with a
    * deterministic tie-break on the unique key.
    */
  def q06TopOrdersPerCustomer(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rk")
  }

  /** ROLLUP aggregation over (returnflag, linestatus) with subtotal and
    * grand-total rows (NULL grouping keys sorted first, matching the
    * oracle's NULLS FIRST).
    */
  def q07Rollup(s: SparkSession, d: String): DataFrame =
    lineitemCents(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_items"),
        fromCents(sum("qty_c")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Distinct aggregation: per market segment, distinct nations and
    * balance stats over the customer dimension.
    */
  def q08SegmentStats(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .withColumn("bal_c", cents(col("c_acctbal")))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        countDistinct(col("c_nationkey")).as("n_nations"),
        r4(sum("bal_c").cast("double") / (lit(100.0) * count(lit(1)))).as("avg_bal"),
        fromCents(min("bal_c")).as("min_bal"),
        fromCents(max("bal_c")).as("max_bal"))
      .orderBy("c_mktsegment")

  /** Set operations: customers with high balance vs customers that have
    * orders — INTERSECT / EXCEPT / reverse-EXCEPT, tagged and unioned.
    */
  def q09SetOps(s: SparkSession, d: String): DataFrame = {
    val highBal = Tables.customer(s, d).filter(col("c_acctbal") > 5000.0)
      .select(col("c_custkey").as("k"))
    val hasOrder = Tables.orders(s, d).select(col("o_custkey").as("k")).distinct()
    highBal.intersect(hasOrder).select(lit("both").as("tag"), col("k"))
      .unionByName(highBal.except(hasOrder).select(lit("high_bal_only").as("tag"), col("k")))
      .unionByName(hasOrder.except(highBal).select(lit("order_only").as("tag"), col("k")))
      .orderBy("tag", "k")
  }

  /** Global top-k: ORDER BY ... LIMIT compiles to TakeOrderedAndProject —
    * no global sort materialization, each partition keeps k rows.
    */
  def q10TopOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .limit(10)

  /** Scalar date/string function coverage: year/month/day extraction,
    * date formatting, substring, upper/lower, concat, length, CASE.
    */
  def q11ScalarFunctions(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 100 === 0)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date_str"),
        upper(col("o_orderstatus")).as("status_u"),
        lower(col("o_orderpriority")).as("prio_l"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("tagged"),
        length(col("o_orderpriority")).cast("long").as("prio_len"),
        when(col("o_totalprice") > 250000.0, lit("big"))
          .when(col("o_totalprice") > 100000.0, lit("mid"))
          .otherwise(lit("small")).as("size_class"))
      .orderBy("o_orderkey")

  /** Window-over-aggregate: per (year, priority) order counts and each
    * priority's share of its year (sum window partitioned by year).
    * Exact integer division — engine-identical bits.
    */
  def q12PriorityShare(s: SparkSession, d: String): DataFrame = {
    val agg = Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
    val w = Window.partitionBy("o_year")
    agg
      .withColumn("share", r4(col("n_orders").cast("double") / sum("n_orders").over(w).cast("double")))
      .orderBy("o_year", "o_orderpriority")
  }

  /** Correlated-subquery shape: orders priced >1.2× their customer's
    * average order value. Expressed as an unordered window aggregate over
    * exact cents (deterministic regardless of row arrival order — a
    * double window-sum would not be).
    */
  def q18AboveAvgOrders(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
    Tables.orders(s, d)
      .withColumn("cust_avg",
        sum(cents(col("o_totalprice"))).over(w).cast("double")
          / (lit(100.0) * count(lit(1)).over(w)))
      .filter(col("o_totalprice") > lit(1.2) * col("cust_avg"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        r2(col("cust_avg")).as("cust_avg"))
      .orderBy("o_orderkey")
  }

  /** Scalar math-function coverage, restricted to operations with exact
    * IEEE semantics (sqrt is correctly-rounded; ceil/floor/abs/sign/mod
    * are exact) so both engines produce identical bits — libm-dependent
    * functions (exp/ln/pow) intentionally excluded from the oracle-gated
    * surface.
    */
  def q19MathFunctions(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 500 === 0)
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"),
        sqrt(col("l_quantity")).as("qty_sqrt"),
        abs(col("l_discount") - lit(0.05)).as("disc_dev"),
        ceil(col("l_extendedprice") / lit(1000.0)).as("price_k_ceil"),
        floor(col("l_extendedprice") / lit(1000.0)).as("price_k_floor"),
        signum(col("l_quantity") - lit(25.0)).cast("long").as("qty_sign"),
        (col("l_orderkey") % 7).as("key_mod7"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"),
        greatest(col("l_tax"), col("l_discount")).as("max_rate"),
        least(col("l_tax"), col("l_discount")).as("min_rate"))
      .orderBy("l_orderkey", "l_linenumber")

  /** CUBE aggregation: all grouping-set combinations over
    * (returnflag, linestatus).
    */
  def q28CubeAgg(s: SparkSession, d: String): DataFrame =
    lineitemCents(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_items"),
        fromCents(sum("qty_c")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Deterministic hash sampling: keep a row iff a hash of its unique
    * key falls in the sample bucket — reproducible across runs, engines,
    * and partition layouts (unlike `df.sample`, whose outcome depends on
    * the partitioning), which is what makes sampled debugging runs
    * meaningful at 100 TB. ~25% rate here (md5 first hex digit ≡ 0
    * mod 4); aggregates over the sample use the usual exact-cents rules.
    */
  def q52HashSample(s: SparkSession, d: String): DataFrame =
    lineitemCents(s, d)
      .filter(ascii(substring(md5(concat(col("l_orderkey"), lit("-"), col("l_linenumber"))), 1, 1)) % 4 === 0)
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_sampled"),
        fromCents(sum("qty_c")).as("sum_qty"),
        countDistinct(col("l_orderkey")).as("n_orders"))
      .orderBy("l_returnflag")

  /** The SQL-API surface, exercised end-to-end: ONE engine-portable SQL
    * string (TPC-H Q5's shape — region-gated nation revenue where
    * supplier and customer share a nation, a 6-table join) evaluated by
    * `spark.sql` on this engine AND verbatim by the DuckDB oracle. The
    * braces are Spark 4 parameterized-table references (`args` binds
    * them to DataFrames — no temp-view registration, so concurrent
    * Verify threads can't race on view names); [[q98Oracle]] strips
    * them to plain table names for DuckDB. Everything inside is the
    * project's portable dialect: exact cents, floor-rounding, TIMESTAMP
    * literals. Catalyst treats the parsed plan identically to the
    * DataFrame API — the small dimensions broadcast size-based, the
    * orders⨝lineitem fact join shuffles once on the key.
    *
    * Binding: each brace resolves to a dir-scoped TEMP VIEW (name
    * carries the fixture dir's hash, so concurrent Verify threads on
    * the same dir re-register an identical definition — benign — and
    * different dirs never collide). Spark 4's parameterized `sql(text,
    * args)` was measured to lit-convert Map values, so DataFrames
    * can't bind as table args on the Scala API; the catalog route is
    * the supported one.
    *
    * SQL-TEXT TYPE TRAP (the r6 red row): Spark's SQL PARSER types
    * `100.0` as DECIMAL(4,1) — unlike the DataFrame API, where
    * `lit(100.0)` is DOUBLE — and SQL `floor(DOUBLE)` returns BIGINT,
    * so the r6 revenue expression `floor(x*100.0+0.5)/100.0` was
    * BIGINT/DECIMAL ⇒ DECIMAL(27,6) on the engine side while DuckDB
    * produced DOUBLE. Pandas normalizes both to float64 (rows/schema
    * "matched"), but the driver's hash sees the physical type.
    * The expression below therefore (a) rounds to cents in EXACT
    * BIGINT arithmetic — `s+50 - (s+50)%100` is 100·⌊(s+50)/100⌋, the
    * half-up cent rounding of the 10^-4-dollar sum, no floating
    * intermediate at all — and (b) divides with both operands CAST to
    * DOUBLE explicitly, so both parsers type every node identically
    * and the single IEEE division is bit-deterministic across engines.
    */
  val q98SqlTemplate: String =
    s"""WITH lc AS (SELECT l_orderkey, l_suppkey,
       |  ${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")}) AS net_c
       | FROM {lineitem})
       |SELECT n_name,
       | CAST(sum(net_c) + 50 - ((sum(net_c) + 50) % 100) AS DOUBLE)
       |   / CAST(10000.0 AS DOUBLE) AS revenue,
       | count(*) AS n_items
       |FROM {region}
       | JOIN {nation} ON n_regionkey = r_regionkey
       | JOIN {customer} ON c_nationkey = n_nationkey
       | JOIN {orders} ON o_custkey = c_custkey
       | JOIN lc ON l_orderkey = o_orderkey
       | JOIN {supplier} ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** The same text with table references resolved for the oracle. */
  val q98Oracle: String =
    q98SqlTemplate.replaceAll("""\{(\w+)\}""", "$1")

  def q98SqlRevenue(s: SparkSession, d: String): DataFrame = {
    // md5 of the dir, not String.hashCode: view names must not collide
    // across dirs even adversarially (two concurrent q98 calls on
    // colliding dirs would race on the shared catalog entry)
    val suffix = java.util.UUID
      .nameUUIDFromBytes(d.getBytes("UTF-8")).toString.take(8)
    val tables = Seq("lineitem", "region", "nation", "customer",
      "orders", "supplier")
    val sql = tables.foldLeft(q98SqlTemplate) { (q, t) =>
      val view = s"q98_${t}_$suffix"
      Tables.load(s, d, t).createOrReplaceTempView(view)
      q.replace(s"{$t}", view)
    }
    s.sql(sql)
  }

  /** Semi join: customers having at least one large order (EXISTS). */
  def q16CustomersWithBigOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
    Tables.customer(s, d)
      .join(big, col("c_custkey") === big("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  /** Anti join: customers with no orders at all (NOT EXISTS). */
  def q17CustomersNoOrders(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    Tables.customer(s, d)
      .join(o, col("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_custkey")
  }

  /** Left outer join with null-side aggregation: every customer with
    * their order count and revenue — 0 / 0.0 for customers without
    * orders (count of the null-extended column skips nulls; the sum
    * coalesces).
    */
  def q36LeftOuterOrders(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .withColumn("price_c", cents(col("o_totalprice")))
    Tables.customer(s, d)
      .join(o, col("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy("c_custkey", "c_name")
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        fromCents(coalesce(sum("price_c"), lit(0L))).as("total_spent"))
      .orderBy("c_custkey")
  }

  /** Full outer join: per-nation high-balance customer counts vs
    * supplier counts — nations appearing on either side survive, with
    * nulls made explicit via coalesce.
    */
  def q37FullOuterNation(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .filter(col("c_acctbal") > 8000.0)
      .groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_rich_customers"))
    val sup = Tables.supplier(s, d)
      .groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_suppliers"))
    c.join(sup, col("nk_c") === col("nk_s"), "full_outer")
      .select(
        coalesce(col("nk_c"), col("nk_s")).cast("long").as("nationkey"),
        coalesce(col("n_rich_customers"), lit(0L)).as("n_rich_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
      .orderBy("nationkey")
  }
}
