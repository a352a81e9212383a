package graft.operators

import graft.{Canon, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.4 E1–E15): scans with
  * pushdown, every join shape, hash aggregation, grouping sets, windows,
  * top-k, set ops, scalar functions.
  *
  * Scale posture: no collects, dimension tables broadcast explicitly,
  * fact-fact joins shuffle on their keys (AQE re-plans at runtime), every
  * query ends in an explicit total order (unique tie-break) purely for the
  * deterministic oracle hash — the orders are on already-reduced outputs,
  * never on the raw fact table (except e01, which is a row-level scan
  * whose sort is the query's own semantics).
  */
object Relational {
  import Canon._

  /** E1 — parquet scan + projection + predicate. Both the shipdate range
    * and the discount predicate reach the parquet reader (PushedFilters),
    * and only 5 of 11 columns are read (ReadSchema). */
  def scanFilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"),
        dateStr(col("l_shipdate")).as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber")

  /** E2 — dim⋈fact broadcast hash joins: orders ⋈ customer ⋈ nation.
    * Both dims are broadcast explicitly — zero shuffle of the fact side
    * until the final order. */
  def broadcastJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("o_orderkey"), col("c_name"), col("n_name"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** E3 — large-key shuffle join lineitem ⋈ orders + aggregation.
    * Both sides shuffle on the order key; AQE picks SMJ/SHJ. */
  def shuffleJoinAgg(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("o_orderpriority")
  }

  /** E4 — left outer join: order counts per customer including zeroes. */
  def leftOuterJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_big_orders"),
        dsum(coalesce(col("o_totalprice"), lit(0.0))).as("big_total"))
      .orderBy("c_custkey")
  }

  /** E4b — right outer join: the mirror of [[leftOuterJoin]] with the
    * fact side on the left, preserving every customer from the right —
    * same result contract, the join shape Spark plans when the preserved
    * side arrives second. */
  def rightOuterJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000.0)
    o.join(c, o("o_custkey") === c("c_custkey"), "right_outer")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(col("o_orderkey")).as("n_big_orders"),
        dsum(coalesce(col("o_totalprice"), lit(0.0))).as("big_total"))
      .orderBy("c_custkey")
  }

  /** E5 — full outer join of two disjoint-filtered aggregates. */
  def fullOuterJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val f = o.filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_f"))
    val p = o.filter(col("o_orderstatus") === "O")
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_o"))
    f.join(p, Seq("k"), "full_outer")
      .select(col("k"), coalesce(col("n_f"), lit(0L)).as("n_f"),
        coalesce(col("n_o"), lit(0L)).as("n_o"))
      .orderBy("k")
  }

  /** E5b — left semi + left anti (the stop-word pattern generalized):
    * customers with / without a high-value order, tagged and unioned. */
  def semiAntiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val hi = Tables.orders(s, d).filter(col("o_totalprice") > 350000.0)
    val semi = c.join(hi, c("c_custkey") === hi("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("semi").as("op"))
    val anti = c.join(hi, c("c_custkey") === hi("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("anti").as("op"))
    semi.unionAll(anti).orderBy("op", "c_custkey")
  }

  /** E6 — non-equi range join: event pairs of the same user within a
    * 10-minute window.
    *
    * Scale design: `user_id` has cardinality ~tens (FIXTURES.md), so a
    * plain equi-join on `user_id` alone would concentrate ALL work on ~30
    * shuffle keys — a skew killer at 100× data. We add a coarse 10-minute
    * time bucket to the join key: the probe side (`a`) is exploded into
    * its own bucket and the next one (any b with `a.ts < b.ts ≤
    * a.ts+10min` lands in exactly one of those two), so each (a,b) pair
    * matches exactly once, the range predicate stays as a residual filter,
    * and shuffle parallelism scales with time span × users instead of
    * users alone. */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    def bucket(c: org.apache.spark.sql.Column) = floor(unix_timestamp(c) / 600L)
    val a = e.select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
      .withColumn("bkt", explode(array(bucket(col("a_ts")), bucket(col("a_ts")) + 1)))
    val b = e.select(col("user_id").as("b_user"), col("event_id").as("b_id"),
        col("ts").as("b_ts"))
      .withColumn("b_bkt", bucket(col("b_ts")))
    a.join(b, col("user_id") === col("b_user") && col("bkt") === col("b_bkt") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("a_id")).as("n_heads"))
      .orderBy("user_id")
  }

  /** E7 — pricing summary (TPC-H Q1 shape): multi-key hash aggregation
    * with sum/avg/min/max/count. Partial aggregation runs map-side
    * (HashAggregate Partial→Final), so the shuffle carries ≤ #groups×
    * #partitions rows regardless of input size. */
  def pricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1999-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_extendedprice")).as("max_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** E8 — distinct aggregation (exact). */
  def distinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** E8b — approx_count_distinct (HLL++). No SQL oracle (estimator is
    * engine-specific); RelationalSpec."approx_count_distinct stays within
    * tolerance of exact" asserts approx vs exact on both output columns. */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy("l_returnflag")

  /** E8c — exact percentiles (sort-based aggregate): quartiles of
    * `l_quantity` per return flag. `percentile` with linear interpolation
    * over small integers yields values exactly representable in binary
    * (k or k.5 here), and Spark and DuckDB (`quantile_cont`) implement
    * the same standard interpolation — verified cross-engine. The
    * approx variant for 100 TB is e09b's sketch pattern. */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("q25"),
        expr("percentile(l_quantity, 0.5)").as("median"),
        expr("percentile(l_quantity, 0.75)").as("q75"),
        round4(expr("percentile(l_extendedprice, 0.5)")).as("price_median"))
      .orderBy("l_returnflag")

  /** E44 — WEIGHTED quantiles: per supplier, the quantity-weighted
    * quartiles of unit price — "half the VOLUME moved at or below this
    * price", the distribution question behind VWAP bands, spend
    * analysis, and cost curves, which the unweighted `percentile` (E9c)
    * cannot answer and Spark has no builtin for.
    *
    * Semantics (exact, interpolation-free — deliberately): the weighted
    * p-quantile is the smallest price whose cumulative weight reaches
    * p·total. Cumulative weights are EXACT decimal sums (the inputs are
    * doubles; a double cumsum would be order-dependent FP the oracle
    * can't pin — Canon.dsum's rule applied to a window), and the
    * crossing comparison `cumw·k ≥ total·j` is integer-scaled decimal
    * arithmetic, identical in both engines. Price ties make the
    * crossing ROW engine-dependent but never the crossing PRICE (all
    * candidates share it), and the selected prices are raw input
    * doubles — bit-identical cross-engine, so no rounding canon is
    * needed (round4's own caveat).
    *
    * Scale: ONE window partitioning (l_suppkey — key column, high
    * cardinality, lint-safe) carries the cumulative sum; the quartile
    * pick is a conditional-min aggregate over the same shuffle, and the
    * map-side-combining group totals ride a frameless window on the
    * identical partitioning — one exchange end to end. */
  def weightedQuantiles(s: SparkSession, d: String): DataFrame =
    weightedQuantilesOver(Tables.lineitem(s, d)
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_quantity")))

  /** [[weightedQuantiles]] over any (l_suppkey, l_extendedprice,
    * l_quantity) frame — split out so specs can plant hand-computable
    * weight distributions, ties, and single-row groups. */
  private[graft] def weightedQuantilesOver(li: DataFrame): DataFrame = {
    val t = li
      .select(col("l_suppkey"), col("l_extendedprice").as("price"),
        dec(col("l_quantity")).as("w"))
    val cum = Window.partitionBy("l_suppkey").orderBy("price")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy("l_suppkey")
    t.select(col("l_suppkey"), col("price"),
        sum(col("w")).over(cum).as("cumw"),
        sum(col("w")).over(all).as("tot"))
      .groupBy("l_suppkey")
      .agg(
        count(lit(1)).as("n_items"),
        max(col("tot")).cast("double").as("total_qty"),
        min(when(col("cumw") * 4 >= col("tot"), col("price"))).as("wq1"),
        min(when(col("cumw") * 2 >= col("tot"), col("price"))).as("w_median"),
        min(when(col("cumw") * 4 >= col("tot") * 3, col("price"))).as("wq3"))
      .orderBy("l_suppkey")
  }

  /** E14b — ANSI-safe `try_*` functions. Spark 4 runs ANSI mode by
    * default (overflow/bad-cast/div-zero THROW), so `try_divide` /
    * `try_cast` / `try_element_at` are the sanctioned null-on-error
    * variants a pipeline uses for dirty data; each column here exercises
    * one failure mode (division by zero, unparseable cast, out-of-bounds
    * index) plus the happy path. */
  def tryFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        expr("try_divide(p_retailprice, p_size - p_size)").as("div_zero"),
        // raw double division: a single IEEE op is bit-identical across
        // engines, while round4 here would round a value ~1e-15 from a
        // .00005 boundary differently (string-repr vs multiply rounding)
        expr("try_divide(p_retailprice, p_size)").as("price_per_size"),
        expr("try_cast(p_name AS INT)").as("name_as_int"),
        expr("try_element_at(split(p_name, ' '), 100)").as("tok100"),
        expr("try_add(p_size, 1)").cast("long").as("size_plus"))
      .orderBy("p_partkey")

  /** E9 — rollup over nation × order-year. */
  def rollupAgg(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("n_name"), year(col("o_orderdate")).cast("long").as("yr"),
        col("o_totalprice"))
      .rollup(col("n_name"), col("yr"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .orderBy(asc_nulls_first("n_name"), asc_nulls_first("yr"))
  }

  /** E9c — explicit GROUPING SETS (the third grouping-analytics shape
    * alongside rollup/cube, which can't express this asymmetric set):
    * totals per returnflag, per linestatus, and per ship-year — three
    * independent groupings in one pass over the fact table. */
  def groupingSets(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("ship_yr", year(col("l_shipdate")).cast("long"))
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq(col("ship_yr"))),
        col("l_returnflag"), col("l_linestatus"), col("ship_yr"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"),
        asc_nulls_first("ship_yr"))

  /** E9b — cube over returnflag × linestatus. */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** E10 — ranking windows: top-3 orders per customer. */
  def rankWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"), col("rnk"), col("drnk"))
      .orderBy("o_custkey", "rn")
  }

  /** E22 — the SQL front-end: the same engine driven entirely through
    * `spark.sql` over registered temp views (TPC-H Q5 shape — regional
    * revenue per nation-year). The DataFrame queries and this SQL share
    * one Catalyst pipeline, so broadcasts/partial-aggs/pushdown behave
    * identically; this entry pins that the SQL surface is wired up
    * (views, ANSI parsing, decimal canonicalization in SQL form). */
  def sqlFrontend(s: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders", "lineitem", "nation", "region")
      .foreach(n => Tables.t(s, d, n).createOrReplaceTempView(n))
    s.sql(
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  count(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
        |       AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY n_name, yr""".stripMargin)
  }

  /** E23 — correlated + scalar subqueries: customers with any order above
    * 1.5× the global average order price. Exercises Catalyst's subquery
    * machinery end-to-end — the scalar subquery becomes a broadcast
    * one-row plan and the correlated EXISTS is DECORRELATED into a left
    * semi join (never a per-row re-execution; the global no-cartesian
    * plan audit covers this query too). The average is a decimal-exact
    * sum/count so the comparison threshold is bit-identical across
    * engines — a double `avg` is order-dependent and could flip rows at
    * the boundary. */
  def correlatedSubquery(s: SparkSession, d: String): DataFrame = {
    Seq("customer", "orders")
      .foreach(n => Tables.t(s, d, n).createOrReplaceTempView(n))
    s.sql(
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_totalprice > 1.5 *
        |      (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
        |              / COUNT(*)
        |       FROM orders))
        |ORDER BY c_custkey""".stripMargin)
  }

  /** E10b — distribution windows: ntile / percent_rank / cume_dist per
    * customer (the quartile-bucketing shape of feature engineering).
    * percent_rank and cume_dist are exact small-integer ratios, but both
    * engines compute them as double divisions — round4 keeps the compare
    * insensitive to representation noise. */
  def distributionWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).cast("long").as("quartile"),
        round4(percent_rank().over(w)).as("pct_rank"),
        round4(cume_dist().over(w)).as("cume"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** E11 — analytic windows: lag/lead + running revenue per customer. */
  def analyticWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        dateStr(col("o_orderdate")).as("order_date"),
        col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        sum(dec(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** E11b — RANGE-framed window: trailing-30-day revenue per customer.
    * Unlike the ROWS frame in [[analyticWindow]], a RANGE frame bounds by
    * ORDER-BY *value* (all peers of a day enter together), so the frame
    * is insensitive to row order among ties — the day-number column makes
    * the offsets integral and identical across engines. */
  def rangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day_num"))
      .rangeBetween(-30, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("day_num",
        datediff(col("o_orderdate"), lit("1990-01-01")).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"), col("day_num"),
        sum(dec(col("o_totalprice"))).over(w).cast("double").as("rev_30d"),
        count(lit(1)).over(w).cast("long").as("n_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** E11c — value windows: first/last/nth order price per customer over
    * the full partition frame (first_value/last_value/nth_value are the
    * remaining window-function family after rank/analytic/distribution).
    * The frame must be explicitly unbounded-both-ways: last_value over
    * the default frame is just the current row. */
  def valueWindows(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(w).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** E24 — calendar densification (the date-spine pattern): one row per
    * month of the data's span, zero-filled where no orders exist — the
    * gap-free time series every dashboard needs. The spine is generated
    * (`sequence` + explode — a few dozen rows), never scanned, and the
    * spine⋈facts join broadcasts the spine. */
  def dateSpine(s: SparkSession, d: String): DataFrame = {
    val spine = s.range(1)
      .select(explode(expr(
        "sequence(to_date('1995-01-01'), to_date('2001-08-01'), interval 1 month)"))
        .as("month_start"))
    val counts = Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
    spine.join(counts, Seq("month_start"), "left_outer")
      .select(dateStr(col("month_start")).as("month_start"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy("month_start")
  }

  /** E25 — MapType construction and functions: per order-year, the
    * status→count map built with `map_from_entries` over sorted entries,
    * then consumed via map_keys / map_values / element_at / size. The
    * map itself can't cross the oracle hash (pandas can't sort it), so
    * the outputs are its deterministic scalar projections; entries are
    * sorted pre-construction, making key/value order well-defined. */
  def mapFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        col("o_orderstatus").as("st"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy("yr")
      .agg(map_from_entries(sort_array(collect_list(struct(col("st"), col("cnt")))))
        .as("m"))
      .select(col("yr"),
        size(col("m")).cast("long").as("n_statuses"),
        concat_ws(",", map_keys(col("m"))).as("statuses"),
        concat_ws(",", map_values(col("m"))).as("counts"),
        coalesce(element_at(col("m"), "F"), lit(0L)).as("n_f"))
      .orderBy("yr")

  /** E12 — total sort + limit: Catalyst plans TakeOrderedAndProject
    * (per-partition top-k + driver merge of k×partitions rows — never a
    * full global sort). */
  def topkOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(100)

  /** E13 — set operations on the F/O customer key sets, tagged+unioned
    * into one deterministic result.
    *
    * Plan: the naive form (intersect/except/union directly on two filtered
    * projections of `orders`) re-scans the fact table ~6× and shuffles 5×.
    * Here `orders` is scanned ONCE into a per-custkey flag aggregate
    * (one shuffle), which is cached — it is reduced data, one row per
    * customer with an F/O order, so caching is safe at any scale — and the
    * set-op API runs over the two tiny deduplicated key sets derived from
    * the flags. Results are identical (intersect/except are set-semantic,
    * so pre-deduplication via the groupBy changes nothing). */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val flags = Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("F", "O"))
      .groupBy(col("o_custkey").as("k"))
      .agg(max(col("o_orderstatus") === "F").as("has_f"),
        max(col("o_orderstatus") === "O").as("has_o"))
      .cache()
    val fk = flags.filter(col("has_f")).select("k")
    val ok = flags.filter(col("has_o")).select("k")
    val both = fk.intersect(ok).select(col("k"), lit("intersect").as("op"))
    val fOnly = fk.except(ok).select(col("k"), lit("except").as("op"))
    val all = fk.union(ok).distinct().select(col("k"), lit("union").as("op"))
    both.unionAll(fOnly).unionAll(all).orderBy("op", "k")
  }

  /** E13b (e15d) — BAG-semantics set operations: INTERSECT ALL / EXCEPT
    * ALL over the F/O order-key multisets (a customer with three F
    * orders contributes multiplicity 3). The multiplicity algebra —
    * `intersect all` keeps min(mₗ, mᵣ) copies, `except all` keeps
    * max(0, mₗ − mᵣ) — is exactly what Spark's `intersectAll`/
    * `exceptAll` operators compute; the registry form applies the e15
    * single-scan discipline instead: ONE scan of orders into per-key
    * (n_f, n_o) counts (one shuffle, map-side combined), then the
    * min/clamped-difference arithmetic on the reduced frame. Both the
    * planted-multiset spec and the corpus-wide differential spec pin
    * ≡ `intersectAll`/`exceptAll` (RelationalSpec), so the rewrite
    * can't drift from the primitives' bag semantics. Output grain is
    * (op, k, n multiplicity) — deterministic and oracle-hashable where
    * raw duplicate rows would not be. */
  def bagSetOps(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("F", "O"))
      .groupBy(col("o_custkey").as("k"))
      .agg(sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"))
    bagSetOpsFromCounts(counts)
  }

  /** The multiplicity kernel over a per-key (k, n_f, n_o) count frame —
    * package-visible for the planted-multiset spec. */
  private[graft] def bagSetOpsFromCounts(counts: DataFrame): DataFrame = {
    val ia = counts.filter(col("n_f") > 0 && col("n_o") > 0)
      .select(lit("intersect_all").as("op"), col("k"),
        least(col("n_f"), col("n_o")).as("n"))
    val ea = counts.filter(col("n_f") > col("n_o"))
      .select(lit("except_all").as("op"), col("k"),
        (col("n_f") - col("n_o")).as("n"))
    ia.unionAll(ea).orderBy("op", "k")
  }

  /** E14 — scalar function sweep: string / date / math / array. */
  def scalarFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        col("p_name").like("%steel%").as("is_steel"),
        regexp_extract(col("p_name"), "[aeiou]+", 0).as("first_vowels"),
        round2(col("p_retailprice") * 1.1).as("bumped_price"),
        abs(col("p_size") - 25).cast("long").as("size_dist"),
        size(split(col("p_name"), " ")).cast("long").as("n_name_tokens"),
        array_join(slice(sort_array(array_distinct(split(col("p_name"), " "))), 1, 3), ",")
          .as("first_tokens"))
      .orderBy("p_partkey")

  /** E14b — date functions on orders. */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mth"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        datediff(lit("2001-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2001"),
        dateStr(date_trunc("month", col("o_orderdate"))).as("month_start"))
      .orderBy("o_orderkey")

  /** E2b — multi-hop dim chain supplier→nation→region, both dims
    * broadcast, with `any_value` (F7 one_combiner) on a column that is
    * functionally dependent on the grouping key (`r_regionkey` is constant
    * per `r_name`), so the "arbitrary value per group" is deterministic
    * and oracle-checkable. */
  def regionSupplier(s: SparkSession, d: String): DataFrame = {
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    sup.join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(any_value(col("r_regionkey")).cast("long").as("region_key"),
        count(lit(1)).as("n_suppliers"),
        dsum(col("s_acctbal")).as("total_acctbal"))
      .orderBy("r_name", "n_name")
  }

  /** E7b — skew-safe two-stage salted aggregation: per-user event stats
    * computed as (user, salt)-partial aggregates then combined per user.
    *
    * `user_id` has cardinality ~tens, so a single groupBy concentrates
    * the whole table on ~30 shuffle keys (same hazard as E6); the salt
    * (16 buckets from xxhash64(event_id)) fans each hot key across 16
    * reducers in stage 1, and stage 2 combines 16 tiny partials per key.
    * Exact-decimal sums compose across stages, so the result is
    * bit-identical to the direct GROUP BY the oracle runs. */
  def saltedAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("salt", pmod(xxhash64(col("event_id")), lit(16)))
      .groupBy(col("user_id"), col("salt"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("v"),
        max(col("value")).as("mx"))
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_events"),
        sum(col("v")).cast("double").as("sum_value"),
        max(col("mx")).as("max_value"))
      .orderBy("user_id")

  /** E15b — pivot (F15 `array_container`: dense aggregation over a fixed
    * small key domain becomes columns): order counts and exact revenue
    * per year × status. Explicit value list so the plan is one pass (no
    * distinct-values pre-query) and the output schema is static. */
  def pivotOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(year(col("o_orderdate")).cast("long").as("yr"),
        col("o_orderstatus"), col("o_totalprice"))
      .groupBy(col("yr"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"))
      // pivot yields NULL counts for absent (yr, status) cells; the
      // oracle's count(*) FILTER yields 0 — normalize to 0 (sums stay
      // NULL-for-absent in both engines)
      .select(col("yr") +: Seq("F", "O", "P").flatMap(v => Seq(
        coalesce(col(s"${v}_n"), lit(0L)).as(s"${v}_n"), col(s"${v}_rev"))): _*)
      .orderBy("yr")

  /** E15c — unpivot/melt (pivot's inverse, the wide→long reshape every
    * feature pipeline needs): part attributes to (key, metric, value)
    * rows. One narrow Generate, no shuffle until the output sort. */
  def unpivotParts(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"),
        col("p_size").cast("double").as("size"),
        col("p_retailprice").as("retail_price"),
        length(col("p_name")).cast("double").as("name_len"))
      .unpivot(Array(col("p_partkey")),
        Array(col("size"), col("retail_price"), col("name_len")),
        "metric", "value")
      .orderBy("p_partkey", "metric")

  /** E13d — ordered string aggregation (LISTAGG/STRING_AGG): the
    * delimited-roster reshape reporting layers ask for constantly. Spark
    * has no ordered string_agg aggregate; the deterministic composition
    * is `array_sort(collect_set(...))` then `concat_ws` — distinct
    * membership (each nation once, not once per supplier, matching the
    * oracle's list_distinct) and sort AFTER collect so the result does
    * not depend on shuffle arrival order.
    * Per region: the nation roster and supplier stats through a
    * broadcast dim chain. Groups here are tiny; a group whose roster
    * could not fit one row (millions of members) is a modeling error for
    * this operator in any engine. */
  def stringAgg(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).select("r_regionkey", "r_name")
    val n = Tables.nation(s, d).select("n_nationkey", "n_regionkey", "n_name")
    val sup = Tables.supplier(s, d).select("s_nationkey", "s_acctbal")
    sup.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        concat_ws(",", array_sort(collect_set(col("n_name")))).as("nations"),
        count(lit(1)).as("n_suppliers"),
        dsum(col("s_acctbal")).as("total_acctbal"))
      .orderBy("r_name")
  }

  /** E7c — statistical aggregates: correlation, covariance and stddev of
    * lineitem quantity × price per return flag.
    *
    * Float discipline (p01's pattern, hardened): quantity and price are
    * 2-decimal values, so casting the INPUTS to DECIMAL(18,2) and
    * multiplying in decimal makes every co-moment sum (n, Σx, Σy, Σxy,
    * Σx², Σy²) exact and engine-identical. `dsum`-style rounding of the
    * double PRODUCTS would not be: p·p ~ 10¹⁰ means the ×10⁶ a
    * double→DECIMAL(30,6) cast computes exceeds 2⁵³, where DuckDB's
    * double-arithmetic conversion misrounds vs Spark's exact one
    * (observed: Σp² off by 1e-3). The derived stats then round at 4–8
    * decimals — their magnitudes stay ≤10⁵ where the rounding casts are
    * collision-free, which is also why the output carries stddev_price
    * rather than var_price (~10⁹ — large enough for the round4 cast
    * itself to become engine-divergent). Spark's native `corr` /
    * `covar_samp` / `stddev` stream co-moment updates in partition-merge
    * order — fine in a report, nondeterministic under a hash compare;
    * RelationalSpec pins native ≈ derived so the derivation is checked
    * against the builtins it stands in for. */
  def statsAgg(s: SparkSession, d: String): DataFrame = {
    val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        col("l_quantity").cast(dec2).as("x"),
        col("l_extendedprice").cast(dec2).as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("y") * col("y")).cast("double").as("syy"))
      .select(col("l_returnflag"), col("n"),
        round4(col("sx") / col("n")).as("mean_qty"),
        round4(col("sy") / col("n")).as("mean_price"),
        round4((col("sxy") - col("sx") * col("sy") / col("n")) / (col("n") - 1))
          .as("covar_qty_price"),
        round8((col("sxy") - col("sx") * col("sy") / col("n")) /
          (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
            sqrt(col("syy") - col("sy") * col("sy") / col("n"))))
          .as("corr_qty_price"),
        round4(sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)))
          .as("stddev_qty"),
        round4(sqrt((col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1)))
          .as("stddev_price"))
      .orderBy("l_returnflag")
  }

  /** E14d — array higher-order functions as USER surface (`exists` /
    * `forall` / `filter` / `transform` / `aggregate`): per order, the
    * quantity vector of its line items and HOF-derived facts. Arrays
    * here are tiny (≤7 elements), where the interpreted HOF execution
    * penalty (SURVEY §7.3) is irrelevant — hot million-element paths use
    * native expressions ([[graft.functions.CosineSimilarity]]) instead.
    * Deterministic array order via sort on (linenumber, quantity)
    * structs BEFORE projecting quantities — collect_list alone is
    * shuffle-arrival-ordered. The HOF sum runs over exact decimals
    * (order-independent), mirrored by DuckDB's list_sum over decimals. */
  def arrayHof(s: SparkSession, d: String): DataFrame = {
    val items = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(struct(col("l_linenumber"), col("l_quantity"))))
        .as("it"))
      .select(col("l_orderkey"),
        transform(col("it"), x => x.getField("l_quantity")).as("qs"))
    items.select(
      col("l_orderkey"),
      size(col("qs")).cast("long").as("n_items"),
      element_at(col("qs"), 1).as("first_qty"),
      exists(col("qs"), _ > 45.0).as("has_large"),
      forall(col("qs"), _ >= 10.0).as("all_ge10"),
      size(filter(col("qs"), _ >= 25.0)).cast("long").as("n_ge25"),
      // re-cast the merge result: decimal addition widens (30,6)+(30,6)
      // → (31,6), and the HOF's accumulator type must stay fixed
      aggregate(col("qs"), lit(0).cast(Dec), (acc, q) => (acc + q.cast(Dec)).cast(Dec))
        .cast("double").as("sum_qty"))
      .orderBy("l_orderkey")
  }

  /** E24b — time-series gap fill with last-observation-carried-forward:
    * per user, a DENSE daily spine over the user's active span, daily
    * sums where present, previous day's value carried into gaps via an
    * ignore-nulls running `last` — the resample/interpolate every
    * metrics pipeline needs downstream of e24's zero-fill densification.
    * Spine generation is per-user `sequence(min_day, max_day)` — dense
    * rows are generated distributed (explode), never on the driver; the
    * carry is one window over (user, day), partition-parallel by user.
    * Daily values are exact decimal sums, so the carried double is
    * engine-identical. */
  def locfFill(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .groupBy("user_id", "day").agg(dsum(col("value")).as("day_value"))
    val spine = daily.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), dateStr(col("day")).as("day"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled_value"),
        col("day_value").isNull.as("was_gap"))
      .orderBy("user_id", "day")
  }

  /** E43 — LINEAR-interpolation gap fill: the interpolating companion to
    * [[locfFill]] (E29). LOCF answers "what was the state on day t"
    * (step-function semantics — right for statuses and balances); linear
    * interpolation answers "what was the level on day t" for quantities
    * that accrue continuously (sensor readings, spend rates) — the fill
    * every feature-store backfill offers next to LOCF, and one Spark has
    * no builtin for (`last(ignoreNulls)` exists; bracketing interpolation
    * does not).
    *
    * Per user: the dense daily spine over the observed span (E29's
    * construction), then each gap day gets
    * `prev + (next − prev) · (day − prev_day)/(next_day − prev_day)`
    * where prev/next are the bracketing OBSERVED days — found with one
    * backward `last(ignoreNulls)` and one forward `first(ignoreNulls)`
    * window pair. Spine endpoints are observed by construction (min/max
    * of observed days), so every gap has both brackets — no
    * extrapolation case exists.
    *
    * Scale: all four window functions share ONE partitioning (user_id —
    * high-cardinality, lint-safe) and ONE sort (day), so Catalyst plans
    * a single Window node over a single exchange; the spine generation
    * is distributed (per-user `sequence`, never a driver loop). The
    * interpolation arithmetic is written with identical operand
    * association in the oracle (double throughout, round4 canon) — the
    * division is days/days, small-magnitude integers, per the e40
    * lesson. */
  def interpFill(s: SparkSession, d: String): DataFrame =
    interpFillOver(Tables.events(s, d))

  /** [[interpFill]] over any (user_id, ts, value) event frame — split
    * out so specs can plant a series with hand-computable gap values. */
  private[graft] def interpFillOver(ev: DataFrame): DataFrame = {
    val daily = ev
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .groupBy("user_id", "day").agg(dsum(col("value")).as("day_value"))
    val spine = daily.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val back = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("day_value").isNotNull, col("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("day_value"),
        last(col("day_value"), ignoreNulls = true).over(back).as("pv"),
        last(obsDay, ignoreNulls = true).over(back).as("pd"),
        first(col("day_value"), ignoreNulls = true).over(fwd).as("nv"),
        first(obsDay, ignoreNulls = true).over(fwd).as("nd"))
      .select(col("user_id"), dateStr(col("day")).as("day"),
        round4(when(col("day_value").isNotNull, col("day_value"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (datediff(col("day"), col("pd")).cast("double") /
              datediff(col("nd"), col("pd")).cast("double"))))
          .as("filled_value"),
        col("day_value").isNull.as("was_gap"))
      .orderBy("user_id", "day")
  }

  /** E14c — JSON extraction over events.props + timestamp scalars. */
  def jsonEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type").isin("error", "purchase"))
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        year(col("ts")).cast("long").as("yr"),
        date_format(col("ts"), "yyyy-MM-dd HH").as("event_hour"),
        col("value"))
      .orderBy("event_id")

  /** E10c — per-GROUP top-k: each user's 2 most frequent event types
    * (count desc, type asc tie-break) — the grouped complement of the
    * global top-k (E12). The ranking window runs over the AGGREGATED
    * (user, type) table, not raw events: the shuffle is the count
    * aggregation (map-side compacted), and the window partitions by
    * user_id — high-cardinality, each partition a handful of rows, so
    * no serial pass exists at any corpus size (contrast d28's
    * histogram trick, needed there because languages are FEW). */
  def topkPerGroup(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("n_events").desc, col("event_type").asc)
    counts.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 2)
      .orderBy("user_id", "rnk")
  }

  /** E31 — SCD Type-2 interval build: collapse an append-only event log
    * into the slowly-changing-dimension shape warehouses version
    * dimensions with — one row per (user, consecutive event_type run)
    * carrying `[valid_from, valid_to)` validity and an `is_current`
    * flag. Change detection is `lag(1)` (keep a row iff its type
    * differs from the previous row's), interval close is `lead(1)` over
    * the surviving change points, `version` is the per-user change
    * ordinal — the natural SCD2 surrogate ordering.
    *
    * Scale: all three windows share ONE partitioning (user_id) and ONE
    * sort order (ts, event_id — event_id is the unique tie-break, so
    * every window value is deterministic under timestamp ties), so the
    * plan pays a single exchange + sort; the lead/row_number pass runs
    * on the change points only (already reduced). Per-key windows
    * parallelize across users; a `lag(1)` chain is inherently
    * sequential WITHIN a key, which is the operator's semantics —
    * change detection cannot ignore order — so pathological single-key
    * skew (one bot user with 10⁹ events) is handled the e20b way:
    * pre-split such keys by a coarse time bucket and stitch the
    * bucket-boundary rows, not by a different operator. */
  def scd2Intervals(s: SparkSession, d: String): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val changes = Tables.events(s, d)
      .select("user_id", "event_id", "ts", "event_type")
      .withColumn("prev", lag(col("event_type"), 1).over(ord))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changes
      .withColumn("valid_to_ts", lead(col("ts"), 1).over(ord))
      .withColumn("version", row_number().over(ord).cast("long"))
      .select(col("user_id"), col("version"), col("event_type"),
        tsStr(col("ts")).as("valid_from"),
        tsStr(col("valid_to_ts")).as("valid_to"),
        col("valid_to_ts").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  /** E32 — ORDERED conversion funnel (view → click → purchase): for each
    * user, the first view, the first click STRICTLY AFTER that view, and
    * the first purchase strictly after that click — the behavioral
    * sequence-analytics query ("how far did each user get, in order?")
    * that a plain per-type min cannot answer (a purchase before the
    * first view must NOT count).
    *
    * Three conditional-min aggregations, each keyed on user_id, each
    * consuming the previous stage's timestamp through a keyed join —
    * at scale every shuffle is on the same high-cardinality user key
    * (and at 100 TB the three aggregations collapse into one
    * sort-within-user pass if profiled as hot; the 3-phase form is
    * chosen because the oracle reproduces it clause for clause).
    * `stage` counts completed steps; ties inside a step resolve by the
    * min timestamp itself, which is unique per (user, type) at every
    * test scale and made deterministic in general by min's semantics. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts") > col("v_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts") > col("c_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
    ev.select("user_id").distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        tsStr(col("v_ts")).as("first_view"),
        tsStr(col("c_ts")).as("first_click_after"),
        tsStr(col("p_ts")).as("first_purchase_after"),
        (col("v_ts").isNotNull.cast("long") + col("c_ts").isNotNull.cast("long")
          + col("p_ts").isNotNull.cast("long")).as("stage"))
      .orderBy("user_id")
  }

  /** E33 — TIME-WEIGHTED average (TWAP) of `value` per user: each
    * observation holds until the next one, so its weight is the
    * microseconds to the user's next event (the last observation closes
    * the series — weight 0, excluded). The telemetry/billing aggregate
    * a plain AVG gets wrong whenever sampling is irregular: a value
    * held for an hour must count 3600× a value held for a second.
    *
    * Exactness: weights are integer microsecond diffs from one lead
    * window; each v·w term is DECIMAL(30,6)-canonicalized before the
    * order-independent decimal sum. The RATIO is round4-contracted, not
    * raw: the numerator's decimal sum reaches ~1e14·10⁶ units, past the
    * range where DuckDB's decimal→double cast (computed in double
    * arithmetic, see the Canon.round8 note) stays correctly rounded, so
    * the two engines' division inputs can differ by 1 ulp (observed on
    * 3/150 users at sf0.01). One shuffle on user_id (window + aggregate
    * share it). Users with a single event have no held interval and are
    * absent from the output. */
  def twap(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select("user_id", "event_id", "ts", "value")
      .withColumn("w_us",
        unix_micros(lead(col("ts"), 1).over(w).cast("timestamp")) -
          unix_micros(col("ts").cast("timestamp")))
      .filter(col("w_us").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_held"),
        sum(col("w_us")).as("held_us"),
        round4(sum(dec(col("value") * col("w_us"))).cast("double") /
          sum(col("w_us"))).as("twap"))
      .orderBy("user_id")
  }

  /** E34 — BATCH sessionization (gap-based gaps-and-islands): a user's
    * event stream splits into sessions wherever the gap to the previous
    * event exceeds `gapHours`; each session reports its bounds, event
    * count, exact duration, and distinct event types. The batch
    * counterpart of the streaming session window (E17/s03) — run over
    * history, not a live stream — and the canonical gaps-and-islands
    * pattern (lag → boundary flag → running sum = island id) that a
    * plain groupBy cannot express.
    *
    * One shuffle: both windows and the session aggregate are keyed on
    * `user_id` (the lag window, the running-sum window, and the
    * groupBy(user_id, session_idx) all reuse the same hash partitioning,
    * and the two windows share one sort on (ts, event_id)). No content
    * key, no global window; per-user data is bounded by a user's own
    * event volume, exactly the skew profile the streaming session
    * operator carries too. Duration is an integer microsecond diff —
    * engine-exact; `event_id` breaks timestamp ties deterministically.
    * Default gap 8h fits the fixtures' telemetry-like inter-event times
    * (median ~7.3h at sf0.01); real clickstreams bind ~30min. */
  def sessionize(s: SparkSession, d: String, gapHours: Int = 8): DataFrame = {
    val gapUs = gapHours.toLong * 3600L * 1000000L
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select("user_id", "event_id", "ts", "event_type")
      .withColumn("gap_us",
        unix_micros(col("ts").cast("timestamp")) -
          unix_micros(lag(col("ts"), 1).over(w).cast("timestamp")))
      .withColumn("is_new",
        (col("gap_us").isNull || col("gap_us") > gapUs).cast("long"))
      .withColumn("session_idx",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("start_ts"),
        max(col("ts")).as("end_ts"),
        countDistinct(col("event_type")).as("n_types"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        tsStr(col("start_ts")).as("session_start"),
        tsStr(col("end_ts")).as("session_end"),
        (unix_micros(col("end_ts").cast("timestamp")) -
          unix_micros(col("start_ts").cast("timestamp"))).as("dur_us"),
        col("n_types"))
      .orderBy("user_id", "session_idx")
  }

  /** E35 — cohort RETENTION matrix (the product-analytics staple):
    * users are grouped into signup cohorts by their first-event ISO
    * week, and each (cohort, week k) cell reports how many of them were
    * active k weeks later — the triangle chart every growth dashboard
    * draws, and a shape none of funnel (per-user order), sessionize
    * (per-user gaps), or plain windowed aggregation (no cohort anchor)
    * expresses: each cell conditions on a PER-USER derived anchor.
    *
    * Plan: the per-user anchor and the distinct (user, week) activity
    * set shuffle on user_id (one key), join co-keyed on it, and the
    * matrix is a keyed aggregate on the REDUCED (cohort, k) grid —
    * cohort sizes broadcast back. No windows. `week_k` is integer day
    * arithmetic on week-start dates (exact multiples of 7); `retention`
    * is one IEEE division of engine-identical integers — raw, no
    * rounding (Canon note). The fixtures' users are all first-active in
    * week one (dense synthetic streams), so the matrix degenerates to
    * one cohort row-block there; RelationalSpec plants staggered
    * cohorts with churn to exercise the full triangle. */
  def retention(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("user_id"), col("ts"))
    val first = e.groupBy("user_id")
      .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort"))
    val active = e.select(col("user_id"),
      to_date(date_trunc("week", col("ts"))).as("wk")).distinct()
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
    active.join(first, "user_id")
      .groupBy(col("cohort"),
        expr("datediff(wk, cohort) div 7").cast("long").as("week_k"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort")
      .select(dateStr(col("cohort")).as("cohort"), col("week_k"),
        col("n_active"), col("n_cohort"),
        (col("n_active").cast("double") / col("n_cohort")).as("retention"))
      .orderBy("cohort", "week_k")
  }

  /** E37 — item CO-OCCURRENCE (market-basket pair mining): which items
    * appear in the same users' baskets, with support and lift. Basket =
    * a user's distinct items (`props.k`), CAPPED at the [[BasketCap]]
    * most frequent per user (freq desc, item asc — deterministic): the
    * cap is the scale lever, bounding each user's pair fanout at
    * B(B−1)/2 regardless of how hyperactive the user is — without it
    * one bot account with 10⁵ distinct items emits 5·10⁹ pairs (the
    * same guard as the near-dup family's DF cap, applied to users).
    *
    * Plan: per-user item counts and the rank window both key on
    * user_id (high-cardinality partitions, the e30 posture); the
    * pair-generating self-join is CO-KEYED on user_id (both sides are
    * the same capped subtree — no new shuffle key); the (a, b) pair
    * aggregate map-side-combines hot pairs before its exchange. `lift`
    * = support·N / (nᵢ·nⱼ) is exact-integer numerator and denominator
    * with ONE IEEE division (Canon note). Pairs below support 2 are
    * noise and dropped (mirrored in the oracle). */
  val BasketCap = 20

  def cooccurrence(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      get_json_object(col("props"), "$.k").cast("long").as("item"))
    val cnt = ev.groupBy("user_id", "item").agg(count(lit(1)).as("n"))
    val rk = Window.partitionBy("user_id").orderBy(col("n").desc, col("item"))
    val basket = cnt
      .withColumn("r", row_number().over(rk))
      .filter(col("r") <= BasketCap)
      .select("user_id", "item")
    val total = basket.agg(countDistinct(col("user_id")).as("n_users_total"))
    val icnt = basket.groupBy("item").agg(count(lit(1)).as("ni"))
    val a = basket.as("a"); val b = basket.as("b")
    a.join(b, col("a.user_id") === col("b.user_id") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .join(broadcast(total))
      .join(broadcast(icnt.withColumnRenamed("item", "item_a")
        .withColumnRenamed("ni", "ni_a")), "item_a")
      .join(broadcast(icnt.withColumnRenamed("item", "item_b")
        .withColumnRenamed("ni", "ni_b")), "item_b")
      .select(col("item_a"), col("item_b"), col("support"),
        ((col("support") * col("n_users_total")).cast("double") /
          (col("ni_a") * col("ni_b"))).as("lift"))
      .orderBy("item_a", "item_b")
  }

  /** E39 — ROLLING median (trailing-window robust baseline): per
    * event_type, the 7-day trailing median / min / max of the DAILY
    * value sum — the anomaly-detection baseline dashboards draw (median
    * baselines survive the spike days that drag a rolling mean toward
    * the anomaly it should flag; a rolling mean of doubles would also
    * be ORDER-DEPENDENT FP addition, which no oracle could pin).
    *
    * Plan posture (e30): the percentile window runs over the REDUCED
    * daily table (types × days rows, corpus-size-independent) — the
    * corpus-sized work is the one map-side-combined daily aggregate.
    * The frame is a numeric RANGE over the integer day number
    * (`rangeBetween(-6, 0)` — gaps in the calendar still bound the
    * frame by VALUE, which a ROWS frame would get wrong), avoiding
    * interval-typed frames that engines express differently. daily_sum
    * is Canon-exact; the window median interpolates between two such
    * doubles → round4-contracted (e33 discipline); min/max exact. */
  def rollingMedian(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(dsum(col("value")).as("daily_sum"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy("event_type").orderBy(col("day_num"))
      .rangeBetween(-6, 0)
    daily
      .select(col("event_type"), dateStr(col("day")).as("day"), col("daily_sum"),
        round4(expr("percentile(daily_sum, 0.5)")
          .over(w)).as("med7"),
        min(col("daily_sum")).over(w).as("min7"),
        max(col("daily_sum")).over(w).as("max7"),
        count(lit(1)).over(w).as("n7"))
      .orderBy("event_type", "day")
  }

  /** E41 — usage APPORTIONMENT (interval-to-calendar proration): each
    * event's hold interval `[ts, ts+(k+1)min)` (the e36 construction)
    * is split across the calendar days it touches, and per (user, day)
    * the covered microseconds are summed — the billing/metering shape
    * ("usage seconds per day"), whose whole difficulty is the interval
    * that CROSSES MIDNIGHT: neither a groupBy on the start day (books
    * the spill-over to the wrong day) nor a window can express the
    * split; the operator is explode-to-covered-days + clamp.
    *
    * Plan: the day explode is scan-parallel and BOUNDED (an interval of
    * ≤ (k+1) ≤ 101 min covers at most 2 days — in general ⌈dur/day⌉+1
    * rows, duration-proportional, never corpus-proportional), then ONE
    * (user, day)-keyed aggregate, map-side combined. The clamp
    * `min(end, day+1) − max(start, day)` is integer-µs arithmetic —
    * engine-exact. */
  def usageApportion(s: SparkSession, d: String): DataFrame = {
    val iv = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("start_us"),
        (get_json_object(col("props"), "$.k").cast("long") + 1L).as("dur_min"))
      .withColumn("end_us", col("start_us") + col("dur_min") * 60000000L)
    val DayUs = 86400000000L
    iv
      .withColumn("day_idx",
        explode(sequence(expr("start_us div 86400000000"),
          // last covered day: the half-open end's PREVIOUS µs
          expr("(end_us - 1) div 86400000000"))))
      .withColumn("day_start_us", col("day_idx") * DayUs)
      .withColumn("covered_us",
        least(col("end_us"), col("day_start_us") + DayUs) -
          greatest(col("start_us"), col("day_start_us")))
      .groupBy(col("user_id"),
        to_date(timestamp_micros(col("day_start_us"))).as("day"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("covered_us")).as("usage_us"))
      .select(col("user_id"), dateStr(col("day")).as("day"),
        col("n_intervals"), col("usage_us"))
      .orderBy("user_id", "day")
  }

  /** E40 — conversion-LATENCY distribution (the funnel's time axis):
    * per user, latency = first purchase STRICTLY AFTER the first view,
    * minus that view (e32's order-sensitive anchor rule); the output is
    * the one-row distribution summary a growth dashboard reads —
    * audience size, conversions, rate, and the latency percentiles.
    * The count-based funnel (e32) says HOW MANY convert; this says HOW
    * FAST, which is what latency-sensitive experiments actually move.
    *
    * Plan: two user_id-keyed conditional-min aggregates (view anchor,
    * then purchase-after via the co-keyed join — the funnel shape),
    * then ONE global aggregate over user-cardinality rows. Latencies
    * are integer µs (engine-exact); the rate is one IEEE division;
    * median/p90 are round4-contracted interpolated percentiles (e33
    * discipline) whose exact form buffers user-count values — at
    * extreme audiences the same plan takes `approx_percentile`
    * (e09c note). */
  def conversionLatency(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(v, "user_id")
      .filter(col("ts") > col("v_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("p_ts"), min(col("v_ts")).as("v_ts2"))
    val lat = p.select((unix_micros(col("p_ts").cast("timestamp")) -
      unix_micros(col("v_ts2").cast("timestamp"))).as("lat_us"))
      // percentiles interpolate over integer SECONDS, not µs: at µs
      // magnitudes (~10¹¹) the interpolation's 1-ulp cross-engine
      // divergence (~10⁻⁴) can straddle a round4 boundary — observed
      // once at sf0.01; at second magnitudes the ulp is ~10⁻¹⁰ and the
      // contract is safe. min/max stay exact µs.
      .withColumn("lat_s", expr("lat_us div 1000000"))
    val nViewers = v.agg(count(lit(1)).as("n_viewers"))
    lat.agg(
      count(lit(1)).as("n_converted"),
      min(col("lat_us")).as("min_us"),
      max(col("lat_us")).as("max_us"),
      round4(expr("percentile(lat_s, 0.5)")).as("p50_s"),
      round4(expr("percentile(lat_s, 0.9)")).as("p90_s"))
      .join(broadcast(nViewers))
      // a conversion-free corpus has no distribution to report: emit
      // zero rows (mirrors the oracle's inner FROM over the latency set)
      .filter(col("n_converted") > 0)
      .select(col("n_viewers"), col("n_converted"),
        (col("n_converted").cast("double") / col("n_viewers")).as("conv_rate"),
        col("min_us"), col("max_us"), col("p50_s"), col("p90_s"))
  }

  /** E38 — OHLC BARS (time-bucket downsampling): per (event_type, day),
    * open = first value, close = last value (both by the total
    * (ts, event_id) order), high/low = max/min, volume, and a
    * decimal-exact VWAP-style mean. The resample-to-bars operator every
    * telemetry/market pipeline runs — and a deliberate contrast with
    * windows: `min_by`/`max_by` over a STRUCT ordering key make
    * open/close plain aggregates, so the whole bar is ONE map-side-
    * combining shuffle keyed on (type, day) — no rank window over raw
    * events, no per-bucket sort. Values are untouched doubles (open/
    * high/low/close carry no arithmetic — bit-identical in any engine);
    * the mean is dsum/count (Canon). At 100 TB the bucket count is
    * types × days — tiny — but the INPUT per bucket is unbounded,
    * which is exactly why the bar must be an aggregate (partial
    * combine) and not a window (single partition per bucket). */
  def ohlcBars(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("ts"), col("event_id"), col("value"))
      .groupBy("event_type", "day")
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("volume"),
        davg(col("value")).as("mean_value"))
      .select(col("event_type"), dateStr(col("day")).as("day"),
        col("open"), col("high"), col("low"), col("close"),
        col("volume"), col("mean_value"))
      .orderBy("event_type", "day")

  /** E36 — overlapping-INTERVAL merge (the second gaps-and-islands
    * shape): each event opens a hold interval `[ts, ts + (k+1) min)`
    * (k from `props` — the fixture's duration knob; k+1 so every
    * interval is non-empty), and per user all overlapping-or-touching
    * intervals coalesce into maximal merged spans. Distinct from
    * sessionize (E34): there the island boundary is a GAP between
    * point events; here it is the running MAX of interval ENDS — an
    * interval wholly inside an earlier long one must NOT open a new
    * island, which the lag-gap pattern gets wrong and the
    * running-max pattern gets right.
    *
    * One shuffle: the running-max window, the island-sum window, and
    * the final groupBy all key on `user_id` and share one sort on
    * (start_us, event_id). All arithmetic is integer microseconds —
    * engine-exact. `covered_us` (merged extent) vs `sum_dur_us`
    * (raw durations) exposes the overlap mass that merging removed.
    * Skew profile: per-user row counts, same as E34 — no content
    * keys, AQE-splittable. */
  def intervalMerge(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("start_us"), col("event_id"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("start_us"),
        (get_json_object(col("props"), "$.k").cast("long") + 1L)
          .as("dur_min"))
      .withColumn("end_us", col("start_us") + col("dur_min") * 60000000L)
    ev
      // strictly-before rows only: an interval that merely TOUCHES the
      // previous end (start == max_prev_end) still merges (closed-open
      // adjacency), so a new island needs start > all previous ends.
      .withColumn("max_prev_end",
        max(col("end_us")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("is_new",
        (col("max_prev_end").isNull || col("start_us") > col("max_prev_end"))
          .cast("long"))
      .withColumn("island",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("n_events"),
        min(col("start_us")).as("merged_start_us"),
        max(col("end_us")).as("merged_end_us"),
        sum(col("end_us") - col("start_us")).as("sum_dur_us"))
      .select(col("user_id"), col("island"), col("n_events"),
        col("merged_start_us"), col("merged_end_us"),
        (col("merged_end_us") - col("merged_start_us")).as("covered_us"),
        col("sum_dur_us"))
      .orderBy("user_id", "island")
  }
}
