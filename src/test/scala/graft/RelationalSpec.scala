package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  // The promised e09b check (VERDICT r1 "what's wrong" #4): HLL++ with
  // rsd=0.02 against the exact distinct count, generous 5×rsd tolerance.
  test("approx_count_distinct stays within tolerance of exact") {
    val rows = Relational.approxDistinct(spark, Sf)
      .select("approx_parts", "exact_parts").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.10, s"approx=$approx exact=$exact err=$err")
    }
  }

  test("approx_percentile stays within tolerance of the exact percentile") {
    // the sketch is the 100 TB path (exact percentile buffers every value
    // per group — e09c's scaladoc); pin its error against the exact form.
    val rows = Tables.lineitem(spark, Sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("exact"),
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("approx"))
      .select("exact", "approx").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact) <= 1.0,
        s"median approx=$approx exact=$exact") // quantities are 1..50
    }
  }

  // e27's decimal-derived co-moments stand in for Spark's native
  // streaming-merge aggregates (whose partition-merge order is
  // nondeterministic under a hash compare); pin derived ≈ native.
  test("statsAgg decimal-derived stats match native corr/covar/stddev") {
    val derived = Relational.statsAgg(spark, Sf)
      .select("l_returnflag", "corr_qty_price", "covar_qty_price",
        "stddev_qty", "stddev_price")
      .as[(String, Double, Double, Double, Double)].collect().sortBy(_._1)
    val native = Tables.lineitem(spark, Sf)
      .groupBy(col("l_returnflag"))
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        stddev_samp(col("l_quantity")).as("sq"),
        stddev_samp(col("l_extendedprice")).as("sp"))
      .select("l_returnflag", "c", "cv", "sq", "sp")
      .as[(String, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(derived.length === native.length && derived.nonEmpty)
    derived.zip(native).foreach { case ((f, c1, cv1, sq1, sp1), (f2, c2, cv2, sq2, sp2)) =>
      assert(f === f2)
      // derived values carry round4/round8 canonicalization (±5e-5/±5e-9
      // absolute), so compare at rounding granularity
      def close(a: Double, b: Double, tol: Double) = math.abs(a - b) <= tol
      assert(close(c1, c2, 1e-8), s"corr $f: $c1 vs $c2")
      assert(close(cv1, cv2, 1e-4), s"covar $f: $cv1 vs $cv2")
      assert(close(sq1, sq2, 1e-4), s"stddev_qty $f: $sq1 vs $sq2")
      assert(close(sp1, sp2, 1e-4), s"stddev_price $f: $sp1 vs $sp2")
    }
  }

  // e28's HOF-derived facts must agree with plain relational recomputation.
  test("arrayHof facts match direct per-order aggregation") {
    val hof = Relational.arrayHof(spark, Sf)
    val direct = Tables.lineitem(spark, Sf)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items_d"),
        max((col("l_quantity") > 45.0).cast("int")).as("has_large_d"),
        min((col("l_quantity") >= 10.0).cast("int")).as("all_ge10_d"),
        sum((col("l_quantity") >= 25.0).cast("long")).as("n_ge25_d"),
        graft.Canon.dsum(col("l_quantity")).as("sum_qty_d"))
    val joined = hof.join(direct, "l_orderkey")
    assert(joined.count() === hof.count())
    val bad = joined.filter(
      col("n_items") =!= col("n_items_d") ||
        col("has_large") =!= (col("has_large_d") === 1) ||
        col("all_ge10") =!= (col("all_ge10_d") === 1) ||
        col("n_ge25") =!= col("n_ge25_d") ||
        abs(col("sum_qty") - col("sum_qty_d")) > 1e-9)
    assert(bad.isEmpty, bad.take(3).mkString("; "))
  }

  // e26's roster string must be exactly the sorted distinct nations that
  // have suppliers in the region.
  test("stringAgg nation roster matches the distinct supplier nations") {
    val rows = Relational.stringAgg(spark, Sf)
      .select("r_name", "nations").as[(String, String)].collect().toMap
    val expected = Tables.supplier(spark, Sf)
      .join(Tables.nation(spark, Sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, Sf), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name").distinct()
      .as[(String, String)].collect()
      .groupBy(_._1).map { case (r, ns) => r -> ns.map(_._2).sorted.mkString(",") }
    assert(rows === expected)
  }

  // e29: the dense spine covers every user's full span, carries are
  // exactly the most recent observed day's value, and observed days pass
  // through untouched.
  test("locfFill carries the last observation into every gap") {
    val rows = Relational.locfFill(spark, Sf)
      .select("user_id", "day", "filled_value", "was_gap")
      .as[(Long, String, Double, Boolean)].collect()
      .groupBy(_._1).values
    assert(rows.nonEmpty)
    rows.foreach { series =>
      val sorted = series.sortBy(_._2)
      // dense: one row per calendar day across the span
      val days = sorted.map(_._2)
      assert(days.length ===
        java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.parse(days.head),
          java.time.LocalDate.parse(days.last)).toInt + 1)
      // first row is an observation; every gap repeats the prior value
      assert(!sorted.head._4)
      sorted.sliding(2).foreach {
        case Array((_, _, prev, _), (_, _, v, gap)) =>
          if (gap) assert(v === prev)
        case _ =>
      }
      sorted.foreach { case (_, _, v, _) => assert(!v.isNaN) }
    }
  }

  // e43: planted series with hand-computable interpolants, including an
  // uneven bracket (3-day gap) and a multi-observation day (dsum).
  test("interpFill: gaps take the linear value between bracketing observations") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 0.0),
      (1L, "2024-01-05 09:00:00", 5.0),
      (1L, "2024-01-05 17:00:00", 3.0),   // day sums to 8.0
      (1L, "2024-01-07 00:00:00", 2.0),
      (2L, "2024-03-10 12:00:00", 7.0))   // single-day series: no gaps
      .toDF("user_id", "ts", "value")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
    val out = Relational.interpFillOver(ev)
      .as[(Long, String, Double, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, "2024-01-01", 0.0, false),
      (1L, "2024-01-02", 2.0, true),      // 0 + 8·(1/4)
      (1L, "2024-01-03", 4.0, true),
      (1L, "2024-01-04", 6.0, true),
      (1L, "2024-01-05", 8.0, false),
      (1L, "2024-01-06", 5.0, true),      // 8 + (2−8)·(1/2)
      (1L, "2024-01-07", 2.0, false),
      (2L, "2024-03-10", 7.0, false)), s"got $out")
  }

  // e43 on the corpus: dense spine, observed days pass through ≡ e29's,
  // and every gap value lies within its bracketing observations.
  test("interpFill: corpus gaps stay within brackets; observations match locf") {
    val interp = Relational.interpFill(spark, Sf)
      .as[(Long, String, Double, Boolean)].collect()
    val locf = Relational.locfFill(spark, Sf)
      .as[(Long, String, Double, Boolean)].collect()
    assert(interp.length === locf.length)
    interp.zip(locf).foreach { case ((u1, d1, v1, g1), (u2, d2, v2, g2)) =>
      assert((u1, d1, g1) === ((u2, d2, g2)))
      if (!g1) assert(v1 === v2)          // observed days identical
    }
    interp.groupBy(_._1).values.foreach { series =>
      val sorted = series.sortBy(_._2)
      val obs = sorted.filter(!_._4).map(s => s._2 -> s._3)
      sorted.filter(_._4).foreach { case (_, day, v, _) =>
        val prev = obs.filter(_._1 < day).maxBy(_._1)._2
        val next = obs.filter(_._1 > day).minBy(_._1)._2
        val (lo, hi) = (math.min(prev, next), math.max(prev, next))
        assert(v >= lo - 1e-4 && v <= hi + 1e-4,
          s"gap $day value $v outside bracket [$lo, $hi]")
      }
    }
  }

  // e44: hand-computed weighted quartiles, including a price tie at the
  // median crossing, a single-row group, and an exactly-half boundary.
  test("weightedQuantiles: crossing rule matches hand computation on planted weights") {
    val li = Seq(
      // supp 1: prices 10(w1) 20(w1) 30(w6) 40(w2) — tot 10
      //   cum: 1, 2, 8, 10 → q1 crosses at 30 (cum·4=8·4≥10 first at 30),
      //   median at 30, q3 at 30 (8·4=32 ≥ 30)
      (1L, 10.0, 1.0), (1L, 20.0, 1.0), (1L, 30.0, 6.0), (1L, 40.0, 2.0),
      // supp 2: tie at the crossing — 5(w2) 7(w1) 7(w1) — tot 4, cum
      //   2,3,4: median = smallest price with cum·2 ≥ 4 → 5 (2·2=4, boundary)
      (2L, 5.0, 2.0), (2L, 7.0, 1.0), (2L, 7.0, 1.0),
      // supp 3: single row — all quartiles are its price
      (3L, 99.0, 0.5))
      .toDF("l_suppkey", "l_extendedprice", "l_quantity")
    val out = Relational.weightedQuantilesOver(li)
      .as[(Long, Long, Double, Double, Double, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 4L, 10.0, 30.0, 30.0, 30.0),
      (2L, 3L, 4.0, 5.0, 5.0, 7.0),
      (3L, 1L, 0.5, 99.0, 99.0, 99.0)), s"got $out")
  }

  // e44 on the corpus: quartiles are ordered, drawn from the group's own
  // prices, and the median crossing holds against a driver-side recompute.
  test("weightedQuantiles: corpus medians match a driver-side recompute") {
    val out = Relational.weightedQuantiles(spark, Sf)
      .as[(Long, Long, Double, Double, Double, Double)].collect()
    assert(out.nonEmpty)
    val raw = Tables.lineitem(spark, Sf)
      .select("l_suppkey", "l_extendedprice", "l_quantity")
      .as[(Long, Double, Double)].collect().groupBy(_._1)
    out.foreach { case (k, n, tot, q1, med, q3) =>
      assert(q1 <= med && med <= q3)
      val rows = raw(k).map(r => (r._2, BigDecimal(r._3))).sortBy(_._1)
      assert(n === rows.length)
      assert(math.abs(tot - rows.map(_._2).sum.toDouble) < 1e-9)
      val total = rows.map(_._2).sum
      var cum = BigDecimal(0)
      val expectMed = rows.collectFirst {
        case (p, w) if { cum += w; cum * 2 >= total } => p
      }.get
      assert(med === expectMed, s"supp $k")
      assert(rows.exists(_._1 == q1) && rows.exists(_._1 == q3))
    }
  }

  // The single-scan flag-aggregation setOps plan must reproduce the
  // naive intersect/except/union-over-raw-scans form exactly.
  test("setOps single-scan plan ≡ naive multi-scan set operations") {
    val o = Tables.orders(spark, Sf)
    val fk = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
    val ok = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k"))
    val naive =
      fk.intersect(ok).select(col("k"), lit("intersect").as("op"))
        .unionAll(fk.except(ok).select(col("k"), lit("except").as("op")))
        .unionAll(fk.union(ok).distinct().select(col("k"), lit("union").as("op")))
        .orderBy("op", "k")
    val fast = Relational.setOps(spark, Sf)
    assert(fast.collect().toSeq === naive.collect().toSeq)
  }

  // e15d: the single-scan count-arithmetic form must reproduce Spark's
  // intersectAll/exceptAll BAG primitives exactly on the real corpus.
  test("bagSetOps single-scan plan ≡ intersectAll/exceptAll primitives") {
    val o = Tables.orders(spark, Sf)
    val fa = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
    val oa = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k"))
    val naive =
      fa.intersectAll(oa).groupBy("k").agg(count(lit(1)).as("n"))
        .select(lit("intersect_all").as("op"), col("k"), col("n"))
        .unionAll(fa.exceptAll(oa).groupBy("k").agg(count(lit(1)).as("n"))
          .select(lit("except_all").as("op"), col("k"), col("n")))
        .orderBy("op", "k")
    assert(Relational.bagSetOps(spark, Sf).collect().toSeq === naive.collect().toSeq)
  }

  // e15d planted multiset: multiplicities min / clamped-difference, and
  // the subtle rows — key in both with equal counts (no except_all row),
  // key only on the right (no row at all).
  test("bagSetOps multiplicity algebra on a planted multiset") {
    import spark.implicits._
    // A = {1×3, 2×1, 5×2}, B = {1×2, 2×1, 3×4}
    val counts = Seq((1L, 3L, 2L), (2L, 1L, 1L), (5L, 2L, 0L), (3L, 0L, 4L))
      .toDF("k", "n_f", "n_o")
    val got = Relational.bagSetOpsFromCounts(counts)
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("except_all", 1L, 1L),      // 3 − 2
      ("except_all", 5L, 2L),      // 2 − 0
      ("intersect_all", 1L, 2L),   // min(3, 2)
      ("intersect_all", 2L, 1L)))  // min(1, 1); 3 and equal-count 2 emit nothing extra
  }

  // The time-bucketed range join must reproduce the plain non-equi join.
  test("bucketed range join ≡ naive range join") {
    val e = Tables.events(spark, Sf)
    val a = e.select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
    val b = e.select(col("user_id").as("b_user"), col("event_id").as("b_id"),
      col("ts").as("b_ts"))
    val naive = a.join(b, col("user_id") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("a_id")).as("n_heads"))
      .orderBy("user_id")
    assert(Relational.rangeJoin(spark, Sf).collect().toSeq === naive.collect().toSeq)
  }

  test("broadcast join plan broadcasts the dimension side") {
    val plan = Relational.broadcastJoin(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("scan filter pushes predicates and prunes columns at the parquet scan") {
    // read the scan node's own metadata (the plan's toString truncates)
    // sparkPlan, not executedPlan: AQE wraps the tree and hides the scan
    val scans = Relational.scanFilter(spark, Sf).queryExecution.sparkPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val pushed = scans.head.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("GreaterThan(l_discount"), pushed)
    val readSchema = scans.head.metadata("ReadSchema")
    assert(!readSchema.contains("l_returnflag"), s"pruned columns must not be read: $readSchema")
  }

  test("e31 SCD2: intervals tile per user, runs compress, one current row") {
    val rows = Relational.scd2Intervals(spark, Sf)
      .select("user_id", "version", "event_type", "valid_from", "valid_to",
        "is_current")
      .as[(Long, Long, String, String, Option[String], Boolean)]
      .collect().groupBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (u, ivs0) =>
      val ivs = ivs0.sortBy(_._2)
      // versions are the dense per-user ordinal
      assert(ivs.map(_._2).toSeq === (1L to ivs.length).toSeq)
      // intervals tile: each valid_to equals the next valid_from; only
      // the last interval is open (valid_to NULL) and flagged current
      ivs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $u: gap after v${a._2}")
          assert(!a._6)
        case _ =>
      }
      assert(ivs.last._5.isEmpty && ivs.last._6)
      // change compression: consecutive intervals never repeat a type
      ivs.sliding(2).foreach {
        case Array(a, b) => assert(a._3 !== b._3, s"user $u: uncompressed run")
        case _ =>
      }
    }
    // cross-check total against an independent change count
    val expected = Tables.events(spark, Sf)
      .select("user_id", "event_id", "ts", "event_type")
      .as[(Long, Long, java.sql.Timestamp, String)]
      .collect().groupBy(_._1).map { case (_, es) =>
        val ordered = es.sortBy(e => (e._3.getTime, e._2)).map(_._4)
        1 + ordered.sliding(2).count { case Array(a, b) => a != b; case _ => false }
      }.sum
    assert(rows.values.map(_.length).sum === expected)
  }

  test("e32 funnel is ORDER-sensitive: out-of-sequence steps do not count") {
    import spark.implicits._
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    Seq(
      // user 1: the full ordered path → stage 3
      (1L, ts(1), 1L, "view", 1.0, "{}"), (2L, ts(2), 1L, "click", 1.0, "{}"),
      (3L, ts(3), 1L, "purchase", 1.0, "{}"),
      // user 2: purchase BEFORE the click-after-view → stage 2 only
      (4L, ts(1), 2L, "purchase", 1.0, "{}"), (5L, ts(2), 2L, "view", 1.0, "{}"),
      (6L, ts(3), 2L, "click", 1.0, "{}"),
      // user 3: click before the first view → stage 1 only
      (7L, ts(1), 3L, "click", 1.0, "{}"), (8L, ts(2), 3L, "view", 1.0, "{}"),
      // user 4: never viewed → stage 0
      (9L, ts(1), 4L, "error", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val stages = Relational.funnel(spark, dir)
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(stages === Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L))
  }

  test("e33 TWAP weights values by hold time, not by sample count") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val dir = java.nio.file.Files.createTempDirectory("graft-twap").toString
    Seq(
      // user 1: value 10 held 9 min, value 100 held 1 min, close at 10 min
      // → twap = (10·9 + 100·1) / 10 = 19.0 ≠ plain avg (10+100+0)/3
      (1L, ts(0), 1L, "view", 10.0, "{}"),
      (2L, ts(9), 1L, "view", 100.0, "{}"),
      (3L, ts(10), 1L, "view", 0.0, "{}"),
      // user 2: a single event has no held interval → absent from output
      (4L, ts(0), 2L, "view", 55.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.twap(spark, dir)
      .select("user_id", "n_held", "held_us", "twap")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 2L, 600000000L, 19.0)))
  }

  test("e34 sessionize: planted gaps split sessions; the 8h boundary is strict") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("graft-sess").toString
    Seq(
      // user 1: 00:00, 01:00, then EXACTLY 8h after 01:00 (gap == 8h is
      // NOT a boundary — the rule is strictly greater), then a 15h gap
      // → sessions {3 events, 00:00–09:00} and {1 event}
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 1.0, "{}"),
      (2L, ts("2024-01-01 01:00:00"), 1L, "click", 1.0, "{}"),
      (3L, ts("2024-01-01 09:00:00"), 1L, "view", 1.0, "{}"),
      (4L, ts("2024-01-02 00:00:00"), 1L, "purchase", 1.0, "{}"),
      // user 2: a single event is its own 0-duration session
      (5L, ts("2024-01-01 12:00:00"), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.sessionize(spark, dir)
      .select("user_id", "session_idx", "n_events", "session_start",
        "session_end", "dur_us", "n_types")
      .as[(Long, Long, Long, String, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 3L, "2024-01-01 00:00:00", "2024-01-01 09:00:00",
        9L * 3600 * 1000000, 2L),
      (1L, 2L, 1L, "2024-01-02 00:00:00", "2024-01-02 00:00:00", 0L, 1L),
      (2L, 1L, 1L, "2024-01-01 12:00:00", "2024-01-01 12:00:00", 0L, 1L)))
  }

  test("e36 interval merge: nested intervals stay in one island; touching merges") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def ev(id: Long, t: String, u: Long, k: Long) =
      (id, ts(t), u, "view", 1.0, s"""{"k": $k}""")
    val dir = java.nio.file.Files.createTempDirectory("graft-imerge").toString
    val min = 60000000L
    Seq(
      // user 1, island 1: A [00:00, 01:00) (k=59 → 60 min);
      //   B [00:30, 00:40) NESTED inside A — the case the lag-gap rule
      //   (e34's pattern) would wrongly split on, because the NEXT
      //   event (C) starts after B's end but inside A's;
      //   C [01:00, 01:01) touches A's end exactly → merges (closed-open)
      ev(1L, "2024-01-01 00:00:00", 1L, 59L),
      ev(2L, "2024-01-01 00:30:00", 1L, 9L),
      ev(3L, "2024-01-01 01:00:00", 1L, 0L),
      // user 1, island 2: D starts strictly past every previous end
      ev(4L, "2024-01-01 03:00:00", 1L, 0L),
      // user 2: one event, one island
      ev(5L, "2024-01-01 12:00:00", 2L, 4L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.intervalMerge(spark, dir)
      .select("user_id", "island", "n_events", "covered_us", "sum_dur_us")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 3L, 61L * min, (60L + 10L + 1L) * min),
      (1L, 2L, 1L, 1L * min, 1L * min),
      (2L, 1L, 1L, 5L * min, 5L * min)))
  }

  test("e37 co-occurrence: support/lift arithmetic, basket cap, frequency priority") {
    def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 60000L)
    val dir = java.nio.file.Files.createTempDirectory("graft-cooc").toString
    // users 1-3: items {10,11,12}, {10,11}, {10,12} → (10,11) and
    // (10,12) at support 2; (11,12) support 1 is dropped
    val small = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 12L))
    // users 4,5: identical 25-item baskets 100..124 (freq 1 each) plus
    // item 200 at freq 3 → rank keeps {200} ∪ {100..118}; 119..124 must
    // never reach any pair (the cap), and 200 outranks them all (the
    // frequency priority)
    val big = for (u <- Seq(4L, 5L); i <- (100L to 124L) ++ Seq(200L, 200L, 200L))
      yield (u, i)
    val evs = (small ++ big).zipWithIndex.map { case ((u, item), i) =>
      (i.toLong, ts(i), u, "view", 1.0, s"""{"k": $item}""")
    }
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.cooccurrence(spark, dir)
      .select("item_a", "item_b", "support", "lift")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val gotPairs = got.map(r => (r._1, r._2)).toSet
    // analytic rows: tot=5 users, ni(10)=3, ni(11)=ni(12)=2
    assert(got.filter(_._1 == 10L).toSet === Set(
      (10L, 11L, 2L, 2.0 * 5 / (3 * 2)),
      (10L, 12L, 2L, 2.0 * 5 / (3 * 2))))
    assert(!gotPairs.contains((11L, 12L)), "support-1 pair must be dropped")
    // cap: 119..124 never survive the per-user top-20
    assert(!got.exists(r => Seq(r._1, r._2).exists(i => i >= 119L && i <= 124L)))
    // frequency priority: the freq-3 item 200 is in both kept baskets
    assert(got.filter(r => r._2 == 200L).map(_._3).distinct === Seq(2L))
    // both big baskets keep exactly {100..118, 200} → C(20,2) pairs at
    // support 2, all present
    assert(got.count(_._1 >= 100L) === 190)
  }

  test("e38 OHLC bars: first/last by total order, timestamp tie broken by event_id") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("graft-ohlc").toString
    Seq( // written scrambled; day 1 of type "x": open 5, high 9, low 1, close 7
      (3L, ts("2024-01-01 11:00:00"), 1L, "x", 1.0, "{}"),
      (1L, ts("2024-01-01 09:00:00"), 1L, "x", 5.0, "{}"),
      (4L, ts("2024-01-01 12:00:00"), 1L, "x", 7.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "x", 9.0, "{}"),
      // day 2 of type "x": two events at the SAME timestamp — open/close
      // fall to the event_id tie-break (open = id 5, close = id 6)
      (6L, ts("2024-01-02 09:00:00"), 1L, "x", 3.0, "{}"),
      (5L, ts("2024-01-02 09:00:00"), 1L, "x", 8.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.ohlcBars(spark, dir)
      .select("day", "open", "high", "low", "close", "volume", "mean_value")
      .as[(String, Double, Double, Double, Double, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("2024-01-01", 5.0, 9.0, 1.0, 7.0, 4L, 5.5),
      ("2024-01-02", 8.0, 8.0, 3.0, 3.0, 2L, 5.5)))
  }

  test("e39 rolling median: RANGE frame bounds by calendar value across gaps") {
    def ts(d: String) = java.sql.Timestamp.valueOf(s"2024-01-$d 10:00:00")
    val dir = java.nio.file.Files.createTempDirectory("graft-roll").toString
    // days 1,2,3 then a CALENDAR GAP to day 10: the day-10 frame [4..10]
    // must contain only day 10 — a ROWS(6) frame would wrongly pull in
    // days 1-3 and report med=12.5 instead of 5
    Seq(("01", 10.0), ("02", 20.0), ("03", 30.0), ("10", 5.0))
      .zipWithIndex.map { case ((d0, v), i) =>
        (i.toLong + 1, ts(d0), 1L, "x", v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.rollingMedian(spark, dir)
      .select("day", "daily_sum", "med7", "min7", "max7", "n7")
      .as[(String, Double, Double, Double, Double, Long)].collect().toSeq
    assert(got === Seq(
      ("2024-01-01", 10.0, 10.0, 10.0, 10.0, 1L),
      ("2024-01-02", 20.0, 15.0, 10.0, 20.0, 2L),
      ("2024-01-03", 30.0, 20.0, 10.0, 30.0, 3L),
      ("2024-01-10", 5.0, 5.0, 5.0, 5.0, 1L)))
  }

  test("e40 conversion latency: strictly-after anchors, percentiles, audience") {
    def ts(m: Int) = new java.sql.Timestamp(1704067200000L + m * 60000L)
    def ev(id: Long, m: Int, u: Long, t: String) = (id, ts(m), u, t, 1.0, "{}")
    val dir = java.nio.file.Files.createTempDirectory("graft-convlat").toString
    val min = 60000000L
    Seq(
      ev(1, 0, 1, "view"), ev(2, 10, 1, "purchase"),          // lat 10 min
      ev(3, 5, 2, "view"), ev(4, 0, 2, "purchase"),           // purchase BEFORE view → not converted
      ev(5, 0, 3, "view"),                                     // viewer, no purchase
      ev(6, 0, 4, "purchase"),                                 // no view → not in audience
      ev(7, 0, 5, "view"), ev(8, 30, 5, "purchase"), ev(9, 20, 5, "purchase")) // first-after = 20
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.conversionLatency(spark, dir)
      .select("n_viewers", "n_converted", "conv_rate", "min_us", "max_us", "p50_s", "p90_s")
      .as[(Long, Long, Double, Long, Long, Double, Double)].collect().toSeq
    assert(got === Seq((4L, 2L, 0.5, 10L * min, 20L * min,
      15.0 * 60, (10 + 0.9 * 10) * 60)))
  }

  test("e41 apportionment: midnight-crossing interval splits exactly across days") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def ev(id: Long, t: String, u: Long, k: Long) =
      (id, ts(t), u, "view", 1.0, s"""{"k": $k}""")
    val dir = java.nio.file.Files.createTempDirectory("graft-apport").toString
    val min = 60000000L
    Seq(
      // user 1: 23:30 + 90 min (k=89) → 30 min on Jan 1, 60 min on Jan 2
      ev(1L, "2024-01-01 23:30:00", 1L, 89L),
      // user 1: fully inside Jan 2: 10:00 + 5 min
      ev(2L, "2024-01-02 10:00:00", 1L, 4L),
      // user 2: starts exactly at midnight, 1 min — Jan 3 only
      ev(3L, "2024-01-03 00:00:00", 2L, 0L))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.usageApportion(spark, dir)
      .select("user_id", "day", "n_intervals", "usage_us")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "2024-01-01", 1L, 30L * min),
      (1L, "2024-01-02", 2L, 65L * min), // 60 spill-over + 5 local
      (2L, "2024-01-03", 1L, 1L * min)))
    // conservation: apportioned mass equals raw durations
    assert(got.map(_._4).sum === (90L + 5L + 1L) * min)
  }

  test("e35 retention: staggered cohorts with churn draw the full triangle") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 10:00:00")
    val dir = java.nio.file.Files.createTempDirectory("graft-ret").toString
    // cohort A (week of Mon 2024-01-01): user 1 active weeks 0,1,2;
    //   user 2 active weeks 0 and 2 (churns week 1, RETURNS — the
    //   comeback case a naive "streak" computation gets wrong)
    // cohort B (week of 2024-01-08): user 3 active weeks 0,1
    val evs = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-10"), (1L, "2024-01-17"),
      (2L, "2024-01-02"), (2L, "2024-01-16"),
      (3L, "2024-01-08"), (3L, "2024-01-15"))
    evs.zipWithIndex.map { case ((u, d0), i) =>
      (i.toLong + 1, ts(d0), u, "view", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.retention(spark, dir)
      .select("cohort", "week_k", "n_active", "n_cohort", "retention")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("2024-01-01", 0L, 2L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 2L, 0.5), // user 2 churned this week
      ("2024-01-01", 2L, 2L, 2L, 1.0), // ... and came back
      ("2024-01-08", 0L, 1L, 1L, 1.0),
      ("2024-01-08", 1L, 1L, 1L, 1.0)))
  }
}
