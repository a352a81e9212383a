package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("observe metrics match direct aggregation without a second scan") {
    val (df, obs) = Profiling.observedScan(spark, Sf)
    df.write.format("noop").mode("overwrite").save() // one action, one scan
    val m = obs.get
    val direct = Tables.lineitem(spark, Sf)
      .agg(count(lit(1)).as("n"),
        sum(when(!col("l_quantity").between(1.0, 50.0), 1L).otherwise(0L)).as("v"),
        graft.Canon.dsum(col("l_extendedprice")).as("t"))
      .head()
    assert(m("n_rows") === direct.getLong(0))
    assert(m("qty_violations") === direct.getLong(1))
    assert(m("control_total") === direct.getDouble(2))
  }

  test("p11 embedding profile ≡ in-memory decimal power sums; dense " +
    "position cover; every dimension fully counted") {
    val vecs = Tables.embeddings(spark, Sf)
      .select(transform(col("embedding"), _.cast("double")).as("v"))
      .as[Seq[Double]].collect()
    val dim = vecs.head.length
    def dsumJvm(xs: Seq[Double]): Double =
      xs.map(x => BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val got = Profiling.embeddingProfile(spark, Sf)
      .as[(Int, Long, Double, Double, Double, Double)].collect().toSeq
    assert(got.map(_._1) === (0 until dim), "positions not dense 0..dim-1")
    got.foreach { case (pos, n, mean, stddev, mn, mx) =>
      val xs = vecs.map(_(pos))
      assert(n === vecs.length.toLong, s"dim $pos dropped rows")
      val s = dsumJvm(xs); val s2 = dsumJvm(xs.map(x => x * x))
      assert(mean === s / n, s"dim $pos mean drifted")
      assert(stddev === math.sqrt((s2 - s * s / n) / (n - 1)),
        s"dim $pos stddev drifted")
      assert(mn === xs.min && mx === xs.max, s"dim $pos extrema drifted")
    }
  }

  test("p03 histogram: exact mass conservation, tiling edges, extrema coverage") {
    val li = Tables.lineitem(spark, Sf)
    val n = li.count()
    val (lo, hi) = {
      val r = li.agg(min(col("l_extendedprice").cast("double")),
        max(col("l_extendedprice").cast("double"))).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val rows = Profiling.histogram(spark, Sf).collect()
    // every row count is positive and the counts sum to the corpus —
    // nothing dropped, nothing double-binned (the clamp puts x = max
    // into the last bin rather than a phantom 17th)
    assert(rows.map(_.getAs[Long]("n")).sum === n)
    assert(rows.forall(_.getAs[Long]("n") > 0))
    val bins = rows.map(_.getAs[Long]("bin"))
    assert(bins.forall(b => b >= 0 && b < 16))
    assert(bins.distinct.length === bins.length)
    // edges tile: bin k's hi is bin k+1's lo (identical arithmetic, so
    // exact equality), first lo is the exact minimum
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("bin_hi") === b.getAs[Double]("bin_lo") ||
          b.getAs[Long]("bin") > a.getAs[Long]("bin") + 1)
      case _ =>
    }
    assert(rows.head.getAs[Double]("bin_lo") === lo)
    assert(math.abs(rows.last.getAs[Double]("bin_hi") - hi) <= 1e-9 * math.abs(hi))
  }

  test("p04 equi-depth bins: near-equal sizes, value-monotone boundaries, full cover") {
    val rows = Profiling.equidepthBins(spark, Sf)
      .select("o_orderkey", "o_totalprice", "bucket")
      .as[(Long, Double, Long)].collect()
    val n = rows.length
    assert(n > 0)
    val byBucket = rows.groupBy(_._3)
    assert(byBucket.keySet === (0L until 10L).toSet, "every bucket populated")
    // ⌊rank·10/n⌋ sizes differ by at most 1
    val sizes = byBucket.view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"bucket sizes $sizes")
    assert(sizes.sum === n)
    // boundaries monotone in value: max of bucket b ≤ min of bucket b+1
    (0L until 9L).foreach { b =>
      assert(byBucket(b).map(_._2).max <= byBucket(b + 1).map(_._2).min,
        s"bucket $b overlaps ${b + 1}")
    }
    // spot-check against a driver-side exact rank
    val want = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((k, _, _), r0) => k -> r0.toLong * 10 / n }.toMap
    rows.foreach { case (k, _, b) => assert(b === want(k), s"order $k") }
  }

  test("p05 PSI: mass conservation, first-principles terms, near-zero on parity split") {
    val rows = Profiling.psiDrift(spark, Sf)
      .select("bin", "ref_n", "cur_n", "psi_term")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, Sf).select("doc_id").as[Long].collect()
    assert(rows.map(_._2).sum === docs.count(_ % 2 == 0), "ref mass")
    assert(rows.map(_._3).sum === docs.count(_ % 2 != 0), "cur mass")
    val nr = rows.map(_._2).sum; val nc = rows.map(_._3).sum
    rows.foreach { case (b, r, c, term) =>
      val p = (r + 1).toDouble / (nr + 10)
      val q = (c + 1).toDouble / (nc + 10)
      val ln6 = BigDecimal(math.log(p / q))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(term - (p - q) * ln6) < 1e-12, s"bin $b term")
    }
    // every PSI term is non-negative ((p−q) and ln(p/q) share sign; the
    // 1e-12 slack covers the DECIMAL-rounded ln at the p≈q boundary)
    rows.foreach { case (b, _, _, term) => assert(term >= -1e-12, s"bin $b negative") }
    // a parity split of one corpus is not REAL drift — it must stay
    // below the 0.25 "drifted" boundary even with the small-sample
    // inflation of 250-doc slices over 10 Laplace-smoothed bins (the
    // measured sf0.001 value is ~0.107: "moderate" by the convention,
    // exactly what sampling noise at n=250 produces)
    val psi = rows.map(_._4).sum
    assert(psi >= 0 && psi < 0.25, s"parity-split PSI out of range: $psi")
  }

  test("frequent-items sketch: no false negatives, bounds bracket truth, halves merge") {
    import spark.implicits._
    val docs = Tables.documents(spark, Sf)
    val exact = docs.select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    def check(result: Array[(String, Long, Long, Long)]): Unit = {
      assert(result.nonEmpty)
      val reported = result.map(_._1).toSet
      // bounds bracket the true count for every reported item
      result.foreach { case (tok, est, lb, ub) =>
        val truth = exact.getOrElse(tok, 0L)
        assert(lb <= truth && truth <= ub, s"$tok: [$lb,$ub] misses $truth")
        assert(lb <= est && est <= ub)
      }
      // no false negatives: any token whose true count exceeds the
      // sketch's max error MUST be reported (the published guarantee of
      // ErrorType.NO_FALSE_NEGATIVES at this map size). ub − lb is the
      // sketch's global error offset (0 while no purge ever happened).
      val maxErr = result.map(r => r._4 - r._3).max
      exact.foreach { case (tok, truth) =>
        if (truth > maxErr) assert(reported(tok), s"heavy $tok ($truth) missing")
      }
    }
    val whole = Profiling.sketchFrequentTokens(docs)
      .as[(String, Long, Long, Long)].collect()
    check(whole)
    // mergeability: the library surface IS the per-partition merge —
    // force a many-partition build and assert the same guarantees hold
    val repart = Profiling.sketchFrequentTokens(docs.repartition(7))
      .as[(String, Long, Long, Long)].collect()
    check(repart)
  }

  test("HLL sketches: union of half-sketches ≡ whole sketch, error bounded") {
    import spark.implicits._
    val ev = Tables.events(spark, Sf)
    val whole = Profiling.sketchDistinct(ev)
      .select("event_type", "approx_users", "exact_users")
      .as[(String, Long, Long)].collect()
    assert(whole.nonEmpty)
    // mergeability: sketch each event-id-parity half (users OVERLAP
    // across halves, so the union must dedup), union the sketches —
    // HLL unions take per-register maxima, so the estimate is IDENTICAL
    // to the whole-corpus sketch, not merely close
    val h1 = Profiling.sketchDistinct(ev.filter(col("event_id") % 2 === 0))
    val h2 = Profiling.sketchDistinct(ev.filter(col("event_id") % 2 === 1))
    val merged = Profiling.sketchUnion(
        h1.select("event_type", "sketch")
          .union(h2.select("event_type", "sketch")))
      .select("event_type", "approx_users")
      .as[(String, Long)].collect().toMap
    whole.foreach { case (t, approx, exact) =>
      assert(merged(t) === approx, s"$t: merged sketch diverged from whole")
      // lgK = 12 gives ~1.6% relative standard error; 5% is 3σ headroom
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"$t: approx $approx vs exact $exact")
    }
  }

  test("KLL sketches: estimates land within rank error, halves merge clean") {
    import spark.implicits._
    val ev = Tables.events(spark, Sf)
    // exact per-type sorted values, for TRUE-rank checks
    val exact = ev.select(col("event_type"), col("value").cast("double"))
      .as[(String, Double)].collect()
      .groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).sorted }
    // true rank of the estimate must land inside KLL's published bound:
    // ±1.65% normalized rank error at k=200; ×3 for test headroom
    def checkRank(t: String, q: Double, target: Double): Unit = {
      val vs = exact(t)
      val rank = vs.count(_ <= q).toDouble / vs.length
      assert(math.abs(rank - target) <= 3 * 0.0165,
        s"$t: p${(target * 100).toInt} estimate $q has true rank $rank")
    }
    val whole = Profiling.sketchQuantiles(ev)
      .select("event_type", "n", "p50", "p95")
      .as[(String, Long, Double, Double)].collect()
    assert(whole.nonEmpty)
    whole.foreach { case (t, n, p50, p95) =>
      assert(n === exact(t).length, s"$t: sketch n must be exact")
      checkRank(t, p50, 0.5)
      checkRank(t, p95, 0.95)
    }
    // mergeability: sketch halves, merge the fixed-size binaries — the
    // merged estimates obey the same rank bound and exact total count
    val h1 = Profiling.sketchQuantiles(ev.filter(col("event_id") % 2 === 0))
    val h2 = Profiling.sketchQuantiles(ev.filter(col("event_id") % 2 === 1))
    val merged = Profiling.sketchQuantileUnion(
        h1.select("event_type", "sketch").union(h2.select("event_type", "sketch")))
      .select("event_type", "n", "p50", "p95")
      .as[(String, Long, Double, Double)].collect()
    assert(merged.map(_._1).toSeq.sorted === whole.map(_._1).toSeq.sorted)
    merged.foreach { case (t, n, p50, p95) =>
      assert(n === exact(t).length, s"$t: merged sketch n must be exact")
      checkRank(t, p50, 0.5)
      checkRank(t, p95, 0.95)
    }
  }

  test("Theta sketches: overlap within bounds, half-merge is byte-identical") {
    import spark.implicits._
    val ev = Tables.events(spark, Sf)
    val sets = Profiling.sketchUserSets(ev)
    // exact user overlap between two event types, for the bound check
    val users = ev.select(col("event_type"), col("user_id"))
      .as[(String, Long)].collect()
      .groupBy(_._1).map { case (t, v) => t -> v.map(_._2).toSet }
    val (ta, tb) = ("click", "purchase")
    val exactInter = (users(ta) & users(tb)).size.toDouble
    val exactUnion = (users(ta) | users(tb)).size.toDouble
    val Seq((_, _, ie, lb, ub, ue, jac)) = Profiling.sketchOverlap(sets, ta, tb)
      .as[(String, String, Double, Double, Double, Double, Double)].collect().toSeq
    assert(lb <= exactInter && exactInter <= ub,
      s"exact overlap $exactInter outside [$lb, $ub]")
    assert(math.abs(ue - exactUnion) / exactUnion <= 0.05)
    assert(jac >= 0.0 && jac <= 1.0)
    // set-determined state: sketching each half and merging must yield
    // the BYTE-IDENTICAL compact sketch of the whole corpus (theta keeps
    // the k smallest hashes of the SET — order/partitioning-free)
    val h1 = Profiling.sketchUserSets(ev.filter(col("event_id") % 2 === 0))
    val h2 = Profiling.sketchUserSets(ev.filter(col("event_id") % 2 === 1))
    val merged2 = {
      import org.apache.datasketches.theta.{SetOperation, Sketches}
      import org.apache.datasketches.memory.Memory
      h1.union(h2).collect().groupBy(_.getString(0)).map { case (t, rows) =>
        val u = SetOperation.builder().buildUnion()
        rows.foreach(r => u.union(Sketches.wrapSketch(Memory.wrap(r.getAs[Array[Byte]](1)))))
        t -> u.getResult.compact().toByteArray
      }
    }
    val whole = sets.collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(merged2.keySet === whole.keySet)
    merged2.foreach { case (t, bytes) =>
      assert(java.util.Arrays.equals(bytes, whole(t)),
        s"$t: merged-halves sketch must be byte-identical to the whole")
    }
  }

  test("p06 diff counts are exact on a planted table and conserve row totals") {
    import spark.implicits._
    // doc_ids 1..30: prev drops 17 (→ added), drafts text on 10/20/30,
    // blanks lang on 13/26, and carries a synthetic 1000023 (→ removed)
    val dir = java.nio.file.Files.createTempDirectory("graft-diff").toString
    (1 to 30).map(i => (i.toLong, s"t$i", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.Profiling.tableDiff(spark, dir).head()
    val Seq(added, removed, changed, unchanged, cText, cLang, cSource) =
      (0 until 7).map(r.getLong)
    assert((added, removed, changed, unchanged) === ((1L, 1L, 5L, 24L)))
    assert((cText, cLang, cSource) === ((3L, 2L, 0L)))
    // conservation: every cur row is added|changed|unchanged; every
    // prev row is removed|changed|unchanged
    assert(added + changed + unchanged === 30L)
    assert(removed + changed + unchanged === 30L)
  }

  test("p08 skew profile: heavy hitters, shares, ratio-to-mean, top-k cut") {
    def ts(i: Int) = new java.sql.Timestamp(1704067200000L + i * 60000L)
    val dir = java.nio.file.Files.createTempDirectory("graft-skew").toString
    // 12 distinct keys: key 100 has 10 events (hot), keys 1..11 one each
    // → n_keys=12, total=21, mean=1.75; only the top 10 rows emit, so
    // the two largest single-event keys by id order (10, 11) fall out
    val evs = (Seq.fill(10)(100L) ++ (1L to 11L)).zipWithIndex.map {
      case (u, i) => (i.toLong, ts(i), u, "view", 1.0, "{}")
    }
    evs.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Profiling.skewProfile(spark, dir)
      .select("user_id", "n", "share", "ratio_to_mean", "n_keys", "total_rows")
      .as[(Long, Long, Double, Double, Long, Long)].collect().toSeq
    assert(got.size === 10)
    assert(got.head === (100L, 10L, 10.0 / 21, 10.0 * 12 / 21, 12L, 21L))
    // remaining 9 rows: the smallest-id single-event keys 1..9
    assert(got.tail.map(_._1) === (1L to 9L))
    assert(got.tail.forall(r => r._2 == 1L && r._3 == 1.0 / 21))
  }

  test("p09 FD profile: planted key violations and dependency breaks") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fd").toString
    Seq((1L, 10L, "1994-01-01", "1-URGENT"),
      (2L, 10L, "1994-01-01", "2-HIGH"),    // cust 10 → two priorities
      (3L, 20L, "1994-02-01", "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (1L, 2L), (2L, 1L))
      .toDF("l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "en", "a"), (2L, "en", "b"), (3L, "de", "c")) // en → two sources
      .toDF("doc_id", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Profiling.fdProfile(spark, dir)
      .select("rule", "lhs_count", "violations", "holds")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got === Seq(
      ("fd_custkey_to_orderpriority", 2L, 1L, false),
      ("fd_lang_to_source", 2L, 1L, false),
      ("fd_orderkey_to_orderdate", 3L, 0L, true),
      ("key_lineitem_orderkey_linenumber", 3L, 0L, true),
      ("key_orders_custkey", 3L, 1L, false),
      ("key_orders_orderkey", 3L, 0L, true)))
  }

  test("p07 MAD outliers: analytic fixture — robust to the outlier it flags") {
    def ts(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$i%02d:00")
    val dir = java.nio.file.Files.createTempDirectory("graft-mad").toString
    // type x: values 0,1,2,3,100 → med=2, devs {2,1,0,1,98} → MAD=1,
    //   thr=4.4478, exactly ONE outlier (98); mean±3σ would smear.
    // type y: constant values → MAD=0, thr=0, any deviation flags; all
    //   zero deviations → no outliers (dev > thr is strict).
    val xs = Seq(0.0, 1.0, 2.0, 3.0, 100.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, ts(i), 1L, "x", v, "{}")
    }
    val ys = Seq(5.0, 5.0, 5.0).zipWithIndex.map { case (v, i) =>
      (10L + i, ts(10 + i), 2L, "y", v, "{}")
    }
    (xs ++ ys).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Profiling.madOutliers(spark, dir)
      .select("event_type", "med", "mad", "thr", "n", "n_outliers", "max_dev")
      .as[(String, Double, Double, Double, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("x", 2.0, 1.0, 4.4478, 5L, 1L, 98.0),
      ("y", 5.0, 0.0, 0.0, 3L, 0L, 0.0)))
  }

  test("p10 planted: exact line recovers (r=1, slope, intercept); degenerates go NULL") {
    val df = Seq(
      // group a: y = 2x + 1 exactly → r 1, slope 2, intercept 1
      ("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0), ("a", 4.0, 9.0),
      // group b: y = -x + 10 → r -1, slope -1, intercept 10
      ("b", 1.0, 9.0), ("b", 3.0, 7.0), ("b", 5.0, 5.0),
      // group c: constant x → zero variance, every stat NULL
      ("c", 2.0, 1.0), ("c", 2.0, 9.0),
      // group d: constant y → r NULL (dy = 0) but slope/intercept real
      ("d", 1.0, 4.0), ("d", 2.0, 4.0)).toDF("flag", "x", "y")
    val got = Profiling.regressionProfileOver(df)
      .select("flag", "n", "pearson_r", "slope", "intercept")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(got === Seq(
      ("a", 4L, Some(1.0), Some(2.0), Some(1.0)),
      ("b", 3L, Some(-1.0), Some(-1.0), Some(10.0)),
      ("c", 2L, None, None, None),
      ("d", 2L, None, Some(0.0), Some(4.0))))
  }

  test("p10 on the corpus: r in [-1, 1], n conserves, slope consistent with cov/var") {
    val got = Profiling.regressionProfile(spark, Sf)
      .select("flag", "n", "pearson_r", "slope")
      .as[(String, Long, Double, Double)].collect().toSeq
    assert(got.nonEmpty)
    assert(got.map(_._2).sum === Tables.lineitem(spark, Sf).count())
    got.foreach { case (f, _, r, slope) =>
      assert(r >= -1.0 && r <= 1.0, s"group $f pearson out of range: $r")
      // this generator draws quantity and price INDEPENDENTLY (r ≈
      // −0.02 at sf0.001) — so the r/slope SIGNS must agree, which the
      // shared-covariance formula guarantees only if both sides
      // compute the same covariance
      assert(r == 0.0 || r * slope > 0, s"group $f r/slope signs disagree")
    }
  }

}
