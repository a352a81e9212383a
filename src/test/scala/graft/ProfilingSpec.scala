package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {

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
}
