package graft

import org.apache.spark.sql.functions._

/** Pins the cross-engine float canonicalization contract (ADVICE r1):
  * doubles that fall EXACTLY on a half-boundary at the cast scale must
  * round half-away-from-zero — the rule DuckDB's double→DECIMAL cast
  * uses (verified: 0.0078125 → 0.007813 in both engines). */
class CanonSpec extends SparkSpec {
  import spark.implicits._

  test("DECIMAL(30,6) cast rounds half away from zero on exact boundaries") {
    // 2^-7 = 0.0078125 is exactly representable in binary and sits
    // exactly on a scale-6 half boundary.
    val out = Seq(0.0078125, -0.0078125).toDF("x")
      .select(Canon.dec(col("x")).cast("string")).as[String].collect().toSeq
    assert(out === Seq("0.007813", "-0.007813"))
  }

  test("dsum is order-independent (exact decimal accumulation)") {
    val xs = Seq.tabulate(1000)(i => math.pow(-1, i) * (1.0 / (i + 1)))
    val fwd = xs.toDF("x").select(Canon.dsum(col("x"))).as[Double].head()
    val rev = xs.reverse.toDF("x").repartition(7)
      .select(Canon.dsum(col("x"))).as[Double].head()
    assert(fwd === rev)
  }

  test("round4 divergence hazard: 17-digit shortest-repr boundary values") {
    // 951.3/48 = 19.818749999999997868… — its shortest round-trip repr
    // needs 17 digits, and Spark's string-based decimal cast correctly
    // rounds it DOWN to .8187, while DuckDB's ×10⁴-arithmetic cast lands
    // on .8188 (the product collides with 198187.5). This is WHY round4
    // must never wrap a single shared IEEE op (see Canon scaladoc and
    // e18b, which ships the raw quotient instead).
    val v = Seq(951.3).toDF("x")
      .select(Canon.round4(col("x") / 48)).as[Double].head()
    assert(v === 19.8187)
  }

  test("round2/round4 agree with DuckDB's double→decimal casts") {
    val r = Seq((2.675, 1.0049999999999999)).toDF("a", "b")
      .select(Canon.round2(col("a")), Canon.round4(col("b")))
      .as[(Double, Double)].collect().head
    // pinned against DuckDB: CAST(2.675::DOUBLE AS DECIMAL(30,2)) = 2.68,
    // CAST(1.0049999999999999::DOUBLE AS DECIMAL(30,4)) = 1.0050 — both
    // engines round the same binary double the same way.
    assert(r === ((2.68, 1.005)))
  }
}
