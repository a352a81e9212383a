package graft

import graft.operators.Relational
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for e43 linear-interpolation fill:
  * generated per-user observation sets (irregular day spacing, multiple
  * same-day events that must sum first, scrambled arrival order) must
  * produce exactly the series an in-memory fold computes — a dense
  * spine over the observed span, observed days passing through as their
  * exact-decimal day sums, and every gap the linear value between its
  * bracketing observations. */
object InterpFillProps extends Properties("InterpFill") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  /** 1..6 observations per user on days drawn from a small pool (so
    * same-day collisions and multi-day gaps both occur). */
  private val obsGen: Gen[List[(Int, Double)]] = Gen.nonEmptyListOf(for {
    day <- Gen.oneOf(1, 2, 2, 5, 9, 10)
    v <- Gen.oneOf(-3.5, 0.0, 1.0, 8.25, 100.0)
  } yield (day, v)).map(_.take(6))

  private val corpusGen: Gen[List[(Long, List[(Int, Double)])]] =
    Gen.nonEmptyListOf(Gen.choose(1L, 3L).flatMap(u => obsGen.map(u -> _)))
      .map(_.take(4).groupBy(_._1).map { case (k, xs) => (k, xs.flatMap(_._2)) }.toList)

  property("series ≡ in-memory interpolation over exact day sums") =
    Prop.forAllNoShrink(corpusGen) { corpus =>
      import spark.implicits._
      val ev = corpus.flatMap { case (u, obs) =>
        obs.map { case (day, v) => (u, f"2024-02-$day%02d 12:00:00", v) }
      }.reverse.toDF("user_id", "ts", "value")
        .select(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("ts").cast("timestamp").as("ts"),
          org.apache.spark.sql.functions.col("value"))
      val got = Relational.interpFillOver(ev)
        .as[(Long, String, Double, Boolean)].collect().toList
      val want = corpus.flatMap { case (u, obs) =>
        val daily = obs.groupBy(_._1).map { case (d, xs) =>
          d -> xs.map(x => BigDecimal(x._2)).sum.toDouble
        }
        val (d0, d1) = (daily.keys.min, daily.keys.max)
        (d0 to d1).map { d =>
          val v = daily.get(d) match {
            case Some(x) => x
            case None =>
              val pd = daily.keys.filter(_ < d).max
              val nd = daily.keys.filter(_ > d).min
              val (pv, nv) = (daily(pd), daily(nd))
              val raw = pv + (nv - pv) * ((d - pd).toDouble / (nd - pd).toDouble)
              // mirror round4's decimal-cast canon
              BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
          (u, f"2024-02-$d%02d", v, !daily.contains(d))
        }
      }.sortBy(r => (r._1, r._2))
      Prop(got == want) :| s"got $got\nwant $want"
    }
}
