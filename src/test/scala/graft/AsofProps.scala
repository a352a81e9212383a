package graft

import graft.operators.AsofJoin
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for the as-of join family: generated event
  * streams drawn from a SMALL timestamp pool (forcing purchase/purchase
  * ties, same-instant purchase+error pairs, and errors before any
  * purchase) must match an in-memory model of the contract — latest
  * purchase at-or-before per user, purchase-ts ties to max event_id,
  * same-instant purchases visible, unmatched errors kept with null
  * match — and the bucketed two-pass variant must agree at every
  * tested bucket width, including a 1-second width that forces the
  * cross-bucket carry-in on nearly every probe. */
object AsofProps extends Properties("AsofJoin") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private val Base = 1704067200L // 2024-01-01 00:00:00 UTC

  /** (userId, secondOffset, type) with offsets from a 6-value pool. */
  private val eventsGen: Gen[List[(Long, Long, String)]] =
    Gen.nonEmptyListOf(for {
      u <- Gen.chooseNum(1, 3)
      off <- Gen.oneOf(0L, 5L, 10L, 10L, 60L, 3700L) // 10 twice: ties
      t <- Gen.oneOf("purchase", "error", "view")
    } yield (u.toLong, off, t)).map(_.take(18))

  private def model(evs: List[(Long, Long, Long, String, Double)])
      : Set[(Long, Long, Option[Long], Option[Double], Option[Long])] = {
    // dedup purchases per (user, ts) keeping max event_id
    val purchases = evs.filter(_._4 == "purchase")
      .groupBy(e => (e._1, e._3)).map { case ((u, ts), rows) =>
        val top = rows.maxBy(_._2)
        (u, ts, top._2, top._5)
      }.toList
    evs.filter(_._4 == "error").map { case (u, eid, ts, _, _) =>
      val cand = purchases.filter(p => p._1 == u && p._2 <= ts)
      if (cand.isEmpty) (eid, u, None, None, None)
      else {
        val best = cand.maxBy(p => (p._2, p._3)) // latest ts, then max id
        (eid, u, Some(best._3), Some(best._4), Some(ts - best._2))
      }
    }.toSet
  }

  property("plain and bucketed as-of ≡ in-memory latest-at-or-before model") =
    Prop.forAllNoShrink(eventsGen) { raw =>
      import spark.implicits._
      val evs = raw.zipWithIndex.map { case ((u, off, t), i) =>
        (u, i.toLong + 1, Base + off, t, (i + 1) * 1.5)
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-asofprops").toString
      evs.map { case (u, eid, sec, t, v) =>
        (eid, new java.sql.Timestamp(sec * 1000L), u, t, v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val want = model(evs)
      def run(df: org.apache.spark.sql.DataFrame) = df
        .select("event_id", "user_id", "purchase_event_id", "purchase_value",
          "lag_seconds")
        .collect().map { r =>
          (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)),
            if (r.isNullAt(4)) None else Some(r.getLong(4)))
        }.toSet
      val plain = run(AsofJoin.errorAsofPurchase(spark, dir))
      val b1 = run(AsofJoin.errorAsofPurchaseBucketed(spark, dir, 1L))
      val b1h = run(AsofJoin.errorAsofPurchaseBucketed(spark, dir, 3600L))
      plain == want && b1 == want && b1h == want
    }
}
