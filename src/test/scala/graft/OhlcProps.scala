package graft

import graft.operators.Relational
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for e38 OHLC bars: generated multi-day
  * event sets (with deliberate same-timestamp collisions so the
  * event_id tie-break matters, and scrambled write order) must produce
  * exactly the bars an in-memory fold computes — open/close by the
  * total (ts, event_id) order, high/low/volume, exact-decimal mean. */
object OhlcProps extends Properties("OhlcBars") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  /** Per (type, day): 1..6 events as (secondOfDay drawn from a SMALL
    * pool so ties occur, value). */
  private val dayGen: Gen[List[(Long, Double)]] = Gen.nonEmptyListOf(for {
    sec <- Gen.oneOf[Long](0L, 60L, 60L, 3600L, 86399L)
    v <- Gen.oneOf(1.0, 2.5, 7.25, 100.0)
  } yield (sec, v)).map(_.take(6))

  private val corpusGen: Gen[List[((String, Int), List[(Long, Double)])]] =
    Gen.nonEmptyListOf(for {
      t <- Gen.oneOf("x", "y")
      day <- Gen.choose(1, 3)
      evs <- dayGen
    } yield ((t, day), evs)).map(_.take(6))
      // one generator entry per (type, day) bucket
      .map(_.groupBy(_._1).map { case (k, xs) => (k, xs.flatMap(_._2)) }.toList)

  property("bars ≡ in-memory fold over the (ts, event_id) total order") =
    Prop.forAllNoShrink(corpusGen) { corpus =>
      import spark.implicits._
      val base = 1704067200L // 2024-01-01 00:00:00 UTC
      var eid = 0L
      val rows = corpus.flatMap { case ((t, day), evs) =>
        evs.map { case (sec, v) =>
          eid += 1
          (eid, (t, day), sec, v)
        }
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-ohlcprops").toString
      // write in REVERSED order: arrival order must not matter
      rows.reverse.map { case (id, (t, day), sec, v) =>
        (id, new java.sql.Timestamp((base + (day - 1) * 86400L + sec) * 1000L),
          1L, t, v, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Relational.ohlcBars(spark, dir)
        .select("event_type", "day", "open", "high", "low", "close", "volume")
        .as[(String, String, Double, Double, Double, Double, Long)]
        .collect().toList
      val want = rows.groupBy(_._2).map { case ((t, day), evs0) =>
        val evs = rows.filter(_._2 == (t, day))
        val ordered = evs.sortBy(e => (e._3, e._1)) // (sec, event_id)
        (t, f"2024-01-$day%02d", ordered.head._4,
          evs.map(_._4).max, evs.map(_._4).min,
          ordered.last._4, evs.length.toLong)
      }.toList
      got.sorted == want.sorted
    }
}
