package graft

import graft.operators.TypedOps
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for t04 secondary sort: generated per-user
  * event sequences (including timestamp ties broken by event_id, and
  * value plateaus where "strictly increasing" matters) must fold to
  * exactly the order-sensitive stats an in-memory sorted fold computes.
  * Each sample drives the real shuffle-sorted mapPartitions plan. */
object SecondarySortProps extends Properties("SecondarySort") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val userGen: Gen[List[(Long, Double, String)]] = // (gapSec, value, type)
    Gen.nonEmptyListOf(for {
      gap <- Gen.oneOf[Long](0L, 1L, 60L, 3600L)
      v <- Gen.oneOf(1.0, 2.0, 2.0, 5.0) // plateaus on purpose
      t <- Gen.oneOf("view", "click", "purchase")
    } yield (gap, v, t)).map(_.take(8))

  private def model(evs: List[(Long, Long, Double, String)]) // (eid, sec, v, t)
      : (Long, Long, Long, String, String) = {
    val sorted = evs.sortBy(e => (e._2, e._1))
    val n = sorted.length.toLong
    val gaps = sorted.sliding(2).collect { case List(a, b) => b._2 - a._2 }.toList
    val maxGap = if (gaps.isEmpty) 0L else gaps.max
    val incr = sorted.sliding(2).count { case List(a, b) => b._3 > a._3; case _ => false }
    (n, maxGap * 1000000L, incr.toLong, sorted.head._4, sorted.last._4)
  }

  property("order-sensitive per-key stats ≡ in-memory sorted fold") =
    Prop.forAllNoShrink(Gen.nonEmptyListOf(userGen).map(_.take(5))) { corpus =>
      import spark.implicits._
      val base = 1704067200L
      var eid = 0L
      val perUser = corpus.zipWithIndex.map { case (evs, u) =>
        val secs = evs.map(_._1).scanLeft(0L)(_ + _).tail
        val rows = secs.zip(evs).map { case (sec, (_, v, t)) =>
          eid += 1
          (eid, sec, v, t)
        }
        (u.toLong + 1, rows)
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-ssprops").toString
      // write SCRAMBLED (reverse) so arrival order ≠ time order
      perUser.flatMap { case (uid, rows) =>
        rows.reverse.map { case (id, sec, v, t) =>
          (id, new java.sql.Timestamp((base + sec) * 1000L), uid, t, v, "{}")
        }
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = TypedOps.secondarySort(spark, dir)
        .select("user_id", "n_events", "max_gap_us", "n_incr", "first_type", "last_type")
        .as[(Long, Long, Long, Long, String, String)].collect().toList
      val want = perUser.map { case (uid, rows) =>
        val (n, g, i, f, l) = model(rows)
        (uid, n, g, i, f, l)
      }
      got.sorted == want.sorted
    }
}
