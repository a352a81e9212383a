package graft

import graft.operators.Relational
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for e34 batch sessionization: generated
  * multi-user event streams (inter-event gaps drawn AROUND the 8h
  * boundary, including exactly-8h, plus timestamp ties resolved by
  * event_id) must produce exactly the sessions a direct in-memory fold
  * of the gap rule produces — counts, bounds, exact µs duration, and
  * distinct-type counts. Each sample drives the real Spark plan from a
  * parquet events table. */
object SessionizeProps extends Properties("Sessionize") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val GapS = 8L * 3600 // operator default, seconds

  /** Per user: 1..8 inter-event gaps in seconds — mostly near the
    * boundary (including exactly 8h and 8h±1s) and occasionally 0
    * (a timestamp tie, broken by event_id). */
  private val userGen: Gen[List[Long]] = Gen.nonEmptyListOf(Gen.oneOf[Long](
    0L, 60L, 3600L, GapS - 1, GapS, GapS + 1, 2 * GapS)).map(_.take(8))

  private val corpusGen: Gen[List[List[(Long, String)]]] =
    Gen.nonEmptyListOf(for {
      gaps <- userGen
      types <- Gen.listOfN(gaps.length, Gen.oneOf("view", "click", "purchase"))
    } yield gaps.scanLeft(0L)(_ + _).tail.zip(types)).map(_.take(5))

  private def model(events: List[(Long, Long, Long, String)]) // (uid, eid, sec, type)
      : List[(Long, Long, Long, Long, Long, Long)] = // uid, idx, n, startS, durUs, nTypes
    events.groupBy(_._1).toList.flatMap { case (uid, evs) =>
      val ordered = evs.sortBy(e => (e._3, e._2))
      val sessions = ordered.foldLeft(List.empty[List[(Long, Long, Long, String)]]) {
        case (acc, e) => acc match {
          case cur :: rest if e._3 - cur.head._3 <= GapS => (e :: cur) :: rest
          case _ => List(e) :: acc
        }
      }.reverse.map(_.reverse)
      sessions.zipWithIndex.map { case (s, i) =>
        (uid, i + 1L, s.length.toLong, s.head._3,
          (s.last._3 - s.head._3) * 1000000L, s.map(_._4).distinct.length.toLong)
      }
    }

  property("sessions ≡ in-memory gap-rule fold (counts, bounds, µs, types)") =
    Prop.forAllNoShrink(corpusGen) { corpus =>
      import spark.implicits._
      val base = 1704067200L // 2024-01-01 00:00:00 UTC, epoch seconds
      var eid = 0L
      val events = corpus.zipWithIndex.flatMap { case (evs, u) =>
        evs.map { case (sec, tpe) =>
          eid += 1
          (u.toLong + 1, eid, sec, tpe)
        }
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-sessprops").toString
      events.map { case (uid, id, sec, tpe) =>
        (id, new java.sql.Timestamp((base + sec) * 1000L), uid, tpe, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Relational.sessionize(spark, dir)
        .select("user_id", "session_idx", "n_events", "session_start",
          "dur_us", "n_types")
        .as[(Long, Long, Long, String, Long, Long)].collect().toList
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      val want = model(events).map { case (uid, idx, n, startS, durUs, nT) =>
        (uid, idx, n, fmt.format(java.time.Instant.ofEpochSecond(base + startS)),
          durUs, nT)
      }
      got.sorted == want.sorted
    }
}
