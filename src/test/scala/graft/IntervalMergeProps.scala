package graft

import graft.operators.Relational
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for e36 interval merge: generated per-user
  * interval sets (start gaps and durations drawn to produce nesting,
  * exact touching, same-start ties, and clean splits) must coalesce into
  * exactly the islands an in-memory sweep of the running-max-of-ends
  * rule produces — per island: event count, covered extent, and raw
  * duration mass. Each sample drives the real Spark plan from a parquet
  * events table. */
object IntervalMergeProps extends Properties("IntervalMerge") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  /** Per user, 1..8 events as (gap-to-previous-start minutes, k knob).
    * Durations are (k+1) minutes; gaps include 0 (same-start tie) and
    * values straddling every duration so nesting and touching occur. */
  private val userGen: Gen[List[(Long, Long)]] = Gen.nonEmptyListOf(for {
    gap <- Gen.oneOf[Long](0L, 1L, 5L, 10L, 60L, 61L, 120L)
    k <- Gen.oneOf[Long](0L, 4L, 9L, 59L)
  } yield (gap, k)).map(_.take(8))

  private val corpusGen: Gen[List[List[(Long, Long)]]] =
    Gen.nonEmptyListOf(userGen).map(_.take(5))

  /** The sweep model over (eid, startMin, durMin) already sorted:
    * islands split when start strictly exceeds the running max end. */
  private def model(evs: List[(Long, Long, Long)]): List[(Long, Long, Long)] = {
    // returns per island (n, covered_min, sum_dur_min) in island order
    val sorted = evs.sortBy(e => (e._2, e._1))
    val islands = sorted.foldLeft(List.empty[List[(Long, Long, Long)]]) {
      case (acc, e) => acc match {
        case cur :: rest if e._2 <= cur.map(c => c._2 + c._3).max => (e :: cur) :: rest
        case _ => List(e) :: acc
      }
    }.reverse.map(_.reverse)
    islands.map { isl =>
      val start = isl.map(_._2).min
      val end = isl.map(c => c._2 + c._3).max
      (isl.length.toLong, end - start, isl.map(_._3).sum)
    }
  }

  property("islands ≡ in-memory running-max-of-ends sweep") =
    Prop.forAllNoShrink(corpusGen) { corpus =>
      import spark.implicits._
      val base = 1704067200L // 2024-01-01 00:00:00 UTC, epoch seconds
      var eid = 0L
      val perUser = corpus.zipWithIndex.map { case (evs, u) =>
        val starts = evs.map(_._1).scanLeft(0L)(_ + _).tail
        val rows = starts.zip(evs.map(_._2)).map { case (startMin, k) =>
          eid += 1
          (eid, startMin, k + 1) // duration = (k+1) minutes
        }
        (u.toLong + 1, rows)
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-improps").toString
      perUser.flatMap { case (uid, rows) =>
        rows.map { case (id, startMin, durMin) =>
          (id, new java.sql.Timestamp((base + startMin * 60) * 1000L), uid,
            "view", 1.0, s"""{"k": ${durMin - 1}}""")
        }
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Relational.intervalMerge(spark, dir)
        .select("user_id", "island", "n_events", "covered_us", "sum_dur_us")
        .as[(Long, Long, Long, Long, Long)].collect().toList
      val want = perUser.flatMap { case (uid, rows) =>
        model(rows).zipWithIndex.map { case ((n, covMin, durMin), i) =>
          (uid, i + 1L, n, covMin * 60000000L, durMin * 60000000L)
        }
      }
      got.sorted == want.sorted
    }
}
