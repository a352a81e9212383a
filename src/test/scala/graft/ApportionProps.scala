package graft

import graft.operators.Relational
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for e41 usage apportionment: generated
  * interval sets (starts near midnight, durations long enough to cross
  * one or two day boundaries) must split exactly as the in-memory clamp
  * model says, and the apportioned mass must equal the raw duration
  * mass (conservation — the invariant billing audits actually check). */
object ApportionProps extends Properties("UsageApportion") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val DayMin = 1440L

  /** (start minute within a ~3-day span, duration knob k; duration is
    * (k+1) minutes). Starts cluster around midnights; durations include
    * day-crossing and exactly-one-day values. */
  private val evGen: Gen[(Long, Long)] = for {
    day <- Gen.choose(0L, 2L)
    off <- Gen.oneOf[Long](0L, 1L, 30L, DayMin - 90, DayMin - 1)
    k <- Gen.oneOf[Long](0L, 59L, 89L, DayMin - 1, DayMin)
  } yield (day * DayMin + off, k)

  private val corpusGen: Gen[List[List[(Long, Long)]]] =
    Gen.nonEmptyListOf(Gen.nonEmptyListOf(evGen).map(_.take(6))).map(_.take(4))

  /** In-memory clamp model: (userStartMin, durMin) → (dayIdx → coveredMin). */
  private def model(evs: List[(Long, Long)]): Map[Long, (Long, Long)] = {
    // dayIdx -> (n_intervals, coveredMin)
    evs.flatMap { case (startMin, durMin) =>
      val endMin = startMin + durMin
      val d0 = startMin / DayMin
      val d1 = (endMin - 1) / DayMin
      (d0 to d1).map { di =>
        val lo = math.max(startMin, di * DayMin)
        val hi = math.min(endMin, (di + 1) * DayMin)
        (di, hi - lo)
      }
    }.groupBy(_._1).map { case (di, xs) =>
      (di, (xs.length.toLong, xs.map(_._2).sum))
    }
  }

  property("splits ≡ clamp model; apportioned mass is conserved") =
    Prop.forAllNoShrink(corpusGen) { corpus =>
      import spark.implicits._
      val base = 1704067200L // 2024-01-01 00:00:00 UTC (midnight), seconds
      var eid = 0L
      val rows = corpus.zipWithIndex.flatMap { case (evs, u) =>
        evs.map { case (startMin, k) =>
          eid += 1
          (eid, new java.sql.Timestamp((base + startMin * 60) * 1000L),
            u.toLong + 1, "view", 1.0, s"""{"k": $k}""")
        }
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-apportprops").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Relational.usageApportion(spark, dir)
        .select("user_id", "day", "n_intervals", "usage_us")
        .as[(Long, String, Long, Long)].collect().toList
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd").withZone(java.time.ZoneOffset.UTC)
      val want = corpus.zipWithIndex.flatMap { case (evs, u) =>
        model(evs.map { case (s0, k) => (s0, k + 1) }).map { case (di, (n, covMin)) =>
          (u.toLong + 1,
            fmt.format(java.time.Instant.ofEpochSecond(base + di * DayMin * 60)),
            n, covMin * 60000000L)
        }
      }
      val conserved = got.map(_._4).sum ==
        corpus.flatten.map { case (_, k) => (k + 1) * 60000000L }.sum
      Prop(got.sorted == want.sorted) :| "splits" &&
        Prop(conserved) :| "mass conservation"
    }
}
