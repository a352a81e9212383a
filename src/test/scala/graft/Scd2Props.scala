package graft

import graft.operators.Relational
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for e31 SCD2 interval building: generated
  * per-user event-type sequences (with immediate repeats, so runs
  * actually compress, and timestamp ties broken by event_id) must match
  * an in-memory model of the change-point rule — keep a row iff its
  * type differs from the previous row's, close each interval at the
  * next change point, version by change ordinal, exactly one open
  * (is_current) interval per user. */
object Scd2Props extends Properties("Scd2") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val Base = 1704067200L

  private val eventsGen: Gen[List[(Long, Long, String)]] =
    Gen.nonEmptyListOf(for {
      u <- Gen.chooseNum(1, 3)
      off <- Gen.oneOf(0L, 60L, 60L, 120L, 180L) // ties: event_id breaks
      t <- Gen.oneOf("up", "down", "down") // repeats force compression
    } yield (u.toLong, off, t)).map(_.take(14))

  private def model(evs: List[(Long, Long, Long, String)]) // (u, eid, sec, t)
      : Set[(Long, Long, String, Long, Option[Long], Boolean)] =
    evs.groupBy(_._1).flatMap { case (u, mine) =>
      val ordered = mine.sortBy(e => (e._3, e._2))
      val changes = ordered.zip(None +: ordered.map(e => Some(e._4)).init)
        .collect { case (e, prev) if !prev.contains(e._4) => e }
      changes.zipWithIndex.map { case ((_, _, sec, t), i) =>
        val to = if (i + 1 < changes.size) Some(changes(i + 1)._3) else None
        (u, i.toLong + 1, t, sec, to, to.isEmpty)
      }
    }.toSet

  property("intervals ≡ in-memory change-point model; one current per user") =
    Prop.forAllNoShrink(eventsGen) { raw =>
      import spark.implicits._
      val evs = raw.zipWithIndex.map { case ((u, off, t), i) =>
        (u, i.toLong + 1, Base + off, t)
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-scdprops").toString
      evs.map { case (u, eid, sec, t) =>
        (eid, new java.sql.Timestamp(sec * 1000L), u, t, 1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      def str(sec: Long) = fmt.format(java.time.Instant.ofEpochSecond(sec))
      val got = Relational.scd2Intervals(spark, dir)
        .select("user_id", "version", "event_type", "valid_from", "valid_to",
          "is_current")
        .collect().map { r =>
          (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
            Option(r.getString(4)), r.getBoolean(5))
        }.toSet
      val want = model(evs).map { case (u, v, t, from, to, cur) =>
        (u, v, t, str(from), to.map(str), cur)
      }
      got == want
    }
}
