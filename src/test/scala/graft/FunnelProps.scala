package graft

import graft.operators.Relational
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for the e32 ordered funnel: generated
  * per-user event sets drawn from a SMALL timestamp pool (forcing the
  * boundary cases — a click at EXACTLY the first view's instant must
  * NOT count, purchases before the first view must NOT count) must
  * match an in-memory model of the strictly-after chaining:
  * first view → first click strictly after it → first purchase
  * strictly after that, stage = completed steps. */
object FunnelProps extends Properties("Funnel") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val Base = 1704067200L // 2024-01-01 00:00:00 UTC

  private val eventsGen: Gen[List[(Long, Long, String)]] =
    Gen.nonEmptyListOf(for {
      u <- Gen.chooseNum(1, 3)
      off <- Gen.oneOf(0L, 60L, 120L, 120L, 180L, 240L) // 120 twice: ties
      t <- Gen.oneOf("view", "click", "purchase", "error")
    } yield (u.toLong, off, t)).map(_.take(16))

  private def model(evs: List[(Long, Long, String)])
      : Map[Long, (Option[Long], Option[Long], Option[Long], Long)] =
    evs.map(_._1).distinct.map { u =>
      val mine = evs.filter(_._1 == u)
      def firstAfter(t: String, after: Option[Long]): Option[Long] = {
        val c = mine.filter(e => e._3 == t && after.forall(e._2 > _)).map(_._2)
        if (after == None && t != "view") None // unreachable guard
        else if (c.isEmpty) None else Some(c.min)
      }
      val v = { val vs = mine.filter(_._3 == "view").map(_._2)
        if (vs.isEmpty) None else Some(vs.min) }
      val c = v.flatMap(vt => firstAfter("click", Some(vt)))
      val p = c.flatMap(ct => firstAfter("purchase", Some(ct)))
      u -> ((v, c, p, Seq(v, c, p).count(_.isDefined).toLong))
    }.toMap

  property("stages ≡ in-memory strictly-after chain model") =
    Prop.forAllNoShrink(eventsGen) { raw =>
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-funprops").toString
      raw.zipWithIndex.map { case ((u, off, t), i) =>
        (i.toLong + 1, new java.sql.Timestamp((Base + off) * 1000L), u, t,
          1.0, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
      def str(o: Option[Long]) =
        o.map(s => fmt.format(java.time.Instant.ofEpochSecond(Base + s)))
      val got = Relational.funnel(spark, dir)
        .select("user_id", "first_view", "first_click_after",
          "first_purchase_after", "stage")
        .collect().map { r =>
          r.getLong(0) -> ((Option(r.getString(1)), Option(r.getString(2)),
            Option(r.getString(3)), r.getLong(4)))
        }.toMap
      val want = model(raw).map { case (u, (v, c, p, st)) =>
        u -> ((str(v), str(c), str(p), st))
      }
      got == want
    }
}
