package graft

import graft.operators.Relational
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for e35 cohort retention: generated
  * multi-user activity patterns (staggered first weeks, churn gaps,
  * comeback weeks) must reproduce an in-memory model of the cohort
  * matrix — cohort assignment by first-event ISO week, per-cell
  * distinct-user counts, cohort sizes, and the exact retention ratio.
  * Week-0 completeness (every cohort's k=0 cell counts the whole
  * cohort at 1.0) falls out of the model equality. */
object RetentionProps extends Properties("Retention") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  /** Per user: a first-active week 0..3 and a subset of later weeks
    * (offsets 1..6) they return in. */
  private val userGen: Gen[(Int, List[Int])] = for {
    start <- Gen.chooseNum(0, 3)
    later <- Gen.someOf(1 to 6).map(_.toList)
  } yield (start, later)

  private val corpusGen: Gen[List[(Int, List[Int])]] =
    Gen.nonEmptyListOf(userGen).map(_.take(8))

  property("matrix ≡ in-memory cohort model (cells, sizes, exact ratio)") =
    Prop.forAllNoShrink(corpusGen) { corpus =>
      import spark.implicits._
      // week w → Monday 2024-01-01 + 7w days, one event Wednesday 09:00
      def ts(w: Int) = java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(7L * w + 2).toString
          + " 09:00:00")
      var eid = 0L
      val events = corpus.zipWithIndex.flatMap { case ((start, later), u) =>
        (start :: later.map(start + _)).distinct.map { w =>
          eid += 1; (eid, ts(w), u.toLong + 1, "view", 1.0, "{}")
        }
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-retprops").toString
      events.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Relational.retention(spark, dir)
        .select("cohort", "week_k", "n_active", "n_cohort", "retention")
        .as[(String, Long, Long, Long, Double)].collect().toSet
      // model
      val byUser = corpus.zipWithIndex.map { case ((start, later), u) =>
        (u.toLong + 1, start, (start :: later.map(start + _)).distinct)
      }
      val cohortOf = byUser.map { case (u, s, _) => u -> s }.toMap
      val sizes = byUser.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      def weekStr(w: Int) =
        java.time.LocalDate.of(2024, 1, 1).plusDays(7L * w).toString
      val want = byUser
        .flatMap { case (u, s, weeks) => weeks.map(w => (s, w - s, u)) }
        .groupBy { case (s, k, _) => (s, k) }
        .map { case ((s, k), rows) =>
          val n = rows.map(_._3).distinct.size.toLong
          (weekStr(s), k.toLong, n, sizes(s), n.toDouble / sizes(s))
        }.toSet
      got == want
    }
}
