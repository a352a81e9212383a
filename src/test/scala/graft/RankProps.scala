package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for the shared distributed-rank kernel
  * (`Profiling.globalRankByRange` — the p04/d50 backbone): for ANY
  * input, shard count, and sort direction, `rank0` must equal the row's
  * index in the totally-ordered input. Values are drawn from a small
  * pool so duplicate sort prefixes are common (the tie-break id column
  * must resolve them), and shard counts below/above the row count
  * exercise empty shards and the one-shard degenerate case. */
object RankProps extends Properties("GlobalRank") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val sample: Gen[(List[Double], Int, Boolean)] = for {
    vs <- Gen.nonEmptyListOf(Gen.chooseNum(0, 9).map(_ / 2.0)).map(_.take(60))
    shards <- Gen.oneOf(1, 5, 32)
    desc <- Gen.oneOf(true, false)
  } yield (vs, shards, desc)

  property("rank0 ≡ index in the totally-ordered input, any shards/direction") =
    Prop.forAllNoShrink(sample) { case (vs, shards, desc) =>
      import spark.implicits._
      // each kernel call persists its shards; don't let samples accumulate
      spark.sharedState.cacheManager.clearCache()
      val rows = vs.zipWithIndex.map { case (v, id) => (v, id.toLong) }
      val df = rows.toDF("v", "id")
      val sort = if (desc) Seq(col("v").desc, col("id")) else Seq(col("v"), col("id"))
      val got = Profiling.globalRankByRange(df, sort, shards)
        .select("id", "rank0").as[(Long, Long)].collect().toMap
      val ordered =
        if (desc) rows.sortBy { case (v, id) => (-v, id) }
        else rows.sortBy { case (v, id) => (v, id) }
      val want = ordered.zipWithIndex.map { case ((_, id), r) => id -> r.toLong }.toMap
      got == want
    }
}
