package graft

import graft.operators.{LlmOps, Relational}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Physical-plan audits: the scale properties the operators claim must
  * be visible in the plans Catalyst actually produces. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, Sf).queryExecution.sparkPlan

  /** All physical nodes including physically-planned subqueries.
    * `collectWithSubqueries` is unusable here: on `sparkPlan` (pre-AQE) a
    * scalar/EXISTS subquery's `PlanExpression.plan` can still be a
    * LOGICAL plan, and the typed partial function then throws
    * ClassCastException on it — so descend manually and keep only
    * genuinely physical subtrees. */
  private def allPhysical(p: SparkPlan): Seq[SparkPlan] = {
    val subs = p.expressions
      .flatMap(_.collect {
        case pe: org.apache.spark.sql.catalyst.expressions.PlanExpression[_] => pe.plan
      })
      .collect { case sp: SparkPlan => sp }
    p +: (p.children ++ subs).flatMap(allPhysical)
  }

  test("no query plans a non-broadcast cartesian product") {
    // BroadcastNestedLoopJoin against a tiny broadcast side (query
    // vector, seed table, scalar count) is intentional in d03/d04/d07/
    // d10; an unbroadcast CartesianProductExec is never acceptable.
    SparkEntry.queries.keys.foreach { name =>
      val cartesians = allPhysical(planOf(name))
        .filter(_.isInstanceOf[CartesianProductExec])
      assert(cartesians.isEmpty, s"$name plans a cartesian product")
    }
  }

  test("top-k queries plan TakeOrderedAndProject, not a full sort") {
    Seq("e14_topk_orders", "d04_cosine_topk", "d05_embed_neardup").foreach { q =>
      assert(planOf(q).toString.contains("TakeOrderedAndProject"),
        s"$q should be a per-partition top-k")
    }
  }

  test("word count aggregates map-side before the shuffle") {
    val plan = planOf("q_wordcount").toString
    assert(plan.contains("partial_count"), "partial aggregation missing:\n" + plan.take(1500))
  }

  test("near-dup candidate generation is an equi-join, not a loop join") {
    val plan = planOf("d02_ngram_jaccard").toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      "shingle bucket join must hash/merge on the shingle key:\n" + plan.take(1500))
  }

  test("dimension joins broadcast the dimension side") {
    Seq("e02_broadcast_join", "e10_rollup_agg", "e19_region_supplier",
        "e22_sql_frontend").foreach { q =>
      assert(planOf(q).toString.contains("BroadcastHashJoin"),
        s"$q should broadcast its dimension tables")
    }
  }

  test("range join carries the time-bucket equi-key into the join") {
    val plan = planOf("e07_range_join").toString
    // join keys must include the bucket, not just user_id
    assert(plan.contains("bkt"), "bucketed key missing from range join:\n" + plan.take(1500))
    assert(!plan.contains("CartesianProduct"))
  }

  test("partitioned round-trip query prunes to the single-year directory") {
    val scan = planOf("f03_partitioned_parquet").collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .head
    val partFilters = scan.metadata("PartitionFilters")
    assert(partFilters.contains("o_year"),
      s"year predicate must prune partitions, got: $partFilters")
  }

  test("native cosine expression stays inside whole-stage codegen") {
    val df = LlmOps.embedNearDup(spark, Sf)
    df.collect() // run so AQE finalizes and codegen spans materialize
    val top = df.queryExecution.executedPlan
    val finalPlan = top.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
    }.headOption.getOrElse(top).toString
    // the projection computing cosine_sim must carry a `*(n)` prefix —
    // the WholeStageCodegen span marker — not sit in an interpreted
    // fallback Project (as the HOF `transform` casts do).
    val inCodegen = """\*\(\d+\) Project \[.*cosine_sim""".r
      .findFirstIn(finalPlan).isDefined
    assert(inCodegen,
      s"cosine_sim not under WholeStageCodegen:\n${finalPlan.take(1500)}")
  }
}
