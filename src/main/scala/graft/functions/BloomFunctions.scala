package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain

/** SQL surface for Spark's OWN bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter`, which Spark keeps
  * codegen'd but does not register as public SQL functions).
  *
  * Why expose them: a bloom filter over a join key is the SCAN-TIME
  * membership gate — the pattern that lets an incremental-ingest job test
  * "is this row already in the 100 TB history?" against a fixed-size
  * binary instead of shuffling the history (see [[graft.operators.LlmOps
  * .bloomGate]]). The runtime-filter optimizer only injects these into
  * shuffle joins it can see; registering them makes the same gate
  * available EXPLICITLY, so the filter can be built once, kept in a
  * one-row relation, and applied via a scalar subquery — the exact shape
  * `BloomFilterMightContain` requires (its type check rejects anything
  * but a foldable value or scalar subquery, which is what keeps the
  * filter a broadcast value rather than a per-row join).
  *
  * Both expressions are Spark's, unmodified: the aggregate builds
  * `org.apache.spark.util.sketch.BloomFilter` with partial/final merge
  * (executors each build over their partitions, buffers OR together —
  * fixed-size, like every sketch in [[graft.operators.Profiling]]), and
  * the probe is a codegen'd predicate that stays inside the scan's
  * whole-stage span.
  */
object BloomFunctions {
  val AggName = "graft_bloom_agg"
  val MightContainName = "graft_might_contain"

  val aggInfo: ExpressionInfo = new ExpressionInfo(
    classOf[BloomFilterAggregate].getName, AggName)

  /** `graft_bloom_agg(xxhash64(key) [, est_items [, num_bits]])` →
    * BINARY bloom filter of the LONG key column. */
  def aggBuilder(args: Seq[Expression]): Expression = {
    val agg = args match {
      case Seq(c)       => new BloomFilterAggregate(c)
      case Seq(c, n)    => new BloomFilterAggregate(c, n)
      case Seq(c, n, b) => new BloomFilterAggregate(c, n, b)
      case _ => throw new IllegalArgumentException(
        s"$AggName expects 1 to 3 arguments, got ${args.length}")
    }
    agg.toAggregateExpression()
  }

  val mightContainInfo: ExpressionInfo = new ExpressionInfo(
    classOf[BloomFilterMightContain].getName, MightContainName)

  /** `graft_might_contain((SELECT bloom FROM bf), xxhash64(key))` →
    * BOOLEAN; false is definitive (no false negatives), true is a
    * candidate that still needs the exact verify join. */
  def mightContainBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(bloom, value) => BloomFilterMightContain(bloom, value)
    case _ => throw new IllegalArgumentException(
      s"$MightContainName expects 2 arguments, got ${args.length}")
  }
}
