package graft

import graft.operators.{ConnectedComponents, LlmOps, PairGraph}
import org.apache.spark.sql.DataFrame

/** The two CC algorithms must agree with each other (and with a local
  * union-find) on every graph shape — and large/small-star must converge
  * on a chain whose diameter is far beyond what diameter-bound label
  * propagation could finish inside the round guard. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(es: Seq[(Long, Long)]): DataFrame = es.toDF("i", "j")

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.as[(Long, Long)].collect().toMap

  /** Reference union-find on the driver. */
  private def unionFind(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("large/small-star labels a high-diameter chain (diameter 119) to its min") {
    // label propagation needs `diameter` rounds — 119 would blow the
    // round guard; large/small-star must do it in O(log n).
    val chain = (0L until 119L).map(i => (i, i + 1))
    val got = labelsOf(ConnectedComponents.largeSmallStar(edgesDf(chain)))
    assert(got.size === 120)
    assert(got.values.toSet === Set(0L))
  }

  test("large/small-star on two components plus a 2-cycle shape") {
    val es = Seq((5L, 3L), (3L, 9L), (20L, 21L))
    val got = labelsOf(ConnectedComponents.largeSmallStar(edgesDf(es)))
    assert(got === Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("both algorithms agree with union-find on a deterministic pseudo-random graph") {
    // splitmix-ish arithmetic graph: deterministic, no RNG state.
    val es = (0 until 200).map { k =>
      val a = (k * 2654435761L) % 97
      val b = (k * 40503L + 7) % 97
      (math.min(a, b), math.max(a, b))
    }.filter { case (a, b) => a != b }
    val expected = unionFind(es)
    val ls = labelsOf(ConnectedComponents.largeSmallStar(edgesDf(es)))
    val lp = labelsOf(ConnectedComponents.minLabelPropagation(edgesDf(es)))
    assert(ls === expected)
    assert(lp === expected)
  }

  test("both algorithms agree on the real near-dup pair graph") {
    val edges = PairGraph.ngramJaccard(spark, Sf).select("i", "j")
    val ls = labelsOf(ConnectedComponents.largeSmallStar(edges))
    val lp = labelsOf(ConnectedComponents.minLabelPropagation(edges))
    assert(ls.nonEmpty, "corpus should contain planted near-dup pairs")
    assert(ls === lp)
  }

  test("empty edge set yields empty labels") {
    val empty = edgesDf(Seq.empty)
    assert(ConnectedComponents.largeSmallStar(empty).isEmpty)
    assert(ConnectedComponents.minLabelPropagation(empty).isEmpty)
  }
}
