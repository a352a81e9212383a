package graft

import graft.operators.TransitiveClosure
import org.apache.spark.sql.DataFrame

/** e45 — directed min-hop closure: the BFS kernel against a driver-side
  * reference BFS on planted and pseudo-random DAGs, cycle termination,
  * and the registry fixture's structural invariants. */
class TransitiveClosureSpec extends SparkSpec {
  import spark.implicits._

  private def run(roots: Seq[Long], edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    TransitiveClosure.minHopClosure(
      roots.map(r => (r, r)).toDF("root", "node"),
      edges.toDF("src", "dst"))
      .as[(Long, Long, Long)].collect().toSet

  /** Reference BFS on the driver. */
  private def bfs(roots: Seq[Long], edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    roots.flatMap { r =>
      val byLevel = scala.collection.mutable.Map(r -> 0L)
      var level = 0L
      var front = Set(r)
      while (front.nonEmpty) {
        level += 1
        front = front.flatMap(n => adj.getOrElse(n, Nil))
          .filterNot(byLevel.contains)
        front.foreach(n => byLevel(n) = level)
      }
      byLevel.map { case (n, h) => (r, n, h) }
    }.toSet
  }

  test("planted diamond: min over the two paths, shared node at hops 2") {
    // 10 → 5 → 1 and 10 → 3 → 1: node 1 is reachable two ways, both
    // length 2; node 1 also directly at 10 → 1 would shorten it
    val got = run(Seq(10L), Seq((10L, 5L), (10L, 3L), (5L, 1L), (3L, 1L)))
    assert(got === Set((10L, 10L, 0L), (10L, 5L, 1L), (10L, 3L, 1L),
      (10L, 1L, 2L)))
    // add the shortcut: min drops to 1
    val shortcut = run(Seq(10L),
      Seq((10L, 5L), (10L, 3L), (5L, 1L), (3L, 1L), (10L, 1L)))
    assert(shortcut(((10L, 1L, 1L))))
  }

  test("cycle terminates: revisits lose the anti-join") {
    val got = run(Seq(1L), Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(got === Set((1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L)))
  }

  test("empty edges: seeds only at hops 0; empty roots: empty") {
    assert(run(Seq(7L, 9L), Nil) === Set((7L, 7L, 0L), (9L, 9L, 0L)))
    assert(run(Nil, Seq((1L, 2L))) === Set.empty)
  }

  test("multi-root pseudo-random DAGs ≡ reference BFS") {
    // deterministic edge soup over 40 nodes, edges only high → low
    // (DAG); three seeds exercise overlapping reachable sets
    for (seed <- Seq(11L, 29L, 57L)) {
      val edges = (0L until 120L).flatMap { k =>
        val a = (k * seed * 31 + 17) % 40
        val b = (k * seed * 53 + 5) % 40
        if (a > b) Some((a, b)) else if (b > a) Some((b, a)) else None
      }.distinct
      val roots = Seq(39L, 38L, 25L)
      assert(run(roots, edges) === bfs(roots, edges), s"seed $seed")
    }
  }

  private def runDoubling(roots: Seq[Long],
      edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    TransitiveClosure.minHopClosureDoubling(
      roots.map(r => (r, r)).toDF("root", "node"),
      edges.toDF("src", "dst"))
      .as[(Long, Long, Long)].collect().toSet

  test("e45b path doubling ≡ BFS on planted shapes and pseudo-random DAGs") {
    // the two kernels share one contract; every case the BFS suite
    // pins must come out identical from the doubling plan
    val diamond = Seq((10L, 5L), (10L, 3L), (5L, 1L), (3L, 1L))
    assert(runDoubling(Seq(10L), diamond) === run(Seq(10L), diamond))
    assert(runDoubling(Seq(7L, 9L), Nil) === Set((7L, 7L, 0L), (9L, 9L, 0L)))
    assert(runDoubling(Nil, Seq((1L, 2L))) === Set.empty)
    for (seed <- Seq(11L, 29L)) {
      val edges = (0L until 120L).flatMap { k =>
        val a = (k * seed * 31 + 17) % 40
        val b = (k * seed * 53 + 5) % 40
        if (a > b) Some((a, b)) else if (b > a) Some((b, a)) else None
      }.distinct
      val roots = Seq(39L, 38L, 25L)
      assert(runDoubling(roots, edges) === bfs(roots, edges), s"seed $seed")
    }
  }

  test("e45b cycle: a lap never shortens a path, fixpoint terminates") {
    assert(runDoubling(Seq(1L), Seq((1L, 2L), (2L, 3L), (3L, 1L))) ===
      Set((1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L)))
  }

  test("deep chain: BFS refuses past MaxRounds (pinned message), doubling solves it") {
    // depth 79 > the BFS round budget of 60 — the contract boundary the
    // round-11 verdict flagged as untested: the require must name the
    // swap, and the swap must actually solve the same graph
    val chain = (1L to 79L).map(k => (k, k - 1L))
    val ex = intercept[IllegalArgumentException] {
      run(Seq(79L), chain)
    }
    assert(ex.getMessage.contains("path-doubling"),
      s"the BFS refusal must name the swap: ${ex.getMessage}")
    val got = runDoubling(Seq(79L), chain)
    assert(got === (0L to 79L).map(q => (79L, q, 79L - q)).toSet)
  }

  test("e45b fixture invariants: block-bounded chains, exact hop arithmetic") {
    val rows = TransitiveClosure.deepChainReachability(spark, Sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (root, node, hops) =>
      assert(root % 64 === 63, "roots are block tops")
      assert(node / 64 === root / 64, "reach never crosses a block")
      assert(hops === root - node, "chain hops are exact differences")
    }
  }

  test("e45 fixture invariants: roots self-labeled, hops bounded by log2, " +
    "every non-root hop has a parent one hop up") {
    val rows = TransitiveClosure.bomReachability(spark, Sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val byRoot = rows.groupBy(_._1)
    byRoot.foreach { case (r, rs) =>
      assert(rs.contains((r, r, 0L)), s"root $r must self-label at 0")
      val maxHops = rs.map(_._3).max
      assert(maxHops <= 1 + (math.log(r.toDouble.max(2)) / math.log(2)).toLong,
        s"root $r depth $maxHops exceeds halving bound")
      // every hop-k node (k ≥ 1) is p div 2 or p div 3 of some hop-(k−1)
      val atHop = rs.groupBy(_._3).view.mapValues(_.map(_._2).toSet).toMap
      rs.filter(_._3 > 0).foreach { case (_, n, h) =>
        val parents = atHop.getOrElse(h - 1, Set.empty)
        assert(parents.exists(p => p / 2 == n || p / 3 == n),
          s"node $n at hop $h under root $r has no parent at ${h - 1}")
      }
    }
  }
}
