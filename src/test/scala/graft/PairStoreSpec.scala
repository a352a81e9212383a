package graft

import graft.operators.{LlmOps, PairStore}

/** The materialized-pair-relation composition (d46–d48): the store-fed
  * consumers must be indistinguishable from their recomputing twins,
  * and the publisher must be safely re-runnable. */
class PairStoreSpec extends SparkSpec {
  import spark.implicits._

  test("d46 publish manifest: all audits pass, published rows = pair count") {
    val manifest = PairStore.publish(spark, Sf)
      .select("check_name", "observed", "ok")
      .as[(String, Long, Boolean)].collect().toMap2
    val expected = LlmOps.jaccardPairs(spark, Sf, PairStore.Threshold).count()
    assert(manifest("rows_match_expected") === ((expected, true)))
    assert(manifest("null_keys") === ((0L, true)))
    assert(manifest("dup_keys") === ((0L, true)))
    assert(manifest("published_rows") === ((expected, true)))
  }

  test("d47 store-fed contamination ≡ recomputed d20, row for row") {
    val store = PairStore.storeContamination(spark, Sf).collect().toSeq
    val recomputed = LlmOps.contamination(spark, Sf).collect().toSeq
    assert(store === recomputed)
  }

  test("d48 store-fed edit verify ≡ recomputed d45, row for row") {
    val store = PairStore.storeEditVerify(spark, Sf).collect().toSeq
    val recomputed = LlmOps.editVerify(spark, Sf).collect().toSeq
    assert(store === recomputed)
  }

  test("d30b store-fed incremental dedup ≡ recomputed d30, row for row") {
    val store = PairStore.storeIncrementalDedup(spark, Sf).collect().toSeq
    val recomputed = LlmOps.incrementalDedup(spark, Sf).collect().toSeq
    assert(store === recomputed)
  }

  test("d49 store-fed clusters ≡ recomputed d19, row for row") {
    val store = PairStore.storeClusters(spark, Sf).collect().toSeq
    val recomputed = LlmOps.neardupClusters(spark, Sf).collect().toSeq
    assert(store === recomputed)
  }

  test("re-publish is safe: second publish leaves a complete readable store") {
    val first = PairStore.publish(spark, Sf).collect().toSeq
    val second = PairStore.publish(spark, Sf).collect().toSeq
    // deterministic corpus ⇒ identical manifest, and the swapped-in
    // table still feeds consumers correctly
    assert(second === first)
    assert(PairStore.storeEditVerify(spark, Sf).count() ===
      LlmOps.editVerify(spark, Sf).count())
  }

  private implicit class ToMap2(val rows: Array[(String, Long, Boolean)]) {
    def toMap2: Map[String, (Long, Boolean)] =
      rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
