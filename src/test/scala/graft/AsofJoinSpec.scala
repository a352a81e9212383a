package graft

import graft.operators.AsofJoin

/** The two-pass (key, time-bucket) as-of join must be row-identical to
  * the single-window plan — for ANY bucket width, including widths small
  * enough that most probes take the cross-bucket carry-in path and wide
  * enough that everything stays within one bucket. */
class AsofJoinSpec extends SparkSpec {

  private lazy val single =
    AsofJoin.errorAsofPurchase(spark, Sf).collect().toSeq

  test("single-window as-of join produces matches") {
    assert(single.nonEmpty)
    // at least one error should have a matched purchase
    assert(single.exists(r => !r.isNullAt(r.fieldIndex("purchase_event_id"))))
  }

  for (bucket <- Seq(600L, 3600L, 86400L, 30L * 86400L)) {
    test(s"bucketed as-of join (bucket ${bucket}s) equals the single-window plan") {
      val bucketed =
        AsofJoin.errorAsofPurchaseBucketed(spark, Sf, bucket).collect().toSeq
      assert(bucketed === single)
    }
  }
}
