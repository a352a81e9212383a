package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions.{col, lit}

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

  test("bucketed as-of join on ONE hot key with ties — the skew case it exists for") {
    import spark.implicits._
    // a single user owning every event (the regime where the single-
    // window plan serializes), with reference-free leading errors,
    // same-timestamp purchase+error ties, and duplicate same-ts
    // purchases (the max-event_id dedup rule)
    val t0 = 1700000000L
    val rows = Seq(
      (1L, t0 + 5, 1L, "error", 0.0),            // before any purchase → null match
      (2L, t0 + 10, 1L, "purchase", 10.0),
      (3L, t0 + 10, 1L, "purchase", 11.0),       // same-ts dup: id 3 wins
      (4L, t0 + 10, 1L, "error", 0.0),           // tie with its own ts purchase
      (5L, t0 + 4000, 1L, "error", 0.0)          // match carried across buckets
    ) ++ (0 until 2000).flatMap { k =>           // the hot tail
      val ts = t0 + 5000 + k * 7L
      Seq((100L + 2 * k, ts, 1L, if (k % 3 == 0) "purchase" else "error", k.toDouble))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-asof").toString
    rows.toDF("event_id", "tsec", "user_id", "event_type", "value")
      .select(col("event_id"), (col("tsec") * 1000000000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val base = AsofJoin.errorAsofPurchase(spark, dir).collect().toSeq
    assert(base.nonEmpty)
    // leading error matches nothing; the tie error sees the SAME-ts
    // purchase with the max event_id
    val byId = base.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("purchase_event_id")))
    assert(byId(4L).getLong(byId(4L).fieldIndex("purchase_event_id")) === 3L)
    for (bucket <- Seq(13L, 3600L)) {
      assert(AsofJoin.errorAsofPurchaseBucketed(spark, dir, bucket).collect().toSeq === base,
        s"bucket $bucket diverged on the hot key")
    }
  }

  test("e42 nearest event: direction choice, exact tie → back, purchase-less null") {
    import spark.implicits._
    val t0 = 1700000000L
    val rows = Seq(
      // user 1: back 30 s away, fwd 15 s away → fwd wins
      (1L, t0 + 0, 1L, "purchase", 1.0),
      (2L, t0 + 30, 1L, "error", 0.0),
      (3L, t0 + 45, 1L, "purchase", 1.0),
      // user 2: only an earlier purchase → back
      (4L, t0 + 0, 2L, "purchase", 1.0),
      (5L, t0 + 500, 2L, "error", 0.0),
      // user 3: no purchase at all → null match
      (6L, t0 + 0, 3L, "error", 0.0),
      // user 4: exactly equidistant (10 s both ways) → back wins
      (7L, t0 + 0, 4L, "purchase", 1.0),
      (8L, t0 + 10, 4L, "error", 0.0),
      (9L, t0 + 20, 4L, "purchase", 1.0),
      // user 5: same-timestamp purchase → back with Δ = 0
      (10L, t0 + 7, 5L, "purchase", 1.0),
      (11L, t0 + 7, 5L, "error", 0.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-nearest").toString
    rows.toDF("event_id", "tsec", "user_id", "event_type", "value")
      .select(col("event_id"), (col("tsec") * 1000000000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = AsofJoin.nearestEvent(spark, dir)
      .select("event_id", "nearest_id", "direction", "abs_lag_us")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) "none" else r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got === Seq(
      (2L, 3L, "fwd", 15000000L),
      (5L, 4L, "back", 500000000L),
      (6L, -1L, "none", -1L),
      (8L, 7L, "back", 10000000L),
      (11L, 10L, "back", 0L)))
  }
}
