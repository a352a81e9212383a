package graft.operators

import graft.{Canon, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator Spark has no built-in for (DuckDB/kdb/pandas
  * `merge_asof` semantics): for each left row, the single right row with
  * the greatest timestamp ≤ the left timestamp, per key.
  *
  * Implementation is the union-tag + window carry-forward plan
  * (SURVEY §2.4 custom-operator ladder step (a): composition of existing
  * operators, no custom physical node needed):
  *   1. union references (purchases) and probes (errors), tagged;
  *   2. one window per key ordered by (ts, tag): `last(ref, ignoreNulls)`
  *      over unbounded-preceding rows carries the latest reference
  *      forward into each probe row;
  *   3. keep probe rows.
  * One shuffle (the window), no join at all — the classic scale shape.
  * Caveat: the window partitions by the join key, so a single hot key
  * serializes; the 100 TB mitigation is [[errorAsofPurchaseBucketed]],
  * the two-pass (key, time-bucket) variant: bounded partitions in
  * exchange for one extra (much smaller) shuffle. AsofJoinSpec proves
  * the two plans row-identical across bucket widths, and the variant is
  * registered as its own query (e20b) against the same DuckDB ASOF
  * oracle.
  */
object AsofJoin {
  import Canon._

  /** The shared tagged stream: deduped purchase references (is_probe=0)
    * unioned with error probes (is_probe=1), one schema. References are
    * deduped per (user, ts) keeping max event_id — makes the as-of pick
    * unique, so Spark and DuckDB cannot disagree on ties. */
  private def taggedStream(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("p_event_id"))
      .join(e.select(col("event_id").as("p_event_id"), col("value").as("p_value")),
        "p_event_id")
      .select(col("user_id"), col("ts"), col("p_event_id"), col("p_value"),
        lit(0).as("is_probe"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"),
        col("event_id").cast("long").as("e_event_id"), col("value").as("e_value"),
        lit(1).as("is_probe"))
    purchases
      .select(col("user_id"), col("ts"), col("p_event_id"), col("p_value"),
        lit(null).cast("long").as("e_event_id"), lit(null).cast("double").as("e_value"),
        col("is_probe"))
      .unionByName(errors
        .select(col("user_id"), col("ts"), lit(null).cast("long").as("p_event_id"),
          lit(null).cast("double").as("p_value"), col("e_event_id"),
          col("e_value"), col("is_probe")))
  }

  /** The output contract shared by both variants. */
  private def finish(matched: DataFrame): DataFrame =
    matched
      .select(col("e_event_id").as("event_id"), col("user_id"),
        tsStr(col("ts")).as("err_ts"),
        col("m_event_id").as("purchase_event_id"),
        col("m_value").as("purchase_value"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("m_ts")))
          .as("lag_seconds"))
      .orderBy("event_id")

  /** For each `error` event: the latest `purchase` of the same user at
    * or before it (ties on purchase ts resolved to max event_id so both
    * engines agree), plus the lag in seconds. DuckDB oracle uses its
    * native ASOF LEFT JOIN. */
  def errorAsofPurchase(s: SparkSession, d: String): DataFrame = {
    // references sort before probes at equal ts (is_probe 0 < 1), so a
    // same-timestamp purchase IS visible to the error ("at or before").
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    finish(taggedStream(s, d)
      .withColumn("m_event_id", last(col("p_event_id"), ignoreNulls = true).over(w))
      .withColumn("m_ts", last(when(col("is_probe") === 0, col("ts")),
        ignoreNulls = true).over(w))
      .withColumn("m_value", last(col("p_value"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1))
  }

  /** The two-pass as-of join — same output contract as
    * [[errorAsofPurchase]], but no per-key serialization:
    *
    *   1. within-bucket pass: the carry-forward window partitions by
    *      (user, time-bucket), so a partition holds at most
    *      `bucketSeconds` worth of ONE user's events — bounded however
    *      hot the key;
    *   2. carry-in pass: the latest reference per (user, bucket) —
    *      REDUCED data, one row per non-empty bucket — is carried across
    *      buckets by a second window partitioned by user alone, shifted
    *      one bucket back (`rowsBetween(unbounded, -1)`);
    *   3. each probe coalesces its within-bucket match with the
    *      carry-in of its bucket.
    *
    * The hot-key window of pass 1 shrinks by the bucket count; the pass-2
    * window is over bucket summaries, not events, so the 100 TB skew
    * hazard (one partition = one whole hot key) is gone. */
  def errorAsofPurchaseBucketed(s: SparkSession, d: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val tagged = taggedStream(s, d)
      .withColumn("bkt", floor(unix_timestamp(col("ts")) / bucketSeconds))
    // pass 1: carry within (user, bucket) — identical ordering contract
    // to the single-window plan (references before probes at equal ts).
    val wIn = Window.partitionBy(col("user_id"), col("bkt"))
      .orderBy(col("ts").asc, col("is_probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = tagged
      .withColumn("in_event_id", last(col("p_event_id"), ignoreNulls = true).over(wIn))
      .withColumn("in_ts", last(when(col("is_probe") === 0, col("ts")),
        ignoreNulls = true).over(wIn))
      .withColumn("in_value", last(col("p_value"), ignoreNulls = true).over(wIn))
    // pass 2: latest reference per (user, bucket); struct max orders by
    // (ts, event_id) so the within-bucket winner matches pass 1's.
    val bucketLast = tagged.filter(col("is_probe") === 0)
      .groupBy(col("user_id"), col("bkt"))
      .agg(max(struct(col("ts"), col("p_event_id"), col("p_value"))).as("r"))
    // bucket spine: every (user, bucket) with any row, so probes in
    // reference-free buckets still receive a carry-in.
    val wCarry = Window.partitionBy(col("user_id")).orderBy(col("bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = tagged.select(col("user_id"), col("bkt")).distinct()
      .join(bucketLast, Seq("user_id", "bkt"), "left")
      .withColumn("c", last(col("r"), ignoreNulls = true).over(wCarry))
      .select(col("user_id"), col("bkt"), col("c"))
    finish(inBucket.filter(col("is_probe") === 1)
      .join(carryIn, Seq("user_id", "bkt"), "left")
      .withColumn("m_event_id",
        coalesce(col("in_event_id"), col("c").getField("p_event_id")))
      .withColumn("m_ts", coalesce(col("in_ts"), col("c").getField("ts")))
      .withColumn("m_value", coalesce(col("in_value"), col("c").getField("p_value"))))
  }

  /** e42 — NEAREST-event join (bidirectional as-of): for each error,
    * the purchase of the same user with the minimal |Δt| in EITHER
    * direction — sensor-fusion / log-correlation semantics where the
    * cause may be recorded just after the effect (a backward-only as-of
    * (e20) structurally misses the purchase 1 s in the future in favor
    * of one an hour in the past). Tie (equal µs |Δt| across directions)
    * resolves BACKWARD — deterministic in both engines; same-ts matches
    * are backward with Δt = 0 by the tag ordering.
    *
    * Plan: the same union-tag stream as e20, with TWO frames over ONE
    * window sort — carry-back (`last` over unbounded-preceding) and
    * carry-forward (`first` over unbounded-following) share the
    * (user_id, (ts, tag)) partitioning and sort, so the whole operator
    * is still one shuffle and no join. Deltas are integer µs (second
    * truncation would create false cross-engine ties — two purchases in
    * the same second straddling a probe). Errors with no purchase either
    * way keep NULL match columns (left-complete). */
  def nearestEvent(s: SparkSession, d: String): DataFrame = {
    val base = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_probe").asc)
    val wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val us = (c: org.apache.spark.sql.Column) => unix_micros(c.cast("timestamp"))
    taggedStream(s, d)
      .withColumn("b_id", last(col("p_event_id"), ignoreNulls = true).over(wb))
      .withColumn("b_ts", last(when(col("is_probe") === 0, col("ts")),
        ignoreNulls = true).over(wb))
      .withColumn("f_id", first(col("p_event_id"), ignoreNulls = true).over(wf))
      .withColumn("f_ts", first(when(col("is_probe") === 0, col("ts")),
        ignoreNulls = true).over(wf))
      .filter(col("is_probe") === 1)
      .withColumn("b_d", us(col("ts")) - us(col("b_ts")))
      .withColumn("f_d", us(col("f_ts")) - us(col("ts")))
      .withColumn("pick_back",
        col("b_id").isNotNull && (col("f_id").isNull || col("b_d") <= col("f_d")))
      .select(col("e_event_id").as("event_id"), col("user_id"),
        tsStr(col("ts")).as("err_ts"),
        when(col("pick_back"), col("b_id")).otherwise(col("f_id")).as("nearest_id"),
        when(col("b_id").isNull && col("f_id").isNull, lit(null).cast("string"))
          .when(col("pick_back"), lit("back")).otherwise(lit("fwd")).as("direction"),
        when(col("pick_back"), col("b_d")).otherwise(col("f_d")).as("abs_lag_us"))
      .orderBy("event_id")
  }
}
