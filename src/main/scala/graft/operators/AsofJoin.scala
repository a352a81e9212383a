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
  * serializes; the 100 TB mitigation is the two-pass variant (per
  * (key, time-bucket) partial + carry the bucket-boundary reference
  * forward), which trades one extra shuffle for bounded partitions.
  */
object AsofJoin {
  import Canon._

  /** For each `error` event: the latest `purchase` of the same user at
    * or before it (ties on purchase ts resolved to max event_id so both
    * engines agree), plus the lag in seconds. DuckDB oracle uses its
    * native ASOF LEFT JOIN. */
  def errorAsofPurchase(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    // dedup references per (user, ts): keep max event_id — makes the
    // as-of pick unique, so Spark and DuckDB cannot disagree on ties.
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
    val unioned = purchases
      .select(col("user_id"), col("ts"), col("p_event_id"), col("p_value"),
        lit(null).cast("long").as("e_event_id"), lit(null).cast("double").as("e_value"),
        col("is_probe"))
      .unionByName(errors
        .select(col("user_id"), col("ts"), lit(null).cast("long").as("p_event_id"),
          lit(null).cast("double").as("p_value"), col("e_event_id"),
          col("e_value"), col("is_probe")))
    // references sort before probes at equal ts (is_probe 0 < 1), so a
    // same-timestamp purchase IS visible to the error ("at or before").
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_probe").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("m_event_id", last(col("p_event_id"), ignoreNulls = true).over(w))
      .withColumn("m_ts", last(when(col("is_probe") === 0, col("ts")),
        ignoreNulls = true).over(w))
      .withColumn("m_value", last(col("p_value"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("e_event_id").as("event_id"), col("user_id"),
        tsStr(col("ts")).as("err_ts"),
        col("m_event_id").as("purchase_event_id"),
        col("m_value").as("purchase_value"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("m_ts")))
          .as("lag_seconds"))
      .orderBy("event_id")
  }
}
