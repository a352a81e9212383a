package graft

import graft.operators.{PhoenixApi, RefQueries, TextPipeline}

/** The Phoenix-API facade must reproduce the reference queries exactly —
  * a ported Phoenix app and the DataFrame-native pipelines are two
  * implementations of one contract. */
class PhoenixApiSpec extends SparkSpec {
  import spark.implicits._

  test("sum-combiner facade wordCount ≡ DataFrame wordCount") {
    val facade = PhoenixApi.phoenixWordCount(spark)
      .as[(String, Long)].collect().toSeq
    val native = RefQueries.wordCount(spark)
      .as[(String, Long)].collect().toSeq
    assert(facade === native)
  }

  test("buffer-combiner facade (mapReduceGroups) reproduces the inverted index") {
    val lines = TextPipeline.linesWithIndex(spark, RefQueries.Dracula)
      .as[(String, Long)]
    val stop = TextPipeline.stopWords(spark, RefQueries.StopWordsPath)
      .as[String].collect().toSet
    // reduce sees the key's whole value list — the reference's
    // reduce_iterator (buffer_combiner) shape
    val facade = PhoenixApi.mapReduceGroups(lines)(
      { case (text, line) => PhoenixApi.tokenize(text).map(w => (w, line)) })(
      (word, ls) => (word, ls.toSeq.distinct.sorted.mkString(",")))
      .filter(r => !stop(r._1))
      .collect().toMap
    val native = RefQueries.invertedIndex(spark)
      .select("word", "postings").as[(String, String)].collect().toMap
    assert(facade === native)
  }

  test("one-combiner (F7): combine = keep-first yields one value per key") {
    val data = Seq("a" -> 1L, "a" -> 2L, "b" -> 7L).toDS()
    val out = PhoenixApi.mapReduce(data)(Seq(_))((a, _) => a)
      .collect().toMap
    assert(out.keySet === Set("a", "b"))
    assert(out("b") === 7L)
    assert(Set(1L, 2L).contains(out("a"))) // "any value" contract
  }

  test("t03 typed cogroup ≡ relational left-join rollup, zero-order customers kept") {
    import org.apache.spark.sql.functions._
    val got = operators.TypedOps.typedCogroup(spark, Sf)
      .select("c_custkey", "n_orders", "sum_spent")
      .as[(Long, Long, Double)].collect().toSeq
    val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val want = Tables.customer(spark, Sf).select(col("c_custkey"))
      .join(Tables.orders(spark, Sf)
        .select(col("o_custkey"), col("o_totalprice").cast(dec2).as("p")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_custkey")).as("n"),
        coalesce(sum(col("p")), lit(0).cast(dec2)).cast("double").as("s"))
      .orderBy("c_custkey")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === want)
    // the fixtures give every customer orders, so exercise the
    // left-complete (empty right iterator) branch on a planted pair of
    // tables: customer 2 has no orders and must still emit (0, 0.0)
    val dir = java.nio.file.Files.createTempDirectory("graft-cogroup").toString
    Seq((1L, "alice", 10.0), (2L, "bob", 20.0))
      .toDF("c_custkey", "c_name", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 1L, 100.50), (11L, 1L, 49.50))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val planted = operators.TypedOps.typedCogroup(spark, dir)
      .select("c_custkey", "c_name", "n_orders", "sum_spent")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(planted === Seq((1L, "alice", 2L, 150.0), (2L, "bob", 0L, 0.0)))
  }

  test("t05 geomean UDAF ≡ relational exp-of-mean-ln recompute") {
    import org.apache.spark.sql.functions._
    val got = operators.TypedOps.geomeanSql(spark, Sf)
      .as[(String, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    val want = Tables.lineitem(spark, Sf)
      .select(col("l_returnflag"),
        log(col("l_extendedprice").cast("double"))
          .cast(org.apache.spark.sql.types.DecimalType(30, 6)).as("lnp"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        graft.Canon.round4(
          exp(sum(col("lnp")).cast("double") / count(lit(1)))).as("g"))
      .orderBy("l_returnflag")
      .as[(String, Long, Double)].collect().toSeq
    assert(got === want)
  }

  test("t04 secondary sort ≡ lag-window recompute; scrambled write order is repaired") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = operators.TypedOps.secondarySort(spark, Sf)
      .select("user_id", "n_events", "max_gap_us", "n_incr", "first_type", "last_type")
      .as[(Long, Long, Long, Long, String, String)].collect().toSeq
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val want = Tables.events(spark, Sf)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .withColumn("incr", (col("value") > lag(col("value"), 1).over(w)).cast("long"))
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("user_id")))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        coalesce(max(col("gap")), lit(0L)).as("max_gap_us"),
        coalesce(sum(col("incr")), lit(0L)).as("n_incr"),
        max(when(col("rn") === 1, col("event_type"))).as("first_type"),
        max(when(col("rn") === col("cnt"), col("event_type"))).as("last_type"))
      .orderBy("user_id")
      .as[(Long, Long, Long, Long, String, String)].collect().toSeq
    assert(got === want)
    // planted: rows written in SCRAMBLED order — the shuffle-sort must
    // repair it, or max_gap/n_incr/first/last all come out wrong
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val dir = java.nio.file.Files.createTempDirectory("graft-secsort").toString
    Seq( // time order: (0,a,1.0) (10,b,5.0) (15,c,2.0) (45,d,3.0)
      (3L, ts(15), 1L, "c", 2.0, "{}"),
      (1L, ts(0), 1L, "a", 1.0, "{}"),
      (4L, ts(45), 1L, "d", 3.0, "{}"),
      (2L, ts(10), 1L, "b", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val planted = operators.TypedOps.secondarySort(spark, dir)
      .select("user_id", "n_events", "max_gap_us", "n_incr", "first_type", "last_type")
      .as[(Long, Long, Long, Long, String, String)].collect().toSeq
    assert(planted === Seq((1L, 4L, 30L * 60 * 1000000, 2L, "a", "d")))
  }
}
