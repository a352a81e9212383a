package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed Dataset surface: the reference's user-defined combiner/reducer
  * contract (SURVEY §2.3 — `map`/combiner/`reduce`/`sort` ≈ Spark's
  * `Aggregator[IN, BUF, OUT]`) exercised with case-class Encoders.
  */
object TypedOps {
  case class WordCount(word: String, cnt: Long)

  /** Bounded top-k Aggregator under the reference's top50 total order
    * (cnt DESC, word DESC — top50/top50.cpp:109-111). The buffer holds at
    * most 4k entries (trimmed on overflow), so map-side partial
    * aggregation ships k-ish rows per partition instead of the whole
    * vocabulary — the typed analog of TakeOrderedAndProject, and exactly
    * what the reference's full-sort-then-print-k does NOT do. */
  class TopKWords(k: Int) extends Aggregator[WordCount, Seq[WordCount], Seq[WordCount]] {
    private val ord: Ordering[WordCount] =
      Ordering.by((w: WordCount) => (w.cnt, w.word)) // ascending; take from the top
    private def trim(b: Seq[WordCount]): Seq[WordCount] =
      if (b.length <= 4 * k) b else b.sorted(ord.reverse).take(k)

    override def zero: Seq[WordCount] = Vector.empty
    override def reduce(b: Seq[WordCount], a: WordCount): Seq[WordCount] = trim(b :+ a)
    override def merge(x: Seq[WordCount], y: Seq[WordCount]): Seq[WordCount] = trim(x ++ y)
    override def finish(b: Seq[WordCount]): Seq[WordCount] = b.sorted(ord.reverse).take(k)
    override def bufferEncoder: Encoder[Seq[WordCount]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[WordCount]]()
    override def outputEncoder: Encoder[Seq[WordCount]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[WordCount]]()
  }

  /** Q-TK re-expressed on the typed API: tokenize → typed Dataset of
    * (word, cnt) → custom top-k Aggregator. Output and oracle are the
    * same as `q_topk` — the implementations must agree exactly. */
  def typedTopK(s: SparkSession, k: Int, textPath: String = RefQueries.Dracula): DataFrame = {
    import s.implicits._
    val counted = RefQueries.wordCount(s, textPath) // word, cnt (already stop-filtered)
      .as[WordCount]
    val top = counted.select(new TopKWords(k).toColumn).as[Seq[WordCount]]
    top.flatMap(identity)
      .select(col("word"), col("cnt"))
      .orderBy(col("cnt").desc, col("word").desc)
  }

  case class CustRow(c_custkey: Long, c_name: String)
  case class OrdRow(o_custkey: Long, o_totalprice: java.math.BigDecimal)

  /** t03 — typed COGROUP (`KeyValueGroupedDataset.cogroup`): per
    * customer, BOTH iterators at once — the customer row and ALL their
    * orders — folded imperatively into (n_orders, exact decimal spend).
    * Left-complete by construction: a customer with zero orders gets an
    * empty right iterator and still emits (the typed analog of a LEFT
    * JOIN + GROUP BY, which the relational oracle states directly).
    * This is the typed PORT surface, like t01/t02: cogroup is object
    * serde outside whole-stage codegen, so the relational form wins in
    * hot paths — cogroup earns its place when per-key logic genuinely
    * needs both sides as collections (merge-reconcile jobs, per-entity
    * sequence alignment), which no combination of typed joins gives.
    *
    * Exactness: prices are cast DECIMAL(18,2) in the PROJECTION (the
    * dsum discipline) so the per-customer BigDecimal fold is exact and
    * order-independent, then ONE decimal→double conversion both
    * engines compute identically. Both sides shuffle once on the
    * customer key. `cs` holds exactly one row (customer PK); an orphan
    * order (no matching customer — impossible under TPC-H referential
    * integrity) would emit nothing, matching the oracle's LEFT join. */
  def typedCogroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec2 = org.apache.spark.sql.types.DecimalType(18, 2)
    val c = graft.Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name")).as[CustRow]
    val o = graft.Tables.orders(s, d)
      .select(col("o_custkey"),
        col("o_totalprice").cast(dec2).as("o_totalprice")).as[OrdRow]
    c.groupByKey(_.c_custkey).cogroup(o.groupByKey(_.o_custkey)) { (k, cs, os) =>
      cs.map { cust =>
        var n = 0L
        var sum = java.math.BigDecimal.ZERO
        os.foreach { r => n += 1; sum = sum.add(r.o_totalprice) }
        (k, cust.c_name, n, sum)
      }
    }.toDF("c_custkey", "c_name", "n_orders", "sum_spent")
      .select(col("c_custkey"), col("c_name"), col("n_orders"),
        col("sum_spent").cast("double").as("sum_spent"))
      .orderBy("c_custkey")
  }

  case class GeoBuf(sum: java.math.BigDecimal, n: Long)

  /** Exact-decimal GEOMETRIC-mean Aggregator: buffer = (Σ canonicalized
    * ln terms as BigDecimal, n). Each ln(x) is rounded to 6 decimals
    * before the sum (the d34/d18/p05 ln discipline — libm `log`
    * implementations agree only to ~1 ulp, the canon absorbs it), the
    * decimal sum is exact and ORDER-INDEPENDENT (so partition merge
    * order cannot change the result — the property a plain double sum
    * lacks), and the finish is one division + one `exp`. */
  class GeoMean extends Aggregator[Double, GeoBuf, Double] {
    private def term(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(math.log(x))
        .setScale(6, java.math.RoundingMode.HALF_UP)
    override def zero: GeoBuf = GeoBuf(java.math.BigDecimal.ZERO, 0L)
    override def reduce(b: GeoBuf, x: Double): GeoBuf =
      GeoBuf(b.sum.add(term(x)), b.n + 1)
    override def merge(a: GeoBuf, b: GeoBuf): GeoBuf =
      GeoBuf(a.sum.add(b.sum), a.n + b.n)
    override def finish(b: GeoBuf): Double =
      if (b.n == 0) Double.NaN else math.exp(b.sum.doubleValue / b.n)
    override def bufferEncoder: Encoder[GeoBuf] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[GeoBuf]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Registers the typed aggregators as SQL-callable UDAFs — the API
    * path a library user takes to hand custom aggregation to SQL/BI
    * consumers (`SELECT graft_geomean(x) …`), completing the typed
    * surface: t01/t02 port combiners to Datasets, this ports them to
    * SQL. Idempotent per session. */
  def registerUdafs(s: SparkSession): Unit =
    s.udf.register("graft_geomean", udaf(new GeoMean))

  /** t05 — the registered UDAF exercised through the SQL surface:
    * geometric mean of `l_extendedprice` per return flag (the
    * multiplicative average — right for ratio-like quantities where one
    * huge order must not dominate the way it does an arithmetic mean).
    * The aggregate partial-combines map-side like any Aggregator; the
    * output is round4-contracted because the final `exp` is libm (1-ulp
    * cross-engine, same note as the ln terms). */
  def geomeanSql(s: SparkSession, d: String): DataFrame = {
    registerUdafs(s)
    graft.Tables.lineitem(s, d).createOrReplaceTempView("graft_t05_lineitem")
    s.sql("""SELECT l_returnflag, count(*) AS n,
        |  graft_geomean(l_extendedprice) AS geomean
        |FROM graft_t05_lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .select(col("l_returnflag"), col("n"),
        graft.Canon.round4(col("geomean")).as("geomean"))
  }

  case class SeqEv(user_id: Long, ts_us: Long, event_id: Long,
    event_type: String, value: Double)
  case class SeqStats(user_id: Long, n_events: Long, max_gap_us: Long,
    n_incr: Long, first_type: String, last_type: String)

  /** t04 — SECONDARY SORT (the classic MapReduce
    * sort-within-key-before-the-reducer idiom, the reference's sort
    * phase generalized): partition by user, let the SHUFFLE deliver each
    * user's events already ordered by (ts, event_id), and fold each
    * run in ONE streaming pass with O(1) state — no per-key buffer, no
    * window, no `collect_list`. The per-user outputs are
    * order-SENSITIVE (max inter-event gap, count of strictly-increasing
    * value steps, first/last type), which is exactly what plain
    * `groupByKey.mapGroups` cannot promise (its iterator order is
    * shuffle-arrival order) and what buffering a group to sort it in
    * memory pays O(group) for — the skew failure mode secondary sort
    * exists to avoid.
    *
    * Plan: `repartition(user_id)` + `sortWithinPartitions` = the
    * exchange's own sort (one shuffle, sort amortized into the merge),
    * then a streaming `mapPartitions` whose iterator groups consecutive
    * equal keys. Like t03, the typed fold is object-serde outside
    * whole-stage codegen — the relational window form wins for these
    * particular stats; the pattern earns its keep when the per-key fold
    * is genuinely imperative (sequence alignment, legacy reducer ports).
    * All emitted values are integer counts/µs diffs — engine-exact. */
  def secondarySort(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = graft.Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("ts_us"),
        col("event_id"), col("event_type"), col("value")).as[SeqEv]
    ds.repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts_us", "event_id")
      .mapPartitions { it =>
        new Iterator[SeqStats] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): SeqStats = {
            val h = buf.next()
            var n = 1L; var maxGap = 0L; var nIncr = 0L
            var prevTs = h.ts_us; var prevV = h.value; var last = h.event_type
            while (buf.hasNext && buf.head.user_id == h.user_id) {
              val e = buf.next()
              n += 1
              if (e.ts_us - prevTs > maxGap) maxGap = e.ts_us - prevTs
              if (e.value > prevV) nIncr += 1
              prevTs = e.ts_us; prevV = e.value; last = e.event_type
            }
            SeqStats(h.user_id, n, maxGap, nIncr, h.event_type, last)
          }
        }
      }
      .toDF()
      .orderBy("user_id")
  }
}
