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
}
