package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's three observable queries (SURVEY.md §2.2), Spark-first.
  *
  * The reference fuses tokenize+project+partial-agg into a hand-written
  * `map` (wordCount/wordCount.cpp:67-86) with a sum-combiner and a
  * thread-grid shuffle; here the same dataflow is declared and Catalyst
  * produces the identical shape for free: scan → generate →
  * Partial HashAggregate → shuffle → Final HashAggregate → sort. The
  * stop-word filter runs *before* the aggregation (the reference applies
  * it after the sort, at print time — wordCount/wordCount.cpp:151-157 —
  * pure wasted work; the filter commutes with the per-word count).
  */
object RefQueries {
  val RefDir = "/root/reference/phoenixLab"
  val Dracula = s"$RefDir/Dracula.txt"
  val Republic = s"$RefDir/File2ForLab3.txt"
  val StopWordsPath = s"$RefDir/Stop_Words.txt"

  private def cleanTokens(spark: SparkSession, textPath: String): DataFrame = {
    val toks = TextPipeline.tokens(spark.read.text(textPath), "value")
    // 182 stop words: broadcast anti-join, never a shuffle.
    toks.join(broadcast(TextPipeline.stopWords(spark, StopWordsPath)),
      Seq("word"), "left_anti")
  }

  /** Q-WC: word frequencies, `ORDER BY cnt ASC, word DESC` (the
    * reference's exact total order: wordCount/wordCount.cpp:108-110). */
  def wordCount(spark: SparkSession, textPath: String = Dracula): DataFrame =
    cleanTokens(spark, textPath)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").asc, col("word").desc)

  /** Q-TK: top-K words, `ORDER BY cnt DESC, word DESC LIMIT k`
    * (top50/top50.cpp:109-111,153-159). `.limit` after `orderBy` lets
    * Catalyst plan TakeOrderedAndProject — no full-result sort, unlike
    * the reference's whole-vocabulary merge sort. */
  def topK(spark: SparkSession, k: Int, textPath: String = Dracula): DataFrame =
    cleanTokens(spark, textPath)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").desc)
      .limit(k)

  /** Q-II: inverted index — word → sorted distinct 0-based line numbers
    * (invert/invert.cpp:67-105 emits (word, line); postings normalized
    * per SURVEY.md §1.2 Q2/Q3). Postings are emitted as a comma-joined
    * string so the oracle compare is layout-independent. */
  def invertedIndex(spark: SparkSession, textPath: String = Dracula): DataFrame = {
    val lines = TextPipeline.linesWithIndex(spark, textPath)
    TextPipeline.tokensWithLine(lines)
      .join(broadcast(TextPipeline.stopWords(spark, StopWordsPath)),
        Seq("word"), "left_anti")
      .groupBy("word")
      .agg(array_join(sort_array(collect_set(col("line"))), ",").as("postings"),
        countDistinct(col("line")).as("n_lines"))
      .orderBy("word")
  }
}
