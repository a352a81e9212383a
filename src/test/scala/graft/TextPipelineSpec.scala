package graft

import graft.operators.{RefQueries, TextPipeline}
import org.apache.spark.sql.functions._

/** Pins the normalized reference semantics of SURVEY.md §1.2 (quirks
  * Q1–Q7); the scalacheck tokenizer properties live in
  * [[TokenizerProps]]. */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def tokensOf(lines: String*): Seq[String] =
    TextPipeline.tokens(lines.toDF("value"), "value")
      .as[String].collect().toSeq

  // Q5 — tokenizer: lowercase, starts with a letter, may contain/end
  // with apostrophes; digits/underscores/accents never enter tokens.
  test("Q5: tokenizer matches the reference's [a-z][a-z']* semantics") {
    assert(tokensOf("Don't STOP-the thé 123abc x_y o'er'") ===
      Seq("don't", "stop", "the", "th", "abc", "x", "y", "o'er'"))
    assert(tokensOf("''' 42 !!!") === Seq.empty)
  }

  // Q1 — stop-word filtering is EXACT-match (the reference does substring
  // `find` over the whole stop line, which would also kill "abo"/"bove";
  // normalized semantics keep them).
  test("Q1: stop filter is exact membership, not substring") {
    val stop = TextPipeline.stopWords(spark, RefQueries.StopWordsPath)
    val stopSet = stop.as[String].collect().toSet
    assert(stopSet.contains("above") && stopSet.contains("ain't"))
    val toks = Seq("abo", "bove", "above").toDF("word")
    val kept = toks.join(stop, Seq("word"), "left_anti").as[String].collect().toSet
    assert(kept === Set("abo", "bove"))
  }

  // Q4 — wordCount total order: cnt ASC, word DESC (the reference's exact
  // comparator, wordCount.cpp:108-110); topK is cnt DESC, word DESC.
  test("Q4: wordCount/topK outputs follow the reference's total orders") {
    val wc = RefQueries.wordCount(spark)
      .select(col("cnt"), col("word")).as[(Long, String)].collect().toSeq
    assert(wc === wc.sortBy { case (c, w) => (c, ReverseString(w)) })
    val tk = RefQueries.topK(spark, 50)
      .select(col("cnt"), col("word")).as[(Long, String)].collect().toSeq
    assert(tk === tk.sortBy { case (c, w) => (-c, ReverseString(w)) })
  }
  private case class ReverseString(s: String)
  private implicit val revOrd: Ordering[ReverseString] =
    Ordering.by[ReverseString, String](_.s).reverse

  // Q7 — topK limits AFTER the stop filter: K survivors, none stop words.
  test("Q7: topK returns exactly K post-filter survivors") {
    val stopSet = TextPipeline.stopWords(spark, RefQueries.StopWordsPath)
      .as[String].collect().toSet
    val top = RefQueries.topK(spark, 50).select("word").as[String].collect()
    assert(top.length === 50)
    assert(top.forall(!stopSet.contains(_)))
  }

  // Q6 — line numbering: 0-based, dense, file order.
  test("Q6: linesWithIndex is 0-based and dense in file order") {
    val df = TextPipeline.linesWithIndex(spark, RefQueries.Dracula)
    val n = df.count()
    val idx = df.select("line").as[Long].collect().sorted
    assert(idx.head === 0L && idx.last === n - 1 && idx.distinct.length === n)
  }

  // Q2/Q3 — inverted index: ordered by word; postings sorted distinct
  // within the line range.
  test("Q2/Q3: inverted index is word-ordered with sorted distinct postings") {
    val rows = RefQueries.invertedIndex(spark)
      .select("word", "postings", "n_lines").as[(String, String, Long)].collect()
    assert(rows.map(_._1).toSeq === rows.map(_._1).sorted.toSeq)
    val nLines = TextPipeline.linesWithIndex(spark, RefQueries.Dracula).count()
    rows.foreach { case (_, postings, n) =>
      val ps = postings.split(",").map(_.toLong).toSeq
      assert(ps === ps.sorted, "postings sorted")
      assert(ps.distinct.length === ps.length, "postings distinct")
      assert(ps.length === n)
      assert(ps.forall(p => p >= 0 && p < nLines))
    }
  }
}
