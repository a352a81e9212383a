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
}
