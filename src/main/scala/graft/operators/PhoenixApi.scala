package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's MapReduce PROGRAMMING surface re-expressed on typed
  * Datasets — the port path for a Phoenix application: supply the same
  * `map` and combiner functions the C++ template took
  * (`MapReduce<Impl, D, K, V, Container>`, reference
  * include/map_reduce.h:46-189) and the engine handles split, shuffle,
  * reduce, and sort.
  *
  * Mapping of the Phoenix contract (SURVEY §2.1):
  *  - split (F1/F2): the Dataset's own partitioning;
  *  - map + emit_intermediate (F4): `flatMap` to (K, V) pairs;
  *  - associative/sum combiner (F6): the `combine` function, applied
  *    map-side AND reduce-side by `reduceGroups` (Spark plans
  *    partial/final aggregation exactly like Phoenix's per-thread
  *    hash table + reduce-task merge, F8–F10);
  *  - one_combiner (F7): `combine = (a, _) => a`;
  *  - buffer_combiner (F5): use [[mapReduceGroups]] — the reducer sees
  *    the whole value list, like Phoenix's reduce_iterator;
  *  - merge/sort (F11/F12): order the returned Dataset.
  */
object PhoenixApi {

  /** Phoenix MapReduce with an associative combiner (F6 / sum_combiner
    * shape). Work per key is O(1) state — safe at any key cardinality. */
  def mapReduce[D, K, V](input: Dataset[D])(
      map: D => IterableOnce[(K, V)])(combine: (V, V) => V)(
      implicit ekv: Encoder[(K, V)], ek: Encoder[K]): Dataset[(K, V)] =
    input.flatMap(map)
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, combine(a._2, b._2)))
      .map(_._2)

  /** Phoenix MapReduce with a buffer combiner (F5): the reducer receives
    * every value of a key, like the reference's `reduce_iterator`
    * (include/combiner.h:37-105). The whole group materializes per key —
    * exactly the reference's memory behavior, and the reason F6 is
    * preferred when the reduction is associative. */
  def mapReduceGroups[D, K, V, O](input: Dataset[D])(
      map: D => IterableOnce[(K, V)])(reduce: (K, Iterator[V]) => O)(
      implicit ekv: Encoder[(K, V)], ek: Encoder[K], eo: Encoder[O]): Dataset[O] =
    input.flatMap(map)
      .groupByKey(_._1)
      .mapGroups((k, rows) => reduce(k, rows.map(_._2)))

  /** The reference tokenizer as a plain Scala function — byte-identical
    * semantics to [[TextPipeline.TokenPattern]] (SURVEY §1.2 Q5). */
  private val TokenRe = TextPipeline.TokenPattern.r
  def tokenize(line: String): Seq[String] =
    TokenRe.findAllIn(line.toLowerCase).toSeq

  /** wordCount ported onto the facade exactly as the Phoenix app is
    * written: map = tokenize + emit (w, 1), combiner = sum (the app's
    * sum_combiner, wordCount/wordCount.cpp:48), stop filter at the end
    * (where the reference prints, :151-157), then the Q4 total order.
    * Output contract identical to `q_wordcount` — one oracle checks both
    * implementations. */
  def phoenixWordCount(s: SparkSession, textPath: String = RefQueries.Dracula): DataFrame = {
    import s.implicits._
    val lines = s.read.textFile(textPath)
    val stop = TextPipeline.stopWords(s, RefQueries.StopWordsPath)
    mapReduce(lines)(line => tokenize(line).map(w => (w, 1L)))(_ + _)
      .toDF("word", "cnt")
      .join(broadcast(stop), Seq("word"), "left_anti")
      .orderBy(col("cnt").asc, col("word").desc)
  }
}
