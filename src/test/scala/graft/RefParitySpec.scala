package graft

import graft.operators.RefQueries
import scala.io.Source

/** Differential parity against the REFERENCE BINARIES' own output, on
  * BOTH corpora.
  *
  * The golden files under src/test/resources/golden were produced by
  * compiling the reference (unmodified, in /tmp) and running
  * `MR_NUMTHREADS=1 wordCount|top50|invert <corpus>` — single-threaded
  * so the per-thread-hash-table pointer quirks (SURVEY §1.2 Q2) collapse
  * and rows arrive in file order. The contracts below are exact up to the
  * two quirks SURVEY normalizes, each re-confirmed empirically here:
  *
  *  - Q1 (substring stop filter): the reference drops any word that is a
  *    substring of the raw Stop_Words.txt line; we drop exact members
  *    only. So golden ⊆ ours with IDENTICAL counts, and every word we
  *    keep that the reference dropped must be a substring of that line.
  *  - invert's print loop (invert.cpp:150-167) consumes the first row of
  *    a group that follows a printed group without printing it, and
  *    skips singleton words entirely. So each golden postings list is a
  *    subset of ours missing at most our FIRST posting.
  *  - top50 prints the first K survivors of the substring filter in
  *    (cnt DESC, word DESC) order — reproduced exactly, including order.
  */
class RefParitySpec extends SparkSpec {
  import spark.implicits._

  private case class Corpus(suffix: String, path: String, k: Int, minWords: Int)
  private val corpora = Seq(
    Corpus("dracula", RefQueries.Dracula, 50, 9000),
    Corpus("republic", RefQueries.Republic, 100, 10000))

  private def goldenLines(f: String): Seq[(String, Seq[Long])] =
    Source.fromInputStream(
      getClass.getResourceAsStream(s"/golden/$f"))("UTF-8").getLines().toSeq.map { line =>
      val Array(w, rest) = line.split(" - ", 2)
      // last line may carry a trailing banner (no \n before it) — keep digits only
      (w.trim, "\\d+".r.findAllIn(rest).map(_.toLong).toSeq)
    }

  private lazy val stopLine: String =
    Source.fromFile(RefQueries.StopWordsPath)("UTF-8").mkString.trim

  private def ourWc(c: Corpus): Map[String, Long] =
    RefQueries.wordCount(spark, c.path).select("word", "cnt")
      .as[(String, Long)].collect().toMap

  corpora.foreach { c =>
    test(s"${c.suffix}: reference wordCount counts match ours word-for-word") {
      val golden = goldenLines(s"ref_wordcount_${c.suffix}.txt")
        .map { case (w, vs) => w -> vs.head }.toMap
      assert(golden.size > c.minWords)
      val wc = ourWc(c)
      val mismatches = golden.filter { case (w, cnt) => wc.get(w) != Some(cnt) }
      assert(mismatches.isEmpty, s"count mismatches: ${mismatches.take(5)}")
      // Q1: everything we keep beyond the reference's output is dropped
      // by the reference ONLY because of its substring stop filter
      val extras = wc.keySet -- golden.keySet
      val unexplained = extras.filterNot(stopLine.contains)
      assert(unexplained.isEmpty,
        s"words missing from reference output but not substring-filtered: ${unexplained.take(5)}")
    }

    test(s"${c.suffix}: reference top-${c.k} reproduced exactly, including order") {
      val golden = goldenLines(s"ref_top50_${c.suffix}.txt")
        .map { case (w, vs) => (w, vs.head) }
      assert(golden.size === c.k)
      val expected = ourWc(c).toSeq
        .filter { case (w, _) => !stopLine.contains(w) } // Q1 substring filter
        .sortBy { case (w, cnt) => (-cnt, ReverseStr(w)) }
        .take(c.k)
      assert(expected === golden)
    }

    test(s"${c.suffix}: every reference posting appears in ours; at most our first absent") {
      val golden = goldenLines(s"ref_invert_${c.suffix}.txt")
      assert(golden.size > c.minWords / 2)
      val ours: Map[String, Seq[Long]] = RefQueries.invertedIndex(spark, c.path)
        .select("word", "postings").as[(String, String)].collect()
        .map { case (w, p) => w -> p.split(",").map(_.toLong).toSeq }.toMap
      golden.foreach { case (w, ps) =>
        val o = ours.getOrElse(w, Seq.empty)
        assert(ps.toSet.subsetOf(o.toSet), s"'$w': golden $ps ⊄ ours $o")
        val onlyOurs = o.filterNot(ps.toSet)
        assert(onlyOurs.isEmpty || onlyOurs == Seq(o.head),
          s"'$w': unexplained extra postings $onlyOurs (ours $o, golden $ps)")
      }
    }
  }

  private case class ReverseStr(s: String)
  private implicit val revOrd: Ordering[ReverseStr] =
    Ordering.by[ReverseStr, String](_.s).reverse
}
