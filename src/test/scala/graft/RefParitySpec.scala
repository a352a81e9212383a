package graft

import graft.operators.RefQueries
import scala.io.Source

/** Differential parity against the REFERENCE BINARIES' own output.
  *
  * The golden files under src/test/resources/golden were produced by
  * compiling the reference (unmodified, in /tmp) and running
  * `MR_NUMTHREADS=1 wordCount|top50|invert Dracula.txt` — single-threaded
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

  private def goldenLines(f: String): Seq[(String, Seq[Long])] =
    Source.fromInputStream(
      getClass.getResourceAsStream(s"/golden/$f"))("UTF-8").getLines().toSeq.map { line =>
      val Array(w, rest) = line.split(" - ", 2)
      // last line may carry a trailing banner (no \n before it) — keep digits only
      (w.trim, "\\d+".r.findAllIn(rest).map(_.toLong).toSeq)
    }

  private lazy val stopLine: String =
    Source.fromFile(RefQueries.StopWordsPath)("UTF-8").mkString.trim

  private lazy val ourWc: Map[String, Long] =
    RefQueries.wordCount(spark).select("word", "cnt")
      .as[(String, Long)].collect().toMap

  test("wordCount: reference binary counts match ours word-for-word") {
    val golden = goldenLines("ref_wordcount_dracula.txt")
      .map { case (w, vs) => w -> vs.head }.toMap
    assert(golden.size > 9000)
    val mismatches = golden.filter { case (w, c) => ourWc.get(w) != Some(c) }
    assert(mismatches.isEmpty, s"count mismatches: ${mismatches.take(5)}")
    // Q1: everything we keep beyond the reference's output is dropped by
    // the reference ONLY because of its substring stop filter
    val extras = ourWc.keySet -- golden.keySet
    val unexplained = extras.filterNot(stopLine.contains)
    assert(unexplained.isEmpty,
      s"words missing from reference output but not substring-filtered: ${unexplained.take(5)}")
  }

  test("top50: reference binary output reproduced exactly, including order") {
    val golden = goldenLines("ref_top50_dracula.txt")
      .map { case (w, vs) => (w, vs.head) }
    assert(golden.size === 50)
    val expected = ourWc.toSeq
      .filter { case (w, _) => !stopLine.contains(w) } // Q1 substring filter
      .sortBy { case (w, c) => (-c, ReverseStr(w)) }
      .take(50)
    assert(expected === golden)
  }
  private case class ReverseStr(s: String)
  private implicit val revOrd: Ordering[ReverseStr] =
    Ordering.by[ReverseStr, String](_.s).reverse

  test("invert: every reference posting appears in ours; at most our first is absent") {
    val golden = goldenLines("ref_invert_dracula.txt")
    assert(golden.size > 6000)
    val ours: Map[String, Seq[Long]] = RefQueries.invertedIndex(spark)
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
