package graft

import graft.operators.{LlmOps, QualityOps}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for the d52 quality ensemble: on generated
  * corpora (token counts straddling the min-length boundary, word
  * lengths straddling the mean band, planted repetition forcing the
  * max-share and distinct-ratio rules), every per-rule flag, the
  * reasons bitmask, and the keep verdict must match a direct in-memory
  * model of the integer cross-multiplication arithmetic. */
object EnsembleProps extends Properties("QualityEnsemble") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  /** A doc = 1..30 tokens drawn from a pool mixing short/long words and
    * a hot token repeated with varying multiplicity. */
  private val docGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(1, 24)
    toks <- Gen.listOfN(n, Gen.oneOf("ab", "abcd", "abcdefgh", "abcdefghijkl"))
    hotReps <- Gen.chooseNum(0, 12)
  } yield toks ++ List.fill(hotReps)("spam")

  private val corpusGen: Gen[List[List[String]]] =
    Gen.nonEmptyListOf(docGen).map(_.take(6))

  private def model(t: List[String]): (Long, Long, Long, Boolean) = {
    val counts = t.groupBy(identity).view.mapValues(_.size.toLong)
    val n = t.size.toLong
    val sl = t.map(_.length.toLong).sum
    val mx = counts.values.max
    val nd = counts.size.toLong
    val rLen = n >= 12
    val rWl = sl * 10 >= n * 40 && sl * 10 <= n * 50
    val rMs = mx * 5 <= n
    val rDi = nd * 10 >= n * 3
    val reasons = (if (rLen) 0L else 1L) + (if (rWl) 0L else 2L) +
      (if (rMs) 0L else 4L) + (if (rDi) 0L else 8L)
    (n, nd, reasons, reasons == 0L)
  }

  property("flags, bitmask, keep ≡ in-memory integer-arithmetic model") =
    Prop.forAllNoShrink(corpusGen) { corpus =>
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft-ensprops").toString
      corpus.zipWithIndex.map { case (t, i) =>
        (i.toLong + 1, t.mkString(" "), "en", "s", 0L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = QualityOps.qualityEnsemble(spark, dir)
        .select("doc_id", "n_tokens", "n_distinct", "reasons", "keep")
        .as[(Long, Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      val want = corpus.zipWithIndex.map { case (t, i) =>
        val (n, nd, reasons, keep) = model(t)
        (i.toLong + 1) -> ((n, nd, reasons, keep))
      }.toMap
      got == want
    }
}
