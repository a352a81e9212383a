package graft

import org.apache.spark.sql.functions._

/** d67 source-conditional boilerplate removal: planted fixtures pin
  * the three properties that distinguish it from d57's global
  * first-occurrence dedup — (1) EVERY occurrence of a frequent-within-
  * source paragraph is dropped, including the first; (2) frequency is
  * conditional on the source (the same paragraph survives in a source
  * where it is rare); (3) the minDf floor keeps a singleton source
  * from boilerplating itself. */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)]) =
    operators.QualityOps
      .boilerplateRemovalOver(rows.toDF("doc_id", "source", "text"))
      .as[(Long, String, Long, Long, Long, String)].collect().toSeq

  test("planted fixture: threshold, first-occurrence removal, source-conditionality, minDf floor") {
    val got = run(Seq(
      // source A (4 docs): FOOT in all 4 (df=4, 100%); x in 2 (df=2,
      // 50% — pins the 30% boundary from above); u* unique
      (1L, "A", "FOOT\nu1\nx"),
      (2L, "A", "u2\nFOOT"),
      (3L, "A", "u3\nx\nFOOT"),
      (4L, "A", "u4\nFOOT"),
      // source B (singleton): FOOT has 100% share but df=1 < minDf —
      // a one-document source can never boilerplate itself
      (5L, "B", "zz\nFOOT\naa")))
    val md5of = (s: String) =>
      spark.range(1).select(md5(lit(s))).as[String].head()
    assert(got === Seq(
      (1L, "A", 3L, 1L, 2L, md5of("u1")),
      (2L, "A", 2L, 1L, 2L, md5of("u2")),
      (3L, "A", 3L, 1L, 2L, md5of("u3")),
      (4L, "A", 2L, 1L, 2L, md5of("u4")),
      // B keeps all three, reassembled in POSITION order (zz before aa)
      (5L, "B", 3L, 3L, 10L, md5of("zz\nFOOT\naa"))))
  }

  test("share below the 30% threshold survives even with df >= 2") {
    // y in 2 of 8 docs (25% < 30%) stays; FOOT in 3 of 8 (37.5%) goes
    val docs = (1L to 8L).map { i =>
      val extra = if (i <= 2) "\ny" else ""
      val foot = if (i <= 3) "\nFOOT" else ""
      (i, "S", s"u$i$extra$foot")
    }
    val got = run(docs)
    assert(got.filter(_._1 <= 2).forall(r => r._4 === 2L), "y must survive at 25% share")
    assert(got.filter(r => r._1 === 3L).forall(r => r._4 === 1L), "FOOT must be removed at 37.5%")
  }

  test("registry query ≡ in-memory reference removal over the planted corpus, and the rule bites") {
    import java.security.MessageDigest
    def md5hex(s: String) = MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val planted = operators.QualityOps.plantBoilerplate(
      Tables.documents(spark, Sf).select(col("doc_id"), col("source"), col("text")))
      .as[(Long, String, String)].collect().toSeq
    val paras = planted.flatMap { case (id, src, text) =>
      text.split("\n", -1).zipWithIndex
        .map { case (p, pos) => (id, src, pos, java.text.Normalizer.normalize(p,
          java.text.Normalizer.Form.NFC).trim) }
        .filter(_._4.nonEmpty)
    }
    val nDocs = planted.groupBy(_._2).map { case (s, ds) => s -> ds.size }
    val df = paras.groupBy(r => (r._2, r._4))
      .map { case (k, rs) => k -> rs.map(_._1).distinct.size }
    val bp = df.filter { case ((s, _), d) => d >= 2 && d * 100 >= 30 * nDocs(s) }.keySet
    val want = planted.map { case (id, src, _) =>
      val mine = paras.filter(_._1 == id).sortBy(_._3)
      val keep = mine.filterNot(r => bp((src, r._4)))
      val text = keep.map(_._4).mkString("\n")
      (id, src, mine.size.toLong, keep.size.toLong, text.length.toLong, md5hex(text))
    }.sortBy(_._1)
    val got = operators.QualityOps.boilerplateRemoval(spark, Sf)
      .as[(Long, String, Long, Long, Long, String)].collect().toSeq
    assert(got === want)
    // the rule must BITE (every doc loses its planted footer) and must
    // RETAIN (the %20 promo survives — removal is not "drop everything
    // repeated": the reference kept it, and got ≡ want proves we did)
    assert(got.forall(r => r._3 > r._4), "every doc must lose at least its footer")
    assert(want.exists { case (id, _, np, nk, _, _) => id % 20 == 0 && nk > 0 })
  }
}
