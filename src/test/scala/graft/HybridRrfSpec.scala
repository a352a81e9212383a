package graft

/** d66 hybrid RRF retrieval: differential against an in-memory fusion
  * of the two retrievers' own collected lists — the operator must
  * reproduce exactly the textbook RRF over its inputs' ranks — plus
  * structural properties (rank provenance, absent-list zero). */
class HybridRrfSpec extends SparkSpec {
  import spark.implicits._

  test("fusion ≡ in-memory RRF over the two retrievers' collected lists") {
    val lex = operators.QualityOps.bm25(spark, Sf)
      .select("doc_id", "score").as[(Long, Double)].collect().toSeq
      .sortBy { case (id, sc) => (-sc, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val sem = operators.EmbeddingOps.cosineTopK(spark, Sf)
      .select("vec_id", "sim").as[(Long, Double)].collect().toSeq
      .sortBy { case (id, s) => (-s, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    def part(r: Option[Long]) = r.map(k => 1.0 / (60 + k)).getOrElse(0.0)
    val want = (lex.keySet ++ sem.keySet).toSeq
      .map { id =>
        val rrf = BigDecimal(part(lex.get(id)) + part(sem.get(id)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, lex.get(id), sem.get(id), rrf)
      }
      .sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(10)
    val got = operators.EmbeddingOps.hybridRrf(spark, Sf)
      .as[(Long, Option[Long], Option[Long], Double)].collect().toSeq
    assert(got === want)
  }

  test("every output rank points back into its source top-20 list; no all-null rows") {
    val got = operators.EmbeddingOps.hybridRrf(spark, Sf)
      .as[(Long, Option[Long], Option[Long], Double)].collect().toSeq
    assert(got.nonEmpty && got.size <= 10)
    got.foreach { case (id, lr, sr, rrf) =>
      assert(lr.isDefined || sr.isDefined, s"doc $id in neither list")
      assert(lr.forall(r => r >= 1 && r <= 20) && sr.forall(r => r >= 1 && r <= 20))
      assert(rrf > 0.0, s"doc $id fused to a non-positive score")
    }
    // a doc ranked 1 in BOTH lists would dominate; at minimum the output
    // is sorted by (rrf desc, doc_id) — pin the order contract
    assert(got === got.sortBy { case (id, _, _, rrf) => (-rrf, id) })
  }
}
