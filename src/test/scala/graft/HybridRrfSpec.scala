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

  test("rankOfTopList ≡ row_number over (score desc, doc_id asc), ties included") {
    // the round-19 window-free rank rewrite's focused pin: the
    // predecessor-count form must reproduce row_number exactly on a
    // tie-heavy list (scores drawn from 3 values over 17 rows)
    val rows = (1L to 17L).map(id => (id, (id % 3).toDouble))
    val want = rows.sortBy { case (id, sc) => (-sc, id) }.zipWithIndex
      .map { case ((id, _), i) => (id, i + 1L) }.sortBy(_._1)
    val got = operators.EmbeddingOps.rankOfTopList(
        rows.toDF("doc_id", "score"), "score", "rnk")
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === want)
  }

  test("d66b multi-query fusion ≡ per-query in-memory RRF over collected posting lists") {
    import org.apache.spark.sql.functions._
    val pool = Seq("spark", "join", "window")
    val qTerms = (0 until 5).map(q => q.toLong -> Set(pool(q % 3), pool((q + 1) % 3))).toMap
    // in-memory lexical: per-(doc, term) contributions, summed per query
    val contrib = operators.QualityOps.bm25TermContrib(spark, Sf, pool)
      .as[(Long, String, Double)].collect().toSeq // (doc_id, term, tscore)
    def lexList(q: Long): Map[Long, Long] = contrib
      .filter { case (_, t, _) => qTerms(q).contains(t) }
      .groupBy(_._1).view
      .mapValues(rows => BigDecimal(rows.map(_._3).sum)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble).toSeq
      .sortBy { case (id, sc) => (-sc, id) }.take(20).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    // semantic side: the engine's own rounded sims (the cosine kernel is
    // d04-oracle-covered; what d66b adds — per-query ranking and fusion —
    // is what this differential re-derives in memory)
    graft.functions.CosineSimilarity.ensureRegistered(spark)
    val eDf = Tables.embeddings(spark, Sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qDf = eDf.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("v").as("qv"))
    val sims = eDf.crossJoin(broadcast(qDf))
      .select(col("qid"), col("vec_id"),
        graft.Canon.round4(call_function(
          graft.functions.CosineSimilarity.Name, col("v"), col("qv"))).as("sim"))
      .as[(Long, Long, Double)].collect().toSeq
    def semList(q: Long): Map[Long, Long] = sims
      .filter(_._1 == q).map { case (_, id, s) => (id, s) }
      .sortBy { case (id, s) => (-s, id) }.take(20).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    def part(r: Option[Long]) = r.map(k => 1.0 / (60 + k)).getOrElse(0.0)
    val want = (0L until 5L).flatMap { q =>
      val (lx, sm) = (lexList(q), semList(q))
      (lx.keySet ++ sm.keySet).toSeq
        .map { id =>
          val rrf = BigDecimal(part(lx.get(id)) + part(sm.get(id)))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          (id, lx.get(id), sm.get(id), rrf)
        }
        .sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(10).zipWithIndex
        .map { case ((id, lr, sr, rrf), i) => (q, i + 1L, id, lr, sr, rrf) }
    }
    val got = operators.EmbeddingOps.hybridRrfMulti(spark, Sf)
      .as[(Long, Long, Long, Option[Long], Option[Long], Double)].collect().toSeq
    assert(got === want)
    // structural: 5 queries × up to 10 rows; each query's own doc tops
    // its semantic list (self-similarity 1.0 ⇒ sem_rank 1)
    assert(got.map(_._1).distinct.sorted === Seq(0L, 1L, 2L, 3L, 4L))
    (0L until 5L).foreach { q =>
      val self = got.find(r => r._1 == q && r._3 == q)
      assert(self.exists(_._5.contains(1L)), s"query $q: self not sem_rank 1")
    }
  }
}
