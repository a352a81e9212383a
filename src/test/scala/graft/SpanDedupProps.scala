package graft

import graft.operators.{DedupOps, LlmOps}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for d42 span dedup on GENERATED corpora —
  * the operator was rewritten in round 9 (content-keyed window →
  * partial agg + occurrence-coordinate join), so the keep rule is
  * re-proved here against a direct in-memory model over corpora built
  * from a small tile pool (forcing heavy cross-document chunk repeats,
  * including the every-doc-shares-a-tile skew case) plus random
  * partial-tile tails. Each sample drives the real Spark plan. */
object SpanDedupProps extends Properties("SpanDedup") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val C = DedupOps.SpanTokens

  /** A doc = 1..3 whole tiles drawn from a 4-tile pool + a partial tail
    * of 0..C-1 tokens from a tiny vocab (tails can also repeat). */
  private val corpusGen: Gen[List[List[String]]] = {
    val tile: Gen[Seq[String]] =
      Gen.chooseNum(0, 3).map(t => (1 to C).map(k => s"t$t-$k"))
    val tail: Gen[Seq[String]] = for {
      n <- Gen.chooseNum(0, C - 1)
      v <- Gen.chooseNum(0, 1)
    } yield (1 to n).map(k => s"x$v-$k")
    val doc: Gen[List[String]] = for {
      tiles <- Gen.nonEmptyListOf(tile).map(_.take(3))
      tl <- tail
    } yield (tiles.flatten ++ tl)
    Gen.nonEmptyListOf(doc).map(_.take(8))
  }

  private def model(docs: List[(Long, List[String])])
      : Map[Long, (Long, Long, String)] = {
    val chunks = docs.flatMap { case (id, t) =>
      t.grouped(C).zipWithIndex.map { case (c, k) =>
        (id, k.toLong, c.mkString(" "))
      }
    }
    val first = chunks.groupBy(_._3).map { case (txt, occ) =>
      txt -> occ.map(o => (o._1, o._2)).min
    }
    docs.map { case (id, _) =>
      val mine = chunks.filter(_._1 == id)
      val kept = mine.filter(c => first(c._3) == ((c._1, c._2)))
      val cleaned = kept.sortBy(_._2).map(_._3).mkString(" ")
      id -> (mine.length.toLong, kept.length.toLong, cleaned)
    }.toMap
  }

  private def md5(t: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  property("keep rule ≡ in-memory first-occurrence model (counts, md5, length)") =
    Prop.forAllNoShrink(corpusGen) { corpus =>
      import spark.implicits._
      val docs = corpus.zipWithIndex.map { case (t, id) => (id.toLong, t) }
      val df = docs.map { case (id, t) => (id, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = DedupOps.spanDedupOver(df)
        .select("doc_id", "n_chunks", "n_kept", "cleaned_len", "cleaned_md5")
        .as[(Long, Long, Long, Long, String)].collect()
      val want = model(docs)
      got.length == docs.length && got.forall { case (id, nc, nk, len, h) =>
        val (wnc, wnk, cleaned) = want(id)
        nc == wnc && nk == wnk && len == cleaned.length.toLong && h == md5(cleaned)
      }
    }
}
