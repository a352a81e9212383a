package graft

import graft.operators.{LlmOps, SamplingOps}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for d56 per-group exact-k reservoir
  * sampling: on generated (doc_id, lang) corpora the salted two-phase
  * draw must (1) equal the in-memory bottom-k-by-tag model — which also
  * proves the two-phase form ≡ the oracle's single window — emitting
  * exactly min(k, |stratum|) rows per stratum, and (2) be GROWTH-STABLE:
  * adding rows can only displace a stratum's worst current draws, never
  * reshuffle the survivors' relative order (a row's tag depends only on
  * its own (lang, doc_id)). */
object ReservoirProps extends Properties("Reservoir") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  private val K = 4

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 40)
    ids <- Gen.pick(n, 0L until 200L)
    langs <- Gen.listOfN(n, Gen.oneOf("en", "de", "fr"))
  } yield ids.toList.zip(langs)

  /** The same hex tag Spark's md5(concat_ws(":", lang, doc_id)) yields. */
  private def tag(lang: String, id: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"$lang:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)

  /** In-memory model: per lang, the k smallest (tag, doc_id), ranked. */
  private def model(rows: List[(Long, String)]): Set[(Long, String, Long)] =
    rows.groupBy(_._2).flatMap { case (lang, mine) =>
      mine.map(_._1).sortBy(id => (tag(lang, id), id)).take(K)
        .zipWithIndex.map { case (id, i) => (id, lang, i.toLong + 1) }
    }.toSet

  private def run(rows: List[(Long, String)]): Set[(Long, String, Long)] = {
    import spark.implicits._
    SamplingOps.reservoirSampleOver(rows.toDF("doc_id", "lang"), K)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
  }

  property("two-phase draw ≡ bottom-k-by-tag model; exact-k per stratum") =
    Prop.forAllNoShrink(corpusGen) { rows =>
      val got = run(rows)
      val sizesOk = rows.groupBy(_._2).forall { case (lang, mine) =>
        got.count(_._2 == lang) == math.min(K, mine.size)
      }
      got == model(rows) && sizesOk
    }

  property("growth stability: new rows only displace the worst draws") =
    Prop.forAllNoShrink(corpusGen, corpusGen) { (base, extraRaw) =>
      val baseIds = base.map(_._1).toSet
      val extra = extraRaw.filterNot(r => baseIds.contains(r._1))
      val before = run(base)
      val after = run(base ++ extra)
      // survivors keep their relative order: within each stratum, the
      // before-draws that survive growth appear in `after` in the same
      // tag order, as a prefix-preserving subsequence (rank gaps only
      // close from displacement below, never reorder)
      before.groupBy(_._2).forall { case (lang, beforeLang) =>
        val afterLang = after.filter(_._2 == lang).toList.sortBy(_._3)
        val survivors = beforeLang.toList.sortBy(_._3)
          .filter(r => afterLang.exists(_._1 == r._1))
        val surIdsInAfterOrder = afterLang.map(_._1)
          .filter(id => survivors.exists(_._1 == id))
        survivors.map(_._1) == surIdsInAfterOrder &&
          // displacement is from the bottom: dropped draws all ranked
          // at-or-below every survivor's before-rank ⇔ survivors form a
          // rank prefix of the before list
          survivors.map(_._3) == (1L to survivors.size.toLong).toList
      }
    }

  property("null lang: tag nulls out (oracle's || semantics), stratum still exact-k") =
    Prop.forAllNoShrink(corpusGen) { rows =>
      import spark.implicits._
      // half the ids lose their lang: they form one NULL stratum whose
      // tags are ALL null (concat propagates, matching the oracle's
      // lang || ':' || id), so the draw falls to the doc_id tie-break —
      // engine-identical; the non-null strata are untouched.
      val mixed = rows.map { case (id, lang) =>
        (id, if (id % 2 == 0) lang else null)
      }
      val got = SamplingOps.reservoirSampleOver(mixed.toDF("doc_id", "lang"), K)
        .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
        .toSet
      val nullIds = mixed.filter(_._2 == null).map(_._1).sorted.take(K)
      val wantNull = nullIds.zipWithIndex
        .map { case (id, i) => (id, Option.empty[String], i.toLong + 1) }.toSet
      val wantRest = model(mixed.filter(_._2 != null))
        .map { case (id, l, r) => (id, Option(l), r) }
      got == (wantNull ++ wantRest)
    }
}
