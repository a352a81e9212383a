package graft

import org.apache.spark.sql.functions._

/** d65 BPE merge training: a hand-computed planted fixture (overlap
  * counting, greedy left-to-right merging, a merged symbol feeding a
  * later round) plus a differential against a straight-line in-memory
  * reference implementation of Sennrich BPE over the real corpus —
  * the strongest available evidence that the relational formulation
  * (pair counts via zip, merge via guarded string replace) computes
  * the reference algorithm, not an approximation of it. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference BPE over a (word → count) table: explicit symbol
    * vectors, explicit greedy left-to-right merge loop. */
  private def refBpe(words: Map[String, Long], iters: Int): Seq[(Long, String, String, Long)] = {
    var reps: Seq[(Vector[String], Long)] =
      words.toSeq.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (step <- 1 to iters) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- reps; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((step.toLong, l, r, c))
        reps = reps.map { case (syms, c2) =>
          val nb = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i < syms.size - 1 && syms(i) == l && syms(i + 1) == r) {
              nb += (l + r); i += 2
            } else { nb += syms(i); i += 1 }
          }
          (nb.result(), c2)
        }
      }
    }
    out.toSeq
  }

  test("planted fixture: overlaps count, merges are greedy, merged symbols feed later rounds") {
    // words: aaa×2, ab×3, b×1
    //   round 1: (a,a) = 2·2 = 4 overlapping positions beats (a,b) = 3;
    //            greedy merge leaves aaa → [aa, a] (never [a, aa])
    //   round 2: (a,b) = 3 beats (aa,a) = 2
    //   round 3: (aa,a) = 2 — round 1's MERGED symbol is the lhs
    val docs = Seq("aaa aaa ab", "ab ab b").toDF("text")
    val got = operators.QualityOps.bpeMergesOver(spark, docs, iters = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === Seq((1L, "a", "a", 4L), (2L, "a", "b", 3L), (3L, "aa", "a", 2L)))
    assert(got === refBpe(Map("aaa" -> 2L, "ab" -> 3L, "b" -> 1L), 3))
  }

  test("differential vs reference BPE on the real corpus, 5 rounds") {
    // the same normalization/tokenization the operator applies,
    // collected once into the in-memory reference's word table
    val words = Tables.documents(spark, Sf)
      .select(explode(split(lower(trim(regexp_replace(
        call_function(functions.NfcNormalize.Name, col("text")),
        "\\s+", " "))), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    val want = refBpe(words, 5)
    val got = operators.QualityOps
      .bpeMergesOver(spark, Tables.documents(spark, Sf), iters = 5)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === want)
  }

  /** Reference encode: apply learned merges in order, greedy
    * left-to-right, to one word's symbol vector. */
  private def refApply(word: String, merges: Seq[(Long, String, String, Long)]): Int = {
    var syms = word.map(_.toString).toVector
    for ((_, l, r, _) <- merges.sortBy(_._1)) {
      val nb = Vector.newBuilder[String]
      var i = 0
      while (i < syms.size) {
        if (i < syms.size - 1 && syms(i) == l && syms(i + 1) == r) {
          nb += (l + r); i += 2
        } else { nb += syms(i); i += 1 }
      }
      syms = nb.result()
    }
    syms.size
  }

  test("d68 planted encode: merged symbols collapse counts, compression is exact") {
    val docs = Seq((1L, "aaa aaa ab"), (2L, "ab ab b")).toDF("doc_id", "text")
    val got = operators.QualityOps.bpeEncodeOver(spark, docs, iters = 3)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // merges (a,a),(a,b),(aa,a): aaa→1 symbol, ab→1, b→1
    assert(got === Seq((1L, 3L, 8L, 3L, 0.375), (2L, 3L, 5L, 3L, 0.6)))
  }

  test("d68 differential vs reference encode on the real corpus, 3 rounds") {
    val words = Tables.documents(spark, Sf)
      .select(col("doc_id"), explode(split(lower(trim(regexp_replace(
        call_function(functions.NfcNormalize.Name, col("text")),
        "\\s+", " "))), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .as[(Long, String)].collect().toSeq
    val merges = refBpe(
      words.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }, 3)
    val want = words.groupBy(_._1).map { case (id, ws) =>
      (id, ws.size.toLong, ws.map(_._2.length.toLong).sum,
        ws.map(w => refApply(w._2, merges).toLong).sum)
    }.toSeq.sortBy(_._1)
    val got = operators.QualityOps
      .bpeEncodeOver(spark, Tables.documents(spark, Sf), iters = 3)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4)) === want)
    // compression consistent with the counts it sits next to
    got.foreach { r =>
      val exp = BigDecimal(r._4.toDouble / r._3)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r._5 === exp, s"doc ${r._1} compression")
    }
  }

  test("abutting occurrences of the winning pair merge like Sennrich (double replace)") {
    // round 1 winner (x,y) cnt 4 ABUTS itself inside "xyxy" — a single
    // consumed-guard replace would strand [xy, x, y]; the second pass
    // must yield [xy, xy], and round 2 then merges the SELF-pair
    // (xy, xy) (run of 2 — inside the guard's exact range)
    val docs = Seq("xy xy xyxy").toDF("text")
    val got = operators.QualityOps.bpeMergesOver(spark, docs, iters = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    assert(got === Seq((1L, "x", "y", 4L), (2L, "xy", "xy", 1L)))
    assert(got === refBpe(Map("xy" -> 2L, "xyxy" -> 1L), 3))
  }

  test("a winning self-pair over a run >= 4 refuses loudly instead of diverging") {
    val docs = Seq("aaaa aa").toDF("text")
    val e = intercept[IllegalArgumentException] {
      operators.QualityOps.bpeMergesOver(spark, docs, iters = 1).collect()
    }
    assert(e.getMessage.contains("run of length >= 4"))
  }

  test("single-symbol and empty vocabularies yield no merges") {
    val docs = Seq("a b c d", "b c").toDF("text")
    // every word is one char → after one merge round of pairs... none:
    // no adjacent pairs exist at all, so ZERO merge rows come back
    assert(operators.QualityOps.bpeMergesOver(spark, docs, 3).count() === 0L)
  }
}
