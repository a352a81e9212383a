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

  // ———— d76 unigram-LM training (hard-EM / Viterbi) ————

  /** dec6(ln x): the d34 cross-engine ln contract the operator's costs
    * use — each ln canonicalized to 6 decimals (HALF_UP, both engines'
    * double→decimal cast) before any arithmetic. */
  private def dec6ln(x: Long): BigDecimal =
    BigDecimal(math.log(x.toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  /** Brute-force Viterbi: enumerate EVERY segmentation (pieces ≤ 3,
    * vocabulary-restricted), argmin by (total cost, path string) — the
    * operator's packed-string DP must compute exactly this. */
  private def refSegment(w: String, cost: Map[String, BigDecimal]): List[String] = {
    def segs(i: Int): List[List[String]] =
      if (i == w.length) List(Nil)
      else (1 to math.min(3, w.length - i)).toList.flatMap { k =>
        val piece = w.substring(i, i + k)
        if (cost.contains(piece)) segs(i + k).map(piece :: _) else Nil
      }
    segs(0).map(sg => (sg.map(cost).sum, sg.mkString(" "), sg))
      .minBy { case (c, p, _) => (c, p) }._3
  }

  /** Reference hard-EM unigram LM — the operator's whole loop in plain
    * Scala: seed substring counts (chars + top-V multi), two
    * cost→Viterbi→usage rounds with prune-unused between them. Returns
    * (final usage counts, the round-2 segmentations). */
  private def refUni(words: Map[String, Long]): (Map[String, Long], Map[String, List[String]]) = {
    val (lMax, v) = (3, 60)
    val subs = words.toSeq.flatMap { case (w, c) =>
      for (k <- 1 to lMax; p <- 0 to w.length - k)
        yield (w.substring(p, p + k), c)
    }.groupMapReduce(_._1)(_._2)(_ + _)
    val chars = subs.filter(_._1.length == 1)
    val v0 = chars ++ subs.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(v)
    def costs(vc: Map[String, Long]): Map[String, BigDecimal] = {
      val denom = dec6ln(vc.values.sum + vc.size)
      vc.map { case (p, c) => p -> (denom - dec6ln(c + 1)) }
    }
    def usage(cost: Map[String, BigDecimal]): Map[String, Long] =
      words.toSeq.flatMap { case (w, c) => refSegment(w, cost).map(_ -> c) }
        .groupMapReduce(_._1)(_._2)(_ + _)
    val u1 = usage(costs(v0))
    val v1 = chars.map { case (p, _) => p -> u1.getOrElse(p, 0L) } ++
      u1.filter(_._1.length > 1)
    val c1 = costs(v1)
    (usage(c1), words.keys.map(w => w -> refSegment(w, c1)).toMap)
  }

  private def corpusWords(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.select(explode(split(lower(trim(regexp_replace(
        call_function(functions.NfcNormalize.Name, col("text")),
        "\\s+", " "))), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap

  test("d76 differential vs brute-force hard-EM reference on the real corpus") {
    val words = corpusWords(Tables.documents(spark, Sf))
    val (want, _) = refUni(words)
    val got = operators.QualityOps.unigramLm(spark, Sf)
      .select("piece", "n_used").as[(String, Long)].collect().toMap
    assert(got === want)
    // coverage invariant: the final segmentation covers every character
    // of every word occurrence exactly once
    val totChars = words.map { case (w, c) => w.length * c }.sum
    assert(got.map { case (p, n) => p.length * n }.sum === totChars,
      "final usage must tile the corpus characters exactly")
  }

  test("d76 planted: the DP is true Viterbi, not greedy longest-match") {
    // counts engineered so the optimal segmentation of 'xxy' is
    // [x, xy] (cheap frequent pieces) while greedy longest-match takes
    // [xxy] — a fixture where only a real argmin over split points wins
    val docs = (
      Seq.fill(40)("xy") ++ Seq.fill(6)("xx") ++ Seq("xxy")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val words = corpusWords(docs)
    val (want, seg2) = refUni(words)
    // the fixture is load-bearing: round 2 segments xxy as x + xy,
    // NOT the longest-match prefix xxy
    assert(seg2("xxy") === List("x", "xy"),
      s"fixture lost its point: xxy segmented as ${seg2("xxy")}")
    val got = operators.QualityOps.unigramLmOver(spark, docs)
      .select("piece", "n_used").as[(String, Long)].collect().toMap
    assert(got === want)
  }

  test("d77 differential: per-doc token counts vs brute-force round-2 segmentations") {
    val (_, seg2) = refUni(corpusWords(Tables.documents(spark, Sf)))
    // reference per-doc counts from the doc-grain token stream and the
    // reference segmentations — the d68 differential shape
    val docWords = Tables.documents(spark, Sf)
      .select(col("doc_id"), explode(split(lower(trim(regexp_replace(
          call_function(functions.NfcNormalize.Name, col("text")),
          "\\s+", " "))), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .as[(Long, String)].collect().toSeq
    val want = docWords.groupBy(_._1).map { case (id, ws) =>
      id -> ((ws.size.toLong,
        ws.map(_._2.length.toLong).sum,
        ws.map(w => seg2(w._2).size.toLong).sum))
    }
    val got = operators.QualityOps.unigramEncode(spark, Sf)
      .select("doc_id", "n_words", "n_chars", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // docs whose text normalizes to nothing report zeros
    val wordless = got.keySet -- want.keySet
    wordless.foreach(id => assert(got(id) === ((0L, 0L, 0L))))
    assert(got -- wordless === want)
  }

  test("d77 planted: encode counts reflect the Viterbi split, not greedy") {
    // the d76 fixture: xxy segments as [x, xy] → 2 tokens (greedy
    // longest-match would count 1)
    val docs = (
      Seq.fill(40)("xy") ++ Seq.fill(6)("xx") ++ Seq("xxy")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val enc = operators.QualityOps.unigramEncodeOver(spark, docs)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(enc(46L) === 2L, "xxy must encode as x + xy (2 tokens)")
  }

  /** Reference WordPiece: positional (##) seed vocabulary — every
    * substring of length 1..3 counted under its positional form, all
    * single-char forms + the top-60 multi-char by (count desc, piece)
    * — then greedy longest-match segmentation. */
  private def refWp(words: Map[String, Long]): Map[String, List[String]] = {
    val lMax = operators.QualityOps.UniMaxPiece
    val V = operators.QualityOps.UniSeedMulti
    val counts = scala.collection.mutable.Map.empty[(String, Int), Long]
    for ((w, c) <- words; k <- 1 to lMax; p <- 0 to w.length - k) {
      val raw = w.substring(p, p + k)
      val piece = if (p == 0) raw else "##" + raw
      counts((piece, k)) = counts.getOrElse((piece, k), 0L) + c
    }
    val chars = counts.keys.filter(_._2 == 1).map(_._1).toSet
    val multi = counts.toSeq.filter(_._1._2 > 1)
      .sortBy { case ((p, _), n) => (-n, p) }.take(V).map(_._1._1)
    val vocab = chars ++ multi
    words.keys.map { w =>
      var i = 0
      val out = List.newBuilder[String]
      while (i < w.length) {
        val k = (lMax to 1 by -1).find { k =>
          i + k <= w.length && {
            val raw = w.substring(i, i + k)
            vocab.contains(if (i == 0) raw else "##" + raw)
          }
        }.get
        out += (if (i == 0) w.substring(i, i + k)
          else "##" + w.substring(i, i + k))
        i += k
      }
      w -> out.result()
    }.toMap
  }

  test("d81 differential: per-doc counts vs in-memory greedy WordPiece " +
    "on the real corpus") {
    val seg = refWp(corpusWords(Tables.documents(spark, Sf)))
    val docWords = Tables.documents(spark, Sf)
      .select(col("doc_id"), explode(split(lower(trim(regexp_replace(
          call_function(functions.NfcNormalize.Name, col("text")),
          "\\s+", " "))), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .as[(Long, String)].collect().toSeq
    val want = docWords.groupBy(_._1).map { case (id, ws) =>
      id -> ((ws.size.toLong,
        ws.map(_._2.length.toLong).sum,
        ws.map(w => seg(w._2).size.toLong).sum))
    }
    val got = operators.QualityOps.wordpieceEncode(spark, Sf)
      .select("doc_id", "n_words", "n_chars", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val wordless = got.keySet -- want.keySet
    wordless.foreach(id => assert(got(id) === ((0L, 0L, 0L))))
    assert(got -- wordless === want)
    // the ## convention is load-bearing: some word must segment into a
    // continuation piece (count > its char count would be impossible;
    // instead pin that a multi-char continuation exists somewhere)
    assert(seg.values.exists(_.exists(p => p.startsWith("##") && p.length > 3)),
      "vacuous fixture: no multi-char continuation piece used")
  }

  test("d81 planted: greedy longest-match, NOT Viterbi — the d76 fixture " +
    "inverted") {
    // the same corpus where d76/d77 pin xxy → [x, xy] (2 tokens, true
    // argmin): WordPiece's greedy rule takes the LONGEST prefix xxy —
    // 1 token — so the two tokenizer families disagree exactly here
    val docs = (
      Seq.fill(40)("xy") ++ Seq.fill(6)("xx") ++ Seq("xxy")
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val wp = operators.QualityOps.wordpieceEncodeOver(spark, docs)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(wp(46L) === 1L, "xxy must greedy-encode as [xxy] (1 token)")
    val uni = operators.QualityOps.unigramEncodeOver(spark, docs)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toMap
    assert(uni(46L) === 2L, "the Viterbi twin must still split xxy")
  }

  test("d81 refuses a word past the oracle's unroll instead of truncating") {
    val docs = Seq((1L, "ok"), (2L, "supercalifragilistic"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      operators.QualityOps.wordpieceEncodeOver(spark, docs).collect()
    }
    assert(e.getMessage.contains("wordpieceEncode"))
  }

  test("d81 refuses a corpus word containing '#' — the ## marker collision") {
    // a word-initial literal "##x" and a word-internal 'x' derive the
    // SAME positional form "##x": two vocabulary rows, one map key —
    // map_from_arrays/DuckDB map() would throw an opaque duplicate-key
    // error, and the greedy walk's consumed-length accounting becomes
    // ambiguous. The engine refuses loudly up front instead.
    val docs = Seq((1L, "ax bx"), (2L, "##x")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      operators.QualityOps.wordpieceEncodeOver(spark, docs).collect()
    }
    assert(e.getMessage.contains("'#'") &&
      e.getMessage.contains("wordpieceEncode"))
  }

  test("d83 profile ≡ the per-doc encoders' corpus totals; ratios are the " +
    "pinned single divisions; planted greedy-vs-Viterbi shows in the bill") {
    val prof = operators.QualityOps.tokenizerProfile(spark, Sf)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(prof.keySet === Set("bpe", "unigram", "wordpiece"))
    def docTotals(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val r = df.agg(sum("n_words"), sum("n_chars"), sum("n_tokens")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    Seq("bpe" -> operators.QualityOps.bpeEncode(spark, Sf),
        "unigram" -> operators.QualityOps.unigramEncode(spark, Sf),
        "wordpiece" -> operators.QualityOps.wordpieceEncode(spark, Sf))
      .foreach { case (fam, df) =>
        val (w, c, t) = docTotals(df)
        val p = prof(fam)
        // the profile's corpus totals ARE the per-doc encoders' sums —
        // shared kernels, definitional equality
        assert((p._2, p._3, p._4) === ((w, c, t)),
          s"$fam profile totals drifted from the per-doc encoder")
        assert(p._6 === r4(t.toDouble / w), s"$fam fertility")
        assert(p._7 === r4(t.toDouble / c), s"$fam compression")
        assert(p._8 >= 0.0 && p._8 <= 1.0 && p._5 > 0L, s"$fam bounds")
      }
    // planted: on the d76/d81 disagreement corpus the greedy family's
    // corpus token bill strictly undercuts Viterbi's (xxy = 1 vs 2)
    val docs = (Seq.fill(40)("xy") ++ Seq.fill(6)("xx") ++ Seq("xxy"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val pp = operators.QualityOps.tokenizerProfileOver(spark, docs)
      .select("family", "n_tokens").as[(String, Long)].collect().toMap
    assert(pp("wordpiece") < pp("unigram"),
      "planted corpus: the greedy bill must undercut Viterbi's")
  }

  test("d76 refuses a word past the oracle's DP unroll instead of truncating") {
    val docs = Seq((1L, "a twelvecharsw ok"), (2L, "supercalifragilistic"))
      .toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      operators.QualityOps.unigramLmOver(spark, docs).collect()
    }
    assert(ex.getMessage.contains("unigramLm") &&
      ex.getMessage.contains("unroll"))
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
