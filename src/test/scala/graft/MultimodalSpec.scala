package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("m08: clone jac 1, one-frame trim jac (n-1)/n, unrelated silent; hot frame capped") {
    val f = "x" * 64; val g = "y" * 64; val h = "z" * 64
    val assets = Seq(
      (1L, (f + g + h).getBytes("UTF-8")), // 3 frames
      (2L, (f + g + h).getBytes("UTF-8")), // exact clone of 1
      (3L, (g + h).getBytes("UTF-8")),     // head-trimmed copy of 1
      (4L, ("w" * 192).getBytes("UTF-8"))) // unrelated; 3 equal frames → 1 distinct
      .toDF("doc_id", "payload")
    val got = Multimodal.assetDedupOver(assets, 0.5)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 3L, 3L, 3L, 1.0),
      (1L, 3L, 2L, 3L, 2L, 0.6667),
      (2L, 3L, 2L, 3L, 2L, 0.6667)))
    // the zipf-head cap at frame grain: 25 identical single-frame assets
    // (pairwise jac = 1) generate NO candidates because the one frame's
    // df exceeds MaxShingleDf — the documented recall-for-scale trade
    val hot = (1 to 25).map(i => (100L + i, f.getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    assert(Multimodal.assetDedupOver(hot, 0.5).count() === 0L)
  }

  test("m08 filters on the RAW jaccard: a pair that rounds UP to tau stays excluded") {
    // round-13 advice pin: the filter must apply to the raw ratio (as the
    // DuckDB oracle's WHERE does), with round4 only in the output
    // projection — the d02 discipline. Fixture: jac = 5000/10001 =
    // 0.4999500… < 0.5 but round4 = 0.5000, so a round-then-filter
    // implementation would keep it and diverge from the oracle.
    def fr(p: String, i: Int) = p + ("%063d".format(i)) // exactly 64 bytes
    val shared = (0 until 5000).map(fr("s", _))
    val doc1 = (shared ++ (0 until 5000).map(fr("a", _))).mkString // 10000 frames
    val doc2 = (shared :+ fr("b", 0)).mkString                     // 5001 frames
    val doc3 = shared.mkString                                     // 5000 frames
    val assets = Seq((1L, doc1.getBytes("UTF-8")), (2L, doc2.getBytes("UTF-8")),
      (3L, doc3.getBytes("UTF-8"))).toDF("doc_id", "payload")
    val got = Multimodal.assetDedupOver(assets, 0.5)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // (1,2): 5000/10001 = 0.49995… rounds to 0.5 but is BELOW tau → out.
    // (1,3): 5000/10000 = 0.5 exactly → kept. (2,3): 5000/5001 → 0.9998.
    assert(got === Seq(
      (1L, 3L, 5000L, 10000L, 5000L, 0.5),
      (2L, 3L, 5000L, 5001L, 5000L, 0.9998)))
  }

  test("m11: an embedded clip scores containment 1.0 where jaccard dies; " +
    "partial overlap stays below tau; registry clips are frame-aligned") {
    def fr(p: String, i: Int) = p + ("%063d".format(i)) // exactly 64 bytes
    val host = (0 until 20).map(fr("h", _)).mkString        // 20 frames
    val clip = (2 until 5).map(fr("h", _)).mkString         // host frames 2..4
    val partial = (fr("h", 0) +: (0 until 2).map(fr("q", _))).mkString // 1/3 shared
    val assets = Seq((1L, host.getBytes("UTF-8")), (2L, clip.getBytes("UTF-8")),
      (3L, partial.getBytes("UTF-8"))).toDF("doc_id", "payload")
    val got = Multimodal.clipContainmentOver(assets, 0.9)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // the (1,2) clip: containment 3/3 = 1.0; its jaccard 3/20 = 0.15
    // would die at ANY useful m08 tau — the gap the operator exists for
    assert(got === Seq((1L, 2L, 3L, 20L, 3L, 1.0)))
    assert(Multimodal.assetDedupOver(assets, 0.5)
      .filter(col("i") === 1 && col("j") === 2).count() === 0L,
      "fixture drift: jaccard must NOT see the embedded clip")
    // the partial asset shares 1 of its 3 frames: containment 1/3 < 0.9
    // (present in the unfiltered kernel, cut by tau)
    assert(!got.exists(r => r._1 == 1L && r._2 == 3L))
    // the registry's derived clips are frame-aligned by construction:
    // every planted (parent, parent+300000) pair scores exactly 1.0
    val reg = Multimodal.clipContainment(spark, Sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    val planted = reg.filter { case (i, j, _, _, _, _) => j == i + 300000L }
    assert(planted.nonEmpty, "vacuous fixture: no clip pair at this sf")
    assert(planted.forall(_._6 == 1.0),
      "a frame-aligned clip must be fully contained")
  }

  test("m11 filters on the RAW containment: a pair that rounds UP to tau " +
    "stays excluded") {
    // the m08 round-13 discipline applied to the containment metric:
    // filter on the raw ratio, round4 only in the output projection.
    // Fixture: 8999/10000 = 0.8999 < 0.9 but a round-TO-FEWER-DECIMALS
    // bug class would keep it; and 9000/10000 = 0.9 exactly is kept.
    def fr(p: String, i: Int) = p + ("%059d".format(i)) // 64 bytes
    val shared = (0 until 9000).map(fr("share", _))
    val host = (shared ++ (0 until 6000).map(fr("hosta", _))).mkString
    val inA = (shared.drop(1) ++ Seq(fr("onlya", 0), fr("onlyb", 0))).mkString // 8999 shared / 9001
    val inB = (shared :+ fr("onlyc", 0)).mkString                              // 9000 shared / 9001
    val assets = Seq((1L, host.getBytes("UTF-8")), (2L, inA.getBytes("UTF-8")),
      (3L, inB.getBytes("UTF-8"))).toDF("doc_id", "payload")
    val got = Multimodal.clipContainmentOver(assets, 0.9)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
      .filter(_._1 == 1L)
    // (1,2): 8999/9001 = 0.99977… kept. Use min side: n_i=15000, n_2=9001
    // → containment 8999/9001; (1,3): 9000/9001. Both ≥ 0.9: that pins
    // nothing — so assert the sub-tau pair instead on a tighter tau.
    assert(got.map(r => (r._2, r._3)).toSet === Set((2L, 8999L), (3L, 9000L)))
    val tight = Multimodal.clipContainmentOver(assets, 0.99990)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
      .filter(_._1 == 1L)
    // raw(1,2) = 8999/9001 = 0.9997778 < 0.9999 → OUT even though its
    // round4 (0.9998) is also below; raw(1,3) = 9000/9001 = 0.9998889
    // < 0.9999 → OUT, but its round4 is 0.9999 == tau — a
    // round-then-filter implementation would KEEP it and diverge
    assert(tight.isEmpty,
      "containment filter must apply to the raw ratio, not round4")
  }

  test("frame sampling tiles the payload exactly") {
    val meta = Multimodal.binaryMeta(spark, Sf)
      .select("doc_id", "n_bytes", "n_frames").as[(Long, Long, Long)]
      .collect().toMap2
    val frames = Multimodal.frames(spark, Sf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum(length(col("frame_bytes"))).as("bytes"))
      .as[(Long, Long, Long)].collect()
    assert(frames.length === meta.size)
    frames.foreach { case (doc, n, bytes) =>
      val (nBytes, nFrames) = meta(doc)
      assert(n === nFrames, s"doc $doc frame count")
      assert(bytes === nBytes, s"doc $doc total bytes across frames")
    }
  }

  test("decode emits fixed-width [0,1] float features deterministically") {
    val a = Multimodal.frameFeatures(spark, Sf).collect().toSeq
    val b = Multimodal.frameFeatures(spark, Sf).collect().toSeq
    assert(a === b, "decode must be deterministic")
    val feats = Multimodal.frameFeatures(spark, Sf)
      .select("features").as[Seq[Float]].collect()
    assert(feats.forall(f => f.length == 4 && f.forall(x => x >= 0f && x <= 1f)))
  }

  test("m02 features are first-principles functions of the frame bytes") {
    // the decode stage consumes the PAYLOAD: recompute all four features
    // from the raw frame bytes on the driver and compare float-exactly
    val texts = Tables.documents(spark, Sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    val got = Multimodal.frameFeatures(spark, Sf)
      .select("doc_id", "frame_id", "frame_len", "features")
      .as[(Long, Long, Long, Seq[Float])].collect()
    assert(got.nonEmpty)
    got.take(200).foreach { case (d, f, len, feats) =>
      val bytes = texts(d).getBytes("UTF-8")
        .slice((f * Multimodal.FrameBytes).toInt,
          (f * Multimodal.FrameBytes).toInt + Multimodal.FrameBytes)
        .map(b => (b & 0xff).toLong)
      val n = bytes.length.toLong
      val s1 = bytes.sum; val s2 = bytes.map(v => v * v).sum
      val de = if (n < 2) 0L
        else bytes.sliding(2).map { case Array(x, y) => (y - x) * (y - x) }.sum
      assert(len === n, s"doc $d frame $f len")
      assert(feats(0) === (s1.toDouble / (255 * n)).toFloat, s"doc $d frame $f f0")
      assert(feats(1) === ((n * s2 - s1 * s1).toDouble / (65025.0 * n * n)).toFloat,
        s"doc $d frame $f f1")
      val f2 = if (n > 1) (de.toDouble / (65025.0 * (n - 1))).toFloat else 0f
      assert(feats(2) === f2, s"doc $d frame $f f2")
      assert(feats(3) === (bytes.distinct.length.toDouble / n).toFloat,
        s"doc $d frame $f f3")
    }
  }

  test("m02 features are byte-true on arbitrary (non-ASCII) binary") {
    // same discipline as the m04 spec: bytes outside ASCII including
    // 0x00, 0xFF, and sign-bit bytes — the features must read unsigned
    // BYTES, not characters, so the decode stage is correct for real
    // media payloads
    val payload = Array[Byte](0, -1, -128, 127, 10, 10, -56, 200.toByte)
    val media = Seq((1L, payload)).toDF("doc_id", "payload")
    val got = Multimodal.frameFeaturesOver(Multimodal.frameRows(media))
      .select("frame_id", "frame_len", "features")
      .as[(Long, Long, Seq[Float])].collect().toSeq
    val u = payload.map(b => (b & 0xff).toLong)
    val n = u.length.toLong
    val s1 = u.sum; val s2 = u.map(v => v * v).sum
    val de = u.sliding(2).map { case Array(a, b) => (b - a) * (b - a) }.sum
    assert(got === Seq((0L, n, Seq(
      (s1.toDouble / (255 * n)).toFloat,
      ((n * s2 - s1 * s1).toDouble / (65025.0 * n * n)).toFloat,
      (de.toDouble / (65025.0 * (n - 1))).toFloat,
      (u.distinct.length.toDouble / n).toFloat))))
  }

  test("corpus is pure ASCII at every available sf (m03 oracle precondition)") {
    // the m03 oracle slices frames by CHARACTER position (DuckDB md5
    // takes VARCHAR only), which equals byte position iff the corpus is
    // ASCII. Assert it here so a future non-ASCII fixture fails with
    // this message instead of an opaque driver hash mismatch. m01/m02/
    // m04 slice in hex space and carry no such assumption.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists)
      .foreach { d =>
        val nonAscii = Tables.documents(spark, d)
          .filter(octet_length(col("text")) =!= length(col("text"))).count()
        assert(nonAscii === 0L,
          s"$d has $nonAscii non-ASCII documents — the m03 oracle's " +
            "char-slicing assumption no longer holds; slice its md5 input " +
            "in a byte-true way or regenerate the fixture")
      }
  }

  test("empty payload yields zero frame rows, not a descending-sequence blowup") {
    // frameRows is library surface: a 0-byte payload means n_frames = 0,
    // and an unguarded sequence(0, -1) would emit frames 0 and -1.
    val media = Seq((1L, Array.emptyByteArray), (2L, "abc".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val rows = Multimodal.frameRows(media)
      .select("doc_id", "frame_id").as[(Long, Long)].collect().toSeq
    assert(rows === Seq((2L, 0L)))
  }

  test("hop windows overlap by window−hop bytes and cover the payload") {
    val media = Seq((7L, ("x" * 150).getBytes("UTF-8"))).toDF("doc_id", "payload")
    val wins = Multimodal.hopWindows(media)
      .select("win_id", "start_byte", "win_bytes")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Array[Byte]](2)))
      .sortBy(_._1)
    // 150 bytes, hop 48 → starts 0, 48, 96, 144
    assert(wins.map(_._2).toSeq === Seq(0L, 48L, 96L, 144L))
    // each window is 64 bytes clamped at payload end (so consecutive full
    // windows share 64−48 = 16 bytes): 64, 64, 54, 6
    wins.foreach { case (_, st, b) =>
      assert(b.length === math.min(Multimodal.WindowBytes.toLong, 150L - st))
    }
    val covered = wins.flatMap { case (_, st, b) => st until (st + b.length) }.toSet
    assert(covered === (0L until 150L).toSet)
  }

  test("m04 payload stats are byte-true on arbitrary (non-ASCII) binary") {
    // bytes deliberately outside ASCII, including 0x00, 0xFF, and sign-bit
    // bytes (negative as JVM Byte) — proves the hex recovery reads BYTES,
    // not characters, so the operator is correct for real media payloads
    val payload = Array[Byte](0, -1, -128, 127, 10, 10, -56, 200.toByte)
    val media = Seq((1L, payload)).toDF("doc_id", "payload")
    val got = Multimodal.payloadStatsOver(Multimodal.hopWindows(media))
      .select("win_id", "win_len", "byte_min", "byte_max", "n_distinct",
        "byte_mean", "byte_var", "delta_energy")
      .as[(Long, Long, Long, Long, Long, Double, Double, Long)]
      .collect().toSeq
    val u = payload.map(b => (b & 0xff).toLong) // unsigned view, as the op sees it
    val n = u.length.toLong
    val sum = u.sum; val sq = u.map(v => v * v).sum
    val de = u.sliding(2).map { case Array(a, b) => (b - a) * (b - a) }.sum
    assert(got === Seq((0L, n, u.min, u.max, u.distinct.length.toLong,
      sum.toDouble / n, (n * sq - sum * sum).toDouble / (n * n), de)))
  }

  test("m04 on the real corpus: first-principles recompute per window") {
    val got = Multimodal.payloadStats(spark, Sf)
      .select("doc_id", "win_id", "win_len", "byte_min", "byte_max",
        "n_distinct", "byte_mean", "byte_var", "delta_energy")
      .as[(Long, Long, Long, Long, Long, Long, Double, Double, Long)]
      .collect()
    assert(got.nonEmpty)
    val texts = Tables.documents(spark, Sf).select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    got.take(200).foreach { case (d, w, len, mn, mx, nd, mean, vr, de) =>
      val bytes = texts(d).getBytes("UTF-8")
        .slice((w * Multimodal.HopBytes).toInt,
          (w * Multimodal.HopBytes).toInt + Multimodal.WindowBytes)
        .map(b => (b & 0xff).toLong)
      val n = bytes.length.toLong
      val sum = bytes.sum; val sq = bytes.map(v => v * v).sum
      assert(len === n && mn === bytes.min && mx === bytes.max &&
        nd === bytes.distinct.length.toLong, s"doc $d win $w")
      assert(mean === sum.toDouble / n, s"doc $d win $w mean")
      assert(vr === (n * sq - sum * sum).toDouble / (n * n), s"doc $d win $w var")
      val wantDe = if (n < 2) 0L
        else bytes.sliding(2).map { case Array(a, b) => (b - a) * (b - a) }.sum
      assert(de === wantDe, s"doc $d win $w delta")
    }
  }

  test("m05 patches are 2-D: strided non-contiguous slices, byte-true, truncation") {
    import spark.implicits._
    // 8 pixel rows of 16 bytes; row r is filled with the NON-ASCII byte
    // 0xF0 − r (each grid row constant, so a patch's content depends
    // only on its patch_row — column-position independence is exactly
    // the 2-D strided-slice property a 1-D frame op cannot have)
    val grid = (0 until 8).flatMap(r =>
      Array.fill(16)((0xf0 - r).toByte)).toArray
    // 100 bytes → 6 full pixel rows → ONE full patch row (rows 0–3)
    val partial = (0 until 100).map(i => (i % 251).toByte).toArray
    // 63 bytes → 3 pixel rows → no full patch row → zero patches
    val tiny = Array.fill(63)(0x41.toByte)
    val media = Seq((1L, grid), (2L, partial), (3L, tiny))
      .toDF("doc_id", "payload")
    val got = Multimodal.patchGridOver(media)
      .select("doc_id", "patch_row", "patch_col", "patch_len",
        "byte_sum", "byte_min", "byte_max")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val doc1 = got.filter(_._1 == 1L)
    assert(doc1.size === 8) // 2 patch rows × 4 patch cols
    doc1.foreach { case (_, pr, pc, len, sum, mn, mx) =>
      val vals = (0 until 4).map(r => 0xf0L - (pr * 4 + r))
      assert(len === 16L, s"patch ($pr,$pc)")
      assert(sum === vals.sum * 4, s"patch ($pr,$pc) sum")
      assert(mn === vals.min && mx === vals.max, s"patch ($pr,$pc) range")
    }
    // doc 2: exactly one patch row, byte-true against a direct model
    val doc2 = got.filter(_._1 == 2L)
    assert(doc2.map(p => (p._2, p._3)).sorted ===
      Seq((0L, 0L), (0L, 1L), (0L, 2L), (0L, 3L)))
    doc2.foreach { case (_, pr, pc, len, sum, mn, mx) =>
      val bytes = (0 until 4).flatMap(r =>
        partial.slice(((pr * 4 + r) * 16 + pc * 4).toInt,
          ((pr * 4 + r) * 16 + pc * 4).toInt + 4))
        .map(b => (b & 0xff).toLong)
      assert(len === 16L && sum === bytes.sum &&
        mn === bytes.min && mx === bytes.max, s"doc2 patch ($pr,$pc)")
    }
    assert(!got.exists(_._1 == 3L)) // under one patch row → no output
  }

  test("m06 RLE stats: byte-true runs on non-ASCII binary; empty payload skipped") {
    // runs: [5 5 5] [7 7] [200 200 200 200] — 200 exercises the sign bit
    // (negative JVM Byte), so a char-based reader would miscount
    val p1 = Array[Byte](5, 5, 5, 7, 7, 200.toByte, 200.toByte, 200.toByte, 200.toByte)
    val p2 = Array[Byte](9) // single byte: one run of one
    val media = Seq((1L, p1), (2L, p2), (3L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
    val got = Multimodal.rleStatsOver(media)
      .select("doc_id", "n_bytes", "n_runs", "max_run", "rle_ratio")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 9L, 3L, 4L, 3.0 / 9.0),
      (2L, 1L, 1L, 1L, 1.0))) // doc 3 (empty) skipped by contract
  }

  test("m07 motion energy: byte-true frame differencing incl. short tail frame") {
    // payload of 2.5 frames at FrameBytes=64: frames 0 and 1 full, frame
    // 2 is 32 bytes — its pair compares only 32 positions. Sign-bit
    // bytes included so a char-based diff would be wrong.
    val p = (0 until 64).map(i => (i % 7).toByte).toArray ++
      (0 until 64).map(i => ((i % 7) + 200).toByte).toArray ++
      (0 until 32).map(_ => 5.toByte).toArray
    val media = Seq((1L, p)).toDF("doc_id", "payload")
    val got = Multimodal.motionEnergyOver(Multimodal.frameRows(media))
      .select("frame_id", "n_common", "motion_energy", "mean_sq")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val u = p.map(b => (b & 0xff).toLong)
    def energy(f: Int, n: Int) =
      (0 until n).map { k =>
        val d = u(f * 64 + k) - u((f - 1) * 64 + k); d * d
      }.sum
    val e1 = energy(1, 64); val e2 = energy(2, 32)
    assert(got === Seq(
      (1L, 64L, e1, e1.toDouble / 64),
      (2L, 32L, e2, e2.toDouble / 32)))
    assert(e1 > 0 && e2 > 0)
  }

  test("m10 planted: a spike frame opens a new shot; quiet frames extend; " +
    "one-frame payload is one one-frame shot; empty payload skipped") {
    // 4 frames: 0,1 identical (energy(1)=0), 2 flips every byte (the
    // spike), 3 repeats 2 (energy(3)=0) → per-doc mean = e2/3, the
    // 1.5× test fires only on frame 2: shots [0,1] and [2,3]
    val quiet = (0 until 64).map(_ => 7.toByte).toArray
    val loud = (0 until 64).map(_ => 250.toByte).toArray
    val p1 = quiet ++ quiet ++ loud ++ loud
    val e2 = 64L * (250L - 7L) * (250L - 7L)
    val media = Seq((1L, p1), (2L, quiet), (3L, Array.empty[Byte]))
      .toDF("doc_id", "payload")
    val got = Multimodal.shotSegmentsOver(Multimodal.frameRows(media))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 0L, 1L, 2L, 0L),   // frames 0-1, zero energy
      (1L, 2L, 2L, 3L, 2L, e2),   // the cut OPENS shot 2; frame 3 extends it
      (2L, 1L, 0L, 0L, 1L, 0L)))  // single frame; doc 3 (empty) skipped
  }

  test("m10 ≡ in-memory segmentation on the corpus; cuts actually fire") {
    // full-pipeline differential: UTF-8 payload bytes → 64-byte frames →
    // consecutive diffs → 1.5×-mean integer threshold → islands
    val docs = Tables.documents(spark, Sf).select("doc_id", "text")
      .as[(Long, String)].collect()
    val expect = docs.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8").map(b => (b & 0xff).toLong)
      if (bytes.isEmpty) Seq.empty
      else {
        val nF = math.ceil(bytes.length / 64.0).toInt
        def frame(f: Int) = bytes.slice(f * 64, math.min((f + 1) * 64, bytes.length))
        val energies = (1 until nF).map { f =>
          val (a, b) = (frame(f), frame(f - 1))
          f.toLong -> a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
        }.toMap
        val tot = energies.values.sum
        val nP = energies.size.toLong
        val cut = (f: Long) =>
          f > 0 && 2L * energies(f) * nP > 3L * tot
        var sid = 1L
        val assigned = (0 until nF).map { f =>
          if (cut(f.toLong)) sid += 1
          (f.toLong, sid)
        }
        assigned.groupBy(_._2).toSeq.map { case (shot, fs) =>
          val frames = fs.map(_._1)
          (id, shot, frames.min, frames.max, frames.size.toLong,
            frames.filter(_ > 0).map(energies).sum)
        }
      }
    }.sortBy(t => (t._1, t._2)).toSeq
    val got = Multimodal.shotSegments(spark, Sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect, "shot segmentation drifted from the in-memory model")
    // the threshold is live on this corpus: at least one payload has > 1
    // shot (a threshold no frame crosses would make m10 a no-op)
    assert(got.exists(_._2 > 1L),
      "no payload segmented into > 1 shot — the cut threshold never fires")
  }

  private implicit class ToMap2(val rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("m09 planted: spans split across bins, vision prefix lands in its bin, no-vision docs") {
    def words(n: Int) = Seq.fill(n)("t").mkString(" ")
    // shard 0: doc0 (200 text + 64 vision = 264 → spans bins 0/1),
    //          doc8 (10 + 64 = 74 → [264, 338) inside bin 1)
    // shard 3: doc3 (5 text, 3 % 4 = 3 → NO vision), doc11 (3 text)
    val docs = Seq((0L, words(200)), (8L, words(10)),
      (3L, words(5)), (11L, words(3))).toDF("doc_id", "text")
    val got = Multimodal.interleavedPackOver(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 0L, 1L, 192L, 64L, 256L), // doc0's first 256: 64 vision + 192 text
      (0L, 1L, 2L, 18L, 64L, 82L),   // doc0's tail 8 text + doc8's 64 vis + 10 text
      (3L, 0L, 2L, 8L, 0L, 8L)))     // no vision in shard 3 at all
  }

  test("m09 fill invariant: every bin but a shard's last is exactly full; totals conserve") {
    val out = Multimodal.interleavedPack(spark, Sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val lastBin = out.groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).max }
    out.foreach { case (shard, bin, _, _, _, fill) =>
      if (bin < lastBin(shard)) assert(fill === 256L, s"shard $shard bin $bin underfull")
      else assert(fill >= 1L && fill <= 256L)
    }
    // token conservation: Σ fill ≡ Σ per-doc (text + vision) budgets
    val want = Tables.documents(spark, Sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long)].collect()
      .map { case (id, n) => n + (if (id % 4 < 3) 64L else 0L) }.sum
    assert(out.map(_._6).sum === want)
    assert(out.map(_._5).sum % 64L === 0L, "vision tokens come in whole images across bins")
  }
}
