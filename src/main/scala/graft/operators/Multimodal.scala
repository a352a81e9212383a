package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `BINARY` payloads with
  * typed metadata, frame sampling, and a feature-extraction stage.
  *
  * The container has no image/audio codecs, so the DECODE step
  * ([[frameFeatures]]) computes codec-free signal features from the
  * actual payload bytes (via the native `byte_values` expression);
  * everything around it — binary schema, frame slicing, per-partition
  * batch shape, the distributed plan — is real and tested
  * (MultimodalSpec). The test payload is the `documents.text` bytes
  * standing in for media bytes (driver tables are the only sanctioned
  * inputs); a real deployment swaps the feature expressions inside
  * [[frameFeatures]] for a codec call with the same ARRAY<FLOAT>
  * signature. */
object Multimodal {
  val FrameBytes = 64

  /** m11's derived-clip id namespace starts here (doc_id + offset; the
    * oracle mirrors the constant). [[clipContainment]] REFUSES a corpus
    * whose doc_ids reach the offset — a collision would conflate a
    * real asset with a derived clip. */
  val ClipIdOffset = 300000L

  /** documents with an opaque binary payload column, as a media table
    * would look: (id, payload BINARY, media metadata). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      col("lang").as("meta_lang"),
      col("source").as("meta_source"))

  /** Binary metadata extraction — byte length, content hash, frame
    * count at [[FrameBytes]]-byte frames, head-of-payload hex. Pure
    * scalar plumbing over BINARY, fully oracle-checkable. */
  def binaryMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d).select(
      col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      // payload is the UTF-8 bytes of text, so md5(payload) ≡ md5(text);
      // DuckDB's md5 is VARCHAR-only, which the oracle mirrors directly.
      md5(col("payload")).as("payload_md5"),
      ceil(length(col("payload")).cast("double") / FrameBytes).cast("long")
        .as("n_frames"),
      upper(hex(substring(col("payload"), 1, 8))).as("head_hex"))
      .orderBy("doc_id")

  /** Frame sampling over any (doc_id, payload BINARY) media table: slice
    * the payload into [[FrameBytes]]-byte frames (the video-frame /
    * audio-window analog), one row per frame — scan-parallel, no shuffle. */
  def frameRows(media: DataFrame): DataFrame =
    media
      .withColumn("n_frames",
        ceil(length(col("payload")).cast("double") / FrameBytes).cast("int"))
      // guard: an empty payload (n_frames = 0) must yield ZERO frame rows —
      // an unguarded sequence(0, -1) is DESCENDING in Spark and would emit
      // two bogus frames (ids 0 and -1).
      .select(col("doc_id"), col("payload"),
        explode(when(col("n_frames") > 0,
          sequence(lit(0), col("n_frames") - 1))
          .otherwise(array().cast("array<int>"))).as("frame_id"))
      .select(col("doc_id"), col("frame_id").cast("long").as("frame_id"),
        expr(s"substring(payload, frame_id * $FrameBytes + 1, $FrameBytes)")
          .as("frame_bytes"))

  def frames(s: SparkSession, d: String): DataFrame =
    frameRows(mediaTable(s, d))

  /** Overlapping windows over the payload: [[WindowBytes]]-byte windows
    * every [[HopBytes]] bytes (hop < window ⇒ consecutive windows share
    * `WindowBytes - HopBytes` bytes) — the audio STFT / sliding-feature
    * analog of [[frameRows]]' disjoint tiling. Windows start while their
    * offset is inside the payload; the tail window may be short. One row
    * per (doc, window), scan-parallel. */
  val WindowBytes = 64
  val HopBytes = 48

  def hopWindows(media: DataFrame): DataFrame =
    media
      .withColumn("n_win",
        ceil(length(col("payload")).cast("double") / HopBytes).cast("int"))
      .select(col("doc_id"), col("payload"),
        explode(when(col("n_win") > 0,
          sequence(lit(0), col("n_win") - 1))
          .otherwise(array().cast("array<int>"))).as("win_id"))
      .select(col("doc_id"), col("win_id").cast("long").as("win_id"),
        (col("win_id") * HopBytes).cast("long").as("start_byte"),
        expr(s"substring(payload, win_id * $HopBytes + 1, $WindowBytes)")
          .as("win_bytes"))

  /** Oracle-facing summary of [[hopWindows]] over the documents-as-media
    * table: per-window length and content hash. */
  def hopWindowMeta(s: SparkSession, d: String): DataFrame =
    hopWindows(mediaTable(s, d))
      .select(col("doc_id"), col("win_id"), col("start_byte"),
        length(col("win_bytes")).cast("long").as("win_len"),
        md5(col("win_bytes")).as("win_md5"))
      .orderBy("doc_id", "win_id")

  /** Per-frame feature vectors computed from the ACTUAL frame bytes.
    *
    * The container has no media codecs, so the "decode" stage is the
    * codec-free one: signal-level statistics of the frame's raw byte
    * stream, recovered as ARRAY<LONG> by the native
    * [[graft.functions.ByteValues]] expression (byte-true for arbitrary
    * BINARY) and reduced with array HOFs — every feature is a function
    * of the frame's CONTENT, normalized to [0, 1]:
    *
    *   f0 = Σv / (255·n)            mean byte level
    *   f1 = (n·Σv² − (Σv)²)/(65025·n²)  byte variance (max ¼)
    *   f2 = Σ(vᵢ₊₁−vᵢ)² / (65025·(n−1)) high-frequency energy (0 if n=1)
    *   f3 = |distinct bytes| / n    alphabet ratio
    *
    * A real pipeline swaps exactly the four feature expressions for a
    * codec UDF / mapPartitions batch call of the same ARRAY<FLOAT>
    * shape; schema, partitioning, and everything downstream stay
    * unchanged. Bit-exactness: every numerator/denominator is an exact
    * integer (≤ 2⁵³), so each feature is ONE IEEE double division both
    * engines compute identically, then one float32 rounding — no
    * tolerance needed (Canon.round4 note). Scan-parallel, no shuffle
    * before the presentation sort. */
  def frameFeatures(s: SparkSession, d: String): DataFrame =
    frameFeaturesOver(frames(s, d))

  /** [[frameFeatures]] over any (doc_id, frame_id, frame_bytes) frame
    * table — split out so specs can prove byte-trueness on arbitrary
    * non-ASCII binary payloads (the m04 discipline). */
  private[graft] def frameFeaturesOver(fr: DataFrame): DataFrame = {
    val n = length(col("frame_bytes")).cast("long")
    def lsum(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      aggregate(arr, lit(0L), (acc, x) => acc + x)
    val deltas = zip_with(
      slice(col("bs"), lit(1), (n - 1).cast("int")),
      slice(col("bs"), lit(2), (n - 1).cast("int")),
      (a, b) => (b - a) * (b - a))
    fr
      .withColumn("bs", call_function(graft.functions.ByteValues.Name, col("frame_bytes")))
      .withColumn("n", n)
      .withColumn("s1", lsum(col("bs")))
      .withColumn("s2", lsum(transform(col("bs"), v => v * v)))
      .withColumn("de", lsum(deltas))
      .withColumn("nd", size(array_distinct(col("bs"))).cast("long"))
      .select(
        col("doc_id"), col("frame_id"), col("n").as("frame_len"),
        array(
          (col("s1").cast("double") / (col("n") * 255)).cast("float"),
          ((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
            (col("n") * col("n") * 65025)).cast("float"),
          when(col("n") > 1, col("de").cast("double") / ((col("n") - 1) * 65025))
            .otherwise(lit(0.0)).cast("float"),
          (col("nd").cast("double") / col("n")).cast("float")).as("features"))
      .orderBy("doc_id", "frame_id")
  }

  /** m04 — windowed byte statistics over the ACTUAL payload bytes: the
    * signal-level features an audio/image pipeline computes per window
    * (mean level, variance, high-frequency energy, dynamic range,
    * byte alphabet size), here over the raw 8-bit byte stream. Unlike
    * [[frameFeatures]]' stub decode, every output column is a function
    * of the payload CONTENT — this is the payload-consuming member of
    * the multimodal family.
    *
    * Per window: bytes are recovered as an ARRAY<LONG> by the native
    * [[graft.functions.ByteValues]] expression (byte-true for arbitrary
    * BINARY, not just ASCII; one flat `b & 0xff` loop — the hex+conv
    * compositional route measured ~4.4 s at sf0.1, see the expression's
    * scaladoc) and reduced with array HOFs — scan-parallel, zero
    * exchanges, one whole-stage-codegen span; at 100 TB this is a pure
    * map over whatever partitioning the media table already has.
    *
    * Bit-exactness: sums/min/max/delta-energy are integer arithmetic
    * (exact in any engine); `byte_mean` and `byte_var` are each ONE
    * IEEE division of engine-identical integers (var via the
    * computational identity n·Σv² − (Σv)² over n² — numerator and
    * denominator both exact integers), so no rounding is needed
    * (Canon.round4 note). */
  def payloadStats(s: SparkSession, d: String): DataFrame =
    payloadStatsOver(hopWindows(mediaTable(s, d)))

  private[graft] def payloadStatsOver(wins: DataFrame): DataFrame = {
    val n = length(col("win_bytes")).cast("long")
    val bytes = call_function(graft.functions.ByteValues.Name, col("win_bytes"))
    def lsum(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      aggregate(arr, lit(0L), (acc, x) => acc + x)
    val deltas = zip_with(
      slice(col("bs"), lit(1), (n - 1).cast("int")),
      slice(col("bs"), lit(2), (n - 1).cast("int")),
      (a, b) => (b - a) * (b - a))
    wins
      .withColumn("bs", bytes)
      .withColumn("s1", lsum(col("bs")))
      .withColumn("s2", lsum(transform(col("bs"), v => v * v)))
      .select(
        col("doc_id"), col("win_id"),
        n.as("win_len"),
        array_min(col("bs")).as("byte_min"),
        array_max(col("bs")).as("byte_max"),
        size(array_distinct(col("bs"))).cast("long").as("n_distinct"),
        (col("s1").cast("double") / n).as("byte_mean"),
        ((n * col("s2") - col("s1") * col("s1")).cast("double") / (n * n))
          .as("byte_var"),
        lsum(deltas).as("delta_energy"))
      .orderBy("doc_id", "win_id")
  }

  /** Oracle-facing projection of [[frameFeatures]]: the ARRAY<FLOAT>
    * feature vector flattened to scalar doubles (f0..f3), because the
    * driver's pandas-based compare cannot sort/hash an array column.
    * The float32 roundtrip is kept (element_at on the real float array,
    * then cast up) so this checks the exact values a library user reads;
    * DuckDB mirrors it with CAST(x AS REAL)::DOUBLE — verified
    * bit-identical for every byte value k/255.0. */
  def frameFeaturesFlat(s: SparkSession, d: String): DataFrame = {
    val flat = (0 until 4).map(i =>
      graft.Canon.round4(element_at(col("features"), i + 1).cast("double"))
        .as(s"f$i"))
    frameFeatures(s, d)
      .select(col("doc_id") +: col("frame_id") +: col("frame_len") +: flat: _*)
      .orderBy("doc_id", "frame_id")
  }

  /** m05 — 2-D PATCH grid (the ViT "patchify" stage): the payload is
    * interpreted as a row-major [[RowBytes]]-wide pixel grid (width
    * would come from media metadata in a real table; the fixtures carry
    * none, so it is a constant here) and tiled into disjoint
    * [[PatchSize]]×[[PatchSize]] patches — one output row per patch
    * with its grid coordinates and byte-true content statistics. The
    * 1-D frame family (m02/m04) cannot express this: a 2-D patch's
    * bytes are NON-CONTIGUOUS in the payload ([[PatchSize]] strided
    * row slices), which is exactly what makes patchify a distinct
    * operator shape.
    *
    * Plan: patches explode from a computed grid size (empty-payload
    * guarded like [[frameRows]]); each patch's bytes are [[PatchSize]]
    * strided `substring`s concatenated — static unrolled, inside one
    * codegen span — then [[graft.functions.ByteValues]] recovers values
    * for integer-exact sum/min/max. Scan-parallel, zero exchanges
    * before the presentation sort (the m04 posture); partial rows and
    * partial patch-rows are truncated (a doc under
    * [[RowBytes]]·[[PatchSize]] bytes yields no patches). */
  val RowBytes = 16
  val PatchSize = 4

  def patchGrid(s: SparkSession, d: String): DataFrame =
    patchGridOver(mediaTable(s, d))

  /** [[patchGrid]] over any (doc_id, payload BINARY) media table —
    * split out so specs can plant payloads with known 2-D structure
    * (constant columns / rows) and non-ASCII bytes. */
  private[graft] def patchGridOver(media: DataFrame): DataFrame = {
    val W = RowBytes
    val P = PatchSize
    val cols = W / P // patch-grid width
    val rows = media
      // full pixel rows only, then full patch rows only
      .withColumn("n_pr",
        expr(s"(length(payload) div $W) div $P").cast("int"))
      .select(col("doc_id"), col("payload"),
        explode(when(col("n_pr") > 0,
          sequence(lit(0), col("n_pr") * cols - 1))
          .otherwise(array().cast("array<int>"))).as("pid"))
      .select(col("doc_id"), col("payload"),
        expr(s"pid div $cols").cast("long").as("patch_row"),
        (col("pid") % cols).cast("long").as("patch_col"))
    val patchBytes = concat((0 until P).map(r =>
      expr(s"substring(payload, ((patch_row * $P + $r) * $W" +
        s" + patch_col * $P) + 1, $P)")): _*)
    val bs = call_function(graft.functions.ByteValues.Name, col("pb"))
    rows
      .withColumn("pb", patchBytes)
      .withColumn("bs", bs)
      .select(col("doc_id"), col("patch_row"), col("patch_col"),
        length(col("pb")).cast("long").as("patch_len"),
        aggregate(col("bs"), lit(0L), (acc, x) => acc + x).as("byte_sum"),
        array_min(col("bs")).as("byte_min"),
        array_max(col("bs")).as("byte_max"))
      .orderBy("doc_id", "patch_row", "patch_col")
  }

  /** m07 — frame-to-frame MOTION energy (the temporal multimodal
    * feature): per consecutive frame pair (f−1, f) of a payload,
    * Σ(bᵢ(f) − bᵢ(f−1))² over the common byte length — the
    * motion-detection / scene-cut signal a video pipeline computes
    * between decoded frames, here over the raw frame bytes (the same
    * codec-free stand-in discipline as m02: a real decoder swaps in
    * upstream, the differencing stage is unchanged). The FIRST frame
    * has no predecessor and emits nothing; the TAIL frame compares
    * only its own (short) length.
    *
    * Plan: one lag window keyed on doc_id (per-doc frame count is
    * payload-proportional — bounded partitions, no content key), then
    * scan-parallel `byte_values` + `zip_with` arithmetic inside one
    * codegen span. Integer energy, exact in any engine; `mean_sq` is
    * ONE IEEE division. */
  def motionEnergy(s: SparkSession, d: String): DataFrame =
    motionEnergyOver(frames(s, d))

  private[graft] def motionEnergyOver(fr: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_id")
    val bsA = call_function(graft.functions.ByteValues.Name, col("frame_bytes"))
    val bsB = call_function(graft.functions.ByteValues.Name, col("prev_bytes"))
    fr
      .withColumn("prev_bytes", lag(col("frame_bytes"), 1).over(w))
      .filter(col("prev_bytes").isNotNull)
      .withColumn("a", bsA)
      .withColumn("b", bsB)
      .withColumn("n_common", least(size(col("a")), size(col("b"))).cast("long"))
      .withColumn("energy",
        aggregate(
          zip_with(
            slice(col("a"), lit(1), col("n_common").cast("int")),
            slice(col("b"), lit(1), col("n_common").cast("int")),
            (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v))
      .select(col("doc_id"), col("frame_id"), col("n_common"),
        col("energy").as("motion_energy"),
        (col("energy").cast("double") / col("n_common")).as("mean_sq"))
      .orderBy("doc_id", "frame_id")
  }

  /** m10 — SHOT segmentation: group each payload's frames into scenes
    * at motion-energy spikes — what a video pipeline runs right after
    * m07's differencing (PySceneDetect's content-detector shape:
    * threshold the inter-frame signal, cut where it spikes, emit
    * per-shot rows for downstream sampling/dedup at the SHOT grain
    * rather than the frame grain). A frame is a CUT when its energy
    * exceeds 1.5× its payload's mean energy, tested in exact integer
    * form — `2 · energy · n_pairs > 3 · Σ energy` — so the adaptive
    * threshold needs no IEEE division and can never drift between
    * engines (1.5, not the folkloric 2: text-byte frames are near-
    * uniform and their spike ratio tops out just under 2 on this
    * corpus — a threshold no frame ever crosses is a no-op operator;
    * the specs pin that cuts actually fire); the cut frame OPENS its
    * shot (the transition belongs to the new scene). Frame 0 has no
    * predecessor signal and anchors shot 1; a one-frame payload is one
    * one-frame shot.
    *
    * Plan: m07's differencing reused verbatim, one payload-grain
    * aggregate for the thresholds (joined back broadcast-or-shuffle by
    * doc_id), then the e34 gaps-and-islands shape — shot_id =
    * 1 + running cut count over a doc_id-keyed frame-order window
    * (payload-proportional partitions, never content-keyed) — and one
    * groupBy(doc, shot) rollup. Everything after the byte differencing
    * is frame-count-grain: at 100 TB the only heavy term is m07's
    * scan, which this shares, not repeats, with a persisted-frames
    * caller. */
  def shotSegments(s: SparkSession, d: String): DataFrame =
    shotSegmentsOver(frames(s, d))

  private[graft] def shotSegmentsOver(fr: DataFrame): DataFrame = {
    val en = motionEnergyOver(fr)
      .select(col("doc_id"), col("frame_id"), col("motion_energy"))
    val tot = en.groupBy("doc_id")
      .agg(dsum_long(col("motion_energy")).as("tot_e"),
        count(lit(1)).as("n_pairs"))
    val flags = en.join(tot, "doc_id")
      .select(col("doc_id"), col("frame_id"), col("motion_energy"),
        (col("motion_energy") * col("n_pairs") * 2L >
          col("tot_e") * 3L).cast("int").as("cut"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    fr.select(col("doc_id"), col("frame_id"))
      .join(flags, Seq("doc_id", "frame_id"), "left_outer")
      .withColumn("shot_id", (lit(1L) + sum(coalesce(col("cut"), lit(0))).over(w))
        .cast("long"))
      .groupBy("doc_id", "shot_id")
      .agg(min(col("frame_id")).as("first_frame"),
        max(col("frame_id")).as("last_frame"),
        count(lit(1)).as("n_frames"),
        dsum_long(coalesce(col("motion_energy"), lit(0L))).as("shot_energy"))
      .orderBy("doc_id", "shot_id")
  }

  /** Exact integer sum that stays BIGINT-typed in both engines. */
  private def dsum_long(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c).cast("long")

  /** m06 — RUN-LENGTH compressibility profile of the payload byte
    * stream: maximal equal-byte runs counted in ONE left fold over the
    * `byte_values` array (state = (prev, current-run, max-run, runs) —
    * O(1) per byte, no window, no explode). `rle_ratio` = runs/bytes is
    * the classic cheap compressibility proxy (the quality signal
    * pipelines use to drop low-entropy boilerplate — an all-one-byte
    * payload scores 1/n, incompressible noise scores ~1.0); `max_run`
    * is the padding/stuck-sensor detector. A zlib call gives a sharper
    * ratio but is a JNI black box no oracle can recompute; the RLE
    * bound is deterministic integer arithmetic both engines agree on.
    *
    * Scan-parallel, zero exchanges before the presentation sort — the
    * m04 scale shape. Zero-length payloads are skipped (documented:
    * a ratio over 0 bytes is undefined; the spec pins the skip).
    * Integer counts + ONE IEEE division — engine-exact, no rounding. */
  def rleStats(s: SparkSession, d: String): DataFrame =
    rleStatsOver(mediaTable(s, d))

  private[graft] def rleStatsOver(media: DataFrame): DataFrame = {
    val bs = call_function(graft.functions.ByteValues.Name, col("payload"))
    val init = struct(lit(-1L).as("prev"), lit(0L).as("cur"),
      lit(0L).as("mx"), lit(0L).as("runs"))
    val folded = aggregate(col("bs"), init, (acc, v) => {
      val same = acc.getField("prev") === v
      val cur2 = when(same, acc.getField("cur") + 1L).otherwise(lit(1L))
      struct(v.as("prev"), cur2.as("cur"),
        greatest(acc.getField("mx"), cur2).as("mx"),
        when(same, acc.getField("runs"))
          .otherwise(acc.getField("runs") + 1L).as("runs"))
    })
    media
      .filter(length(col("payload")) > 0)
      .withColumn("bs", bs)
      .withColumn("st", folded)
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        col("st.runs").as("n_runs"),
        col("st.mx").as("max_run"),
        (col("st.runs").cast("double") /
          length(col("payload")).cast("long")).as("rle_ratio"))
      .orderBy("doc_id")
  }

  /** m08 — ASSET-level near-dup detection over opaque binary payloads:
    * the dedup family extended to the multimodal path. A re-uploaded
    * media asset is rarely byte-identical (containers differ, heads
    * get trimmed), but a trimmed/re-wrapped copy shares most of its
    * CONTENT frames — so the near-dup identity is the Jaccard over
    * each asset's DISTINCT [[FrameBytes]]-byte frame set (the d02
    * shingle rule at frame grain), with exact copies falling out at
    * jac = 1. Blocking/verify is d02's plan verbatim: per-frame
    * document frequency cap (a padding/silence frame shared by
    * everything would explode candidates — the zipf-head hazard at
    * frame grain), candidate pairs by shared RARE frame (bucketed
    * equi-join, never all-pairs), exact verify over full frame sets.
    * Frame key = the frame's hex string (content-identical across
    * engines); at 100 TB the key becomes xxhash64(frame) — 8-byte
    * shuffle keys, the d01 note.
    *
    * Registry instance: the document payloads plus two derived asset
    * populations the oracle mirrors — exact re-uploads (doc ≡ 7
    * mod 20, payload unchanged, id + 2·10⁵) and head-trimmed copies
    * (doc ≡ 3 mod 20 with > one frame, first frame cut, id + 10⁵ —
    * the trim is exactly one frame so alignment is preserved and the
    * copy shares all frames but the head: jac = (n−1)/n). */
  def assetDedup(s: SparkSession, d: String, tau: Double = 0.5): DataFrame = {
    val base = mediaTable(s, d).select(col("doc_id"), col("payload"))
    val clones = base.filter(pmod(col("doc_id"), lit(20L)) === 7)
      .select((col("doc_id") + 200000L).as("doc_id"), col("payload"))
    val clipped = base.filter(pmod(col("doc_id"), lit(20L)) === 3 &&
        length(col("payload")) > FrameBytes)
      .select((col("doc_id") + 100000L).as("doc_id"),
        expr(s"substring(payload, ${FrameBytes + 1})").as("payload"))
    assetDedupOver(base.unionByName(clones).unionByName(clipped), tau)
  }

  /** [[assetDedup]] over an explicit (doc_id, payload BINARY) asset
    * table — package-visible for the planted trim/clone/unrelated
    * specs. */
  private[graft] def assetDedupOver(assets: DataFrame, tau: Double): DataFrame =
    framePairCounts(assets)
      .withColumn("jac_raw", col("n_common").cast("double") /
        (col("n_i") + col("n_j") - col("n_common")))
      .filter(col("jac_raw") >= tau)
      .select(col("i"), col("j"), col("n_common"), col("n_i"), col("n_j"),
        graft.Canon.round4(col("jac_raw")).as("jac"))
      .orderBy("i", "j")

  /** The shared frame-grain pair kernel behind m08 (Jaccard) and m11
    * (containment): distinct frame sets, DF cap, rare-frame candidate
    * pairs, full-set intersection counts — the d02 candidate machinery
    * at frame grain, metric left to the caller. Returns
    * (i, j, n_common, n_i, n_j). */
  private def framePairCounts(assets: DataFrame): DataFrame = {
    val fr = frameRows(assets)
      .select(col("doc_id"), upper(hex(col("frame_bytes"))).as("fh"))
      .distinct()
    val freq = fr.groupBy("fh").agg(count(lit(1)).as("df"))
    val rare = fr.join(freq.filter(col("df") <= lit(PairGraph.MaxShingleDf))
      .select("fh"), "fh")
    val cand = rare.as("a").join(rare.as("b"),
        col("a.fh") === col("b.fh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j")).distinct()
    val sizes = fr.groupBy("doc_id").agg(count(lit(1)).as("n_fr"))
    val common = cand
      .join(fr.as("fa"), col("fa.doc_id") === col("i"))
      .join(fr.as("fb"), col("fb.doc_id") === col("j") &&
        col("fb.fh") === col("fa.fh"))
      .groupBy("i", "j").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("i"), col("n_fr").as("n_i")), "i")
      .join(sizes.select(col("doc_id").as("j"), col("n_fr").as("n_j")), "j")
  }

  /** m11 — CLIP CONTAINMENT: the content-ID question m08 structurally
    * cannot answer — "is this short asset a CLIP cut out of that long
    * one?" m08's Jaccard normalizes by the UNION, so a 3-frame clip
    * inside a 100-frame video scores 3/100 and dies at any useful τ;
    * the d40 containment rule at frame grain normalizes by the SMALLER
    * side — n_common / min(n_i, n_j) — and the embedded clip scores
    * 1.0 regardless of the host's length. Same candidate machinery as
    * m08 ([[framePairCounts]]: distinct-frame sets, zipf-head DF cap,
    * rare-frame bucketed equi-join, exact verify — never all-pairs),
    * one different denominator; at 100 TB the frame key becomes
    * xxhash64(frame) (the d01 note) and the kernel is unchanged.
    *
    * Registry instance: the document payloads plus a derived CLIP
    * population the oracle mirrors — docs ≡ 5 mod 20 with more than 4
    * frames contribute id + 3·10⁵ whose payload is frames 2..4 cut at
    * a frame boundary (substring at byte 2·[[FrameBytes]]+1, length
    * 3·[[FrameBytes]]) — frame-aligned, so every clip frame IS a
    * parent frame and the pair scores containment 1.0 while its
    * Jaccard is ~3/n (the gap the operator exists for; spec pins it). */
  def clipContainment(s: SparkSession, d: String, tau: Double = 0.9): DataFrame = {
    val base = mediaTable(s, d).select(col("doc_id"), col("payload"))
    // the derived-clip id namespace is doc_id + ClipIdOffset (the
    // oracle mirrors the same offset): a corpus whose doc_ids reach the
    // offset would conflate a real asset with a derived clip, so refuse
    // loudly (the UniMaxWord discipline) instead of silently colliding —
    // one planner-sized guard aggregate over the asset table
    val maxId = Option(base.agg(max(col("doc_id"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(-1L)
    require(maxId < ClipIdOffset,
      s"clipContainment: corpus doc_id $maxId reaches the derived-clip " +
        s"id offset $ClipIdOffset — raise ClipIdOffset (and the oracle's " +
        "mirrored constant) for such corpora")
    val clips = base.filter(pmod(col("doc_id"), lit(20L)) === 5 &&
        length(col("payload")) > FrameBytes * 4)
      .select((col("doc_id") + ClipIdOffset).as("doc_id"),
        expr(s"substring(payload, ${2 * FrameBytes + 1}, ${3 * FrameBytes})")
          .as("payload"))
    clipContainmentOver(base.unionByName(clips), tau)
  }

  /** [[clipContainment]] over an explicit (doc_id, payload BINARY)
    * asset table — package-visible for the planted clip/host specs. */
  private[graft] def clipContainmentOver(assets: DataFrame,
      tau: Double): DataFrame =
    framePairCounts(assets)
      .withColumn("cont_raw", col("n_common").cast("double") /
        least(col("n_i"), col("n_j")))
      .filter(col("cont_raw") >= tau)
      .select(col("i"), col("j"), col("n_common"), col("n_i"), col("n_j"),
        graft.Canon.round4(col("cont_raw")).as("containment"))
      .orderBy("i", "j")

  /** m09 — INTERLEAVED multimodal sequence packing: the d24 packer
    * extended with a VISION modality — a multimodal pretraining batch
    * is text tokens interleaved with fixed-budget image-placeholder
    * spans (a ViT encoder emits [[VisionTokens]] tokens per image
    * regardless of content), and the packer must budget BOTH against
    * the context window. Every document with an associated image
    * (deterministically: `doc_id % 4 < 3`, ~75% of the corpus — a real
    * pipeline joins the asset table) prepends its placeholder span; the
    * concat-and-chunk stream is cut every [[SamplingOps.PackTokens]]
    * tokens within `doc_id % PackShards` shards exactly like d24.
    *
    * Output grain is the per-(shard, bin) OCCUPANCY — what the batch
    * assembler actually needs: how many documents touch the window and
    * how its budget splits between text and vision tokens. A document
    * spanning several bins splits by pure interval arithmetic — the
    * span [start, end) explodes to one row per touched bin
    * (`sequence(first_bin, last_bin)` — documents are bounded, so the
    * fanout is ≤ doc_tokens/bin + 1 rows), the vision prefix
    * [start, start + n_vision) overlaps each bin in closed form, and
    * everything aggregates back map-side-combined. One shard-keyed
    * window shuffle (the d24 prefix sum) + one (shard, bin) aggregate;
    * all integer `div` arithmetic — exact cross-engine. Every bin but
    * a shard's last is FULL (fill = PackTokens), which the spec pins. */
  val VisionTokens = 64L

  def interleavedPack(s: SparkSession, d: String): DataFrame =
    interleavedPackOver(Tables.documents(s, d))

  private[graft] def interleavedPackOver(docs: DataFrame): DataFrame = {
    import SamplingOps.{PackShards, PackTokens}
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val spans = docs
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(PackShards.toLong)).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_text"),
        when(col("doc_id") % 4 < 3, lit(VisionTokens)).otherwise(lit(0L))
          .as("n_vision"))
      .withColumn("n_tok", col("n_text") + col("n_vision"))
      .withColumn("end_off", sum(col("n_tok")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tok"))
      .filter(col("n_tok") > 0)
    spans
      .select(col("shard"), col("start_off"), col("end_off"), col("n_vision"),
        explode(sequence(expr(s"start_off div $PackTokens"),
          expr(s"(end_off - 1) div $PackTokens"))).as("bin"))
      .withColumn("bin_lo", col("bin") * PackTokens)
      .withColumn("bin_hi", col("bin_lo") + PackTokens)
      .withColumn("tok_in_bin",
        least(col("end_off"), col("bin_hi")) -
          greatest(col("start_off"), col("bin_lo")))
      .withColumn("vis_in_bin",
        greatest(lit(0L),
          least(col("start_off") + col("n_vision"), col("bin_hi")) -
            greatest(col("start_off"), col("bin_lo"))))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok_in_bin") - col("vis_in_bin")).as("n_text_tokens"),
        sum(col("vis_in_bin")).as("n_vision_tokens"),
        sum(col("tok_in_bin")).as("fill"))
      .orderBy("shard", "bin")
  }
}
