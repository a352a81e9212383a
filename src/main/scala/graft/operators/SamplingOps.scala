package graft.operators

import graft.{Canon, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The SAMPLING / SPLIT / CHUNKING family: hash splits, stratified and
  * reservoir samples, importance sampling, token budgets, context-window
  * chunking, sequence packing, CDC chunking, and the end-to-end prep
  * pipeline. Split out of the original LlmOps module (round 11). Scale
  * posture: per-group windows are salted or bounded; packing shards by
  * key so parallelism = shard count. */
object SamplingOps {
  import Canon._
  import LlmOps._
  import PairGraph._
  import DedupOps._
  import EmbeddingOps._
  import QualityOps._


  val ChunkTokens = 50

  val ChunkStride = 40

  /** Chunk any (doc_id, t ARRAY<STRING>) token table — the reusable stage
    * [[docChunks]] and [[prepPipeline]] share. */

  def chunkRows(tokenized: DataFrame): DataFrame = {
    val n = size(col("t"))
    tokenized
      // chunk starts at i·stride for i while the start is a valid index;
      // the last chunk may be shorter than ChunkTokens. Guard: an EMPTY
      // token array must yield zero chunks — unguarded, sequence(0, -1)
      // is DESCENDING in Spark (bogus chunk ids 0 and -1, then an ANSI
      // INVALID_ARRAY_INDEX from element_at on the empty slice). Same
      // guard as Multimodal.frameRows.
      .select(col("doc_id"), col("t"),
        explode(when(n > 0,
          sequence(lit(0), floor((n - 1) / ChunkStride).cast("int")))
          .otherwise(array().cast("array<int>")))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("t"), col("chunk_id") * ChunkStride + 1, lit(ChunkTokens))
          .as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * ChunkStride).as("start_tok"),
        size(col("chunk")).cast("long").as("n_chunk_toks"),
        element_at(col("chunk"), 1).as("head_tok"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }

  def docChunks(s: SparkSession, d: String): DataFrame =
    chunkRows(Tables.documents(s, d)
      .select(col("doc_id"), toks(col("text")).as("t")))

  /** The composite quality score of [[textStats]] (d08), factored out so
    * the gate in [[prepPipeline]] is definitionally the same number. */

  def prepPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val keep = docs
      .groupBy(normText(col("text")).as("norm"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val gated = docs
      .join(keep, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(qualityScore(col("t")) >= 1.8)
    chunkRows(gated)
  }

  /** Symmetric int8 quantization of the embedding column — the storage
    * format a 100 TB vector corpus actually ships (4× smaller than
    * float32). Per vector: scale = max|v|/127, qᵢ = round(vᵢ/scale)
    * half-away-from-zero via DECIMAL cast (deterministic across engines,
    * unlike double `round`). Outputs are integer aggregates of the
    * quantized vector (exact — no float drift): squared norm, L1 norm,
    * and the q range, plus the rounded scale. Scan-parallel, no shuffle. */

  def hashSplit(s: SparkSession, d: String): DataFrame =
    splitAssign(s, d).orderBy("doc_id")

  /** Split assignment without the presentation sort — reusable inside
    * joins ([[contamination]]) where a buried ORDER BY is dead weight. */

  private[operators] def splitAssign(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(100L)).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))

  /** d21 — within-document repetition filter (the Gopher/MassiveText
    * quality rule): the fraction of a document's word-3-gram OCCURRENCES
    * that repeat an already-counted 3-gram, plus the share of the single
    * most frequent 3-gram. Boilerplate/template/spam text scores high
    * and gets dropped; `keep` applies the 0.2 duplicate-fraction
    * threshold. Same shingle OCCURRENCE stream as [[docShingles]] but
    * WITHOUT the distinct (occurrence counts are the point); one
    * shuffle keyed by doc_id, ratios are single divisions of exact
    * counts (round4 for the multi-op top-share chain). Docs with <3
    * tokens have no 3-grams and are kept by definition. */

  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    val rate = when(col("lang") === "en", 30L).otherwise(90L) // ≈ balance en vs rest
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        pmod(conv(substring(md5(concat_ws(":", col("lang"), col("doc_id").cast("string"))),
          1, 8), 16, 10).cast("long"), lit(100L)).as("bucket"))
      .withColumn("keep_rate", rate)
      .withColumn("sampled", col("bucket") < col("keep_rate"))
      .orderBy("doc_id")
  }

  /** d56 — per-group EXACT-k uniform sample (distributed reservoir):
    * each language stratum contributes exactly min(k, |stratum|) rows,
    * the missing sampling shape between d23 (per-RATE, so group output
    * size is binomial) and d36 (per-WEIGHT). The draw is the bottom-k
    * by a seeded md5 tag — equivalent to a uniform reservoir draw but
    * deterministic, engine-portable, and rerun-stable: a row's tag
    * depends only on (lang, doc_id), so corpus growth can only
    * DISPLACE the current worst draw, never reshuffle the rest
    * (ReservoirProps pins exactly that).
    *
    * Scale: bottom-k is associative — bottom-k(∪ parts) = bottom-k(∪
    * per-part bottom-k) — so phase 1 takes each stratum's bottom-k
    * within 64 salted sub-partitions (the d42 de-skew rule: no window
    * partitioned by the raw group key over unbounded rows; each salted
    * partition is 1/64th of the stratum, and a production run sizes
    * the salt count to the cluster) and phase 2 re-ranks the ≤ 64·k
    * survivors per stratum — window input bounded by salt·k, never
    * corpus-sized. Both windows ride ONE shuffle each; the oracle is
    * the single-window form, equal by associativity. */

  val ReservoirK = 10

  def reservoirSample(s: SparkSession, d: String, k: Int = ReservoirK): DataFrame =
    reservoirSampleOver(
      Tables.documents(s, d).select(col("doc_id"), col("lang")), k)

  /** [[reservoirSample]] over an explicit (doc_id, lang) frame —
    * package-visible so ReservoirProps can drive synthetic corpora. */

  private[graft] def reservoirSampleOver(docs: DataFrame, k: Int): DataFrame = {
    val salted = Window.partitionBy(col("lang"), col("salt"))
      .orderBy(col("tag"), col("doc_id"))
    val full = Window.partitionBy(col("lang")).orderBy(col("tag"), col("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        // concat (not concat_ws): a NULL lang must poison the tag the
        // way the oracle's `lang || ':' || id` does, not silently
        // collapse to md5(":id") — NULL-lang rows then draw nothing,
        // identical null semantics in both engines.
        substring(md5(concat(col("lang"), lit(":"), col("doc_id").cast("string"))),
          1, 16).as("tag"),
        pmod(col("doc_id"), lit(64L)).as("salt"))
      .withColumn("rn1", row_number().over(salted))
      .filter(col("rn1") <= k)
      .withColumn("draw_rank", row_number().over(full).cast("long"))
      .filter(col("draw_rank") <= k)
      .select(col("doc_id"), col("lang"), col("draw_rank"))
      .orderBy("lang", "draw_rank")
  }

  /** d24 — sharded sequence PACKING (concat-and-chunk): the step that
    * turns a cleaned corpus into fixed-width training rows. Documents
    * are concatenated in deterministic (shard, doc_id) order and the
    * stream is cut every [[PackTokens]] tokens, so a document may span
    * bins (`first_bin`..`last_bin`) — exactly the GPT-style pretraining
    * packing discipline, where samples cross sequence boundaries rather
    * than waste pad tokens.
    *
    * Packing against ONE global order is inherently serial, so the
    * corpus is sharded by `doc_id % {PackShards}` and each shard packs
    * its own stream independently — the window partitions by shard, so
    * parallelism = shard count (a production run sizes shards to the
    * cluster; every assignment is pure (doc_id, n_tokens) arithmetic,
    * reproducible across engines and stable under corpus growth within
    * a shard's suffix). One corpus shuffle (the per-shard window); all
    * outputs are exact integer arithmetic → exact oracle. */

  val PackTokens = 256

  val PackShards = 8

  def seqPacking(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), pmod(col("doc_id"), lit(PackShards.toLong)).as("shard"),
        size(toks(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_off"),
        floor((col("cum") - col("n_tokens")) / PackTokens).as("first_bin"),
        // last token sits at cum−1; empty docs (none in this corpus, but
        // library surface) collapse to their start bin
        when(col("n_tokens") > 0, floor((col("cum") - 1) / PackTokens))
          .otherwise(floor((col("cum") - col("n_tokens")) / PackTokens))
          .as("last_bin"))
      .orderBy("doc_id")
  }

  /** d25 — content-defined chunking (CDC): chunk boundaries from a
    * per-token hash condition (`md5(token) mod 16 == 0`) instead of
    * fixed offsets, the rolling-hash trick of dedup storage systems
    * (LBFS/Rabin chunking) applied to text. Where [[docChunks]]' fixed
    * windows shift all boundaries when a prefix is edited, CDC
    * boundaries re-synchronize after an edit — so chunk-level dedup
    * (join on `chunk_md5`) catches shared content across shifted
    * near-duplicate documents.
    *
    * One token-stream shuffle keyed by doc_id (the chunk-id window +
    * ordered re-assembly); md5 keeps boundaries and chunk hashes
    * engine-portable → exact oracle. */

  val CdcBoundaryMod = 16

  def cdcChunks(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(toks(col("text"))))
      .toDF("doc_id", "pos", "w")
      .withColumn("is_boundary",
        (pmod(conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long"),
          lit(CdcBoundaryMod.toLong)) === 0L).cast("long"))
    // chunk id = boundaries strictly BEFORE this token (the boundary
    // token ends its chunk), via a shifted running sum per document
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    tok
      .withColumn("chunk_id", coalesce(sum(col("is_boundary")).over(w), lit(0L)))
      .groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("n_toks"),
        min(col("pos")).cast("long").as("start_tok"),
        md5(concat_ws(" ",
          expr("transform(array_sort(collect_list(struct(pos, w))), x -> x.w)")))
          .as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }

  // ————————————— near-dup clusters & contamination —————————————

  /** d19 — near-duplicate CLUSTERS: connected components over the exact
    * Jaccard pair graph ([[ngramJaccard]]'s edges), every document
    * labeled with the smallest doc_id reachable through near-dup edges.
    * Pairwise near-dup output is not what a dedup pipeline actually
    * consumes — it keeps ONE representative per duplicate GROUP, and
    * groups are the transitive closure of the pair relation (A≈B, B≈C ⇒
    * {A,B,C} even if A,C don't pair directly).
    *
    * Algorithm: [[ConnectedComponents.largeSmallStar]] (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond") — O(log n) rounds
    * of edge-proportional equi-join work regardless of component
    * diameter, so a pathological chain-shaped duplicate family
    * (serially edited boilerplate) cannot blow the round count the way
    * diameter-bound label propagation would. Non-pair docs never enter
    * the loop and are labeled as singletons at the end by a left join;
    * ConnectedComponentsSpec pins the algorithm against label
    * propagation on the real pair graph and against planted
    * high-diameter chains. */

  def tokenBudget(s: SparkSession, d: String, frac: Double = 0.5,
      prefixLen: Int = 1): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
      size(toks(col("text"))).cast("long").as("n_tokens"),
      md5(col("doc_id").cast("string")).as("h"))
      .withColumn("bkt", substring(col("h"), 1, prefixLen))
    val bucketTotals = docs.groupBy("source", "bkt")
      .agg(sum(col("n_tokens")).as("bt"))
    val wSrc = Window.partitionBy("source").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = bucketTotals
      .withColumn("bkt_off", sum(col("bt")).over(wSrc) - col("bt"))
      .withColumn("src_total", sum(col("bt")).over(Window.partitionBy("source")))
      .select(col("source"), col("bkt"), col("bkt_off"),
        ceil(col("src_total") * frac).cast("long").as("budget"))
    val wIn = Window.partitionBy("source", "bkt").orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .join(broadcast(offsets), Seq("source", "bkt"))
      .withColumn("cum_before",
        col("bkt_off") + sum(col("n_tokens")).over(wIn) - col("n_tokens"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_before"), col("budget"),
        (col("cum_before") < col("budget")).as("selected"))
      .orderBy("doc_id")
  }

  /** d27 — unigram token-ENTROPY quality score: Shannon entropy of each
    * document's token distribution, H = (1/n)·Σ c·(ln n − ln c) over the
    * per-token counts c. Low entropy = repetitive/templated text (the
    * within-doc complement of [[bigramLm]]'s corpus-relative LM score;
    * a keyword-stuffed page scores near 0, diverse prose near ln V).
    * `keep` applies a 2.5-nat floor — on the synthetic corpus entropy
    * spans 1.64–3.35 with median 3.09, so the flag is non-degenerate.
    *
    * Float discipline (see [[graft.Canon]]): every ln lives INSIDE a
    * per-term `dec` canonicalization — the decimal sum is exact and
    * order-independent, and the final entropy is ONE division of
    * engine-identical doubles, shipped raw (same contract as
    * [[bigramLm]]'s avg_logp). The per-doc totals n and n_distinct ride
    * the same doc_id shuffle as the count aggregation (window over the
    * grouped counts, not a second corpus scan). */

  def importanceSample(s: SparkSession, d: String, targetLang: String = "en",
      frac: Double = 0.25, nShards: Int = 0, nBuckets: Int = 64): DataFrame = {
    val shards =
      if (nShards > 0) nShards.toLong
      else math.max(16L, (Tables.documents(s, d).count() + 249999L) / 250000L)
    val u = (conv(substring(md5(concat(lit("g:"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("double") + 0.5) / 4294967296.0
    val keyed = dsirRaw(s, d, targetLang, nBuckets)
      .withColumn("bucket",
        pmod(conv(substring(md5(concat(lit("s:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
          .cast("long"), lit(shards)))
      .withColumn("key", dec(col("weight") - log(-log(u))).cast("double"))
    val w = Window.partitionBy("bucket")
      .orderBy(col("key").desc, col("doc_id").asc)
    keyed
      .withColumn("rn", row_number().over(w))
      .withColumn("n_b", count(lit(1)).over(Window.partitionBy("bucket")))
      .filter(col("rn") <= ceil(col("n_b") * frac))
      .select(col("doc_id"), col("bucket"), round4(col("weight")).as("weight"),
        round4(col("key")).as("key"))
      .orderBy("doc_id")
  }

  /** d37 — tombstone purge manifest (the GDPR/right-to-be-forgotten
    * shape): given a deletion predicate over source ids, report
    * before/purged/after counts for the source table AND each derived
    * store that must purge consistently — here the fingerprint store
    * (doc-keyed derivative) and the embedding store (its own id space).
    *
    * At 100 TB deletion is not per-row mutation: each store rewrites as
    * one ANTI-JOIN compaction (`filter(!tombstoned)` when the predicate
    * is computable, a broadcast anti-join against the tombstone id set
    * when it arrives as a list — the manifest is identical). This query
    * is the audit artifact a deletion job emits; LlmOpsSpec pins that
    * the compacted stores contain no tombstoned ids and stay
    * referentially consistent with the compacted source. Scale: three
    * independent scan-parallel aggregates, no joins, no shuffles beyond
    * the three single-row aggregations. */
}
