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


  /** Training-data chunking: overlapping token windows of [[ChunkTokens]]
    * tokens at stride [[ChunkStride]] — the standard context-window
    * preparation step (overlap = size − stride tokens preserves
    * cross-boundary context). One output row per chunk, identified by
    * (doc_id, chunk_id); the chunk body travels as an md5 + head token +
    * length so rows stay narrow for the compare harness — a real sink
    * would keep the token slice column itself. Scan-parallel: the
    * explode is per-document, no shuffle before the final order. */
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


  /** Capstone composition — the minimal end-to-end training-data prep
    * pipeline, each stage an operator declared above, composed as lazy
    * DataFrames (ONE Catalyst plan, no materialization barriers):
    *
    *   1. exact dedup (E18 keep-rule: min doc_id per normalized text),
    *   2. quality gate (d08's composite score ≥ 1.8 — drops ~half the
    *      corpus; the score range at sf0.01 is 1.26–2.77),
    *   3. context-window chunking (d14's 50-token / stride-40 windows).
    *
    * Everything shuffles on high-cardinality keys (norm-text hash,
    * doc_id) — the composition adds no new scale hazard beyond its
    * stages. */
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


  /** Reproducible corpus splitting: 80/10/10 train/val/test by a hash
    * bucket of the document id — the split a training pipeline must hold
    * fixed across runs, engines, and corpus growth (a row's assignment
    * never depends on what other rows exist, unlike `sample()`/RNG
    * splits which reshuffle under repartitioning). md5 keeps the bucket
    * engine-portable; per-row arithmetic, no shuffle. */
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


  /** d23 — deterministic STRATIFIED sampling: per-language keep rates
    * (the dominant language downsampled to rebalance the corpus — the
    * domain/language mixing step of every multilingual pretraining
    * recipe), assigned by an md5 bucket salted with the stratum so the
    * choice is reproducible, engine-portable, independent of d17's
    * split buckets, and stable under corpus growth (a row's fate
    * depends only on its own id, lang, and its stratum's rate — never
    * on what other rows exist, unlike `sampleBy`'s RNG). Per-row
    * arithmetic, no shuffle before the output order. */
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


  /** d26 — token-BUDGET corpus selection under per-source budgets (the
    * domain-mixing step of a pretraining recipe: each source/domain gets
    * a token allowance, documents are consumed in a deterministic
    * shuffled order until the allowance runs out). A document is
    * `selected` iff its STARTING offset in its source's md5-ordered
    * stream is below the source budget (greedy take-while-open; the
    * boundary document may overshoot — the standard packing-cut rule,
    * same convention as [[seqPacking]]'s boundary bins).
    *
    * The running token offset is a distributed PREFIX SUM, not one
    * per-source window: a per-source window serializes each source into
    * a single task, and real corpora have dominant sources (a 50%-share
    * source = 50 TB through one task). Instead the md5 order key is
    * range-split on its first hex character into 16 buckets — the bucket
    * is a PREFIX of the order key, so (bucket, h) ordering equals plain
    * h ordering — then: (1) one tiny aggregate of per-(source, bucket)
    * token totals (n_sources × 16 rows) produces each bucket's starting
    * offset and the source totals; (2) the corpus-sized window runs per
    * (source, bucket), bounding any task at ~1/16 of a source.
    * `prefixLen` is the skew knob: 2 hex chars give 256-way splitting,
    * n chars 16ⁿ-way — results are IDENTICAL at any width (LlmOpsSpec
    * pins prefixLen 1 ≡ 2) because the decomposition only re-groups the
    * same ordered prefix sum. The budget itself is corpus-relative
    * (`frac` × source tokens) so the operator is scale-free. */
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


  /** d36 — importance RESAMPLING over the [[dsirWeights]] scores (the
    * second half of DSIR): draw a `frac` sample biased toward
    * target-like documents via the Gumbel-top-k trick — adding Gumbel
    * noise g = −ln(−ln(u)) to a log-weight and taking the top k is
    * equivalent to sampling k items without replacement with
    * probability ∝ exp(weight). The uniforms come from salted md5 of
    * the doc id (engine-portable, reproducible — no RNG state), and the
    * ranking key is DECIMAL(30,6)-canonicalized with a doc_id tiebreak
    * so both engines rank identically.
    *
    * Scale: a GLOBAL top-k at 25% of a 100 TB corpus would funnel the
    * sort into one task (or a driver-sized TakeOrdered), so the take is
    * SHARDED — the same d24/d26 discipline: documents hash into 16 md5
    * buckets and each bucket takes its own top ⌈frac·n_b⌉. This is a
    * STRATIFIED draw, not the global top-k: each random stratum admits
    * its local top fraction, so per-bucket thresholds fluctuate around
    * the global one by O(1/√n_b) — the price of removing the
    * single-task sort, and statistically immaterial once buckets hold
    * thousands of documents. Every window partitions by bucket — no
    * single-task stage anywhere.
    *
    * `nShards` ≤ 0 (the registered default) SCALES WITH THE CORPUS:
    * max(16, ⌈n_docs / 250 000⌉), so each shard's single-task sort is
    * bounded at ~250k rows no matter the corpus size — a fixed 16
    * would quietly regrow the single-task stage at 100× (round-5
    * verdict finding 3). The count is one column-pruned aggregate
    * scan; the oracle mirrors the formula with a scalar subquery so
    * both engines derive identical strata at any scale. */
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

}
