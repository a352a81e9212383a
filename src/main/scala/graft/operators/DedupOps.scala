package graft.operators

import graft.{Canon, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The DEDUP DECISION family (E18 + keep rules): exact/paragraph/span
  * dedup, duplicate weighting, bloom admission, quality-aware keep-best,
  * source caps, tombstone purge, and the fuzzy entity-resolution joins.
  * Split out of the original LlmOps module (round 11). Scale posture:
  * keep rules are min-struct aggregates + join-back — never a window
  * partitioned by raw content. */
object DedupOps {
  import Canon._
  import LlmOps._
  import PairGraph._
  import EmbeddingOps._
  import QualityOps._
  import SamplingOps._


  def exactDedup(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(normText(col("text")).as("norm"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"),
        length(col("norm")).cast("long").as("norm_len"))
      .orderBy("keep_id")

  // ———————————————————— E19: near-dup (two plans) ————————————————————

  /** E19a — exact n-gram Jaccard near-duplicate pairs (threshold 0.8;
    * the corpus has a planted family of ~25 pairs ≥ 0.8 with the next
    * pair below 0.1, so the threshold is far from any boundary). */

  val SpanTokens = 32

  def spanDedup(s: SparkSession, d: String): DataFrame =
    spanDedupOver(Tables.documents(s, d))

  /** [[spanDedup]] over any (doc_id, text) frame — split out so specs can
    * plant a hot tile (one chunk content present in EVERY document) and
    * audit the plan/result at boilerplate-frequency skew. */

  private[graft] def spanDedupOver(docs: DataFrame): DataFrame = {
    val C = SpanTokens
    val t = docs.select(col("doc_id"), toks(col("text")).as("t"))
    val chunks = t
      .select(col("doc_id"),
        explode(when(size(col("t")) > 0,
          sequence(lit(0), floor((size(col("t")) - 1) / C).cast("int")))
          .otherwise(array().cast("array<int>"))).as("cid"), col("t"))
      .select(col("doc_id"), col("cid").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("t"), col("cid") * C + 1, lit(C))).as("chunk_text"))
    // global first occurrence per chunk content: lexicographic
    // (doc_id, chunk_id) min via struct ordering — partial-agg collapses
    // hot tiles map-side (a window could not).
    val firsts = chunks
      .groupBy(col("chunk_text"))
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("first"))
      .select(col("first.doc_id").as("doc_id"),
        col("first.chunk_id").as("chunk_id"), lit(true).as("is_first"))
    chunks
      .join(firsts, Seq("doc_id", "chunk_id"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("is_first"), 1L).otherwise(0L)).as("n_kept"),
        // ordered reassembly: kept (chunk_id, text) structs sorted by id
        array_join(transform(
          array_sort(collect_list(when(col("is_first"),
            struct(col("chunk_id"), col("chunk_text"))))),
          x => x.getField("chunk_text")), " ").as("cleaned"))
      .select(col("doc_id"), col("n_chunks"), col("n_kept"),
        length(col("cleaned")).cast("long").as("cleaned_len"),
        md5(col("cleaned")).as("cleaned_md5"))
      .orderBy("doc_id")
  }

  /** d57 — C4-style PARAGRAPH-grain dedup: split each document on
    * newline, keep a paragraph occurrence iff it is the corpus-wide
    * FIRST occurrence of its trimmed content (by (doc_id, position) —
    * C4's "remove any line seen before" rule, the variable-length
    * content-boundary complement to d42's fixed 32-token tiles), and
    * reassemble each document from its kept paragraphs in order. The
    * fixture corpus is single-line, so the registry entry inserts a
    * deterministic boundary every 8 tokens ([[Paragraphize]]) — a
    * corpus with real newlines skips that projection and nothing else
    * changes.
    *
    * Scale: the keep rule is the d42/d51 partial-agg pattern — ONE
    * `groupBy(paragraph)` min-struct aggregate (map-side combining, so
    * a boilerplate paragraph repeated 10⁶× reduces before the shuffle)
    * plus a join-back, never a window partitioned by content (AQE
    * splits the join-back's hot buckets). Reassembly is per-DOCUMENT
    * state only (sorted collect_list of a doc's own kept paragraphs —
    * document-sized, like d42); output carries length + md5 of the
    * reassembled text, not the text itself. At 100 TB the groupBy key
    * becomes xxhash64(paragraph) + in-group equality verify to keep
    * shuffle rows narrow (the d01 note). */

  private[graft] def Paragraphize(c: Column): Column =
    regexp_replace(c, "((?:\\S+ ){8})", "$1\n")

  def paragraphDedup(s: SparkSession, d: String): DataFrame =
    paragraphDedupOver(Tables.documents(s, d)
      .select(col("doc_id"), Paragraphize(col("text")).as("text")))

  /** [[paragraphDedup]] over an explicit (doc_id, text-with-newlines)
    * frame — package-visible for the planted reassembly spec. */

  private[graft] def paragraphDedupOver(docs: DataFrame): DataFrame = {
    val paras = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\n")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        // NFC at paragraph grain too (the d01 identity rationale); no
        // lower/collapse here — paragraph dedup is deliberately
        // stricter than document dedup (casing differences are real
        // content at this grain)
        trim(call_function(graft.functions.NfcNormalize.Name, col("col")))
          .as("norm"))
      .filter(length(col("norm")) > 0) // blank lines separate, never match
    val first = paras.groupBy("norm")
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
    val kept = paras.join(first, "norm")
      .filter(col("doc_id") === col("f.doc_id") && col("pos") === col("f.pos"))
    val keptAgg = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("norm")))),
          x => x.getField("norm")), "\n").as("kept_text"))
    val totals = paras.groupBy("doc_id").agg(count(lit(1)).as("n_paras"))
    docs.select("doc_id")
      .join(totals, Seq("doc_id"), "left")
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_paras"), lit(0L)).as("n_paras"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        length(coalesce(col("kept_text"), lit(""))).cast("long").as("kept_len"),
        md5(coalesce(col("kept_text"), lit(""))).as("kept_md5"))
      .orderBy("doc_id")
  }

  /** d43 — per-source document cap (the "domain cap" every crawl-derived
    * corpus applies so one host cannot dominate the training mix): rank
    * documents within each source by the d08 composite quality score
    * (desc, doc_id tie-break) and keep the top [[SourceCapK]]. Output
    * carries rank and the kept flag so the drop set doubles as the
    * audit log. One shuffle keyed by source; a 100 TB corpus with
    * mega-hosts first prunes with a per-source approximate quality
    * threshold (KLL sketch) so the exact rank window only sees the
    * near-cap band — the window itself is unchanged. */

  val SourceCapK = 15

  def sourceCap(s: SparkSession, d: String): DataFrame = {
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        qualityScore(toks(col("text"))).as("quality_score"))
    val w = Window.partitionBy("source")
      .orderBy(col("quality_score").desc, col("doc_id"))
    scored
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("kept", col("rnk") <= SourceCapK)
      .orderBy("doc_id")
  }

  /** d45 — EDIT-DISTANCE verification of near-dup candidate pairs: the
    * character-level second opinion on the shingle-level d02 relation
    * (pipelines that act destructively on dedup output often gate on
    * edit similarity, which token shingles approximate but don't
    * guarantee — transpositions and in-token edits read differently at
    * the two granularities). Levenshtein is O(|a|·|b|) PER PAIR, so it
    * can never run on candidates at scale — here it runs on the
    * OUTPUT-sized verified pair set (the d02 relation), each side's
    * normalized text fetched by a keyed semi-join-shaped lookup. The
    * distance is integer DP (identical in any engine) and `edit_sim` is
    * one IEEE division of engine-identical integers — bit-exact, no
    * rounding. */

  private[graft] def fuzzyJoinOver(left: DataFrame, right: DataFrame): DataFrame = {
    // s plus its |s| delete-1 variants, deduped (adjacent equal chars
    // make duplicate deletions); the when() guards the empty key, whose
    // descending sequence(1, 0) would otherwise emit phantom variants
    def variants(c: Column): Column =
      when(c.isNotNull, // null key → null array → explode drops the row
        array_distinct(concat(array(c),
          when(length(c) > 0,
            transform(sequence(lit(1), length(c)), p =>
              concat(c.substr(lit(1), p - lit(1)),
                c.substr(p + lit(1), length(c)))))
            .otherwise(array()))))
    val lv = left.select(col("id").as("l_id"), col("key").as("l_key"),
      explode(variants(col("key"))).as("v"))
    val rv = right.select(col("id").as("r_id"), col("key").as("r_key"),
      explode(variants(col("key"))).as("v"))
    lv.join(rv, "v")
      .select("l_id", "l_key", "r_id", "r_key").distinct()
      .withColumn("lev", levenshtein(col("l_key"), col("r_key")).cast("long"))
      .filter(col("lev") <= 1)
      .orderBy("l_id", "r_id")
  }

  /** The d58 registry instance — the typical entity-resolution shape:
    * an incoming batch (custkey ≡ 3 mod 7, ~14% of rows) matched
    * against the full `customer` master, each batch name
    * deterministically perturbed (digit at position 10 + custkey % 9
    * bumped +1 mod 10 — one substitution, so every batch row has its
    * planted master partner at distance 1; incidental distance-≤1
    * cross-matches between neighboring zero-padded keys are part of
    * the contract and the oracle computes them identically). The
    * oracle is the UNBLOCKED form — a full cross join + levenshtein
    * filter — so the hash match also proves the delete-1 blocking
    * lost nothing. */

  def fuzzyJoin(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val left = cust.select(col("c_custkey").as("id"), col("c_name").as("key"))
    val right = cust
      .filter(pmod(col("c_custkey"), lit(7L)) === 3)
      .withColumn("p", (pmod(col("c_custkey"), lit(9L)) + 10).cast("int"))
      .select(col("c_custkey").as("id"),
        expr("""concat(substr(c_name, 1, p - 1),
                 cast((cast(substr(c_name, p, 1) as int) + 1) % 10 as string),
                 substr(c_name, p + 1))""").as("key"))
    fuzzyJoinOver(left, right)
  }

  /** d58b — the distance-2 tier of [[fuzzyJoinOver]]: SymSpell blocking
    * with the RECURSIVE delete set. Every key emits itself, its |s|
    * delete-1 variants, and its C(|s|,2) delete-2 variants (delete-1 of
    * each delete-1, deduped), and two keys within Levenshtein distance
    * ≤ 2 PROVABLY share a variant: take an optimal alignment with
    * i insertions, e deletions, u substitutions (i+e+u ≤ 2); deleting
    * from each side every character that is inserted, deleted, or
    * substituted in that alignment leaves the SAME subsequence on both
    * sides, reached with ≤ i+u ≤ 2 deletions from one string and
    * ≤ e+u ≤ 2 from the other — so the candidate equi-join on the
    * variant string has EXACT recall at d ≤ 2 (the spec mirrors an
    * unblocked all-pairs lev ≤ 2 and asserts equality). Precision is
    * one exact `levenshtein` pass over candidates, as in d58.
    *
    * Scale: fanout is 1 + |s| + C(|s|,2) variants per key (≈ |s|²/2 —
    * 172 for the 18-char fixture names; the documented SymSpell
    * tradeoff: candidate work grows quadratically in key length and
    * the distance bound, which is why this operator FIXES d = 2 and
    * long keys should block on length-bucketed prefixes instead).
    * Bucket occupancy grows correspondingly — dense key spaces
    * (sequential zero-padded ids) put many keys two deletes apart, so
    * the verify stage is sized by the TRUE near-match density, which is
    * exactly what the operator reports. The registry instance therefore
    * AGGREGATES per batch key (match counts by distance + deterministic
    * best master) — the entity-resolution decision row — keeping output
    * row count = batch size regardless of density. */

  private[graft] def fuzzyJoin2Over(left: DataFrame, right: DataFrame): DataFrame = {
    def del1(c: Column): Column =
      when(length(c) > 0,
        transform(sequence(lit(1), length(c)), p =>
          concat(c.substr(lit(1), p - lit(1)),
            c.substr(p + lit(1), length(c)))))
        .otherwise(array())
    def variants2(c: Column): Column =
      when(c.isNotNull, // null key → null array → explode drops the row
        array_distinct(concat(array(c), del1(c),
          flatten(transform(del1(c), v => del1(v))))))
    val lv = left.select(col("id").as("l_id"), col("key").as("l_key"),
      explode(variants2(col("key"))).as("v"))
    val rv = right.select(col("id").as("r_id"), col("key").as("r_key"),
      explode(variants2(col("key"))).as("v"))
    lv.join(rv, "v")
      .select("l_id", "l_key", "r_id", "r_key").distinct()
      .withColumn("lev", levenshtein(col("l_key"), col("r_key")).cast("long"))
      .filter(col("lev") <= 2)
  }

  /** The d58b registry instance: a batch (custkey ≡ 3 mod 101) with TWO
    * planted substitutions (digits at p and p+1 each bumped +1 mod 10,
    * p = 10 + custkey mod 8) matched against the full `customer`
    * master at distance ≤ 2, aggregated per batch key: matches by
    * distance tier plus the deterministic best master (min (lev, id) —
    * encoded as one integer min so the DuckDB mirror needs no
    * tie-unspecified arg_min). Dense zero-padded ids mean real
    * incidental distance-2 neighbors exist; the unblocked oracle
    * computes the identical set, so the hash match proves the
    * recursive delete blocking lost nothing. */

  def fuzzyJoin2(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val left = cust.select(col("c_custkey").as("id"), col("c_name").as("key"))
    val right = cust
      .filter(pmod(col("c_custkey"), lit(101L)) === 3)
      .withColumn("p", (pmod(col("c_custkey"), lit(8L)) + 10).cast("int"))
      .select(col("c_custkey").as("id"),
        expr("""concat(substr(c_name, 1, p - 1),
                 cast((cast(substr(c_name, p, 1) as int) + 1) % 10 as string),
                 cast((cast(substr(c_name, p + 1, 1) as int) + 1) % 10 as string),
                 substr(c_name, p + 2))""").as("key"))
    fuzzyJoin2Over(left, right)
      .groupBy(col("r_id"), col("r_key"))
      .agg(count(lit(1)).as("n_matches"),
        sum((col("lev") === 0).cast("long")).as("n_d0"),
        sum((col("lev") === 1).cast("long")).as("n_d1"),
        sum((col("lev") === 2).cast("long")).as("n_d2"),
        min(col("lev")).as("min_lev"),
        (min(col("lev") * lit(10000000000L) + col("l_id")) % 10000000000L)
          .as("best_master"))
      .orderBy("r_id")
  }

  /** d44 — hashed-feature LINEAR quality classifier (the fastText-style
    * model-based quality filter — the stage that scores each document
    * with a trained linear model over hashed bag-of-words features and
    * keeps the high scorers). Tokens hash into 64 feature buckets (the
    * d34 md5-bucket idiom); the logit is Σ c_b·w_b / (100·n) with c_b
    * the doc's bucket counts. The weight VECTOR here is a deterministic
    * closed form over the bucket id, w_b = ((37·b + 11) mod 101 − 50)
    * (a stand-in the oracle recomputes — a real deployment broadcasts
    * its trained vector; the plan is identical). Weight numerators are
    * INTEGERS, so the per-doc sum is exact in any engine and the logit
    * is ONE IEEE division of engine-identical integers — bit-exact, no
    * rounding (Canon.round4 note). `keep` thresholds the logit at 0
    * (the sigmoid is monotone in the logit, so scoring and gating need
    * no exp/division chain). ONE shuffle keyed by doc_id; at 100 TB the
    * hash-and-weight projection is scan-parallel map work. */

  def clusterKeepBest(s: SparkSession, d: String): DataFrame = {
    val clusters = neardupClusters(s, d)
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    val quality = Tables.documents(s, d)
      .select(col("doc_id"), qualityScore(toks(col("text"))).as("quality_score"))
    val joined = clusters.join(quality, "doc_id")
    val best = joined.groupBy("cluster_id")
      .agg(max_by(col("doc_id"),
        struct(col("quality_score"), (-col("doc_id")).as("neg_id"))).as("keep_id"))
    joined.join(best, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        col("quality_score"), col("keep_id"),
        (col("doc_id") === col("keep_id")).as("kept"))
      .orderBy("doc_id")
  }

  /** d54 — FILTER-agreement audit (learned vs rule-based): the 2×2
    * confusion table between the d44 linear classifier's keep and the
    * d52 ensemble's keep, plus each cell's share — the governance check
    * a pipeline runs BEFORE swapping a rule-based filter for a learned
    * one (the disagreement cells are exactly the documents to audit;
    * a swap that silently flips 30% of verdicts is a dataset change,
    * not a refactor). Both scorers are the registered operators reused
    * verbatim — one definition each, no drift.
    *
    * Plan: two scan-parallel scoring subtrees join co-keyed on doc_id,
    * then a 4-group aggregate; the share denominator is a one-row
    * broadcast. All counts integer; `share` is ONE IEEE division. */

  def tombstonePurge(s: SparkSession, d: String, everyNth: Long = 17): DataFrame = {
    def stat(name: String, df: DataFrame, tomb: Column): DataFrame =
      df.agg(lit(name).as("store"), count(lit(1)).as("n_before"),
        coalesce(sum(tomb.cast("long")), lit(0L)).as("n_purged"),
        (count(lit(1)) - coalesce(sum(tomb.cast("long")), lit(0L))).as("n_after"))
    val docTomb = pmod(col("doc_id"), lit(everyNth)) === 0
    val vecTomb = pmod(col("vec_id"), lit(everyNth)) === 0
    // the fingerprint store has one row per document with ≥3 tokens (it
    // needs a shingle) — count THAT predicate off the documents scan
    // instead of running the full fingerprint derivation (its corpus
    // groupBy shuffle buys nothing when only row counts are needed);
    // LlmOpsSpec pins the equivalence against the real store
    val fpRows = Tables.documents(s, d)
      .filter(size(toks(col("text"))) >= 3).select("doc_id")
    stat("documents", Tables.documents(s, d), docTomb)
      .unionAll(stat("embeddings", Tables.embeddings(s, d), vecTomb))
      .unionAll(stat("fingerprints", fpRows, docTomb))
      .orderBy("store")
  }

  /** The compaction itself: the keep-side of the purge for a doc-keyed
    * store — one filter when the predicate is computable per row. */

  private[graft] def purgeDocStore(df: DataFrame, everyNth: Long): DataFrame =
    df.filter(pmod(col("doc_id"), lit(everyNth)) =!= 0)

  /** d35 — SemDeDup (Abbas et al., 2023) shaped semantic dedup: bucket
    * the embedding space, compare pairs only WITHIN a bucket, and drop
    * every vector that has ANY more-senior (smaller-id) neighbor above
    * the similarity threshold — the seniority-dominance rule. Output:
    * one row per dropped vector with its most senior over-threshold
    * neighbor and their (rounded) cosine.
    *
    * Contract, precisely: the KEPT set is `vec_ids ∖ output` — exactly
    * the vectors with no senior τ-neighbor in their bucket. `kept_id`
    * is blame, not membership: in a chain a<b<c with sim(a,b)≥τ,
    * sim(b,c)≥τ, sim(a,c)<τ, both b and c are dropped and c blames b
    * (itself dropped; following blame pointers reaches the kept root).
    * The sequential greedy keep-first scan (which would keep c) is
    * order-dependent and inherently serial; the dominance rule is the
    * one-pass distributed analog and dedups strictly more aggressively
    * — the right direction for a dedup gate. LlmOpsSpec's recompute
    * pins exactly this rule.
    *
    * Buckets here are `nBits` sign bits of deterministic hyperplane dots
    * ([[planeComp]], its own table id so the planes are independent of
    * [[annLsh]]'s) — the paper's k-means cells swap in transparently
    * (see [[ivfAnn]]'s assignment stage) but hyperplane signs are
    * reproducible in the SQL oracle, which inlines the same plane
    * literals. The fixtures' embeddings are isotropic (no planted
    * high-sim families — measured max pairwise cosine ≈ 0.51), so the
    * registered binding demonstrates the pipeline at τ = 0.40; real
    * embedding corpora bind τ ≈ 0.95+. LlmOpsSpec exercises true
    * near-identical planted vectors through [[semdedupOver]].
    *
    * Scale: the pair join is a bucketed equi-join on the signature —
    * never all-pairs (candidate volume ~ n²/2^nBits per the random-
    * hyperplane collision bound, and a skewed bucket is split by AQE);
    * the dominance rule is one row_number window per dropped doc. Like any
    * single-table LSH it trades recall (a cross-bucket pair is missed)
    * for the sub-linear plan; multi-table OR-ing ([[annLsh]]'s nTables)
    * is the standard recall knob. */

  def dupWeights(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), normText(col("text")).as("norm"))
    val fam = docs.groupBy("norm").agg(count(lit(1)).as("n_copies"))
    docs.join(fam, "norm")
      .select(col("doc_id"), col("n_copies"),
        (lit(1.0) / col("n_copies")).as("weight"))
      .orderBy("doc_id")
  }

  /** d39 — bloom-gated cross-corpus membership (incremental-ingest
    * exact dedup against history WITHOUT joining history).
    *
    * The d30 admission gate joins the new batch against the ingested
    * corpus — correct, but the join touches the history side every run.
    * At 100 TB of history the standing pattern is: keep a FIXED-SIZE
    * bloom filter of history's text hashes (built once, stored,
    * OR-merged incrementally like every sketch in [[Profiling]]), and
    * gate each day's batch at SCAN TIME:
    *
    *   1. `graft_bloom_agg(h)` — Spark's own `BloomFilterAggregate`
    *      ([[graft.functions.BloomFunctions]]) builds the filter with
    *      partial/final merge; here it is built in-query from the
    *      history split (demo stands in for "loaded from yesterday");
    *   2. `graft_might_contain(scalar-subquery, h)` — a codegen'd
    *      predicate INSIDE the batch scan's whole-stage span: `false`
    *      is definitive (bloom filters have no false negatives), so
    *      non-members never reach a shuffle;
    *   3. the ~1% false positives (plus true members) are the only rows
    *      that pay the exact verify semi-join against history — at
    *      scale, survivor-volume ≈ true-dup volume, not batch volume.
    *
    * Output is EXACT (the verify join closes the bloom's false
    * positives), so the DuckDB oracle is plain `EXISTS` on the
    * normalized text. Membership is by `xxhash64(norm)` — the d01
    * 64-bit-hash identity note applies. Batch/history split mirrors
    * d30 (`doc_id mod 10 >= 8` is "today's batch").
    */

  def bloomGate(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    s.sql(raw"""
      |WITH doc AS (
      |  SELECT doc_id,
      |    xxhash64(lower(trim(regexp_replace(text, '\\s+', ' ')))) AS h
      |  FROM documents),
      |hist AS (SELECT h FROM doc WHERE pmod(doc_id, 10) < 8),
      |batch AS (SELECT doc_id, h FROM doc WHERE pmod(doc_id, 10) >= 8),
      |cand AS (
      |  SELECT doc_id, h FROM batch
      |  WHERE graft_might_contain(
      |    (SELECT graft_bloom_agg(h, CAST(1000000 AS BIGINT)) FROM hist), h)),
      |ver AS (SELECT DISTINCT c.doc_id FROM cand c
      |        WHERE EXISTS (SELECT 1 FROM hist WHERE hist.h = c.h))
      |SELECT b.doc_id, (v.doc_id IS NOT NULL) AS dup_of_history
      |FROM batch b LEFT JOIN ver v ON b.doc_id = v.doc_id
      |ORDER BY doc_id""".stripMargin)
  }
}
