package graft.operators

import graft.{Canon, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators over `documents` / `embeddings`
  * (SURVEY.md §2.4 E18–E21 plus the dedup / similarity-search / text-
  * analysis surface a 100 TB corpus pipeline needs).
  *
  * Scale posture, per operator family:
  *  - dedup: shuffle on a text hash — the shuffle key is the hash, so
  *    parallelism scales with corpus size, never with duplicate-family
  *    count;
  *  - near-dup: candidate generation is always a *bucketed* equi-join
  *    (shared shingle, MinHash band, LSH bucket) — never an all-pairs
  *    cross product;
  *  - similarity search: brute-force top-k is scan-parallel
  *    (TakeOrderedAndProject — no driver collect); the LSH variant shows
  *    the sub-linear path;
  *  - text analysis: plain shuffle-based aggregation.
  */
object LlmOps {
  import Canon._

  // ——————————————————————— shared text helpers ———————————————————————

  /** Whitespace-normalized text: the dedup identity (E18). */
  private def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  private def toks(c: Column): Column = split(c, " ")

  /** 3-token shingles ("n-gram" of n=3 words), distinct per document.
    * Guarded so <3-token docs yield an empty set, not a descending
    * `sequence` blowup. */
  private def shingles(t: Column): Column =
    when(size(t) >= 3,
      array_distinct(transform(sequence(lit(1), size(t) - 2),
        i => concat_ws(" ", slice(t, i, lit(3))))))
      .otherwise(array().cast("array<string>"))

  /** doc_id → exploded distinct shingle rows. */
  private def docShingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(shingles(toks(col("text")))).as("shingle"))

  /** Exact Jaccard over candidate pairs from a shared-shingle bucketed
    * self-join. Any pair with Jaccard > 0 shares ≥1 shingle, so this
    * candidate set has NO false negatives (unlike banded MinHash) while
    * still never forming a cross product: the join key is the shingle.
    * At 100 TB the long tail of ultra-frequent shingles would need a
    * document-frequency cap + banded MinHash (see [[minhashNearDup]]);
    * the exact form is the oracle-checkable contract. */
  private def jaccardPairs(s: SparkSession, d: String, threshold: Double): DataFrame = {
    val sh = docShingles(s, d)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "i").withColumnRenamed("n_sh", "n_i"), "i")
      .join(sizes.withColumnRenamed("doc_id", "j").withColumnRenamed("n_sh", "n_j"), "j")
      .withColumn("jac",
        col("n_common").cast("double") / (col("n_i") + col("n_j") - col("n_common")))
      .filter(col("jac") >= threshold)
  }

  // ————————————————————————— E18: exact dedup —————————————————————————

  /** E18 — exact deduplication of `documents` by normalized text.
    *
    * Grouping key is the normalized text itself (grouping equality is the
    * contract; Spark shuffles on its hash anyway, which is exactly the
    * "hash the text, shuffle on the hash" plan — at 100 TB you'd shuffle
    * `xxhash64(norm)` + verify text equality within the group to keep
    * shuffle rows narrow). Deterministic keep-rule: min doc_id per group,
    * so the oracle can reproduce the survivor set exactly. */
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
  def ngramJaccard(s: SparkSession, d: String): DataFrame =
    jaccardPairs(s, d, 0.8)
      .select(col("i"), col("j"), round4(col("jac")).as("jac"))
      .orderBy("i", "j")

  /** E19b — banded MinHash LSH near-dup: the 100 TB plan.
    *
    * 128 hash functions (`xxhash64(shingle, seed)`), banded 32×4: docs
    * agreeing on all 4 rows of any band become candidates
    * (P[miss | jac=0.8] = (1−0.8⁴)³²  ≈ 5e-8), then candidates are
    * verified with exact Jaccard — same output contract as
    * [[ngramJaccard]]. Candidate generation joins on (band, band
    * signature), so work scales with bucket occupancy, not n². No SQL
    * oracle (the signature is engine-specific); LlmOpsSpec asserts it
    * reproduces [[ngramJaccard]] exactly at test scale. */
  def minhashNearDup(s: SparkSession, d: String): DataFrame = {
    val nHashes = 128
    val rowsPerBand = 4
    val sh = docShingles(s, d)
    // (doc, seed) → min hash over the doc's shingles = the signature row.
    val sig = sh
      .select(col("doc_id"), col("shingle"),
        explode(sequence(lit(0), lit(nHashes - 1))).as("seed"))
      .groupBy("doc_id", "seed")
      .agg(min(xxhash64(col("shingle"), col("seed"))).as("mh"))
    // band id + a single hash of the band's rows = the LSH bucket key.
    val bands = sig
      .withColumn("band", (col("seed") / rowsPerBand).cast("int"))
      .groupBy("doc_id", "band")
      .agg(xxhash64(sort_array(collect_list(struct(col("seed"), col("mh"))))
        .cast("string")).as("band_sig"))
    val candidates = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_sig") === col("b.band_sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    // exact-verify candidates only.
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a")
      .join(candidates.hint("broadcast"), col("a.doc_id") === col("i"))
      .join(sh.as("b"), col("b.doc_id") === col("j") &&
        col("a.shingle") === col("b.shingle"))
      .groupBy("i", "j").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "i").withColumnRenamed("n_sh", "n_i"), "i")
      .join(sizes.withColumnRenamed("doc_id", "j").withColumnRenamed("n_sh", "n_j"), "j")
      .withColumn("jac",
        col("n_common").cast("double") / (col("n_i") + col("n_j") - col("n_common")))
      .filter(col("jac") >= 0.8)
      .select(col("i"), col("j"), round4(col("jac")).as("jac"))
      .orderBy("i", "j")
  }

  /** SimHash near-dup: 32-bit simhash from per-token md5, pairs within
    * Hamming distance ≤ 2 (the planted near-dup families sit at ≤ 2 on
    * this corpus; ≥ 3 admits thousands of tiny-vocabulary noise pairs).
    * md5 is identical across engines, and the
    * simhash is pure integer arithmetic → exact oracle. At scale, pair
    * generation would join on simhash bands (e.g. 4×8-bit chunks —
    * Hamming ≤ 3 guarantees one exact chunk match); n=500 here, so the
    * reference form is the readable self-join. */
  def simhashPairs(s: SparkSession, d: String): DataFrame = {
    val sims = simhash(s, d)
    sims.as("a").join(sims.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= 2)
      .orderBy("i", "j")
  }

  /** 32-bit SimHash per document: per token occurrence, h = first 8 hex
    * chars of md5(token); bit i of the simhash is 1 iff the (+1/−1) vote
    * sum over tokens of bit i is > 0. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    val tokenHash = Tables.documents(s, d)
      .select(col("doc_id"), explode(toks(col("text"))).as("word"))
      .select(col("doc_id"),
        conv(substring(md5(col("word")), 1, 8), 16, 10).cast("long").as("h"))
    tokenHash
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(31))).as("bit"))
      .groupBy("doc_id", "bit")
      // expr form: the DSL shiftright/shiftleft helpers only take Int
      // literals, but the bit position is a column here.
      .agg(sum(expr("CASE WHEN (shiftright(h, bit) & 1) = 1 THEN 1 ELSE -1 END"))
        .as("vote"))
      .groupBy("doc_id")
      .agg(sum(expr("CASE WHEN vote > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) ELSE CAST(0 AS BIGINT) END"))
        .as("simhash"))
      .orderBy("doc_id")
  }

  /** Document fingerprint: min md5 over the doc's 3-token shingles (the
    * MinHash idea with one cross-engine-stable hash function) — a
    * compact near-dup prefilter key. */
  def fingerprint(s: SparkSession, d: String): DataFrame =
    docShingles(s, d)
      .groupBy("doc_id")
      .agg(min(md5(col("shingle"))).as("fp"),
        count(lit(1)).as("n_shingles"))
      .orderBy("doc_id")

  // ——————————————— E20: vector similarity search ———————————————

  /** Cosine similarity of two ARRAY<DOUBLE> columns, computed with an
    * in-order fold (bit-identical to DuckDB's in-order list functions). */
  private def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** E20 — brute-force cosine top-k against a query vector (vec_id 0).
    *
    * The query vector is a 1-row broadcast; similarity is evaluated in
    * the scan (no shuffle of the vectors), and `orderBy.limit` plans
    * TakeOrderedAndProject — per-partition top-k, driver merges
    * k×partitions rows. That is the correct 100 TB baseline; the
    * sub-linear path is [[annLsh]]. */
  def cosineTopK(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d).select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val q = e.filter(col("vec_id") === 0).select(col("v").as("q"))
    e.crossJoin(broadcast(q))
      .select(col("vec_id"), round4(cosine(col("v"), col("q"))).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(20)
  }

  /** E20b — embedding near-dup: top-20 most-similar same-label pairs.
    * Label blocking is the IVF idea with given cluster ids: the join key
    * is the label, so candidate pairs scale with Σ cluster² not n². */
  def embedNearDup(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("i"), col("b.vec_id").as("j"),
        col("a.label").cast("long").as("label"),
        round4(cosine(col("a.v"), col("b.v"))).as("sim"))
      .orderBy(col("sim").desc, col("i").asc, col("j").asc)
      .limit(20)
  }

  /** E20c — random-hyperplane LSH ANN: the sub-linear scale path.
    *
    * 4 independent hash tables × 6 sign-bits each; hyperplane components
    * are derived from `xxhash64(table, plane, dim)` (deterministic — no
    * RNG state, reproducible across runs and executors). Candidates =
    * vectors sharing any table bucket with the query side; output = best
    * candidate neighbor per query (vec_id < 10 as the query set). No SQL
    * oracle (bucket recall is probabilistic by design); LlmOpsSpec
    * asserts every reported (i,j,sim) matches the brute-force cosine and
    * that candidates really share a bucket. */
  def annLsh(s: SparkSession, d: String): DataFrame = {
    val nTables = 4
    val nBits = 6
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
    // signature per (vector, table): pack sign bits of hyperplane dots.
    val planes = (0 until nTables).map { t =>
      val bits = (0 until nBits).map { p =>
        // component j of hyperplane (t,p): deterministic pseudo-random in [-1,1]
        val comp = (j: Column) =>
          (pmod(xxhash64(lit(t), lit(p), j), lit(1000001)).cast("double") / 500000.0) - 1.0
        val dot = aggregate(
          zip_with(col("v"), sequence(lit(0), lit(63)), (x, j) => x * comp(j)),
          lit(0.0), (acc, x) => acc + x)
        when(dot > 0, shiftleft(lit(1), p)).otherwise(0)
      }.reduce(_ + _)
      struct(lit(t).as("table"), bits.as("sig"))
    }
    val buckets = e.select(col("vec_id"), col("v"),
        explode(array(planes: _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("tb.table").as("t"), col("tb.sig").as("sig"))
    val queries = buckets.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("t"), col("sig"))
    val cand = queries.join(buckets, Seq("t", "sig"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round4(cosine(col("qv"), col("v"))).as("sim"))
      .distinct()
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("nid").asc)
    cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("qid"), col("nid"), col("sim"))
      .orderBy("qid")
  }

  // ————————————————— E21: text analysis / tf-idf —————————————————

  /** E21a — tf-idf: top-3 terms per document by tf × ln(N/df), ties
    * broken by word. All shuffle-based: tf is a (doc, word) aggregate,
    * df a word aggregate, N a scalar broadcast. */
  def tfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tokens = docs.select(col("doc_id"), explode(toks(col("text"))).as("word"))
    val tf = tokens.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = tokens.groupBy("word").agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("word").asc)
    tf.join(df, "word").crossJoin(broadcast(n))
      .withColumn("score",
        round4(col("tf") * log(col("n_docs").cast("double") / col("df"))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk").cast("long").as("rnk"), col("word"),
        col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rnk")
  }

  /** E21b — per-document text statistics / quality scoring: token
    * counts, lexical diversity, length agreement with the `n_chars`
    * metadata column, and a simple composite quality score. */
  def textStats(s: SparkSession, d: String): DataFrame = {
    val t = toks(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        size(t).cast("long").as("n_tokens"),
        size(array_distinct(t)).cast("long").as("n_distinct"),
        length(col("text")).cast("long").as("text_len"),
        (col("n_chars") === length(col("text"))).as("chars_match"),
        round4(size(array_distinct(t)).cast("double") / size(t)).as("distinct_ratio"),
        // avg token length: exact integer sums → identical double division
        round4((length(col("text")) - (size(t) - 1)).cast("double") / size(t))
          .as("avg_token_len"),
        round4(size(filter(t, w => length(w) >= 6)).cast("double") / size(t))
          .as("long_token_ratio"))
      .withColumn("quality_score",
        round4(log(lit(1.0) + col("n_tokens")) * col("distinct_ratio")))
      .orderBy("doc_id")
  }

  /** E21c — corpus profile per language: doc/token counts and the most
    * frequent word (deterministic tie-break by word). */
  def langProfile(s: SparkSession, d: String): DataFrame = {
    val tokens = Tables.documents(s, d)
      .select(col("lang"), col("doc_id"), explode(toks(col("text"))).as("word"))
    val perWord = tokens.groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("word").asc)
    val top = perWord.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("lang"), col("word").as("top_word"), col("cnt").as("top_word_cnt"))
    val stats = tokens.groupBy("lang")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_tokens"),
        countDistinct(col("word")).as("n_distinct_words"))
    stats.join(top, "lang")
      .withColumn("avg_tokens_per_doc",
        round4(col("n_tokens").cast("double") / col("n_docs")))
      .orderBy("lang")
  }

  /** E21d — language-ID: add-one-smoothed naive-Bayes over the corpus's
    * own per-language unigram profiles (the n-gram-heuristic classifier
    * with n=1 over words; the synthetic corpus shares one vocabulary
    * across languages, so accuracy is weak by construction — the
    * operator contract is the deterministic scoring pipeline).
    *
    * Float discipline: each token's ln P(w|L) is canonicalized to
    * DECIMAL(30,6) *before* the per-document sum, so the score is an
    * exact order-independent decimal sum — same trick as [[Canon.dsum]]
    * — and argmax ties break by language code. */
  def langId(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tokens = docs.select(col("doc_id"), col("lang"), explode(toks(col("text"))).as("word"))
    val langTotals = tokens.groupBy(col("lang").as("l"))
      .agg(count(lit(1)).as("total"))
    val vocab = tokens.select(col("word")).distinct()
    val vSize = vocab.select(count(lit(1)).as("v"))
    val counts = tokens.groupBy(col("lang").as("l"), col("word")).agg(count(lit(1)).as("cnt"))
    // dense lang × vocab grid so unseen words get the +1 smoothing mass.
    val grid = langTotals.crossJoin(vocab)
      .join(counts, Seq("l", "word"), "left_outer")
      .crossJoin(broadcast(vSize))
      .select(col("l"), col("word"),
        dec(log((coalesce(col("cnt"), lit(0L)) + 1).cast("double") /
          (col("total") + col("v")))).as("logp"))
    val scores = tokens
      .join(grid.hint("broadcast"), "word")
      .groupBy(col("doc_id"), col("lang"), col("l"))
      .agg(sum(col("logp")).cast("double").as("score"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("l").asc)
    scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("l").as("pred"),
        round4(col("score")).as("score"),
        (col("l") === col("lang")).as("correct"))
      .orderBy("doc_id")
  }
}
