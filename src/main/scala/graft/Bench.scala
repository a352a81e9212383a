package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.DataFrame

/** Benchmark harness — emits ONE JSON line per the driver contract and
  * (belt and braces) writes the same line to a file.
  *
  * Methodology pinned by BASELINE.md: warm JVM (one discarded warmup pass
  * over every query), then median of 3 measured runs per query. Each run
  * drives the full plan through the `noop` sink — unlike `.count()`, the
  * noop write cannot let Catalyst delete final sorts (`EliminateSorts`) or
  * prune the projections under test, so the measured time includes every
  * expression and exchange the query declares. Failures are recorded as
  * failures (a `failed` list + no timing), never as fast runs.
  *
  * Cache discipline: several operators `.cache()` reused subplans
  * (signatures, shingle tables); the CacheManager matches rebuilt plans by
  * canonical form, so without intervention runs 2..n would time cache READS
  * rather than the declared plan. Every measured run therefore starts from
  * a cleared cache — timings are cold-plan costs (JIT/codegen warm, data in
  * page cache), and cached tables can't accumulate across ~100 queries.
  *
  * Robustness contract (round 6 — the round-5 driver artifact was a
  * timeout kill with NO output, rc=124/parsed:null):
  *   - A JVM shutdown hook emits the best-available partial result line
  *     (marked `"truncated":true`) when the process is killed mid-run —
  *     `timeout(1)` sends SIGTERM, which runs shutdown hooks.
  *   - `SPARK_GRAFT_BENCH_DEADLINE_S` (default 1200) is a wall-clock
  *     budget for the measurement loop: measured passes run only while
  *     the next full pass is projected to fit, degrading median-of-3 →
  *     median-of-fewer → (worst case) the warmup pass itself. The JSON
  *     carries `"passes":n` so a degraded artifact is self-describing.
  *   - `SPARK_GRAFT_BENCH_QUERY_TIMEOUT_S` (default 150) bounds any ONE
  *     query via `cancelJobGroup` from a watchdog timer — a single
  *     stalling query (the round-5 tail showed a 16-minute silent
  *     stretch) becomes a recorded `"failed"` entry, not a dead artifact.
  *   - Per-query progress lines go to STDERR (the driver tail captures
  *     the merged stream), so a future stall names its query instead of
  *     requiring archaeology on BlockManager warnings.
  */
object Bench {
  /** The fixed warmup subset — one pass over these settles what the
    * warmup is FOR (JIT, whole-stage-codegen class cache, parquet
    * footer/page cache, subsystem init) at ~3% of a full pass's cost.
    * Coverage, by machinery: every base table's reader (lineitem,
    * orders, customer+nation+region, part+supplier via e19/e02, events,
    * documents, embeddings, the corpus files), joins (broadcast, as-of),
    * window exec, pivot, JSON paths, native expressions (NFC, cosine),
    * decimal aggregates (k-means), WAP store publish, file sources,
    * multimodal binary, profiling, the Structured Streaming engine
    * (stateless + stateful), typed mapPartitions, and the reference
    * word-count path. ContractSpec pins membership in the registry. */
  private[graft] val WarmupKeys: Seq[String] = Seq(
    "e01_scan_filter", "e02_broadcast_join", "e12_rank_window",
    "e14_topk_orders", "e15b_pivot", "e18_json_events", "e19_region_supplier",
    "e20_asof_join", "d01_exact_dedup", "d04_cosine_topk", "d59_kmeans",
    "d31_bm25", "d65_bpe_merges", "d30b_store_incremental",
    "f02_json_roundtrip", "f07_binary_source", "m01_binary_meta",
    "p03_histogram", "s01_tumbling_window", "s11_running_totals",
    "t04_secondary_sort", "q_wordcount")

  // ——— state shared with the shutdown hook ———————————————————————————
  // The hook runs on its own thread, possibly while the main loop is
  // mid-query; every mutation and the emit snapshot synchronize on `lock`.
  private val lock = new Object
  private var warmup = Map.empty[String, Double]          // discarded-pass timings (fallback)
  private var passes = Vector.empty[Map[String, Double]]  // completed measured (shard-)passes
  private var current = Map.empty[String, Double]         // in-flight measured pass
  private var attempted = Set.empty[String]               // every query we started
  private var shardsG = 1                                 // shard count (env)
  private var shardPasses = Map.empty[Int, Int]           // shard idx → completed passes
  private var shardOrderG = Seq.empty[Int]                // shard RUN order this run
  private var sfDirG = ""
  private var outFileG: Option[String] = None
  private val emitted = new AtomicBoolean(false)

  def main(args: Array[String]): Unit = {
    val startNs = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - startNs) / 1e9
    def note(msg: String): Unit = System.err.println(f"[bench +${elapsed}%7.1fs] $msg")

    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lock.synchronized {
      sfDirG = sfDir
      outFileG = args.headOption.orElse(sys.env.get("SPARK_GRAFT_BENCH_OUT"))
    }
    // Register the safety net BEFORE the (multi-second) Spark session
    // init — a kill landing during startup still yields an empty-but-
    // parseable artifact instead of silence.
    Runtime.getRuntime.addShutdownHook(new Thread(() => emit(truncated = true), "bench-emit"))
    val deadlineS = sys.env.get("SPARK_GRAFT_BENCH_DEADLINE_S").map(_.toDouble).getOrElse(1200.0)
    val queryTimeoutS = sys.env.get("SPARK_GRAFT_BENCH_QUERY_TIMEOUT_S").map(_.toDouble).getOrElse(150.0)
    def remaining: Double = deadlineS - elapsed

    val spark = SparkEnv.session("graft-bench")
    val sc = spark.sparkContext

    // Deterministic iteration order; Map ordering is arbitrary.
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)

    // fail fast on short-key collisions — BEFORE the ~9-minute
    // warmup+measure loop, not after it
    require(queries.map(q => shortKey(q._1)).distinct.size == queries.size,
      "short bench keys collide; fix Bench.shortKey")

    /** One cold-plan measurement under a cancellable job group: the
      * watchdog timer cancels every job the query started once
      * `timeoutS` elapses, turning a stall into a Left("Timeout"). */
    def timeOne(name: String, fn: (org.apache.spark.sql.SparkSession, String) => DataFrame,
        timeoutS: Double): Either[String, Double] = {
      spark.sharedState.cacheManager.clearCache()
      val group = s"bench:$name"
      sc.setJobGroup(group, name, interruptOnCancel = true)
      val timedOut = new AtomicBoolean(false)
      val watchdog = new java.util.Timer("bench-watchdog", true)
      watchdog.schedule(new java.util.TimerTask {
        def run(): Unit = { timedOut.set(true); sc.cancelJobGroup(group) }
      }, math.max(1L, (timeoutS * 1000).toLong))
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable => Left(if (timedOut.get) "Timeout" else e.getClass.getSimpleName)
      } finally { watchdog.cancel(); sc.clearJobGroup() }
    }

    /** Runs one pass over `qs`; returns false if the deadline cut it
      * short. `record` receives (name, result) under the state lock. */
    def runPass(label: String, qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)],
        record: (String, Either[String, Double]) => Unit): Boolean = {
      for ((name, fn) <- qs) {
        if (remaining < 10) { note(s"$label deadline hit before $name — stopping"); return false }
        note(s"$label $name")
        val r = timeOne(name, fn, math.min(queryTimeoutS, remaining - 5))
        lock.synchronized { attempted += name; record(name, r) }
        r.left.foreach(err => note(s"$label $name FAILED: $err"))
      }
      true
    }

    note(s"bench start sf=$sfDir deadline=${deadlineS}s queryTimeout=${queryTimeoutS}s " +
      s"queries=${queries.size}")

    // Warmup: the fixed REPRESENTATIVE subset, not a full pass. The
    // warmup exists to settle JIT, codegen caches, and FS/parquet
    // metadata — machinery, not per-query numbers — and at 213 queries
    // a full discarded pass (~1/4 of the deadline on a quiet box, more
    // under contention) was what pushed round 14's driver artifact past
    // 1200 s and degraded it to 2 measured passes. WarmupKeys touches
    // every table reader and every heavyweight subsystem (streaming
    // engine, WAP publish, sketches, native expressions) in ~3% of a
    // full pass. Warmup timings remain the emergency fallback for their
    // own keys; a query with no measured sample and no warmup sample
    // reports as failed (it failed every measured pass to get there).
    val warmupQs = queries.filter(q => WarmupKeys.contains(q._1))
    require(warmupQs.size == WarmupKeys.size,
      s"WarmupKeys drifted from the registry: missing ${
        WarmupKeys.diff(warmupQs.map(_._1))}")
    var clean = runPass("warmup", warmupQs,
      (n, r) => r.foreach(t => warmup += n -> t))
    note(f"warmup done (${warmupQs.size} queries, remaining ${remaining}%.1fs)")

    // Measured passes, SHARD-MAJOR (round 16): the suite splits into
    // deadline-fitting shards (round-robin over the sorted registry)
    // and each shard runs its median-of-3 TO COMPLETION before the
    // next shard starts. Under a deadline cut this yields 3 samples
    // for every query the cut shard boundary reached — a driver-grade
    // record for the completed shards — where the old pass-major order
    // left EVERY query at 1 sample (the round-14/15 degraded
    // artifacts). Within a shard: pass 1 always starts (runPass's
    // per-query deadline guard bounds the damage and a partial pass
    // still contributes via `current`); passes 2..3 start only while
    // the shard's LAST completed pass projects to fit with 1.15×
    // headroom. Inter-pass drift stays readable: passTotals carries
    // one (total, count) entry per completed shard-pass in run order,
    // and the full record names the per-shard pass counts.
    // default 3 shards (round 17): at ~394 s/suite-pass on a quiet box
    // and ~40% driver-box contention, 2 shards × (3 passes) cannot fit
    // the 1200 s deadline — round 16 left shard 0 with ZERO driver
    // passes. 3 shards ≈ 130 s/shard-pass cold: each shard's
    // median-of-3 completes inside its slice of the deadline, so a cut
    // costs one shard's evidence, not half the registry's.
    val nShards = math.max(1,
      sys.env.get("SPARK_GRAFT_BENCH_SHARDS").map(_.toInt).getOrElse(3))
    lock.synchronized { shardsG = nShards }
    // Rotate which shard runs FIRST by day: under a recurring deadline
    // cut the first shard is the one that finishes driver-grade, and a
    // FIXED order would starve the same half of the registry of
    // 3-sample evidence round after round. Day-of-epoch keeps the
    // order deterministic within a day (re-runs comparable) while
    // rotating across rounds; SPARK_GRAFT_BENCH_ROTATION overrides for
    // reproducible reruns (a midnight-straddling pair of runs measures
    // different halves driver-grade otherwise), and the chosen order
    // is committed in the full record (`shardOrder`) so the artifact
    // alone says which shards ran first. Shard IDENTITY (membership,
    // shardPasses indexing) is unchanged — only run order moves.
    // floorMod: a stray negative override (or a pre-epoch clock) must
    // rotate, not index shardNames(-1) and kill the run before any
    // query executes
    val rot = java.lang.Math.floorMod(
      sys.env.get("SPARK_GRAFT_BENCH_ROTATION").map(_.toLong)
        .getOrElse(System.currentTimeMillis / 86400000L),
      nShards.toLong).toInt
    val shardNames = shardAssignment(queries.map(_._1), nShards)
    val order = (0 until nShards).map(i => (i + rot) % nShards)
    lock.synchronized { shardOrderG = order }
    note(s"shards=$nShards order=${order.mkString(",")}")
    val byName = queries.toMap
    for (si <- order if clean; names = shardNames(si)) {
      val shardQs = names.map(n => n -> byName(n))
      var p = 0
      var lastPassCost = Double.NaN
      while (clean && p < 3 &&
          (p == 0 || remaining > lastPassCost * 1.15 + 10)) {
        p += 1
        clean = runPass(s"shard$si-pass$p", shardQs,
          (n, r) => r.foreach(t => current += n -> t))
        lock.synchronized {
          // a deadline-cut partial pass stays in `current` so emit()
          // can still use its samples; only a completed pass graduates
          if (clean) {
            lastPassCost = current.values.sum + shardQs.size * 0.05
            passes :+= current; current = Map.empty
            shardPasses += si -> (shardPasses.getOrElse(si, 0) + 1)
          }
        }
        // Nudge the ContextCleaner: cache/shuffle state from ~100
        // queries is only reclaimed after its references are GC'd; an
        // explicit GC per pass keeps disk/memory state flat.
        System.gc()
      }
    }
    val eff = lock.synchronized { effectivePasses(shardPasses, nShards) }
    if (eff < 3) note(s"degraded to $eff effective pass(es) (deadline ${deadlineS}s)")

    emit(truncated = !clean)
    spark.stop()
  }

  /** Builds and emits the artifact from whatever state exists: per-query
    * median over completed measured passes (+ the in-flight partial pass),
    * falling back to the warmup timing for queries with no measured
    * sample. Idempotent — first caller (main path or shutdown hook) wins. */
  private def emit(truncated: Boolean): Unit = {
    val (w, ps, cur, att, sfDir, outFile, nShards, shp, shOrder) = lock.synchronized {
      (warmup, passes, current, attempted, sfDirG, outFileG, shardsG,
        shardPasses, shardOrderG)
    }
    if (!emitted.compareAndSet(false, true)) return
    val eff = effectivePasses(shp, nShards)
    val measured = ps :+ cur
    val names = (w.keys ++ measured.flatMap(_.keys)).toSeq.distinct.sorted
    val timings = names.flatMap { n =>
      val ok = measured.flatMap(_.get(n)).sorted
      (if (ok.nonEmpty) Some(ok(ok.size / 2)) else w.get(n)).map(n -> _)
    }
    val timed = timings.map(_._1).toSet
    val failed = att.toSeq.sorted.filterNot(timed)

    val total = timings.map(_._2).sum
    // Graduated stdout precision (full precision still lands in
    // BENCH_FULL.json): fine grain = 10 ms below 10 s (budgets are
    // 0.05-stepped, so nothing the gate reads needs more), 0.1 s in
    // [10, 100), integers above. If the assembled FINE line would
    // outgrow the driver's tail capture (the query count keeps rising),
    // the emitter degrades to COARSE values (0.1 s below 10, integers
    // above — worst case 3 chars), trading grain for a line that
    // arrives whole: a truncated line parses as null and loses
    // EVERYTHING. ContractSpec certifies the coarse worst case against
    // the real registry.
    def fmtAt(v: Double, fine: Boolean): String =
      java.math.BigDecimal.valueOf(v)
        .setScale(
          if (v >= 100) 0
          else if (v >= 10) { if (fine) 1 else 0 }
          else { if (fine) 2 else 1 },
          java.math.RoundingMode.HALF_UP)
        .stripTrailingZeros.toPlainString
    def fmt(v: Double): String = fmtAt(v, fine = true)
    val extra = healthFlags(eff, truncated)

    // Full-fidelity record (full query names, full precision) → file;
    // the stdout line uses SHORT keys everywhere (timings AND the failed
    // list) + graduated-precision values — see [[shortKey]] and fmt.
    // DEGRADED QUARANTINE (round 13): a <3-pass or truncated run is
    // contention/deadline evidence, not regression evidence — it writes
    // to the SIDE file so it can never silently shadow a committed
    // clean 3-pass BENCH_FULL.json record, and every form of the
    // artifact (side file, outFile, stdout tail) carries
    // `"degraded":true` so no reader can mistake it for a clean record.
    val qsFull = timings.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failedFull = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Per-pass totals (full record only — the stdout line's width budget
    // is for query entries): three same-day clean runs in round 13
    // drifted 169→197 s total with flat per-query medians, and telling
    // that CONTENTION signature (pass totals climbing within one run /
    // across runs) from a CODE regression (all passes uniformly slower)
    // required re-running the bench. Committed per-pass totals make the
    // distinction readable from the artifact alone.
    val ptPart = {
      val ts = passTotals(ps)
      if (ts.isEmpty) ""
      else s""","passTotals":${
        ts.map { case (t, n) => s"[$t,$n]" }.mkString("[", ",", "]")}"""
    }
    // shard bookkeeping (full record only): shard count + per-shard
    // completed passes + the RUN ORDER (rotation), so a reader can
    // tell "shard 0 driver-grade, shard 1 cut" AND which shard a
    // deadline cut hit first from the artifact alone
    val shardPart =
      if (nShards <= 1) ""
      else s""","shards":$nShards,"shardPasses":${
        (0 until nShards).map(shp.getOrElse(_, 0)).mkString("[", ",", "]")
      },"shardOrder":${shOrder.mkString("[", ",", "]")}"""
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsFull,"failed":$failedFull$ptPart$shardPart$extra,"sf":"$sfDir"}"""
    try {
      Files.writeString(Paths.get(fullRecordTarget(eff, truncated)), fullLine + "\n")
      outFile.foreach(pth => Files.writeString(Paths.get(pth), fullLine + "\n"))
    } catch { case _: Throwable => () } // emitting the stdout line still matters

    val failedShort = failed.map("\"" + shortKey(_) + "\"").mkString("[", ",", "]")
    // sf basename only on stdout (the full path is in the file record):
    // every constant char on this line competes with a query entry
    // against the driver's tail capture
    val sfShort = sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir)
    def lineAt(fine: Boolean, grouped: Boolean, positional: Boolean): String = {
      // grouped: one object per FAMILY letter keyed by the short key's
      // remainder ("d6b" → "d":{"6b":…}) — saves the repeated family
      // char. positional: per-family ARRAYS in sorted-short-key order
      // ("d":[…]) — the last-resort grain-preserving form; the name↔
      // position map is recomputable from BENCH_FULL.json (committed,
      // full names) and documented in BASELINE.md.
      val qs =
        if (!grouped) timings.map { case (k, v) =>
          "\"" + shortKey(k) + "\":" + fmtAt(v, fine)
        }.mkString("{", ",", "}")
        else groupedFamilies(timings)
          .map { case (fam, entries) =>
            val body =
              if (positional) entries.map(e => fmtAt(e._2, fine)).mkString("[", ",", "]")
              else entries.map { case (rest, v) =>
                "\"" + rest + "\":" + fmtAt(v, fine)
              }.mkString("{", ",", "}")
            "\"" + fam + "\":" + body
          }.mkString("{", ",", "}")
      // failed/passes are our own diagnostics (not driver contract):
      // omitted when nominal (no failures, full 3 passes) so healthy
      // lines spend their width on query entries; unhealthy runs carry
      // them, and those lines are shorter anyway (failed queries have
      // no timing entry)
      val failedPart = if (failed.isEmpty) "" else s""","failed":$failedShort"""
      val passesPart = if (!isDegraded(eff, truncated)) "" else extra
      s"""{"metric":"total","value":${fmtAt(total, fine)},"unit":"sec","queries":$qs$failedPart$passesPart,"sf":"$sfShort"}"""
    }
    // degrade ladder: fine flat → coarse flat → coarse grouped →
    // coarse positional; first form that fits the tail budget wins
    // (a whole coarse line beats a truncated fine one, which parses
    // as null and loses everything)
    val ladder = Seq((true, false, false), (false, false, false),
      (false, true, false), (false, true, true))
    val line = ladder.iterator.map { case (f, g, p) => lineAt(f, g, p) }
      .find(_.length <= 1850)
      .getOrElse(lineAt(fine = false, grouped = true, positional = true))
    // Round 19 (the r18 verdict's per-query-names ask): NAMED per-query
    // timings cannot fit the contract line — the driver's tail capture
    // is exactly 2 000 chars (BENCH_r17/r18 tails measure it) and the
    // flat named form needs ≥ 2 330 chars at 233 queries even at coarse
    // precision (id-prefix keys, measured against the real registry;
    // rounds 1/3 proved an overflowing line parses as null and loses
    // everything). Best-effort instead: the full-fidelity named record
    // (the BENCH_FULL.json line) ALSO goes to stdout as a PREFIXED
    // pre-line, printed BEFORE the contract line so the tail's last
    // bytes always keep the contract line whole — a consumer with full
    // stdout gets names; the 2 000-char tail still parses exactly the
    // line it always did (the prefix keeps the pre-line from ever
    // being line-parsed as the artifact).
    println("benchByKey " + fullLine)
    println(line)
    System.out.flush()
  }

  /** (total seconds, queries timed) of each COMPLETED measured pass,
    * in run order — the inter-pass drift diagnostic committed in
    * BENCH_FULL (see emit). A deadline-cut partial pass is excluded:
    * its sum spans a different query subset and is not a comparable
    * total (its samples still feed the medians via `current`). The
    * count term is what makes a short sum readable: a pass where some
    * query failed carries n < the suite size, so a short-total pass is
    * distinguishable from a genuinely fast one IN the artifact — the
    * top-level `failed` list only names queries that failed in EVERY
    * pass, not per-pass dropouts. */
  private[graft] def passTotals(ps: Seq[Map[String, Double]]): Seq[(Double, Int)] =
    ps.map(m => (m.values.sum, m.size))

  /** Round-robin shard assignment over the SORTED query names: query i
    * lands in shard i % n. Deterministic, partitioning (every name in
    * exactly one shard — ContractSpec pins both directions), and
    * cost-balanced in expectation (adjacent sorted keys are family
    * neighbors with similar weight, so alternation splits each family
    * evenly instead of handing one shard the producer-heavy tail). */
  private[graft] def shardAssignment(sortedNames: Seq[String],
      nShards: Int): Seq[Seq[String]] =
    (0 until nShards).map(si =>
      sortedNames.zipWithIndex.collect { case (n, i) if i % nShards == si => n })

  /** The EFFECTIVE pass count of a sharded run: the minimum completed
    * passes over ALL shards (0 for a shard never reached) — "3
    * effective passes" means every query has 3 measured samples, the
    * driver-grade bar the old single-shard passCount expressed. */
  private[graft] def effectivePasses(shardPasses: Map[Int, Int],
      nShards: Int): Int =
    (0 until nShards).map(shardPasses.getOrElse(_, 0)).min

  /** A run is DEGRADED when it completed fewer than the contracted 3
    * measured passes FOR EVERY QUERY (min over shards) or was cut by
    * the shutdown hook — its timings are
    * deadline/contention evidence, not regression evidence (the round-12
    * driver artifact: 2 passes on a contended box, 24 phantom budget
    * breaches vs the same-code clean record). */
  private[graft] def isDegraded(passCount: Int, truncated: Boolean): Boolean =
    passCount < 3 || truncated

  /** Where the full-fidelity record lands: clean 3-pass runs own
    * `BENCH_FULL.json`; degraded runs are quarantined to the side file
    * so they can never overwrite a committed clean record. */
  private[graft] def fullRecordTarget(passCount: Int, truncated: Boolean): String =
    if (isDegraded(passCount, truncated)) "BENCH_FULL.degraded.json"
    else "BENCH_FULL.json"

  /** The health-flag JSON fragment every artifact form carries:
    * `"passes":n`, `"truncated":true` on a hook-emitted partial, and the
    * prominent `"degraded":true` whenever [[isDegraded]]. */
  private[graft] def healthFlags(passCount: Int, truncated: Boolean): String =
    s""","passes":$passCount""" +
      (if (truncated) s""","truncated":true""" else "") +
      (if (isDegraded(passCount, truncated)) s""","degraded":true""" else "")

  /** Timings bucketed by family (the short key's leading letters;
    * "qwc" → fam "q", rest "wc"), families sorted, members sorted by
    * FULL query name — so the positional form's name ↔ position map is
    * exactly `sorted(full names of the family)`, recomputable from
    * BENCH_FULL.json alone. Returns (family, Seq(shortRest, value)). */
  def groupedFamilies(timings: Seq[(String, Double)]): Seq[(String, Seq[(String, Double)])] =
    timings.map { case (k, v) =>
      val sk = shortKey(k)
      val fam = sk.take(1) // every family is one letter ("qwc" → "q"+"wc")
      (fam, k, sk.drop(1), v)
    }.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (fam, es) =>
        (fam, es.sortBy(_._2).map(e => (e._3, e._4)))
      }

  /** Short stdout key for a query name: the driver captures only the
    * last ~2000 chars of bench stdout, and with ~90 queries the
    * full-name 9-decimal JSON line overflows it and arrives truncated
    * (rounds 1 and 3 were unparseable for exactly this reason). Short
    * key = query name truncated at the first '_', then the NUMBER's
    * leading zero stripped ("d06b" → "d6b", "e45" unchanged) — round
    * 12: at 177 queries even the id-only keys overflowed the coarse
    * line, and the zero is pure padding (family + number + suffix stay
    * unambiguous, and the key is still NAME-derived, so it is stable
    * across rounds for every query except the one-time 0N → N rename
    * this round). The six q_* text queries keep explicit codes.
    * Documented in BASELINE.md; ContractSpec guards length and
    * collision-freedom against the REAL query set via this very
    * method. */
  val qShort: Map[String, String] = Map(
    "q_wordcount" -> "qwc", "q_topk" -> "qtk", "q_inverted_index" -> "qii",
    "q_wordcount_republic" -> "qwcr", "q_topk_republic" -> "qtkr",
    "q_inverted_index_republic" -> "qiir")

  def shortKey(name: String): String = qShort.getOrElse(name, {
    val id = name.takeWhile(_ != '_')
    if (id.length >= 3 && id(1) == '0') id.head +: id.drop(2) else id
  })
}
