package graft

import java.nio.file.{Files, Paths}
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
  * page cache), and cached tables can't accumulate across ~50 queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outFile = args.headOption.orElse(sys.env.get("SPARK_GRAFT_BENCH_OUT"))
    val spark = SparkEnv.session("graft-bench")

    // Deterministic iteration order; Map ordering is arbitrary.
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)

    // fail fast on short-key collisions — BEFORE the ~9-minute
    // warmup+measure loop, not after it
    require(queries.map(q => shortKey(q._1)).distinct.size == queries.size,
      "short bench keys collide; fix Bench.shortKey")

    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def timeOne(fn: (org.apache.spark.sql.SparkSession, String) => DataFrame): Either[String, Double] = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      try { exec(fn(spark, sfDir)); Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable => Left(e.getClass.getSimpleName) }
    }

    // Warmup: one full discarded pass (JIT, codegen caches, FS metadata).
    queries.foreach { case (_, fn) => timeOne(fn) }

    val runs = (1 to 3).map { _ => queries.map { case (n, fn) => n -> timeOne(fn) }.toMap }
    val timings = queries.flatMap { case (name, _) =>
      val ok = runs.flatMap(_(name).toOption).sorted
      if (ok.size == runs.size) Some(name -> ok(ok.size / 2)) else None
    }
    val failed = queries.map(_._1).filterNot(timings.map(_._1).toSet)

    val total = timings.map(_._2).sum
    def fmt(v: Double): String =
      java.math.BigDecimal.valueOf(v).setScale(3, java.math.RoundingMode.HALF_UP)
        .stripTrailingZeros.toPlainString

    // Full-fidelity record (full query names, full precision) → file;
    // the stdout line uses SHORT keys everywhere (timings AND the failed
    // list) + 3-decimal values — see [[shortKey]].
    val qsFull = timings.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failedFull = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qsFull,"failed":$failedFull,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("BENCH_FULL.json"), fullLine + "\n")
    outFile.foreach(p => Files.writeString(Paths.get(p), fullLine + "\n"))

    val qsShort = timings.map { case (k, v) => "\"" + shortKey(k) + "\":" + fmt(v) }.mkString("{", ",", "}")
    val failedShort = failed.map("\"" + shortKey(_) + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qsShort,"failed":$failedShort,"sf":"$sfDir"}"""
    println(line)
    spark.stop()
  }

  /** Short stdout key for a query name: the driver captures only the
    * last ~2000 chars of bench stdout, and with ~90 queries the
    * full-name 9-decimal JSON line overflows it and arrives truncated
    * (rounds 1 and 3 were unparseable for exactly this reason). Short
    * key = query name truncated at the first '_' (unique across all
    * eNN/dNN/sNN/fNN/mNN/pNN/tNN ids, including b/c suffixes); the six
    * q_* text queries get explicit codes. Documented in BASELINE.md;
    * ContractSpec guards length and collision-freedom against the REAL
    * query set via this very method. */
  val qShort: Map[String, String] = Map(
    "q_wordcount" -> "qwc", "q_topk" -> "qtk", "q_inverted_index" -> "qii",
    "q_wordcount_republic" -> "qwcr", "q_topk_republic" -> "qtkr",
    "q_inverted_index_republic" -> "qiir")

  def shortKey(name: String): String = qShort.getOrElse(name, name.takeWhile(_ != '_'))
}
