package graft

import org.apache.spark.sql.functions._

/** Dev-only scratch probe for optimization rounds: re-runs one heavy
  * twin with phase timers so the optimizer knows where the seconds go.
  * Not part of any surface; never referenced by the registry. */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session("probe")
    // per-job log line (id, seconds, description) — the poor man's UI
    // (spark.ui is disabled in this sandbox)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (tns, desc) = starts.getOrDefault(je.jobId, (0L, "?"))
        System.err.println(
          f"[job ${je.jobId}%4d ${(System.nanoTime() - tns) / 1e9}%7.3fs] $desc")
      }
    })
    val t0 = System.nanoTime()
    def mark(m: String): Unit =
      System.err.println(f"[probe +${(System.nanoTime() - t0) / 1e9}%7.2fs] $m")

    args.headOption.getOrElse("s17") match {
      case "s17" =>
        val docs = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        val base = java.nio.file.Files.createTempDirectory("probe-s17").toFile
        org.apache.commons.io.FileUtils.forceDeleteOnExit(base)
        mark("start batch 0")
        operators.Streaming.pairStoreSink(base.toString)(
          docs.filter(pmod(col("doc_id"), lit(10L)) < 8), 0L)
        mark("batch 0 done")
        operators.Streaming.pairStoreSink(base.toString)(
          docs.filter(pmod(col("doc_id"), lit(10L)) >= 8), 1L)
        mark("batch 1 done")
        spark.read.parquet(s"$base/pairs/published")
          .write.format("noop").mode("overwrite").save()
        mark("re-read done")
      case "s26" =>
        val emb = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"))
        val base = java.nio.file.Files.createTempDirectory("probe-s26").toFile
        org.apache.commons.io.FileUtils.forceDeleteOnExit(base)
        mark("start batch 0")
        operators.Streaming.familyMaintSink(base.toString)(
          emb.filter(pmod(col("vec_id"), lit(10L)) < 8), 0L)
        mark("batch 0 done")
        operators.Streaming.familyMaintSink(base.toString)(
          emb.filter(pmod(col("vec_id"), lit(10L)) === 8), 1L)
        mark("batch 1 done")
        operators.Streaming.familyMaintSink(base.toString)(
          emb.filter(pmod(col("vec_id"), lit(10L)) === 9), 2L)
        mark("batch 2 done")
      case "s19" =>
        val emb = Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"))
        val base = java.nio.file.Files.createTempDirectory("probe-s19").toFile
        org.apache.commons.io.FileUtils.forceDeleteOnExit(base)
        mark("start batch 0")
        operators.Streaming.vectorIndexMaintSink(base.toString)(
          emb.filter(pmod(col("vec_id"), lit(10L)) < 8), 0L)
        mark("batch 0 done")
        operators.Streaming.vectorIndexMaintSink(base.toString)(
          emb.filter(pmod(col("vec_id"), lit(10L)) >= 8), 1L)
        mark("batch 1 done")
    }
    spark.stop()
  }
}
