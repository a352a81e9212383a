package graft

/** Dev-only: dump `.explain("formatted")` of named registry queries to
  * files (the optimization-round before/after plan evidence). Usage:
  *   runMain graft.PlanDump <sfDir> <outDir> <suffix> <key> [key...]
  * writes <outDir>/<key>_<suffix>.txt per key. Keys default to the
  * whole registry when omitted. NOTE: the maintained-store twins
  * (s16–s26, d30b …) run their sinks EAGERLY while the query function
  * builds its frame, so the dumped plan is the final store re-read —
  * the part a plan CAN show — and the dump pays the sink cost. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(2)
    val keys = if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkEnv.session("plandump")
    keys.foreach { k =>
      spark.sharedState.cacheManager.clearCache()
      val df = SparkEntry.queries(k)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        outDir.resolve(s"${k}_$suffix.txt"), plan)
      System.err.println(s"[plandump] wrote $k ($suffix)")
    }
    spark.stop()
  }
}
