package graft
object MiniBench {
  /** Dev-only micro-bench: median-of-3 per named query under the Bench
    * protocol (caches persist across runs; pass --cold to clear). */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkEnv.session("mini")
    val cold = args.contains("--cold")
    val qs = args.filterNot(_ == "--cold").toSeq match {
      case Nil => SparkEntry.queries.keys.toSeq.sorted
      case x => x
    }
    qs.foreach { n => SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save() }
    qs.foreach { n =>
      val ts = (1 to 3).map { _ =>
        if (cold) spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"mini $n ${ts(1)}%.3f")
    }
    spark.stop()
  }
}
