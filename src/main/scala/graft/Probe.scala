package graft

import org.apache.spark.sql.SparkSession

/** Temporary environment probe (removed once pinned by tests). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    println("=== events plain read ===")
    try {
      val e = spark.read.parquet(s"$d/events.parquet")
      e.printSchema()
      e.show(3, false)
    } catch { case ex: Throwable => println(s"FAILED: ${ex.getMessage.take(300)}") }
    println("=== events via Tables.events ===")
    try {
      val e = Tables.events(spark, d)
      e.printSchema()
      e.show(3, false)
    } catch { case ex: Throwable => println(s"FAILED: ${ex.getMessage.take(300)}") }
    println("=== lineitem ===")
    Tables.lineitem(spark, d).show(2, false)
    println("=== documents ===")
    Tables.documents(spark, d).show(2, false)
    println("=== embeddings ===")
    Tables.embeddings(spark, d).printSchema()
    spark.stop()
  }
}
