package graft

import graft.operators.{RefQueries, TextPipeline}
import org.apache.spark.sql.functions._

/** File2ForLab3.txt embeds its own 1-based line number as a `N ` prefix
  * on every line (FIXTURES.md §A) — a free, independent oracle for the
  * hardest part of the inverted index: the distributed 0-based line
  * numbering synthesized by `zipWithIndex` (SURVEY §7.4.1). */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  test("zipWithIndex line numbers match File2's embedded 1-based prefixes") {
    val lines = TextPipeline.linesWithIndex(spark, RefQueries.Republic)
    val parsed = lines
      .select(col("line"),
        regexp_extract(col("text"), "^(\\d+) ", 1).as("prefix"))
      .filter(col("prefix") =!= "")
      .select(col("line"), col("prefix").cast("long").as("n"))
      .as[(Long, Long)]
    val total = lines.count()
    val checked = parsed.count()
    // nearly every line carries the prefix; all that do must agree
    assert(checked > total * 9 / 10, s"only $checked of $total lines had a prefix")
    val mismatches = parsed.filter(col("line") =!= col("n") - 1).count()
    assert(mismatches === 0L)
  }

  test("inverted index postings reference only lines where the word occurs") {
    // spot-check 20 words end-to-end against a driver-side grep of the file
    val rows = RefQueries.invertedIndex(spark)
      .select("word", "postings").as[(String, String)]
      .collect().sortBy(_._1).take(20)
    val fileLines = scala.io.Source.fromFile(RefQueries.Dracula)("UTF-8")
      .getLines().map(_.toLowerCase).toArray
    rows.foreach { case (word, postings) =>
      postings.split(",").map(_.toInt).foreach { ln =>
        assert("[a-z][a-z']*".r.findAllIn(fileLines(ln)).contains(word),
          s"word '$word' not found on its posted line $ln")
      }
    }
  }
}
