package graft

import graft.operators.Multimodal
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for m06 RLE stats: arbitrary binary
  * payloads (drawn from a SMALL byte alphabet so long runs actually
  * occur, plus sign-bit bytes) must produce exactly the run count, max
  * run length, and ratio an in-memory fold computes. Drives the real
  * `aggregate`-over-`byte_values` plan. */
object RleProps extends Properties("RleStats") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val payloadGen: Gen[Array[Byte]] = for {
    n <- Gen.choose(1, 64)
    bytes <- Gen.listOfN(n,
      Gen.oneOf(Seq[Byte](0, 1, 2, -1, -128, 127)))
  } yield bytes.toArray

  private def model(p: Array[Byte]): (Long, Long) = { // (n_runs, max_run)
    var runs = 0L; var mx = 0L; var cur = 0L; var prev = -1
    p.foreach { b =>
      val v = b & 0xff
      if (v == prev) cur += 1 else { runs += 1; cur = 1 }
      if (cur > mx) mx = cur
      prev = v
    }
    (runs, mx)
  }

  property("runs/max-run/ratio ≡ in-memory fold") =
    Prop.forAllNoShrink(Gen.nonEmptyListOf(payloadGen).map(_.take(6))) { ps =>
      import spark.implicits._
      val media = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("doc_id", "payload")
      val got = Multimodal.rleStatsOver(media)
        .select("doc_id", "n_bytes", "n_runs", "max_run", "rle_ratio")
        .as[(Long, Long, Long, Long, Double)].collect().toList
      val want = ps.zipWithIndex.map { case (p, i) =>
        val (runs, mx) = model(p)
        (i.toLong, p.length.toLong, runs, mx, runs.toDouble / p.length)
      }
      got.sorted == want.sorted
    }
}
