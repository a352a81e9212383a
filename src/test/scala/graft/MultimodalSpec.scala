package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("frame sampling tiles the payload exactly") {
    val meta = Multimodal.binaryMeta(spark, Sf)
      .select("doc_id", "n_bytes", "n_frames").as[(Long, Long, Long)]
      .collect().toMap2
    val frames = Multimodal.frames(spark, Sf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum(length(col("frame_bytes"))).as("bytes"))
      .as[(Long, Long, Long)].collect()
    assert(frames.length === meta.size)
    frames.foreach { case (doc, n, bytes) =>
      val (nBytes, nFrames) = meta(doc)
      assert(n === nFrames, s"doc $doc frame count")
      assert(bytes === nBytes, s"doc $doc total bytes across frames")
    }
  }

  test("stub decode emits fixed-width float features deterministically") {
    val a = Multimodal.frameFeatures(spark, Sf).collect().toSeq
    val b = Multimodal.frameFeatures(spark, Sf).collect().toSeq
    assert(a === b, "stub decode must be deterministic")
    val feats = Multimodal.frameFeatures(spark, Sf)
      .select("features").as[Seq[Float]].collect()
    assert(feats.forall(f => f.length == 4 && f.forall(x => x >= 0f && x <= 1f)))
  }

  private implicit class ToMap2(val rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, (Long, Long)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
