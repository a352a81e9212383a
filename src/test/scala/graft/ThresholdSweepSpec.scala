package graft

/** d71 threshold sweep: in-memory differential over the two component
  * signals plus the curve invariants that make a PR sweep a PR sweep —
  * counts conserve at every τ, and recall is monotone non-increasing
  * as the cutoff rises (the predicted-keep set only shrinks). */
class ThresholdSweepSpec extends SparkSpec {
  import spark.implicits._

  test("sweep ≡ in-memory confusion at every cutoff; conservation and monotone recall") {
    val model = operators.QualityOps.qualityClassifier(spark, Sf)
      .select("doc_id", "logit").as[(Long, Double)].collect().toMap
    val label = operators.QualityOps.repetition(spark, Sf)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = operators.QualityOps.SweepPcts.map { pct =>
      val tau = pct / 100.0
      val cells = model.keys.toSeq.map { id =>
        (model(id) >= tau, label(id))
      }
      val tp = cells.count { case (p, l) => p && l }.toLong
      val fp = cells.count { case (p, l) => p && !l }.toLong
      val fn = cells.count { case (p, l) => !p && l }.toLong
      val tn = cells.count { case (p, l) => !p && !l }.toLong
      (pct.toLong, tp, fp, fn, tn,
        if (tp + fp > 0) Some(r4(tp.toDouble / (tp + fp))) else None,
        if (tp + fn > 0) Some(r4(tp.toDouble / (tp + fn))) else None,
        if (2 * tp + fp + fn > 0) Some(r4(2.0 * tp / (2 * tp + fp + fn))) else None)
    }
    val got = operators.QualityOps.thresholdSweep(spark, Sf)
      .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(got === want)
    val n = model.size.toLong
    got.foreach { r => assert(r._2 + r._3 + r._4 + r._5 === n, s"tau ${r._1} loses docs") }
    val recalls = got.map(_._7.getOrElse(0.0))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b },
      "recall must be monotone non-increasing in the cutoff")
    // the sweep must actually discriminate on this corpus: the extreme
    // cutoffs predict differently (not a flat curve)
    assert(got.head._2 > got.last._2, "tp must strictly drop across the grid")
  }
}
