package graft

import graft.operators.Relational
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for e44 weighted quantiles: generated
  * per-supplier (price, weight) sets — with deliberate price ties,
  * boundary-exact weights (the cum·k = total·j equality case), and
  * scrambled row order — must produce exactly the quartiles an
  * in-memory exact-decimal fold computes. Arrival order must not
  * matter: only the price sort is semantic, and ties at the crossing
  * move the crossing row, never the crossing price. */
object WeightedQuantileProps extends Properties("WeightedQuantiles") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  /** Small price/weight pools so ties and exact boundary crossings
    * (e.g. weights 1,1,2 → cum·2 = total at the second row) occur. */
  private val rowGen: Gen[(Double, Double)] = for {
    p <- Gen.oneOf(10.0, 10.0, 20.0, 30.0, 45.5)
    w <- Gen.oneOf(0.5, 1.0, 1.0, 2.0, 3.0)
  } yield (p, w)

  private val corpusGen: Gen[List[(Long, List[(Double, Double)])]] =
    Gen.nonEmptyListOf(for {
      supp <- Gen.choose(1L, 4L)
      rows <- Gen.nonEmptyListOf(rowGen).map(_.take(8))
    } yield (supp, rows)).map(_.take(5))
      .map(_.groupBy(_._1).map { case (k, xs) => (k, xs.flatMap(_._2)) }.toList)

  private def foldQuantile(rows: List[(Double, BigDecimal)], num: Int, den: Int): Double = {
    val total = rows.map(_._2).sum
    var cum = BigDecimal(0)
    rows.sortBy(_._1).collectFirst {
      case (p, w) if { cum += w; cum * den >= total * num } => p
    }.get
  }

  property("quartiles ≡ exact-decimal fold; arrival order irrelevant") =
    Prop.forAllNoShrink(corpusGen) { corpus =>
      import spark.implicits._
      // write in REVERSED order: only the price sort may matter
      val li = corpus.flatMap { case (supp, rows) =>
        rows.map { case (p, w) => (supp, p, w) }
      }.reverse.toDF("l_suppkey", "l_extendedprice", "l_quantity")
      val got = Relational.weightedQuantilesOver(li)
        .as[(Long, Long, Double, Double, Double, Double)].collect().toList
      val want = corpus.map { case (supp, rows0) =>
        val rows = rows0.map { case (p, w) => (p, BigDecimal(w)) }
        (supp, rows.length.toLong, rows.map(_._2).sum.toDouble,
          foldQuantile(rows, 1, 4), foldQuantile(rows, 1, 2), foldQuantile(rows, 3, 4))
      }.sortBy(_._1)
      Prop(got == want) :| s"got $got\nwant $want"
    }
}
