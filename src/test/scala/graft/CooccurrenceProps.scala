package graft

import graft.operators.Relational
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for e37 item co-occurrence: generated
  * multi-user baskets (item frequencies drawn so the top-20 cap and its
  * (freq desc, item asc) rank order both bite) must produce exactly the
  * support/lift table an in-memory model computes. */
object CooccurrenceProps extends Properties("Cooccurrence") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6)

  /** Per user: 5..30 (item, freq) draws from a 30-item domain — users
    * with >20 distinct items exercise the cap. */
  private val userGen: Gen[List[(Long, Int)]] = for {
    n <- Gen.choose(5, 30)
    items <- Gen.listOfN(n, Gen.choose(0L, 29L))
    freqs <- Gen.listOfN(n, Gen.choose(1, 3))
  } yield items.zip(freqs).groupBy(_._1).map { case (i, xs) =>
    (i, xs.map(_._2).sum)
  }.toList

  private def model(users: List[List[(Long, Int)]])
      : List[(Long, Long, Long, Double)] = {
    val baskets = users.map { counts =>
      counts.sortBy { case (item, n) => (-n, item) }
        .take(Relational.BasketCap).map(_._1).toSet
    }
    val nTotal = baskets.count(_.nonEmpty).toLong
    val icnt = baskets.flatten.groupBy(identity).map { case (i, xs) => (i, xs.size.toLong) }
    val pairs = baskets.flatMap { b =>
      val s = b.toList.sorted
      for (i <- s; j <- s if i < j) yield (i, j)
    }.groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }
      .filter(_._2 >= 2)
    pairs.toList.map { case ((a, b), sup) =>
      (a, b, sup, sup.toDouble * nTotal / (icnt(a) * icnt(b)))
    }.sortBy(p => (p._1, p._2))
  }

  property("support/lift ≡ in-memory capped-basket model") =
    Prop.forAllNoShrink(Gen.nonEmptyListOf(userGen).map(_.take(6))) { users =>
      import spark.implicits._
      var eid = 0L
      val rows = users.zipWithIndex.flatMap { case (counts, u) =>
        counts.flatMap { case (item, n) =>
          (1 to n).map { _ =>
            eid += 1
            (eid, new java.sql.Timestamp(1704067200000L + eid * 60000L),
              u.toLong + 1, "view", 1.0, s"""{"k": $item}""")
          }
        }
      }
      val dir = java.nio.file.Files.createTempDirectory("graft-coocprops").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = Relational.cooccurrence(spark, dir)
        .select("item_a", "item_b", "support", "lift")
        .as[(Long, Long, Long, Double)].collect().toList.sortBy(p => (p._1, p._2))
      got == model(users)
    }
}
