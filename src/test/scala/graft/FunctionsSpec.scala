package graft

import org.apache.spark.sql.functions._

/** The native codegen expressions registered by GraftExtensions. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
    (Seq(1.0, 0.0), Seq(0.0, 1.0)),
    (Seq(0.5, -0.5, 2.0), Seq(-1.0, 4.0, 0.25))
  ).toDF("a", "b")

  test("cosine_sim/array_dot resolve through SQL (extension-registered)") {
    pairs.createOrReplaceTempView("fn_pairs")
    val rows = spark.sql(
      "SELECT cosine_sim(a, b) AS c, array_dot(a, b) AS d FROM fn_pairs")
      .as[(Double, Double)].collect()
    assert(rows(0)._1 === 1.0 && rows(1)._1 === 0.0)
    assert(rows(0)._2 === 14.0 && rows(1)._2 === 0.0 && rows(2)._2 === -2.0)
  }

  test("codegen and interpreted paths agree bit-for-bit with the HOF fold") {
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val both = pairs.select(
      call_function("cosine_sim", col("a"), col("b")).as("native"),
      (hofDot(col("a"), col("b")) /
        (sqrt(hofDot(col("a"), col("a"))) * sqrt(hofDot(col("b"), col("b"))))).as("hof"))
      .as[(Double, Double)].collect()
    both.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ===
        java.lang.Double.doubleToLongBits(h))
    }
  }

  test("null and type handling") {
    val withNull = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]]))
      .toDF("a", "b")
    val r = withNull.select(call_function("cosine_sim", col("a"), col("b")))
      .collect().head
    assert(r.isNullAt(0))
    // wrong element type is an analysis-time error, not a wrong answer
    val bad = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    intercept[Exception] {
      bad.select(call_function("cosine_sim", col("a"), col("b"))).collect()
    }
  }

  test("null element inside NON-nullable arrays (CreateArray) still nulls the result") {
    // CreateArray of nullable columns: the array itself is never null
    // (nullable=false) but elements can be — without the `nullable`
    // override the codegen branch would assign to a FalseLiteral isNull
    // slot and fail to compile (or silently read 0.0 interpreted).
    val df = Seq((Option(1.0), Option.empty[Double], 2.0)).toDF("x", "y", "z")
    val r = df.select(
      call_function("cosine_sim",
        array(col("x"), col("y")), array(col("z"), col("z"))).as("c"),
      call_function("array_dot",
        array(col("x"), col("y")), array(col("z"), col("z"))).as("d"))
      .collect().head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("null ELEMENT in the common prefix nulls the result (HOF-fold parity)") {
    // a null element must propagate to NULL — the same semantics as the
    // aggregate(zip_with(...)) fold the docs claim bit-identity with —
    // never silently read as 0.0.
    val df = Seq(
      (Seq(Option(1.0), None, Option(3.0)), Seq(Option(1.0), Option(2.0), Option(3.0))),
      (Seq(Option(1.0), Option(2.0)), Seq(Option(4.0), Option(5.0)))
    ).toDF("a", "b")
    val rows = df.select(
      call_function("cosine_sim", col("a"), col("b")).as("c"),
      call_function("array_dot", col("a"), col("b")).as("d")).collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(!rows(1).isNullAt(0) && rows(1).getDouble(1) === 14.0)
  }

  test("token_ngrams ≡ split→sliding-window→concat_ws on adversarial inputs") {
    // the contract the gram family relies on: identical to Spark's
    // split(text,' ',-1) semantics (empty tokens KEPT, incl. trailing),
    // windows joined by a single space, <n tokens → empty array
    val texts = Seq(
      "the quick brown fox jumps",
      "a b",                 // exactly n-1 tokens for n=3
      "a b c",               // exactly n tokens
      "",                    // one empty token
      "  ",                  // three empty tokens
      "a  b",                // interior empty token
      "trailing space ",     // trailing empty token
      " leading",            // leading empty token
      "solo")
    val df = texts.toDF("text")
    for (n <- Seq(2, 3, 5)) {
      val got = df.select(
        call_function("token_ngrams", col("text"), lit(n)).as("g"))
        .as[Seq[String]].collect()
      val want = texts.map { t =>
        t.split(" ", -1).toSeq.sliding(n).filter(_.size == n)
          .map(_.mkString(" ")).toSeq
      }
      assert(got.toSeq === want, s"n=$n")
    }
    // null text → null result (not an empty array)
    val r = Seq(Option.empty[String]).toDF("text")
      .select(call_function("token_ngrams", col("text"), lit(3))).collect().head
    assert(r.isNullAt(0))
    // multi-byte UTF-8 grams slice on character boundaries
    val utf8 = Seq("héllo wörld ünïcode").toDF("text")
      .select(call_function("token_ngrams", col("text"), lit(2)))
      .as[Seq[String]].collect().head
    assert(utf8 === Seq("héllo wörld", "wörld ünïcode"))
  }

  test("nfc_normalize: composes NFD, fixes ASCII/NFC, nulls through, SQL-callable") {
    val composed = "caf\u00e9"          // e-acute as one codepoint
    val decomposed = "cafe\u0301"       // e + combining acute
    assert(composed != decomposed, "fixture must start canonically distinct")
    val got = Seq(composed, decomposed, "plain ascii", "")
      .toDF("text")
      .select(call_function("nfc_normalize", col("text")).as("n"))
      .as[String].collect().toSeq
    assert(got === Seq(composed, composed, "plain ascii", ""))
    // null -> null (null-intolerant unary contract)
    val r = Seq(Option.empty[String]).toDF("text")
      .select(call_function("nfc_normalize", col("text"))).collect().head
    assert(r.isNullAt(0))
    // registered for SQL consumers too, and correct on a multi-mark
    // cluster: a + combining-acute + combining-dot-below must reorder
    // the marks canonically (dot-below has the lower combining class)
    // and compose the base pair to U+1EA1, acute kept as a mark
    val sql = spark.sql(
      "SELECT nfc_normalize('a\u0301\u0323') = '\u1ea1\u0301'")
      .collect().head.getBoolean(0)
    assert(sql)
  }
}
