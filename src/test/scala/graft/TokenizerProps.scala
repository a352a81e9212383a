package graft

import graft.operators.TextPipeline
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based tokenizer invariants (SURVEY §5.3), run by sbt's native
  * ScalaCheck framework. Each sample drives the real Spark expression, so
  * the sample count is kept small — the generators cover the interesting
  * character classes densely. */
object TokenizerProps extends Properties("Tokenizer") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val lineGen: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaChar, 2 -> Gen.numChar,
    3 -> Gen.oneOf(' ', '\'', '-', '_', 'é', '\t'))).map(_.mkString)

  property("every token matches ^[a-z][a-z']*$ and occurs in the lowercased input") =
    Prop.forAllNoShrink(Gen.listOfN(20, lineGen)) { lines =>
      import spark.implicits._
      val toks = TextPipeline.tokens(lines.toDF("value"), "value")
        .as[String].collect().toSeq
      toks.forall(t => t.matches("[a-z][a-z']*") &&
        lines.map(_.toLowerCase).exists(_.contains(t)))
    }

  property("token multiset is invariant under splitting lines at spaces") =
    Prop.forAllNoShrink(Gen.listOfN(8, Gen.oneOf("don't", "above", "x1y", "Cat", "DOG-house"))) { ws =>
      import spark.implicits._
      val one = TextPipeline.tokens(Seq(ws.mkString(" ")).toDF("value"), "value")
        .as[String].collect().toSeq.sorted
      val many = TextPipeline.tokens(ws.toDF("value"), "value")
        .as[String].collect().toSeq.sorted
      one == many
    }

  property("token count equals sum of per-line token counts (agg invariant)") =
    Prop.forAllNoShrink(Gen.listOfN(10, lineGen)) { lines =>
      import spark.implicits._
      val df = lines.toDF("value")
      val total = TextPipeline.tokens(df, "value").count()
      val perLine = lines.map(l =>
        "[a-z][a-z']*".r.findAllIn(l.toLowerCase).length.toLong).sum
      total == perLine
    }
}
