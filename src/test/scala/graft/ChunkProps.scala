package graft

import graft.operators.{LlmOps, SamplingOps}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based invariants for context-window chunking (d14/d16's
  * shared stage), on GENERATED token arrays — the corpus only exercises
  * doc lengths 10..~200; these cover 1-token docs, exact-multiple
  * lengths, and the stride boundaries. Each sample drives the real Spark
  * plan, so the sample count stays small. */
object ChunkProps extends Properties("Chunking") {
  private lazy val spark = SparkEnv.session("graft-props")

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val Size = SamplingOps.ChunkTokens
  private val Stride = SamplingOps.ChunkStride

  private val docsGen: Gen[List[Int]] = Gen.nonEmptyListOf(Gen.chooseNum(1, 173))

  property("chunks tile [0, n): stride starts, clamped last, full coverage") =
    Prop.forAllNoShrink(docsGen) { lens =>
      import spark.implicits._
      val tokenized = lens.zipWithIndex
        .map { case (n, id) => (id.toLong, (0 until n).map(i => s"w$i")) }
        .toDF("doc_id", "t")
      val out = SamplingOps.chunkRows(tokenized)
        .select("doc_id", "chunk_id", "start_tok", "n_chunk_toks", "head_tok")
        .as[(Long, Long, Long, Long, String)].collect()
      val byDoc = out.groupBy(_._1)
      byDoc.size == lens.size && lens.zipWithIndex.forall { case (n, id) =>
        val cs = byDoc(id.toLong).sortBy(_._2)
        val idsOk = cs.map(_._2).toSeq == (0L until cs.length)
        val cells = cs.forall { case (_, cid, st, len, head) =>
          st == cid * Stride &&
            len == math.min(Size.toLong, n - st) &&
            head == s"w$st"
        }
        val lastCovers = cs.last._3 + cs.last._4 == n.toLong
        val expectedChunks = (n - 1) / Stride + 1
        idsOk && cells && lastCovers && cs.length == expectedChunks
      }
    }

  property("every token index is inside at least one chunk window") =
    Prop.forAllNoShrink(Gen.chooseNum(1, 400)) { n =>
      import spark.implicits._
      val tokenized = Seq((0L, (0 until n).map(i => s"w$i")))
        .toDF("doc_id", "t")
      val spans = SamplingOps.chunkRows(tokenized)
        .select("start_tok", "n_chunk_toks").as[(Long, Long)].collect()
      val covered = spans.flatMap { case (st, len) => st until (st + len) }.toSet
      (0L until n.toLong).forall(covered)
    }
}
