package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d74 — the MATERIALIZED vector index: the d61/d46 store composition
  * applied to ANN. A production index trains once per corpus snapshot —
  * the d73 build (IVF cells + PQ codebooks + code words) is the
  * expensive half, the query is cheap — so the publisher job WAP-
  * publishes FOUR relations per corpus and every search consumes the
  * published parquet:
  *
  *   - `cells`     (vec_id, cid)       — the inverted file,
  *   - `codes`     (vec_id, m, code)   — m one-byte-domain code words
  *                                       per vector (the PQ compression),
  *   - `codebook`  (m, code, pos, c)   — the reconstruction vectors,
  *   - `centroids` (cid, cv)           — the k coarse IVF centroids
  *                                       (what ranks cells for
  *                                       nprobe > 1; k rows, broadcast-
  *                                       sized at any corpus scale).
  *
  * Raw vectors are deliberately NOT in the store (PQ's point is that
  * the index never duplicates them); a query fetches them from the
  * embeddings table only for its own rows and the exact-re-rank
  * shortlist. Each table promotes through the f09 write/audit/promote
  * gate under a per-corpus lock; `spark.graft.shareVectorIndex` (off =
  * re-derive per query) is the same knob discipline as
  * sharePairStore/shareKmeansLabels, with byte-identity spec-pinned.
  * At 100 TB the three tables live bucketed (cells/codes on vec_id,
  * codebook broadcast-sized) under a transactional catalog commit; the
  * composition is unchanged. */
object VectorIndexStore {
  private lazy val root: String = {
    val p = java.nio.file.Files.createTempDirectory("graft-vindexstore").toFile
    org.apache.commons.io.FileUtils.forceDeleteOnExit(p)
    p.toString
  }
  private val built = scala.collection.concurrent.TrieMap.empty[String, String]
  // the recorded audit manifest of a completed publish (16 rows —
  // planner-sized): a RE-RUN of the publisher for an already-live
  // corpus snapshot serves this instead of retraining (see [[publish]])
  private val manifestCache = scala.collection.concurrent.TrieMap
    .empty[String, (org.apache.spark.sql.types.StructType,
      Array[org.apache.spark.sql.Row])]
  // monotone per-corpus publish version (round 18): bumps on every
  // completed FRESH publish, so per-JVM caches derived FROM the store
  // (EmbeddingOps.clonedCells) key on the publish they were built
  // from instead of the mutable corpus path — a forced rebuild (or a
  // future path-reuse) invalidates them automatically
  private val versionsM = scala.collection.concurrent.TrieMap.empty[String, Long]
  private val locks = scala.collection.concurrent.TrieMap.empty[String, Object]
  private def lockFor(d: String): Object = locks.getOrElseUpdate(d, new Object)

  /** The current publish version of corpus `d`'s index (0 = never
    * published this JVM). */
  private[graft] def version(d: String): Long = versionsM.getOrElse(d, 0L)

  // collision-resistant key: a 32-bit hashCode collision between two
  // corpus dirs in one JVM would silently serve one corpus the other's
  // index — md5 of the full path can't collide in practice
  private def baseFor(d: String): String =
    s"$root/${org.apache.commons.codec.digest.DigestUtils.md5Hex(d)}"

  private val IndexTables = Seq(
    ("cells", Seq("vec_id")),
    ("codes", Seq("vec_id")),
    ("codebook", Seq("m", "code", "pos")),
    ("centroids", Seq("cid")))

  /** d74 — the publisher job: run the full d73 index build, WAP-publish
    * all four relations, return the unioned audit manifests (tbl,
    * check_name, observed, ok). The code table is stored PACKED — one
    * row per vector with its m code words as an m-position array
    * (position = sub-space), which is the m-codes-per-vector layout the
    * 100 TB story claims (a production table narrows the element type
    * to one byte after a dense code remap; the fixture's seed-id codes
    * are already 0..kPq−1); [[relations]] unpacks with one posexplode.
    * Row-count invariants the oracle rides on: cells is a PARTITION of
    * the corpus (n rows), packed codes is n rows, codebook is
    * m·kPq·sw = 1024 rows (iff no PQ cluster is empty), centroids is
    * k = 10 rows (iff no IVF cell is empty) — the conditionals are
    * fixture properties LlmOpsSpec pins per sf (the d73 precondition
    * style). */
  def publish(s: SparkSession, d: String): DataFrame = lockFor(d).synchronized {
    // IDEMPOTENT RE-RUN (round 17): a production index trains once per
    // corpus SNAPSHOT — re-invoking the publisher while that snapshot's
    // store is live must be a no-op, not a full retrain (the WAP
    // marker-skip discipline at publisher grain). The recorded manifest
    // IS the completed publish's audit (byte-identical rows — spec-
    // pinned), so serve it; the one-corpus-per-path-per-JVM assumption
    // is the store-wide one documented at EmbeddingOps.clonedCells.
    // spark.graft.forceRebuildStores (round 18): the cold-build
    // measurement hook — MiniBench --rebuild sets it so the publish
    // path (the round-16 hotspot) keeps regression cover even though
    // the production re-run is a no-op probe
    val force = s.conf.get("spark.graft.forceRebuildStores", "false").toBoolean
    manifestCache.get(d).filter(_ => built.contains(d) && !force) match {
      case Some((schema, rows)) =>
        s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      case None => publishFresh(s, d)
    }
  }

  private def publishFresh(s: SparkSession, d: String): DataFrame = {
    val (cells, codes, cb, cent) = EmbeddingOps.pqIndexRelations(s, d)
    // pack: array position = sub-space index (sorted struct collect)
    val packed = codes.groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        x => x.getField("code")).as("codes"))
    val rels = Map("cells" -> cells, "codes" -> packed, "codebook" -> cb,
      "centroids" -> cent)
    val manifests = IndexTables.map { case (name, keyCols) =>
      val df = rels(name)
      Sources.writeAuditPublishStaged(s, df,
        s"${baseFor(d)}/$name", keyCols, false, None)
        .select(lit(name).as("tbl"), col("check_name"), col("observed"),
          col("ok"))
    }
    val manifest = manifests.reduce(_.unionByName(_)).orderBy("tbl", "check_name")
    // collect once (16 rows): decides allOk AND becomes the cached
    // manifest a re-run serves
    val rows = manifest.collect()
    val okIdx = manifest.schema.fieldIndex("ok")
    val checkIdx = manifest.schema.fieldIndex("check_name")
    // a malformed manifest with NO published_rows rows must never read
    // as vacuously ok (round-17 ADVICE — the pre-refactor min(ok).head
    // threw on an empty set; this asserts the stronger invariant:
    // exactly one read-back proof per published table)
    val pubRows = rows.filter(_.getString(checkIdx) == "published_rows")
    require(pubRows.length == IndexTables.size,
      s"vector-index publish manifest for $d carries ${pubRows.length} " +
        s"published_rows checks, expected ${IndexTables.size} " +
        "(one per table) — malformed audit, refusing to mark the store built")
    val allOk = pubRows.forall(_.getBoolean(okIdx))
    if (allOk) {
      built(d) = baseFor(d)
      manifestCache(d) = (manifest.schema, rows)
      versionsM(d) = versionsM.getOrElse(d, 0L) + 1
    }
    s.createDataFrame(java.util.Arrays.asList(rows: _*), manifest.schema)
  }

  /** Read-side accessor: publish-if-absent, then four plain parquet
    * scans — column pruning reaches each relation independently; the
    * packed code array unpacks with one posexplode back to the
    * (vec_id, m, code) shape the search joins on. */
  private[graft] def relations(s: SparkSession,
      d: String): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val base = built.getOrElse(d, lockFor(d).synchronized {
      built.getOrElse(d, {
        publish(s, d)
        built.getOrElse(d, throw new IllegalStateException(
          s"vector-index publish for $d failed its WAP audit — no tables"))
      })
    })
    val codes = s.read.parquet(s"$base/codes/published")
      .select(col("vec_id"), posexplode(col("codes")))
      .toDF("vec_id", "m", "code")
    (s.read.parquet(s"$base/cells/published"), codes,
      s.read.parquet(s"$base/codebook/published"),
      s.read.parquet(s"$base/centroids/published"))
  }
}
