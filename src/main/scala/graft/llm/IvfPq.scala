package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** IVF-PQ — the COMPOSITE vector index (Jégou, Douze, Schmid, TPAMI 2011
  * §IV "IVFADC"; the layout FAISS serves billion-vector corpora from):
  * a coarse IVF quantizer routes each vector to its nearest-centroid cell,
  * and what the cell's inverted list stores is not the vector but the
  * PRODUCT-QUANTIZED RESIDUAL (vector − cell centroid). Residuals are
  * centered near zero, so the same M×K codebook budget quantizes them far
  * more finely than raw vectors — and the serve gets BOTH prunings at once:
  * the IVF probe skips (1 − nprobe/cells) of the corpus, and the scanned
  * remainder costs M table lookups per candidate (ADC), not a float dot.
  *
  * Spark shapes (all established disciplines, composed):
  *  - the coarse stage IS the published trained IVF (Similarity's
  *    centroids + hive-partitioned assignments — nothing retrains here);
  *  - residual codebooks train via the SAME Lloyd loop as raw PQ
  *    (Pq.lloydBooks) and publish through the warehouse pointer commit;
  *  - the code lists publish hive-partitioned BY CELL — the serve reads
  *    only the probed cells' directories (static partition pruning, the
  *    ivfTrainedTopK discipline) and each 64-dim float vector is 8 bytes
  *    of codes + one bigint id on disk;
  *  - the per-query work is nprobe×M×K LUT entries (residuals are
  *    CELL-RELATIVE, so the LUT is per probed cell — the IVFADC detail
  *    that distinguishes it from flat ADC) — metadata-tier, broadcast;
  *  - candidate estimates rank through the k-bounded `top_structs` heap
  *    (Ranking.topKPerGroup): Q×k rows cross the exchange, never Q×N.
  *
  * Numeric discipline — what makes a TRAINED composite oracle-checkable:
  * raw fixture components are exact on the 2^-48 grid, but a trained
  * centroid mean is not, so a naive residual would be an unordered-sum
  * artifact. The residual therefore SNAPS THE CENTROID to the 2^48 grid
  * first: r = (x·2^48 − ⌊c·2^48⌋) / 2^48. Every term is an exact BIGINT
  * (|x·2^48| < 2^53), the division is by a power of two, and IEEE floor
  * and multiply agree bit-for-bit across engines — so residuals, the
  * scaled-integer recenter sums over them, and every ADC partial distance
  * replay exactly in DuckDB. Quantization error from the snap is ≤ 2^-48
  * per component — six orders under the PQ error it feeds. */
object IvfPq {

  /** Subspace geometry and training length: identical to the flat PQ
    * (Pq.M/SubDim/K/Iters) so the two indexes' quality is comparable at
    * equal code budget — the residual's win is pure geometry. */
  val M: Int = Pq.M
  val SubDim: Int = Pq.SubDim
  val K: Int = Pq.K
  val Iters: Int = Pq.Iters
  val NQueries: Int = Pq.NQueries
  val Shortlist: Int = Pq.Shortlist

  private val S = Similarity.MeanScale

  /** Grid-snapped residual of one component (see object scaladoc). Both
    * engines evaluate the identical IEEE op sequence: double multiply,
    * floor, exact BIGINT subtract, one power-of-two division.
    * `private[graft]`: the streaming encode-add twin (StreamTwins.ivfpqAdd)
    * splices the IDENTICAL string so drained codes are bit-equal. */
  private[graft] def residSql(x: String, c: String): String =
    s"(CAST(CAST($x AS DOUBLE) * $S AS BIGINT) - " +
      s"CAST(FLOOR($c * $S) AS BIGINT)) / CAST($S AS DOUBLE)"

  /** Published trained centroids (train-once/serve-many; publishes on the
    * first call of the whole IVF family, whichever query gets there). */
  private[llm] def cents(s: SparkSession, dir: String): DataFrame = {
    val target = Similarity.centroidTarget(s, dir)
    if (!graft.etl.Warehouse.exists(s, target))
      Similarity.publishCentroids(s, dir, target)
    graft.etl.Warehouse.read(s, target).select("cent_id", "c_emb")
  }

  /** (vec_id, cent_id, m, sv): every vector's M residual subvectors against
    * its own cell's snapped centroid — one map pass over the published
    * inverted lists joined to the broadcast k×d centroid frame; the M
    * fan-out is a constant, never a shuffle. */
  private[llm] def residualSubvecs(s: SparkSession, dir: String): DataFrame =
    Similarity.publishedAssignments(s, dir)
      .join(broadcast(cents(s, dir)), "cent_id")
      .withColumn("r", expr(
        s"zip_with(embedding, c_emb, (x, c) -> ${residSql("x", "c")})"))
      .select(col("vec_id"), col("cent_id"), explode(expr(
        s"transform(sequence(0, ${M - 1}), m -> struct(m AS m, " +
          s"slice(r, m * $SubDim + 1, $SubDim) AS sv))")).as("t"))
      .select(col("vec_id"), col("cent_id"),
        col("t.m").as("m"), col("t.sv").as("sv"))

  /** Train the M RESIDUAL codebooks — Pq.lloydBooks verbatim over the
    * residual subvector frame (seed = first K vectors' residuals, scaled-
    * integer recenter, empty codes coalesce). */
  def trainBooks(s: SparkSession, dir: String): DataFrame =
    Pq.lloydBooks(residualSubvecs(s, dir).select("vec_id", "m", "sv"))

  /** Published residual-codebook location (fixture fingerprint + every
    * constant of BOTH stages — a coarse-quantizer retrain must orphan the
    * residual books too, since residuals are measured against it). */
  private[graft] def booksTarget(s: SparkSession, dir: String): String = {
    val key = graft.Tables.fixtureKey(s, dir, "embeddings",
      s"ivfpq|${Similarity.Cells}|${Similarity.TrainIters}|$M|$SubDim|$K|$Iters|$S")
    s"${sys.props("java.io.tmpdir")}/graft_ivf/ivfpq_books_$key"
  }

  private[llm] def books(s: SparkSession, dir: String): DataFrame = {
    val target = booksTarget(s, dir)
    if (!graft.etl.Warehouse.exists(s, target))
      graft.etl.Warehouse.publish(s, target, trainBooks(s, dir))
    graft.etl.Warehouse.read(s, target).select("m", "code", "csv")
  }

  /** Published CODE-LIST location: the per-cell inverted lists of
    * (vec_id, m, code) rows, hive-partitioned by cell — the disk layout
    * the serve prunes against. Keyed like booksTarget plus the list
    * marker, so a codebook retrain orphans stale lists. */
  private[graft] def codesTarget(s: SparkSession, dir: String): String = {
    val key = graft.Tables.fixtureKey(s, dir, "embeddings",
      s"ivfpqcodes|${Similarity.Cells}|${Similarity.TrainIters}|$M|$SubDim|$K|$Iters|$S")
    s"${sys.props("java.io.tmpdir")}/graft_ivf/ivfpq_codes_$key"
  }

  /** The IVF-PQ index body: every vector's M residual codes in its cell's
    * partition directory. Build = one assignment pass of the residual
    * subvectors against the broadcast books; publish-once through the
    * atomic pointer (deterministic build — racing writers publish
    * identical bytes). */
  private[graft] def publishedCodes(s: SparkSession, dir: String): DataFrame = {
    val target = codesTarget(s, dir)
    if (!graft.etl.Warehouse.exists(s, target)) {
      val cd = Pq.assign(residualSubvecs(s, dir), books(s, dir))
        .select("vec_id", "m", "code", "cent_id")
      graft.etl.Warehouse.publishPartitioned(s, target, cd, "cent_id")
    }
    // partition-column inference reads dir names as int — restore long
    graft.etl.Warehouse.read(s, target).select(col("vec_id"), col("m"),
      col("code"), col("cent_id").cast("long").as("cent_id"))
  }

  /** ADC shortlist per sample query. The LUT is PER PROBED CELL (query
    * residual re-expressed against each probed centroid): NQueries × NProbe
    * × M × K exact partial distances — 4096 doubles at the fixture tier,
    * broadcast. Candidates come ONLY from the probed cells' partition
    * directories (the literal IN below is what becomes PartitionFilters);
    * each candidate costs M lookups folded in fixed m-ascending order (the
    * DuckDB twin's list_sum(list(pd ORDER BY m)) — bit-identical). */
  private def adcShortlist(s: SparkSession, dir: String, k: Int): DataFrame =
    Ranking.topKPerGroup(estimates(s, dir).select("q_id", "n_id", "est_d2"),
      "q_id", "est_d2", "n_id", k, asc = true, "est_d2", "n_id")

  /** Every probed-cell candidate's ADC estimate, computed ONCE, carrying
    * its cell's probe rank (crn) — the shared pass behind the fixed-nprobe
    * serves AND the operating-curve sweep (a curve point is a crn filter
    * over this frame, never a re-scan of the code lists). */
  private def estimates(s: SparkSession, dir: String): DataFrame = {
    // The probe frame below is capped at crn <= NProbe (probeCells'
    // contract, shared with the trained IVF serve, the streaming routing
    // twin, and this file's DuckDB twin CTEs). The sweep fans curve points
    // over SweepProbes from this SAME frame, so a sweep probe budget beyond
    // NProbe would silently reuse NProbe-capped candidates — and the twin
    // carries the identical cap, so the oracle would CONFIRM the wrong
    // curve (ADVICE r8). Fail loudly at the exact coupling instead: to
    // widen the curve, raise NProbe (or rank probes to SweepProbes.max
    // here AND in the twin's vprob CTE together).
    require(Similarity.SweepProbes.max <= Similarity.NProbe,
      s"SweepProbes max ${Similarity.SweepProbes.max} exceeds NProbe " +
        s"${Similarity.NProbe}: estimates() only carries NProbe-deep probes")
    val dd = Clustering.dist2For(s) _
    val probes = Similarity.probeCells(s, dir).select("q_id", "crn", "cent_id")
    val q = t(s, dir, "embeddings").filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val qres = probes.join(broadcast(q), "q_id")
      .join(broadcast(cents(s, dir)), "cent_id")
      .withColumn("qr", expr(
        s"zip_with(embedding, c_emb, (x, c) -> ${residSql("x", "c")})"))
      .select(col("q_id"), col("crn"), col("cent_id"), explode(expr(
        s"transform(sequence(0, ${M - 1}), m -> struct(m AS m, " +
          s"slice(qr, m * $SubDim + 1, $SubDim) AS qsv))")).as("t"))
      .select(col("q_id"), col("crn"), col("cent_id"),
        col("t.m").as("m"), col("t.qsv").as("qsv"))
    val lut = qres.join(broadcast(books(s, dir)), "m")
      .select(col("q_id"), col("crn"), col("cent_id"), col("m"), col("code"),
        expr(dd("qsv", "csv")).as("pd"))
    // probed cell ids: ≤ min(cells, Q·nprobe) longs — metadata tier
    val cellIds = probes.select("cent_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    publishedCodes(s, dir)
      .filter(col("cent_id").isInCollection(cellIds))
      .join(broadcast(lut), Seq("cent_id", "m", "code"))
      .filter(col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id"), col("vec_id").as("n_id"))
      .agg(expr("aggregate(transform(array_sort(collect_list(struct(m, pd))), " +
        "p -> p.pd), 0D, (acc, x) -> acc + x)").as("est_d2"),
        // a candidate lives in exactly one cell, so min is THE probe rank
        min(col("crn")).as("crn"))
  }

  /** q_sim_ivfpq: IVFADC top-10 per sample query — cell-pruned scan of the
    * published code lists, ADC estimates, heap ranking. */
  def adcTopK(s: SparkSession, dir: String): DataFrame =
    adcShortlist(s, dir, 10)
      .select("q_id", "n_id", "est_d2", "rank")
      .orderBy("q_id", "rank")

  /** q_sim_ivfpq_rerank: the production serve — ADC shortlists `Shortlist`
    * candidates from the cell-pruned code lists, then ONLY those rows' raw
    * embeddings are fetched for the exact euclidean re-rank. At 100 TB the
    * exact pass touches NQueries·Shortlist vectors, never the corpus; the
    * re-rank window runs over ≤ Q·Shortlist rows. */
  def rerankTopK(s: SparkSession, dir: String): DataFrame = {
    val dd = Clustering.dist2For(s) _
    val e = t(s, dir, "embeddings")
    adcShortlist(s, dir, Shortlist)
      .select("q_id", "n_id")
      .join(e.select(col("vec_id").as("n_id"), col("embedding").as("ne")), "n_id")
      .join(broadcast(e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))), "q_id")
      .withColumn("d2", expr(dd("qe", "ne")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("d2"), col("n_id")))
        .cast("long"))
      .filter(col("rank") <= 10)
      .select("q_id", "n_id", "d2", "rank")
      .orderBy("q_id", "rank")
  }

  /** q_sim_ivfpq_sweep: the recall@10-vs-nprobe OPERATING CURVE for the
    * COMPOSITE's production serve (ADC shortlist + exact re-rank at each
    * probe budget) — the number a deployment publishes for the index it
    * actually runs, next to the plain-IVF curve (q_sim_ivf_sweep). All
    * curve points share ONE pruned code-list read and ONE ADC estimate
    * pass: each candidate's estimate carries its cell's probe rank, so a
    * point is a crn filter + per-(nprobe, query) heap shortlist + the
    * Q·|curve|·Shortlist exact re-rank — audit cost independent of corpus
    * size (the q_sim_recall posture). Integer hit counts, one IEEE
    * division per row — oracle-hashable. */
  def sweep(s: SparkSession, dir: String): DataFrame = {
    val dd = Clustering.dist2For(s) _
    import s.implicits._
    val np = Similarity.SweepProbes.map(_.toLong).toDF("nprobe")
    val fanned = estimates(s, dir).crossJoin(broadcast(np))
      .filter(col("crn") <= col("nprobe"))
      // group key packs (nprobe, q_id): q_id < 8 << 1024, no collision
      .withColumn("gk", col("nprobe") * lit(1024L) + col("q_id"))
      .select("gk", "n_id", "est_d2")
    val short = Ranking.topKPerGroup(fanned, "gk", "est_d2", "n_id",
        Shortlist, asc = true, "est_d2", "n_id")
      .select(expr("gk div 1024").as("nprobe"), expr("gk % 1024").as("q_id"),
        col("n_id"))
    val e = t(s, dir, "embeddings")
    val reranked = short
      .join(e.select(col("vec_id").as("n_id"), col("embedding").as("ne")), "n_id")
      .join(broadcast(e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))), "q_id")
      .withColumn("d2", expr(dd("qe", "ne")))
      .withColumn("rn", row_number().over(Window
        .partitionBy("nprobe", "q_id").orderBy(col("d2"), col("n_id"))))
      .filter(col("rn") <= 10)
      .select(col("nprobe"), col("q_id"), col("n_id"), lit(1L).as("hit"))
    Rankings.exactL2(s, dir).select("q_id", "n_id")
      .crossJoin(broadcast(np))
      .join(reranked, Seq("nprobe", "q_id", "n_id"), "left")
      .groupBy("nprobe")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("n_exact").cast("double"))
      .orderBy("nprobe")
  }

  // ———— composite maintenance: freeze coarse AND books, encode-add ————

  /** Published location of the maintenance books (trained on BASE
    * residuals only — frozen before the late batch arrives). */
  private[graft] def upBooksTarget(s: SparkSession, dir: String): String = {
    val key = graft.Tables.fixtureKey(s, dir, "embeddings",
      s"ivfpqup_books|${IvfMaintenance.BaseFrac}|${Similarity.Cells}|${Similarity.TrainIters}|$M|$SubDim|$K|$Iters|$S")
    s"${sys.props("java.io.tmpdir")}/graft_ivf/ivfpqup_books_$key"
  }

  /** Snapshot ROOT for the composite's code lists: base and delta codes
    * are MEMBERS of one multi-table snapshot (the IvfMaintenance listsRoot
    * discipline) so compaction can fold the delta and retire it in ONE
    * pointer swap. */
  private[graft] def upListsRoot(s: SparkSession, dir: String): String = {
    val key = graft.Tables.fixtureKey(s, dir, "embeddings",
      s"ivfpqup_lists|${IvfMaintenance.BaseFrac}|${Similarity.Cells}|${Similarity.TrainIters}|$M|$SubDim|$K|$Iters|$S")
    s"${sys.props("java.io.tmpdir")}/graft_ivf/ivfpqup_lists_$key"
  }

  /** Residual subvectors of EVERY vector against the FROZEN base-trained
    * coarse stage: the snapshot's full membership (cell ids from the
    * IvfMaintenance lists — base assignment and the O(batch) adds alike)
    * joined to the broadcast frozen centroids, grid-snap residuals, M-way
    * split. One map pass. */
  private def upResidualSubvecs(s: SparkSession, dir: String): DataFrame = {
    val cut = IvfMaintenance.baseCut(s, dir)
    IvfMaintenance.allLists(s, dir)
      .join(broadcast(IvfMaintenance.cents(s, dir, cut)
        .select(col("cent_id"), col("c_emb"))), "cent_id")
      .withColumn("r", expr(
        s"zip_with(embedding, c_emb, (x, c) -> ${residSql("x", "c")})"))
      .select(col("vec_id"), col("cent_id"), explode(expr(
        s"transform(sequence(0, ${M - 1}), m -> struct(m AS m, " +
          s"slice(r, m * $SubDim + 1, $SubDim) AS sv))")).as("t"))
      .select(col("vec_id"), col("cent_id"),
        col("t.m").as("m"), col("t.sv").as("sv"))
  }

  /** Books trained on the BASE slice's residuals only (Pq.lloydBooks over
    * the filtered frame — the freeze), published once. */
  private def upBooks(s: SparkSession, dir: String): DataFrame = {
    val target = upBooksTarget(s, dir)
    if (!graft.etl.Warehouse.exists(s, target)) {
      val cut = IvfMaintenance.baseCut(s, dir)
      graft.etl.Warehouse.publish(s, target, Pq.lloydBooks(
        upResidualSubvecs(s, dir).filter(col("vec_id") < cut)
          .select("vec_id", "m", "sv")))
    }
    graft.etl.Warehouse.read(s, target).select("m", "code", "csv")
  }

  /** One frozen-book encode pass over an id slice — the shared build of
    * the base code lists (pred = < cut) and the encode-add (pred = >= cut;
    * the slice predicate pushes through the residual map to the list
    * scan, so the add's plan touches ONLY the new rows — the
    * IvfMaintenance.assignSlice discipline at the code tier). */
  private def upCodesSlice(s: SparkSession, dir: String,
                           newRows: Boolean): DataFrame = {
    val cut = IvfMaintenance.baseCut(s, dir)
    val sv = upResidualSubvecs(s, dir)
      .filter(if (newRows) col("vec_id") >= cut else col("vec_id") < cut)
    Pq.assign(sv, upBooks(s, dir)).select("vec_id", "m", "code", "cent_id")
  }

  /** The current code-list snapshot (publishing the initial {base, delta}
    * pair on first call — one atomic commit covering both members, each
    * hive-partitioned by cell). */
  private[graft] def currentUpCodes(s: SparkSession, dir: String): Map[String, String] = {
    val root = upListsRoot(s, dir)
    graft.etl.Warehouse.readSnapshot(s, root).getOrElse {
      graft.etl.Warehouse.publishSnapshot(s, root, Seq(
        "base" -> upCodesSlice(s, dir, newRows = false),
        "delta" -> upCodesSlice(s, dir, newRows = true)),
        Some("cent_id"))
    }
  }

  /** Union of every member the RESOLVED snapshot lists — a file-level
    * concatenation of per-cell partitioned tables; after compaction this
    * is one table. */
  private def upCodesOf(s: SparkSession, dir: String,
                        snap: Map[String, String]): DataFrame = {
    val root = upListsRoot(s, dir)
    snap.toSeq.sortBy(_._1)
      .map { case (m, v) => graft.etl.Warehouse.readSnapshotMember(s, root, m, v) }
      .reduce(_ unionByName _)
      .select(col("vec_id"), col("m"), col("code"),
        col("cent_id").cast("long").as("cent_id"))
  }

  /** Per-cell code lists for EVERY vector — the late batch's codes are one
    * assignment map pass against the FROZEN books (the encode-add: no
    * retrain anywhere; the delta member of the list snapshot, exactly the
    * IvfMaintenance discipline). */
  private[graft] def upPublishedCodes(s: SparkSession, dir: String): DataFrame =
    upCodesOf(s, dir, currentUpCodes(s, dir))

  /** COMPACTION — the composite's rebuild-cycle half (VERDICT r8 item 4):
    * fold the delta code lists into a fresh base version and retire the
    * delta member with ONE snapshot-pointer swap. Books are FROZEN, so the
    * fold is file-level — no re-encode, same code rows, one partitioned
    * table — and the serve is bit-identical before/after with exactly one
    * cell-pruned scan after (IvfPqCompactionSpec pins both). */
  def compactCodes(s: SparkSession, dir: String): Map[String, String] = {
    val merged = upCodesOf(s, dir, currentUpCodes(s, dir))
    graft.etl.Warehouse.publishSnapshot(s, upListsRoot(s, dir),
      Seq("base" -> merged), Some("cent_id"))
  }

  /** q_sim_ivfpq_upsert: the COMPOSITE's post-add serve — IVFADC top-10
    * over base ∪ late codes where BOTH stages froze before the late
    * quarter arrived (coarse centroids on the base corpus, residual books
    * on the base residuals); `is_new` flags late vectors served from codes
    * no training ever saw. The composite's add is two map passes per batch
    * (assign cell, encode residual) — the full maintenance symmetry with
    * q_sim_ivf_upsert at the composite's 8-bytes-per-vector scan cost. */
  def upsertAdcTopK(s: SparkSession, dir: String): DataFrame = {
    val cut = IvfMaintenance.baseCut(s, dir)
    Ranking.topKPerGroup(upsertEst(s, dir), "q_id", "est_d2", "n_id", 10,
        asc = true, "est_d2", "n_id")
      .withColumn("is_new", when(col("n_id") >= cut, 1L).otherwise(0L))
      .select("q_id", "n_id", "est_d2", "rank", "is_new")
      .orderBy("q_id", "rank")
  }

  /** q_sim_ivfpq_upsert_rerank: the composite's PRODUCTION freshness
    * serve (r12) — the freshness rank audit measured the ADC-only upsert
    * serve at mean nDCG ~0.36 vs ~0.89 for the reranked base family: the
    * frozen books' quantization error dominates exactly on the late
    * vectors no training saw. The monitor→response answer is the same
    * rerank stage the base family serves: ADC shortlists `Shortlist`
    * candidates from base ∪ delta codes, ONLY those rows' raw embeddings
    * are fetched for the exact euclidean re-rank (Q·Shortlist vectors at
    * any corpus size), `is_new` flags late neighbors. */
  def upsertRerankTopK(s: SparkSession, dir: String): DataFrame = {
    val dd = Clustering.dist2For(s) _
    val cut = IvfMaintenance.baseCut(s, dir)
    val e = t(s, dir, "embeddings")
    Ranking.topKPerGroup(upsertEst(s, dir), "q_id", "est_d2", "n_id",
        Shortlist, asc = true, "est_d2", "n_id")
      .select("q_id", "n_id")
      .join(e.select(col("vec_id").as("n_id"), col("embedding").as("ne")), "n_id")
      .join(broadcast(e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("qe"))), "q_id")
      .withColumn("d2", expr(dd("qe", "ne")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("d2"), col("n_id")))
        .cast("long"))
      .filter(col("rank") <= 10)
      .withColumn("is_new", when(col("n_id") >= cut, 1L).otherwise(0L))
      .select("q_id", "n_id", "d2", "rank", "is_new")
      .orderBy("q_id", "rank")
  }

  /** The shared base ∪ delta ADC estimate frame (frozen two-stage
    * quantizer) — the serve unit upsertAdcTopK ranks to 10 and the
    * production rerank shortlists. */
  private def upsertEst(s: SparkSession, dir: String): DataFrame = {
    val dd = Clustering.dist2For(s) _
    val cut = IvfMaintenance.baseCut(s, dir)
    val cs = IvfMaintenance.cents(s, dir, cut).select("cent_id", "c_emb")
    val e = t(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id"), col("embedding"),
        expr(Similarity.normFor(s)("embedding")).as("nrm"))
    val probes = Similarity.rankAgainst(q, cs)
      .filter(col("crn") <= Similarity.NProbe)
      .select(col("vec_id").as("q_id"), col("cent_id"))
    val qres = probes
      .join(broadcast(q.select(col("vec_id").as("q_id"), col("embedding"))), "q_id")
      .join(broadcast(cs), "cent_id")
      .withColumn("qr", expr(
        s"zip_with(embedding, c_emb, (x, c) -> ${residSql("x", "c")})"))
      .select(col("q_id"), col("cent_id"), explode(expr(
        s"transform(sequence(0, ${M - 1}), m -> struct(m AS m, " +
          s"slice(qr, m * $SubDim + 1, $SubDim) AS qsv))")).as("t"))
      .select(col("q_id"), col("cent_id"),
        col("t.m").as("m"), col("t.qsv").as("qsv"))
    val lut = qres.join(broadcast(upBooks(s, dir)), "m")
      .select(col("q_id"), col("cent_id"), col("m"), col("code"),
        expr(dd("qsv", "csv")).as("pd"))
    val cellIds = probes.select("cent_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    val est = upPublishedCodes(s, dir)
      .filter(col("cent_id").isInCollection(cellIds))
      .join(broadcast(lut), Seq("cent_id", "m", "code"))
      .filter(col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id"), col("vec_id").as("n_id"))
      .agg(expr("aggregate(transform(array_sort(collect_list(struct(m, pd))), " +
        "p -> p.pd), 0D, (acc, x) -> acc + x)").as("est_d2"))
    est
  }

  /** q_sim_ivfpq_drift: the COMPOSITE's STALENESS MONITOR — how well the
    * frozen two-stage quantizer (base-trained coarse centroids AND
    * base-trained residual books) still fits each segment, measured as the
    * per-vector mean ADC reconstruction error: Σ_m d²(subvector residual,
    * assigned codeword). That is exactly the quantization error the serve's
    * distance estimates inherit (Jégou et al. TPAMI 2011 §III — ADC error
    * is bounded by the quantization error), so a widening base→late gap
    * reads directly as "late vectors rank on noisier estimates"; the
    * republish trigger for BOTH frozen stages, same contract as
    * q_index_drift (coarse fit) but one level deeper. Numeric discipline:
    * each (vector, subspace) error floor-quantizes at 2^-48 so the
    * cross-row sum is order-free integer math (the q_sim_binary_drift
    * form). Cost: one pass over the published code lists joined to the
    * broadcast books + the residual map — O(corpus codes), 2-row output;
    * a deployment runs the late-segment half per batch. */
  def drift(s: SparkSession, dir: String): DataFrame = {
    val dd = Clustering.dist2For(s) _
    val cut = IvfMaintenance.baseCut(s, dir)
    val qe = upResidualSubvecs(s, dir)
      .join(upPublishedCodes(s, dir).select("vec_id", "m", "code"),
        Seq("vec_id", "m"))
      .join(broadcast(upBooks(s, dir)), Seq("m", "code"))
      .select(col("vec_id"), expr(
        s"CAST(FLOOR(${dd("sv", "csv")} * $S.0) AS BIGINT)").as("sqe"))
    qe.groupBy(when(col("vec_id") >= cut, lit("late")).otherwise(lit("base"))
        .as("segment"))
      .agg(countDistinct(col("vec_id")).as("n"),
        (sum(col("sqe").cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("string").cast("double") /
          (countDistinct(col("vec_id")).cast("double") * lit(S.toDouble)))
          .as("mean_qerr"))
      .orderBy("segment")
  }

  /** Exact euclidean brute-force top-10 — the ground-truth side of the
    * recall audit (the PQ family measures in L2, so its audit anchors to
    * the L2 exact set, not the cosine one q_sim_recall uses). Broadcast
    * queries, heap ranking — the bruteTopK shape. */
  private[llm] def bruteL2TopK(s: SparkSession, dir: String): DataFrame = {
    val dd = Clustering.dist2For(s) _
    val e = t(s, dir, "embeddings").select("vec_id", "embedding")
    val qq = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val cands = e.join(broadcast(qq), col("vec_id") =!= col("q_id"))
      .withColumn("d2", expr(dd("qe", "embedding")))
      .select("q_id", "vec_id", "d2")
    Ranking.topKPerGroup(cands, "q_id", "d2", "vec_id", 10, asc = true,
      "d2", "n_id")
  }

  /** q_sim_ivfpq_recall: the serve-quality audit for the composite — the
    * re-ranked IVFADC top-10 measured against the exact L2 top-10 per
    * query (integer hit counts, one IEEE division — hash-checkable, the
    * q_sim_recall posture: index drift fails the driver gate). */
  def recallAudit(s: SparkSession, dir: String): DataFrame = {
    val exact = Rankings.exactL2(s, dir).select("q_id", "n_id")
    val approx = Rankings.ivfpq(s, dir)
      .select(col("q_id").as("a_q"), col("n_id").as("a_n"), lit(1L).as("hit"))
    exact.join(approx,
        col("q_id") === col("a_q") && col("n_id") === col("a_n"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("n_exact").cast("double"))
      .orderBy("q_id")
  }

  /** Serve-version salts for the published ivfpq rankings (VERDICT r12
    * item 3): the composite's coarse + book + shortlist constants ride in
    * the key — see Similarity's salts for the contract. */
  private[llm] def bruteL2ServeV: String = "exactl2v1|q8|k10"
  private[llm] def rerankServeV: String =
    s"ivfpq1|${Similarity.Cells}|${Similarity.NProbe}|$M|$SubDim|$K|$Iters|$Shortlist|$S"
  private[llm] def upsertRerankServeV: String =
    s"$rerankServeV|up|${IvfMaintenance.BaseFrac}"

}
