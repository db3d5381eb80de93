package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** PRODUCT QUANTIZATION (Jégou, Douze, Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the missing member of the ANN
  * family next to IVF cells and int8 scalar quantization: the embedding is
  * split into M contiguous subspaces, each trained its own K-entry codebook,
  * and a vector is stored as M small codes (here 8 × 4 bits = 4 bytes per
  * 64-dim float vector, a 64× compression). Query scoring is ADC
  * (asymmetric distance computation): the query precomputes an M×K lookup
  * table of exact partial distances ONCE, then every candidate's estimated
  * distance is M table lookups — no float math per candidate at all. At
  * 100 TB this is what a real vector store serves from: the code table is
  * 4 bytes/vector where the raw corpus is 256, and the scan is
  * memory-bandwidth-bound lookups.
  *
  * Spark shapes:
  *  - training runs ALL M subspaces in the same distributed passes (the
  *    subspace fan-out is a constant M map stage, one corpus scan per Lloyd
  *    round regardless of M); codebooks are M·K·SubDim doubles — metadata
  *    tier, broadcast, never shuffled;
  *  - train-once/serve-many through the warehouse pointer commit
  *    (Tables.fixtureKey — the ivfTrainedTopK discipline);
  *  - encoding is one broadcast-join map pass; the ADC estimate is an
  *    ORDER-FIXED fold over the M partial distances (m ascending), so the
  *    DuckDB twin's list_sum(list(pd ORDER BY m)) replays it bit-for-bit.
  *
  * Numeric discipline: recenter uses the 2^48 decimal-staged integer sums
  * (trainCentroids / Clustering.recenter — overflow-safe at any corpus);
  * assignment ties break to the LOWER code id; all distances go through
  * the codegen'd vec_dist2 with the bit-identical HOF fallback. */
object Pq {

  /** Subspaces (codes per vector). */
  val M = 8
  /** Dimensions per subspace (fixture d = 64 = M · SubDim; on a wider
    * embedding the quantizer covers the first M·SubDim dims). */
  val SubDim = 8
  /** Codebook entries per subspace (4-bit codes). */
  val K = 16
  /** Lloyd rounds (deterministic: seed = the first K vectors' subvectors). */
  val Iters = 2
  /** Query sample for ADC top-k (the q_sim_topk convention). */
  val NQueries = 8

  private val S = Similarity.MeanScale

  /** (vec_id, m, sv): all M subvectors of every vector in ONE map pass —
    * the fan-out is the constant M, never a shuffle. */
  private def subvecs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), explode(expr(
        s"transform(sequence(0, ${M - 1}), m -> struct(m AS m, " +
          s"transform(slice(embedding, m * $SubDim + 1, $SubDim), " +
          s"x -> CAST(x AS DOUBLE)) AS sv))")).as("t"))
      .select(col("vec_id"), col("t.m").as("m"), col("t.sv").as("sv"))

  /** One assignment pass: per (vector, subspace) the nearest codebook entry
    * (ties → lower code id, the Clustering.assign tie-break). Extra columns
    * on `sv` (e.g. IvfPq's cell id) pass through untouched.
    * `private[llm]` so the residual quantizer (IvfPq) shares it. */
  private[llm] def assign(sv: DataFrame, books: DataFrame): DataFrame = {
    val dd = Clustering.dist2For(sv.sparkSession) _
    sv.join(broadcast(books), "m")
      .withColumn("d2", expr(dd("sv", "csv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id", "m").orderBy(col("d2"), col("code"))))
      .filter(col("rn") === 1)
  }

  /** Train the M codebooks: `Iters` Lloyd rounds over the subvector frame,
    * integer-scaled recenter, empty codes coalesce to their previous
    * centroid. Codebooks localCheckpoint per round (M·K metadata rows;
    * constant-size plans). */
  def trainBooks(s: SparkSession, dir: String): DataFrame =
    lloydBooks(subvecs(s, dir))

  /** The Lloyd loop over an ARBITRARY (vec_id, m, sv) subvector frame —
    * shared verbatim by the raw-vector quantizer (trainBooks) and the
    * residual quantizer (IvfPq.trainBooks): the two differ only in what
    * the subvectors are measured against, never in how codebooks train. */
  private[llm] def lloydBooks(sv: DataFrame): DataFrame = {
    var books = sv.filter(col("vec_id") < K)
      .select(col("m"), col("vec_id").as("code"), col("sv").as("csv"))
    for (_ <- 1 to Iters) {
      val a = assign(sv, books).select("m", "code", "sv")
      val sums = a
        .select(col("m"), col("code"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy("m", "code", "pos")
        .agg(sum((col("x") * S).cast("long")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("sm"),
          count(lit(1)).as("n"))
        .withColumn("mean", col("sm").cast("string").cast("double") /
          (col("n").cast("double") * lit(S.toDouble)))
      val upd = sums.groupBy("m", "code")
        .agg(expr("transform(array_sort(collect_list(struct(pos, mean))), " +
          "p -> p.mean)").as("csv"))
      books = books.alias("o").join(upd.alias("u"), Seq("m", "code"), "left")
        .select(col("m"), col("code"),
          coalesce(col("u.csv"), col("o.csv")).as("csv"))
        .localCheckpoint()
    }
    books
  }

  /** Published-codebook location (fixture fingerprint + every design
    * constant — the centroidTarget discipline). */
  private[graft] def pqTarget(s: SparkSession, dir: String): String = {
    val key = graft.Tables.fixtureKey(s, dir, "embeddings",
      s"pq|$M|$SubDim|$K|$Iters|$S")
    s"${sys.props("java.io.tmpdir")}/graft_ivf/pq_$key"
  }

  /** Train-once/serve-many codebooks (deterministic training — racing
    * writers publish identical bytes, last-writer-wins benign). */
  private def books(s: SparkSession, dir: String): DataFrame = {
    val target = pqTarget(s, dir)
    if (!graft.etl.Warehouse.exists(s, target))
      graft.etl.Warehouse.publish(s, target, trainBooks(s, dir))
    graft.etl.Warehouse.read(s, target).select("m", "code", "csv")
  }

  private def codesOf(s: SparkSession, dir: String): DataFrame =
    assign(subvecs(s, dir), books(s, dir)).select("vec_id", "m", "code")

  /** q_sim_pq_codes: the stored representation — M 4-bit codes per vector
    * (4 bytes where the raw vector is 256). The collect_list is bounded by
    * the constant M; the code array serializes to a canonical string (the
    * q_embed_quantize discipline — the driver's row-sort cannot order raw
    * array cells). */
  def codes(s: SparkSession, dir: String): DataFrame =
    codesOf(s, dir).groupBy("vec_id")
      .agg(expr("concat_ws(',', transform(array_sort(collect_list(" +
        "struct(m, code))), p -> CAST(p.code AS STRING)))").as("codes"))
      .orderBy("vec_id")

  /** ADC shortlist size for the exact re-rank. */
  val Shortlist = 50

  /** ADC top-k per sample query: the LUT (NQueries·M·K exact partial
    * distances) is metadata-sized and broadcast; each candidate costs M
    * lookups folded in FIXED m-ascending order (the DuckDB twin's
    * list_sum(list(pd ORDER BY m)) — bit-identical), so the per-candidate
    * work carries no float recomputation at any corpus size. The N×Q
    * estimate frame is ranked through the k-bounded `top_structs` heap
    * aggregate (Ranking.topKPerGroup; VERDICT r7 item 1) — the exchange
    * carries Q×k rows per partition, never the corpus-sized frame into Q
    * sort tasks. */
  private def adcShortlist(s: SparkSession, dir: String, k: Int): DataFrame = {
    val dd = Clustering.dist2For(s) _
    val q = subvecs(s, dir).filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("m"), col("sv").as("qsv"))
    val lut = q.join(broadcast(books(s, dir)), "m")
      .select(col("q_id"), col("m"), col("code"), expr(dd("qsv", "csv")).as("pd"))
    val est = codesOf(s, dir)
      .join(broadcast(lut), Seq("m", "code"))
      .filter(col("q_id") =!= col("vec_id"))
      .groupBy(col("q_id"), col("vec_id").as("n_id"))
      .agg(expr("aggregate(transform(array_sort(collect_list(struct(m, pd))), " +
        "p -> p.pd), 0D, (acc, x) -> acc + x)").as("est_d2"))
    Ranking.topKPerGroup(est, "q_id", "est_d2", "n_id", k, asc = true,
      "est_d2", "n_id")
  }

  /** q_sim_pq_topk: ADC top-10 per sample query. */
  def adcTopK(s: SparkSession, dir: String): DataFrame =
    adcShortlist(s, dir, 10)
      .select("q_id", "n_id", "est_d2", "rank")
      .orderBy("q_id", "rank")

  /** q_sim_pq_rerank: the production serve path — ADC shortlists
    * `Shortlist` candidates from the 4-byte codes, then ONLY those rows'
    * raw embeddings are read for an exact re-rank (PqSpec measures the
    * recall lift over raw ADC). At 100 TB the exact pass touches
    * NQueries·Shortlist vectors, never the corpus. */
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
}
