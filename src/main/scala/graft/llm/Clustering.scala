package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Distributed EUCLIDEAN k-means over the embedding corpus — the clustering
  * stage a training-data pipeline uses for domain discovery and semantic
  * mix balancing (cluster → inspect → reweight). Complements the spherical
  * form inside Similarity.trainCentroids (which exists to build an IVF
  * index) by declaring the assignment itself as the product.
  *
  * Shape, built for 100 TB:
  *   - centroids are DIMENSION-TIER state (k·d doubles — 4 KB here, ~1 MB
  *     at k=4096·d=1024) and BROADCAST each round, exactly like pagerank's
  *     rank state and the IVF centroids;
  *   - each Lloyd round is ONE pass over the corpus: vectors meet the
  *     broadcast centroid table in a nested-loop broadcast join (k rows per
  *     vector, never pairwise in N), the argmin is a per-vec window over
  *     that map-side stream, and the recenter is a (cluster, dim)-keyed
  *     aggregate whose domain is k·d — work is O(N·d·k), shuffles are
  *     domain-keyed, nothing is driver-side;
  *   - iteration count is FIXED (2 Lloyd rounds) so the declared query is
  *     deterministic and oracle-expressible; production would loop the same
  *     stages to convergence with a localCheckpoint per round (the
  *     trainCentroids/pagerank discipline).
  *
  * Exactness discipline (everything the DuckDB oracle hash-checks) — the
  * same three tools the similarity family proved out:
  *   - squared distances are SEQUENTIAL left-to-right double folds over the
  *     dims (the vec_dot/list_sum twin pair) — both engines run the
  *     identical IEEE op sequence, so the argmin is bit-safe; never a
  *     decimal cast of a full-mantissa double (scale-10 rounding of an
  *     irrational-ish value is a cross-engine coin flip, measured: 1 flip
  *     in ~500k casts);
  *   - centroid means use the 2^48 integer-scaling trick
  *     (Similarity.MeanScale): float-backed inputs times a power of two are
  *     EXACT integers, so the per-dim sum is integer-exact and the mean is
  *     one IEEE division;
  *   - per-cluster mean distance quantizes d2 at 2^-48 by an explicit
  *     floor — Spark's double→long truncation and DuckDB's
  *     CAST(floor(...)) are then the same exact integer;
  *   - argmin ties break on the lower cluster id (row_number, total order);
  *   - empty clusters keep their previous centroid (left-join coalesce,
  *     the trainCentroids rule).
  *
  * Init is deterministic: centroid j = the embedding of vec_id j (stable
  * fixture ids). k-means++ would sample — fine in production, unverifiable
  * against a SQL oracle.
  */
object Clustering {

  val K = 8
  val Iters = 2
  private val S = Similarity.MeanScale // 2^48: float×S is an exact integer

  /** Sequential (left-to-right) squared-euclidean fold — the dist² twin of
    * Similarity.hofDotSql; DuckDB's list_sum comprehension runs the same
    * op order. The codegen'd vec_dist2 (graft.functions.VecDist2) emits the
    * identical op sequence in a tight primitive loop; the HOF form is the
    * bit-identical fallback on foreign sessions (FallbackSpec). */
  private def dist2Sql(x: String, c: String): String =
    s"aggregate(zip_with($x, $c, (a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), 0D, (acc, v) -> acc + v)"

  private[graft] def dist2For(s: SparkSession)(x: String, c: String): String =
    if (s.catalog.functionExists("vec_dist2")) s"vec_dist2($x, $c)"
    else dist2Sql(x, c)

  /** One Lloyd assignment pass: k broadcast centroid rows per vector,
    * argmin by a per-vec window (ties → lower cluster id).
    * `private[graft]` so ScaleBench can time the pass at synthetic N×. */
  private[graft] def assign(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("d2",
        expr(dist2For(e.sparkSession)("embedding", "c_emb")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d2"), col("cluster"))))
      .filter(col("rn") === 1)
      .select("vec_id", "embedding", "cluster", "d2")

  /** Element-wise mean per surviving cluster (integer-scaled exact sums;
    * k·d-bounded reassembly), empty clusters keeping `prev`'s centroid.
    *
    * Overflow posture (found by ScaleBench at 512 k synthetic vectors, NOT
    * by the fixture): the per-row scaled long is exact, but a LONG sum of
    * them overflows at ~4 M rows/cluster and a LONG `n·2^48` denominator
    * at just 32 768 — so the sum stages into DECIMAL(38,0) (exact at any
    * n) and the denominator multiplies in DOUBLE (n·2^48 is exactly
    * representable for any n < 2^53). Values are bit-identical to the
    * long forms wherever those didn't overflow: both numerator paths are
    * correctly-rounded to double, and the denominator is exact either
    * way. */
  private[graft] def recenter(assigned: DataFrame, prev: DataFrame): DataFrame = {
    val upd = assigned
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("cluster", "pos")
      .agg(sum((col("x").cast("double") * S).cast("long")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("sm"),
        count(lit(1)).as("n"))
      .withColumn("mean",
        col("sm").cast("string").cast("double") /
          (col("n").cast("double") * lit(S.toDouble)))
      .groupBy("cluster")
      .agg(collect_list(struct(col("pos"), col("mean"))).as("pm"))
      .select(col("cluster"),
        expr("transform(array_sort(pm), p -> p.mean)").as("c_emb"))
    prev.alias("p").join(upd.alias("u"), Seq("cluster"), "left")
      .select(col("cluster"),
        coalesce(col("u.c_emb"), col("p.c_emb")).as("c_emb"))
  }

  /** `Iters` fixed Lloyd rounds from the deterministic seed centroids;
    * returns (final centroids, final assignment). */
  private def trained(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = t(s, dir, "embeddings").select("vec_id", "embedding")
    var cents = e.filter(col("vec_id") < K)
      .select(col("vec_id").as("cluster"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("c_emb"))
    var assigned = assign(e, cents)
    for (_ <- 2 to Iters) {
      cents = recenter(assigned, cents)
      assigned = assign(e, cents)
    }
    (cents, assigned)
  }

  private def rounds(s: SparkSession, dir: String): DataFrame =
    trained(s, dir)._2

  /** The same two Lloyd rounds over a caller-supplied (vec_id, embedding)
    * frame, seeded by the K SMALLEST ids present — the deployment-real
    * seed rule for corpora whose id space has holes (post-dedup kept
    * sets); on the full fixture it picks ids 0..K-1, identical to the
    * declared queries' literal filter. Used by EmbeddingPipeline's
    * semantic-balance stage. */
  private[graft] def roundsOf(e0: DataFrame): DataFrame = {
    val e = e0.select("vec_id", "embedding")
    var cents = e.orderBy("vec_id").limit(K)
      .select(col("vec_id").as("cluster"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("c_emb"))
    var assigned = assign(e, cents)
    for (_ <- 2 to Iters) {
      cents = recenter(assigned, cents)
      assigned = assign(e, cents)
    }
    assigned
  }

  /** The per-cluster balance aggregation over an assignment frame (shared
    * by q_cluster_sizes and the pipeline stage). */
  private[graft] def sizesOf(assigned: DataFrame): DataFrame =
    assigned
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        (sum((col("d2") * S).cast("long")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("string").cast("double") /
          (count(lit(1)).cast("double") * lit(S.toDouble))).as("mean_dist2"))
      .orderBy("cluster")

  /** Published-centroid location for a corpus dir, keyed by every training
    * constant AND the fixture-file fingerprint (Tables.fixtureKey — a
    * parameter change or a rewritten fixture can never serve stale
    * centroids, which would silently break the serve-equals-train
    * equivalence the oracle check depends on). */
  private[graft] def clusterTarget(s: SparkSession, dir: String): String = {
    val key = graft.Tables.fixtureKey(s, dir, "embeddings", s"$K|$Iters|$S")
    s"${sys.props("java.io.tmpdir")}/graft_kmeans/centroids_$key"
  }

  /** q_cluster_assign — the SERVE face of k-means, train-once/serve-many:
    * the first call for a corpus runs the Lloyd rounds and PUBLISHES the
    * final centroids through the warehouse pointer commit (deterministic
    * training, so racing writers publish identical bytes and
    * last-writer-wins is benign); every later call — bench reps 2+, other
    * sessions, the streaming router — assigns against the published
    * version with ZERO training in the plan. Output is identical to
    * q_cluster_kmeans (same centroids, same argmin), which is exactly the
    * point: the oracle hash-matching both queries proves serve ≡ train. */
  def assignPublished(s: SparkSession, dir: String): DataFrame = {
    val target = clusterTarget(s, dir)
    if (!graft.etl.Warehouse.exists(s, target))
      graft.etl.Warehouse.publish(s, target, trained(s, dir)._1)
    val cents = graft.etl.Warehouse.read(s, target).select("cluster", "c_emb")
    val e = t(s, dir, "embeddings").select("vec_id", "embedding")
    assign(e, cents)
      .select(col("vec_id"), col("cluster"), col("d2").as("dist2"))
      .orderBy("vec_id")
  }

  /** q_cluster_kmeans: the per-vector cluster assignment after two Lloyd
    * rounds, with the squared distance to the winning centroid. */
  def kmeans(s: SparkSession, dir: String): DataFrame =
    rounds(s, dir)
      .select(col("vec_id"), col("cluster"), col("d2").as("dist2"))
      .orderBy("vec_id")

  /** q_cluster_sizes: per-cluster population + mean squared distance
    * (inertia/n, quantized at 2^-48 so the cross-member sum is
    * order-free integer math) — the balance report a curation pipeline
    * reads before reweighting the semantic mix. */
  def kmeansSizes(s: SparkSession, dir: String): DataFrame =
    sizesOf(rounds(s, dir))
}
