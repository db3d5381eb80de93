package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import TextHash.{tokens, tokHash}

/** Corpus-curation operators a training-data pipeline runs after dedup
  * (SURVEY.md §2.2 Group C extension): train/test decontamination,
  * deterministic stratified sampling (data mixing), and Gopher-style
  * repetition signals. All built-in expressions, all oracle-checked.
  */
object Curation {

  /** Decontamination n-gram width: 8-token shingles (public practice is
    * 8–13-token overlap between training docs and evaluation sets; 8 keeps
    * fixture hit rates meaningful — the 31-token vocabulary makes short
    * n-grams collide by chance). */
  val DecontamN = 8

  /** Every doc with doc_id ≡ 0 (mod 97) plays the "benchmark set" in the
    * fixture — a deterministic stand-in for an eval-suite table. */
  val BenchMod = 97

  /** n-gram strings over an ALREADY-TOKENIZED array column. The token array
    * must be staged in a prior projection — referencing `split(text)` here
    * would re-tokenize inside the position lambda, O(len) per n-gram
    * position (CollapseProject keeps the staged array because it is
    * referenced more than once and non-cheap). */
  private def ngrams(tCol: String, n: Int): String =
    s"""CASE WHEN size($tCol) >= $n
        THEN transform(sequence(1, size($tCol) - ${n - 1}),
               i -> concat_ws(' ', slice($tCol, i, $n)))
        ELSE array() END"""

  /** Train/test contamination check: training docs sharing ≥ 1 distinct
    * 8-token shingle with any benchmark doc, with the count of distinct
    * shared shingles. The join key is the shingle STRING — a bucket
    * equi-join (shuffle by shingle hash), never docs × docs; both sides are
    * deduped to distinct (doc, shingle) / distinct shingle before the join
    * so the exchange carries set sizes, not occurrence counts. */
  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(ngrams("t", DecontamN))).as("sh"))
      .distinct()
    val bench = d.filter(col("doc_id") % BenchMod === 0)
      .select("sh").distinct()
    val train = d.filter(col("doc_id") % BenchMod =!= 0)
    train.join(bench, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_shingles"))
      .orderBy("doc_id")
  }

  /** Deterministic per-source sampling rates (percent): the "data mixing"
    * weights of a training recipe. Keyed on the digits of the source name so
    * the rule is pure expression (no lookup table shuffle). */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    // src0–src4 → 50%, src5–src9 → 25%, src10+ → 10%
    val rate = when(regexp_extract(col("source"), "^src([0-9])$", 1) =!= "",
        when(regexp_extract(col("source"), "^src([0-9])$", 1).cast("int") < 5, 50)
          .otherwise(25))
      .otherwise(10)
    // deterministic "randomness": 60-bit md5 of source|doc_id, mod 100 —
    // stable across runs, engines and cluster sizes (no RNG, no sampleBy)
    val h = pmod(tokHash(concat_ws("|", col("source"), col("doc_id").cast("string"))), lit(100L))
    t(s, dir, "documents")
      .withColumn("sample_rate", rate.cast("long"))
      .filter(h < col("sample_rate"))
      .select("doc_id", "source", "sample_rate")
      .orderBy("doc_id")
  }

  /** Deterministic per-group sampling: the first `HeldoutPerGroup` docs per
    * language in md5-hash order — held-out / eval-set construction that is
    * reproducible across runs, engines and cluster sizes (no RNG, unlike
    * df.sampleBy whose draws are partition-order-dependent). */
  val HeldoutPerGroup = 5

  def samplePerGroup(s: SparkSession, dir: String): DataFrame = {
    val h = tokHash(concat_ws("|", lit("heldout42"), col("doc_id").cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("h"), col("doc_id"))
    t(s, dir, "documents")
      .withColumn("h", h)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= HeldoutPerGroup)
      .select("lang", "rn", "doc_id")
      .orderBy("lang", "rn")
  }

  /** Sequence packing (the LLM dataloader op): concat-and-split packing of
    * each source shard into fixed token-budget bins — doc order is doc_id
    * within source, bin = floor(preceding-token-count / budget), offset =
    * preceding-token-count mod budget. One shuffle, keyed by the shard
    * (source); at 100 TB the shard key is whatever unit a dataloader packs
    * independently, so no global window exists anywhere. */
  val PackBudget = 2048L

  def packSequences(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("tok_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr(s"tok_before div $PackBudget").as("bin_id"),
        (col("tok_before") % PackBudget).as("bin_offset"))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition signals: duplicate 2-gram / 3-gram fractions
    * per doc (1 − distinct/total) and a keep/drop flag. Pure per-row
    * expressions — no shuffle at all before the output sort. */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    def dupFrac(g: String): String =
      s"""CASE WHEN size($g) > 0 THEN
            1.0D - CAST(size(array_distinct($g)) AS DOUBLE) / CAST(size($g) AS DOUBLE)
          ELSE 0.0D END"""
    t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        expr(ngrams("t", 2)).as("g2"), expr(ngrams("t", 3)).as("g3"))
      .select(
        col("doc_id"), col("n_tokens"),
        expr(dupFrac("g2")).as("dup_2gram_frac"),
        expr(dupFrac("g3")).as("dup_3gram_frac"))
      .withColumn("label",
        when(col("dup_2gram_frac") > 0.6 || col("dup_3gram_frac") > 0.5, "drop")
          .otherwise("keep"))
      .orderBy("doc_id")
  }
}
