package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual-hash near-dup semantics the fixture cannot show (its media
  * payloads are all genuinely distinct — 0 pairs IS the true answer there,
  * and the probe below pins that the nearest candidate sits far above the
  * threshold): with 4 bands over 60 bits and hamming ≤ 3, the pigeonhole
  * guarantee is exact — any true pair agrees on ≥ 1 whole band, so the
  * banded join finds EVERY pair at distance ≤ PhashHamMax, no more, no
  * less. Synthetic payloads with engineered window structure prove the
  * positive cases. */
class PhashSpec extends SparkSpec {

  private val root = "/tmp/graft_phash"

  test("identical and locally-edited payloads pair; unrelated payloads do not") {
    import spark.implicits._
    // 300 chars = 5 per window × 60 windows; 'a'-blocks vs 'z'-blocks keep
    // every window mean far from the global mean, so a ONE-window edit
    // flips exactly one bit
    val half = "a" * 150 + "z" * 150
    val edited = "a" * 145 + "z" * 5 + "z" * 150 // window 29 flipped a→z
    val inverse = "z" * 150 + "a" * 150          // complement: every bit differs
    Seq((0L, half, "s"), (1L, half, "s"), (2L, edited, "s"), (3L, inverse, "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$root/documents.parquet")
    val got = Multimodal.phashPairs(spark, root).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 1L, 0L), (0L, 2L, 1L), (1L, 2L, 1L)),
      s"got $got")
  }

  test("fixture emptiness is the true answer: nearest candidate is far above threshold") {
    val bandBits = Multimodal.PhashBits / Multimodal.PhashBands
    val mask = (1L << bandBits) - 1
    val p = Multimodal.phash(Multimodal.mediaTable(spark, sf)).toDF()
    val bands = p.select(col("media_id"), col("phash"),
      explode(expr(s"transform(sequence(0, ${Multimodal.PhashBands - 1}), " +
        s"b -> struct(b AS band, shiftright(phash, b * $bandBits) & $mask AS bh))")).as("t"))
      .select(col("media_id"), col("phash"), col("t.band").as("band"), col("t.bh").as("bh"))
    val minDist = bands.alias("x").join(bands.alias("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.media_id") < col("y.media_id"))
      .agg(min(expr("bit_count(x.phash ^ y.phash)")).as("mn"))
      .collect()(0).getInt(0)
    assert(minDist > Multimodal.PhashHamMax,
      s"fixture has a true near-dup at distance $minDist — the 0-row contract no longer holds")
  }
}
