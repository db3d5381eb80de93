package graft.multimodal

import graft.SparkSpec

/** The multimodal plumbing is real even though the codec is a stub:
  * schema, partition-wise decode, determinism, downstream column ops. */
class MultimodalSpec extends SparkSpec {

  test("media table carries binary payloads with cycling kinds") {
    val m = Multimodal.mediaTable(spark, sf)
    assert(m.count() == 500)
    val kinds = m.toDF().select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
    val r = m.filter(_.media_id == 0).head()
    assert(r.payload.nonEmpty)
  }

  test("decode is deterministic and preserves row count across partitionings") {
    val m = Multimodal.mediaTable(spark, sf)
    val d1 = Multimodal.decode(m).collect().map(d => d.media_id -> (d.width, d.height, d.n_frames)).toMap
    val d2 = Multimodal.decode(m.repartition(7)).collect().map(d => d.media_id -> (d.width, d.height, d.n_frames)).toMap
    assert(d1 == d2) // partition layout must not change results
    assert(d1.size == 500)
    val feats = Multimodal.decode(m).filter(_.media_id == 1).head().features
    assert(feats.length == 8 && feats.forall(f => f >= 0f && f <= 1f))
  }

  test("resize clamps the longer side and keeps aspect") {
    val d = Multimodal.decode(Multimodal.mediaTable(spark, sf))
    val r = Multimodal.resize(d, 64)
    val bad = r.filter("out_width > 64 OR out_height > 64").count()
    assert(bad == 0)
    assert(r.filter("out_width < 1 OR out_height < 1").count() == 0)
  }

  test("frame sampling explodes only videos at the stride") {
    val d = Multimodal.decode(Multimodal.mediaTable(spark, sf))
    val fsam = Multimodal.sampleFrames(d, 10)
    val perMedia = fsam.groupBy("media_id").count().collect()
    assert(perMedia.nonEmpty)
    val one = fsam.filter("media_id = 2").collect() // doc_id 2 → video
    val nf = one.head.getInt(1)
    assert(one.length == (nf + 9) / 10)
    assert(one.map(_.getInt(2)).forall(_ % 10 == 0))
  }
}
