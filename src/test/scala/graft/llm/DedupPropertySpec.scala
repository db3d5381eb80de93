package graft.llm

import graft.SparkSpec
import java.security.MessageDigest

/** Randomized first-principles check of the dedup pipelines on GENERATED
  * corpora (duplicate-heavy, tiny vocabulary — the shapes that stress the
  * collapse machinery hardest), complementing the fixture-bound
  * LshEquivalenceSpec. Each seed builds a corpus, writes it as parquet, and
  * compares the distributed output to a single-threaded reference. */
class DedupPropertySpec extends SparkSpec {
  import TextHash.{A, B, K, P, Bands, Rows}

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def tokHash(t: String): Long =
    java.lang.Long.parseLong(md5hex(t).substring(0, 15), 16)

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")

  private def corpus(seed: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val base = (0 until 40).map(_ =>
      (1 to (3 + rnd.nextInt(8))).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    // duplicate-heavy: each base text appears 1–6 times, with some shuffles
    base.zipWithIndex.flatMap { case (text, i) =>
      val copies = 1 + rnd.nextInt(6)
      (0 until copies).map { c =>
        val t = if (c > 0 && rnd.nextBoolean())
          rnd.shuffle(text.split(" ").toSeq).mkString(" ") else text
        t
      }
    }.zipWithIndex.map { case (t, id) => (id.toLong, t) }
  }

  private def bandHashes(set: Vector[Long]): Seq[Long] =
    (0 until Bands).map { j =>
      (Rows * j until Rows * (j + 1))
        .map(i => set.map(x => (A(i) * x + B(i)) % P).min)
        .foldLeft(0L)((acc, m) => (acc * 31 + m) % P)
    }

  for (seed <- Seq(1L, 7L, 42L)) test(s"generated corpus seed=$seed: pairs, clusters, near all match reference") {
    val docs = corpus(seed)
    val dir = java.nio.file.Files.createTempDirectory(s"graft_prop_$seed").toString
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")

    val sets: Map[Long, Vector[Long]] = docs.map { case (id, t) =>
      id -> t.split(" ").map(w => tokHash(w) % P).distinct.sorted.toVector
    }.toMap

    // reference pairs: doc-level banding
    val byBand = docs.flatMap { case (id, _) =>
      bandHashes(sets(id)).zipWithIndex.map { case (bh, j) => ((j, bh), id) }
    }.groupBy(_._1).values.map(_.map(_._2).sorted)
    val wantPairs = byBand.flatMap(ids =>
      for (i <- ids.indices; k <- i + 1 until ids.size) yield (ids(i), ids(k))).toSet
    val gotPairs = Dedup.minhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPairs == wantPairs)

    // reference clusters: identical hashed-token sets → min-id rep
    val wantClusters = docs.groupBy { case (id, _) => sets(id) }.values.flatMap { grp =>
      val rep = grp.map(_._1).min
      grp.map { case (id, _) => (id, rep, grp.size.toLong) }
    }.toSet
    val gotClusters = Dedup.clusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotClusters == wantClusters)

    // reference near: canonical sorted-distinct-token string groups
    val wantNear = docs.groupBy { case (_, t) =>
      t.toLowerCase.split(" ").distinct.sorted.mkString(" ")
    }.values.map(grp => (grp.map(_._1).min, grp.size.toLong)).toSet
    val gotNear = Dedup.near(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotNear == wantNear)
  }
}
