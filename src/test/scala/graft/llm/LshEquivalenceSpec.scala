package graft.llm

import graft.SparkSpec
import java.security.MessageDigest

/** Independent cross-check of the LSH collapse refactors: a from-first-
  * principles single-threaded implementation of doc-level MinHash banding,
  * Jaccard verification and SimHash chunk-LSH, compared against the
  * distributed (representative-collapsed) query output. Three-way agreement
  * — this spec, the Spark plan, and the DuckDB oracle — pins the semantics.
  */
class LshEquivalenceSpec extends SparkSpec {
  import TextHash.{A, B, K, P, Bands, Rows, SimBits}

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def tokHash(t: String): Long =
    java.lang.Long.parseLong(md5hex(t).substring(0, 15), 16)

  private lazy val docs: Seq[(Long, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  /** doc → sorted distinct mod-P hashed token set. */
  private lazy val sets: Map[Long, Vector[Long]] =
    docs.map { case (id, text) =>
      id -> text.split(" ").map(t => tokHash(t) % P).distinct.sorted.toVector
    }.toMap

  private def minhash(set: Vector[Long], i: Int): Long =
    set.map(x => (A(i) * x + B(i)) % P).min

  private def bandHashes(set: Vector[Long]): Seq[Long] =
    (0 until Bands).map { j =>
      (Rows * j until Rows * (j + 1)).map(minhash(set, _))
        .foldLeft(0L)((acc, m) => (acc * 31 + m) % P)
    }

  /** Doc-level candidates: any band hash shared (the uncollapsed def). */
  private lazy val candidates: Set[(Long, Long)] = {
    val byBand = docs.flatMap { case (id, _) =>
      bandHashes(sets(id)).zipWithIndex.map { case (bh, j) => ((j, bh), id) }
    }.groupBy(_._1).values.map(_.map(_._2).sorted)
    byBand.flatMap(ids =>
      for (i <- ids.indices; k <- i + 1 until ids.size) yield (ids(i), ids(k))).toSet
  }

  test("minhashPairs equals doc-level banding computed from first principles") {
    val got = Dedup.minhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == candidates)
  }

  test("jaccard equals candidates filtered at 0.95, with exact jac values") {
    val expected = candidates.toSeq.flatMap { case (a, b) =>
      val (sa, sb) = (sets(a), sets(b))
      val inter = sa.intersect(sb).size
      val jac = inter.toDouble / (sa.size + sb.size - inter)
      if (jac >= 0.95) Some(((a, b), jac)) else None
    }.toMap
    val got = Dedup.jaccard(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) => assert(v == expected(k), s"jac mismatch at $k") }
  }

  test("shinglePairs equals doc-level banding over char-5-gram shingle sets") {
    val shingleSets: Map[Long, Vector[Long]] = docs.map { case (id, text) =>
      val n = TextHash.ShingleLen
      val upper = math.max(text.length - (n - 1), 1)
      id -> (1 to upper).map(i =>
        tokHash(text.substring(i - 1, math.min(i - 1 + n, text.length))) % P)
        .distinct.sorted.toVector
    }.toMap
    val byBand = docs.flatMap { case (id, _) =>
      bandHashes(shingleSets(id)).zipWithIndex.map { case (bh, j) => ((j, bh), id) }
    }.groupBy(_._1).values.map(_.map(_._2).sorted)
    val expected = byBand.flatMap(ids =>
      for (i <- ids.indices; k <- i + 1 until ids.size) yield (ids(i), ids(k))).toSet
    val got = Dedup.shinglePairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("simhashPairs equals doc-level chunk LSH with hamming <= 3") {
    // simhash uses the raw 60-bit token hash (no mod-P), per Dedup.simhashSig
    val sims: Map[Long, Long] = docs.map { case (id, text) =>
      val bits = Array.fill(SimBits)(0)
      text.split(" ").distinct.map(tokHash).foreach { h =>
        (0 until SimBits).foreach(b => bits(b) += (if (((h >> b) & 1L) == 1L) 1 else -1))
      }
      id -> (0 until SimBits).map(b => if (bits(b) > 0) 1L << b else 0L).sum
    }.toMap
    val byChunk = docs.flatMap { case (id, _) =>
      (0 until 4).map(j => ((j, (sims(id) >> (15 * j)) & 32767L), id))
    }.groupBy(_._1).values.map(_.map(_._2).sorted)
    val expected = byChunk.flatMap(ids =>
      for (i <- ids.indices; k <- i + 1 until ids.size) yield (ids(i), ids(k)))
      .toSet[(Long, Long)]
      .flatMap { case (a, b) =>
        val d = java.lang.Long.bitCount(sims(a) ^ sims(b)).toLong
        if (d <= 3) Some(((a, b), d)) else None
      }.toMap
    val got = Dedup.simhashPairs(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == expected)
  }
}
