package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic properties of the perceptual hash — pure-function tests, no
  * Spark needed (phashOf is the exact function the mapPartitions stage
  * applies per row). ScalaCheck generators driven with fixed seeds (the
  * scalatest/scalacheck bridge isn't in the offline cache — the UpsertSpec
  * pattern). */
class PhashPropSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.apply(Gen.Parameters.default, Seed(7L + i)).get)

  private val payload: Gen[Array[Byte]] =
    Gen.choose(60, 600).flatMap(n =>
      Gen.listOfN(n, Gen.choose(32, 126)).map(_.map(_.toByte).toArray))

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("hash is a pure function: same bytes, same hash") {
    samples(payload, 20).foreach { p =>
      assert(Multimodal.phashOf(p) == Multimodal.phashOf(p.clone()))
    }
  }

  test("only PhashBits low bits are ever set") {
    samples(payload, 20).foreach { p =>
      assert((Multimodal.phashOf(p) >>> Multimodal.PhashBits) == 0L)
    }
  }

  test("a sum-preserving swap INSIDE one window leaves the hash unchanged") {
    // the bit rule only reads window sums, so permuting bytes within a
    // window is invisible — the mean-hash locality a real aHash has too
    samples(payload, 20).foreach { p =>
      val n = p.length
      val b = Multimodal.PhashBits
      // pick window 10's span; swap its first two bytes if it has >= 2
      val st = (10L * n / b).toInt
      val en = (11L * n / b).toInt
      if (en - st >= 2) {
        val q = p.clone()
        val t = q(st); q(st) = q(st + 1); q(st + 1) = t
        assert(Multimodal.phashOf(q) == Multimodal.phashOf(p))
      }
    }
  }

  test("an edit confined to one window moves few bits (locality)") {
    // changing one window's bytes changes that window's sum and the global
    // sum; windows whose margin |ws·n − total·wl| exceeds the global-sum
    // shift cannot flip. With block-structured payloads (margins huge) the
    // distance is exactly the edited windows — the near-dup property
    // q_multimodal_dedup's threshold rides on. Random payloads sit near
    // the mean, so assert a loose bound there instead of exactness.
    samples(payload, 20).foreach { p =>
      val n = p.length
      val b = Multimodal.PhashBits
      val st = (20L * n / b).toInt
      val en = (21L * n / b).toInt
      if (en > st) {
        val q = p.clone()
        (st until en).foreach(i => q(i) = 126.toByte)
        val d = ham(Multimodal.phashOf(p), Multimodal.phashOf(q))
        // the edit shifts the global mean by < (126·wl)/n per byte — far
        // too small to flip a majority of windows; locality means the
        // distance stays well under half the bits
        assert(d <= b / 2, s"one-window edit moved $d of $b bits")
      }
    }
  }

  test("block-structured payloads: one flipped block is exactly one bit") {
    val b = Multimodal.PhashBits
    val base = (Array.fill(150)('a'.toByte) ++ Array.fill(150)('z'.toByte))
    val edit = base.clone()
    // window 29 spans bytes [145, 150) at n=300 — all 'a'; flip to 'z'
    (145 until 150).foreach(i => edit(i) = 'z'.toByte)
    assert(ham(Multimodal.phashOf(base), Multimodal.phashOf(edit)) == 1)
    assert((0 until b).forall { i =>
      val w = (i.toLong * 300 / b).toInt
      w >= 0 // structural sanity; windows are 5 bytes each at this n
    })
  }
}
