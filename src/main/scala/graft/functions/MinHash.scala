package graft.functions

import jdk.incubator.vector.{LongVector, VectorOperators, VectorSpecies}

/** SIMD MinHash kernel: K Carter-Wegman permutations hᵢ = (aᵢ·h + bᵢ)
  * mod (2³¹−1) evaluated `lanes` at a time with the JDK Vector API
  * (the same incubator module that powers netlib's VectorBLAS in the
  * matrix path — 8 long lanes on AVX-512).
  *
  * Why 2³¹−1 and not the scalar path's 2⁶¹−1: lane-wise 64-bit
  * multiplication yields only the LOW 64 bits, so exactness demands
  * operands < 2³¹ (product < 2⁶², no overflow). The Mersenne mod is
  * two shift-add folds + one conditional subtract — no division, same
  * trick as the scalar kernel. The narrower hash space means distinct
  * grams collide with p ≈ |grams|²/2³² per document (~1e-3 at 2k
  * grams) — harmless: a collision merges two shingles, nudging one
  * minimum, and the exact verify stage decides every pair anyway.
  */
object MinHash {
  /** Mersenne prime 2³¹−1. */
  val P: Long = (1L << 31) - 1

  private val SP: VectorSpecies[java.lang.Long] = LongVector.SPECIES_PREFERRED

  /** x mod P for 0 ≤ x < 2⁶³. */
  def modP(x: Long): Long = {
    val t = (x & P) + (x >>> 31)
    val u = (t & P) + (t >>> 31)
    if (u >= P) u - P else u
  }

  /** (a·b) mod P for a, b < 2³¹. */
  def mulModP(a: Long, b: Long): Long = modP(a * b)

  /** Per-document streaming sketch: K running minima over the gram-hash
    * stream, updated one hash at a time across all K permutations in
    * K/lanes vector registers. Reuse across documents via [[reset]];
    * NOT thread-safe (one instance per partition iterator). */
  final class Sketch(mulA: Array[Long], addB: Array[Long]) {
    private val k = mulA.length
    private val lanes = SP.length()
    require(k % lanes == 0, s"K=$k must be a multiple of vector lanes=$lanes")
    private val nV = k / lanes
    private val aV = Array.tabulate(nV)(i => LongVector.fromArray(SP, mulA, i * lanes))
    private val bV = Array.tabulate(nV)(i => LongVector.fromArray(SP, addB, i * lanes))
    private val pV = LongVector.broadcast(SP, P)
    private val minV = new Array[LongVector](nV)

    def reset(): Unit = {
      var i = 0
      while (i < nV) { minV(i) = LongVector.broadcast(SP, Long.MaxValue); i += 1 }
    }

    /** Fold one gram hash (< 2³¹) into all K minima. */
    def absorb(h: Long): Unit = {
      val hv = LongVector.broadcast(SP, h)
      var i = 0
      while (i < nV) {
        val prod = aV(i).mul(hv).add(bV(i))                       // < 2⁶² + 2³¹
        val t = prod.and(pV).add(prod.lanewise(VectorOperators.LSHR, 31))
        var u = t.and(pV).add(t.lanewise(VectorOperators.LSHR, 31))
        u = u.blend(u.sub(pV), u.compare(VectorOperators.GE, pV))
        minV(i) = minV(i).min(u)
        i += 1
      }
    }

    /** Write the K minima into `out` (length ≥ K). */
    def mins(out: Array[Long]): Unit = {
      var i = 0
      while (i < nV) { minV(i).intoArray(out, i * lanes); i += 1 }
    }
  }
}
