package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.matrix._

/** Property-based invariants for the linear-algebra core (SURVEY.md §5):
  * randomized sizes/seeds, driver-local (the distributed path reuses
  * these kernels block-wise and is pinned by MatrixSpec + MatrixQueries).
  *
  * Invariants (§0 of SURVEY.md, verified against the reference's
  * semantics): L·U == A[indx,:] after ludcmp; A·A⁻¹ == I for
  * well-conditioned A; triangular inverses satisfy T·T⁻¹ == I;
  * fromRows/toLocal block partition round-trips losslessly.
  */
class MatrixPropertySpec extends AnyFunSuite {

  /** Deterministic randomized sweep (the offline cache has no
    * scalatest-scalacheck bridge): 40 (size, seed) cases per property,
    * sizes 1..48 including the degenerate 1x1. */
  private def forAllCases(f: (Int, Long) => Unit): Unit = {
    val rng = new scala.util.Random(0xC0FFEE)
    (0 until 40).foreach { _ => f(1 + rng.nextInt(48), rng.nextLong().abs % 1000000L) }
    f(1, 7L)
  }

  private def identity(n: Int) =
    Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

  test("property: ludcmp row-permutation invariant L·U == A[indx,:]") {
    forAllCases { (n, seed) =>
      val a = MatrixGen.local(n, n, seed)
      val packed = a.map(_.clone())
      val indx = LocalLA.ludcmp(packed)
      val (l, u) = LocalLA.splitLU(packed)
      val resid = LocalLA.maxAbsDiff(LocalLA.gemm(l, u), LocalLA.permuteRows(a, indx))
      assert(resid < 1e-8 * math.max(n, 1))
      assert(indx.sorted.sameElements(Array.tabulate(n)(i => i))) // a permutation
    }
  }

  test("property: inverse residual for diagonally-dominant A") {
    forAllCases { (n, seed) =>
      val a = MatrixGen.local(n, n, seed, diagBoost = n.toDouble)
      val packed = a.map(_.clone())
      val indx = LocalLA.ludcmp(packed)
      val (l, u) = LocalLA.splitLU(packed)
      // A⁻¹[:, indx] = U⁻¹·L⁻¹ (SURVEY.md §0 verified identity)
      val uiLi = LocalLA.gemm(LocalLA.invUpper(u), LocalLA.invUnitLower(l))
      val ainv = Array.ofDim[Double](n, n)
      for (i <- 0 until n; j <- 0 until n) ainv(i)(indx(j)) = uiLi(i)(j)
      val resid = LocalLA.maxAbsDiff(LocalLA.gemm(a, ainv), identity(n))
      assert(resid < 1e-7 * math.max(n, 1))
    }
  }

  test("property: triangular inverses satisfy T·T⁻¹ == I") {
    forAllCases { (n, seed) =>
      val a = MatrixGen.local(n, n, seed, diagBoost = 2.0 * n)
      val packed = a.map(_.clone()); LocalLA.ludcmp(packed)
      val (l, u) = LocalLA.splitLU(packed)
      assert(LocalLA.maxAbsDiff(LocalLA.gemm(l, LocalLA.invUnitLower(l)), identity(n)) < 1e-8 * math.max(n, 1))
      assert(LocalLA.maxAbsDiff(LocalLA.gemm(u, LocalLA.invUpper(u)), identity(n)) < 1e-7 * math.max(n, 1))
    }
  }

  test("property: block partition round-trip fromRows → toLocal is lossless") {
    val spark = SparkTest.session
    Seq((1, 11L), (2, 22L), (4, 44L)).foreach { case (q, seed) =>
      val blk = 16; val n = q * blk
      val a = MatrixGen.local(n, blk, seed)
      val rows = spark.sparkContext.parallelize(
        a.indices.map(i => (i.toLong, a(i))), 4)
      val back = BlockModel.toLocal(BlockModel.fromRows(rows, n, blk), n, n, blk)
      assert(LocalLA.maxAbsDiff(a, back) == 0.0) // bit-identical, no float ops
    }
  }
}
