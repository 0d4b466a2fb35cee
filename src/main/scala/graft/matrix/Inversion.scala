package graft.matrix

import org.apache.spark.SparkContext
import org.apache.spark.mllib.linalg.{DenseMatrix => MlDM}
import BlockModel._
import LocalLA.{fromDM, toDM, invUnitLower, invUpper => localInvUpper}

/** Distributed triangular inversion (operator O17,
  * /root/reference/Matrix/LUInverse.java:88-167) and the full
  * A⁻¹ = U⁻¹·L⁻¹·P pipeline (O18, :169-389).
  *
  * The reference back-substitutes strided column sets per task; here the
  * inversion is the recursive block identity
  *
  *   [[L1, 0 ], [L2, L3]]⁻¹ = [[L1⁻¹, 0], [−L3⁻¹·L2·L1⁻¹, L3⁻¹]]
  *   [[U1, U2], [0,  U3]]⁻¹ = [[U1⁻¹, −U1⁻¹·U2·U3⁻¹], [0, U3⁻¹]]
  *
  * — driver recursion of depth log₂(q) over lazy RDD views (quadrant =
  * narrow block-index filter, the zero-copy partitioning the reference's
  * manifests emulate), with `BlockMatrix.multiply` doing the distributed
  * GEMM. Base case inverts all diagonal blocks in one distributed map —
  * no per-leaf driver collect, so the recursion stays fully distributed
  * at any q (SURVEY.md §7 step 6).
  */
object Inversion {

  /** Inverse of a unit-lower block-triangular matrix (q×q blocks). */
  def invLower(l: Blocks, q: Int, blk: Int): Blocks =
    if (q == 1) l.mapValues(m => toDM(invUnitLower(fromDM(m))))
    else {
      val mid = q / 2
      val l1 = l.filter { case ((i, j), _) => i < mid && j < mid }
      val l2 = shift(l.filter { case ((i, j), _) => i >= mid && j < mid }, -mid, 0)
      val l3 = shift(l.filter { case ((i, j), _) => i >= mid && j >= mid }, -mid, -mid)
      val inv1 = invLower(l1, mid, blk)
      val inv3 = invLower(l3, q - mid, blk)
      val n1 = mid.toLong * blk; val n3 = (q - mid).toLong * blk
      val t = multiply(inv3, l2, blk, n3, n3, n1)
      val x = multiply(t, inv1, blk, n3, n1, n1).mapValues(dmNeg)
      inv1.union(shift(x, mid, 0)).union(shift(inv3, mid, mid))
    }

  /** Inverse of an upper block-triangular matrix (q×q blocks). */
  def invUpper(u: Blocks, q: Int, blk: Int): Blocks =
    if (q == 1) u.mapValues(m => toDM(localInvUpper(fromDM(m))))
    else {
      val mid = q / 2
      val u1 = u.filter { case ((i, j), _) => i < mid && j < mid }
      val u2 = shift(u.filter { case ((i, j), _) => i < mid && j >= mid }, 0, -mid)
      val u3 = shift(u.filter { case ((i, j), _) => i >= mid && j >= mid }, -mid, -mid)
      val inv1 = invUpper(u1, mid, blk)
      val inv3 = invUpper(u3, q - mid, blk)
      val n1 = mid.toLong * blk; val n3 = (q - mid).toLong * blk
      val t = multiply(inv1, u2, blk, n1, n1, n3)
      val x = multiply(t, inv3, blk, n1, n3, n3).mapValues(dmNeg)
      inv1.union(shift(x, 0, mid)).union(shift(inv3, mid, mid))
    }

  /** Full inverse: factor, invert both triangles, multiply, fold the
    * block-diagonal permutation in as within-block column remaps
    * (verified identity A⁻¹[:, indx] = U⁻¹·L⁻¹ — SURVEY.md §0). */
  def inverse(sc: SparkContext, a: Blocks, n: Int, blk: Int): Blocks = {
    val lu = BlockLU.factor(sc, a, n, blk)
    inverseFromLU(sc, lu)
  }

  def inverseFromLU(sc: SparkContext, lu: BlockLUResult): Blocks = {
    val q = lu.n / lu.blk
    val linv = invLower(lu.l, q, lu.blk)
    val uinv = invUpper(lu.u, q, lu.blk)
    val prod = multiply(uinv, linv, lu.blk, lu.n.toLong, lu.n.toLong, lu.n.toLong)
    val permsB = sc.broadcast(lu.perms)
    prod.map { case ((i, k), m) =>
      val d = toDense(m)
      val out = new Array[Double](d.values.length)
      val indx = permsB.value(k)
      var c = 0
      while (c < d.numCols) {
        System.arraycopy(d.values, c * d.numRows, out, indx(c) * d.numRows, d.numRows)
        c += 1
      }
      ((i, k), new MlDM(d.numRows, d.numCols, out))
    }
  }

  /** Inverse for ARBITRARY n (not a block multiple) over a row
    * representation: pad to `[[A, 0], [0, I]]` (identity corner keeps
    * the factorization well-defined), invert, slice the top-left back
    * out. The padding adds ≤ blk−1 rows — negligible at any scale. */
  def inverseAny(sc: SparkContext, rows: org.apache.spark.rdd.RDD[(Long, Array[Double])],
                 n: Int, blk: Int): org.apache.spark.rdd.RDD[(Long, Array[Double])] = {
    val np = ((n + blk - 1) / blk) * blk
    val inv = inverse(sc, fromRowsPadded(rows, n, blk), np, blk)
    toRows(inv, np, blk)
      .filter(_._1 < n)
      .mapValues(v => java.util.Arrays.copyOf(v, n))
  }

  /** solve(A, X) = B: X = A⁻¹·B (M5 — composition of the TRSM primitive,
    * SURVEY.md §2.3). B is n×m in blocks of the same blk. */
  def solve(sc: SparkContext, a: Blocks, b: Blocks, n: Int, m: Int, blk: Int): Blocks = {
    val ainv = inverse(sc, a, n, blk)
    multiply(ainv, b, blk, n.toLong, n.toLong, m.toLong)
  }
}
