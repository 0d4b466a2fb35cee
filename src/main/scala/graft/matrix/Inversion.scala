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
    inverseInvocations.incrementAndGet()
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

  /** Count of full-inversion invocations — lets MatrixSpec assert that
    * [[solve]] never routes through [[inverse]] (solve-by-substitution,
    * not solve-by-inverse). */
  val inverseInvocations = new java.util.concurrent.atomic.AtomicLong(0)

  /** solve(A, X) = B by TRUE blocked triangular substitution (the
    * reference's O12 TRSM semantics,
    * /root/reference/Matrix/LUDecomposition.java:410-493 — forward
    * substitution at :477-486): factor P·A = L·U once, then L·Y = P·B by
    * a forward block sweep and U·X = Y by a backward block sweep. Half
    * the flops of inverse-then-multiply and numerically stronger (no
    * explicit inverse is ever formed).
    *
    * Distributed shape (wavefront TRSM): at step k the solved block row
    * Y_k (blk×m doubles — the RHS is assumed skinny; for m ≈ n prefer
    * [[inverseFromLU]]+multiply) is broadcast, and the remaining RHS
    * rows take the rank-blk update B_i ← B_i − L_ik·Y_k as one job that
    * joins the RHS blocks with the L column panel by block row — the
    * same broadcast-the-factor insight as the reference's replication-20
    * HDFS side files (:148-150). Per sweep: q tiny base solves + q
    * panel-update jobs over B-sized data only; A-sized data is touched
    * exactly once, by the factorization. */
  def solve(sc: SparkContext, a: Blocks, b: Blocks, n: Int, m: Int, blk: Int): Blocks =
    solveFactored(sc, BlockLU.factor(sc, a, n, blk), b, m)

  /** One triangular wavefront: solve block row k against the broadcast
    * diagonal factor, push the update into the remaining rows through
    * the `panels` column k, repeat in `order`. Consumes (and
    * unpersists) `cur0`. Shared by the LU and Cholesky solves. */
  private def sweepSolve(sc: SparkContext, cur0: Blocks,
      diag: scala.collection.Map[(Int, Int), MlDM],
      panels: Blocks,
      order: Seq[Int],
      remains: (Int, Int) => Boolean,
      base: (Array[Array[Double]], Array[Array[Double]]) => Array[Array[Double]])
      : Seq[((Int, Int), MlDM)] = {
    var cur = cur0
    val solved = scala.collection.mutable.ArrayBuffer.empty[((Int, Int), MlDM)]
    for (k <- order) {
      val dkk = fromDM(diag((k, k)))
      val rowK = cur.filter { case ((i, _), _) => i == k }
        .mapValues(mb => toDM(base(dkk, fromDM(mb))))
        .collect() // bounded: one q-block panel row
      solved ++= rowK
      if (order.last != k) {
        val rowB = sc.broadcast(rowK.map { case ((_, j), mm) => (j, mm) }.toMap)
        val pan = panels
          .filter { case ((i, j2), _) => j2 == k && remains(i, k) }
          .map { case ((i, _), mm) => (i, mm) }
        val next: Blocks = cur
          .filter { case ((i, _), _) => remains(i, k) }
          .map { case ((i, j), mm) => (i, (j, mm)) }
          .join(pan)
          .map { case (i, ((j, mm), pik)) =>
            ((i, j), dmSub(mm, pik.multiply(rowB.value(j)))) }
          .persist()
        graft.Lineage.truncate(next)
        next.count()
        cur.unpersist(blocking = false)
        cur = next
      }
    }
    cur.unpersist(blocking = false)
    solved.toSeq
  }

  def solveFactored(sc: SparkContext, lu: BlockLUResult, b: Blocks, m: Int): Blocks = {
    import LocalLA.{backSolveUpper, forwardSolveUnitLower}
    val blk = lu.blk; val q = lu.n / blk
    val permsB = sc.broadcast(lu.perms)
    val lDiag = lu.l.filter { case ((i, j), _) => i == j }.collectAsMap()
    val uDiag = lu.u.filter { case ((i, j), _) => i == j }.collectAsMap()

    // P·B: the permutation is block-diagonal, so it folds in as
    // within-block row remaps — a narrow map.
    val pb: Blocks = b.map { case ((i, j), mb) =>
      ((i, j), toDM(LocalLA.permuteRows(fromDM(mb), permsB.value(i))))
    }.persist()

    // forward: L·Y = P·B (unit-lower diag solves, update rows below)
    val y = sweepSolve(sc, pb, lDiag, lu.l, 0 until q, (i, k) => i > k, forwardSolveUnitLower)
    val yR: Blocks = sc.parallelize(y, math.min(y.size.max(1), 32)).persist()
    // backward: U·X = Y (upper diag solves, update rows above)
    val x = sweepSolve(sc, yR, uDiag, lu.u, (q - 1) to 0 by -1, (i, k) => i < k, backSolveUpper)
    sc.parallelize(x, math.min(x.size.max(1), 32))
  }

  /** solve(A, B) for SPD A through the Cholesky factorization — the
    * same two-sweep wavefront as [[solveFactored]] but with ONE factor:
    * L·Y = B forward, then Lᵀ·X = Y backward (the Lᵀ panels and
    * diagonals are per-block transposes of L — a narrow map, nothing
    * re-factored). No permutation fold-in: Cholesky never pivots. */
  def solveSPD(sc: SparkContext, a: Blocks, b: Blocks, n: Int, m: Int, blk: Int): Blocks =
    solveCholFactored(sc, BlockCholesky.factor(sc, a, n, blk), b, n, blk)

  def solveCholFactored(sc: SparkContext, l: Blocks, b: Blocks, n: Int, blk: Int): Blocks = {
    import LocalLA.{backSolveUpper, forwardSolveLower, transpose}
    val q = n / blk
    val lc = l.persist()
    val lDiag = lc.filter { case ((i, j), _) => i == j }.collectAsMap()
    val ltDiag = lDiag.map { case (k, mm) => (k, toDM(transpose(fromDM(mm)))) }
    val lt: Blocks = lc.map { case ((i, j), mm) => ((j, i), toDM(transpose(fromDM(mm)))) }

    val cur0: Blocks = b.persist()
    // forward: L·Y = B (non-unit lower diag solves, update rows below)
    val y = sweepSolve(sc, cur0, lDiag, lc, 0 until q, (i, k) => i > k, forwardSolveLower)
    val yR: Blocks = sc.parallelize(y, math.min(y.size.max(1), 32)).persist()
    // backward: Lᵀ·X = Y (upper diag solves, update rows above)
    val x = sweepSolve(sc, yR, ltDiag, lt, (q - 1) to 0 by -1, (i, k) => i < k, backSolveUpper)
    lc.unpersist(blocking = false)
    sc.parallelize(x, math.min(x.size.max(1), 32))
  }
}
