package graft.matrix

import org.apache.spark.SparkContext
import org.apache.spark.rdd.RDD

/** Tall-skinny (m ≫ d) dense factorizations — the shape every
  * embedding/feature table takes at pipeline scale (10⁸⁺ rows × a few
  * hundred columns), which the reference's square-block recursion
  * (/root/reference/Matrix/LUDecomposition.java:680-709) never covers.
  *
  * TSQR (communication-avoiding QR, Demmel et al. 2008): each partition
  * QR-factors its own row block and keeps only the d×d R; R factors are
  * then pairwise stacked and re-factored up a reduction tree. A is read
  * ONCE, nothing is shuffled — the only cross-executor traffic is
  * O(log p) d×d triangles — so the plan is identical at 32 rows or
  * 10⁹: the classic 100 TB factorization for least squares, QR-based
  * orthogonalization, and randomized-SVD range finding.
  *
  * Numerically, QR-based least squares beats [[BlockGram]]-style normal
  * equations (M11): κ(AᵀA) = κ(A)², so the normal-equations path loses
  * twice the digits on ill-conditioned input, while Householder QR is
  * backward stable in κ(A).
  */
object TallSkinny {

  /** Seeded tall m×d generator (d ≤ blk), same per-block derivation as
    * [[MatrixGen]] so the matrix is deterministic and never driver-
    * materialized: row i takes the first d entries of row (i % blk) of
    * block (i/blk, 0). */
  def tallRows(sc: SparkContext, m: Int, d: Int, blk: Int,
               seed: Long): RDD[(Long, Array[Double])] = {
    require(m % blk == 0 && d <= blk)
    val q = m / blk
    sc.parallelize(0 until q, math.min(q, 32)).flatMap { bi =>
      val b = MatrixGen.localBlock(blk, seed, bi, 0, 0.0)
      (0 until blk).map { iLoc =>
        ((bi.toLong * blk + iLoc), b(iLoc).take(d)) // local: Array.take inside a partition iterator
      }
    }
  }

  /** Distributed R factor of the thin QR of A (rows as (rowId, values)),
    * sign-canonicalized so the result is the unique positive-diagonal R
    * regardless of partitioning or reduction order (up to roundoff).
    * One pass over A; treeReduce moves only d×d triangles. */
  def tsqrR(rows: RDD[(Long, Array[Double])], d: Int): Array[Array[Double]] = {
    val partR = rows.mapPartitions { it =>
      val block = it.map(_._2).toArray
      if (block.isEmpty) Iterator.empty
      else Iterator(LocalLA.qrR(block))
    }
    val r = partR.treeReduce((r1, r2) => LocalLA.qrR(r1 ++ r2), depth = 2)
    // This checks ROW COUNT (m < d gives a trapezoid), not numerical
    // rank: true rank deficiency yields a d×d R with ~zero diagonal —
    // detect it with [[diagRank]] and route through [[lstsqAuto]].
    require(r.length == d, s"fewer rows than columns: ${r.length} < $d")
    LocalLA.canonUpper(r)
  }

  /** Numerical rank estimate from R's diagonal: |R(i,i)| decays to ~0
    * exactly on the deficient directions (for QR without pivoting this
    * is a heuristic, but a reliable one for the collinear-feature case
    * — an exactly duplicated column zeroes the corresponding pivot). */
  def diagRank(r: Array[Array[Double]], tol: Double = 1e-10): Int = {
    val dmax = r.indices.map(i => math.abs(r(i)(i))).max
    if (dmax == 0.0) 0 else r.indices.count(i => math.abs(r(i)(i)) > tol * dmax)
  }

  /** Ridge-regularized least squares (AᵀA + λ·s²·I)·x = Aᵀb — the
    * graceful-degradation path for rank-deficient / collinear input
    * where the pure QR solve divides by a ~zero pivot. AᵀA = RᵀR comes
    * FREE from the TSQR R (no second pass over A); Aᵀb is one narrow
    * pass (d-double partials up a tree, same shape as [[lstsqQR]]'s
    * Qᵀb); the (d×d) SPD solve happens on the driver. λ is scaled by
    * s² = max|R(i,i)|² so the regularization is relative to the data's
    * scale, making the solution the standard ridge estimate with
    * dimensionless λ. */
  def lstsqRidge(rowsWithB: RDD[(Array[Double], Double)],
                 r: Array[Array[Double]], d: Int, lambda: Double): Array[Double] = {
    val atb = rowsWithB.mapPartitions { it =>
      val acc = new Array[Double](d)
      it.foreach { case (row, bi) =>
        var j = 0
        while (j < d) { acc(j) += row(j) * bi; j += 1 }
      }
      Iterator(acc)
    }.treeReduce({ (x, y) =>
      var j = 0
      while (j < d) { x(j) += y(j); j += 1 }
      x
    }, depth = 2)
    val g = LocalLA.gemm(LocalLA.transpose(r), r)
    val s2 = {
      val dmax = r.indices.map(i => math.abs(r(i)(i))).max
      dmax * dmax
    }
    var i = 0
    while (i < d) { g(i)(i) += lambda * s2; i += 1 }
    val l = LocalLA.cholesky(g)
    LocalLA.backSolveUpper(LocalLA.transpose(l),
      LocalLA.forwardSolveLower(l, atb.map(Array(_)))).map(_(0))
  }

  /** Rank-revealing least squares: the QR fast path when R is
    * numerically full-rank, the ridge fallback otherwise — so collinear
    * features degrade to a well-defined regularized solution instead of
    * a division by a ~zero pivot. Returns (x, fullRank). */
  def lstsqAuto(rowsWithB: RDD[(Array[Double], Double)],
                r: Array[Array[Double]], d: Int,
                lambda: Double = 1e-8,
                tol: Double = 1e-10): (Array[Double], Boolean) = {
    if (diagRank(r, tol) == d) (lstsqQR(rowsWithB, r, d), true)
    else (lstsqRidge(rowsWithB, r, d, lambda), false)
  }

  /** Q = A·R⁻¹, row-parallel: R (d×d) rides a broadcast, each row of Q
    * is one triangular solve against it — a narrow map, no shuffle.
    * With the canonical R this is the unique thin Q with positive-
    * diagonal R. */
  def qOf(rows: RDD[(Long, Array[Double])],
          r: Array[Array[Double]]): RDD[(Long, Array[Double])] = {
    val rB = rows.sparkContext.broadcast(r)
    rows.mapValues(v => LocalLA.solveXU(Array(v), rB.value)(0))
  }

  /** Gᵀ·G partial-sum of a row set: Σᵢ vᵢvᵢᵀ as a d×d array — the
    * one-pass Gram used for the orthonormality and RᵀR invariants. */
  def gram(rows: RDD[(Long, Array[Double])], d: Int): Array[Array[Double]] = {
    rows.mapPartitions { it =>
      val g = Array.ofDim[Double](d, d)
      it.foreach { case (_, v) =>
        var i = 0
        while (i < d) {
          val gi = g(i); val vi = v(i)
          var j = 0
          while (j < d) { gi(j) += vi * v(j); j += 1 }
          i += 1
        }
      }
      Iterator(g)
    }.treeReduce({ (a, b) =>
      var i = 0
      while (i < d) {
        val ai = a(i); val bi = b(i)
        var j = 0
        while (j < d) { ai(j) += bi(j); j += 1 }
        i += 1
      }
      a
    }, depth = 2)
  }

  /** Least squares min‖A·x − b‖₂ through the QR path: x = R⁻¹·(Qᵀb).
    * `rowsWithB` carries each row of A zipped with its b entry, so Qᵀb
    * accumulates in the SAME narrow pass that forms Q's rows (one
    * d-vector partial per partition, treeReduce of d doubles — no
    * shuffle, no join). The numerically-stable twin of M11's normal
    * equations: κ(AᵀA) = κ(A)², QR never squares the condition. */
  def lstsqQR(rowsWithB: RDD[(Array[Double], Double)],
              r: Array[Array[Double]], d: Int): Array[Double] = {
    val rB = rowsWithB.sparkContext.broadcast(r)
    val qtb = rowsWithB.mapPartitions { it =>
      val acc = new Array[Double](d)
      it.foreach { case (row, bi) =>
        val qrow = LocalLA.solveXU(Array(row), rB.value)(0)
        var j = 0
        while (j < d) { acc(j) += qrow(j) * bi; j += 1 }
      }
      Iterator(acc)
    }.treeReduce({ (x, y) =>
      var j = 0
      while (j < d) { x(j) += y(j); j += 1 }
      x
    }, depth = 2)
    LocalLA.backSolveUpper(r, qtb.map(Array(_))).map(_(0))
  }
}
