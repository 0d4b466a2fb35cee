package graft.operators

/** Two-level (coarse-quantized) IVF cell router — the standard answer
  * to the assignment term that dominates index builds once the kNN
  * kernel is linear: scoring every vector against all ≈√n anchors is
  * n·√n dots (measured: the 2M-vector graph build's dominant share,
  * BASELINE round-15). The router clusters the ANCHORS themselves into
  * ≈√(nAnchors) coarse groups (driver-side k-means — the anchor table
  * is already a driver array, bounded by the same √n argument as
  * training); assignment then scores the ≈n^(1/4) coarse centroids,
  * keeps the top [[CellRouter.of]]-probe groups, and scores only their
  * member anchors — O(n^(1/4)·wProbe) dots per vector instead of
  * O(√n), i.e. the total build's assignment term drops from n^1.5 to
  * ~n^1.25 with a small constant. Coverage is approximate exactly the
  * way NN-descent's is: every returned score is an exact cosine, only
  * WHICH cells are considered is pruned; the quality spec bounds the
  * argmax agreement against the flat kernel, and the serving recall
  * gates are unchanged because probing covers many cells.
  *
  * Everything is deterministic at any parallelism: seeding takes the
  * lowest-cell-id anchors, Lloyd rounds are fixed-count sequential
  * driver loops with ascending-order double folds, and every argmax
  * ties (sim desc, id asc) — the same rule as the flat kernel and the
  * window form.
  */
final class CellRouter private (
    val cells: Array[Int],        // fine cell ids, ascending
    val flat: Array[Double],      // row-major fine anchor values
    val norms: Array[Double],     // fine anchor L2 norms
    val gFlat: Array[Double],     // row-major coarse centroids
    val gNorms: Array[Double],    // coarse centroid L2 norms
    val gStart: Array[Int],       // CSR: group g's members = mIdx[gStart(g) until gStart(g+1))
    val mIdx: Array[Int],         // CSR member indices into cells/flat/norms
    val wProbe: Int,
    val dim: Int) extends Serializable {

  /** Routed argmax cell id for one vector — the training loop's kernel
    * (the projection form lives in the TopCellsRouted expression, same
    * algorithm, codegen'd). Tie rule (sim desc, id asc) matches the
    * exact loop it replaces. */
  def argmaxCell(v: Array[Double], nrm: Double): Int = {
    val ng = gNorms.length
    val wp = math.min(wProbe, ng)
    // top-wp coarse groups, (sim desc, group asc)
    val gSim = new Array[Double](wp)
    val gId = new Array[Int](wp)
    var gf = 0
    var g = 0
    while (g < ng) {
      var dot = 0.0; var i = 0; val off = g * dim
      while (i < dim) { dot += v(i) * gFlat(off + i); i += 1 }
      val sim = dot / (nrm * gNorms(g))
      if (gf < wp || sim > gSim(gf - 1)) { // ascending g scan: strict-greater keeps lower g on ties
        var pos = if (gf < wp) gf else wp - 1
        while (pos > 0 && sim > gSim(pos - 1)) {
          gSim(pos) = gSim(pos - 1); gId(pos) = gId(pos - 1); pos -= 1
        }
        gSim(pos) = sim; gId(pos) = g
        if (gf < wp) gf += 1
      }
      g += 1
    }
    var best = Int.MaxValue
    var bestSim = Double.NegativeInfinity
    var gi = 0
    while (gi < gf) {
      val gg = gId(gi)
      var mi = gStart(gg)
      while (mi < gStart(gg + 1)) {
        val c = mIdx(mi)
        var dot = 0.0; var i = 0; val off = c * dim
        while (i < dim) { dot += v(i) * flat(off + i); i += 1 }
        val sim = dot / (nrm * norms(c))
        val cell = cells(c)
        if (sim > bestSim || (sim == bestSim && cell < best)) {
          bestSim = sim; best = cell
        }
        mi += 1
      }
      gi += 1
    }
    best
  }
}

object CellRouter {
  /** Coarse Lloyd rounds — fixed and small: the router only needs a
    * sane grouping, not a converged one. */
  private val CoarseIters = 3

  /** Build the router: sort anchors by cell id, k-means the anchor
    * VALUES into ceil(√nAnchors) coarse groups (seeded from the
    * lowest-id anchors, empty groups dropped per round — classic
    * Lloyd), then a final assignment pass against the final centroids
    * so CSR membership reflects exactly what routing will score.
    * Driver cost ~nAnchors^1.5·dim flops — microseconds at gate scale,
    * ~0.1 s at the 2M-vector build's 1.4k anchors. */
  def of(anchors: Array[(Int, Array[Double])], wProbe: Int): CellRouter = {
    require(anchors.nonEmpty && wProbe >= 1)
    val sorted = anchors.sortBy(_._1)
    val n = sorted.length
    val dim = sorted(0)._2.length // local: Scala array head on the driver-bounded anchor table
    val cells = sorted.map(_._1)
    val flat = new Array[Double](n * dim)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      System.arraycopy(sorted(i)._2, 0, flat, i * dim, dim)
      var s2 = 0.0; var j = 0
      while (j < dim) { val x = flat(i * dim + j); s2 += x * x; j += 1 }
      norms(i) = math.sqrt(s2)
      i += 1
    }
    val ng0 = math.max(1, math.ceil(math.sqrt(n.toDouble)).toInt)
    var cents: Array[Array[Double]] =
      Array.tabulate(math.min(ng0, n))(g => sorted(g)._2.clone())
    val assign = new Array[Int](n)
    def assignAll(): Unit = {
      val cNorms = cents.map { c =>
        var s2 = 0.0; var j = 0
        while (j < dim) { s2 += c(j) * c(j); j += 1 }
        math.sqrt(s2)
      }
      var ii = 0
      while (ii < n) {
        var best = 0
        var bestSim = Double.NegativeInfinity
        var g = 0
        while (g < cents.length) {
          var dot = 0.0; var j = 0
          while (j < dim) { dot += flat(ii * dim + j) * cents(g)(j); j += 1 }
          val sim = dot / (norms(ii) * cNorms(g))
          if (sim > bestSim) { bestSim = sim; best = g } // ascending g: ties keep lower g
          g += 1
        }
        assign(ii) = best
        ii += 1
      }
    }
    var iter = 0
    while (iter < CoarseIters) {
      assignAll()
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val cnt = new Array[Int](cents.length)
      var ii = 0
      while (ii < n) { // ascending-order fold: deterministic double sums
        val g = assign(ii); var j = 0
        while (j < dim) { sums(g)(j) += flat(ii * dim + j); j += 1 }
        cnt(g) += 1
        ii += 1
      }
      cents = (0 until cents.length).filter(cnt(_) > 0)
        .map(g => sums(g).map(_ / cnt(g))).toArray
      iter += 1
    }
    assignAll() // membership must reflect the FINAL centroids
    val ng = cents.length
    val gFlat = new Array[Double](ng * dim)
    val gNorms = new Array[Double](ng)
    var g = 0
    while (g < ng) {
      System.arraycopy(cents(g), 0, gFlat, g * dim, dim)
      var s2 = 0.0; var j = 0
      while (j < dim) { val x = cents(g)(j); s2 += x * x; j += 1 }
      gNorms(g) = math.sqrt(s2)
      g += 1
    }
    val cnt = new Array[Int](ng)
    i = 0
    while (i < n) { cnt(assign(i)) += 1; i += 1 }
    val gStart = new Array[Int](ng + 1)
    g = 0
    while (g < ng) { gStart(g + 1) = gStart(g) + cnt(g); g += 1 }
    val fill = gStart.clone()
    val mIdx = new Array[Int](n)
    i = 0
    while (i < n) { // ascending anchor order within each group
      val gg = assign(i); mIdx(fill(gg)) = i; fill(gg) += 1; i += 1
    }
    new CellRouter(cells, flat, norms, gFlat, gNorms, gStart, mIdx, wProbe, dim)
  }
}
