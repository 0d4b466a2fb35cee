package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.matrix._
import graft.matrix.BlockModel._

/** Invariant tests for the matrix engine (FIXTURES.md A4, SURVEY.md §5):
  * residual bounds against the verified semantics L·U = A[indx,:] and
  * A⁻¹[:,indx] = U⁻¹·L⁻¹, plus local-vs-distributed agreement and the
  * M6 byte round trip on the reference golden files. */
class MatrixSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  lazy val sc = spark.sparkContext
  val seed = 42L

  test("local ludcmp: L·U == A[indx,:] (n=64, raw uniform)") {
    val n = 64
    val a = MatrixGen.local(n, 16, seed)
    val packed = a.map(_.clone())
    val indx = LocalLA.ludcmp(packed)
    val (l, u) = LocalLA.splitLU(packed)
    val resid = LocalLA.maxAbsDiff(LocalLA.gemm(l, u), LocalLA.permuteRows(a, indx))
    assert(resid < 1e-8 * n, s"residual $resid")
  }

  test("local triangular inverses") {
    val n = 32
    val a = MatrixGen.local(n, 8, seed, diagBoost = n.toDouble)
    val packed = a.map(_.clone())
    LocalLA.ludcmp(packed)
    val (l, u) = LocalLA.splitLU(packed)
    val li = LocalLA.invUnitLower(l)
    val ui = LocalLA.invUpper(u)
    val eye = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    assert(LocalLA.maxAbsDiff(LocalLA.gemm(l, li), eye) < 1e-9 * n)
    assert(LocalLA.maxAbsDiff(LocalLA.gemm(u, ui), eye) < 1e-9 * n)
  }

  test("distributed gen matches local gen") {
    val n = 128; val blk = 32
    val dist = toLocal(MatrixGen.blocks(sc, n, blk, seed), n, n, blk)
    val loc = MatrixGen.local(n, blk, seed)
    assert(LocalLA.maxAbsDiff(dist, loc) == 0.0)
  }

  test("fromRows round trip") {
    val n = 128; val blk = 32
    val rows = MatrixGen.rows(sc, n, blk, seed)
    val blocks = fromRows(rows, n, blk)
    val loc = MatrixGen.local(n, blk, seed)
    assert(LocalLA.maxAbsDiff(toLocal(blocks, n, n, blk), loc) == 0.0)
  }

  test("distributed block LU: L·U == P·A (n=256, blk=64, raw uniform)") {
    val n = 256; val blk = 64
    val a = MatrixGen.blocks(sc, n, blk, seed)
    val lu = BlockLU.factor(sc, a, n, blk)
    val prod = multiply(lu.l, lu.u, blk, n.toLong, n.toLong, n.toLong)
    val permsB = sc.broadcast(lu.perms)
    val pa = a.map { case ((i, j), m) =>
      ((i, j), LocalLA.toDM(LocalLA.permuteRows(LocalLA.fromDM(m), permsB.value(i))))
    }
    assert(maxAbsDiff(prod, pa) < 1e-8 * n)
  }

  test("distributed LU agrees with shuffle (join) trailing-update path") {
    val n = 128; val blk = 32
    val a = MatrixGen.blocks(sc, n, blk, seed)
    val broad = BlockLU.factor(sc, a, n, blk)
    val joined = BlockLU.factor(sc, a, n, blk, broadcastPanelBytes = 0L)
    assert(maxAbsDiff(broad.l, joined.l) == 0.0)
    assert(maxAbsDiff(broad.u, joined.u) == 0.0)
  }

  test("m11 least squares: normal-equations residual ~ 0, matches local solve") {
    val df = graft.matrix.MatrixQueries.m11LeastSquares(spark, "")
    val row = df.collect()(0)
    assert(row.getAs[Boolean]("pass"),
      s"resid_rel=${row.getAs[Double]("resid_rel")} vs_local=${row.getAs[Double]("vs_local")}")
  }

  test("distributed Cholesky agrees with shuffle (join) trailing-update path") {
    val n = 128; val blk = 32
    val a = BlockCholesky.spdBlocks(sc, n, blk, seed, boost = n.toDouble)
    val broad = BlockCholesky.factor(sc, a, n, blk)
    val joined = BlockCholesky.factor(sc, a, n, blk, broadcastPanelBytes = 0L)
    assert(maxAbsDiff(broad, joined) == 0.0)
  }

  test("distributed triangular inversion") {
    val n = 128; val blk = 32; val q = n / blk
    val a = MatrixGen.blocks(sc, n, blk, seed, diagBoost = n.toDouble)
    val lu = BlockLU.factor(sc, a, n, blk)
    val li = Inversion.invLower(lu.l, q, blk)
    val prod = multiply(lu.l, li, blk, n.toLong, n.toLong, n.toLong)
    assert(maxAbsMinusIdentity(prod, blk) < 1e-8 * n)
    val ui = Inversion.invUpper(lu.u, q, blk)
    val prodU = multiply(lu.u, ui, blk, n.toLong, n.toLong, n.toLong)
    assert(maxAbsMinusIdentity(prodU, blk) < 1e-8 * n)
  }

  test("inverse: A·A⁻¹ == I (n=256, diagonally dominant, tight ε)") {
    val n = 256; val blk = 64
    val a = MatrixGen.blocks(sc, n, blk, seed, diagBoost = n.toDouble)
    val ainv = Inversion.inverse(sc, a, n, blk)
    val prod = multiply(a, ainv, blk, n.toLong, n.toLong, n.toLong)
    assert(maxAbsMinusIdentity(prod, blk) < 1e-6 * n)
  }

  test("inverse: raw uniform(0,1) matrix, loose ε (FIXTURES.md A4)") {
    val n = 256; val blk = 64
    val a = MatrixGen.blocks(sc, n, blk, seed)
    val ainv = Inversion.inverse(sc, a, n, blk)
    val prod = multiply(a, ainv, blk, n.toLong, n.toLong, n.toLong)
    assert(maxAbsMinusIdentity(prod, blk) < 1e-4 * n)
  }

  test("inverse matches local oracle (n=128)") {
    val n = 128; val blk = 32
    val a = MatrixGen.blocks(sc, n, blk, seed, diagBoost = n.toDouble)
    val dist = toLocal(Inversion.inverse(sc, a, n, blk), n, n, blk)
    // local oracle: inverse via local LU of the same matrix
    val loc = MatrixGen.local(n, blk, seed, diagBoost = n.toDouble)
    val packed = loc.map(_.clone())
    val indx = LocalLA.ludcmp(packed)
    val (l, u) = LocalLA.splitLU(packed)
    val uiLi = LocalLA.gemm(LocalLA.invUpper(u), LocalLA.invUnitLower(l))
    val oracle = Array.ofDim[Double](n, n)
    for (i <- 0 until n; c <- 0 until n) oracle(i)(indx(c)) = uiLi(i)(c)
    assert(LocalLA.maxAbsDiff(dist, oracle) < 1e-9 * n)
  }

  test("inverseAny: arbitrary n (not a block multiple) via identity padding") {
    val n = 300; val blk = 64
    val a = MatrixGen.local(n, n, 5L, diagBoost = n.toDouble)
    val rows = spark.sparkContext.parallelize(
      a.indices.map(i => (i.toLong, a(i))), 8)
    val inv = Inversion.inverseAny(spark.sparkContext, rows, n, blk)
      .collect().sortBy(_._1).map(_._2)
    val prod = LocalLA.gemm(a, inv)
    var resid = 0.0
    for (i <- 0 until n; j <- 0 until n) {
      val e = if (i == j) 1.0 else 0.0
      resid = math.max(resid, math.abs(prod(i)(j) - e))
    }
    assert(resid < 1e-7 * n, s"residual $resid")
  }

  test("solve: blocked TRSM substitution, no full inversion in the path") {
    val n = 256; val blk = 64
    val a = MatrixGen.blocks(sc, n, blk, seed, diagBoost = n.toDouble)
    val b = MatrixGen.blocks(sc, n, blk, seed + 1).filter { case ((_, j), _) => j == 0 }
    val invBefore = Inversion.inverseInvocations.get()
    val x = Inversion.solve(sc, a, b, n, blk, blk)
    val ax = multiply(a, x, blk, n.toLong, n.toLong, blk.toLong)
    val resid = maxAbsDiff(ax, b)
    assert(resid < 1e-8 * n, s"residual $resid")
    assert(Inversion.inverseInvocations.get() == invBefore,
      "solve must substitute over the factored blocks, never form A⁻¹")
    // agrees with the local substitution oracle
    val loc = MatrixGen.local(n, blk, seed, diagBoost = n.toDouble)
    val packed = loc.map(_.clone())
    val indx = LocalLA.ludcmp(packed)
    val (l, u) = LocalLA.splitLU(packed)
    val bLoc = toLocal(b, n, blk, blk)
    val xLoc = LocalLA.backSolveUpper(u,
      LocalLA.forwardSolveUnitLower(l, LocalLA.permuteRows(bLoc, indx)))
    assert(LocalLA.maxAbsDiff(toLocal(x, n, blk, blk), xLoc) < 1e-9 * n)
  }

  test("solveFactored: one factorization serves many right-hand sides") {
    val n = 128; val blk = 32
    val a = MatrixGen.blocks(sc, n, blk, seed, diagBoost = n.toDouble)
    val lu = BlockLU.factor(sc, a, n, blk)
    for (s <- 1 to 3) {
      val b = MatrixGen.blocks(sc, n, blk, seed + s).filter { case ((_, j), _) => j == 0 }
      val x = Inversion.solveFactored(sc, lu, b, blk)
      val ax = multiply(a, x, blk, n.toLong, n.toLong, blk.toLong)
      assert(maxAbsDiff(ax, b) < 1e-8 * n, s"rhs $s residual")
    }
  }

  test("local cholesky: L·Lᵀ == A on SPD input; lower-triangular, positive diag") {
    val n = 64
    val a = BlockCholesky.spdLocal(n, 16, seed, boost = n.toDouble)
    val l = LocalLA.cholesky(a)
    assert(LocalLA.maxAbsDiff(LocalLA.gemm(l, LocalLA.transpose(l)), a) < 1e-9 * n)
    for (i <- 0 until n) {
      assert(l(i)(i) > 0, s"non-positive diag at $i")
      for (j <- i + 1 until n) assert(l(i)(j) == 0.0, s"upper entry at ($i,$j)")
    }
  }

  test("distributed block Cholesky equals local; L·Lᵀ == A (n=256, blk=64)") {
    val n = 256; val blk = 64
    val a = BlockCholesky.spdBlocks(sc, n, blk, seed, boost = n.toDouble)
    val lBlocks = BlockCholesky.factor(sc, a, n, blk).collect()
    assert(lBlocks.map(_._1).toSet == (for (i <- 0 until 4; j <- 0 to i) yield (i, j)).toSet)
    val l = Array.ofDim[Double](n, n)
    lBlocks.foreach { case ((bi, bj), m) =>
      val d = LocalLA.fromDM(toDense(m))
      for (i <- 0 until blk; j <- 0 until blk) l(bi * blk + i)(bj * blk + j) = d(i)(j)
    }
    val aLoc = BlockCholesky.spdLocal(n, blk, seed, boost = n.toDouble)
    assert(LocalLA.maxAbsDiff(LocalLA.gemm(l, LocalLA.transpose(l)), aLoc) < 1e-8 * n)
    val lLoc = LocalLA.cholesky(aLoc)
    assert(LocalLA.maxAbsDiff(l, lLoc) < 1e-8 * n, "distributed factor differs from local")
  }

  test("solveSPD: Cholesky substitution solve, residual bound, equals LU solve") {
    val n = 256; val blk = 64
    val a = BlockCholesky.spdBlocks(sc, n, blk, seed, boost = n.toDouble)
    // mirror the lower-triangle blocks to a full symmetric A for the
    // LU path and the residual check
    val aFull = a.flatMap { case ((i, j), m) =>
      if (i == j) Iterator(((i, j), m))
      else Iterator(((i, j), m),
        ((j, i), LocalLA.toDM(LocalLA.transpose(LocalLA.fromDM(toDense(m))))))
    }
    val b = MatrixGen.blocks(sc, n, blk, seed + 9).filter { case ((_, j), _) => j == 0 }
    val x = Inversion.solveSPD(sc, a, b, n, blk, blk)
    val ax = multiply(aFull, x, blk, n.toLong, n.toLong, blk.toLong)
    val resid = maxAbsDiff(ax, b)
    assert(resid < 1e-8 * n, s"Cholesky-solve residual $resid")
    val xLU = Inversion.solve(sc, aFull, b, n, blk, blk)
    assert(maxAbsDiff(x, xLU) < 1e-8 * n, "SPD solve disagrees with LU solve")
  }

  test("M6: golden fixture byte round trip (out/A.0, out/A.1)") {
    for (p <- Seq("/root/reference/out/A.0", "/root/reference/out/A.1")) {
      assume(new java.io.File(p).exists())
      val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
      val block = MatrixBlockIO.decode(bytes)
      assert(bytes.length == 2099216)
      assert(block.i0 == 1024 && block.i1 == 1536)
      assert(java.util.Arrays.equals(MatrixBlockIO.encode(block), bytes))
    }
  }

  test("reliable checkpoint: LU under sc.setCheckpointDir writes recoverable state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile
    sc.setCheckpointDir(dir.getPath)
    try {
      val n = 128; val blk = 32
      val a = MatrixGen.blocks(sc, n, blk, seed)
      val lu = BlockLU.factor(sc, a, n, blk)
      val prod = multiply(lu.l, lu.u, blk, n.toLong, n.toLong, n.toLong)
      val permsB = sc.broadcast(lu.perms)
      val pa = a.map { case ((i, j), m) =>
        ((i, j), LocalLA.toDM(LocalLA.permuteRows(LocalLA.fromDM(m), permsB.value(i))))
      }
      assert(maxAbsDiff(prod, pa) < 1e-8 * n)
      // recovery-capable checkpoint files landed under the dir (the
      // localCheckpoint fallback writes nothing here)
      def countFiles(f: java.io.File): Int =
        if (f.isFile) 1
        else Option(f.listFiles).map(_.map(countFiles).sum).getOrElse(0)
      assert(countFiles(dir) > 0, "no reliable checkpoint files written")
    } finally sc.setCheckpointDir(null)
  }

  test("distributed sink + windowed/transposed re-read (2048², 16 files)") {
    val n = 2048; val blk = 512
    val dir = java.nio.file.Files.createTempDirectory("refsink").toFile.getPath
    val blocks = MatrixGen.blocks(sc, n, blk, seed)
    MatrixBlockIO.writeBlocks(MatrixBlockIO.toRefBlocks(blocks, blk), dir)
    assert(new java.io.File(dir).listFiles().length == (n / blk) * (n / blk))

    val loc = MatrixGen.local(n, blk, seed)
    // full distributed re-read: value-identical
    val back = MatrixBlockIO.readBlocks(sc, s"$dir/A.*").collect()
    assert(back.length == 16)
    back.foreach { b =>
      for (r <- 0 until b.numRows; c <- 0 until b.numCols)
        assert(b.data(r)(c) == loc(b.i0 + r)(b.j0 + c))
    }
    // windowed read across file boundaries: only the overlap lands
    val (wi, wj, wr, wc) = (700, 300, 200, 900)
    val win = Array.ofDim[Double](wr, wc)
    new java.io.File(dir).listFiles().foreach(f =>
      MatrixBlockIO.readWindow(f.getPath, wi, wj, win))
    for (r <- 0 until wr; c <- 0 until wc)
      assert(win(r)(c) == loc(wi + r)(wj + c))
    // transposed window (the reference's 'T' mode)
    val winT = Array.ofDim[Double](wc, wr)
    new java.io.File(dir).listFiles().foreach(f =>
      MatrixBlockIO.readWindow(f.getPath, wi, wj, winT, transposed = true))
    for (r <- 0 until wr; c <- 0 until wc)
      assert(winT(c)(r) == loc(wi + r)(wj + c))
    // byte-identical re-encode of a written file
    val one = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/A.512.1024"))
    assert(java.util.Arrays.equals(
      MatrixBlockIO.encode(MatrixBlockIO.decode(one)), one))
  }

  test("codec round trip on generated block + distributed read") {
    val dir = java.nio.file.Files.createTempDirectory("refblocks").toFile
    val data = MatrixGen.local(64, 16, seed)
    val b = MatrixBlockIO.RefBlock(0, 64, 0, 64, Array.tabulate(64)(identity), data)
    MatrixBlockIO.write(s"$dir/A.0", b)
    val back = MatrixBlockIO.read(s"$dir/A.0")
    assert(LocalLA.maxAbsDiff(back.data, data) == 0.0)
    val rdd = MatrixBlockIO.readBlocks(sc, s"$dir/A.*")
    assert(rdd.count() == 1)
  }

  test("TSQR: canonical R unique across partitionings, Q orthonormal, QR lstsq recovers planted x") {
    val m = 512; val d = 16; val blk = 32
    val rows = TallSkinny.tallRows(sc, m, d, blk, seed)
    val r = TallSkinny.tsqrR(rows, d)
    // uniqueness: a DIFFERENT partitioning (different reduction tree,
    // different fp order) must produce the same canonical R up to roundoff
    val r7 = TallSkinny.tsqrR(rows.repartition(7), d)
    val rl = LocalLA.canonUpper(LocalLA.qrR(
      rows.collect().sortBy(_._1).map(_._2)))
    val scale = rl.map(_.map(math.abs).max).max
    assert(LocalLA.maxAbsDiff(r, rl) / scale < 1e-12)
    assert(LocalLA.maxAbsDiff(r7, rl) / scale < 1e-12)
    // R upper triangular with positive diagonal
    for (i <- 0 until d) {
      assert(r(i)(i) > 0.0)
      for (j <- 0 until i) assert(r(i)(j) == 0.0)
    }
    // Q orthonormal
    val qtq = TallSkinny.gram(TallSkinny.qOf(rows, r), d)
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(qtq(i)(j) - (if (i == j) 1.0 else 0.0)) < 1e-12)
    // least squares through QR recovers a planted solution
    val xTrue = Array.tabulate(d)(j => (j - 5).toDouble / 3)
    val rowsWithB = rows.map { case (_, v) =>
      (v, v.zip(xTrue).map { case (a, b) => a * b }.sum)
    }
    val x = TallSkinny.lstsqQR(rowsWithB, r, d)
    assert(x.zip(xTrue).map { case (a, b) => math.abs(a - b) }.max < 1e-10)
  }

  test("symEig: Jacobi recovers a planted spectrum; eigenvectors orthonormal") {
    val n = 24
    val rng = new scala.util.Random(7)
    // plant: A = V·diag(λ)·Vᵀ with a random orthogonal V (via QR)
    val lam = Array.tabulate(n)(i => (n - i).toDouble * (n - i))
    val raw = Array.fill(n, n)(rng.nextGaussian())
    val r = LocalLA.qrR(raw.map(_.clone()))
    val v = LocalLA.solveXU(raw, r) // Q of the QR: orthogonal
    val a = Array.tabulate(n, n) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < n) { s += v(i)(k) * lam(k) * v(j)(k); k += 1 }
      s
    }
    val (got, vecs) = LocalLA.symEig(a)
    assert(got.zip(lam).map { case (x, y) => math.abs(x - y) }.max < 1e-8 * lam.max)
    // vectors orthonormal and satisfy A·v = λ·v
    for (i <- 0 until n; j <- 0 until n) {
      var dot = 0.0; var k = 0
      while (k < n) { dot += vecs(k)(i) * vecs(k)(j); k += 1 }
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-10)
    }
    for (c <- 0 until 3) {
      val av = a.map(row => row.indices.map(k => row(k) * vecs(k)(c)).sum)
      val resid = av.zipWithIndex.map { case (x, i) =>
        math.abs(x - got(c) * vecs(i)(c)) }.max
      assert(resid < 1e-7 * lam.max, s"A·v ≠ λv for eigenpair $c: $resid")
    }
  }

  test("m14: completed randomized SVD matches a driver-local spectrum, V orthonormal") {
    val row = MatrixQueries.m14CompletedSvd(spark, "").collect()(0)
    info(s"sig1=${row.getAs[Double]("sig1_4")} sig8=${row.getAs[Double]("sig8_4")} " +
      f"relTop8=${row.getAs[Double]("rel_top8")}%.2e align1=${row.getAs[Double]("align1")}%.6f " +
      f"vOrth=${row.getAs[Double]("v_orth")}%.2e tail=${row.getAs[Double]("tail_ratio")}%.2e")
    assert(row.getAs[Boolean]("pass"), row.toString)
    assert(row.getAs[Double]("rel_top8") < 1e-3,
      "top-8 singular values drifted beyond the projection-residual bound")
  }

  test("m9: block-vector power iteration matches the driver-local replica and norm bounds") {
    val row = MatrixQueries.m9SpectralNorm(spark, "").collect()(0)
    assert(row.getAs[Boolean]("pass"),
      s"m9 invariant gate failed after the collect-free rewrite: $row")
  }

  test("m15 block-vector matvec: distributed SpMV equals a local dense matvec") {
    // the CG loop's kernel: column-keyed full-symmetric layout, narrow
    // join against the block iterate, q²·blk-double partial reduce —
    // verified against a driver-local dense matvec over the SAME matrix
    val n = 256; val blk = 64; val q = n / blk
    val part = new org.apache.spark.HashPartitioner(q)
    val aByCol = BlockCholesky.spdBlocks(sc, n, blk, seed, boost = n.toDouble)
      .flatMap { case ((bi, bj), dm) =>
        val d = LocalLA.fromDM(dm)
        if (bi == bj) Iterator((bj, (bi, d)))
        else Iterator((bj, (bi, d)), (bi, (bj, LocalLA.transpose(d))))
      }.partitionBy(part)
    val xLoc = Array.tabulate(n)(i => math.sin(i + 1.0))
    val x = sc.parallelize(0 until q, q)
      .map(b => (b, xLoc.slice(b * blk, (b + 1) * blk))).partitionBy(part)
    val got = MatrixQueries.bvMatvec(aByCol, x, part)
      .collect().sortBy(_._1).flatMap(_._2)
    assert(got.length == n)
    val aLoc = Array.ofDim[Double](n, n)
    for (bi <- 0 until q; bj <- 0 to bi) {
      val a = MatrixGen.localBlock(blk, seed, bi, bj, 0.0)
      val at = MatrixGen.localBlock(blk, seed, bj, bi, 0.0)
      for (i <- 0 until blk; j <- 0 until blk) {
        var v = (a(i)(j) + at(j)(i)) / 2
        if (bi == bj && i == j) v += n.toDouble
        aLoc(bi * blk + i)(bj * blk + j) = v
        aLoc(bj * blk + j)(bi * blk + i) = v
      }
    }
    val want = aLoc.map { row =>
      var acc = 0.0; var i = 0
      while (i < n) { acc += row(i) * xLoc(i); i += 1 }
      acc
    }
    val diff = got.zip(want).map { case (g, w) => math.abs(g - w) }.max
    assert(diff < 1e-10, s"distributed matvec drifted from local by $diff")
  }

  test("m15: CG recovers the planted SPD solution, true residual at tolerance") {
    val row = MatrixQueries.m15ConjugateGradient(spark, "").collect()(0)
    info(f"iters=${row.getAs[Int]("iters")} resid=${row.getAs[Double]("resid_rel")}%.2e " +
      f"err=${row.getAs[Double]("err_rel")}%.2e")
    assert(row.getAs[Boolean]("pass"), row.toString)
    // the boosted-diagonal SPD matrix is well-conditioned (kappa ~ few):
    // CG must converge far below the n-iteration worst case
    assert(row.getAs[Int]("iters") < 100,
      s"CG took ${row.getAs[Int]("iters")} iterations — conditioning or recurrence broken")
  }

  test("m16: Jacobi PCG beats plain CG on the badly scaled system, solution exact") {
    val row = MatrixQueries.m16PreconditionedCg(spark, "").collect()(0)
    info(s"cg_iters=${row.getAs[Int]("cg_iters")} pcg_iters=${row.getAs[Int]("pcg_iters")} " +
      f"resid_cg=${row.getAs[Double]("resid_cg")}%.2e resid_pcg=${row.getAs[Double]("resid_pcg")}%.2e")
    assert(row.getAs[Boolean]("pass"), row.toString)
    // the diagonal scaling (spread 8) is exactly what Jacobi undoes:
    // the preconditioned count must fall back near the unscaled regime
    // (m15 converges in ~7), while plain CG pays for the scaling
    assert(row.getAs[Int]("pcg_iters") * 2 <= row.getAs[Int]("cg_iters"),
      s"preconditioner bought <2x: cg=${row.getAs[Int]("cg_iters")} pcg=${row.getAs[Int]("pcg_iters")}")
  }

  test("m17: Lanczos top-3 Ritz values match the dense spectrum; gates green") {
    val n = 256; val blk = 64; val q = n / blk
    val rows = MatrixQueries.m17At(spark, n, blk).collect()
    assert(rows.length == 3)
    rows.foreach(r => assert(r.getAs[Boolean]("pass") &&
      r.getAs[Boolean]("rank_complete_ok"), r.toString))
    info(rows.map(r => f"theta${r.getAs[Int]("rank")}=${r.getAs[Double]("theta")}%.6f " +
      f"resid=${r.getAs[Double]("resid_rel")}%.2e").mkString(" "))
    // dense ground truth over the SAME matrix (m15-spec assembly +
    // m17's planted spikes: +cₖ/blk on diagonal block k, cₖ = (3−k)·n)
    val aLoc = Array.ofDim[Double](n, n)
    for (bi <- 0 until q; bj <- 0 to bi) {
      val a = MatrixGen.localBlock(blk, seed, bi, bj, 0.0)
      val at = MatrixGen.localBlock(blk, seed, bj, bi, 0.0)
      val bump = if (bi == bj && bi < 3) (3 - bi) * n.toDouble / blk else 0.0
      for (i <- 0 until blk; j <- 0 until blk) {
        var v = (a(i)(j) + at(j)(i)) / 2 + bump
        if (bi == bj && i == j) v += n.toDouble
        aLoc(bi * blk + i)(bj * blk + j) = v
        aLoc(bj * blk + j)(bi * blk + i) = v
      }
    }
    val (lam, _) = LocalLA.symEig(aLoc)
    rows.foreach { r =>
      val k = r.getAs[Int]("rank") - 1
      val th = r.getAs[Double]("theta")
      assert(math.abs(th - lam(k)) <= 1e-6 * math.abs(lam(k)),
        f"Ritz value $k drifted: theta=$th%.9f dense=${lam(k)}%.9f")
    }
  }

  test("m18: BiCGSTAB recovers the planted solution on a genuinely " +
    "nonsymmetric system; independent local LU solve agrees") {
    val n = 256; val blk = 64; val q = n / blk
    val row = MatrixQueries.m18At(spark, n, blk).collect()(0)
    info(f"iters=${row.getAs[Int]("iters")} resid=${row.getAs[Double]("resid_rel")}%.2e " +
      f"err=${row.getAs[Double]("err_rel")}%.2e")
    assert(row.getAs[Boolean]("pass"), row.toString)
    // row-dominant (boost n) ⇒ well-conditioned: far below the n cap
    assert(row.getAs[Int]("iters") < 60,
      s"BiCGSTAB took ${row.getAs[Int]("iters")} iterations — recurrence broken")
    // the SAME matrix assembled locally: m18 uses MatrixGen.blocks
    // as-is (NO symmetrization) — first prove the asymmetry has teeth
    val aLoc = Array.ofDim[Double](n, n)
    for (bi <- 0 until q; bj <- 0 until q) {
      val a = MatrixGen.localBlock(blk, seed, bi, bj, 0.0)
      for (i <- 0 until blk; j <- 0 until blk) {
        aLoc(bi * blk + i)(bj * blk + j) =
          a(i)(j) + (if (bi == bj && i == j) n.toDouble else 0.0)
      }
    }
    val asym = (for (i <- 0 until n; j <- 0 until i) yield
      math.abs(aLoc(i)(j) - aLoc(j)(i))).max
    assert(asym > 0.1, s"test matrix is near-symmetric (max asym $asym) — " +
      "the nonsymmetric claim would be vacuous")
    // independent driver-local solve: plain Gaussian elimination with
    // partial pivoting (no shared code with the distributed path);
    // recovering the same planted x* sandwiches x̂ = x_LU within 2e-8
    val xStar = Array.tabulate(n)(i => 1.0 + (i % 7) * 0.25)
    val bLoc = aLoc.map { r0 =>
      var acc = 0.0; var i = 0
      while (i < n) { acc += r0(i) * xStar(i); i += 1 }
      acc
    }
    val m = aLoc.map(_.clone()); val bb = bLoc.clone()
    for (k <- 0 until n) {
      val piv = (k until n).maxBy(i => math.abs(m(i)(k)))
      val tr = m(k); m(k) = m(piv); m(piv) = tr
      val tb = bb(k); bb(k) = bb(piv); bb(piv) = tb
      for (i <- k + 1 until n) {
        val f = m(i)(k) / m(k)(k)
        for (j <- k until n) m(i)(j) -= f * m(k)(j)
        bb(i) -= f * bb(k)
      }
    }
    val xLu = new Array[Double](n)
    for (i <- n - 1 to 0 by -1) {
      var acc = bb(i)
      for (j <- i + 1 until n) acc -= m(i)(j) * xLu(j)
      xLu(i) = acc / m(i)(i)
    }
    val luErr = xLu.zip(xStar).map { case (a, b) => math.abs(a - b) }.max
    assert(luErr < 1e-8, s"local LU drifted from planted x* by $luErr — " +
      "system assembly mismatch")
  }

  test("m19 Chebyshev right-preconditioner: same gates, same planted " +
    "answer, iteration count cut well below half of plain GMRES") {
    val n = 256; val blk = 64
    val plain = MatrixQueries.m19At(spark, n, blk, 32).collect()(0)
    val pre = MatrixQueries.m19At(spark, n, blk, 32, polyDeg = 12).collect()(0)
    info(s"plain iters=${plain.getAs[Int]("iters")} " +
      s"restarts=${plain.getAs[Int]("restarts")}; " +
      s"precond iters=${pre.getAs[Int]("iters")} " +
      s"restarts=${pre.getAs[Int]("restarts")} " +
      f"resid=${pre.getAs[Double]("resid_rel")}%.2e " +
      f"err=${pre.getAs[Double]("err_rel")}%.2e")
    // agreement: both solve the SAME system through the SAME gates —
    // true residual < 1e-10 and the planted x* recovered < 1e-8; the
    // preconditioner cannot trade accuracy for speed
    assert(plain.getAs[Boolean]("pass"), s"plain GMRES red: $plain")
    assert(pre.getAs[Boolean]("pass"), s"preconditioned GMRES red: $pre")
    // the point of the polynomial: the ~σ/δ·m Arnoldi rounds collapse
    assert(pre.getAs[Int]("iters") * 2 < plain.getAs[Int]("iters"),
      s"preconditioner bought < 2x: ${pre.getAs[Int]("iters")} vs " +
        s"${plain.getAs[Int]("iters")} plain")
  }

  test("m19: GMRES(m) converges on the skew-dominant system BiCGSTAB " +
    "demonstrably fails on; independent local LU solve agrees") {
    val n = 256; val blk = 64; val q = n / blk
    val row = MatrixQueries.m19At(spark, n, blk, 32).collect()(0)
    info(f"restarts=${row.getAs[Int]("restarts")} iters=${row.getAs[Int]("iters")} " +
      f"delta=${row.getAs[Double]("delta")}%.4f resid=${row.getAs[Double]("resid_rel")}%.2e " +
      f"err=${row.getAs[Double]("err_rel")}%.2e")
    assert(row.getAs[Boolean]("pass"), row.toString)
    val delta = row.getAs[Double]("delta")
    // the SAME skew system assembled locally, with the SAME self-tuned
    // δ the distributed power iteration produced
    val aLoc = Array.ofDim[Double](n, n)
    for (bi <- 0 until q; bj <- 0 until q) {
      val a = MatrixGen.localBlock(blk, seed, bi, bj, 0.0)
      val b = MatrixGen.localBlock(blk, seed, bj, bi, 0.0)
      for (i <- 0 until blk; j <- 0 until blk) {
        aLoc(bi * blk + i)(bj * blk + j) = (a(i)(j) - b(j)(i)) / 2 +
          (if (bi == bj && i == j) delta else 0.0)
      }
    }
    // skew + δI really is what it claims: A + Aᵀ = 2δI
    val symOff = (for (i <- 0 until n; j <- 0 until n if i != j) yield
      math.abs(aLoc(i)(j) + aLoc(j)(i))).max
    assert(symOff < 1e-12, s"off-diagonal symmetrization residue $symOff")
    val xStar = Array.tabulate(n)(i => 1.0 + (i % 7) * 0.25)
    val bLoc = aLoc.map { r0 =>
      var acc = 0.0; var i = 0
      while (i < n) { acc += r0(i) * xStar(i); i += 1 }
      acc
    }
    // independent driver-local Gaussian elimination recovers the same
    // planted x* the gate checked — the m18-spec sandwich
    val m0 = aLoc.map(_.clone()); val bb = bLoc.clone()
    for (k <- 0 until n) {
      val piv = (k until n).maxBy(i => math.abs(m0(i)(k)))
      val tr = m0(k); m0(k) = m0(piv); m0(piv) = tr
      val tb = bb(k); bb(k) = bb(piv); bb(piv) = tb
      for (i <- k + 1 until n) {
        val f = m0(i)(k) / m0(k)(k)
        for (j <- k until n) m0(i)(j) -= f * m0(k)(j)
        bb(i) -= f * bb(k)
      }
    }
    val xLu = new Array[Double](n)
    for (i <- n - 1 to 0 by -1) {
      var acc = bb(i)
      for (j <- i + 1 until n) acc -= m0(i)(j) * xLu(j)
      xLu(i) = acc / m0(i)(i)
    }
    val luErr = xLu.zip(xStar).map { case (a, b) => math.abs(a - b) }.max
    assert(luErr < 1e-8, s"local LU drifted from planted x* by $luErr")
    // the STRUGGLE has teeth: m18's exact BiCGSTAB recurrence, run
    // driver-locally on this system, must FAIL the 1e-10 target —
    // its real degree-1 stabilizer cannot damp the δ ± iσ spectrum
    // (σ/δ = 7). Breakdown or iteration-cap stagnation both count.
    def mv(v: Array[Double]): Array[Double] = {
      val y = new Array[Double](n)
      var i = 0
      while (i < n) {
        var acc = 0.0; var j = 0
        while (j < n) { acc += aLoc(i)(j) * v(j); j += 1 }
        y(i) = acc; i += 1
      }
      y
    }
    def d(u: Array[Double], v: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < n) { acc += u(i) * v(i); i += 1 }
      acc
    }
    val bn = math.sqrt(d(bLoc, bLoc))
    var x = new Array[Double](n); var r = bLoc.clone()
    val rHat = bLoc.clone(); var p = r.clone()
    var rho = bn * bn; var rn2 = rho; var it = 0; var bd = false
    while (it < n && math.sqrt(rn2) / bn > 1e-12 && !bd) {
      val av = mv(p); val rhv = d(rHat, av)
      if (math.abs(rhv) < 1e-300) bd = true
      else {
        val alpha = rho / rhv
        val sv = Array.tabulate(n)(i => r(i) - alpha * av(i))
        val t = mv(sv); val ts = d(sv, t); val tt = d(t, t)
        if (tt < 1e-300) {
          x = Array.tabulate(n)(i => x(i) + alpha * p(i)); rn2 = 0.0; it += 1
        } else {
          val omega = ts / tt
          val xN = Array.tabulate(n)(i => x(i) + alpha * p(i) + omega * sv(i))
          val rN = Array.tabulate(n)(i => sv(i) - omega * t(i))
          val rhoN = d(rHat, rN); val rN2 = d(rN, rN)
          if (math.abs(omega) < 1e-300 ||
              (math.abs(rhoN) < 1e-300 && math.sqrt(rN2) / bn > 1e-12)) bd = true
          else {
            val beta2 = (rhoN / rho) * (alpha / omega)
            p = Array.tabulate(n)(i => rN(i) + beta2 * (p(i) - omega * av(i)))
            x = xN; r = rN; rho = rhoN; rn2 = rN2
          }
          it += 1
        }
      }
    }
    val axb = mv(x).zip(bLoc).map { case (a, b) => a - b }
    val bicgRes = math.sqrt(d(axb, axb)) / bn
    info(f"local BiCGSTAB on the skew system: it=$it breakdown=$bd resid=$bicgRes%.2e")
    assert(bd || bicgRes > 1e-9,
      f"BiCGSTAB reached $bicgRes%.2e here — the 'GMRES-only' system claim " +
        "is vacuous; re-skew the construction")
  }

  test("rank-deficient tall solve: ridge fallback engages and matches a local oracle") {
    val m = 512; val d = 8; val blk = 32
    // duplicate column 6 into column 7 → numerical rank d-1
    val full = TallSkinny.tallRows(sc, m, d, blk, seed)
    val rows = full.map { case (i, v) =>
      val w = v.clone(); w(d - 1) = w(d - 2); (i, w)
    }
    val r = TallSkinny.tsqrR(rows, d)
    assert(TallSkinny.diagRank(r) == d - 1, s"diagRank=${TallSkinny.diagRank(r)}")
    val xTrue = Array.tabulate(d)(j => (j + 1).toDouble / 4)
    val rowsWithB = rows.map { case (_, v) =>
      (v, v.zip(xTrue).map { case (a, b) => a * b }.sum)
    }
    val lambda = 1e-8
    val (x, fullRank) = TallSkinny.lstsqAuto(rowsWithB, r, d, lambda)
    assert(!fullRank, "auto path must take the ridge branch on deficient R")
    // driver-local ridge oracle over the same rows
    val al = rows.collect().sortBy(_._1).map(_._2)
    val g = LocalLA.gemm(LocalLA.transpose(al), al)
    val atb = new Array[Double](d)
    val alOrdered = rows.collect().sortBy(_._1)
    val blOrdered = alOrdered.map { case (_, v) =>
      v.zip(xTrue).map { case (a, b) => a * b }.sum }
    for (i <- alOrdered.indices; j <- 0 until d)
      atb(j) += alOrdered(i)._2(j) * blOrdered(i)
    val dmax = (0 until d).map(i => math.abs(r(i)(i))).max
    for (i <- 0 until d) g(i)(i) += lambda * dmax * dmax
    val l = LocalLA.cholesky(g)
    val xl = LocalLA.backSolveUpper(LocalLA.transpose(l),
      LocalLA.forwardSolveLower(l, atb.map(Array(_)))).map(_(0))
    val rel = x.zip(xl).map { case (a, b) => math.abs(a - b) }.max /
      xl.map(math.abs).max
    // κ(AᵀA + λs²I) ≈ 1/λ = 1e8 on the deficient directions, so eps-level
    // differences between RᵀR (distributed) and AᵀA (local) amplify to
    // ~1e-8 in x; 1e-6 leaves two orders of margin above that floor
    assert(rel < 1e-6, s"distributed ridge diverged from local oracle: $rel")
    // the ridge solution reproduces the fitted values even though x is
    // not unique: A·x ≈ A·xTrue
    val ax = LocalLA.gemm(al, x.map(Array(_))).map(_(0))
    val axTrue = LocalLA.gemm(al, xTrue.map(Array(_))).map(_(0))
    val fitErr = ax.zip(axTrue).map { case (a, b) => math.abs(a - b) }.max /
      axTrue.map(math.abs).max
    assert(fitErr < 1e-5, s"ridge fit drifted: $fitErr")
    // full-rank input: auto == pure QR path, unchanged
    val rFull = TallSkinny.tsqrR(full, d)
    val bFull = full.map { case (_, v) =>
      (v, v.zip(xTrue).map { case (a, b) => a * b }.sum) }
    val (xF, fr) = TallSkinny.lstsqAuto(bFull, rFull, d)
    assert(fr)
    // same code path, but treeReduce merges task partials in completion
    // order → ULP-level run-to-run drift; compare with tolerance
    val xQR = TallSkinny.lstsqQR(bFull, rFull, d)
    assert(xF.zip(xQR).map { case (a, b) => math.abs(a - b) }.max < 1e-12)
  }

  test("qrR handles wide/short partitions (m < d trapezoids stack correctly)") {
    val d = 8
    // 3-row partitions: every local QR sees m < d and emits a trapezoid
    val rows = TallSkinny.tallRows(sc, 64, d, 16, seed).repartition(21)
    val r = TallSkinny.tsqrR(rows, d)
    val rl = LocalLA.canonUpper(LocalLA.qrR(
      rows.collect().sortBy(_._1).map(_._2)))
    val scale = rl.map(_.map(math.abs).max).max
    assert(LocalLA.maxAbsDiff(r, rl) / scale < 1e-12)
  }

  test("m20: Arnoldi Ritz pairs sit within their own residual bounds of " +
    "a driver-side dgeev on the same operator (normality made concrete)") {
    val n = 256; val blk = 64; val q = n / blk
    val rows = MatrixQueries.m20At(spark, n, blk, 64).collect()
    assert(rows.forall(_.getAs[Boolean]("pass")), rows.mkString("\n"))
    val delta = rows(0).getAs[Double]("delta")
    info(f"m20 delta=$delta%.4f sigmaHat=${rows(0).getAs[Double]("sigma_hat")}%.4f " +
      f"top resid=${rows(0).getAs[Double]("resid_rel")}%.2e")
    // the SAME operator assembled locally with the SAME self-tuned δ
    val aLoc = Array.ofDim[Double](n, n)
    for (bi <- 0 until q; bj <- 0 until q) {
      val a = MatrixGen.localBlock(blk, seed, bi, bj, 0.0)
      val b = MatrixGen.localBlock(blk, seed, bj, bi, 0.0)
      for (i <- 0 until blk; j <- 0 until blk) {
        aLoc(bi * blk + i)(bj * blk + j) = (a(i)(j) - b(j)(i)) / 2 +
          (if (bi == bj && i == j) delta else 0.0)
      }
    }
    // independent reference spectrum: LAPACK dgeev on the driver
    val dm = new breeze.linalg.DenseMatrix[Double](n, n)
    for (i <- 0 until n; j <- 0 until n) dm(i, j) = aLoc(i)(j)
    val ref = breeze.linalg.eig(dm)
    // A = δI + S is NORMAL ⇒ each Ritz value λ̃ with residual bound r
    // satisfies min_k |λ̃ − λ_k| ≤ r — assert exactly that, with a
    // 1e-9·scale slack for the reference's own rounding
    val scale = rows(0).getAs[Double]("sigma_hat") * math.sqrt(1 + 1.0 / 49)
    rows.foreach { row =>
      val re = row.getAs[Double]("re"); val im = row.getAs[Double]("im")
      val r = row.getAs[Double]("resid_rel") * scale
      val dmin = (0 until n).map(k => math.hypot(
        re - ref.eigenvalues(k), im - ref.eigenvaluesComplex(k))).min
      assert(dmin <= r + 1e-9 * scale,
        f"Ritz ($re%.6f, $im%.6f) is $dmin%.2e from the reference spectrum, bound $r%.2e")
    }
    // the dominant reference pair is what rank 1 found
    val refImMax = (0 until n).map(k => ref.eigenvaluesComplex(k)).max
    assert(math.abs(math.abs(rows(0).getAs[Double]("im")) - refImMax) < 1e-8,
      "rank-1 Ritz pair is not the reference's dominant pair")
    // every reference eigenvalue really has real part δ — the re_ok
    // gate's premise, checked against LAPACK instead of our own math
    val reDev = (0 until n).map(k => math.abs(ref.eigenvalues(k) - delta)).max
    assert(reDev < 1e-10 * math.max(1.0, scale), s"spectrum premise broke: $reDev")
  }

  test("Verify invariant gate: a false pass column turns the query red") {
    import spark.implicits._
    assert(Verify.gateInvariants(Seq((1, true)).toDF("n", "pass")).count() == 1)
    assert(Verify.gateInvariants(Seq((1, 2)).toDF("n", "m")).count() == 1)
    val e = intercept[IllegalStateException] {
      Verify.gateInvariants(Seq((1, true), (2, false)).toDF("n", "pass"))
    }
    assert(e.getMessage.contains("invariant violated"))
    intercept[IllegalStateException] {
      Verify.gateInvariants(Seq((1, false)).toDF("n", "roundtrip_ok"))
    }
  }
}
