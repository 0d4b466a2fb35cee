package graft

import org.apache.spark.sql.SparkSession
import graft.matrix._

/** Matrix-surface baseline runs (BASELINE.md B1-B3): the reference's
  * demo scale — N = 2048 dense (mirroring data/B_2048.txt,
  * /root/reference/Matrix/run.csh:6) with limit(=block) 256, plus the
  * reference's default driver base case N = 1000
  * (/root/reference/Matrix/run.csh:13). Prints one JSON line. */
object BenchMatrix {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("WARN")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val n = if (args.nonEmpty) args(0).toInt else 2048
    val blk = if (args.length > 1) args(1).toInt else 256
    val a = MatrixGen.blocks(sc, n, blk, seed = 42L, diagBoost = n.toDouble).cache()
    a.count()

    // B3: distributed block LU factorization only
    val b3 = time { BlockLU.factor(sc, a, n, blk).l.count() }

    // B1: full inverse end-to-end incl. residual check
    var resid = 0.0
    val b1 = time {
      val ainv = Inversion.inverse(sc, a, n, blk)
      val prod = BlockModel.multiply(a, ainv, blk, n.toLong, n.toLong, n.toLong)
      resid = BlockModel.maxAbsMinusIdentity(prod, blk)
    }

    // B2: driver base-case LU at the reference's limit=1000
    val local = MatrixGen.local(1000, 256, 42L)
    val b2 = time { LocalLA.ludcmp(local.map(_.clone())) }

    // B11: distributed block Cholesky at the same scale — the SPD
    // fast path's measured advantage over LU (same n, same blk)
    val spd = BlockCholesky.spdBlocks(sc, n, blk, seed = 42L, boost = n.toDouble).cache()
    spd.count()
    val b11 = time { BlockCholesky.factor(sc, spd, n, blk).count() }

    println(s"""{"metric":"matrix_total","value":${b1 + b2 + b3 + b11},"unit":"sec","queries":{"b1_inverse_2048":$b1,"b2_local_lu_1000":$b2,"b3_dist_lu_2048":$b3,"b11_cholesky_2048":$b11},"n":$n,"blk":$blk,"residual":$resid}""")
    spark.stop()
  }
}
