package graft.matrix

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.nio.file.{Files, Paths}
import org.apache.spark.SparkContext
import org.apache.spark.rdd.RDD

/** Codec for the reference's dense binary block format (operators O2/O6):
  *
  *   int32 i0, i1, j0, j1            // global extent [i0,i1) × [j0,j1)
  *   repeat (i1-i0):
  *     int32 rowIndex                // global row number
  *     float64 × (j1-j0)             // row-major values
  *
  * Big-endian Java DataOutput, exactly as written by
  * /root/reference/data/MakeData.java:19-28 and
  * /root/reference/Matrix/LUDecomposition.java:388-408 (save_matrix),
  * and as read back windowed at :204-272. The golden fixtures
  * /root/reference/out/A.0 and out/A.1 are 512×512 blocks of this format
  * (FIXTURES.md A2) and must survive a byte-identical round trip (M6).
  */
object MatrixBlockIO {

  final case class RefBlock(i0: Int, i1: Int, j0: Int, j1: Int,
                            rowIndex: Array[Int], data: Array[Array[Double]]) {
    def numRows: Int = i1 - i0
    def numCols: Int = j1 - j0
  }

  def decode(bytes: Array[Byte]): RefBlock = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val i0 = in.readInt(); val i1 = in.readInt()
    val j0 = in.readInt(); val j1 = in.readInt()
    val nr = i1 - i0; val nc = j1 - j0
    val idx = new Array[Int](nr)
    val data = Array.ofDim[Double](nr, nc)
    var r = 0
    while (r < nr) {
      idx(r) = in.readInt()
      var c = 0
      while (c < nc) { data(r)(c) = in.readDouble(); c += 1 }
      r += 1
    }
    if (in.read() != -1) throw new EOFException("trailing bytes after block payload")
    RefBlock(i0, i1, j0, j1, idx, data)
  }

  def encode(b: RefBlock): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + b.numRows * (4 + 8 * b.numCols))
    val out = new DataOutputStream(bos)
    out.writeInt(b.i0); out.writeInt(b.i1); out.writeInt(b.j0); out.writeInt(b.j1)
    var r = 0
    while (r < b.numRows) {
      out.writeInt(b.rowIndex(r))
      var c = 0
      while (c < b.numCols) { out.writeDouble(b.data(r)(c)); c += 1 }
      r += 1
    }
    out.flush()
    bos.toByteArray
  }

  def read(path: String): RefBlock = decode(Files.readAllBytes(Paths.get(path)))

  def write(path: String, b: RefBlock): Unit =
    Files.write(Paths.get(path), encode(b))

  /** Distributed scan of a directory of reference block files — the Spark
    * analog of the reference's manifest fan-out with one I/O thread per
    * child (/root/reference/Matrix/LUDecomposition.java:274-335): Spark's
    * binaryFiles source parallelizes over files natively. */
  def readBlocks(sc: SparkContext, pathGlob: String): RDD[RefBlock] =
    sc.binaryFiles(pathGlob).map { case (_, stream) => decode(stream.toArray()) }
}
