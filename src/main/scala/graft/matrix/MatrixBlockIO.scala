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

  /** Windowed, optionally transposed read (operator O2 semantics —
    * reference read_matrix, /root/reference/Matrix/LUDecomposition
    * .java:204-272): fills `a` with the overlap between the file's
    * in-band extent and the target window starting at (i0, j0) in
    * global coordinates, seeking past everything else — only the 16-
    * byte header and the overlapping row segments are read from disk
    * (the reference buffers the whole file; this reads strictly the
    * overlap). With `transposed`, the window spans i0 ≤ i < i0+a(0)
    * .length, j0 ≤ j < j0+a.length in FILE coordinates and lands as
    * a(j-j0)(i-i0) — exactly the reference's 'T' mode. No-op if the
    * file does not intersect the window. */
  def readWindow(path: String, i0: Int, j0: Int, a: Array[Array[Double]],
                 transposed: Boolean = false): Unit = {
    val ch = java.nio.channels.FileChannel.open(
      Paths.get(path), java.nio.file.StandardOpenOption.READ)
    try {
      val hdr = java.nio.ByteBuffer.allocate(16)
      var hRead = 0
      while (hRead < 16) {
        val r = ch.read(hdr, hRead)
        if (r < 0) throw new EOFException(s"$path: short header")
        hRead += r
      }
      hdr.flip()
      val x0 = hdr.getInt; val x1 = hdr.getInt
      val y0 = hdr.getInt; val y1 = hdr.getInt
      val (rows, cols) = if (transposed) (a(0).length, a.length) else (a.length, a(0).length)
      val i1 = i0 + rows; val j1 = j0 + cols
      val yn = y1 - y0
      if (x1 - x0 <= 0 || yn <= 0) return
      val xst = math.max(i0, x0); val xsp = math.min(i1, x1)
      val yst = math.max(j0, y0); val ysp = math.min(j1, y1)
      if (xst >= xsp || yst >= ysp) return
      val rowBytes = 4L + 8L * yn
      val buf = java.nio.ByteBuffer.allocate(8 * (ysp - yst))
      var i = xst
      while (i < xsp) {
        // 16-byte header, (i−x0) full rows, the 4-byte row index, then
        // (yst−y0) doubles to the first overlapping column
        val off = 16L + (i - x0) * rowBytes + 4L + 8L * (yst - y0)
        buf.clear()
        var read = 0
        while (read < buf.capacity) {
          val r = ch.read(buf, off + read)
          if (r < 0) throw new EOFException(s"$path: truncated row ${i - x0}")
          read += r
        }
        buf.flip()
        var j = yst
        while (j < ysp) {
          val v = buf.getDouble
          if (transposed) a(j - j0)(i - i0) = v else a(i - i0)(j - j0) = v
          j += 1
        }
        i += 1
      }
    } finally ch.close()
  }

  /** Per-task distributed sink (operator O6 — the reference's
    * save_matrix, /root/reference/Matrix/LUDecomposition.java:388-408,
    * which every reduce task calls for its own block): each partition
    * writes its own blocks as `dir/<name>.<i0>.<j0>`, so a large matrix
    * never funnels through the driver. File names carry the extent for
    * glob-addressable windowed re-reads. */
  def writeBlocks(blocks: RDD[RefBlock], dir: String, name: String = "A"): Unit = {
    Files.createDirectories(Paths.get(dir))
    blocks.foreachPartition { it =>
      it.foreach { b =>
        Files.createDirectories(Paths.get(dir))
        write(s"$dir/$name.${b.i0}.${b.j0}", b)
      }
    }
  }

  /** Bridge: BlockModel grid blocks → reference-format blocks (global
    * extents from the block index, natural row indices). */
  def toRefBlocks(blocks: BlockModel.Blocks, blk: Int): RDD[RefBlock] =
    blocks.map { case ((bi, bj), m) =>
      val d = BlockModel.toDense(m)
      val data = LocalLA.fromDM(d)
      RefBlock(bi * blk, bi * blk + d.numRows, bj * blk, bj * blk + d.numCols,
        Array.tabulate(d.numRows)(r => bi * blk + r), data)
    }
}
