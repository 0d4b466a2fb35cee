package graft.functions

import org.apache.spark.sql.Column

/** Public face of the native vector expressions. The implementation
  * lives in `org.apache.spark.sql.graft` (see VectorExpressions.scala)
  * because building a `Column` from a raw Catalyst `Expression` and
  * declaring `inputTypes` use `private[sql]` API — the standard
  * extension-library pattern. */
object VectorFunctions {
  def vecDot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.vecDot(a, b)
  def vecNorm2(a: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.vecNorm2(a)
  /** Top-k nearest anchor cells (best first) as a narrow codegen'd
    * projection — the shuffle-free IVF assignment; see
    * `org.apache.spark.sql.graft.TopCells`. */
  def topCells(v: Column, nrm: Column,
               anchors: Array[(Int, Array[Double])], k: Int): Column =
    org.apache.spark.sql.graft.VectorFunctions.topCells(v, nrm, anchors, k)
  /** Two-level routed variant — scores √nAnchors coarse centroids,
    * then only the probed groups' member anchors; see
    * `org.apache.spark.sql.graft.TopCellsRouted` and
    * [[graft.operators.CellRouter]]. */
  def topCellsRouted(v: Column, nrm: Column,
                     router: graft.operators.CellRouter, k: Int): Column =
    org.apache.spark.sql.graft.VectorFunctions.topCellsRouted(v, nrm, router, k)
  /** `CAST(embedding AS array<double>)` materialize-once (see
    * `org.apache.spark.sql.graft.VecToDouble` — Cast is collapse-cheap
    * and gets re-evaluated per reference). */
  def toDoubleArray(a: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.toDoubleArray(a)
  /** Exact integral dot `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, +)`
    * as a codegen'd loop; sides may differ in integral element type. */
  def vecDotInt(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.vecDotInt(a, b)
  /** Exact integral Σx² `aggregate(transform(q, x -> x*x), 0L, +)`. */
  def vecNorm2Int(a: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.vecNorm2Int(a)
  /** `array_max(transform(v, x -> abs(x)))` as a codegen'd loop. */
  def vecMaxAbs(a: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.vecMaxAbs(a)
  /** x8's symmetric int8 quantization codes — bit-identical to the
    * `transform(... round(x / scale * 127, 0) ...)` HOF form. */
  def int8Codes(v: Column, scale: Column): Column =
    org.apache.spark.sql.graft.VectorFunctions.int8Codes(v, scale)
}

/** Public face of the native text-fingerprint expressions (same
  * extension-library pattern as [[VectorFunctions]]); see
  * `org.apache.spark.sql.graft.Gram8`. */
object TextFunctions {
  /** `array_min(transform(sequence(1, greatest(length(t)-7, 1)), i ->
    * md5(substring(t, i, 8))))` as one allocation-free pass. */
  def gram8MinMd5(t: Column): Column =
    org.apache.spark.sql.graft.TextFunctions.gram8MinMd5(t)
  /** `size(array_distinct(transform(..., i -> substring(t, i, 8))))`
    * as the same single window walk. */
  def gram8DistinctCount(t: Column): Column =
    org.apache.spark.sql.graft.TextFunctions.gram8DistinctCount(t)
  /** Every k-token-window md5 (16-byte binary), one pass per row —
    * `transform(sequence(0, size(w)-k), i -> unhex(md5(array_join(slice(w, i+1, k), ' '))))`. */
  def wordGramMd5(w: Column, k: Int): Column =
    org.apache.spark.sql.graft.TextFunctions.wordGramMd5(w, k)
}

/** Public face of the native sketch expressions (same extension-library
  * pattern as [[VectorFunctions]]). */
object SketchFunctions {
  def bloomMightContainLong(bf: org.apache.spark.util.sketch.BloomFilter,
                            key: Column): Column =
    org.apache.spark.sql.graft.SketchFunctions.bloomMightContainLong(bf, key)
}
