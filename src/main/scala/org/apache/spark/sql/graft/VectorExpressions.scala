package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expressions for the vector hot path.
  *
  * The HOF forms (`aggregate(zip_with(a, b, (x,y) -> x*y), 0D, +)`)
  * are evaluated interpreted — one virtual call + boxing per element —
  * which made brute-force cosine scans the bench bottleneck. These
  * expressions emit a tight primitive loop inside whole-stage codegen
  * (SURVEY.md guidance: native Expression > UDF). Summation order is
  * the same sequential left-to-right fold as the HOF form and DuckDB's
  * `SUM(x ORDER BY i)`, so oracle hashes are unchanged.
  *
  * Elements are assumed non-null (the engine builds these arrays from
  * parquet floats via [[VecToDouble]], which preserves nulls but never
  * receives any from the engine's embedding tables).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Σ xᵢ² — the squared L2 norm, same sequential order as
  * `aggregate(transform(v, x -> x*x), 0D, +)`. */
case class VecNorm2(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm2"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0; var i = 0
    while (i < n) { val v = x.getDouble(i); acc += v * v; i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm2 =
    copy(child = newChild)
}

/** Top-k nearest IVF cells of a vector against a FIXED anchor set — the
  * shuffle-free cell assignment for the IVF/SemDeDup family (s3/s6/p7).
  *
  * The anchors ride the expression as reference objects (`cells` ids
  * ascending, `flat` row-major anchor values, `norms` their L2 norms),
  * so assignment is one narrow codegen'd projection per corpus row: no
  * cross join against the anchor table, no `row_number` window, no
  * Exchange — the round-4 finding was that the window formulation sort-
  * shuffled corpus×anchors ≈ n·√n full-width rows to compute this
  * per-row argmax.
  *
  * Semantics match the window form `row_number over (partition by
  * vec_id order by sim desc, cell asc) <= k` bit-for-bit: sim is
  * `vecDot(v, anchor) / (nrm · anchorNorm)` with the same sequential
  * fold as [[VecDot]], insertion keeps earlier (lower-id) cells ahead
  * on sim ties, and a full list is only evicted on strictly greater
  * sim. Output: array<int> of the k best cell ids, best first.
  */
case class TopCells(left: Expression, right: Expression,
                    cells: Array[Int], flat: Array[Double],
                    norms: Array[Double], k: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(cells.nonEmpty && flat.length % cells.length == 0 && k >= 1)
  private val dim = flat.length / cells.length

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    val kk = math.min(k, cells.length)
    val topSim = new Array[Double](kk)
    val topCell = new Array[Int](kk)
    var filled = 0
    var c = 0
    while (c < cells.length) {
      var dot = 0.0; var i = 0; val off = c * dim
      while (i < dim) { dot += v.getDouble(i) * flat(off + i); i += 1 }
      val sim = dot / (nrm * norms(c))
      if (filled < kk || sim > topSim(filled - 1)) {
        var pos = if (filled < kk) filled else kk - 1
        while (pos > 0 && sim > topSim(pos - 1)) {
          topSim(pos) = topSim(pos - 1); topCell(pos) = topCell(pos - 1); pos -= 1
        }
        topSim(pos) = sim; topCell(pos) = cells(c)
        if (filled < kk) filled += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(topCell, filled))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
      val flatRef = ctx.addReferenceObj("flat", flat, "double[]")
      val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
      val kk = ctx.freshName("kk"); val ts = ctx.freshName("topSim")
      val tc = ctx.freshName("topCell"); val fl = ctx.freshName("filled")
      val c = ctx.freshName("c"); val dot = ctx.freshName("dot")
      val i = ctx.freshName("i"); val off = ctx.freshName("off")
      val sim = ctx.freshName("sim"); val pos = ctx.freshName("pos")
      s"""
         |int $kk = java.lang.Math.min($k, $cellsRef.length);
         |double[] $ts = new double[$kk];
         |int[] $tc = new int[$kk];
         |int $fl = 0;
         |for (int $c = 0; $c < $cellsRef.length; $c++) {
         |  double $dot = 0.0;
         |  int $off = $c * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $dot += $a.getDouble($i) * $flatRef[$off + $i];
         |  }
         |  double $sim = $dot / ($b * $normsRef[$c]);
         |  if ($fl < $kk || $sim > $ts[$fl - 1]) {
         |    int $pos = ($fl < $kk) ? $fl : $kk - 1;
         |    while ($pos > 0 && $sim > $ts[$pos - 1]) {
         |      $ts[$pos] = $ts[$pos - 1]; $tc[$pos] = $tc[$pos - 1]; $pos--;
         |    }
         |    $ts[$pos] = $sim; $tc[$pos] = $cellsRef[$c];
         |    if ($fl < $kk) $fl++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($tc, $fl));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopCells =
    copy(left = newLeft, right = newRight)
}

/** Two-level (coarse-quantized) top-k cell assignment — [[TopCells]]
  * with the anchor scan routed through a coarse layer: score the
  * ≈√nAnchors coarse centroids, keep the best `wProbe` groups, then
  * score only their member anchors. Per-row cost drops from
  * O(nAnchors·dim) to O((√nAnchors + wProbe·√nAnchors)·dim) — the fix
  * for the n·√n assignment term that dominated index builds once the
  * kNN kernel went linear (round-15 verdict #1). Coverage is pruned,
  * scores are exact; ranking is the same (sim desc, cell asc) as
  * [[TopCells]], here via an explicit id tie-break because the member
  * scan is group-major, not cell-ascending. With `wProbe ≥ nGroups`
  * the candidate set is complete and the output equals [[TopCells]]
  * bit-for-bit (spec-proven).
  *
  * Arrays arrive prebuilt from [[graft.operators.CellRouter]]: fine
  * anchors (`cells`/`flat`/`norms`, cell-id ascending), coarse
  * centroids (`gFlat`/`gNorms`), CSR membership (`gStart`/`mIdx`). */
case class TopCellsRouted(left: Expression, right: Expression,
                          cells: Array[Int], flat: Array[Double],
                          norms: Array[Double],
                          gFlat: Array[Double], gNorms: Array[Double],
                          gStart: Array[Int], mIdx: Array[Int],
                          k: Int, wProbe: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(cells.nonEmpty && flat.length % cells.length == 0 && k >= 1 &&
    wProbe >= 1 && gNorms.nonEmpty &&
    gStart.length == gNorms.length + 1 && mIdx.length == cells.length)
  private val dim = flat.length / cells.length

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "top_cells_routed"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    val ng = gNorms.length
    val wp = math.min(wProbe, ng)
    val gSim = new Array[Double](wp)
    val gId = new Array[Int](wp)
    var gf = 0
    var g = 0
    while (g < ng) {
      var dot = 0.0; var i = 0; val off = g * dim
      while (i < dim) { dot += v.getDouble(i) * gFlat(off + i); i += 1 }
      val sim = dot / (nrm * gNorms(g))
      if (gf < wp || sim > gSim(gf - 1)) { // ascending g scan keeps lower g on ties
        var pos = if (gf < wp) gf else wp - 1
        while (pos > 0 && sim > gSim(pos - 1)) {
          gSim(pos) = gSim(pos - 1); gId(pos) = gId(pos - 1); pos -= 1
        }
        gSim(pos) = sim; gId(pos) = g
        if (gf < wp) gf += 1
      }
      g += 1
    }
    val kk = math.min(k, cells.length)
    val ts = new Array[Double](kk)
    val tc = new Array[Int](kk)
    var fl = 0
    var gi = 0
    while (gi < gf) {
      val gg = gId(gi)
      var mi = gStart(gg)
      while (mi < gStart(gg + 1)) {
        val c = mIdx(mi)
        var dot = 0.0; var i = 0; val off = c * dim
        while (i < dim) { dot += v.getDouble(i) * flat(off + i); i += 1 }
        val sim = dot / (nrm * norms(c))
        val cell = cells(c)
        if (fl < kk || sim > ts(fl - 1) ||
            (sim == ts(fl - 1) && cell < tc(fl - 1))) {
          var pos = if (fl < kk) fl else kk - 1
          while (pos > 0 && (sim > ts(pos - 1) ||
              (sim == ts(pos - 1) && cell < tc(pos - 1)))) {
            ts(pos) = ts(pos - 1); tc(pos) = tc(pos - 1); pos -= 1
          }
          ts(pos) = sim; tc(pos) = cell
          if (fl < kk) fl += 1
        }
        mi += 1
      }
      gi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(tc, fl))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
      val flatRef = ctx.addReferenceObj("flat", flat, "double[]")
      val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
      val gFlatRef = ctx.addReferenceObj("gFlat", gFlat, "double[]")
      val gNormsRef = ctx.addReferenceObj("gNorms", gNorms, "double[]")
      val gStartRef = ctx.addReferenceObj("gStart", gStart, "int[]")
      val mIdxRef = ctx.addReferenceObj("mIdx", mIdx, "int[]")
      val wp = ctx.freshName("wp"); val gSim = ctx.freshName("gSim")
      val gId = ctx.freshName("gId"); val gf = ctx.freshName("gf")
      val g = ctx.freshName("g"); val gi = ctx.freshName("gi")
      val mi = ctx.freshName("mi"); val c = ctx.freshName("c")
      val kk = ctx.freshName("kk"); val ts = ctx.freshName("ts")
      val tc = ctx.freshName("tc"); val fl = ctx.freshName("fl")
      val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      val off = ctx.freshName("off"); val sim = ctx.freshName("sim")
      val pos = ctx.freshName("pos"); val cell = ctx.freshName("cell")
      s"""
         |int $wp = java.lang.Math.min($wProbe, $gNormsRef.length);
         |double[] $gSim = new double[$wp];
         |int[] $gId = new int[$wp];
         |int $gf = 0;
         |for (int $g = 0; $g < $gNormsRef.length; $g++) {
         |  double $dot = 0.0;
         |  int $off = $g * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $dot += $a.getDouble($i) * $gFlatRef[$off + $i];
         |  }
         |  double $sim = $dot / ($b * $gNormsRef[$g]);
         |  if ($gf < $wp || $sim > $gSim[$gf - 1]) {
         |    int $pos = ($gf < $wp) ? $gf : $wp - 1;
         |    while ($pos > 0 && $sim > $gSim[$pos - 1]) {
         |      $gSim[$pos] = $gSim[$pos - 1]; $gId[$pos] = $gId[$pos - 1]; $pos--;
         |    }
         |    $gSim[$pos] = $sim; $gId[$pos] = $g;
         |    if ($gf < $wp) $gf++;
         |  }
         |}
         |int $kk = java.lang.Math.min($k, $cellsRef.length);
         |double[] $ts = new double[$kk];
         |int[] $tc = new int[$kk];
         |int $fl = 0;
         |for (int $gi = 0; $gi < $gf; $gi++) {
         |  for (int $mi = $gStartRef[$gId[$gi]]; $mi < $gStartRef[$gId[$gi] + 1]; $mi++) {
         |    int $c = $mIdxRef[$mi];
         |    double $dot = 0.0;
         |    int $off = $c * $dim;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += $a.getDouble($i) * $flatRef[$off + $i];
         |    }
         |    double $sim = $dot / ($b * $normsRef[$c]);
         |    int $cell = $cellsRef[$c];
         |    if ($fl < $kk || $sim > $ts[$fl - 1] ||
         |        ($sim == $ts[$fl - 1] && $cell < $tc[$fl - 1])) {
         |      int $pos = ($fl < $kk) ? $fl : $kk - 1;
         |      while ($pos > 0 && ($sim > $ts[$pos - 1] ||
         |          ($sim == $ts[$pos - 1] && $cell < $tc[$pos - 1]))) {
         |        $ts[$pos] = $ts[$pos - 1]; $tc[$pos] = $tc[$pos - 1]; $pos--;
         |      }
         |      $ts[$pos] = $sim; $tc[$pos] = $cell;
         |      if ($fl < $kk) $fl++;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($tc, $fl));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopCellsRouted =
    copy(left = newLeft, right = newRight)
}

/** Shared bits for the integral-array expressions: Spark's higher-order
  * functions (`transform`/`aggregate`/`zip_with`) are CodegenFallback —
  * one interpreted lambda call + boxing PER ELEMENT — which made the
  * int8 scoring scans (s5/s6/s7-family probes) and the quantization
  * projections measurably lambda-bound (round-16 optimization pass;
  * guide §1.2 step 2). Each expression below is the exact integer/
  * fixed-order-double semantics of the HOF form it replaces, emitted
  * as a tight primitive loop under whole-stage codegen. */
private[graft] object IntArrays {
  import org.apache.spark.sql.types._
  def isIntegral(dt: DataType): Boolean = dt match {
    case ArrayType(ByteType | ShortType | IntegerType | LongType, _) => true
    case _ => false
  }
  def elem(dt: DataType): DataType =
    dt.asInstanceOf[ArrayType].elementType
  /** Java accessor snippet yielding a long for element `i` of `arr`. */
  def getLong(et: DataType, arr: String, i: String): String = et match {
    case ByteType => s"(long) $arr.getByte($i)"
    case ShortType => s"(long) $arr.getShort($i)"
    case IntegerType => s"(long) $arr.getInt($i)"
    case _ => s"$arr.getLong($i)"
  }
  /** Interpreted accessor matching [[getLong]]. */
  def getter(et: DataType): (ArrayData, Int) => Long = et match {
    case ByteType => (a, i) => a.getByte(i).toLong
    case ShortType => (a, i) => a.getShort(i).toLong
    case IntegerType => (a, i) => a.getInt(i).toLong
    case _ => (a, i) => a.getLong(i)
  }
}

/** Σ aᵢ·bᵢ over two integral arrays as one exact long fold — replaces
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)`.
  * Integer arithmetic: bit-identical at any evaluation order, and the
  * element types may differ per side (the stored codes are
  * array<tinyint>, in-query codes array<bigint> — scoring reads both
  * without a per-row cast-copy). */
case class VecDotInt(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (IntArrays.isIntegral(left.dataType) && IntArrays.isIntegral(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot_int expects integral arrays, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_dot_int"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val gx = IntArrays.getter(IntArrays.elem(left.dataType))
    val gy = IntArrays.getter(IntArrays.elem(right.dataType))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L; var i = 0
    while (i < n) { acc += gx(x, i) * gy(y, i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val gx = IntArrays.getLong(IntArrays.elem(left.dataType), a, i)
      val gy = IntArrays.getLong(IntArrays.elem(right.dataType), b, i)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ($gx) * ($gy);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDotInt =
    copy(left = newLeft, right = newRight)
}

/** Σ xᵢ² over an integral array as one exact long fold — replaces
  * `aggregate(transform(q, x -> x * x), 0L, (a, v) -> a + v)`. */
case class VecNorm2Int(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (IntArrays.isIntegral(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_norm2_int expects an integral array, got ${child.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "vec_norm2_int"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val g = IntArrays.getter(IntArrays.elem(child.dataType))
    var acc = 0L; var i = 0
    val n = x.numElements()
    while (i < n) { val v = g(x, i); acc += v * v; i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val v = ctx.freshName("v")
      val g = IntArrays.getLong(IntArrays.elem(child.dataType), a, i)
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $g;
         |  $acc += $v * $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm2Int =
    copy(child = newChild)
}

/** max |xᵢ| over a double array — replaces
  * `array_max(transform(v, x -> abs(x)))` (max is order-independent;
  * abs is exact — bit-identical). Empty arrays yield null exactly as
  * `array_max` of an empty array does. */
case class VecMaxAbs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_max_abs"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0) null
    else {
      var m = 0.0; var i = 0
      while (i < n) {
        val v = math.abs(x.getDouble(i)); if (v > m) m = v; i += 1
      }
      m
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val m = ctx.freshName("m"); val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $m = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = java.lang.Math.abs($a.getDouble($i));
         |    if ($v > $m) $m = $v;
         |  }
         |  ${ev.value} = $m;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecMaxAbs =
    copy(child = newChild)
}

/** x8's symmetric int8 quantization as one native projection — replaces
  * `transform(v, x -> CASE WHEN scale = 0D THEN cast(0 AS bigint)
  * ELSE cast(round(x / scale * 127, 0) AS bigint) END)`. Semantics are
  * replicated operation-for-operation: Catalyst's `round(_, 0)` on a
  * double is BigDecimal.valueOf(...).setScale(0, HALF_UP) with NaN/
  * infinity passed through, and `cast(double AS bigint)` is
  * Double.toLong — so the emitted codes are bit-identical to the HOF
  * form (x8's md5-of-codes DuckDB oracle pins this end to end). */
case class Int8Codes(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "int8_codes"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val scale = b.asInstanceOf[Double]
    val n = x.numElements()
    val out = new Array[Long](n)
    if (scale != 0.0) {
      var i = 0
      while (i < n) {
        out(i) = Int8Codes.code(x.getDouble(i), scale)
        i += 1
      }
    }
    // primitive-backed (see [[VecToDouble.widen]]): the codes feed
    // vec_norm2_int/vec_dot_int getLong loops — boxed slots would
    // unbox per element
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      val cls = Int8Codes.getClass.getName.stripSuffix("$")
      s"""
         |int $n = $a.numElements();
         |long[] $out = new long[$n];
         |if ($b != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $cls.code($a.getDouble($i), $b);
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Int8Codes =
    copy(left = newLeft, right = newRight)
}

object Int8Codes {
  /** `cast(round(x / scale * 127, 0) AS bigint)` exactly. */
  def code(x: Double, scale: Double): Long = {
    val d = x / scale * 127
    val r =
      if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
      else java.math.BigDecimal.valueOf(d)
        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
    r.toLong
  }
}

/** `CAST(embedding AS array<double>)` as a non-Cast node. The float →
  * double widening itself is exactly Cast's (codegen'd primitive loop,
  * null elements preserved); the reason this expression exists is
  * OPTIMIZER behavior, not speed of the cast: `CollapseProject` treats
  * `Cast` as collapse-cheap (SPARK-36718) and will inline an aliased
  * array cast into EVERY reference — a projection that reads `v` k
  * times re-materializes the 64-element array k times per row
  * (measured 2× on x29's 16-anchor scoring during the round-16 cast
  * sweep). This node hits CollapseProject's default (not cheap), so an
  * aliased `v` computes once, like the interpreted `transform(...)`
  * form it replaces — but inside whole-stage codegen. */
case class VecToDouble(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "to_double_array"

  override def nullSafeEval(a: Any): Any =
    VecToDouble.widen(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = VecToDouble.getClass.getName.stripSuffix("$")
      s"${ev.value} = $cls.widen($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): VecToDouble =
    copy(child = newChild)
}

object VecToDouble {
  /** Primitive-backed output (UnsafeArrayData.fromPrimitiveArray) on
    * the no-nulls fast path: a boxed GenericArrayData here would make
    * every downstream getDouble unbox — measured 2× on the 16-reference
    * scoring projections the expression exists for. Null elements (not
    * produced by the engine's parquet float arrays, but allowed by the
    * schema) take the boxed path, matching Cast exactly. */
  def widen(x: ArrayData): ArrayData = {
    val n = x.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = x.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = x.getFloat(i).toDouble; i += 1 }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        if (!x.isNullAt(i)) out(i) = x.getFloat(i).toDouble
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}

object VectorFunctions {
  def toDoubleArray(a: Column): Column =
    ExpressionUtils.column(VecToDouble(ExpressionUtils.expression(a)))
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def vecNorm2(a: Column): Column =
    ExpressionUtils.column(VecNorm2(ExpressionUtils.expression(a)))
  def vecDotInt(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDotInt(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def vecNorm2Int(a: Column): Column =
    ExpressionUtils.column(VecNorm2Int(ExpressionUtils.expression(a)))
  def vecMaxAbs(a: Column): Column =
    ExpressionUtils.column(VecMaxAbs(ExpressionUtils.expression(a)))
  def int8Codes(v: Column, scale: Column): Column =
    ExpressionUtils.column(Int8Codes(ExpressionUtils.expression(v), ExpressionUtils.expression(scale)))
  /** `anchors`: (cellId, anchorValues); norms are computed here with the
    * same ascending fold as [[VecNorm2]] so sims match the window form. */
  def topCells(v: Column, nrm: Column,
               anchors: Array[(Int, Array[Double])], k: Int): Column = {
    val sorted = anchors.sortBy(_._1)
    val dim = sorted.head._2.length // local: Scala Seq head on codebook entries
    val cells = sorted.map(_._1)
    val flat = new Array[Double](cells.length * dim)
    val norms = new Array[Double](cells.length)
    var c = 0
    while (c < cells.length) {
      System.arraycopy(sorted(c)._2, 0, flat, c * dim, dim)
      var s2 = 0.0; var i = 0
      while (i < dim) { val x = sorted(c)._2(i); s2 += x * x; i += 1 }
      norms(c) = math.sqrt(s2)
      c += 1
    }
    ExpressionUtils.column(TopCells(ExpressionUtils.expression(v),
      ExpressionUtils.expression(nrm), cells, flat, norms, k))
  }
  /** Routed (two-level) assignment off a prebuilt
    * [[graft.operators.CellRouter]]'s arrays. */
  def topCellsRouted(v: Column, nrm: Column,
                     r: graft.operators.CellRouter, k: Int): Column =
    ExpressionUtils.column(TopCellsRouted(ExpressionUtils.expression(v),
      ExpressionUtils.expression(nrm), r.cells, r.flat, r.norms,
      r.gFlat, r.gNorms, r.gStart, r.mIdx, k, r.wProbe))
}
