package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-probe expression — the codegen'd replacement for a
  * Scala-UDF `mightContainLong` in a fact-scan hot path (the same shape
  * Spark's internal runtime-filter `BloomFilterMightContain` uses: the
  * filter rides the plan as a reference object, the probe is one inlined
  * virtual call per row inside whole-stage codegen, no boxing).
  *
  * The filter is carried SERIALIZED (`bloomBytes`) and deserialized
  * lazily once per executor. Plan-shipping is right for typical
  * dim-side filters (≤ tens of MB — what Spark's own runtime filters
  * inline); for a truly huge filter prefer an explicit broadcast
  * variable + UDF, trading codegen for torrent distribution. */
case class BloomMightContainLong(bloomBytes: Array[Byte], child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $bloomRef.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object SketchFunctions {
  /** Column predicate: `bf.mightContainLong(key)`, codegen'd. */
  def bloomMightContainLong(bf: BloomFilter, key: Column): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    ExpressionUtils.column(
      BloomMightContainLong(bos.toByteArray, ExpressionUtils.expression(key)))
  }
}
