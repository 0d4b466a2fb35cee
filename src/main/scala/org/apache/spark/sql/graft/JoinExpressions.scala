package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper
import org.apache.spark.sql.types.{AbstractDataType, BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Boolean join-residual wrapper over
  * [[graft.operators.Relational.r40CanonicalKeep]] — the canonical-
  * witness admission that prunes provably-redundant candidate pairs
  * before r40's distinct (the exactness argument and the guards live
  * on the Scala predicate's doc). Ordered LAST in the join condition
  * so it evaluates only on candidates the cheap d/w rule already
  * admitted. Real doGenCode (a direct static call on the object's
  * forwarder): a CodegenFallback here would demote the ENTIRE hash
  * join stage out of whole-stage codegen, which costs far more than
  * the predicate itself. */
case class R40Canonical(children: Seq[Expression])
    extends Expression with ExpectsInputTypes {
  require(children.length == 7)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, IntegerType, IntegerType,
      StringType, IntegerType, IntegerType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "r40_canonical"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else graft.operators.Relational.r40CanonicalKeep(
      vs(0).asInstanceOf[UTF8String].toString,
      vs(1).asInstanceOf[UTF8String].toString, vs(2).asInstanceOf[Int],
      vs(3).asInstanceOf[Int],
      vs(4).asInstanceOf[UTF8String].toString, vs(5).asInstanceOf[Int],
      vs(6).asInstanceOf[Int])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evs = children.map(_.genCode(ctx))
    val anyNull =
      if (nullable) evs.map(_.isNull.code).mkString(" || ") else "false"
    val call = "graft.operators.Relational.r40CanonicalKeep(" +
      s"${evs(0).value}.toString(), ${evs(1).value}.toString(), " +
      s"${evs(2).value}, ${evs(3).value}, ${evs(4).value}.toString(), " +
      s"${evs(5).value}, ${evs(6).value})"
    ev.copy(code = code"""
      ${evs.map(_.code).mkString("\n")}
      boolean ${ev.isNull} = $anyNull;
      boolean ${ev.value} = ${ev.isNull} ? false : $call;""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): R40Canonical =
    copy(children = newChildren)
}

object JoinFunctions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.classic.ExpressionUtils
  def r40Canonical(form: Column, nameA: Column, dA: Column, wA: Column,
                   nameB: Column, dB: Column, wB: Column): Column =
    ExpressionUtils.column(R40Canonical(
      Seq(form, nameA, dA, wA, nameB, dB, wB)
        .map(ExpressionUtils.expression)))
}
