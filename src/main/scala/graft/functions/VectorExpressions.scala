package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for Array[Float] dot products.
  *
  * The built-in route — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * allocates an intermediate array and evaluates interpreted lambda
  * closures per element (higher-order functions don't participate in
  * whole-stage codegen). For pairwise similarity kernels that's the
  * inner loop of the whole job, so this expression generates a tight
  * primitive float loop instead. Accumulation is double, left-to-right —
  * bit-identical to the zip_with formulation, so swapping it in cannot
  * change results.
  */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float>; AbstractDataType/ExpectsInputTypes are
  // private[sql] in Spark 4, so callers guarantee typing instead
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product_f"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer sibling of [[DotProductF]] for array<int> code vectors
  * (int8-quantized embeddings): long accumulation — exact, engine-
  * independent, and the inner loop of quantized candidate generation. */
case class DotProductI(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "dot_product_i"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a.getInt($i)) * ((long) $b.getInt($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Codegen'd float-array dot product (see [[DotProductF]]). */
  def dot_f(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(DotProductF(
      GraftColumnBridge.toExpr(a), GraftColumnBridge.toExpr(b)))

  /** Codegen'd int-array dot product (see [[DotProductI]]). */
  def dot_i(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(DotProductI(
      GraftColumnBridge.toExpr(a), GraftColumnBridge.toExpr(b)))
}
