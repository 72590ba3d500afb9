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

/** Single-pass int8 quantizer: float array → struct(scale double,
  * qvec array<int>), scale = max|v|/127 (1.0 for the zero vector),
  * q_i = floor(v_i/scale + 0.5) — identical arithmetic to the
  * `aggregate(transform(...))` + `transform(...)` HOF formulation in
  * [[graft.ann.Quantize]], which walks the array twice through
  * interpreted lambdas. This is the corpus-wide pass of quantized ANN,
  * so it gets the same treatment as the dot kernels: one tight
  * codegen'd loop pair, no intermediate arrays.
  */
case class QuantizeCodes(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("scale", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("qvec",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "quantize_codes"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) { val v = math.abs(a.getFloat(i).toDouble); if (v > mx) mx = v; i += 1 }
    val scale = if (mx == 0.0) 1.0 else mx / 127.0
    val codes = new Array[Int](n)
    i = 0
    while (i < n) { codes(i) = math.floor(a.getFloat(i).toDouble / scale + 0.5).toInt; i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val v = ctx.freshName("v")
      val scale = ctx.freshName("scale")
      val codes = ctx.freshName("codes")
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = java.lang.Math.abs((double) $a.getFloat($i));
         |  if ($v > $mx) $mx = $v;
         |}
         |double $scale = $mx == 0.0 ? 1.0 : $mx / 127.0;
         |int[] $codes = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $codes[$i] = (int) java.lang.Math.floor(((double) $a.getFloat($i)) / $scale + 0.5);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $scale,
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-subspace PQ code assignment against DRIVER-RESIDENT codebooks:
  * code(sub, svec) = the cid minimizing dist²(svec, centroid), cid
  * tiebreak — exactly `min(struct(dd, cid))` over an exploded
  * subs ⋈ broadcast(codebook) join, with dist² spelled the
  * [[graft.ann.KMeans]] way (dot(a,a) + dot(c,c) − 2·dot(a,c), long
  * arithmetic), so swapping it in cannot change results.
  *
  * Why an expression and not the join: sample-trained codebooks
  * (FAISS-style) are a driver-local few-kB artifact, and the join
  * formulation explodes the corpus k× (every subvector row against
  * every centroid) just to immediately argmin it back down through a
  * shuffle. This evaluates the whole argmin loop inside whole-stage
  * codegen: the encode becomes a NARROW map — no row explosion, no
  * exchange, no struct-per-candidate allocation. The codebook arrays
  * ride along as codegen references ([sub][centroid][dim] ints,
  * [sub][centroid] cids). */
case class PqEncode(left: Expression, right: Expression,
                    cents: Array[Array[Array[Int]]],
                    cids: Array[Array[Long]])
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(s: Any, v: Any): Any = {
    val sub = s.asInstanceOf[Int]
    val a = v.asInstanceOf[ArrayData]
    val cs = cents(sub)
    val ids = cids(sub)
    val na = a.numElements()
    var aa = 0L
    var i = 0
    while (i < na) { val x = a.getInt(i).toLong; aa += x * x; i += 1 }
    var bd = Long.MaxValue
    var bc = Long.MaxValue
    var j = 0
    while (j < cs.length) {
      val cv = cs(j)
      var cc = 0L
      i = 0
      while (i < cv.length) { val x = cv(i).toLong; cc += x * x; i += 1 }
      val n = math.min(na, cv.length)
      var ac = 0L
      i = 0
      while (i < n) { ac += a.getInt(i).toLong * cv(i); i += 1 }
      val d = aa + cc - 2 * ac
      if (d < bd || (d == bd && ids(j) < bc)) { bd = d; bc = ids(j) }
      j += 1
    }
    bc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, a) => {
      val centsRef = ctx.addReferenceObj("pqCents", cents, "int[][][]")
      val cidsRef = ctx.addReferenceObj("pqCids", cids, "long[][]")
      val cs = ctx.freshName("cs")
      val ids = ctx.freshName("ids")
      val na = ctx.freshName("na")
      val aa = ctx.freshName("aa")
      val bd = ctx.freshName("bd")
      val bc = ctx.freshName("bc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val cv = ctx.freshName("cv")
      val cc = ctx.freshName("cc")
      val ac = ctx.freshName("ac")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      s"""
         |int[][] $cs = $centsRef[(int) $s];
         |long[] $ids = $cidsRef[(int) $s];
         |int $na = $a.numElements();
         |long $aa = 0L;
         |for (int $i = 0; $i < $na; $i++) {
         |  long $x = (long) $a.getInt($i); $aa += $x * $x;
         |}
         |long $bd = Long.MAX_VALUE;
         |long $bc = Long.MAX_VALUE;
         |for (int $j = 0; $j < $cs.length; $j++) {
         |  int[] $cv = $cs[$j];
         |  long $cc = 0L;
         |  for (int $i = 0; $i < $cv.length; $i++) {
         |    long $x = (long) $cv[$i]; $cc += $x * $x;
         |  }
         |  int $n = java.lang.Math.min($na, $cv.length);
         |  long $ac = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $ac += ((long) $a.getInt($i)) * $cv[$i];
         |  }
         |  long $d = $aa + $cc - 2 * $ac;
         |  if ($d < $bd || ($d == $bd && $ids[$j] < $bc)) {
         |    $bd = $d; $bc = $ids[$j];
         |  }
         |}
         |${ev.value} = $bc;
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

  /** Codegen'd single-pass int8 quantizer (see [[QuantizeCodes]]). */
  def quantize_codes(emb: Column): Column =
    GraftColumnBridge.toColumn(QuantizeCodes(GraftColumnBridge.toExpr(emb)))

  /** Codegen'd per-subspace PQ assignment (see [[PqEncode]]). */
  def pq_encode(sub: Column, svec: Column,
                cents: Array[Array[Array[Int]]],
                cids: Array[Array[Long]]): Column =
    GraftColumnBridge.toColumn(PqEncode(
      GraftColumnBridge.toExpr(sub), GraftColumnBridge.toExpr(svec),
      cents, cids))
}
