// Nested under org.apache.spark.sql because ImplicitCastInputTypes'
// signature mentions the private[sql] AbstractDataType.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two array<double> columns.
  *
  * The higher-order-function spelling (`aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)`) is CodegenFallback — every element hop is an interpreted
  * Invoke, which is fatal when the expression runs once per candidate
  * PAIR (q35/q36 similarity joins). This expression emits a tight
  * primitive loop inside WholeStageCodegen instead.
  *
  * The fold runs in index order with a plain `+=` on equal-length
  * inputs, exactly the arithmetic sequence of the HOF spelling, so
  * results match it bit-for-bit there (oracle parity keeps holding at
  * round(…, 4)). On UNEQUAL lengths the HOF spelling null-pads the
  * short side (`zip_with` → null product → null sum), so this
  * expression returns null too — a silent min-length truncation would
  * turn a malformed embedding into a plausible number.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) {
      null
    } else {
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Driver-trained IVF codebook assignment: top-`top` centroid ids for
  * an array<double> vector, ranked by cosine (ties to the smaller
  * centroid id). The codebook is a driver-local matrix (trained by
  * graft.ml.CodebookKMeans on a bounded sample), so assignment is a
  * pure per-row map — scan → project, no broadcast join, no argmax
  * aggregate, no exchange at ANY corpus scale. Centroids are
  * re-normalized once at plan time; ranking by dot(v, ĉ_j) then equals
  * ranking by cosine (the per-row |v| factor is a positive constant
  * across j).
  */
object IvfAssign {
  /** `flat` = row-major unit centroids (k × dim). Vectors of the wrong
    * dimensionality yield an empty array (explode drops them). */
  def topBuckets(v: ArrayData, flat: Array[Double], dim: Int, top: Int): ArrayData = {
    if (v.numElements() != dim) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val k = flat.length / dim
    val sims = new Array[Double](k)
    var j = 0
    while (j < k) {
      var s = 0.0
      var i = 0
      val off = j * dim
      while (i < dim) { s += v.getDouble(i) * flat(off + i); i += 1 }
      sims(j) = s
      j += 1
    }
    val out = new Array[Any](top)
    val taken = new Array[Boolean](k)
    var t = 0
    while (t < top) {
      var best = -1
      var bs = 0.0
      var j2 = 0
      while (j2 < k) {
        if (!taken(j2) && (best < 0 || sims(j2) > bs)) { best = j2; bs = sims(j2) }
        j2 += 1
      }
      taken(best) = true
      out(t) = best.toLong
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** array<double> → array<long>: the vector's `top` nearest codebook
  * centroid ids (see IvfAssign.topBuckets). */
case class IvfTopBucketsExpr(child: Expression,
    centroids: Seq[Seq[Double]], top: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {

  require(centroids.nonEmpty && top >= 1 && top <= centroids.length,
    s"top=$top outside 1..${centroids.length}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "graft_ivf_buckets"

  private val dim = centroids.head.length

  /** Unit-normalized row-major codebook. */
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](centroids.length * dim)
    centroids.zipWithIndex.foreach { case (c, j) =>
      require(c.length == dim, "ragged codebook")
      var s = 0.0
      c.foreach(x => s += x * x)
      val n = math.sqrt(s)
      var i = 0
      while (i < dim) { out(j * dim + i) = if (n > 0) c(i) / n else 0.0; i += 1 }
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    IvfAssign.topBuckets(input.asInstanceOf[ArrayData], flat, dim, top)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("ivfCodebook", flat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftbridge.IvfAssign.topBuckets($c, $flatRef, $dim, $top)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
