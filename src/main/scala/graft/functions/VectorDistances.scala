package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst vector folds for the PQ/ADC hot path — the same
  * single-pass whole-stage-codegen treatment [[CosineSimilarity]] gives
  * cosine, applied to the two other folds the product-quantization
  * pipeline runs per (vector × codebook-entry) row: dot product and
  * squared L2 distance.
  *
  * Exists because the higher-order-function formulation
  * (`aggregate(zip_with(...))`) evaluates interpretively per element —
  * the PQ encode step scores |corpus| × nCodes subvector pairs, and the
  * interpreted fold was its dominant cost. Numerics are identical:
  * one strict left-to-right double fold per accumulator, so results are
  * bit-equal to the HOF form and to the DuckDB oracle's `list_reduce`.
  *
  * Null semantics mirror the HOF form exactly: a length mismatch
  * (zip_with pads with null → null product → null sum) or any null
  * element yields NULL; two empty arrays yield the fold seed 0.0.
  */
private[graft] sealed abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> inputs, got ${left.dataType} / ${right.dataType}")
  }

  /** Scala accumulation step: returns the term added to the accumulator. */
  protected def step(x: Double, y: Double): Double
  /** Java source for the term added to the accumulator. */
  protected def stepCode(xi: String, yi: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += step(x.getFloat(i).toDouble, y.getFloat(i).toDouble)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $acc += ${stepCode(xi, yi)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })
}

case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override protected def step(x: Double, y: Double): Double = x * y
  override protected def stepCode(xi: String, yi: String): String = s"$xi * $yi"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class L2Squared(left: Expression, right: Expression) extends VectorFold {
  override protected def step(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def stepCode(xi: String, yi: String): String =
    s"($xi - $yi) * ($xi - $yi)"
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** max(|xᵢ|) over an array<float> — the int8-quantization scale fold.
  * Replaces `aggregate(v, 0.0, (a, y) -> greatest(a, abs(y)))`, whose
  * interpreted per-element evaluation dominated the quantize pass.
  * Semantics mirror that HOF form exactly: null ARRAY → null; null
  * ELEMENTS are skipped (`greatest` ignores nulls, unlike the binary
  * folds above); empty array → the fold seed 0.0; NaN propagates
  * (Math.max and Spark's ordering both rank NaN greatest). Max over
  * doubles is associative, so the value is bit-identical to the HOF's
  * left-to-right fold in every case.
  */
case class MaxAbs(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "max_abs"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an array<float> input, got $t")
    }
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i)) acc = math.max(acc, math.abs(x.getFloat(i).toDouble))
      i += 1
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $acc = Math.max($acc, Math.abs((double) $a.getFloat($i)));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorDistances {
  import org.apache.spark.sql.graft.bridge

  /** Σ xᵢ·yᵢ as a strict left-to-right double fold. */
  def dotProduct(a: Column, b: Column): Column =
    bridge.toColumn(DotProduct(bridge.toExpression(a), bridge.toExpression(b)))

  /** Σ (xᵢ−yᵢ)² as a strict left-to-right double fold. */
  def l2Squared(a: Column, b: Column): Column =
    bridge.toColumn(L2Squared(bridge.toExpression(a), bridge.toExpression(b)))

  /** max(|xᵢ|), the quantization scale fold. */
  def maxAbs(a: Column): Column =
    bridge.toColumn(MaxAbs(bridge.toExpression(a)))
}
