package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: left-to-right double-precision dot
  * product of two numeric arrays.
  *
  * Why it exists: Spark's higher-order functions evaluate INTERPRETED —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` walks a lambda
  * interpreter per element, and it is the inner loop of every
  * similarity-search tier (scoring joins evaluate it per candidate
  * pair). This expression computes the IDENTICAL value — same
  * left-to-right fold order, same widen-to-double-then-multiply-then-
  * add IEEE sequence — as a whole-stage-codegen'd call into one tight
  * static loop, so swapping it in cannot change any oracle-verified
  * result.
  *
  * Null semantics match the HOF formulation exactly: null array → null;
  * differing lengths → null (zip_with pads with null, null poisons the
  * sum); any null element → null.
  *
  * Element types: float/double/long/int arrays, sides may differ (each
  * element widens to double exactly as `cast("double")` does).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemCode(dt: DataType): Int = dt match {
    case ArrayType(DoubleType, _) => 0
    case ArrayType(FloatType, _)  => 1
    case ArrayType(LongType, _)   => 2
    case ArrayType(IntegerType, _) => 3
    case _ => -1
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemCode(left.dataType) >= 0 && elemCode(right.dataType) >= 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two arrays of float/double/long/int, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  // null even on non-null inputs: length mismatch / null elements
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      elemCode(left.dataType), elemCode(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (ca, cb) = (elemCode(left.dataType), elemCode(right.dataType))
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.plans.DotProduct.dot($a, $b, $ca, $cb);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Static kernel so generated code calls one JIT-inlinable method.
    * Returns boxed null for the null-poisoning cases (the codegen
    * template translates that to isNull). */
  def dot(a: ArrayData, b: ArrayData, ca: Int, cb: Int): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += get(a, i, ca) * get(b, i, cb)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  private def get(arr: ArrayData, i: Int, code: Int): Double = code match {
    case 0 => arr.getDouble(i)
    case 1 => arr.getFloat(i).toDouble
    case 2 => arr.getLong(i).toDouble
    case _ => arr.getInt(i).toDouble
  }

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    Bridge.toColumn(DotProduct(Bridge.toExpression(a), Bridge.toExpression(b)))
}
