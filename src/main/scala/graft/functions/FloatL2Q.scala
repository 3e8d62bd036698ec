package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: pico-quantized squared L2 distance of two
  * FLOAT arrays — Σᵢ floor((aᵢ−bᵢ)²·1e12 + 0.5) as BIGINT — with
  * whole-stage codegen (SURVEY §4.3 preference order (b): a custom
  * `Expression` beats a UDF beats lambda folds).
  *
  * Replaces `aggregate(zip_with(a, b, (p,q) -> CAST(floor(...))))` in
  * the anchor-NN hot path: the higher-order fold evaluates its lambda
  * per element outside codegen; this compiles to a tight primitive
  * loop. Arithmetic is identical — each per-dimension term is floored
  * to a BIGINT BEFORE the sum, so the result is exact, order-free, and
  * bit-identical to DuckDB's list_transform/list_sum mirror.
  */
case class FloatL2Q(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_l2q expects two ARRAY<FLOAT> args, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += math.floor(d * d * 1e12 + 0.5).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $x.getFloat($i) - (double) $y.getFloat($i);
         |  $acc += (long) java.lang.Math.floor($d * $d * 1e12 + 0.5);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatL2Q =
    copy(left = newLeft, right = newRight)
}

object FloatL2Q {
  /** Register `float_l2q` in the session's function registry
    * (idempotent) so query code can use it via expr / SQL. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_l2q", exprs => FloatL2Q(exprs(0), exprs(1)), "scala_udf")
}
