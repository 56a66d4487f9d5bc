package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for cosine similarity over two
  * array<float|double> columns: one fused loop computing dot product and
  * both norms, codegen'd straight into the enclosing WholeStageCodegen
  * stage.
  *
  * Why not `zip_with`/`aggregate` (the [[VectorFunctions]] formulation)?
  * Those are codegen'd too, but the zip materializes an intermediate
  * array per row and the three passes (dot, ‖a‖, ‖b‖) each walk their
  * input separately — for a verification step that evaluates millions of
  * candidate pairs, the fused single-pass loop with no allocation is the
  * performance path the charter's preference order names (custom
  * `Expression` with doGenCode beats composed built-ins beats UDF).
  *
  * Semantics (identical to the HOF formulation on well-formed input, and
  * pinned against it by VectorFunctionsSpec):
  *   - accumulation is sequential left-to-right in double, so results are
  *     bit-identical to the zip_with/aggregate version and to the DuckDB
  *     oracle's list_cosine_similarity at 4-decimal rounding;
  *   - arrays of different lengths are compared over the common prefix;
  *   - null ELEMENTS contribute 0 (embeddings have none; this avoids a
  *     null-check branch per element in the hot loop);
  *   - a zero-norm side yields NaN (IEEE 0/0), as with the HOF version;
  *   - a null ARRAY on either side yields null (BinaryExpression default).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity requires array<float|double> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (xa, xb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (fa, fb) = (elemIsFloat(left), elemIsFloat(right))
    val n = math.min(xa.numElements(), xb.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (xa.isNullAt(i)) 0.0
        else if (fa) xa.getFloat(i).toDouble else xa.getDouble(i)
      val y = if (xb.isNullAt(i)) 0.0
        else if (fb) xb.getFloat(i).toDouble else xb.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      def get(arr: String, isFloat: Boolean): String =
        if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = $a.isNullAt($i) ? 0.0 : ${get(a, elemIsFloat(left))};
         |  final double $y = $b.isNullAt($i) ? 0.0 : ${get(b, elemIsFloat(right))};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}
