package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sign-bit packing — word `w` = Σ over j∈[0,32) of
  * `(v[32w+j] > 0) · 2^j` — as ONE fused primitive loop per row,
  * emitting `array<long>` of 32-bit packed words (longs so DuckDB's
  * BIGINT reproduces them without sign traps — see
  * [[graft.operators.BinaryQuant.WordBits]]).
  *
  * The [[Int8QuantizeCodes]] lesson applied to the binary-ANN ingest
  * path (VERDICT r17 ask #4): the HOF formulation
  * (`transform(sequence)` over `aggregate(zip_with(slice, sequence))`)
  * is CodegenFallback — interpreted element-at-a-time with boxing and a
  * per-word slice copy, measured ~200 µs/row at 512-d, which made the
  * write-once packing scan the single visible build cost at the 100×
  * stress scale (0.72 → 9.76 s). This kernel is one branch-per-element
  * pass writing a primitive long[].
  *
  * Bit-identical to the HOF form ([[graft.operators.BinaryQuant
  * .signBits]], spec-pinned in BinaryQuantSpec):
  *   - floats compare as doubles (`x > 0.0` after the cast — lossless);
  *   - null ELEMENTS contribute 0 bits (the HOF's `when(x > 0.0, …)
  *     .otherwise(0)` — a null comparison is null → otherwise);
  *   - the tail of a non-multiple-of-32 vector contributes 0 bits
  *     (the HOF's null-padded zip_with);
  *   - an EMPTY vector packs to the empty array;
  *   - a null vector packs to null (UnaryExpression default).
  */
case class SignBitPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_bit_pack requires an array<float|double> input, got " +
            s"${other.catalogString}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val isFloat = elemIsFloat
    val n = arr.numElements()
    val words = (n + 31) / 32
    val out = new Array[Long](words)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        if (x > 0.0) out(i / 32) |= (1L << (i % 32))
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Reference-call codegen (the Int8QuantizeCodes discipline): one
    // kernel implementation stays bit-identical on both paths, and the
    // per-row cost is the O(d) loop, not the single virtual call.
    val self = ctx.addReferenceObj("signBitPack", this,
      classOf[SignBitPack].getName)
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $self.kernel($a);"
    })
  }

  /** Public entry for the generated code path. */
  def kernel(arr: ArrayData): ArrayData =
    nullSafeEval(arr).asInstanceOf[ArrayData]

  override protected def withNewChildInternal(
      newChild: Expression): SignBitPack = copy(child = newChild)

  override def prettyName: String = "sign_bit_pack"
}
