package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| of two SORTED-ascending, duplicate-free `array<bigint>`
  * columns as one fused merge loop — the exact-Jaccard verification
  * kernel (r21 optimization).
  *
  * Replaces `size(array_intersect(a, b))` on the near-dup verify path,
  * which per CANDIDATE PAIR builds a hash set of one side, materializes
  * the intersection as a fresh array, and then counts it — measured as
  * the single hottest stage of dedup_hist_exact (~2.0-2.9 s of a 5 s
  * query at sf0.1, ~600k pairs × ~200-element arrays). The merge loop
  * allocates nothing and runs inside whole-stage codegen.
  *
  * CONTRACT (holds for every caller: both sides come from
  * `sort_array(hashedShingleDocs(...).shingles)`):
  *   - both arrays sorted ascending (signed long order — sort_array's
  *     LongType ordering);
  *   - elements distinct within each array (HashedShingles emits
  *     first-occurrence-distinct n-gram hashes);
  *   - no null elements.
  * Under that contract the count equals `size(array_intersect(a, b))`
  * exactly (spec-pinned against the built-in on random inputs). A null
  * ARRAY on either side is null (BinaryExpression default); a null
  * ELEMENT — impossible from the producing kernel — returns null, the
  * [[HammingDistance]] fail-visible discipline.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_intersect_count requires two array<bigint> inputs, got " +
            s"${l.catalogString} and ${r.catalogString}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Reference-call codegen (the HammingDistance discipline): the
    // kernel returns boxed Integer-or-null for the null-element edge.
    val self = ctx.addReferenceObj("sortedIntersectCount", this,
      classOf[SortedIntersectCount].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("sic")
      s"""
         |Object $boxed = $self.kernel($a, $b);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Integer) $boxed).intValue(); }
       """.stripMargin
    })
  }

  /** Public entry for the generated code path. */
  def kernel(a: ArrayData, b: ArrayData): Any = nullSafeEval(a, b)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}
