package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused argmax-dot centroid assignment: for an `array<float|double>`
  * row vector and a fixed k×d centroid matrix, returns the index of the
  * max-dot-product centroid in ONE codegen'd k·d loop per row.
  *
  * Why not compose it from built-ins? The previous formulation —
  * `array(cos(v, c₀) … cos(v, cₖ₋₁))` then
  * `array_position(scores, array_max(scores))` — builds a k-element
  * intermediate array per row and, once the two projections collapse,
  * evaluates the k-cosine array expression for BOTH consumers; with
  * 512-d vectors that measured ~2× the arithmetic plus an allocation
  * and a boxed array walk per row, on the hottest scan of the IVF build
  * (every corpus row, every ingest). The fused expression does the k·d
  * multiply-adds straight out of the row's ArrayData with no
  * intermediate, exactly the preference order the charter names for
  * per-row kernels Spark can't express natively.
  *
  * Semantics (pinned by VectorFunctionsSpec against the composed
  * formulation, and by SimilaritySpec's max-dot sample check):
  *   - centroids are expected UNIT-NORM (as [[graft.operators.Similarity]]
  *     produces them), so argmax dot ≡ argmax cosine for every non-zero
  *     row — the row's own norm is a positive constant across centroids;
  *   - ties break to the FIRST max index (strict `>` over ascending c),
  *     matching `array_position`'s first-match contract;
  *   - a zero-norm row dots 0 against every centroid and lands on
  *     centroid 0 — the same deterministic bucket the old
  *     `nanvl(cos, -2)` guard chose;
  *   - null ELEMENTS contribute 0 (as [[CosineSimilarity]] does);
  *   - a null ARRAY yields null (UnaryExpression default);
  *   - a row shorter than d dots over its common prefix.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {
  require(centroids.nonEmpty, "NearestCentroid requires at least one centroid")
  require(centroids.forall(_.length == centroids.head.length),
    "NearestCentroid requires centroids of uniform dimension")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid requires an array<float|double> input, got " +
            s"${other.catalogString}")
    }

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val numCentroids = centroids.length
  @transient private lazy val dim = centroids.head.length
  /** Row-major k×d matrix; flat primitive array so both the interpreted
    * and generated loops index it without boxing. */
  @transient private lazy val flatMatrix: Array[Double] = {
    val m = new Array[Double](numCentroids * dim)
    var c = 0
    while (c < numCentroids) {
      val cv = centroids(c)
      var j = 0
      while (j < dim) { m(c * dim + j) = cv(j); j += 1 }
      c += 1
    }
    m
  }

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val isFloat = elemIsFloat
    val n = math.min(arr.numElements(), dim)
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < numCentroids) {
      val base = c * dim
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = if (arr.isNullAt(j)) 0.0
          else if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
        dot += x * flatMatrix(base + j)
        j += 1
      }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("centroidMatrix", flatMatrix, "double[]")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestDot = ctx.freshName("bestDot")
      val c = ctx.freshName("c")
      val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val get =
        if (elemIsFloat) s"(double) $a.getFloat($j)" else s"$a.getDouble($j)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $dim);
         |int $best = 0;
         |double $bestDot = java.lang.Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $numCentroids; $c++) {
         |  final int $base = $c * $dim;
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    final double $x = $a.isNullAt($j) ? 0.0 : $get;
         |    $dot += $x * $mat[$base + $j];
         |  }
         |  if ($dot > $bestDot) { $bestDot = $dot; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroid = copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}
