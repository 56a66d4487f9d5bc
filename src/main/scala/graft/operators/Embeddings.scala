package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-storage operators for the training pipeline: symmetric
  * per-vector int8 quantization.
  *
  * At 100 TB an `array<float>` embedding column is usually the widest
  * thing in the table; quantizing to int8 with one float scale per
  * vector cuts it ~4× with a bounded reconstruction error of scale/2 =
  * max|x|/254 per element — the standard storage form for ANN corpora.
  * Everything here is codegen'd built-ins (`transform` / `aggregate` /
  * `zip_with`) over one shuffle-free scan: per-row work, embarrassingly
  * parallel, no UDF.
  */
object Embeddings {

  /** Per-vector symmetric int8 quantization audit: the scale
    * (max|x|/127), the sum of quantized values (an integer content
    * fingerprint of the quantized vector), and the max reconstruction
    * error — which the spec pins at ≤ scale/2, the guarantee downstream
    * similarity search relies on. All math in double so the DuckDB
    * oracle matches bit-for-bit at 4-decimal rounding. */
  def quantizeInt8(emb: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val maxAbs = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    emb
      .select(col("vec_id"), v.as("v"), (maxAbs / 127.0).as("scale"))
      .select(col("vec_id"), col("v"), col("scale"),
        when(col("scale") === 0.0, transform(col("v"), _ => lit(0)))
          .otherwise(transform(col("v"),
            x => round(x / col("scale")).cast("int"))).as("qv"))
      .select(col("vec_id"), col("scale"),
        aggregate(col("qv"), lit(0L), (acc, x) => acc + x).as("q_sum"),
        aggregate(
          zip_with(col("v"), col("qv"), (x, q) => abs(x - q * col("scale"))),
          lit(0.0), (acc, e) => greatest(acc, e)).as("err"))
      // Round in a SEPARATE projection: `round(scale, 4).as("scale")`
      // in the same select list would lateral-alias-shadow the raw
      // `scale` the error expression needs.
      .select(col("vec_id"), round(col("scale"), 4).as("scale"),
        col("q_sum"), round(col("err"), 4).as("max_abs_err"))
      .orderBy("vec_id")
  }

  /** Int8 code vectors: `round(x / scale)` per element, kept as
    * array<double> of integral values (the form the cosine kernel and
    * the DuckDB oracle both consume directly). The search path uses the
    * fused native kernel; the HOF formulation below is retained as the
    * reference the spec pins it against (bit-identical, incl. the
    * zero-scale branch and null elements). */
  private def codeVectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      graft.functions.VectorFunctions.int8Codes(col("embedding")).as("qv"))

  /** The three-pass higher-order-function formulation (CodegenFallback —
    * interpreted element-at-a-time; at 512-d this was the whole cost of
    * the quantized corpus scan). Spec-reference only. */
  private[graft] def codeVectorsHof(emb: DataFrame): DataFrame = {
    val v = col("embedding").cast("array<double>")
    val maxAbs = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    emb
      .select(col("vec_id"), v.as("v"), (maxAbs / 127.0).as("scale"))
      .select(col("vec_id"),
        when(col("scale") === 0.0, transform(col("v"), _ => lit(0.0)))
          .otherwise(transform(col("v"), x => round(x / col("scale"))))
          .as("qv"))
  }

  /** Top-k cosine search over the QUANTIZED corpus — the int8 serving
    * path. The load-bearing identity: cosine of the dequantized vectors
    * equals cosine of the raw integer codes, because the per-vector
    * scales are scalars and cancel —
    *   cos(s_a·q_a, s_b·q_b) = cos(q_a, q_b).
    * So the search runs directly on the codes with the same fused
    * [[graft.functions.CosineSimilarity]] kernel as q15: no
    * dequantization pass, no float reconstruction anywhere in the hot
    * loop, 4× less data scanned at 100 TB. Exact over the quantized
    * representation (deterministic → oracle-checked); recall vs the
    * full-precision top-k is pinned by EmbeddingsSpec. */
  def quantizedTopK(emb: DataFrame, queryId: Long = 0L,
      k: Int = 5): DataFrame = {
    val codes = codeVectors(emb)
    val qrows = codes.filter(col("vec_id") === queryId).head(1)
    require(qrows.nonEmpty,
      s"quantizedTopK: query vec_id=$queryId not found in the corpus")
    val qcodes = qrows(0).getSeq[Double](1)
    // An all-zero query quantizes to all-zero codes, whose cosine against
    // everything is NaN — NaN sorts ABOVE every real double in Spark, so
    // the "top-k" would be silently garbage rather than failing.
    require(qcodes.exists(_ != 0.0),
      s"quantizedTopK: query vec_id=$queryId has zero norm — cosine undefined")
    codes.filter(col("vec_id") =!= queryId)
      .withColumn("cos",
        graft.functions.VectorFunctions.cosine(col("qv"), typedLit(qcodes)))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cos"), 4).as("cos_sim"))
  }

  // --- SparkEntry-facing wrappers ---------------------------------------

  def qQuantize(s: SparkSession, dir: String): DataFrame =
    quantizeInt8(Tables.embeddings(s, dir))

  def qQuantizedTopK(s: SparkSession, dir: String): DataFrame =
    quantizedTopK(Tables.embeddings(s, dir))
}
