package graft.functions

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL surface for graft's native expressions: after
  * `GraftFunctions.register(spark)`, `cosine_similarity(a, b)` and
  * `top_k_by_score(score, id, k)` are callable from `spark.sql(...)`
  * exactly like built-ins — the same codegen'd [[CosineSimilarity]] /
  * bounded [[TopKByScoreAgg]] the Column API uses, no UDF layer.
  *
  * The shared `builders` map also feeds [[graft.GraftExtensions]], the
  * `spark.sql.extensions` builder-time door — one builder definition,
  * two registration paths, identical plans. */
object GraftFunctions {

  val builders: Map[String, Seq[Expression] => Expression] = Map(
    "cosine_similarity" -> {
      case Seq(a, b) => CosineSimilarity(a, b)
      case other => throw new IllegalArgumentException(
        s"cosine_similarity expects 2 arguments, got ${other.size}")
    },
    "top_k_by_score" -> {
      // k must be a literal int: it sizes the aggregation buffer at
      // planning time, so a column-valued k cannot exist.
      case Seq(score, id, Literal(k: Int, IntegerType)) =>
        TopKByScoreAgg(score, id, k).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        "top_k_by_score expects (score, id, k literal int), got " +
          other.map(_.sql).mkString(", "))
    },
    "nfc_normalize" -> {
      case Seq(s) => NfcNormalize(s)
      case other => throw new IllegalArgumentException(
        s"nfc_normalize expects 1 argument, got ${other.size}")
    },
    "hashed_shingles" -> {
      // n must be a literal int: it is part of the expression's shape.
      case Seq(s, Literal(n: Int, IntegerType)) => HashedShingles(s, n)
      case other => throw new IllegalArgumentException(
        "hashed_shingles expects (text, n literal int), got " +
          other.map(_.sql).mkString(", "))
    },
    "heavy_hitters" -> {
      // capacity must be a literal int: it sizes the summary at
      // planning time, like top_k_by_score's k.
      case Seq(term, Literal(capacity: Int, IntegerType)) =>
        HeavyHittersAgg(term, capacity).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        "heavy_hitters expects (term, capacity literal int), got " +
          other.map(_.sql).mkString(", "))
    },
    "count_min" -> {
      // depth/width are literal ints: they size the sketch table at
      // planning time, like heavy_hitters' capacity.
      case Seq(term, Literal(d: Int, IntegerType), Literal(w: Int, IntegerType)) =>
        CountMinAgg(term, d, w).toAggregateExpression()
      case other => throw new IllegalArgumentException(
        "count_min expects (term, depth literal int, width literal int), " +
          s"got ${other.map(_.sql).mkString(", ")}")
    },
    "count_min_estimate" -> {
      case Seq(sk, term, Literal(d: Int, IntegerType), Literal(w: Int, IntegerType)) =>
        CountMinEstimate(sk, term, d, w)
      case other => throw new IllegalArgumentException(
        "count_min_estimate expects (sketch, term, depth literal int, " +
          s"width literal int), got ${other.map(_.sql).mkString(", ")}")
    })

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      GraftColumnBridge.registerFunction(spark, name, b)
    }
}
