package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sampling and corpus-mixing operators — the subset/mixture steps of a
  * training-data pipeline (SURVEY.md §2B extension surface). Everything
  * here is per-row and shuffle-free: sampling 100 TB must be a filter in
  * the scan, never a global operation.
  */
object Sampling {

  /** Deterministic cross-engine hash sample: keep rows whose
    * `md5(decimal string of key)` starts with one of the first `keep16`
    * hex digits — an exact keep16/16 expected fraction. md5 of the
    * decimal rendering is engine-portable (DuckDB's md5 produces the
    * same hex), so the SAME rows are kept everywhere, forever — the
    * property that makes a training subset reproducible across the
    * Spark pipeline, ad-hoc DuckDB checks, and reruns. The predicate is
    * computed, so it is a codegen'd filter in the scan STAGE (not a
    * parquet PushedFilter) — per-row work, no shuffle, no state. Rows
    * with a null key hash to null and are dropped. */
  def hashSample(df: DataFrame, keyCol: String, keep16: Int): DataFrame = {
    require(keep16 >= 1 && keep16 <= 16, s"keep16 must be 1..16: $keep16")
    val digits = "0123456789abcdef".take(keep16).map(_.toString)
    df.filter(substring(md5(col(keyCol).cast("string")), 1, 1)
      .isin(digits: _*))
  }

  /** [[hashSample]] at 1/256 granularity, with the keep bound supplied
    * as a COLUMN (so it can come from a broadcast 1-row aggregate —
    * e.g. a corpus-size-derived sampling rate — without a driver
    * action). Keeps rows whose first TWO md5 hex digits compare below
    * `%02x`-formatted `keep256Col`; lexicographic order on FIXED-WIDTH
    * lowercase hex IS numeric order (a 3-char "100" bound would NOT
    * sort above "ff" — callers wanting keep-everything pass 256, which
    * is special-cased to no filter), and both md5 and the format render
    * lowercase in Spark and DuckDB alike. */
  def hashSample256(df: DataFrame, keyCol: String,
      keep256Col: Column): DataFrame =
    df.filter(keep256Col >= 256 ||
      substring(md5(col(keyCol).cast("string")), 1, 2) <
        format_string("%02x", keep256Col.cast("int")))

  /** Per-stratum Bernoulli sampling (`df.stat.sampleBy`): keeps each row
    * of stratum `v` with probability `fractions(v)`. Per-row independent
    * coin flips — no shuffle, no count, scale-free. Deterministic given
    * the seed AND identical partitioning/row order: the draw depends on a
    * row's partition and position, so a repartitioned rerun can keep a
    * different (same-distribution) subset. The returned sizes are
    * binomial, not exact. Use [[hashSample]] when exact cross-run /
    * cross-engine reproducibility of the row SET matters more than
    * per-stratum rates. */
  def stratifiedSample[T](df: DataFrame, stratumCol: String,
      fractions: Map[T, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Weighted corpus mixture: hash-sample each source at `weight16`/16
    * and union — the dataset-mixing step in front of training (e.g. 12/16
    * web + 3/16 books + 1/16 code). Sources must share a schema; the
    * union is a zero-shuffle bag union whose partitions are the
    * sources' own. */
  def mixCorpora(sources: Seq[(DataFrame, Int)], keyCol: String): DataFrame = {
    require(sources.nonEmpty)
    sources.map { case (df, w) => hashSample(df, keyCol, w) }
      .reduce(_ unionAll _)
  }

  /** Deterministic per-group top-`n` sample: the `n` rows of each group
    * with the smallest `md5(decimal key)` — a balanced, engine-portable
    * subset (same rows in Spark, DuckDB, and every rerun; the per-group
    * analogue of [[hashSample]]). One hash-partitioned row_number window;
    * at scale a single giant group sorts within its partitions (Spark
    * spills window sorts), and a heavily skewed corpus would pre-filter
    * with [[hashSample]] first to shrink the window input. */
  def samplePerGroup(df: DataFrame, groupCol: String, keyCol: String,
      n: Int): DataFrame = {
    require(n > 0, s"n must be positive: $n")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol))
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n).drop("rn")
  }

  // --- SparkEntry-facing query wrappers ---------------------------------

  /** corpus_mix_apply — [[mixCorpora]] applied end to end: the documents
    * table re-mixed by language at fixed temperature-style weights
    * (en 16/16, de 8/16, fr 4/16, es 2/16, zh 1/16 — the flattening a
    * multilingual recipe produces; [[CorpusOps.mixtureWeights]] COMPUTES
    * such weights, this op APPLIES them). Each source is a lang-filtered
    * slice of the same scan, the union is zero-shuffle, and the kept set
    * is the md5 hash-sample — reproducible across engines and reruns,
    * which `sampleBy` is not. Output aggregates the mixed corpus per
    * language (kept docs + token totals) so the oracle checks membership
    * and totals at once. */
  def qMixApply(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val weights = Seq("en" -> 16, "de" -> 8, "fr" -> 4, "es" -> 2, "zh" -> 1)
    val mixed = mixCorpora(
      weights.map { case (l, w) => (docs.filter(col("lang") === l), w) },
      "doc_id")
    mixed.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(Packing.nTokensUdf(col("text"))).as("n_tokens"))
      .orderBy("lang")
  }

  /** q26 — 4/16 deterministic hash sample of orders, aggregated per
    * priority class so the oracle checks both membership and totals. */
  def q26HashSample(s: SparkSession, dir: String): DataFrame =
    hashSample(Tables.orders(s, dir), "o_orderkey", 4)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("sum_price"))
      .orderBy("o_orderpriority")

  /** sample_per_group — 20 deterministic docs per source. */
  def qSamplePerGroup(s: SparkSession, dir: String): DataFrame =
    samplePerGroup(Tables.documents(s, dir), "source", "doc_id", 20)
      .select("source", "doc_id")
      .orderBy("source", "doc_id")
}
