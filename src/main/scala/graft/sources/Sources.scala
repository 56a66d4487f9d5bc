package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Source readers beyond parquet (SURVEY.md §1.3 — the reference's only
  * connector is local text; an engine a reference user can switch TO
  * needs the common at-rest formats too). All readers take an explicit
  * schema: schema inference is an extra full scan at 100 TB, so
  * production reads always declare their schema.
  *
  * Malformed records are captured, not dropped: PERMISSIVE mode routes
  * unparseable lines into a `_corrupt` column so a pipeline can count,
  * quarantine, or fail on them explicitly (SourcesSpec exercises this) —
  * silently losing rows is never acceptable in a training-data pipeline.
  */
object Sources {

  /** Schema + `_corrupt` capture column appended. */
  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField("_corrupt", StringType))

  def csv(s: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    s.read.schema(withCorrupt(schema))
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(path)

  def json(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Newline-delimited text — the reference's input format
    * (thread_pool.cc:46-65); splitting/decoding is Spark's
    * FileSourceScanExec, not a per-chunk rescan. */
  def text(s: SparkSession, path: String): DataFrame = s.read.text(path)

  /** ORC — the other columnar at-rest format; same pushdown/pruning
    * behavior as parquet (PushedFilters + ReadSchema in the scan). ORC
    * files are self-describing, but production reads still declare the
    * schema to pin evolution and skip footer inference. */
  def orc(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).orc(path)

  /** Rows whose raw record failed to parse. Spark disallows queries that
    * reference ONLY the corrupt column directly over raw files
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache or
    * write out the parsed frame first, which a quarantine step does
    * anyway. */
  def corruptRecords(df: DataFrame): DataFrame =
    df.filter(col("_corrupt").isNotNull)

  /** Successfully parsed rows, capture column dropped. */
  def validRecords(df: DataFrame): DataFrame =
    df.filter(col("_corrupt").isNull).drop("_corrupt")
}

/** Partitioned sinks: directory-partitioned parquet is the at-rest
  * layout that makes later scans prunable — a predicate on the partition
  * column becomes a PartitionFilter (no data files of other partitions
  * are even listed), which at 100 TB is the difference between reading
  * one partition and reading everything. */
object Sinks {

  def writePartitioned(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
}
