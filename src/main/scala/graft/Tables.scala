package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take the scale-factor directory as a parameter so the same
  * code runs on sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and,
  * unchanged, on a real cluster path at 100 TB: `spark.read.parquet` scans
  * are split by Spark's FileSourceScanExec, so nothing here assumes
  * single-node data.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** events.parquet has shipped `ts` in two physical vintages, and the
    * driver may regenerate the tables between rounds, so the loader
    * detects which one it was handed rather than assuming either:
    *
    *   - TIMESTAMP(NANOS): Spark's parquet reader rejects it
    *     ([PARQUET_TYPE_ILLEGAL]) unless the `nanosAsLong` legacy flag is
    *     set, under which it surfaces as LongType — convert to a
    *     microsecond TimestampType with integer division (a double-typed
    *     `/ 1000` would lose precision on ~1.7e18 ns values).
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): reads natively as
    *     TIMESTAMP_NTZ — cast to TimestampType, an exact identity on the
    *     instant because every session here pins UTC.
    *
    * The `nanosAsLong` flag is pinned in an isolated child session
    * (shared SparkContext and cache, separate SQLConf — the same pattern
    * as the streaming/CC wrappers), NEVER set on the caller's session; it
    * is a no-op for the micros vintage. The returned frame is rooted in
    * the child; the parquet scan resolves its hadoop conf from the
    * relation's own session, so the flag holds wherever the frame is
    * consumed. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val flag = "spark.sql.legacy.parquet.nanosAsLong"
    val reader =
      if (s.conf.getOption(flag).contains("true")) s
      else { val child = s.newSession(); child.conf.set(flag, "true"); child }
    val raw = apply(reader, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>            // TIMESTAMP(NANOS) vintage
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>    // plain-micros vintage, UTC wall time
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
