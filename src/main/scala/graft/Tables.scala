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
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long and
    * convert to a microsecond TimestampType with integer division (a
    * double-typed `/ 1000` would lose precision on ~1.7e18 ns values).
    *
    * The required `nanosAsLong` legacy flag is pinned in an isolated child
    * session (shared SparkContext and cache, separate SQLConf — the same
    * pattern as the streaming/CC wrappers), NEVER set on the caller's
    * session. The returned frame is rooted in the child; the parquet scan
    * resolves its hadoop conf from the relation's own session, so the flag
    * holds wherever the frame is consumed. */
  def events(s: SparkSession, d: String): DataFrame = {
    val flag = "spark.sql.legacy.parquet.nanosAsLong"
    val reader =
      if (s.conf.getOption(flag).contains("true")) s
      else { val child = s.newSession(); child.conf.set(flag, "true"); child }
    apply(reader, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
