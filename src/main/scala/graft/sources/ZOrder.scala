package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered layout: multi-dimensional data
  * skipping for the 100 TB scan path.
  *
  * Sorting a table by one column gives parquet row-group min/max stats
  * that prune scans filtered on THAT column only. Interleaving the bits
  * of two columns and range-partition-sorting by the interleaved value
  * clusters rows that are close in BOTH dimensions into the same files,
  * so min/max footer stats prune 2-D range predicates — the layout trick
  * behind Delta/Iceberg `OPTIMIZE ZORDER BY`. At 100 TB the difference is
  * reading a handful of files vs scanning the table for every
  * `user BETWEEN .. AND value BETWEEN ..` slice.
  *
  * Everything is built from codegen'd built-ins (shiftleft / bitwise or /
  * min-max normalization); the only driver-side values are the four
  * global min/max scalars that define the normalization box.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative int columns:
    * bit i of `a` lands at z-bit 2i, bit i of `b` at 2i+1. Built as a
    * balanced OR-tree of shift/mask terms — one codegen'd expression,
    * no UDF. Inputs are cast to LONG first: Spark's shiftleft keeps the
    * input's integer width, so a raw IntegerType column would wrap
    * shift distances ≥ 32 mod 32 and set the int sign bit at i=15 —
    * negative z-values sorting before far-smaller coordinates. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** Min-max normalize a numeric column to the integer range
    * [0, 2^bits-1] given the global bounds. Degenerate bounds (min ==
    * max) map everything to 0. */
  private def normalize(c: Column, lo: Double, hi: Double, bits: Int): Column =
    if (hi <= lo) lit(0L)
    else least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit((1L << bits).toDouble))))

  /** Write `df` to `path` as parquet, clustered on the z-value of
    * (`colA`, `colB`). The two columns are min-max normalized into
    * `bits`-bit grid cells (one 4-scalar aggregate crosses to the driver
    * — same bounded-scalar budget as the rest of the library), then rows
    * are range-partitioned AND sorted within partitions by z, so each
    * output file covers a compact Morton segment and its parquet footer
    * min/max on BOTH columns is narrow. */
  def zorderWrite(df: DataFrame, colA: String, colB: String, path: String,
      numFiles: Int = 8, bits: Int = 16): Unit = {
    val b = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    // Empty input (or all-null cluster columns) has no normalization
    // box — getDouble on the null bounds would throw. There is nothing
    // to cluster; still materialize the table with its schema.
    if (b.isNullAt(0) || b.isNullAt(2)) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    val (aLo, aHi, bLo, bHi) =
      (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    df.withColumn("_z", zValue(
        normalize(col(colA), aLo, aHi, bits),
        normalize(col(colB), bLo, bHi, bits), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
