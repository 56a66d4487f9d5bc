package graft

import org.apache.spark.sql.SparkSession

/** Plan-capture helper for the optimization rounds: writes
  * `.explain("formatted")` for the named registered queries to
  * `<outDir>/<name>.txt`, one file per query.
  *
  * Usage: runMain graft.Explain <sfDir> <outDir> <name>[,<name>...]
  *
  * Notes:
  *   - Building a query's frame invokes its registered function, which for
  *     the storage/streaming harness queries (cow_*, stream_*) performs the
  *     eager harness work (table writes, replays) before returning the
  *     final frame — their plan files show only the final read, so their
  *     optimization evidence lives in the per-stage notes instead.
  *   - Session mirrors Bench.makeSession (same master/shuffle conf) so the
  *     captured plans are the ones the bench actually runs.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Explain <sfDir> <outDir> <names,csv>")
    val Array(sfDir, outDir, namesCsv) = args.take(3)
    val names = namesCsv.split(',').map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(out)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[explain] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(out.resolve(s"$name.txt"), txt)
            println(s"[explain] wrote $name.txt (${txt.length} chars)")
          } catch {
            case e: Throwable =>
              System.err.println(s"[explain] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
