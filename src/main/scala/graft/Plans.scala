package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for every registered query to
  * `<outDir>/<name>.txt` (default `target/plans/`), so a round's
  * physical plans can be audited side by side — pushdown reaching the
  * scans, WholeStageCodegen spans, exchange counts, no stray
  * CartesianProduct — without re-running anything by hand.
  *
  * Streaming wrappers execute eagerly and return a memory-table scan
  * (their interesting plan is the streaming one, pinned in
  * StreamingSpec), so they are skipped here.
  */
object Plans {
  private val skip = Set("stream_tumbling", "stream_sessions",
    "stream_stream_join", "stream_enrich", "stream_anomaly")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "target/plans"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(out)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => skip(name) }
      .foreach { case (name, fn) =>
        val plan =
          try fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          catch { case e: Throwable => s"ERROR: ${e.getMessage}" }
        java.nio.file.Files.writeString(out.resolve(s"$name.txt"), plan)
      }
    println(s"plans written to $outDir")
    spark.stop()
  }
}
