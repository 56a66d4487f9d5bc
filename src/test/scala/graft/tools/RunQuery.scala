package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop tool (test scope only — not part of the shipped library):
  * run one registered query against an sf dir and show the result.
  *
  *   sbt "Test/runMain graft.tools.RunQuery <name> [sfDir] [explain]"
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    val n = df.count()
    df.show(20, truncate = false)
    println(f"[runquery] $name rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
