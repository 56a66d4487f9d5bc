package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE bare JSON line (plus a copy at
  * `SPARK_GRAFT_BENCH_OUT`, default `bench_out.json` in the CWD, so the
  * result is parseable even when a build tool prefixes stdout).
  *
  * Failures are reported explicitly under `"failed"` and excluded from
  * the total — a broken query must never read as a 0-second speedup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Dev aid: SPARK_GRAFT_ONLY=substr1,substr2 restricts the run to
    // queries whose name contains any of the substrings (full run default).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.isEmpty || only.exists(name.contains)
    }
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failed = scala.collection.mutable.LinkedHashMap.empty[String, String]
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        timings(name) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          failed(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.take(200)
      }
    }
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val qs = timings.map { case (k, v) => s""""${esc(k)}":$v""" }
      .mkString("{", ",", "}")
    val fs = failed.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val total = timings.values.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"n_failed":${failed.size},"sf":"${esc(sfDir)}"}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
