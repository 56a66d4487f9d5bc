package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE bare JSON line (plus a copy at
  * `SPARK_GRAFT_BENCH_OUT`, default `target/bench_out.json` — a
  * gitignored path, so runs never dirty the working tree).
  *
  * Queries run in sorted-name order after an untimed warm-up pass
  * (disable with SPARK_GRAFT_WARMUP=0), so per-query timings are
  * comparable across rounds — without this, JIT/cache context varies
  * with map iteration order and per-query deltas under ~2× are noise.
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
    // queries whose name contains any of the substrings (full run default);
    // the selection is recorded in the JSON so partial runs self-identify.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter {
      case (name, _) => only.isEmpty || only.exists(name.contains)
    }
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    if (warmup) selected.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
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
    val onlyJson = only.map(s => s""""${esc(s)}"""").mkString("[", ",", "]")
    val total = timings.values.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"n_failed":${failed.size},"only":$onlyJson,"warmup":$warmup,"sf":"${esc(sfDir)}"}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_out.json")
    val outPath = java.nio.file.Paths.get(out)
    Option(outPath.getParent)
      .foreach(p => java.nio.file.Files.createDirectories(p))
    java.nio.file.Files.writeString(outPath, json + "\n")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
