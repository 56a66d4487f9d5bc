package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming scale-smoke harness (r12 verdict ask #7): replicate the
  * EVENTS table `SPARK_GRAFT_SCALE`× (default 10) with re-keyed
  * event/user ids, run the streaming-engine query family once per
  * scale, and print one JSON line with per-query wall seconds at 1× and
  * N× plus the MEASURED state-store rows/bytes per stateful operator
  * (max `numRowsTotal` / `memoryUsedBytes` across the run's progress
  * events, via the [[graft.streaming.StreamingOps.lastStateOps]] seam).
  *
  * This is the artifact behind the bounded-state claims: tumbling/
  * anomaly state is windows×types (should stay FLAT as event volume
  * scales — same time range, more rows per window), session and
  * interval-join state scales with distinct keys in the watermark
  * horizon (≈ linear in the replicated users), and the CDC upsert sink
  * is stateless by design (zero state rows). A superlinear wall ratio
  * or state growing faster than its driver says the operator buffers
  * the stream, not its keys.
  *
  * Replication keeps the TIME RANGE fixed and multiplies users/events —
  * the "higher event rate" scaling a production stream actually sees.
  * The scaled events.parquet is written as a SINGLE file (the replay
  * harnesses copy it as one file) in the plain-micros vintage, the
  * same one the driver's 2026-08-13 regeneration ships. */
object StreamScaleSmoke {
  private val IdStride = 10_000_000L

  def buildScaledDir(s: SparkSession, srcDir: String, scale: Int,
      outDir: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.createDirectories(Paths.get(outDir))
    val rep = explode(sequence(lit(0), lit(scale - 1))).as("rep")
    val stage = Paths.get(outDir, "_stage_events")
    Tables.events(s, srcDir)
      .select(col("*"), rep)
      .withColumn("event_id", col("event_id") + col("rep") * IdStride)
      .withColumn("user_id", col("user_id") + col("rep") * IdStride)
      .drop("rep")
      // NTZ keeps the written file in the plain-micros vintage every
      // events reader (batch loader, replay probe) already handles.
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .coalesce(1)
      .write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).iterator()
    var moved = false
    while (part.hasNext && !moved) {
      val p = part.next()
      if (p.toString.endsWith(".parquet")) {
        Files.move(p, Paths.get(outDir, "events.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        moved = true
      }
    }
    require(moved, s"no parquet part produced under $stage")
    Files.walk(stage).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    // stream_enrich's static dimension side, copied verbatim.
    Files.copy(Paths.get(srcDir, "customer.parquet"),
      Paths.get(outDir, "customer.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def family: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = {
    val names = Seq("stream_tumbling", "stream_sessions_append",
      "stream_stream_join", "stream_enrich", "stream_anomaly",
      "stream_upsert", "stream_dedup",
      // r17: the sliding-window and bounded-state heavy-hitter surfaces
      "stream_sliding", "stream_topk",
      // r18: the arbitrary-stateful (fMGWS) sessionizer — state is one
      // fixed-size row per live user, so its 10× curve proves the
      // bounded-state claim, not just the oracle equality
      "stream_sessions_fmgws")
    names.map(n => n -> SparkEntry.queries(n))
  }

  private def timeFamily(s: SparkSession, dir: String)
      : Seq[(String, Double, Long, Seq[(String, Long, Long)])] =
    family.map { case (name, fn) =>
      graft.streaming.StreamingOps.lastStateOps = Nil
      System.gc()
      val t0 = System.nanoTime()
      val rows = fn(s, dir).count()
      ((name, (System.nanoTime() - t0) / 1e9, rows,
        graft.streaming.StreamingOps.lastStateOps))
    }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadAvg(): Double = try java.nio.file.Files
      .readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split(' ')(0).toDouble
      catch { case _: Exception => -1.0 }
    val loadStart = loadAvg()
    val work = TmpDirs.scratch("graft_sscale")
    val oneDir = work.resolve("x1").toString
    val bigDir = work.resolve(s"x$scale").toString
    buildScaledDir(spark, srcDir, 1, oneDir)
    buildScaledDir(spark, srcDir, scale, bigDir)
    timeFamily(spark, oneDir) // untimed warm-up (JIT + state-store init)
    val one = timeFamily(spark, oneDir)
    val big = timeFamily(spark, bigDir)
    val loadEnd = loadAvg()
    val oneByName = one.map(t => t._1 -> t).toMap
    def f(v: Double) = BigDecimal(v)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    def stateJson(ops: Seq[(String, Long, Long)]): String =
      ops.map { case (op, rows, bytes) =>
        s""""$op":{"rows":$rows,"bytes":$bytes}"""
      }.mkString("{", ",", "}")
    val items = big.map { case (name, sec, rows, st) =>
      val (_, sec1, rows1, st1) = oneByName(name)
      s""""$name":{"x1_sec":${f(sec1)},"x${scale}_sec":${f(sec)},"ratio":${f(sec / sec1)},"x1_rows":$rows1,"x${scale}_rows":$rows,"x1_state":${stateJson(st1)},"x${scale}_state":${stateJson(st)}}"""
    }
    val total1 = one.map(_._2).sum
    val totalN = big.map(_._2).sum
    spark.stop()
    println(s"""{"metric":"stream_scale_smoke","scale":$scale,"src":"$srcDir","load":[${f(loadStart)},${f(loadEnd)}],"x1_total_sec":${f(total1)},"x${scale}_total_sec":${f(totalN)},"total_ratio":${f(totalN / total1)},"queries":{${items.mkString(",")}}}""")
  }
}
