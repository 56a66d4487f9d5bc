package graft

import org.apache.spark.sql.SparkSession

/** Binary-ANN recall-at-scale stress (VERDICT r17 ask #3): the 512-d
  * 100× stress line priced sim_binary_topk's WALL (2.29×) but recall at
  * the fixed 128-pool was only measured to 4× (0.96 → 0.71). This tool
  * measures the (corpus, pool, recall) surface directly: scaled
  * replicas of the sf corpus (ScaleSmoke's distinct mode — rotated
  * vectors, so replicas are ~orthogonal, the near-uniform worst case
  * for any 1-bit quantizer) at 1×/10×/100×, vecMult-widened to 512-d,
  * probed at a pool ladder, recall@k scored against the exact
  * brute-force top-k per scale.
  *
  * What the surface shows (and the scaladoc rule it backs): at a FIXED
  * pool, recall degrades as the corpus grows — 1 bit/dim Hamming is a
  * coarse angle proxy, so the number of false Hamming-neighbors ahead
  * of a true cosine-neighbor grows with N while the pool stays put.
  * Holding pool/N constant holds recall (the pool is a SAMPLE-FRACTION
  * knob, not an absolute one); the re-rank cost is linear in pool, so
  * the serving cost of constant recall grows linearly with corpus —
  * still 32× cheaper at the prefilter than a float scan, which is the
  * trade's whole point. Production corpora with real cluster structure
  * sit far above this synthetic floor.
  *
  * One JSON line:
  * `{"metric":"binary_recall_scale","k":3,"n_queries":8,"points":[
  *   {"scale":S,"n":N,"pool":P,"recall":R,"probe_sec":…},…]}`.
  */
object BinaryRecallStress {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val vecMult = sys.env.getOrElse("SPARK_GRAFT_VEC_MULT", "8").toInt
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,10,100")
      .split(',').map(_.trim.toInt).toSeq
    val pools = sys.env.getOrElse("SPARK_GRAFT_POOLS", "128,512,2048")
      .split(',').map(_.trim.toInt).toSeq
    val k = 3
    val qids = 0L to 7L
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
    def f(v: Double) = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    val work = TmpDirs.scratch("graft_binrecall")
    val points = scales.flatMap { scale =>
      val dir = work.resolve(s"x$scale").toString
      ScaleSmoke.buildScaledDir(spark, srcDir, scale, dir, "distinct", vecMult)
      val n = Tables.embeddings(spark, dir).count()
      // exact truth set once per scale, shared across the pool ladder
      val exact = operators.Similarity.batchTopK(spark, dir, qids, k)
        .select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // untimed first probe pays the write-once bits build (the
      // prebuild discipline); each pool point then times probe-only
      operators.BinaryQuant.binaryTopK(spark, dir, qids, k, pools.head).count()
      // the knob rule's own point rides along (recommendedPool =
      // max(128, n/16), the sample-fraction rule), deduped when the
      // ladder already carries it
      val ladder =
        (pools :+ operators.BinaryQuant.recommendedPool(n)).distinct
      ladder.map { pool =>
        val t0 = System.nanoTime()
        val approx = operators.BinaryQuant.binaryTopK(spark, dir, qids, k, pool)
          .select("query_id", "vec_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = (approx & exact).size.toDouble / (qids.size * k)
        s"""{"scale":$scale,"n":$n,"pool":$pool,"recall":${f(recall)},"probe_sec":${f(sec)}}"""
      }
    }
    val loadEnd = loadAvg()
    spark.stop()
    operators.MaterializedCache
      .dropEntriesContaining(work.getFileName.toString)
    println(s"""{"metric":"binary_recall_scale","k":$k,"n_queries":${qids.size},"vec_mult":$vecMult,"src":"$srcDir","load":[${f(loadStart)},${f(loadEnd)}],"points":[${points.mkString(",")}]}""")
  }
}
