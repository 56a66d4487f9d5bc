package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY r21 profiling main — stage-level attribution of
  * lm_logprob's 10× scale curve (VERDICT r20 item 7: 2.27× at 10× in
  * the distinct-mode smoke; hypothesis was the bigram join's build side
  * crossing a spill threshold). Replicates [[operators.TextStats.lmLogprob]]'s
  * internals stage by stage with the noop sink at 1× and N×. Not a
  * registered query; deleted before the round ships, findings recorded
  * in OPTIMIZATION_r21.md. */
object ProbeLm {
  def t(label: String)(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[probe] $label%-34s $s%8.3f s")
    s
  }
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("graft_probe_lm")
    val oneDir = tmp.resolve("x1").toString
    val bigDir = tmp.resolve(s"x$scale").toString
    ScaleSmoke.buildScaledDir(spark, src, 1, oneDir, "distinct")
    ScaleSmoke.buildScaledDir(spark, src, scale, bigDir, "distinct")

    def stages(dir: String): Map[String, Double] = {
      val docs = Tables.documents(spark, dir)
      val arr = filter(split(coalesce(col("text"), lit("")), " "),
        x => x =!= "")
      // uc: unigram counts (hashed), as in lmLogprob
      val ucL = docs.select(explode(arr).as("w"))
        .groupBy(xxhash64(col("w")).as("h1"))
        .agg(count(lit(1)).as("c1"))
      val a = t("uc agg") { noop(ucL) }
      val uc = ucL.localCheckpoint()
      val pairsL = docs
        .select(col("doc_id"), arr.as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("doc_id"), explode(
          transform(sequence(lit(0), size(col("a")) - 2),
            i => struct(element_at(col("a"), i + 1).as("w1"),
              concat(element_at(col("a"), i + 1), lit(" "),
                element_at(col("a"), i + 2)).as("b")))).as("p"))
        .select(col("doc_id"), xxhash64(col("p.w1")).as("h1"),
          xxhash64(col("p.b")).as("h12"))
      val b = t("pairs build") { noop(pairsL) }
      val pairs = pairsL.localCheckpoint()
      val bcL = pairs.groupBy("h12").agg(count(lit(1)).as("c12"))
      val c = t("bc agg (bigram counts)") { noop(bcL) }
      val d = t("pairs JOIN bc") { noop(pairs.join(bcL, "h12")) }
      val e = t("pairs JOIN bc JOIN uc") {
        noop(pairs.join(bcL, "h12").join(uc, "h1"))
      }
      val vocab = uc.agg(count(lit(1)).as("v"))
      val f = t("full tail (joins+agg)") {
        noop(pairs.join(bcL, "h12").join(uc, "h1")
          .crossJoin(broadcast(vocab))
          .withColumn("il", round(log((col("c12") + 1).cast("double") /
            (col("c1") + col("v"))) * 1000000.0).cast("long"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum("il").as("ilogp_sum")))
      }
      val g = t("registered query") {
        noop(operators.TextStats.qLmLogprob(spark, dir))
      }
      Map("uc" -> a, "pairs" -> b, "bc" -> c, "join_bc" -> d,
        "join_bc_uc" -> e, "tail" -> f, "full" -> g)
    }

    println("=== x1 (warm-up pass) ===")
    stages(oneDir)
    println("=== x1 ===")
    val s1 = stages(oneDir)
    println(s"=== x$scale ===")
    val sN = stages(bigDir)
    println("[probe] ratios: " + s1.keys.toSeq.sorted.map { k =>
      f"$k=${sN(k) / s1(k)}%.2f"
    }.mkString(" "))

    val walk = java.nio.file.Files.walk(tmp)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
    spark.stop()
  }
}
