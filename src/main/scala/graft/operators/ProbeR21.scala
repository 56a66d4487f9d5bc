package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TEMPORARY r21 profiling main — stage-level timings for the hot
  * queries. Not a registered query; deleted before the round ships. */
object ProbeR21 {
  def t(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
  }
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, dir)
    val threshold = 0.3
    val n = 3

    // warm-up
    noop(docs.select("doc_id"))

    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      t("sh (hashedShingleDocs)") {
        noop(Dedup.hashedShingleDocs(docs, n))
      }
      val sh = Dedup.hashedShingleDocs(docs, n).localCheckpoint()
      val posting = sh
        .select(col("doc_id"), size(col("shingles")).as("n_sh"),
          explode(col("shingles")).as("shingle"))
      t("posting explode") { noop(posting) }
      val dfreq = posting.groupBy("shingle").agg(count(lit(1)).as("df"))
      t("dfreq") { noop(dfreq) }
      val prefix0 = posting
        .join(dfreq.hint("shuffle_hash"), Seq("shingle"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy("df", "shingle")))
        .filter(col("rn") <=
          col("n_sh") - ceil(col("n_sh") * lit(threshold)) + lit(1))
        .select("doc_id", "shingle", "n_sh")
      t("prefix posting (join+window)") { noop(prefix0) }
      val prefix = prefix0.localCheckpoint()
      val l = prefix.select(col("doc_id").as("doc_a"), col("shingle"),
        col("n_sh").as("na"))
      val r = prefix.select(col("doc_id").as("doc_b"), col("shingle"),
        col("n_sh").as("nb"))
      val selfCands = l.join(r.hint("shuffle_hash"), Seq("shingle"))
        .filter(col("doc_a") < col("doc_b") &&
          least(col("na"), col("nb")).cast("double") >=
            greatest(col("na"), col("nb")) * threshold)
        .select("doc_a", "doc_b")
      t("selfCands join") { noop(selfCands) }
      val cands = selfCands.distinct().localCheckpoint()
      println(s"[probe] n_cands = ${cands.count()}")
      // verifyJaccard replica
      val sizes = sh.select(col("doc_id"), size(col("shingles")).as("n"))
      val pruned = cands
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .filter(least(col("na"), col("nb")).cast("double") >=
          greatest(col("na"), col("nb")) * threshold)
        .select("doc_a", "doc_b")
      t("verify size-prune") { noop(pruned) }
      val prunedP = pruned.localCheckpoint()
      println(s"[probe] n_pruned = ${prunedP.count()}")
      val joined = prunedP
        .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
        .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      t("verify array joins only") { noop(joined.select("doc_a", "doc_b")) }
      t("verify intersect+filter (builtin)") {
        noop(joined
          .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("jaccard", col("n_common") /
            (size(col("sh_a")) + size(col("sh_b")) - col("n_common")))
          .filter(col("jaccard") >= threshold)
          .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard")))
      }
      import org.apache.spark.sql.GraftColumnBridge
      def sic(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        GraftColumnBridge.column(graft.functions.SortedIntersectCount(
          GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
      val shSorted = sh.select(col("doc_id"),
        sort_array(col("shingles")).as("shingles"))
      val joinedS = prunedP
        .join(shSorted.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
        .join(shSorted.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      t("verify intersect+filter (kernel)") {
        noop(joinedS
          .withColumn("n_common", sic(col("sh_a"), col("sh_b")))
          .withColumn("jaccard", col("n_common") /
            (size(col("sh_a")) + size(col("sh_b")) - col("n_common")))
          .filter(col("jaccard") >= threshold)
          .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard")))
      }
    }
    spark.stop()
  }
}
