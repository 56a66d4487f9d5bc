package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-smoke harness (VERDICT r9 item 2): replicate the sf corpus
  * `SPARK_GRAFT_SCALE`× (default 10) with re-keyed ids, run the
  * dedup/text family ONCE per scale, and print one JSON line with
  * per-query wall seconds at 1× and N× plus the ratio — the check that
  * the family's cost curve is ~linear in corpus size (the df cap bounds
  * the posting-pair join, so a superlinear ratio means a regression in
  * that bounding, not "more data").
  *
  * The replicated corpus is deliberately a NEAR-DUP corpus, not a fresh
  * sample: replica 0 keeps the source text, replicas 1..N-1 get a
  * per-replica tail token (high-Jaccard near-duplicates — the shape a
  * real dedup pass exists for), and every 50th SOURCE doc gets one fixed
  * injected sentence across all replicas, pushing those shingles'
  * document frequency to scale×(docs/50) ≫ the 128 df cap — so the
  * hot-shingle materialization path (Dedup.materializeHot) executes at
  * volume instead of matching zero rows. Embedding replicas are exact
  * vector copies (realistic duplicate embeddings; they stress the
  * near-dup bucket-pair path the same way).
  *
  * Completion with exit 0 IS the no-OOM assertion: any executor
  * OOM/spill-death surfaces as a failed Spark job and a non-zero exit.
  */
object ScaleSmoke {
  private val IdStride = 10_000_000L

  /** One fixed sentence; 9 words → 7 three-word shingles, each reaching
    * df = scale × (nDocs/50) in the scaled corpus (1,000 at sf0.1 × 10). */
  private val HotSentence =
    " graft hot shingle sentence injected for the df cap"

  /** `distinct` mode: rewrite every 3rd word of replica `rep` with a
    * replica-specific suffix. A changed word kills every 3-shingle
    * containing it, so cross-replica Jaccard collapses far below any
    * dedup threshold — the replicas become DISTINCT documents and the
    * family's work grows row-linearly, isolating scaling from the
    * pair-quadratic growth a near-dup corpus genuinely has. */
  private val perturbUdf = udf { (text: String, rep: Int) =>
    if (text == null || rep == 0) text
    else {
      val w = text.split(" ")
      var i = rep % 3
      while (i < w.length) { w(i) = w(i) + "r" + rep; i += 3 }
      w.mkString(" ")
    }
  }

  /** Widen each embedding `mult`× by tiling with a mild per-segment
    * scale drift (segment j scaled by 1 + j/1000) — a deterministic way
    * to stress REAL vector widths (r12 verdict ask #8: 64-d fixtures
    * never exercise the sketch UDF and TopKByScoreAgg buffers where
    * they hurt; 512-d does). Tiling preserves cosine structure (a
    * near-dup pair stays near-dup after identical widening), so the
    * family's pair/recall semantics survive while every dot product,
    * sketch, and quantization loop runs 8× longer rows. */
  private val widenUdf = udf { (v: Seq[Float], mult: Int) =>
    if (v == null) null
    else {
      val d = v.length
      Array.tabulate(d * mult)(j => v(j % d) * (1f + (j / d) / 1000f))
    }
  }

  def buildScaledDir(s: SparkSession, srcDir: String, scale: Int,
      outDir: String, mode: String = "neardup",
      vecMult: Int = 1): Unit = {
    // Write SPLIT across the session's parallelism (the sf testdata is a
    // single part file, and a replicated single file stays one ~10-100 MB
    // file = ONE read partition under the 128 MB maxPartitionBytes
    // default): without this, every pre-shuffle per-row stage — the
    // hyperplane sketch, the text UDFs — ran effectively single-threaded
    // in the scaled runs, so the smoke measured one core's throughput
    // curve, not the engine's. A real corpus at any scale is many files;
    // ~32 parts per table at BOTH scales keeps x1 vs xN like-with-like
    // and lets the scan parallelize the way an object-store layout would.
    // (Found by ProfileEmb: the 512-d sketch stage dropped 29 s -> ~2 s
    // once the scan had 32 splits.)
    val parts = s.sparkContext.defaultParallelism
    val rep = explode(sequence(lit(0), lit(scale - 1))).as("rep")
    Tables.documents(s, srcDir)
      .select(col("*"), rep)
      .repartition(parts)
      .withColumn("doc_id", col("doc_id") + col("rep") * IdStride)
      .withColumn("text",
        if (mode == "distinct") perturbUdf(col("text"), col("rep"))
        else when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("rep"))))
      // IdStride % 50 == 0, so every replica of a %50 source doc stays %50:
      // the injected shingles' df scales with the corpus, past any cap.
      .withColumn("text",
        when(col("doc_id") % 50 === 0, concat(col("text"), lit(HotSentence)))
          .otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("rep")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    Tables.embeddings(s, srcDir)
      .select(col("*"), rep)
      .repartition(parts)
      .withColumn("vec_id", col("vec_id") + col("rep") * IdStride)
      // distinct mode: rotate the vector by `rep mod dim` positions — a
      // rotated dense vector is ~orthogonal to the original, so replicas
      // stop being near-duplicates (exact copies in neardup mode). The
      // modulus keeps the slice lengths legal at scale > dim (rep=64 on
      // 64-dim vectors slices a negative length and kills the write);
      // replicas whose rep is an exact multiple of dim stay unrotated —
      // a dim-th of the corpus, acceptable for a stress harness.
      .withColumn("rot",
        if (mode == "distinct") pmod(col("rep"), size(col("embedding")))
        else lit(0))
      .withColumn("embedding",
        if (mode == "distinct")
          when(col("rot") === 0, col("embedding")).otherwise(concat(
            slice(col("embedding"), col("rot") + 1,
              size(col("embedding")) - col("rot")),
            slice(col("embedding"), lit(1), col("rot"))))
        else col("embedding"))
      .withColumn("embedding",
        if (vecMult > 1) widenUdf(col("embedding"), lit(vecMult))
        else col("embedding"))
      .drop("rep", "rot")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // customer — the ER family's table. Replicas are re-keyed; 'distinct'
    // mode also shifts the c_acctbal blocking key far outside the source
    // range (+rep·100000, exact in decimal cents), so replicas are
    // DISTINCT entities and ER work grows row-linearly. 'neardup' keeps
    // the balance shared: replicas of one customer pile into the same
    // (nation, balance) / (segment, balance) blocks — block size = scale,
    // the hot-block shape EntityResolution's star guard exists for.
    val cust = Tables.customer(s, srcDir)
    val balType = cust.schema("c_acctbal").dataType
    cust.select(col("*"), rep)
      .repartition(parts)
      .withColumn("c_custkey", col("c_custkey").cast("long") + col("rep") * IdStride)
      .withColumn("c_acctbal",
        if (mode == "distinct")
          (col("c_acctbal") + col("rep") * lit(100000.0)).cast(balType)
        else col("c_acctbal"))
      .drop("rep")
      .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    // lineitem — the graph family's table. BOTH node-key columns are
    // re-keyed per replica, so the scaled co-supply graph is `scale`
    // DISJOINT copies of the source graph — the "more of the same world"
    // scale model: edges, triangles and PageRank work all grow linearly,
    // and any superlinear ratio is an engine regression, not graph math.
    Tables(s, srcDir, "lineitem")
      .select(col("*"), rep)
      .repartition(parts)
      .withColumn("l_orderkey", col("l_orderkey").cast("long") + col("rep") * IdStride)
      .withColumn("l_suppkey", col("l_suppkey").cast("long") + col("rep") * IdStride)
      .drop("rep")
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
  }

  // Dev aid (mirrors Bench's SPARK_GRAFT_ONLY): SPARK_GRAFT_SMOKE_ONLY=
  // substr1,substr2 restricts the family to matching names, for quick
  // re-measures of a single query's scale curve after a fix. Recorded in
  // the output line ("only":[...]) so a partial artifact self-identifies
  // — a filtered total_ratio must never read as family-wide evidence.
  private def onlyFilter: Seq[String] = sys.env.get("SPARK_GRAFT_SMOKE_ONLY")
    .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    .getOrElse(Seq.empty)

  private def family: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = {
    val only = onlyFilter
    SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      // Default family: the documents/embeddings corpus set; text_redact
      // reads the EVENTS table (nanos-timestamp source, not replicated
      // here). With SMOKE_ONLY set, selection widens to ANY registered
      // query (e.g. the sim_*/q15 ANN set for a wide-vector stress) —
      // the operator of a targeted run picks names whose tables the
      // scaled dir actually carries, and the "only" field in the output
      // keeps the artifact self-identifying.
      val inDefaultFamily =
        (n.startsWith("dedup_") || n.startsWith("text_") ||
          n.startsWith("emb_") || n == "sim_quantized_topk" ||
          n == "mixture_weights" || n == "cow_upsert" ||
          n == "source_overlap" || n == "neg_samples" ||
          n == "hh_lang_by_source" || n == "length_batches" ||
          n == "corpus_mix_apply" || n == "cms_term_freq" ||
          n == "corpus_domain_caps" || n == "funnel_domain_capped" ||
          n == "bpe_merges" || n == "bpe_encode" || n == "lm_logprob" ||
          // r13 verdict item 2: the families whose 100 TB posture rested
          // on reasoning alone — ER blocking self-joins, edge-driven
          // graph joins, the composed funnel, RRF fusion, the bounded
          // MMR audit collect, and the materialized int8 probe
          n == "er_customers" || n == "graph_pagerank" ||
          n == "graph_triangles" || n == "pipeline_funnel" ||
          n == "hybrid_retrieval" || n == "sim_mmr" ||
          n == "sim_quantized_probe" || n == "sim_quantized_batch" ||
          n == "mm_dedup" || n == "mm_neardup" ||
          n == "mm_neardup_gate") && n != "text_redact" &&
          // the recall gate's truth set is EXHAUSTIVE all-pairs by design
          // (verification-scale only, require-guarded) — running it on a
          // replicated corpus would be quadratic in scale, measuring the
          // oracle, not the engine
          n != "dedup_semantic_recall"
      if (only.isEmpty) inDefaultFamily
      else only.exists(n.contains)
    }
  }

  private def timeFamily(s: SparkSession, dir: String): Seq[(String, Double, Long)] =
    family.map { case (name, fn) =>
      System.gc()
      val t0 = System.nanoTime()
      val rows = fn(s, dir).count()
      (name, (System.nanoTime() - t0) / 1e9, rows)
    }

  /** Queries backed by a [[graft.operators.MaterializedCache]] artifact:
    * their FIRST call pays the write-once index/codes build. Timed
    * separately BEFORE the family passes (r13 verdict item 3: the r13
    * stress conflated build with probe — sim_ivf_probe read 6.64×
    * because the 512-d index build landed in the timed pass), so the
    * family ratios measure the serving path a 100 TB user pays per
    * query, and the artifact reports the amortized build cost
    * explicitly under "prebuild". */
  private val cacheBacked =
    Set("sim_ivf_probe", "sim_quantized_probe", "dedup_embedding",
      "dedup_semantic",
      // r16: rides the LSH artifact at its own 0.9-threshold geometry
      // (when a scale makes the two geometries coincide, the shared
      // build lands under dedup_embedding — alphabetically first in
      // prebuild — and this line reads probe-only)
      "emb_cross_decon",
      // r17: the planted media corpus (PNG/WAV encode) is a write-once
      // artifact now — first call pays the codec build, probes pay
      // fingerprint + banding (VERDICT r16 ask #4)
      "mm_neardup",
      // r17: the packed sign-bits table is a write-once artifact — first
      // call pays the packing scan, probes pay Hamming + pool re-rank
      "sim_binary_topk")

  /** Queries that SHARE a cacheBacked query's MaterializedCache artifact
    * without being the one prebuild() times (sim_quantized_batch reads
    * the int8 codes sim_quantized_probe is timed on; dedup_semantic_gate
    * builds the centroid fit dedup_semantic is timed on). Excluded from
    * warm-up alongside the cacheBacked set (r15 ADVICE #1): warming them
    * would build the shared artifact UNTIMED at 1×, so x1_build_sec
    * would measure a cache-hit probe while xN still pays the real
    * build — exactly the build/probe conflation prebuild() exists to
    * prevent, reintroduced through the side door. */
  private val sharesArtifact =
    Set("sim_quantized_batch", "dedup_semantic_gate",
      // reads the planted-media blob table mm_neardup is timed on
      "mm_neardup_gate",
      // reads the packed-bits table sim_binary_topk is timed on
      "sim_binary_recall")

  /** First call = artifact build + one probe; second call = cache-hit
    * probe only. Reporting BOTH splits the write-once build cost from
    * the serving cost generically (r16: the bounded semantic fit had
    * shrunk to ~1 s at 100× but the first-call "build_ratio" still read
    * 3.6 because the cluster-bounded PROBE dominated the first call —
    * the number stopped measuring what it was named after). */
  private def prebuild(s: SparkSession, dir: String)
      : Seq[(String, Double, Double)] =
    family.collect { case (name, fn) if cacheBacked(name) =>
      val t0 = System.nanoTime()
      fn(s, dir).count()
      val first = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      fn(s, dir).count()
      (name, first, (System.nanoTime() - t1) / 1e9)
    }

  /** Untimed warm-up over the selected subset of the family — JIT /
    * codegen / classloading warm-up without polluting a measured pass. */
  private def warmup(s: SparkSession, dir: String,
      include: String => Boolean): Unit =
    family.foreach { case (name, fn) =>
      if (include(name)) { fn(s, dir).count(): Unit }
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
    val mode = sys.env.getOrElse("SPARK_GRAFT_MODE", "neardup")
    // 1-min load at start/end, the Bench contention marker (r12 showed a
    // progressively-throttling host can double absolute walls): a smoke
    // artifact captured under load self-identifies instead of reading as
    // a curve regression.
    def loadAvg(): Double = try java.nio.file.Files
      .readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split(' ')(0).toDouble
      catch { case _: Exception => -1.0 }
    val loadStart = loadAvg()
    val work = TmpDirs.scratch("graft_scale")
    val oneDir = work.resolve("x1").toString
    val bigDir = work.resolve(s"x$scale").toString
    // 1× through the same writer so both runs read identically-laid-out
    // parquet (a raw-testdata 1× read would differ in file count/codec).
    // SPARK_GRAFT_VEC_MULT widens embeddings (e.g. 8 → 512-d from the
    // 64-d fixtures) at BOTH scales, so ratios compare like with like.
    val vecMult = sys.env.getOrElse("SPARK_GRAFT_VEC_MULT", "1").toInt
    buildScaledDir(spark, srcDir, 1, oneDir, mode, vecMult)
    buildScaledDir(spark, srcDir, scale, bigDir, mode, vecMult)
    // Untimed non-cache-backed warm-up FIRST (r14 ADVICE: prebuild ran
    // before any warm-up, so x1_build_sec absorbed first-Spark-job JIT /
    // codegen warm-up and build_ratio read overstated — the same
    // distortion the prebuild split fixed on the probe side). The
    // cache-backed queries are excluded here because their first call
    // IS the build prebuild() exists to measure — as are the queries
    // that share those artifacts (r15 ADVICE #1: warming
    // dedup_semantic_gate / sim_quantized_batch built the centroid fit /
    // int8 codes untimed, so x1_build_sec measured a cache hit and
    // build_ratio was overstated).
    warmup(spark, oneDir, n => !cacheBacked(n) && !sharesArtifact(n))
    // The BUILD code paths (centroid fit, int8 quantize, band/sketch
    // write, MaterializedCache machinery) get their JIT/codegen warm-up
    // against a tiny THROWAWAY corpus — not oneDir, whose artifacts
    // prebuild() is about to time. Without this, excluding the
    // artifact-sharing queries from warm-up (the r15 ADVICE #1 fix)
    // just traded one distortion for another: x1_build_sec absorbed
    // cold-start JIT instead of measuring a cache hit (first capture
    // attempt read 19–24 s x1 builds vs ~2–3 s warm). 256 rows keeps the
    // warm builds sub-second while exercising every kernel at the real
    // vector width (the slice reads the vecMult-widened oneDir).
    val warmDir = work.resolve("warm").toString
    Tables.embeddings(spark, oneDir).filter(col("vec_id") < 256)
      .write.mode("overwrite").parquet(s"$warmDir/embeddings.parquet")
    // documents slice for the planted-media build warm-up (mm_neardup's
    // PNG/WAV encode + raster-hash kernels)
    Tables.documents(spark, oneDir).filter(col("doc_id") < 256)
      .write.mode("overwrite").parquet(s"$warmDir/documents.parquet")
    family.foreach { case (name, fn) =>
      if (cacheBacked(name) || sharesArtifact(name)) {
        fn(spark, warmDir).count(): Unit
      }
    }
    // write-once artifact builds (IVF index, int8 codes, LSH sketch
    // tables) land HERE, not in the timed family passes — measured so
    // build cost stays visible
    val pre1 = prebuild(spark, oneDir)
    val preN = prebuild(spark, bigDir)
    // untimed warm-up at 1× so the timed 1× pass doesn't absorb JIT/codegen
    // warm-up (which would understate every ratio); cache-backed queries
    // are probe-only by now, so this warms their probe path too
    timeFamily(spark, oneDir)
    val one = timeFamily(spark, oneDir)
    val big = timeFamily(spark, bigDir)
    val loadEnd = loadAvg()
    val oneByName = one.map(t => t._1 -> t).toMap
    def f(v: Double) = BigDecimal(v)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString
    val items = big.map { case (name, sec, rows) =>
      val (_, sec1, rows1) = oneByName(name)
      s""""$name":{"x1_sec":${f(sec1)},"x${scale}_sec":${f(sec)},"ratio":${f(sec / sec1)},"x1_rows":$rows1,"x${scale}_rows":$rows}"""
    }
    val total1 = one.map(_._2).sum
    val totalN = big.map(_._2).sum
    val onlyJson =
      if (onlyFilter.isEmpty) ""
      else onlyFilter.map(s => s""""$s"""").mkString(""""only":[""", ",", "],")
    val preByName = pre1.map(t => t._1 -> t).toMap
    val preJson =
      if (preN.isEmpty) ""
      else preN.map { case (name, firstN, probeN) =>
        val (_, first1, probe1) = preByName(name)
        // first-call ratio keeps the legacy "build_ratio" name for
        // cross-round comparability; *_build_only_sec isolates the
        // write-once artifact cost (first − cache-hit probe, floored
        // at 0 for timer noise) — the number the fit envelope is about
        s""""$name":{"x1_build_sec":${f(first1)},"x${scale}_build_sec":${f(firstN)},"build_ratio":${f(firstN / first1)},"x1_probe_sec":${f(probe1)},"x${scale}_probe_sec":${f(probeN)},"x1_build_only_sec":${f(math.max(0.0, first1 - probe1))},"x${scale}_build_only_sec":${f(math.max(0.0, firstN - probeN))}}"""
      }.mkString(""","prebuild":{""", ",", "}")
    spark.stop()
    // drop this run's cache artifacts (keyed on the unique work dir — the
    // sibling prune can never reclaim them) before the work dir itself
    // goes at JVM exit via TmpDirs
    graft.operators.MaterializedCache
      .dropEntriesContaining(work.getFileName.toString)
    println(s"""{"metric":"scale_smoke","mode":"$mode","scale":$scale,"vec_mult":$vecMult,${onlyJson}"src":"$srcDir","load":[${f(loadStart)},${f(loadEnd)}],"x1_total_sec":${f(total1)},"x${scale}_total_sec":${f(totalN)},"total_ratio":${f(totalN / total1)},"queries":{${items.mkString(",")}}$preJson}""")
  }
}
