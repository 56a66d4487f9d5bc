package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup-style semantic pruning (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", arXiv:2303.09540): cluster the embedding space with
  * k-means, then compare vectors ONLY within their cluster and collapse
  * any group whose pairwise cosine clears a threshold down to one
  * representative. The lexical dedup family (MinHash/SimHash/spans)
  * removes copies of the same TEXT; this removes restatements of the
  * same CONTENT — the next pruning stage of a web-scale training
  * pipeline after exact and near-dup passes.
  *
  * Composition — nothing here is new machinery, which is the point:
  *   1. CLUSTERING — [[Similarity.fitCentroids]] (bounded driver-side
  *      sample, deterministic) + [[Similarity.refineCentroids]]
  *      (distributed spherical Lloyd passes) + the codegen'd
  *      [[Similarity.assignCentroids]] argmax scan. k scales with the
  *      corpus (`n / clusterTarget`), so cluster populations — and
  *      therefore per-cluster comparison cost — stay bounded as the
  *      corpus grows: the SemDeDup contract that makes this
  *      cluster-bounded, never corpus².
  *   2. CANDIDATES — an ids-only self-join on `cid`. A degenerate
  *      cluster larger than `cap` (k-means collapsing a mass-duplicated
  *      region onto one centroid) degrades to star candidates around
  *      the cluster-min id ([[Dedup.splitHotKeysStar]] — the same guard
  *      every LSH candidate path uses), so no cluster can go quadratic.
  *   3. VERIFY + GROUP — [[Dedup.verifyCosinePairs]] (compact int8
  *      sketch prefilter, then exact cosine at surviving-candidate
  *      cardinality) and [[Dedup.connectedComponents]]; canonical id =
  *      component minimum, the survivorship rule shared with every
  *      other dedup path.
  *
  * Determinism: exact-duplicate vectors always land in the same cluster
  * (identical input → identical argmax even under ulp-level centroid
  * drift from distributed mean accumulation order) and verify at
  * cosine 1, so planted copies are caught unconditionally — the
  * property [[qSemanticGate]] pins against the oracle. Which NATURAL
  * near-restatements share a cluster depends on the fitted centroids
  * (the documented approximation of SemDeDup itself — pairs split
  * across cluster boundaries are missed), so the main query is
  * registered no-oracle/rows-only with the gate as its oracle-checked
  * companion, exactly the sim_ivf_topk / sim_recall discipline.
  */
object SemanticDedup {

  /** Cluster-population target: k = max(16, n/target). 256 keeps the
    * per-cluster candidate quadratic ~3·10⁴ pairs — bounded work per
    * cluster at ANY corpus size, with cluster count (and so centroid-fit
    * cost) growing linearly instead.
    *
    * Scale envelope of the FIT (the BPE-trainer discipline of stating
    * it): one Lloyd assignment pass costs n·k multiplies, and with
    * k ∝ n that is n²/target — measured build_ratio 5.61 at 100×
    * (SCALE_STRESS_r15) against the probe's cluster-bounded 3.03. The
    * fit is write-once per corpus ([[materializedCentroids]], prebuild
    * phase), so the quadratic term is paid once at ingest, and a 100 TB
    * deployment caps it the way every production k-means does: fit
    * centroids on a fixed-size SAMPLE (fitCentroids already is
    * sample-bound; it is the refine pass that sweeps the corpus) and/or
    * hold k at a ceiling, trading cluster population growth for fit
    * cost — the probe stays cluster-bounded either way. */
  val DefaultClusterTarget = 256

  /** Degenerate-cluster guard: same default as the LSH bucket caps. */
  val DefaultClusterCap = 2048

  /** (vec_id, canonical_vec_id) for every vector in a multi-member
    * semantic-duplicate group — canonical = group minimum. Keep policy
    * for a pipeline: drop rows where vec_id != canonical_vec_id. */
  def semanticPrune(e: DataFrame, threshold: Double = 0.95,
      clusterTarget: Int = DefaultClusterTarget,
      cap: Int = DefaultClusterCap): DataFrame = {
    val n = e.count()
    if (n == 0) return emptyResult(e)
    val k = math.max(16L, n / clusterTarget).toInt
    val centroids = Similarity.refineCentroids(e,
      Similarity.fitCentroids(e, k), iters = 1)
    pruneWithCentroids(e, centroids, threshold, cap)
  }

  private def emptyResult(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("vec_id").as("canonical_vec_id")).limit(0)

  /** The probe half: assign → within-cluster candidates → verify →
    * group, against ALREADY-FITTED centroids (per-call, or the
    * write-once materialized fit a real ingest produces). */
  private[graft] def pruneWithCentroids(e: DataFrame,
      centroids: Array[Array[Double]], threshold: Double,
      cap: Int): DataFrame = {
    val assigned = Similarity.assignCentroids(
      e.select(col("vec_id"), col("embedding")), centroids)
      .select(col("vec_id"), col("cid"))
    val (capped, hotSplit) = Dedup.splitHotKeysStar(
      assigned, Seq("cid"), "vec_id", cap, "semanticPrune")
    val l = capped.select(col("vec_id").as("vid_a"), col("cid"))
    val r = capped.select(col("vec_id").as("vid_b"), col("cid"))
    // cluster-bounded by construction; corpus-sized sides — never
    // broadcast (the ngramJaccardCore reasoning). No distinct() needed,
    // unlike the LSH band joins: each vector belongs to exactly ONE
    // cluster, so a pair can collide on at most one cid (and the star
    // branch covers only hot cids, which the cold side anti-joined away).
    val selfCands = l.join(r.hint("shuffle_hash"), Seq("cid"))
      .filter(col("vid_a") < col("vid_b"))
      .select("vid_a", "vid_b")
    val cands = hotSplit.fold(selfCands)(h => selfCands.unionAll(
      h.star.select(col("doc_a").as("vid_a"), col("doc_b").as("vid_b"))))
    val pairs = Dedup.verifyCosinePairs(cands, e, e, "vid_a", "vid_b",
      threshold)
    Dedup.connectedComponents(
        pairs.select(col("vid_a").as("doc_a"), col("vid_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"),
        col("canonical_doc_id").as("canonical_vec_id"))
      .orderBy("vec_id")
  }

  /** Bumped whenever the centroid-fit semantics change — rides in the
    * cache key (the int8-codes discipline). */
  private val CentroidsVersion = 1

  /** Write-once materialized k-means fit for `dir`'s embeddings table:
    * SemDeDup clusters at INGEST (one fit per corpus), then every prune
    * probe reuses the centroids — the same write-once/probe-many split
    * as the IVF index. Stored as a (cid, centroid) parquet keyed on
    * (version, k, data fingerprint). */
  private def materializedCentroids(s: SparkSession, dir: String,
      k: Int): Array[Array[Double]] = {
    val (bytes, mtime) = MaterializedCache.fingerprint(
      java.nio.file.Paths.get(dir, "embeddings.parquet"))
    val stem = dir.replaceAll("[^A-Za-z0-9._-]", "_") + "_semcent"
    val key = s"${stem}_v${CentroidsVersion}_k${k}_${bytes}_$mtime"
    val idx = MaterializedCache.getOrBuild("graft_sem_centroids", stem, key,
        "_SUCCESS") { tmp =>
      val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val cents = Similarity.refineCentroids(e,
        Similarity.fitCentroids(e, k), iters = 1)
      import s.implicits._
      cents.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
        .toDF("cid", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    }
    s.read.parquet(idx.toString).orderBy("cid")
      .collect().map(_.getSeq[Double](1).toArray)
  }

  /** Registered query (`dedup_semantic`): the embeddings corpus with
    * planted exact copies — every 10th vector re-keyed under +1000000 —
    * pruned against the write-once materialized centroid fit
    * ([[materializedCentroids]]; clones assign identically to their
    * sources whatever the fit, so planting does not perturb it).
    * No-oracle (cluster membership for natural near-restatements
    * depends on the fitted centroids); [[qSemanticGate]] is the
    * oracle-checked companion. */
  def qSemanticPrune(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(s, dir).select("vec_id", "embedding")
    val n = base.count()
    if (n == 0) return emptyResult(base)
    val k = math.max(16L, n / DefaultClusterTarget).toInt
    pruneWithCentroids(plantedCorpus(s, dir),
      materializedCentroids(s, dir, k), threshold = 0.95,
      cap = DefaultClusterCap)
  }

  private def plantedCorpus(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
    e.unionByName(e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
  }

  /** Registered gate (`dedup_semantic_gate`): the oracle-checkable
    * CONTRACT of the semantic prune — every planted exact copy MUST be
    * caught in the same group as its source (identical vectors share a
    * cluster and verify at cosine 1 regardless of where the centroids
    * landed). Emits (threshold, n_planted, all planted caught, pass);
    * the oracle recomputes n_planted from the table and supplies the
    * constant flags, so a clustering/verify/grouping regression flips a
    * flag and hash-mismatches. */
  def qSemanticGate(s: SparkSession, dir: String): DataFrame = {
    val out = qSemanticPrune(s, dir).localCheckpoint()
    val planted = Tables.embeddings(s, dir)
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("src"), (col("vec_id") + 1000000L).as("clone"))
    // a clone is caught iff it resolves to the same component as its
    // source (source absent from the output = source is its own
    // canonical — the two-member {src, clone} group case)
    val canon = out.select(col("vec_id"), col("canonical_vec_id"))
    val joined = planted
      .join(canon.withColumnRenamed("vec_id", "clone")
        .withColumnRenamed("canonical_vec_id", "canon_clone"), Seq("clone"),
        "left")
      .join(canon.withColumnRenamed("vec_id", "src")
        .withColumnRenamed("canonical_vec_id", "canon_src"), Seq("src"),
        "left")
      .select(col("src"), col("canon_clone"),
        coalesce(col("canon_src"), col("src")).as("canon_src"))
    val nPlanted = planted.count()
    val caught = joined
      .filter(col("canon_clone").isNotNull &&
        col("canon_clone") === col("canon_src")).count()
    import s.implicits._
    Seq((0.95, nPlanted, caught == nPlanted, caught == nPlanted && nPlanted > 0))
      .toDF("threshold", "n_planted", "all_planted_caught", "pass")
  }
}
