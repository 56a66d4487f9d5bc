package graft.operators

import graft.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family over `documents(doc_id, text, …)` — the
  * LLM-training-pipeline operators the charter adds on top of the
  * reference's surface (SURVEY.md §2B).
  *
  * Scale design (the part that matters at 100 TB):
  *   - NOTHING here is O(n²) in documents: exact dedup is a hash
  *     aggregate; exact n-gram Jaccard joins on shared shingles (pairs
  *     that share no shingle are never materialized); MinHash/SimHash
  *     prune candidates with LSH banding before any pairwise work.
  *   - Every shuffle key is (shingle), (band, signature) or (doc pair) —
  *     all fine-grained, so partitions stay balanced. At web scale the
  *     shared-shingle join additionally wants a document-frequency cap on
  *     shingles (drop shingles appearing in >df_max docs: they generate
  *     quadratic pair blowup and carry no discriminative signal); the cap
  *     is a parameter here and unit-tested, defaulting to off at sf scale.
  *   - Connected components for cluster assignment is the iterative
  *     min-label-propagation join (no driver-side graph), converging in
  *     O(log n) rounds on near-dup graphs (components are tiny chains).
  */
object Dedup {

  // ---------------------------------------------------------------------
  // shared building blocks
  // ---------------------------------------------------------------------

  /** (doc_id, shingles: array<string>) — distinct word n-grams per doc.
    * Docs shorter than n words produce an empty array (kept: they simply
    * can never match a candidate pair). */
  def shingleDocs(docs: DataFrame, n: Int = 3): DataFrame = {
    val words = filter(split(col("text"), " "), w => length(w) > 0)
    // guard: sequence(0, negative) counts DOWN in Spark, so docs shorter
    // than n words must short-circuit to an empty shingle set
    val grams = when(size(words) >= n,
      array_distinct(transform(
        sequence(lit(0), size(words) - n),
        i => array_join(slice(words, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
    docs.select(col("doc_id"), grams.as("shingles"))
  }

  /** Exploded (doc_id, shingle) with an optional document-frequency cap:
    * shingles occurring in more than `dfCap` docs are dropped before the
    * pair join (standard web-scale guard against quadratic hot keys). */
  def shinglePosting(docs: DataFrame, n: Int = 3,
      dfCap: Option[Int] = None): DataFrame = {
    val posting = shingleDocs(docs, n)
      .select(col("doc_id"), explode(col("shingles")).as("shingle"))
    dfCap.fold(posting) { cap =>
      val hot = posting.groupBy("shingle").count()
        .filter(col("count") > cap).select("shingle")
      posting.join(broadcast(hot), Seq("shingle"), "left_anti")
    }
  }

  /** Exact pairwise Jaccard ≥ threshold via the shared-shingle join:
    * only doc pairs sharing ≥1 shingle are ever formed. Output
    * (doc_a, doc_b, jaccard) with doc_a < doc_b. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.8,
      n: Int = 3, dfCap: Option[Int] = None): DataFrame = {
    val posting = shinglePosting(docs, n, dfCap)
    val sizes = posting.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val a = posting.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = posting.select(col("doc_id").as("doc_b"), col("shingle"))
    val common = a.join(b, Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_shingles").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_shingles").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("n_common") / (col("na") + col("nb") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  // ---------------------------------------------------------------------
  // MinHash + LSH
  // ---------------------------------------------------------------------

  /** numPerm universal-hash permutations over a 31-bit hash space:
    * perm_i(h) = (a_i·h + b_i) mod p, p = 2³¹−1 (Mersenne prime). Seeds
    * are fixed so signatures are reproducible across runs/executors. */
  private val MinhashP = 2147483647L
  private def minhashCoeffs(numPerm: Int): Array[(Long, Long)] = {
    val rng = new scala.util.Random(42)
    Array.fill(numPerm)((rng.nextInt(Int.MaxValue - 1).toLong + 1,
      rng.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash signature per doc, banded for LSH. Returns
    * (doc_id, shingles, bands: array<struct<band:int, sig:bigint>>).
    *
    * The signature is computed per-row from the doc's shingle hash set
    * (xxhash64 folded to 31 bits) by a single Scala function — no
    * explode-by-numPerm blowup, no shuffle. bandsPerSig × rowsPerBand =
    * numPerm; with (32 bands × 4 rows) the probability of MISSING a pair
    * at Jaccard 0.8 is (1−0.8⁴)³² ≈ 5e-8, so LSH candidates + exact
    * verification below is exact-in-practice (and never has false
    * positives, since verification recomputes true Jaccard).
    */
  def minhashBands(docs: DataFrame, n: Int = 3, numPerm: Int = 128,
      bands: Int = 32): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val rowsPerBand = numPerm / bands
    val coeffs = minhashCoeffs(numPerm)
    val sign = udf { hashes: Seq[Long] =>
      if (hashes.isEmpty) Seq.empty[Long]
      else {
        val sig = Array.fill(numPerm)(Long.MaxValue)
        hashes.foreach { h0 =>
          val h = (h0 & Long.MaxValue) % MinhashP
          var i = 0
          while (i < numPerm) {
            val (a, b) = coeffs(i)
            val v = (a * h + b) % MinhashP
            if (v < sig(i)) sig(i) = v
            i += 1
          }
        }
        // fold each band of rowsPerBand values into one 64-bit signature
        (0 until bands).map { bi =>
          var acc = 1125899906842597L
          var j = bi * rowsPerBand
          while (j < (bi + 1) * rowsPerBand) { acc = acc * 31 + sig(j); j += 1 }
          acc
        }
      }
    }
    shingleDocs(docs, n)
      .withColumn("shingleHashes",
        transform(col("shingles"), s => xxhash64(s)))
      .withColumn("bandSigs", sign(col("shingleHashes")))
      .select(col("doc_id"), col("shingles"), posexplode(col("bandSigs")))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "sig")
  }

  /** MinHash-LSH near-dup pairs: band-bucket join for candidates, then
    * EXACT Jaccard verification on the candidates' shingle sets (so the
    * output equals [[ngramJaccardPairs]] up to the negligible LSH miss
    * probability — which is why both share one oracle). */
  def minhashLshPairs(docs: DataFrame, threshold: Double = 0.8,
      n: Int = 3, numPerm: Int = 128, bands: Int = 32): DataFrame = {
    val banded = minhashBands(docs, n, numPerm, bands)
      .select(col("doc_id"), col("shingles"), col("band"), col("sig"))
    val l = banded.select(col("doc_id").as("doc_a"),
      col("shingles").as("sh_a"), col("band"), col("sig"))
    val r = banded.select(col("doc_id").as("doc_b"),
      col("shingles").as("sh_b"), col("band"), col("sig"))
    l.join(r, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b").distinct()
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("n_common") /
        (size(col("sh_a")) + size(col("sh_b")) - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  // ---------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------

  /** 64-bit SimHash per doc over word-unigram features (weight = term
    * frequency): bit k of the fingerprint is the sign of Σ tf(w)·±1 over
    * bit k of xxhash64(w). Computed per-row, no shuffle. */
  def simhash(docs: DataFrame): DataFrame = {
    val fp = udf { words: Seq[String] =>
      val acc = new Array[Long](64)
      words.groupBy(identity).foreach { case (w, ws) =>
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
          .hashUnsafeBytes2(w.getBytes("UTF-8"),
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
            w.getBytes("UTF-8").length, 42).toLong
        // widen the 32-bit murmur to 64 deterministic bits
        val h64 = h * 0x9E3779B97F4A7C15L + (w.length.toLong << 32)
        val tf = ws.size.toLong
        var k = 0
        while (k < 64) {
          acc(k) += (if (((h64 >>> k) & 1L) == 1L) tf else -tf); k += 1
        }
      }
      var out = 0L
      var k = 0
      while (k < 64) { if (acc(k) > 0) out |= (1L << k); k += 1 }
      out
    }
    docs.select(col("doc_id"),
      fp(filter(split(col("text"), " "), w => length(w) > 0)).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    * Pigeonhole blocking: split the 64-bit fingerprint into
    * (maxHamming+1) bands — any pair within distance maxHamming agrees
    * exactly on ≥1 band, so the band join finds all of them; the cheap
    * xor/bit_count verification removes false positives. No O(n²). */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val sh = simhash(docs)
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("key",
        expr(s"shiftrightunsigned(simhash, band * $width)")
          .bitwiseAND(lit((1L << width) - 1)))
    val l = banded.select(col("doc_id").as("doc_a"), col("simhash").as("fp_a"),
      col("band"), col("key"))
    val r = banded.select(col("doc_id").as("doc_b"), col("simhash").as("fp_b"),
      col("band"), col("key"))
    l.join(r, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "fp_a", "fp_b").distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  // ---------------------------------------------------------------------
  // Embedding near-dup
  // ---------------------------------------------------------------------

  /** Near-duplicate vectors by cosine ≥ threshold, via random-hyperplane
    * LSH: bands of `rowsPerBand` sign-bits; pairs colliding in ≥1 band are
    * verified with exact cosine. At cos ≥ 0.95 (bit-flip prob ≈ 0.10),
    * 32 bands × 8 bits miss with prob ≈ (1−0.9⁸)³² ≈ 2e-8 — and exact
    * verification removes all false positives, so the output matches the
    * exhaustive oracle. */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double = 0.95,
      bands: Int = 32, rowsPerBand: Int = 8, dim: Int = 64): DataFrame = {
    val rng = new scala.util.Random(42)
    val planes = Array.fill(bands * rowsPerBand, dim)(rng.nextGaussian())
    val sketch = udf { v: Seq[Float] =>
      (0 until bands).map { bi =>
        var acc = 0L
        var j = 0
        while (j < rowsPerBand) {
          val p = planes(bi * rowsPerBand + j)
          var d = 0.0
          var k = 0
          while (k < math.min(p.length, v.length)) { d += p(k) * v(k); k += 1 }
          acc = (acc << 1) | (if (d >= 0) 1L else 0L)
          j += 1
        }
        acc
      }
    }
    val banded = embeddings
      .select(col("vec_id"), col("embedding"),
        posexplode(sketch(col("embedding"))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
    val l = banded.select(col("vec_id").as("vid_a"),
      col("embedding").as("emb_a"), col("band"), col("key"))
    val r = banded.select(col("vec_id").as("vid_b"),
      col("embedding").as("emb_b"), col("band"), col("key"))
    l.join(r, Seq("band", "key"))
      .filter(col("vid_a") < col("vid_b"))
      .select("vid_a", "vid_b", "emb_a", "emb_b").distinct()
      .withColumn("cos", VectorFunctions.cosine(col("emb_a"), col("emb_b")))
      .filter(col("cos") >= threshold)
      .select(col("vid_a"), col("vid_b"), round(col("cos"), 4).as("cos_sim"))
      .orderBy("vid_a", "vid_b")
  }

  // ---------------------------------------------------------------------
  // Clustering (connected components) and the query entries
  // ---------------------------------------------------------------------

  /** Connected components over a near-dup pair list by iterative min-label
    * propagation (pure DataFrame joins — no driver-side graph, no
    * GraphFrames dependency). Converges when no label changes; near-dup
    * components are tiny, so this is a handful of rounds of
    * broadcast-scale joins even when the pair list is huge. Output:
    * (doc_id, canonical_doc_id = component minimum). */
  def connectedComponents(pairs: DataFrame,
      aCol: String = "doc_a", bCol: String = "doc_b",
      maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .unionAll(pairs.select(col(bCol).as("a"), col(aCol).as("b")))
      .persist()
    var labels = edges.groupBy(col("a").as("node"))
      .agg(least(min(col("b")), first(col("a"))).as("label"))
      .persist()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // each node adopts the min label among its own and its neighbors'
      val neighborLabels = edges
        .join(labels.withColumnRenamed("node", "b"), "b")
        .groupBy(col("a").as("node")).agg(min(col("label")).as("nlabel"))
      val next = labels.join(neighborLabels, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .persist()
      changed = next.join(labels.withColumnRenamed("label", "old"), "node")
        .filter(col("label") =!= col("old")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    edges.unpersist()
    labels.select(col("node").as("doc_id"), col("label").as("canonical_doc_id"))
      .orderBy("doc_id")
  }

  // --- SparkEntry-facing query wrappers ---------------------------------

  def qNgramJaccard(s: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(Tables.documents(s, dir))

  def qMinhashLsh(s: SparkSession, dir: String): DataFrame =
    minhashLshPairs(Tables.documents(s, dir))

  def qSimhash(s: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables.documents(s, dir))

  def qEmbeddingNearDup(s: SparkSession, dir: String): DataFrame =
    embeddingNearDupPairs(Tables.embeddings(s, dir))

  def qDedupClusters(s: SparkSession, dir: String): DataFrame =
    connectedComponents(ngramJaccardPairs(Tables.documents(s, dir)))
}
