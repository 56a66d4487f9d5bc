package graft.operators

import graft.Tables
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact — broadcast the query vector(s), one
  *     codegen'd scan over the corpus, TakeOrderedAndProject top-k.
  *     This is the correctness baseline and the oracle-checked Q15.
  *   - [[ivfTopK]]: IVF-style approximate path for scale — corpus is
  *     bucketed by nearest centroid once (in a real deployment: written
  *     out partitioned by centroid), queries probe only the closest
  *     `nprobe` buckets. At 100 TB with C centroids and nprobe≈C/50 the
  *     scan shrinks 50×; recall is tunable via nprobe.
  */
object Similarity {

  /** Q15 — exact top-k cosine neighbors of `queryId`. The 1-row query side
    * is broadcast; the corpus scan stays partition-parallel and the final
    * orderBy+limit plans as TakeOrderedAndProject (per-partition top-k,
    * driver merges k×P rows — no global sort at any scale). */
  def bruteForceTopK(s: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 5): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"))
    e.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos", cosine(col("embedding"), col("qvec")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cos"), 4).as("cos_sim"))
  }

  /** IVF-flat approximate top-k.
    *
    * Centroids are chosen deterministically (the `numCentroids` lowest
    * vec_ids) — a stand-in for k-means that keeps the result reproducible
    * for the driver; the assignment/probe machinery is the part that
    * matters at scale. Every step is a broadcast join against the
    * centroid set (tiny) + one shuffle-free scan; no O(n²) pair
    * materialization anywhere.
    */
  def ivfTopK(s: SparkSession, dir: String, queryId: Long = 0L, k: Int = 5,
      numCentroids: Int = 16, nprobe: Int = 4): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val centroids = e.orderBy("vec_id").limit(numCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))

    // Assign every corpus vector to its nearest centroid: broadcast the
    // centroid table, rank per vec_id, keep rank 1. One scan, no shuffle
    // of the corpus (window is over vec_id which parquet already spreads).
    val assigned = e.crossJoin(broadcast(centroids))
      .withColumn("cdist", cosine(col("embedding"), col("cvec")))
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("cdist").desc, col("cid"))))
      .filter(col("r") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))

    // Probe list for the query: its nprobe nearest centroids.
    val qvec = e.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"))
    val probes = centroids.crossJoin(broadcast(qvec))
      .withColumn("qdist", cosine(col("cvec"), col("qvec")))
      .orderBy(col("qdist").desc, col("cid"))
      .limit(nprobe)
      .select(col("cid"))

    // Search only the probed buckets (broadcast semi join prunes ~all of
    // the corpus before the expensive cosine).
    assigned
      .join(broadcast(probes), Seq("cid"), "left_semi")
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(qvec))
      .withColumn("cos", cosine(col("embedding"), col("qvec")))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), round(col("cos"), 4).as("cos_sim"))
  }
}
