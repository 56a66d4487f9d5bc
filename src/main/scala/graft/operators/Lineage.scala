package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage-truncation seam for iterative operators.
  *
  * Iterative plans (pointer-jumping connected components, PageRank) grow
  * lineage every round, so each round must materialize and truncate.
  * `localCheckpoint()` stores blocks on executors — fast, but the blocks
  * die with an executor, so on a real cluster one executor loss
  * mid-iteration kills the whole job with an unrecoverable
  * "checkpoint block not found". When the caller has configured a
  * RELIABLE checkpoint directory (`sparkContext.setCheckpointDir`, an
  * HDFS/object-store path on a cluster), iterative operators write
  * their per-round state there instead: blocks survive executor loss
  * and recovery re-reads them rather than replaying the entire
  * iteration history.
  *
  * Without a configured dir the fast local path is kept — the right
  * default on local[...] where "executor loss" means the JVM is gone
  * anyway. Both paths are EAGER (materialize now); iterative callers
  * rely on that to bound the plan each round.
  */
object Lineage {
  /** Truncate `df`'s lineage: reliable `checkpoint()` when the session's
    * context has a checkpoint dir configured, `localCheckpoint()`
    * otherwise.
    *
    * Checkpoint-file hygiene on the reliable path: each pin writes a new
    * rdd-N directory and Spark only deletes superseded ones when
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (the
    * ContextCleaner reclaims them as the RDDs are GC'd); long-running
    * clusters should set that alongside the checkpoint dir. */
  def pin(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // Persist before checkpointing (Spark's own RDD.checkpoint
      // guidance): Dataset.checkpoint materializes with a count job and
      // the ReliableCheckpointRDD write job then REPLAYS the lineage a
      // second time unless the plan is cached — without this, every pin
      // on the cluster path recomputes the whole iteration segment
      // twice. Unpersist after: the returned frame reads from the
      // checkpoint files, not the cache.
      val cached = df.persist()
      try cached.checkpoint() finally cached.unpersist()
    } else df.localCheckpoint()
}
