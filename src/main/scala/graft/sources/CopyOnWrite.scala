package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level copy-on-write upsert over a plain parquet directory — the
  * ingestion pattern behind Delta/Iceberg/Hudi MERGE at 100 TB: an
  * update batch must rewrite only the files that CONTAIN matching keys,
  * never the table. Rewriting 100 TB to change 0.1% of rows is the
  * anti-pattern this operator exists to avoid.
  *
  * Shape:
  *   1. Locate touched files: semi-join the table's (file, key)
  *      projection against the update keys. Only the key column is
  *      scanned (column pruning), and the result crossing to the driver
  *      is a file-path LIST — bounded by the file count, which is
  *      exactly what a table format's manifest holds.
  *   2. Rewrite: read ONLY the touched files, anti-join out the updated
  *      keys, union the update batch (updates to untouched keys cannot
  *      exist — a key living in an untouched file contradicts step 1;
  *      brand-new keys ride along as inserts), write to a staging
  *      subdirectory.
  *   3. Commit: move staged files in with fresh unique names, then
  *      delete the touched originals. Add-then-delete ordering keeps
  *      every row present under concurrent readers (a row may briefly
  *      appear twice mid-commit; a real format closes that window with
  *      a manifest/log swap — documented trade-off of running COW over
  *      a bare directory).
  *
  * All rewrite work is proportional to the touched-file bytes, not the
  * table. An insert-only batch touches nothing and just appends.
  */
object CopyOnWrite {

  /** Upsert `updates` (same schema as the table) into the parquet
    * directory at `tablePath`, matching on `keyCol`. Returns the number
    * of files rewritten. */
  def upsert(spark: SparkSession, tablePath: String, updates: DataFrame,
      keyCol: String): Int = {
    val table = spark.read.parquet(tablePath)
    // Key-unique, non-null batch contract, enforced (see
    // VersionedTable.upsert — same rationale: a duplicate key survives
    // the anti-join and commits duplicated keys silently; a null key
    // matches nothing and accumulates as a ghost insert).
    // collision-proof alias — a key column named "count" would make the
    // bare groupBy().count() filter ambiguous (see VersionedTable.upsert);
    // derived from keyCol so no fixed name can re-introduce the class
    val cntAlias = Iterator.iterate("_graft_cnt")(_ + "_")
      .dropWhile(_ == keyCol).next()
    val badKey = updates.groupBy(col(keyCol))
      .agg(count(lit(1)).as(cntAlias))
      .filter(col(cntAlias) > 1 || col(keyCol).isNull)
      .limit(1).collect()
    require(badKey.isEmpty,
      s"upsert batch violates the unique-key contract on '$keyCol': " +
        s"${if (badKey.head.isNullAt(0)) "null key present"
          else s"key ${badKey.head.get(0)} appears ${badKey.head.getLong(1)}×"}" +
        " — dedup the batch first")
    val keys = updates.select(keyCol).distinct()
    val touched = table
      .select(input_file_name().as("_f"), col(keyCol))
      .join(keys, keyCol)
      .select("_f").distinct()
      .collect().map(_.getString(0))

    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(tablePath)
    val fs = dir.getFileSystem(conf)

    if (touched.isEmpty) {
      // Pure insert: nothing to rewrite, append the batch.
      updates.write.mode("append").parquet(tablePath)
      return 0
    }

    val staging = new Path(dir, s"_cow_staging_${java.util.UUID.randomUUID}")
    spark.read.parquet(touched.toIndexedSeq: _*)
      .join(updates.select(keyCol), Seq(keyCol), "left_anti")
      .select(table.columns.map(col).toIndexedSeq: _*)
      .unionByName(updates.select(table.columns.map(col).toIndexedSeq: _*))
      .write.parquet(staging.toString)

    // Commit: move staged data files in under fresh names, drop the
    // originals, clean the staging dir.
    val staged = fs.listStatus(staging).map(_.getPath)
      .filter(p => p.getName.startsWith("part-"))
    staged.zipWithIndex.foreach { case (p, i) =>
      // full UUID — an 8-hex truncation birthday-collides at ~9×10⁴
      // commits and a local-FS rename over an existing target silently
      // replaces a live data file (see VersionedTable.adoptStaged)
      val dst = new Path(dir,
        s"part-cow-${java.util.UUID.randomUUID}-$i.parquet")
      require(fs.rename(p, dst), s"COW commit: rename $p -> $dst failed")
    }
    // A silently-failed delete would leave BOTH copies of the rewritten
    // rows in the table — permanent duplicate keys with no error. Guard
    // it like the renames above: fail loudly, mid-commit, rather than
    // corrupt the table. (delete() returning false with the file still
    // present is the failure; false on an already-gone file is fine.)
    touched.foreach { f =>
      val p = new Path(new java.net.URI(f))
      require(fs.delete(p, false) || !fs.exists(p),
        s"COW commit: delete of rewritten original $p failed — table now " +
          "holds duplicate keys; re-run the upsert after removing the file")
    }
    fs.delete(staging, true)
    touched.length
  }
}
