package graft.facade

import org.apache.spark.sql.SparkSession

/** Drop-in CLI mirroring the reference binary's surface
  * (mapreduce.cc:131-136):
  *
  * {{{
  * mapreduce <job_name> <num_reducers> <delay> <input_filename>
  *           <chunk_size> <locality_config_filename> [output_dir]
  * }}}
  *
  * Semantics preserved from the reference:
  *   - input is a newline-delimited text file, logically chunked into
  *     `chunk_size`-line chunks; chunk c covers global lines
  *     (c−1)·cs+1 … c·cs (InputSplitFunction, thread_pool.cc:46-65) —
  *     modeled by driver-side line grouping (the reference re-scans the
  *     whole file per chunk; neither belongs on a 100 TB path, where
  *     `spark.read.text`'s byte-split scan replaces this faithful mode);
  *   - the locality config (`chunkID nodeID` lines, thread_pool.cc:3-19,
  *     with the out-of-range fold) becomes `preferredLocations` hints —
  *     the INTENDED behavior of the reference's scheduler (its call-site
  *     bug degrading locality to FIFO, mapreduce.cc:160, is not ported);
  *   - word count with in-map combining, first-char partitioning with the
  *     0→R remap, per-partition sort, summed group-reduce;
  *   - output files `<job_name>-<reducerID>.out`, lines `word count`,
  *     reducer IDs 1-based, existing files truncated.
  *
  * `delay` is accepted for CLI compatibility and ignored: it only ever
  * simulated remote-read latency (mapreduce.cc:161) — Spark has real data
  * movement.
  */
object ReferenceCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 6,
      "usage: mapreduce <job_name> <num_reducers> <delay> <input_filename> " +
        "<chunk_size> <locality_config_filename> [output_dir]")
    val Array(jobName, numReducersS, _delay, inputFile, chunkSizeS, locFile) =
      args.take(6)
    val outDir = if (args.length > 6) args(6) else "."
    val numReducers = numReducersS.toInt
    val chunkSize = chunkSizeS.toInt
    require(numReducers > 0 && chunkSize > 0,
      "num_reducers and chunk_size must be positive")

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .appName(s"mapreduce-$jobName")
      .getOrCreate()
    val sc = spark.sparkContext

    // Faithful mode reads the input on the DRIVER (the reference's
    // jobtracker does the same re-scan, thread_pool.cc:46-65) — guard it
    // so nobody accidentally points a 100 GB file at the compatibility
    // shim instead of the idiomatic `spark.read.text` path.
    val inputBytes = new java.io.File(inputFile).length()
    val MaxFaithfulBytes = 1L << 30
    require(inputBytes <= MaxFaithfulBytes,
      s"$inputFile is $inputBytes bytes; the faithful CLI mode chunks on " +
        "the driver and caps out at 1 GiB — use spark.read.text + " +
        "MapReduceJob.wordCount for large inputs")
    val src = scala.io.Source.fromFile(inputFile)
    val chunks = try src.getLines().grouped(chunkSize).map(_.toVector).toVector
      finally src.close()
    val locSrc = scala.io.Source.fromFile(locFile)
    val locality = try MapReduceJob.parseLocalityConfig(
      locSrc.getLines(), workers = math.max(1, sc.defaultParallelism))
      finally locSrc.close()

    val lines = MapReduceJob.inputWithLocality(
      sc, chunks, locality, n => s"node$n").flatMap(identity)
    val counts = MapReduceJob.wordCount(lines, numReducers)
    MapReduceJob.writeReferenceLayout(counts, outDir, jobName)
  }
}
