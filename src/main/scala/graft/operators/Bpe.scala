package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE (byte-pair-encoding) merge training — the tokenizer-training
  * primitive of every LLM data pipeline (Sennrich et al. 2016): repeat
  * { count adjacent symbol-pair frequencies over the corpus, merge the
  * most frequent pair into one symbol } for `steps` rounds.
  *
  * Distributed shape: BPE trains on the WORD-FREQUENCY table, not the
  * token stream — one corpus scan builds (word, freq), after which
  * every round runs over the vocabulary (much smaller than the corpus,
  * and the thing that fits a tokenizer trainer's memory at any corpus
  * size). Per round: adjacent pairs explode from each word's symbol
  * sequence (weighted by freq, map-side combinable), the argmax pair is
  * ONE collected row (count desc, pair asc — deterministic), and the
  * merge rewrites every word's symbol string with a plain
  * `replace(sym, ' a b ', ' ab ')`.
  *
  * The space-delimited symbol-string representation is the cross-engine
  * contract: symbols never contain spaces, every symbol is
  * space-flanked, so substring replace is exactly the BPE merge —
  * including the classic left-to-right non-overlapping behavior on runs
  * ("a a a" merges to "aa a", not "aa aa") — and DuckDB's `replace`
  * reproduces it byte for byte, making the whole trainer
  * oracle-checkable with three unrolled SQL rounds.
  */
object Bpe {

  /** One row per merge step: (step, pair "a b", merged "ab", weighted
    * occurrence count at selection time). */
  def bpeMerges(docs: DataFrame, steps: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    val words = docs
      .select(explode(filter(split(coalesce(col("text"), lit("")), " "),
        t => t =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      // ' a b c ' — every symbol space-flanked
      .withColumn("sym",
        concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 ")))
      .select("sym", "freq")
      .localCheckpoint() // vocabulary-sized; each round rewrites it
    var vocab = words
    val picks = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var exhausted = false
    for (step <- 1 to steps if !exhausted) {
      val syms = filter(split(col("sym"), " "), x => x =!= "")
      val bestRows = vocab
        .select(col("freq"), syms.as("a"))
        .filter(size(col("a")) >= 2)
        .select(col("freq"), explode(
          transform(sequence(lit(0), size(col("a")) - 2),
            i => concat(element_at(col("a"), i + 1), lit(" "),
              element_at(col("a"), i + 2)))).as("pair"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      if (bestRows.isEmpty) {
        // empty corpus, or every word already one symbol: nothing left
        // to merge — a shorter merge list, not an error
        exhausted = true
      } else {
      val pair = bestRows.head.getString(0)
      val cnt = bestRows.head.getLong(1)
      val merged = pair.replace(" ", "")
      picks += ((step, pair, merged, cnt))
      vocab = vocab
        .withColumn("sym", regexp_replace(col("sym"),
          java.util.regex.Pattern.quote(s" $pair "),
          java.util.regex.Matcher.quoteReplacement(s" $merged ")))
        .localCheckpoint()
      }
    }
    import spark.implicits._
    picks.toSeq.toDF("step", "pair", "merged", "n_occurrences")
      .select(col("step").cast("long").as("step"), col("pair"),
        col("merged"), col("n_occurrences"))
      .orderBy("step")
  }

  /** Registered query (`bpe_merges`). */
  def qBpeMerges(s: SparkSession, dir: String): DataFrame =
    bpeMerges(Tables.documents(s, dir))
}
