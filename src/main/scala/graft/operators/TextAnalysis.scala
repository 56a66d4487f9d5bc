package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` (SURVEY.md §2B): token
  * counting, quality scoring, language identification, document
  * fingerprinting.
  *
  * Everything is built from codegen'd Catalyst built-ins (split / filter /
  * aggregate / transform) — per-row, shuffle-free, embarrassingly parallel:
  * these are exactly the operators you fan over 100 TB of raw text, so the
  * plan must be a single WholeStageCodegen scan per query, and it is.
  */
object TextAnalysis {

  private def tokens(c: Column): Column =
    filter(split(c, " "), w => length(w) > 0)

  /** Whitespace token count per doc, plus a BPE-ish subword count: words
    * are further split into runs of letters / digits / punctuation (the
    * usual pre-tokenizer regex shape), approximating what a subword
    * tokenizer sees. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      regexp_count(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"))
        .cast("long").as("n_subword_tokens"))
      .orderBy("doc_id")

  /** Quality signals per doc: length, token stats, punctuation and
    * stopword ratios — the standard cheap filters in front of an LLM
    * training pipeline. */
  def qualityScores(docs: DataFrame,
      stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
    val nPunct = regexp_count(col("text"), lit("[!-/:-@\\[-`{-~]"))
    // Zero-token / zero-char docs (null, empty, whitespace-only text —
    // every crawl has them) have no defined ratios: emit NULL via
    // nullif, never DIVIDE_BY_ZERO (under ANSI mode a single such row
    // would kill the whole scoring job).
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      round((length(col("text")) - nTok + 1).cast("double")
        / nullif(nTok, lit(0)), 4).as("avg_token_len"),
      round(nPunct.cast("double") / nullif(length(col("text")), lit(0)), 4)
        .as("punct_ratio"),
      round(nStop.cast("double") / nullif(nTok, lit(0)), 4)
        .as("stopword_ratio"))
      .orderBy("doc_id")
  }

  /** Marker-word language ID: scores each candidate language by its
    * stopword hit-rate and picks the best (ties → 'und'). The marker
    * lists are tiny and inlined into the plan, so this is one codegen'd
    * scan — the same shape as a real lexicon-based langid at scale.
    * The synthetic corpus is English-ish word soup, so 'en' dominates —
    * the operator's value is the machinery + oracle, not the corpus. */
  def languageId(docs: DataFrame): DataFrame = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "a", "of", "and"),
      "de" -> Seq("der", "die", "das", "und"),
      "es" -> Seq("el", "la", "de", "y"))
    val toks = tokens(col("text"))
    // nullif: a zero-token doc scores NULL for every language — the
    // fold below then keeps ('und', 0.0) (null comparisons are false,
    // greatest skips nulls) instead of dying on DIVIDE_BY_ZERO.
    val scores = markers.map { case (lang, ws) =>
      lang -> (size(filter(toks, t => t.isin(ws.map(lit): _*)))
        .cast("double") / nullif(size(toks), lit(0)))
    }
    val best = scores.foldLeft((lit("und"), lit(0.0))) {
      case ((bl, bs), (lang, sc)) =>
        (when(sc > bs, lit(lang)).otherwise(bl), greatest(sc, bs))
    }
    docs.select(col("doc_id"), best._1.as("lang_guess"),
      round(best._2, 4).as("lang_score"))
      .orderBy("doc_id")
  }

  /** Polynomial rolling-hash fingerprint over the character stream:
    * h = fold(chars, 0, (acc, c) → (31·acc + codepoint(c)) mod 1e9+7).
    * Deterministic, order-sensitive, and cheap — the per-doc identity for
    * exact-dup shortcuts and incremental recrawl diffing. Expressed with
    * aggregate/transform so DuckDB can replay it exactly (list_reduce). */
  def fingerprints(docs: DataFrame): DataFrame = {
    val chars = filter(split(col("text"), ""), c => length(c) > 0)
    val fp = aggregate(
      transform(chars, c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000007L)
    docs.select(col("doc_id"), fp.as("fingerprint")).orderBy("doc_id")
  }

  /** One row of [[repetitionScores]] — named struct so the UDF's output
    * columns carry real names. */
  case class Repetition(n_bigrams: Long, dup_bigram_frac: Double)

  /** Gopher/MassiveText-style repetition signal: the fraction of a doc's
    * word bigrams that are duplicates of an earlier bigram — high values
    * flag boilerplate/spam for removal ahead of training. One primitive
    * pass per row (tokenize + hash-set membership fused into a single
    * UDF — the same measured trade as [[Dedup.shingleDocs]]; a
    * declarative `len(gs) - len(array_distinct(gs))` materializes the
    * full bigram array per row through interpreted lambdas). The single
    * (int − int)/int division is exact-cross-engine per the oracle
    * determinism rules. */
  def repetitionScores(docs: DataFrame): DataFrame = {
    val rep = udf { (text: String) =>
      val words =
        if (text == null) Array.empty[String]
        else text.split(" ").filter(_.nonEmpty)
      val n = math.max(words.length - 1, 0)
      if (n == 0) Repetition(0L, 0.0)
      else {
        val seen = new java.util.HashSet[String](n * 2)
        var dups = 0
        var i = 0
        while (i < n) {
          if (!seen.add(words(i) + " " + words(i + 1))) dups += 1
          i += 1
        }
        Repetition(n.toLong, dups.toDouble / n)
      }
    }
    docs.select(col("doc_id"), rep(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_bigrams"),
        round(col("r.dup_bigram_frac"), 4).as("dup_bigram_frac"))
      .orderBy("doc_id")
  }

  /** One row of the [[filterVerdicts]] token-stats UDF. */
  case class TokStats(n_tokens: Long, n_stop: Long)

  /** Gopher/C4-style quality-filter VERDICT: the keep/drop decision (plus
    * the first failing rule) a pretraining pipeline applies in front of
    * the corpus. Rules, in order: token-count bounds, mean word length
    * bounds, must contain a stopword. `keep` is 1/0 BIGINT (not boolean)
    * so the cross-engine hash compare stays type-stable. All comparisons
    * are on exact integers or a single identical-shape IEEE division, so
    * verdicts are bit-reproducible. Per-row, shuffle-free; token and
    * stopword counts come from ONE primitive pass over the string
    * (tokenize fused into the UDF — the repo's measured ~30× rule over
    * interpreted HOF lambdas; this is the operator you fan over raw
    * 100 TB, exactly where that factor bites). */
  def verdictCore(docs: DataFrame, minTokens: Long = 25L,
      maxTokens: Long = 100000L, minAvgLen: Double = 3.0,
      maxAvgLen: Double = 10.0,
      stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    val stopSet = stopwords.toSet
    val stats = udf { (text: String) =>
      if (text == null) TokStats(0L, 0L)
      else {
        var n = 0L
        var nStop = 0L
        var i = 0
        val len = text.length
        while (i < len) {
          if (text.charAt(i) == ' ') i += 1
          else {
            var j = text.indexOf(' ', i)
            if (j < 0) j = len
            n += 1
            if (stopSet.contains(text.substring(i, j))) nStop += 1
            i = j
          }
        }
        TokStats(n, nStop)
      }
    }
    val nTok = col("st.n_tokens")
    val nStop = col("st.n_stop")
    val avgLen = (length(col("text")) - nTok + 1).cast("double") / nTok
    val reason = when(nTok < minTokens, "too_short")
      .when(nTok > maxTokens, "too_long")
      .when(avgLen < minAvgLen, "short_words")
      .when(avgLen > maxAvgLen, "long_words")
      .when(nStop === 0, "no_stopwords")
      .otherwise("ok")
    docs.withColumn("st", stats(col("text")))
      .select(col("doc_id"), reason.as("reason"),
        when(reason === "ok", 1L).otherwise(0L).as("keep"))
  }

  /** [[verdictCore]] plus the presentation sort — the registered-query
    * form. Composing consumers (pipeline_funnel) use the unsorted core:
    * a global sort feeding a join/aggregate is wasted work the optimizer
    * does not reliably remove. */
  def filterVerdicts(docs: DataFrame, minTokens: Long = 25L,
      maxTokens: Long = 100000L, minAvgLen: Double = 3.0,
      maxAvgLen: Double = 10.0,
      stopwords: Seq[String] = Seq("the", "a")): DataFrame =
    verdictCore(docs, minTokens, maxTokens, minAvgLen, maxAvgLen, stopwords)
      .orderBy("doc_id")

  /** Exact-dedup mapping on the Unicode-NORMALIZED text key: NFC
    * composition (graft's native [[graft.functions.NfcNormalize]]
    * expression — ASCII rows take the zero-copy fast path), lowercase,
    * whitespace collapse. Sources that encode "é" differently (U+00E9 vs
    * e+U+0301) collapse to one bucket, which plain `q12_dedup_exact`
    * cannot see. Output is the per-doc canonical mapping: each doc, the
    * smallest doc_id of its normalized group, and the group size — the
    * shape a downstream `filter(doc_id = canonical_id)` keeps-one pass
    * consumes. One hash shuffle on the normalized key; no driver state.
    */
  /** The normalized-text dedup key as a column: md5 of the NFC-composed,
    * lowercased, whitespace-collapsed text (see [[normalizeDedup]]).
    * Exposed so composing consumers (pipeline_funnel) can fuse the key
    * into their own single corpus scan instead of re-running
    * normalizeDedup's pass. Group on md5(key), not the key itself: the
    * exchange then carries (doc_id, 16-byte digest) instead of whole
    * documents — at 100 TB the shuffle IS the cost, and a 128-bit digest
    * collides never in practice (2^-128 per pair). */
  def normalizedKeyCol(text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val nfc = GraftColumnBridge.column(graft.functions.NfcNormalize(
      GraftColumnBridge.expression(lower(text))))
    md5(trim(regexp_replace(nfc, "\\s+", " ")))
  }

  def normalizeDedup(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The DuckDB oracle groups on the raw normalized key; grouping on
    // its md5 here is equivalent modulo md5 collisions (see
    // [[normalizedKeyCol]]).
    val w = Window.partitionBy(col("kh"))
    docs
      .select(col("doc_id"), normalizedKeyCol(col("text")).as("kh"))
      .select(col("doc_id"),
        min("doc_id").over(w).as("canonical_id"),
        count(lit(1)).over(w).as("group_size"))
      .orderBy("doc_id")
  }

  // --- SparkEntry-facing wrappers ---------------------------------------

  def qNormalizeDedup(s: SparkSession, dir: String): DataFrame =
    normalizeDedup(Tables.documents(s, dir))


  def qTokenCounts(s: SparkSession, dir: String): DataFrame =
    tokenCounts(Tables.documents(s, dir))

  def qQuality(s: SparkSession, dir: String): DataFrame =
    qualityScores(Tables.documents(s, dir))

  def qLangId(s: SparkSession, dir: String): DataFrame =
    languageId(Tables.documents(s, dir))

  def qFingerprint(s: SparkSession, dir: String): DataFrame =
    fingerprints(Tables.documents(s, dir))

  def qRepetition(s: SparkSession, dir: String): DataFrame =
    repetitionScores(Tables.documents(s, dir))

  def qFilterVerdicts(s: SparkSession, dir: String): DataFrame =
    filterVerdicts(Tables.documents(s, dir))
}
