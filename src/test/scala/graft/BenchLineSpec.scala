package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stdout reporting channel — the round-9 defect class.
  *
  * Round 9 shipped a silent failure: `Bench.baselinedNames` read
  * BASELINE.md with the JVM default charset (US-ASCII in this
  * locale-less container), the UTF-8 em dashes made the decoder throw,
  * the catch swallowed it, and 10 baselined queries vanished from the
  * compact stdout line — the judge's per-query gate went blind while
  * `sbt test` stayed green. These specs make every layer of that
  * failure loud:
  *   1. the forked-JVM charset is UTF-8 (build.sbt pin),
  *   2. baselinedNames parses the real BASELINE.md to exactly the 34
  *      frozen names,
  *   3. renderCompact at the CURRENT registry size keeps every
  *      baselined name inside the 1,500-char budget (registry-growth
  *      guard: adding queries in a future round fails this spec before
  *      it can silently cut a baselined name again).
  */
class BenchLineSpec extends AnyFunSuite {

  // The 34 names frozen in BASELINE.md's "Operative baseline for BENCH"
  // table. BASELINE.md is frozen since round 1, so hardcoding is safe —
  // if this ever fails, either the file was corrupted or the parser
  // regressed; both need a human look.
  private val frozen34 = Set(
    "q1_wordcount", "q2_filter_project", "q3_join_agg",
    "q4_broadcast_chain", "q5_hash_agg", "q6_topk", "q7_distinct",
    "q7b_approx_distinct", "q8_window_rank", "q9_except",
    "q9b_union_count", "q10_semi", "q10b_anti", "q11_time_bucket",
    "q11b_sliding", "q12_dedup_exact", "q13_string_scalars",
    "q14_date_scalars", "q15_cosine_topk", "q16_rollup",
    "q17_mapreduce_facade", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "dedup_embedding", "dedup_clusters",
    "sim_ivf_topk", "text_token_counts", "text_quality", "text_langid",
    "text_fingerprint", "mm_media_features", "stream_tumbling",
    "stream_sessions")

  test("forked test JVM default charset is UTF-8 (build.sbt pin)") {
    assert(java.nio.charset.Charset.defaultCharset().name() === "UTF-8",
      "-Dfile.encoding=UTF-8 must be pinned in build.sbt javaOptions: " +
        "this container has no locale and defaults to US-ASCII, which " +
        "breaks any default-charset read of a UTF-8 file")
  }

  test("baselinedNames parses the real BASELINE.md to the 34 frozen names") {
    val names = Bench.baselinedNames("BASELINE.md")
    assert(names === frozen34,
      s"missing=${(frozen34 -- names).toSeq.sorted} " +
        s"extra=${(names -- frozen34).toSeq.sorted}")
  }

  test("baselinedNames survives a charset-hostile decode (explicit UTF-8 codec)") {
    // Re-read through an ASCII-rejecting path to prove the explicit
    // codec matters: the raw bytes of BASELINE.md are NOT pure ASCII,
    // so a default-charset read under US-ASCII would throw.
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BASELINE.md"))
    assert(bytes.exists(b => (b & 0xff) > 0x7f),
      "BASELINE.md should contain non-ASCII bytes (em dashes) — if it " +
        "became pure ASCII this regression test lost its teeth")
    assert(Bench.baselinedNames("BASELINE.md").size === 34)
  }

  // Deterministic synthetic timings: spread pseudo-randomly (hash-based,
  // no Math.random) over 0.10–3.00 s so the rendered widths resemble a
  // real run.
  private def syntheticTimings(names: Seq[String]): Seq[(String, Double)] =
    names.map { n =>
      val h = scala.util.hashing.MurmurHash3.stringHash(n) & 0x7fffffff
      n -> (0.10 + (h % 291) / 100.0)
    }

  // The ratios map the real main() passes: one entry per baselined query
  // (frozen-baseline ratio, verdict r12 ask #3) — part of the never-cut
  // section, so the growth guard must render WITH it or it under-counts
  // the fixed overhead by ~750 chars.
  private def syntheticRatios(names: Set[String]): Seq[(String, Double)] =
    names.toSeq.sorted.map { n =>
      val h = scala.util.hashing.MurmurHash3.stringHash(n) & 0x7fffffff
      n -> (0.05 + (h % 140) / 100.0)
    }

  test("registry growth guard: compact line fits budget with ALL baselined names + ratios at current registry size") {
    val allNames = SparkEntry.queries.keys.toSeq.sorted
    assert(allNames.nonEmpty)
    val line = Bench.renderCompact(
      syntheticTimings(allNames), Seq.empty, frozen34, "sf0.1",
      ratios = syntheticRatios(frozen34))
    assert(line.length <= Bench.LineBudget,
      s"compact line is ${line.length} chars > ${Bench.LineBudget}: the " +
        "registry grew past what the stdout budget can carry — shrink " +
        "the rendering before adding more queries")
    frozen34.foreach { n =>
      assert(line.contains(s""""$n":"""),
        s"baselined query $n was cut from the compact line")
    }
    // The ratios map itself survived (appears once as a key, holding all
    // 34 entries — each name then occurs twice on the line).
    assert(line.contains(""","ratios":{"""), "ratios map cut from compact line")
    frozen34.foreach { n =>
      assert(line.sliding(n.length + 3).count(_ == s""""$n":""") >= 2,
        s"ratio entry for $n missing from compact line")
    }
  }

  test("registry growth guard: baselined names survive even with failures present") {
    val allNames = SparkEntry.queries.keys.toSeq.sorted
    val failed = Seq(
      "dedup_clusters" -> ("x" * 200),
      "q5_hash_agg" -> "java.lang.OutOfMemoryError: GC overhead limit exceeded")
    val timings = syntheticTimings(allNames.filterNot(failed.map(_._1).toSet))
    val line = Bench.renderCompact(timings, failed, frozen34, "sf0.1",
      ratios = syntheticRatios(frozen34 -- failed.map(_._1)))
    assert(line.length <= Bench.LineBudget)
    // Failed baselined queries appear in the failed map, not queries map.
    (frozen34 -- failed.map(_._1)).foreach { n =>
      assert(line.contains(s""""$n":"""), s"$n cut from compact line")
    }
    failed.foreach { case (n, _) =>
      assert(line.contains(s""""$n":""""), s"failed $n missing from line")
    }
  }

  test("baselineSeconds parses the frozen per-query numbers (spot checks)") {
    val secs = Bench.baselineSeconds("BASELINE.md")
    assert(secs.keySet === frozen34)
    // Spot-pin three values across both table columns so a regex drift
    // that keeps names but garbles numbers (or swaps columns) is loud.
    assert(secs("q1_wordcount") === 0.351)
    assert(secs("dedup_minhash_lsh") === 47.515)
    assert(secs("q16_rollup") === 4.750)
    assert(secs.values.forall(_ > 0), "frozen baseline seconds must be positive")
  }
}
