package graft.operators

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Write-once/probe-many cache for derived artifacts (the IVF index, the
  * quantized-codes table): a keyed directory under java.io.tmpdir, built
  * atomically on first use and reused by every later probe — the
  * build-amortization shape a 100 TB serving path needs (the index/codes
  * build is one corpus scan per INGEST, not one per query).
  *
  * Key discipline (shared by every artifact kind):
  *   - `stem` names the (corpus, config) family; superseded siblings of
  *     the same stem (older algorithm version or data fingerprint) are
  *     pruned on rebuild so regenerated testdata can't accumulate stale
  *     trees in tmpdir forever.
  *   - `key` embeds an ALGORITHM VERSION and a DATA FINGERPRINT
  *     ([[fingerprint]]: total bytes + max mtime), so changed semantics
  *     or regenerated data get a fresh build instead of silently serving
  *     a stale artifact (several consumers are no-oracle queries where a
  *     stale probe would go undetected).
  *   - Builds land in a unique temp sibling then ATOMIC_MOVE into place:
  *     two concurrent first-builds race safely (the loser discards its
  *     tree iff the winner's `donePath` actually landed).
  */
private[graft] object MaterializedCache {

  /** (total bytes, max mtime millis) over a parquet file or directory —
    * the cheap content fingerprint for cache keys. */
  def fingerprint(path: Path): (Long, Long) = {
    val walk = Files.walk(path)
    try walk.iterator().asScala.filter(Files.isRegularFile(_))
      .foldLeft((0L, 0L)) { case ((b, m), p) =>
        (b + Files.size(p), math.max(m, Files.getLastModifiedTime(p).toMillis))
      }
    finally walk.close()
  }

  /** (algorithm version, data mtime) parsed from a cache-key directory
    * name of the canonical `{stem}_v{V}[_{anything}]_{bytes}_{mtime}`
    * shape — the fields the prune predicate orders siblings by. None for
    * names that predate the versioned-key discipline. */
  private[graft] def keyMeta(stem: String, name: String): Option[(Int, Long)] =
    if (!name.startsWith(stem + "_")) None
    else {
      val KeyRe = "^v(\\d+)(?:_.+)?_(\\d+)_(\\d+)$".r
      name.drop(stem.length + 1) match {
        case KeyRe(v, _, mtime) => Some((v.toInt, mtime.toLong))
        case _ => None
      }
    }

  /** Known cache roots — kept in sync with the [[getOrBuild]] call sites
    * (IVF index, int8 codes, LSH band/sketch tables, semantic
    * centroids). */
  private[graft] val Roots = Seq("graft_ivf_index", "graft_int8_codes",
    "graft_lsh_bands", "graft_sem_centroids", "graft_planted_media",
    "graft_sem_prune")

  /** Drop every cache entry (across all [[Roots]]) whose key embeds
    * `token`. Scale harnesses call this on exit with their unique work
    * dir name, so artifacts built for throwaway replicated corpora do
    * not accumulate in tmpdir forever (measured 631 MB of stale
    * graft_ivf_index entries across past capture runs — each run's
    * random scaled-dir path is a fresh stem the sibling prune can never
    * match). Requires a token of ≥ 8 chars (r16 ADVICE): callers pass
    * unique random temp-dir names today, but a short or generic token
    * from a future caller would silently reclaim live artifacts for
    * other corpora — fail loudly instead. */
  private[graft] def dropEntriesContaining(token: String): Unit = {
    require(token.length >= 8,
      s"dropEntriesContaining token '$token' too short (< 8 chars) — " +
        "a generic token would reclaim live cache entries for other corpora")
    Roots.foreach { rootName =>
      val root = Paths.get(sys.props("java.io.tmpdir"), rootName)
      if (Files.isDirectory(root)) {
        val ls = Files.list(root)
        try ls.iterator().asScala
          .filter(_.getFileName.toString.contains(token))
          .foreach(p => try deleteTree(p)
            catch { case _: java.io.IOException => () })
        finally ls.close()
      }
    }
  }

  private def deleteTree(p: Path): Unit = {
    val walk = Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.deleteIfExists(f))
    finally walk.close()
  }

  /** Return the cached directory for `key`, building it first if absent.
    * `doneMarker` is a file that exists only in a complete build (e.g.
    * the `_centroids.csv` sidecar, or parquet's `_SUCCESS`). */
  def getOrBuild(rootName: String, stem: String, key: String,
      doneMarker: String)(build: Path => Unit): Path = {
    val root = Paths.get(sys.props("java.io.tmpdir"), rootName)
    val idx = root.resolve(key)
    if (!Files.exists(idx.resolve(doneMarker))) {
      Files.createDirectories(root)
      val ls = Files.list(root)
      // Prune (a) superseded siblings of this stem and (b) `.build_`
      // residue older than an hour — a crashed builder's temp tree is
      // never moved into place and would otherwise leak in tmpdir
      // forever; an hour is far beyond any real build, so a LIVE
      // concurrent build's tree is never touched.
      //
      // "Superseded" is ORDERED, not just "different key" (r14 ADVICE):
      // a sibling is pruned only when its embedded algorithm version is
      // OLDER than ours, or same-version with an OLDER data mtime. Two
      // live corpora whose dirs sanitize to the same stem (the collision
      // the fingerprint key disambiguates) therefore never evict each
      // other's trees in a loop — at worst the newer-mtime corpus evicts
      // the older's tree ONCE on its first build, the older rebuilds,
      // and both trees coexist from then on. Unparseable sibling names
      // (pre-versioning residue) still prune.
      val staleBuildCutoff = System.currentTimeMillis() - 3600000L
      val myMeta = keyMeta(stem, key)
      try ls.iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          def superseded = (keyMeta(stem, n), myMeta) match {
            case (Some((sv, sm)), Some((mv, mm))) =>
              sv < mv || (sv == mv && sm < mm)
            case (None, _) => true // legacy / unversioned residue
            case _ => false
          }
          val supersededSibling =
            n.startsWith(stem + "_") && n != key && !n.startsWith(".build_") &&
              superseded
          def crashedBuild =
            n.startsWith(".build_") &&
              (try Files.getLastModifiedTime(p).toMillis < staleBuildCutoff
               catch { case _: java.io.IOException => false })
          supersededSibling || crashedBuild
        }
        .foreach(p => try deleteTree(p) catch { case _: java.io.IOException => () })
      finally ls.close()
      val tmp = Files.createTempDirectory(root, ".build_")
      try {
        build(tmp)
        Files.move(tmp, idx, StandardCopyOption.ATOMIC_MOVE)
      } catch {
        // A failed rename onto the winner's tree surfaces as ENOTEMPTY /
        // EEXIST / EACCES depending on platform — all FileSystemException.
        // Losing the race is fine only if the winner's build actually
        // landed; otherwise the failure must surface.
        case _: java.nio.file.FileSystemException
            if Files.exists(idx.resolve(doneMarker)) =>
          try deleteTree(tmp) catch { case _: java.io.IOException => () }
        case e: Throwable =>
          try deleteTree(tmp) catch { case _: java.io.IOException => () }
          throw e
      }
    }
    idx
  }
}
