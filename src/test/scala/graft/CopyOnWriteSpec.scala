package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.CopyOnWrite

class CopyOnWriteSpec extends AnyFunSuite with SparkFixture {

  private def listDataFiles(dir: String): Map[String, Long] = {
    val d = new java.io.File(dir)
    d.listFiles().filter(f => f.getName.startsWith("part-")
        && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap
  }

  test("upsert rewrites ONLY key-containing files; untouched files stay byte-identical") {
    val tbl = java.nio.file.Files.createTempDirectory("graft_cow_spec")
      .resolve("tbl").toString
    val docs = Tables.documents(spark, sf0001)
    // Range-clustered write: update keys land in a known id range, so
    // most files must survive the upsert untouched.
    docs.repartitionByRange(8, col("doc_id")).write.parquet(tbl)
    val before = listDataFiles(tbl)
    assert(before.size >= 8)

    // Touch only doc_ids 0..9: at 8 range partitions over 0..N they sit
    // in the first file(s).
    val updates = docs.filter(col("doc_id") < 10)
      .select(col("doc_id"), concat(lit("V2 "), col("text")).as("text"),
        col("lang"), col("source"), (col("n_chars") + 3).as("n_chars"))
    val rewritten = CopyOnWrite.upsert(spark, tbl, updates, "doc_id")
    assert(rewritten >= 1 && rewritten < before.size,
      s"expected a strict subset of ${before.size} files rewritten, got $rewritten")

    val after = listDataFiles(tbl)
    val untouched = before.keySet.intersect(after.keySet)
    assert(untouched.size === before.size - rewritten,
      "every non-touched original file must still be present")
    untouched.foreach(f => assert(after(f) === before(f),
      s"untouched file $f changed size"))

    // Merge semantics: COW result == anti-join + union over the logical
    // table.
    val expected = docs.join(updates.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(updates)
      .select(col("doc_id"), md5(col("text")).as("h"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = spark.read.parquet(tbl)
      .select(col("doc_id"), md5(col("text")).as("h"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("a key column named 'count' upserts cleanly (unique-key check must not self-collide)") {
    // same r19 ADVICE class as VersionedTable.upsert: the bare
    // groupBy(key).count() filter was ambiguous for a key named "count"
    import spark.implicits._
    val tbl = java.nio.file.Files.createTempDirectory("graft_cow_spec")
      .resolve("tbl").toString
    Seq((1L, "a"), (2L, "b")).toDF("count", "v").write.parquet(tbl)
    CopyOnWrite.upsert(spark, tbl,
      Seq((2L, "b2"), (3L, "c")).toDF("count", "v"), "count")
    assert(spark.read.parquet(tbl).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ===
      Set((1L, "a"), (2L, "b2"), (3L, "c")))
    val e = intercept[IllegalArgumentException](CopyOnWrite.upsert(
      spark, tbl, Seq((4L, "x"), (4L, "y")).toDF("count", "v"), "count"))
    assert(e.getMessage.contains("unique-key"))
  }

  test("insert-only batch appends without rewriting any file") {
    val tbl = java.nio.file.Files.createTempDirectory("graft_cow_ins")
      .resolve("tbl").toString
    val docs = Tables.documents(spark, sf0001)
    docs.repartitionByRange(4, col("doc_id")).write.parquet(tbl)
    val before = listDataFiles(tbl)

    val inserts = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 5000000).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    val rewritten = CopyOnWrite.upsert(spark, tbl, inserts, "doc_id")
    assert(rewritten === 0)

    val after = listDataFiles(tbl)
    before.foreach { case (f, len) =>
      assert(after.get(f).contains(len), s"original file $f was disturbed")
    }
    assert(spark.read.parquet(tbl).count() === docs.count() + 5)
  }
}
