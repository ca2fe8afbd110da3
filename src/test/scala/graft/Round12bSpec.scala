package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dedup

/** Round-12 continuation: the snapshot-delta ingest gate
  * (`dedupAgainstCorpus`) joins the gated surface — batch docs are checked
  * against the standing corpus's at-rest signature table, never its text.
  */
class Round12bSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def corpusDf = Seq(
    (1L, "the cat sat on the mat and watched the quiet street below"),
    (2L, "spark shuffles partition data across executors before wide aggregations run " +
      "and the scheduler assigns tasks to cores while the block manager serves remote reads"),
    (3L, "completely unrelated text about mountains rivers and weather patterns today")
  ).toDF("doc_id", "text")

  test("dedupAgainstCorpus finds an exact-dup batch doc via the corpus signature table") {
    val batch = Seq(
      (100L, "the cat sat on the mat and watched the quiet street below"), // dup of 1
      (101L, "a brand new document sharing no shingles with anything else at all")
    ).toDF("doc_id", "text")
    val corpusSig = Dedup.minhashSignatures(corpusDf, "doc_id", "text", 16, 3)
    val out = Dedup.dedupAgainstCorpus(batch, "doc_id", "text", corpusSig,
      numHashes = 16, bands = 4, shingleLen = 3, minAgree = 0.5)
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("new_id") == 100L)
    assert(r.getAs[Long]("corpus_id") == 1L)
    assert(r.getAs[Double]("est_jaccard") == 1.0) // identical text -> identical signature
  }

  test("dedupAgainstCorpus never emits corpus-corpus or batch-batch pairs") {
    // two identical batch docs: near-dup of each other but of nothing in
    // the corpus — the gate must stay silent (batch-internal dedup is
    // exactDedup/minhashLshPairs duty, not the ingest gate's)
    val batch = Seq(
      (100L, "twin text present twice in the same ingest batch tonight"),
      (101L, "twin text present twice in the same ingest batch tonight")
    ).toDF("doc_id", "text")
    val corpusSig = Dedup.minhashSignatures(corpusDf, "doc_id", "text", 16, 3)
    val out = Dedup.dedupAgainstCorpus(batch, "doc_id", "text", corpusSig)
    assert(out.count() == 0)
  }

  test("dedupAgainstCorpus est_jaccard reflects partial signature agreement") {
    // one mid-sentence word swapped vs corpus doc 2 -> 13 of the 16
    // signature rows agree under the fixed md5 hash family (probed
    // deterministically), with one full band still colliding so the pair
    // survives candidate generation; est_jaccard must be exactly 13/16
    val batch = Seq(
      (100L, "spark shuffles partition data across executors before narrow aggregations run " +
        "and the scheduler assigns tasks to cores while the block manager serves remote reads")
    ).toDF("doc_id", "text")
    val corpusSig = Dedup.minhashSignatures(corpusDf, "doc_id", "text", 16, 3)
    val out = Dedup.dedupAgainstCorpus(batch, "doc_id", "text", corpusSig,
      minAgree = 0.25)
    val rows = out.filter(col("corpus_id") === 2L).collect()
    assert(rows.length == 1)
    val ej = rows.head.getAs[Double]("est_jaccard")
    assert(ej == 13.0 / 16.0)
  }
}
