package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation operators: temperature mixture weights, token-budget selection,
  * hashed importance ratios, length-distribution drift.
  */
class CurationSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import graft.functions.Curation

  private val docs = Seq(
    // (id, grp, text) — grp "a" is token-heavy, "b" is the tail
    (1L, "a", "x y z w v u t s r q"),  // 10 tokens, all distinct
    (2L, "a", "x x x x x x x x"),      // 8 tokens, 1 distinct
    (3L, "a", "p q r s"),              // 4 tokens
    (4L, "b", "m n"),                  // 2 tokens
    (5L, "b", "m m n o")               // 4 tokens, 3 distinct
  ).toDF("doc_id", "src", "text")

  test("mixtureWeights: sqrt temperature up-weights the tail slice") {
    val w = Curation.mixtureWeights(docs, "src", "text")
      .orderBy("src").collect()
    val a = w(0); val b = w(1)
    assert(a.getAs[Long]("n_tokens") == 22L && b.getAs[Long]("n_tokens") == 6L)
    // raw shares: 22/28 and 6/28 of a million, floored
    assert(a.getAs[Long]("raw_ppm") == 22L * 1000000 / 28)
    assert(b.getAs[Long]("raw_ppm") == 6L * 1000000 / 28)
    // s_q = floor(sqrt(t)*1000): 4690, 2449
    val sa = math.floor(math.sqrt(22.0) * 1000).toLong
    val sb = math.floor(math.sqrt(6.0) * 1000).toLong
    assert(a.getAs[Long]("w_ppm") == sa * 1000000 / (sa + sb))
    // tempering strictly boosts the tail above its natural share
    assert(b.getAs[Long]("w_ppm") > b.getAs[Long]("raw_ppm"))
    assert(b.getAs[Long]("boost_ppm") > 1000000L)
    assert(a.getAs[Long]("boost_ppm") < 1000000L)
  }

  test("budgetSample admits by diversity until the budget, exactly") {
    // group a scores: doc1 = 1e6 (10/10), doc3 = 1e6 (4/4), doc2 = 125000
    // order: (1e6, id 1) then (1e6, id 3) then doc2; budget 14 admits
    // doc1 (cum 10) + doc3 (cum 14), excludes doc2 (cum 22)
    val kept = Curation.budgetSample(docs, "doc_id", "src", "text", 14L)
      .orderBy("id").collect()
    assert(kept.map(_.getAs[Long]("id")).toSeq == Seq(1L, 3L, 4L, 5L))
    assert(kept.find(_.getAs[Long]("id") == 3L).get
      .getAs[Long]("cum_tokens") == 14L)
    // doc2's diversity score is 1/8 in ppm
    val all = Curation.budgetSample(docs, "doc_id", "src", "text", 1000L)
      .orderBy("id").collect()
    assert(all.find(_.getAs[Long]("id") == 2L).get
      .getAs[Long]("score_q") == 125000L)
  }

  test("importanceRatio scores target-like docs above raw-only docs") {
    val scored = Curation.importanceRatio(docs, "doc_id", "text",
      col("src") === "b", buckets = 16).orderBy("id").collect()
    assert(scored.length == 5)
    // docs 4/5 are made of target-distribution tokens (m n o): their mean
    // bucket ratio must exceed doc 2's (x: raw-only, never in target)
    val byId = scored.map(r => r.getAs[Long]("id") -> r.getAs[Long]("imp_ppm")).toMap
    assert(byId(4L) > byId(2L) && byId(5L) > byId(2L))
    // n_tokens is the whitespace token count
    assert(scored.find(_.getAs[Long]("id") == 1L).get
      .getAs[Long]("n_tokens") == 10L)
  }

  test("epochShuffle: dense in-shard ranks, full coverage, epochs permute differently") {
    import graft.functions.Sampling
    val out = Sampling.epochShuffle(docs.select("doc_id"), "doc_id", 2, 2)
      .collect()
    assert(out.length == 10) // 5 docs x 2 epochs
    // dense ranks per (epoch, bucket)
    out.groupBy(r => (r.getInt(0), r.getInt(1))).values.foreach { g =>
      assert(g.map(_.getAs[Long]("pos")).sorted.toSeq == (1L to g.length).toSeq)
    }
    // each epoch covers every id exactly once
    (0 to 1).foreach { e =>
      assert(out.filter(_.getInt(0) == e).map(_.getAs[Long]("id")).sorted.toSeq
        == Seq(1L, 2L, 3L, 4L, 5L))
    }
    // the two epochs draw different permutations (independent md5 keys)
    def order(e: Int) = Sampling.epochShuffle(docs.select("doc_id"), "doc_id", 2, 1)
      .filter(col("epoch") === e).orderBy("pos")
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(order(0) != order(1))
  }

  test("curation plans broadcast scalar totals; no shuffled cartesian") {
    val p1 = Curation.mixtureWeights(docs, "src", "text")
      .queryExecution.executedPlan.toString
    assert(p1.contains("Broadcast"), p1)
    assert(!p1.contains("CartesianProduct"), p1)
    val p2 = Curation.importanceRatio(docs, "doc_id", "text",
      col("src") === "b", 16).queryExecution.executedPlan.toString
    assert(p2.contains("Broadcast"), p2)
    assert(!p2.contains("CartesianProduct"), p2)
  }

  test("lengthDrift: identical distributions give zero TV, disjoint give large") {
    // two groups with identical histograms -> each group's ppm vector
    // equals the corpus vector -> tv 0
    val same = Seq(
      (1L, "a", "t t t"), (2L, "a", Array.fill(40)("u").mkString(" ")),
      (3L, "b", "v v v"), (4L, "b", Array.fill(40)("w").mkString(" "))
    ).toDF("doc_id", "src", "text")
    val tv0 = Curation.lengthDrift(same, "src", "text", 32, 15)
      .collect().map(_.getAs[Long]("tv_ppm"))
    assert(tv0.forall(_ == 0L))
    // disjoint bins: group a all-short, group b all-long -> each group is
    // 1e6 in its own bin vs 500000 corpus-wide -> tv = 500000
    val split = Seq(
      (1L, "a", "t t"), (2L, "a", "u u"),
      (3L, "b", Array.fill(40)("v").mkString(" ")),
      (4L, "b", Array.fill(40)("w").mkString(" "))
    ).toDF("doc_id", "src", "text")
    val tv = Curation.lengthDrift(split, "src", "text", 32, 15)
      .orderBy("src").collect().map(_.getAs[Long]("tv_ppm"))
    assert(tv.toSeq == Seq(500000L, 500000L))
  }
}
