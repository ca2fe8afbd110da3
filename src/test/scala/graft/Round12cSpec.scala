package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, TextAnalysis}

/** Round-12 continuation: per-source boilerplate stripping, ranked-retrieval
  * metrics, and the conditional-bigram fluency filter.
  */
class Round12cSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("boilerplateSegments drops same-source repeats, keeps cross-source ones") {
    // segLen=4; every text is exactly 8 tokens = 2 segments.
    // "nav bar home login" repeats in BOTH docs of srcA -> boilerplate there.
    // It also appears once in srcB -> NOT boilerplate in srcB (distinct-doc
    // count within source is 1).
    val d = Seq(
      (1L, "srcA", "nav bar home login alpha beta gamma delta"),
      (2L, "srcA", "nav bar home login epsilon zeta eta theta"),
      (3L, "srcB", "nav bar home login iota kappa lambda mu")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.boilerplateSegments(d, "doc_id", "source", "text", 4, 2)
      .orderBy("id").collect()
    assert(out.length == 3)
    val byId = out.map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).getAs[Long]("n_segments") == 2)
    assert(byId(1L).getAs[Long]("n_boiler") == 1)
    assert(byId(1L).getAs[String]("clean_text") == "alpha beta gamma delta")
    assert(byId(2L).getAs[Long]("n_boiler") == 1)
    assert(byId(2L).getAs[String]("clean_text") == "epsilon zeta eta theta")
    // srcB copy survives untouched: cross-source repetition is not template
    assert(byId(3L).getAs[Long]("n_boiler") == 0)
    assert(byId(3L).getAs[String]("clean_text") ==
      "nav bar home login iota kappa lambda mu")
  }

  test("boilerplateSegments clean_text is NULL when every segment is template") {
    val d = Seq(
      (1L, "s", "one two three four"),
      (2L, "s", "one two three four")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.boilerplateSegments(d, "doc_id", "source", "text", 4, 2)
      .collect()
    assert(out.forall(_.getAs[Long]("n_boiler") == 1))
    assert(out.forall(_.isNullAt(out.head.fieldIndex("clean_text"))))
  }

  test("retrievalMetrics computes MRR/precision/recall/linear DCG exactly") {
    // query 1: ranked docs 10,11,12; relevant = {11 (rel 2), 99 (rel 1)}
    //   first_rel = rank 2 -> mrr = 500000
    //   hits@3 = 1, prec@3 = 333333, recall = 1/2 = 500000
    //   dcg = 1e6*2 div 3 = 666666
    // query 2: no relevant docs at all -> all zeros, n_rel = 0
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 10L, 1), (2L, 11L, 2)
    ).toDF("query_id", "doc_id", "rank")
    val rel = Seq((1L, 11L, 2L), (1L, 99L, 1L)).toDF("query_id", "doc_id", "rel")
    val out = TextAnalysis.retrievalMetrics(ranked, rel, 3)
      .orderBy("query_id").collect()
    assert(out.length == 2)
    val q1 = out(0)
    assert(q1.getAs[Long]("n_rel") == 2L)
    assert(q1.getAs[Long]("n_rel_at_k") == 1L)
    assert(q1.getAs[Long]("mrr_q") == 500000L)
    assert(q1.getAs[Long]("prec_at_k_q") == 333333L)
    assert(q1.getAs[Long]("recall_at_k_q") == 500000L)
    assert(q1.getAs[Long]("dcg_lin_q") == 666666L)
    val q2 = out(1)
    assert(q2.getAs[Long]("n_rel") == 0L)
    assert(q2.getAs[Long]("mrr_q") == 0L)
    assert(q2.getAs[Long]("recall_at_k_q") == 0L)
    assert(q2.getAs[Long]("dcg_lin_q") == 0L)
  }

  test("hardNegatives keeps the strongest-ranked non-relevant docs, in rank order") {
    val ranked = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4), (1L, 14L, 5),
      (2L, 20L, 1), (2L, 21L, 2)
    ).toDF("query_id", "doc_id", "rank")
    // q1: 11 and 13 are relevant -> negatives are 10, 12, 14 (ranks 1,3,5)
    // q2: all relevant -> no negatives emitted
    val rel = Seq((1L, 11L), (1L, 13L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "doc_id")
    val out = TextAnalysis.hardNegatives(ranked, rel, 2)
      .orderBy("query_id", "neg_rank").collect()
    assert(out.length == 2) // perQuery=2 caps q1's three candidates
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("neg_rank"))).toSeq ==
      Seq((10L, 1), (12L, 2)))
    assert(out.forall(_.getAs[Long]("query_id") == 1L))
  }

  test("conditionalBigramScore scores transitions, not word frequency") {
    // corpus: "a b", "a b", "a c" ->
    //   f(a b)=2, f(a c)=1, f(a .)=3
    //   doc 1/2 score: 1e6*2 div 3 = 666666; doc 3: 1e6*1 div 3 = 333333
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.conditionalBigramScore(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("cond_score_q")).toSeq ==
      Seq(666666L, 666666L, 333333L))
    assert(out.forall(_.getAs[Long]("n_bigrams") == 1L))
  }

  test("conditionalBigramScore averages per-instance terms within a doc") {
    // doc: "a b a c" -> bigrams (a b), (b a), (a c)
    //   f(a b)=1, f(b a)=1, f(a c)=1; f(a .)=2, f(b .)=1
    //   terms: 1e6*1 div 2 = 500000, 1e6, 500000 -> mean = 666666
    val d = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val out = TextAnalysis.conditionalBigramScore(d, "doc_id", "text").collect()
    assert(out.head.getAs[Long]("n_bigrams") == 3L)
    assert(out.head.getAs[Long]("cond_score_q") == 666666L)
  }
}
