package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch M: duplicated substring spans, winnowing fingerprints, widest
  * (bottleneck) paths.
  */
class BatchMSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import graft.functions.{Dedup, TextAnalysis}

  test("duplicatedSpans merges adjacent corpus-repeated trigram positions") {
    // docs 1 and 2 share "a b c d e" (trigram positions 0,1,2 duplicated in
    // both -> one span [0, 4]); doc 3 is unique -> no rows
    val df = Seq(
      (1L, "a b c d e x y z"),
      (2L, "q r a b c d e"),
      (3L, "u v w s t n m o"))
      .toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(df, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // doc 1: positions 0,1,2 ("a b c","b c d","c d e") -> span 0..4, 3 grams
    // doc 2: positions 2,3,4 -> span 2..6, 3 grams
    assert(got == Set((1L, 0L, 4L, 3L), (2L, 2L, 6L, 3L)))
  }

  test("duplicatedSpans flags within-document repetition too") {
    val df = Seq((1L, "a b c x x a b c"), (2L, "zz yy ww vv")).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(df, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // "a b c" occurs at positions 0 and 5 of doc 1 -> two spans [0,2], [5,7]
    assert(got == Set((1L, 0L, 2L), (1L, 5L, 7L)))
  }

  test("winnowFingerprints guarantees a shared fingerprint for long matches") {
    // shared run of w + k - 1 = 7 tokens -> must share >= 1 fingerprint
    val shared = "m1 m2 m3 m4 m5 m6 m7"
    val df = Seq(
      (1L, s"a b c $shared d e f"),
      (2L, s"x y $shared z w q r s"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.winnowFingerprints(df, "doc_id", "text", k = 4, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
    val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
    val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
    assert((f1 & f2).nonEmpty, "no shared fingerprint for a 7-token match")
  }

  test("winnowFingerprints density stays near 2/(w+1)") {
    val text = (1 to 400).map(i => s"t${i * 7 % 89}").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val n = TextAnalysis.winnowFingerprints(df, "doc_id", "text", 4, 4).count()
    val positions = 400 - 3 // k-gram count
    assert(n <= positions / 2, s"selected $n of $positions hashes")
    assert(n >= positions / 8, s"selected only $n of $positions hashes")
  }

  test("weightedSample plans as TakeOrderedAndProject, not a global sort") {
    val df = (1L to 500L).map(i => (i, i * 1.0 + 1)).toDF("k", "w")
    val plan = graft.functions.Sampling.weightedSample(df, "k", "w", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
  }

  test("topKPerWindow plans a map-side WindowGroupLimit") {
    val df = (1 to 50).map(i => (s"w${i % 5}", s"t$i", i.toLong))
      .toDF("window_start", "event_type", "n_events")
    val plan = graft.streaming.EventStream.topKPerWindow(df, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(600))
  }

  test("duplicatedSpans plans no cartesian product") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val plan = Dedup.duplicatedSpans(df, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }

  test("widestPaths computes maximin capacities exactly") {
    // 0 -1.00- 1 -3.00- 2  and  0 -2.00- 2: widest 0->2 = min(200) vs
    // min(100,300) -> 200; widest 0->1 = max(100, min(200,300)) = 200
    val nodes = Seq(0L, 1L, 2L).map(Tuple1(_)).toDF("id")
    val edges = Seq((0L, 1L, 1.00), (1L, 2L, 3.00), (0L, 2L, 2.00))
      .toDF("source", "target", "weight")
    val got = GraphAlgorithms
      .widestPaths(NetworkFrame(nodes, edges), 0L, "weight", rounds = 4,
        directed = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) == Long.MaxValue)
    assert(got(1L) == 200L)
    assert(got(2L) == 200L)
  }
}
