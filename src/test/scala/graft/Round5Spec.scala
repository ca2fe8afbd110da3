package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{reverse, when}
import org.apache.spark.sql.internal.SQLConf

/** Round-5 specs: thread-scoped optimizer-flag override (the round-4
  * ADVICE medium item) and its observable effect on planning.
  */
class Round5Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val key = "spark.sql.constraintPropagation.enabled"

  test("withoutConstraintPropagation is thread-scoped, not session-global") {
    val df = spark.range(1).toDF("id")
    assert(spark.conf.get(key, "true") == "true")
    GraphAlgorithms.withoutConstraintPropagation(df) {
      // this thread's Catalyst conf sees the override...
      assert(!SQLConf.get.constraintPropagationEnabled)
      // ...but the session conf itself is untouched...
      assert(spark.conf.get(key, "true") == "true")
      // ...so a concurrent thread planning on the same session keeps it on
      @volatile var other = false
      val t = new Thread(() => { other = SQLConf.get.constraintPropagationEnabled })
      t.start(); t.join()
      assert(other, "concurrent thread must keep constraint propagation on")
    }
    // scope exit restores this thread too
    assert(SQLConf.get.constraintPropagationEnabled)
    assert(spark.conf.get(key, "true") == "true")
  }

  test("the override reaches the optimizer of an action run inside the scope") {
    // InferFiltersFromConstraints makes the flag observable: with
    // propagation ON the filter a.id > 5 is inferred onto the other join
    // side (two `> 5` predicates in the optimized plan); OFF leaves one.
    def inferredCount(): Int = {
      val a = spark.range(10).toDF("id").filter($"id" > 5)
      val b = spark.range(10).toDF("id")
      val j = b.join(a, "id")
      j.count() // forces planning through the normal action path
      "> 5".r.findAllIn(j.queryExecution.optimizedPlan.toString).length
    }
    val withProp = inferredCount()
    val withoutProp = GraphAlgorithms.withoutConstraintPropagation(spark.range(1).toDF("id")) {
      inferredCount()
    }
    assert(withProp >= 2, s"baseline should infer the join-side filter, got $withProp")
    assert(withoutProp == 1,
      s"inside the scope the optimizer must not infer constraints, got $withoutProp")
  }

  test("injected function builders reject wrong arity with AnalysisException") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val one = Seq(Literal(1L))
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      GraftExtensions.requireArity("graft_long_dot", 2, one)
    }
    assert(ex.getMessage.contains("graft_long_dot"))
    assert(ex.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION")
    // correct arity passes through
    GraftExtensions.requireArity("graft_nfc", 1, one)
  }

  // ---- round-5 operators ----

  private def docsDf = Seq(
    (1L, "a b c d e f"),
    (2L, "a b c d e g"),    // jaccard vs 1: shingles {abc,bcd,cde,def} vs {abc,bcd,cde,deg} = 3/5
    (3L, "x y z w v u"),
    (4L, "x y z w v u"),    // exact dup of 3
    (5L, "q r"),            // too short for 3-shingles
    (6L, "a b c q r s t u v w")
  ).toDF("doc_id", "text")

  test("jaccardPrefixPairs equals the unfiltered threshold join (exactness)") {
    import graft.functions.Dedup
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      val pref = Dedup.jaccardPrefixPairs(docsDf, "doc_id", "text", 3, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val brute = Dedup.ngramJaccardPairs(docsDf, "doc_id", "text", 3, tau, maxDf = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(pref == brute, s"tau=$tau: prefix=$pref brute=$brute")
    }
    // sanity on the fixture: the exact-dup pair is found at every tau
    val found = Dedup.jaccardPrefixPairs(docsDf, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(found.contains((3L, 4L)))
  }

  test("incrementalSignatures equals a full recompute over the merged corpus") {
    import graft.functions.Dedup
    val stale = docsDf.withColumn("text",
      when($"doc_id" % 2 === 0, reverse($"text")).otherwise($"text"))
    val changed = docsDf.filter($"doc_id" % 2 === 0)
    val inc = Dedup.incrementalSignatures(
        Dedup.minhashSignatures(stale, "doc_id", "text", 8, 3),
        changed, "doc_id", "text", 8, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val full = Dedup.minhashSignatures(docsDf, "doc_id", "text", 8, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(inc == full)
  }

  test("hashedLinearScore is deterministic, mean-bounded, and total") {
    import graft.functions.TextAnalysis
    val out = TextAnalysis.hashedLinearScore(docsDf, "doc_id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 6) // every doc scores, even the 2-token one
    out.foreach { case (_, n, sq, keep) =>
      assert(n > 0)
      // mean of weights in [-1000, 1000], millionths-quantized
      assert(sq >= -1000L * 1000000 && sq <= 1000L * 1000000)
      assert(keep == (sq >= 0))
    }
    val again = TextAnalysis.hashedLinearScore(docsDf, "doc_id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("matryoshkaRecall: full-width truncation recalls everything") {
    import graft.functions.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 5)
    // dims = full width => the two rankings are identical => recall 1.0
    val full = Similarity.matryoshkaRecall(q, emb, "vec_id", "embedding", 64, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(full.length == 5)
    full.foreach { case (_, ov, ppm) => assert(ov == 5L && ppm == 1000000L) }
    // truncated recall is bounded by k and nonnegative
    val tr = Similarity.matryoshkaRecall(q, emb, "vec_id", "embedding", 8, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    tr.foreach { case (_, ov) => assert(ov >= 0L && ov <= 5L) }
  }

  test("jaccardPrefixPairs plan has no cartesian or nested-loop join") {
    import graft.functions.Dedup
    val plan = Dedup.jaccardPrefixPairs(docsDf, "doc_id", "text", 3, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
  }
}
