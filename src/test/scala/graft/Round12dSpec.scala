package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Curation, Similarity}

/** Round-12 continuation: margin-based bitext mining (cross-set ANN join)
  * and the one-scan per-source ablation profile.
  */
class Round12dSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"
  private def embAll = spark.read.parquet(s"$SF/embeddings.parquet")

  test("marginMinedPairs finds the exact-dup match with cos_q = 1e6") {
    // query 100 IS candidate 1; candidate 2 is near-orthogonal, so the
    // margin over the top-2 mean is large. nprobe covers every possible
    // cell, so probing cannot hide the true match.
    val queries = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val cands = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.1f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f, 0.1f))).toDF("vec_id", "embedding")
    val out = Similarity.marginMinedPairs(queries, cands, "vec_id", "embedding",
      k = 2, nprobe = 3, marginPpmMin = 1000000L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("query_id") == 100L)
    assert(r.getAs[Long]("match_id") == 1L)
    // identical vectors: integer dot == both norms -> cosine exactly 1.0
    assert(r.getAs[Long]("cos_q") == 1000000L)
    assert(r.getAs[Long]("margin_ppm") > 1500000L)
  }

  test("marginMinedPairs margin is exactly 1e6 when the top-k are indistinguishable") {
    // both candidates identical: cos ties, margin = best*2*1e6/(2*best) = 1e6
    val queries = Seq((100L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val cands = Seq(
      (1L, Array(1.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val keep = Similarity.marginMinedPairs(queries, cands, "vec_id", "embedding",
      k = 2, nprobe = 2, marginPpmMin = 1000000L).collect()
    assert(keep.length == 1)
    assert(keep.head.getAs[Long]("margin_ppm") == 1000000L)
    assert(keep.head.getAs[Long]("match_id") == 1L) // tie breaks to min id
    val drop = Similarity.marginMinedPairs(queries, cands, "vec_id", "embedding",
      k = 2, nprobe = 2, marginPpmMin = 1000001L)
    assert(drop.count() == 0)
  }

  test("marginMinedPairs with all cells probed matches brute-force rank 1") {
    // full-probe parity on real embeddings: the best match per query must
    // equal bruteForceTopK's rank-1 row (disjoint id spaces by hash split)
    val e = embAll.filter(col("vec_id") < 80)
    val side = graft.functions.Sampling.hashBucket(col("vec_id"), 2, "bt")
    val qs = e.filter(side === 0)
    val cs = e.filter(side === 1)
    val nCells = math.ceil(math.sqrt(cs.count().toDouble)).toInt
    val mined = Similarity.marginMinedPairs(qs, cs, "vec_id", "embedding",
        k = 4, nprobe = nCells, marginPpmMin = 0L)
      .select(col("query_id"), col("match_id"))
    val bf = Similarity.bruteForceTopK(qs, cs, "vec_id", "embedding", 1)
      .select(col("query_id"), col("neighbor_id").as("match_id"))
    // mined may drop queries whose best cosine <= 0; every emitted row must
    // agree with brute force, and positive-best queries must all be present
    assert(mined.exceptAll(bf).count() == 0)
    val positives = bf.count() // this corpus has no non-positive best sims
    assert(mined.count() == positives)
  }

  test("q_bitext_mine plan: no cross-set join conditioned on id inequality alone") {
    val df = SparkEntry.queries("q_bitext_mine")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // the seed-ranking pass is a conditionless broadcast cross-join
    // (|side| x sqrt(|B|) seeds — intended); what must NOT appear is an
    // |A| x |B| join whose only condition is id inequality — the brute
    // force scorer's signature
    val badJoin = raw"NestedLoopJoin[^\n]*(NOT \(\w*(vec_id|qid|id)|[<>] \w*(vec_id|qid|id))".r
    assert(badJoin.findFirstIn(plan).isEmpty,
      s"no id-inequality-only join in the bitext mining plan\n${plan.take(1200)}")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"seed table must broadcast\n${plan.take(600)}")
  }

  test("sourceAblation complement stats are totals minus group") {
    val d = Seq(
      (1L, "a", "w1 w2 w3"),        // 3 tokens
      (2L, "a", "w1 w2 w3 w4 w5"),  // 5
      (3L, "b", "w1 w2"),           // 2
      (4L, "c", "w1 w2 w3 w4")      // 4
    ).toDF("doc_id", "source", "text")
    val out = Curation.sourceAblation(d, "source", "text")
      .orderBy("source").collect()
    assert(out.length == 3)
    val a = out(0)
    assert(a.getAs[Long]("n_docs") == 2L && a.getAs[Long]("n_tokens") == 8L)
    assert(a.getAs[Long]("share_ppm") == 8L * 1000000L / 14L)
    assert(a.getAs[Long]("rest_docs") == 2L)
    assert(a.getAs[Long]("rest_tokens") == 6L)
    assert(a.getAs[Long]("rest_avg_tokens_q") == 3000000L) // (2+4)/2 tokens
    val b = out(1)
    assert(b.getAs[Long]("rest_docs") == 3L)
    assert(b.getAs[Long]("rest_avg_tokens_q") == 4000000L) // (3+5+4)/3
  }

  test("curriculumOrder: exact stage ntile, round-robin interleave, any partitioning") {
    // 8 docs, scores descending with id: stage = rank*4/8 -> ids 1,2 stage 0;
    // 3,4 stage 1; 5,6 stage 2; 7,8 stage 3
    val d = Seq(
      (1L, "a", 80L), (2L, "b", 70L), (3L, "a", 60L), (4L, "b", 50L),
      (5L, "a", 40L), (6L, "b", 30L), (7L, "a", 20L), (8L, "b", 10L)
    ).toDF("doc_id", "source", "score")
    val out = Curation.curriculumOrder(d, "doc_id", "source", "score", 4)
      .orderBy("stage", "pos").collect()
    assert(out.length == 8)
    val stages = out.map(r => r.getAs[Long]("id") -> r.getAs[Int]("stage")).toMap
    assert(stages == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1,
      5L -> 2, 6L -> 2, 7L -> 3, 8L -> 3))
    // within each stage: one doc per source, in_src_rank 1 each, so pos is
    // src_idx (a=0, b=1) — sources strictly alternate
    assert(out.forall(_.getAs[Long]("in_src_rank") == 1L))
    out.grouped(2).foreach { st =>
      assert(st.map(_.getAs[String]("source")).toSeq == Seq("a", "b"))
      assert(st.map(_.getAs[Long]("pos")).toSeq == Seq(0L, 1L))
    }
    // partitioning-independent: identical rows from a repartitioned input
    val re = Curation.curriculumOrder(d.repartition(7), "doc_id", "source",
      "score", 4)
    assert(re.exceptAll(Curation.curriculumOrder(d, "doc_id", "source",
      "score", 4)).count() == 0)
  }

  test("sourceAblation single-source corpus: complement is empty, avg 0") {
    val d = Seq((1L, "only", "w1 w2")).toDF("doc_id", "source", "text")
    val out = Curation.sourceAblation(d, "source", "text").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("rest_docs") == 0L)
    assert(out.head.getAs[Long]("rest_avg_tokens_q") == 0L)
  }
}
