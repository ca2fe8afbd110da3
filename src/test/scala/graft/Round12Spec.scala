package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Similarity

/** Round-12 work: the IVF mutual-kNN generator is gated (q_doc_clusters),
  * the sign-LSH near-dup channel gets a linear windowed candidate bound,
  * the KMV cell channel's probe default moves to its audited operating
  * point, and Bench re-runs shared-pass outliers solo before recording.
  */
class Round12Spec extends AnyFunSuite with SparkFixture {

  private val SF = "/root/testdata/sf0.001"
  private def emb100 = spark.read.parquet(s"$SF/embeddings.parquet")
    .filter(col("vec_id") < 120)

  test("kmvCellAssign probe=1 is a functional cell membership; probe=p emits p rows per id") {
    val e = emb100
    val n = e.count()
    val one = Similarity.kmvCellAssign(e, "vec_id", "embedding", probe = 1)
    assert(one.count() == n)
    assert(one.select("id").distinct().count() == n)
    val three = Similarity.kmvCellAssign(e, "vec_id", "embedding", probe = 3)
    assert(three.count() == 3 * n)
    assert(three.groupBy("id").count().filter(col("count") =!= 3).count() == 0)
    // probed cells per id are distinct (the Ivf dedup argument rests on it)
    assert(three.distinct().count() == 3 * n)
  }

  test("mutualKnnGraphIvf equals the exact mutual-kNN graph when every cell is probed") {
    val e = emb100
    val cells = Similarity.kmvCellAssign(e, "vec_id", "embedding", probe = 1)
      .select(col("id").as("vec_id"), col("cell"))
    val nCells = cells.select("cell").distinct().count().toInt
    val ivf = Similarity.mutualKnnGraphIvf(e.join(cells, Seq("vec_id")),
      "vec_id", "embedding", "cell", k = 5, nprobe = nCells)
    val exact = Similarity.mutualKnnGraph(e, "vec_id", "embedding", k = 5)
    // identical schema, identical rows (cos_q included): probing all cells
    // makes the candidate set all-pairs, and scoring/tie-breaks are shared
    assert(ivf.columns.toSeq == exact.columns.toSeq)
    assert(ivf.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(ivf).count() == 0)
    assert(exact.count() > 0, "fixture must produce mutual edges")
  }

  test("mutualKnnGraphIvf at nprobe=4 is a subset of the exact graph with matching cos_q") {
    val e = emb100
    val cells = Similarity.kmvCellAssign(e, "vec_id", "embedding", probe = 1)
      .select(col("id").as("vec_id"), col("cell"))
    val ivf = Similarity.mutualKnnGraphIvf(e.join(cells, Seq("vec_id")),
      "vec_id", "embedding", "cell", k = 5, nprobe = 4)
    val exact = Similarity.mutualKnnGraph(e, "vec_id", "embedding", k = 5)
    // the IVF candidate bound can DROP edges (probe misses) and, because a
    // dropped competitor frees a top-k slot, can also ADMIT a pair the
    // exact top-k excluded — but any edge on an (a,b) pair present in the
    // exact graph must carry the identical exact cosine
    val joined = ivf.as("i").join(exact.as("x"),
      col("i.vec_a") === col("x.vec_a") && col("i.vec_b") === col("x.vec_b"))
    assert(joined.filter(col("i.cos_q") =!= col("x.cos_q")).count() == 0,
      "shared edges must score identically (same quantized dot)")
  }

  test("fused mutualKnnGraphKmv is bit-identical to composed kmvCellAssign + mutualKnnGraphIvf") {
    val e = emb100
    val fused = Similarity.mutualKnnGraphKmv(e, "vec_id", "embedding",
      k = 5, nprobe = 4)
    val cells = Similarity.kmvCellAssign(e, "vec_id", "embedding", probe = 1)
      .select(col("id").as("vec_id"), col("cell"))
    val composed = Similarity.mutualKnnGraphIvf(e.join(cells, Seq("vec_id")),
      "vec_id", "embedding", "cell", k = 5, nprobe = 4)
    assert(fused.exceptAll(composed).count() == 0)
    assert(composed.exceptAll(fused).count() == 0)
    assert(fused.count() > 0, "fixture must produce mutual edges")
  }

  test("q_doc_clusters plan has no join conditioned on id inequality alone") {
    val df = SparkEntry.queries("q_doc_clusters")(spark, SF)
    val plan = df.queryExecution.executedPlan.toString
    // the IVF probe's centroid ranking is a conditionless broadcast
    // cross-join (n x sqrt(n) centroids — intended); what must NOT appear
    // is an all-pairs join whose only condition is id inequality, the
    // exact scorer's signature
    val badJoin = raw"NestedLoopJoin[^\n]*(NOT \(\w*(vec_id|qid|id)|[<>] \w*(vec_id|qid|id))".r
    assert(badJoin.findFirstIn(plan).isEmpty,
      s"no id-inequality-only join in the production clustering plan\n${plan.take(1200)}")
  }

  test("windowed sign-LSH near-dup pairs are a subset of the exact pairs with matching sim") {
    val e = emb100
    val lsh = Similarity.cosineNearDupPairs(e, "vec_id", "embedding", 0.4, 16, 4)
    val exact = Similarity.cosineNearDupPairsExact(e, "vec_id", "embedding", 0.4)
    assert(lsh.exceptAll(exact).count() == 0,
      "every windowed-LSH pair must appear in the exact pair set with equal sim")
    // deterministic: the per-band md5 shuffle is seedless and value-derived
    val again = Similarity.cosineNearDupPairs(e, "vec_id", "embedding", 0.4, 16, 4)
    assert(lsh.exceptAll(again).count() == 0 && again.exceptAll(lsh).count() == 0)
  }

  test("signLshBucketAudit: every band partitions the corpus; truncation columns are consistent") {
    val e = emb100
    val n = e.count()
    val audit = Similarity.signLshBucketAudit(e, "vec_id", "embedding", 16, 4, 8)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(audit.length == 16)
    for ((band, nBuckets, maxBucket, nTrunc, rowsTrunc) <- audit) {
      assert(nBuckets >= 1 && nBuckets <= 16, s"band $band: 4-bit bucket space")
      assert(maxBucket <= n)
      assert(nTrunc <= nBuckets)
      assert(rowsTrunc <= n, s"band $band: truncated rows bounded by corpus")
      assert(rowsTrunc >= nTrunc * 10 || nTrunc == 0,
        s"band $band: each truncated bucket holds > window+1 = 9 rows")
    }
  }

  test("q_ensemble_channels pins the golden per-channel split at sf0.001") {
    val row = SparkEntry.queries("q_ensemble_channels")(spark, SF).collect().head
    val (tOnly, eOnly, both, total) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // golden: the two channels currently corroborate on zero pairs at this
    // SF (text LSH >= 0.5 jaccard vs embedding cells >= 0.4 cosine find
    // DIFFERENT duplicate structure) — exactly why the ledger exists
    assert((tOnly, eOnly, both, total) == ((28L, 55L, 0L, 83L)),
      s"split moved: text_only=$tOnly embed_only=$eOnly both=$both total=$total")
    assert(tOnly + eOnly + both == total, "partition must be exhaustive")
  }

  test("bpeEncode: greedy merge semantics, empty table is char-level, map-only plan") {
    import spark.implicits._
    import graft.functions.TextAnalysis
    val docs = Seq((1L, "aaaa aaa b"), (2L, ""), (3L, "ab")).toDF("doc_id", "text")
    // char-level baseline: no merges, token count == char count
    val base = TextAnalysis.bpeEncode(docs, "doc_id", "text", Nil)
      .orderBy("doc_id").collect()
    assert(base.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((3L, 8L, 8L), (0L, 0L, 0L), (1L, 2L, 2L)))
    // one (a,a) merge: "aaaa" -> "aa aa" (2 tokens), "aaa" -> "aa a" (2),
    // "b" -> 1, "ab" -> "a b" stays 2 — the non-overlapping replace IS the
    // greedy merge
    val m1 = TextAnalysis.bpeEncode(docs, "doc_id", "text", Seq(("a", "a")))
      .orderBy("doc_id").collect()
    assert(m1.map(r => (r.getLong(3), r.getLong(4))).toSeq ==
      Seq((5L, 3L), (0L, 0L), (2L, 0L)))
    // then (aa,aa): "aa aa" -> "aaaa" (1 token)
    val m2 = TextAnalysis.bpeEncode(docs, "doc_id", "text",
      Seq(("a", "a"), ("aa", "aa")))
      .orderBy("doc_id").collect()
    assert(m2.head.getLong(3) == 4L) // aaaa(1) + aa,a(2) + b(1)
    // the encode pass must be map-only: no Exchange anywhere in the plan
    val plan = TextAnalysis.bpeEncode(docs, "doc_id", "text",
      Seq(("a", "a"), ("aa", "aa"))).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle\n$plan")
  }

  test("Bench outlier records: official value is min(shared, solo)") {
    // round 13: the rule moved into BenchGuard (unit-tested directly in
    // Round13Spec); this pins the same file-format contract THROUGH the
    // real adjudication code instead of a local re-implementation
    val shared = Map("a" -> 300.0, "b" -> 2.0)
    val outliers = Map("a" -> ((300.0, 9.5)))
    val prior = Map("a" -> 10.0)
    val official = shared.map { case (k, v) =>
      k -> outliers.get(k).map { case (sh, so) =>
        BenchGuard.adjudicate(sh, so, prior.get(k))
      }.getOrElse(v)
    }
    assert(official("a") == 9.5 && official("b") == 2.0)
  }
}
