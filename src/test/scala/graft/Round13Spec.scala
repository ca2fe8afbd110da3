package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Similarity, TextAnalysis}

/** Round-13 work: the bench outlier guard becomes a pure, unit-tested
  * object (BenchGuard); the clustering gate moves to multi-membership
  * IVF (nprobe=6, massign=3); the exact recall denominators are
  * anchor-sampled (mutualKnnEdgesAnchored); and the flagship physical
  * plans are GATED — a reintroduced cartesian product or
  * id-inequality-only join fails the suite instead of waiting for a
  * bench anomaly.
  */
class Round13Spec extends AnyFunSuite with SparkFixture {

  private val SF = "/root/testdata/sf0.001"
  private def emb100 = spark.read.parquet(s"$SF/embeddings.parquet")
    .filter(col("vec_id") < 120)
  private def docsDf = spark.read.parquet(s"$SF/documents.parquet")

  // ---------------- BenchGuard: the official record's gatekeeper --------

  test("BenchGuard.parseQueries reads our flat shape, the driver's nested shape, and survives garbage") {
    val flat = """{"metric":"total","queries":{"q_a":1.5,"q_b":2},"sf":"x"}"""
    assert(BenchGuard.parseQueries(flat) == Map("q_a" -> 1.5, "q_b" -> 2.0))
    val driver = """{"n":12,"rc":0,"parsed":{"metric":"total","queries":{"q_c":3.25},"outliers":{}}}"""
    assert(BenchGuard.parseQueries(driver) == Map("q_c" -> 3.25))
    assert(BenchGuard.parseQueries("not json at all") == Map.empty)
    assert(BenchGuard.parseQueries("""{"queries": 7}""") == Map.empty)
  }

  test("BenchGuard.bestPrior keeps the minimum positive record per query") {
    val prior = BenchGuard.bestPrior(Seq(
      Map("q_a" -> 4.0, "q_b" -> -1.0), Map("q_a" -> 2.5, "q_b" -> 6.0)))
    assert(prior == Map("q_a" -> 2.5, "q_b" -> 6.0))
  }

  test("BenchGuard.suspects triggers at the family ratio above the 5s floor; no prior, no trigger") {
    val shared = Seq("q_slow" -> 31.0, "q_fine" -> 5.5, "q_small" -> 4.9,
      "q_new" -> 100.0)
    val prior = Map("q_slow" -> 10.0, "q_fine" -> 3.0, "q_small" -> 1.0)
    // q_slow: 31 > 2*10 -> suspect. q_fine: 5.5 < 2*3=6 -> clean.
    // q_small: 4.9 under the 5s floor despite 4.9x. q_new: no prior record.
    assert(BenchGuard.suspects(shared, prior).map(_._1) == Seq("q_slow"))
  }

  test("BenchGuard.adjudicate takes min(shared, solo) but refuses a warm-memo solo below half prior") {
    assert(BenchGuard.adjudicate(31.0, 9.5, Some(10.0)) == 9.5)
    // solo 0.16s on a 10s-prior query is a memoized-parquet read, not a
    // re-measure: the shared time stands
    assert(BenchGuard.adjudicate(31.0, 0.16, Some(10.0)) == 31.0)
    assert(BenchGuard.adjudicate(31.0, 9.5, None) == 9.5)
  }

  test("BenchGuard.mergeSeed min-merges, refuses sub-0.3x lows and failed rows") {
    val merged = BenchGuard.mergeSeed(
      existing = Map("q_a" -> 10.0, "q_b" -> 2.0),
      fresh = Map("q_a" -> 8.0, "q_b" -> 0.1, "q_c" -> 5.0, "q_d" -> -1.0))
    // q_a improves to 8; q_b's 0.1 (< 0.3*2.0) is a warm-memo low, refused;
    // q_c is new; q_d failed (non-positive)
    assert(merged == Map("q_a" -> 8.0, "q_b" -> 2.0, "q_c" -> 5.0))
  }

  // ---------------- multi-membership IVF clustering gate ----------------

  test("mutualKnnGraphKmv with all-cell membership and nprobe=1 equals the exact graph") {
    val e = emb100
    val nCells = math.ceil(math.sqrt(e.count().toDouble)).toInt
    // every vector in every cell => any probed cell contains the whole
    // corpus => candidates are all-pairs and the result must be exact
    val ivf = Similarity.mutualKnnGraphKmv(e, "vec_id", "embedding",
      k = 5, nprobe = 1, massign = nCells)
    val exact = Similarity.mutualKnnGraph(e, "vec_id", "embedding", k = 5)
    assert(ivf.columns.toSeq == exact.columns.toSeq)
    assert(ivf.exceptAll(exact).count() == 0)
    assert(exact.exceptAll(ivf).count() == 0)
    assert(exact.count() > 0, "fixture must produce mutual edges")
  }

  test("mutualKnnGraphKmv massign=3 edges shared with the exact graph carry identical cos_q") {
    val e = emb100
    val ivf = Similarity.mutualKnnGraphKmv(e, "vec_id", "embedding",
      k = 5, nprobe = 2, massign = 3)
    val exact = Similarity.mutualKnnGraph(e, "vec_id", "embedding", k = 5)
    val joined = ivf.as("i").join(exact.as("x"),
      col("i.vec_a") === col("x.vec_a") && col("i.vec_b") === col("x.vec_b"))
    assert(joined.filter(col("i.cos_q") =!= col("x.cos_q")).count() == 0)
    assert(joined.count() > 0)
  }

  test("mutualKnnGraphKmv massign improves candidate recall over massign=1 at equal nprobe") {
    val e = emb100
    val exact = Similarity.mutualKnnGraph(e, "vec_id", "embedding", k = 5)
    def hits(massign: Int): Long =
      exact.join(Similarity.mutualKnnGraphKmv(e, "vec_id", "embedding",
        k = 5, nprobe = 2, massign = massign).select("vec_a", "vec_b"),
        Seq("vec_a", "vec_b"), "left_semi").count()
    assert(hits(3) >= hits(1))
  }

  // ---------------- anchored exact recall denominator -------------------

  test("mutualKnnEdgesAnchored with anchorCap >= n equals the full exact mutual graph") {
    val e = emb100
    val full = Similarity.mutualKnnGraph(e, "vec_id", "embedding", k = 5)
    val anchored = Similarity.mutualKnnEdgesAnchored(e, "vec_id", "embedding",
      k = 5, anchorCap = 1000L) // m = max(1, n/1000) = 1: every id anchors
    assert(anchored.columns.toSeq == full.columns.toSeq)
    assert(anchored.exceptAll(full).count() == 0)
    assert(full.exceptAll(anchored).count() == 0)
  }

  test("mutualKnnEdgesAnchored with a small cap is the anchor-touching subset with exact cos_q") {
    val e = emb100
    val n = e.count()
    val cap = 16L
    val m = math.max(1L, n / cap)
    val full = Similarity.mutualKnnGraph(e, "vec_id", "embedding", k = 5)
    val anchored = Similarity.mutualKnnEdgesAnchored(e, "vec_id", "embedding",
      k = 5, anchorCap = cap)
    // exactly the full-graph edges with >= 1 anchor endpoint, same cos_q
    val expected = full.filter(col("vec_a") % m === 0 || col("vec_b") % m === 0)
    assert(anchored.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(anchored).count() == 0)
    assert(anchored.count() > 0 && anchored.count() < full.count())
  }

  test("salted two-phase top-k is bit-identical to the single-window ranking") {
    // bruteForceTopK now ranks via (query_id, neighbor_id % SaltWidth)
    // partials + a final pass — same rows, ranks, and sims as the naive
    // global window; pin it against an independent in-test reference
    import org.apache.spark.sql.expressions.Window
    val e = emb100
    val got = Similarity.bruteForceTopK(e.filter(col("vec_id") < 40), e,
      "vec_id", "embedding", 5)
    val q = e.filter(col("vec_id") < 40)
      .select(col("vec_id").as("query_id"), col("embedding").as("va"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("vb"))
    val ref = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", Similarity.cosine(col("va"), col("vb")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("sim"))
    assert(got.exceptAll(ref).count() == 0)
    assert(ref.exceptAll(got).count() == 0)
    assert(got.count() == 40 * 5)
  }

  test("cosineNearDupPairsAnchored with anchorCap >= n equals the exhaustive pair set") {
    val e = emb100
    val full = Similarity.cosineNearDupPairsExact(e, "vec_id", "embedding", 0.4)
    val anchored = Similarity.cosineNearDupPairsAnchored(e, "vec_id",
      "embedding", 0.4, anchorCap = 1000L)
    assert(anchored.columns.toSeq == full.columns.toSeq)
    assert(anchored.exceptAll(full).count() == 0)
    assert(full.exceptAll(anchored).count() == 0)
    assert(full.count() > 0, "fixture must produce near-dup pairs")
  }

  test("cosineNearDupPairsAnchored with a small cap is the anchor-touching subset with exact sims") {
    val e = emb100
    val n = e.count()
    val cap = 16L
    val m = math.max(1L, n / cap)
    val full = Similarity.cosineNearDupPairsExact(e, "vec_id", "embedding", 0.4)
    val anchored = Similarity.cosineNearDupPairsAnchored(e, "vec_id",
      "embedding", 0.4, anchorCap = cap)
    val expected = full.filter(col("id_a") % m === 0 || col("id_b") % m === 0)
    assert(anchored.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(anchored).count() == 0)
  }

  // ---------------- plan-audit gate --------------------------------------
  // The properties the operator scaladocs promise, asserted on the actual
  // physical plans so a regression fails the suite. Detector first: prove
  // the string probe actually flags a bad plan before trusting its absence.

  private def phys(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("plan gate detector: an id-inequality-only join DOES plan as cartesian/nested-loop") {
    val a = docsDf.select(col("doc_id").as("ia"))
    val b = docsDf.select(col("doc_id").as("ib"))
    val bad = phys(a.join(b, col("ia") =!= col("ib")))
    assert(bad.contains("CartesianProduct") || bad.contains("BroadcastNestedLoopJoin"),
      s"detector lost its teeth:\n$bad")
  }

  test("candidate-generation plans contain no cartesian product and no nested-loop join") {
    val plans = Map(
      "minhashLshPairs" -> phys(
        Dedup.minhashLshPairs(docsDf, "doc_id", "text", 16, 4)),
      "dedupAgainstCorpus" -> phys(
        Dedup.dedupAgainstCorpus(docsDf.filter(col("doc_id") % 7 === 0),
          "doc_id", "text",
          Dedup.minhashSignatures(docsDf, "doc_id", "text", 16, 3))),
      "tfidfCosinePairs" -> phys(
        TextAnalysis.tfidfCosinePairs(docsDf, "doc_id", "text", 20, 100000, 3)))
    plans.foreach { case (name, p) =>
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a nested loop:\n$p")
    }
  }

  test("IVF plans: the only nested-loop joins are the bounded broadcast probe scans") {
    // the centroid/seed probe is a deliberate crossJoin against a broadcast
    // table of ~sqrt(n) rows; the CANDIDATE join must stay an equi-join —
    // no CartesianProduct anywhere, and every nested-loop is a broadcast
    val p = phys(Similarity.mutualKnnGraphKmv(emb100, "vec_id", "embedding",
      k = 5, nprobe = 2, massign = 3))
    assert(!p.contains("CartesianProduct"), s"clustering gate plans a cartesian:\n$p")
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    val bcast = "BroadcastExchange".r.findAllIn(p).size
    assert(nlj <= bcast, s"non-broadcast nested loop in the clustering gate:\n$p")
  }

  test("asofBackward plans with no join operator at all") {
    val ev = graft.streaming.EventStream.normalizeTs(
      spark.read.parquet(s"$SF/events.parquet"))
    val p = phys(graft.operators.AsOfJoin.asofBackward(
      ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts"),
      ev.filter(col("event_type") === "purchase"),
      Seq("user_id"), "ts", "ts", Seq("value"), Some("event_id")))
    assert(!p.contains("Join"), s"asofBackward grew a join:\n$p")
  }

  test("salted top-k and bm25 rankings plan map-side WindowGroupLimits") {
    // the rank<=k filters must truncate BELOW the exchange so only k rows
    // per (query, bucket) per map task cross the wire
    val pTopK = phys(Similarity.bruteForceTopK(
      emb100.filter(col("vec_id") < 10), emb100, "vec_id", "embedding", 5))
    assert(pTopK.contains("WindowGroupLimit"), s"salted top-k lost its group limit:\n$pTopK")
    import spark.implicits._
    val qt = Seq((1L, "spark"), (2L, "stream")).toDF("query_id", "term")
    val pBm25 = phys(TextAnalysis.bm25TopKPerQuery(docsDf, "doc_id", "text", qt, 10))
    assert(pBm25.contains("WindowGroupLimit"), s"bm25 top-k lost its group limit:\n$pBm25")
  }

  test("filter and projection reach the parquet scan (pushdown gate)") {
    val q = docsDf.filter(col("lang") === "en").select("doc_id", "lang")
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters:") &&
      formatted.contains("EqualTo(lang,en)"),
      s"lang filter not pushed to the scan:\n$formatted")
    assert(!formatted.contains("text"),
      s"pruned scan still reads the text column:\n$formatted")
  }
}
