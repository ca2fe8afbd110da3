package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Dedup
import graft.operators.AsOfJoin

/** Round-3 fixes: segment-dedup NULL semantics, as-of NULL carry-forward. */
class Round3Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("segmentDedup emits NULL clean_text for a fully-duplicated document") {
    // doc 2 is an exact copy of doc 1: every one of its segments loses the
    // keep-first race, so n_kept = 0 and clean_text must be NULL (SQL
    // string_agg semantics), not the empty string
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i j"),
      (3L, "k l m n o p q r"))
      .toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getString(3))))).toMap
    assert(out(1L)._1 == 2L && out(1L)._2.contains("a b c d e f g h i j"))
    assert(out(2L) == ((0L, None)))
    assert(out(3L)._1 == 1L && out(3L)._2.contains("k l m n o p q r"))
  }

  test("asofBackward carries a genuinely NULL right value as NULL") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    val left = Seq(
      (100L, 1L, t(10)), // most recent right row (t=8) has value NULL -> NULL
      (101L, 1L, t(6))   // most recent right row (t=5) is non-null -> 5.0
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, 1L, t(5), Some(5.0)),
      (2L, 1L, t(8), None) // NULL value must NOT fall back to 5.0
    ).toDF("rid", "user_id", "ts", "value")
    val out = AsOfJoin.asofBackward(left, right, Seq("user_id"), "ts", "ts",
        Seq("value"), tieCol = Some("rid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out == Map(100L -> None, 101L -> Some(5.0)))
  }

  test("groupbyNodes axis=source yields one subframe per source group") {
    // simpleNf: A,D red; B,C blue; edges A->B, A->C, B->C, C->D
    val g = simpleNf.groupbyNodes(Seq("color"), "source")
    assert(g.nGroups() == 2L)
    val m = LocalExports.groupFramesAxis(g).toSeq
      .map { case (k, f) => k -> f.edges.select("source", "target")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet }.toMap
    // red sources: A->B, A->C (D has no out-edges); blue sources: B->C, C->D
    assert(m("red") == Set(("A", "B"), ("A", "C")))
    assert(m("blue") == Set(("B", "C"), ("C", "D")))
  }

  test("groupbyNodes axis=target yields one subframe per target group") {
    val g = simpleNf.groupbyNodes(Seq("color"), "target")
    val m = LocalExports.groupFramesAxis(g).toSeq
      .map { case (k, f) => k -> f.edges.select("source", "target")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet }.toMap
    // blue targets: A->B, A->C, B->C; red targets: C->D
    assert(m("blue") == Set(("A", "B"), ("A", "C"), ("B", "C")))
    assert(m("red") == Set(("C", "D")))
    // reference parity: edge aggregation refuses non-"both" axes
    intercept[IllegalArgumentException] { g.sizeEdges() }
  }

  test("groupbyNodes with list-valued by iterates composite group keys") {
    import spark.implicits._
    val nodes = Seq(("A", "red", 1L), ("B", "red", 1L), ("C", "blue", 1L),
      ("D", "red", 2L)).toDF("id", "color", "size")
    val edges = Seq(("A", "B", 1L), ("A", "C", 2L), ("C", "D", 3L))
      .toDF("source", "target", "weight")
    val g = NetworkFrame(nodes, edges).groupbyNodes(Seq("color", "size"), "both")
    assert(g.nGroups() == 9L && g.nGroups(induced = true) == 3L)
    val m = LocalExports.groupFrames(g).toSeq
      .map { case (k, f) => k -> f.numEdges }.toMap
    assert(m((Seq("red", 1L), Seq("red", 1L))) == 1L)   // A->B
    assert(m((Seq("red", 1L), Seq("blue", 1L))) == 1L)  // A->C
    assert(m((Seq("blue", 1L), Seq("red", 2L))) == 1L)  // C->D
    assert(m((Seq("red", 2L), Seq("red", 1L))) == 0L)
    // reference parity: list-valued by refuses edge aggregation
    intercept[IllegalArgumentException] { g.applyEdges("size") }
  }

  test("capPerGroup plans a map-side WindowGroupLimit below the exchange") {
    import graft.functions.Sampling
    val df = (1L to 100L).map(i => (i, s"g${i % 5}")).toDF("id", "grp")
    val plan = Sampling.capPerGroup(df, "id", "grp", 3)
      .queryExecution.executedPlan.toString
    // the claimed scale property: only k rows per group survive each
    // partition before the shuffle — red if Spark stops planning it
    assert(plan.contains("WindowGroupLimit"))
    assert(plan.contains("Partial"), s"expected a partial (map-side) group limit:\n$plan")
  }

  test("tfidfTopTerms plans a WindowGroupLimit for the per-doc top-k") {
    import graft.functions.TextAnalysis
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val plan = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"))
  }

  test("condenseMulti quotients by composite node keys") {
    import spark.implicits._
    val nodes = Seq(("A", "red", 1L), ("B", "red", 1L), ("C", "blue", 1L),
      ("D", "red", 2L)).toDF("id", "color", "size")
    val edges = Seq(("A", "B", 10L), ("A", "C", 20L), ("C", "D", 30L))
      .toDF("source", "target", "weight")
    val q = NetworkFrame(nodes, edges)
      .condenseMulti(Seq("color", "size"), "sum", "w", Some("weight"))
    assert(q.nodes.count() == 3L)
    val m = q.edges.collect().map { r =>
      val s = r.getStruct(0); val t = r.getStruct(1)
      ((s.getString(0), s.getLong(1)), (t.getString(0), t.getLong(1))) -> r.getLong(2)
    }.toMap
    assert(m((("red", 1L), ("red", 1L))) == 10L)   // A->B
    assert(m((("red", 1L), ("blue", 1L))) == 20L)  // A->C
    assert(m((("blue", 1L), ("red", 2L))) == 30L)  // C->D
  }

  test("redactPatterns PII preset scrubs emails, IPs, and phone numbers") {
    import graft.functions.TextAnalysis
    val docs = Seq(
      (1L, "contact bob.smith+x@example.co.uk or call +1 (555) 123-4567 now"),
      (2L, "server at 192.168.1.254 responded"),
      (3L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = TextAnalysis.redactPatterns(docs, "text")
      .select("doc_id", "n_email", "n_ipv4", "n_phone", "redacted")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(1L) == ((1L, 0L, 1L, "contact <EMAIL> or call <PHONE> now")))
    assert(out(2L) == ((0L, 1L, 0L, "server at <IP> responded")))
    assert(out(3L) == ((0L, 0L, 0L, "nothing sensitive here")))
  }

  test("int8Quantize round-trips within scale/127 and pins extremes to ±127") {
    import graft.functions.Similarity
    val emb = Seq(
      (1L, Array(1.0f, -1.0f, 0.5f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))) // zero vector: scale 0, all codes 0
      .toDF("vec_id", "embedding")
    val out = Similarity.int8Quantize(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getSeq[Int](3), r.getLong(5)))).toMap
    val (scale1, codes1, err1) = out(1L)
    assert(scale1 == 10000000L)
    assert(codes1 == Seq(127, -127, 63, 0)) // 0.5 -> 63 (trunc toward zero)
    assert(err1 <= scale1 / 127 + 1)
    assert(out(2L) == ((0L, Seq(0, 0, 0, 0), 0L)))
  }

  test("bfsDistances stamps the first-discovery round as hop distance") {
    // simpleNf undirected: A-B, A-C, B-C, C-D
    val out = GraphAlgorithms.bfsDistances(simpleNf, "A", 5, directed = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("A" -> 0L, "B" -> 1L, "C" -> 1L, "D" -> 2L))
    // directed from D: nothing reachable but the seed
    val d = GraphAlgorithms.bfsDistances(simpleNf, "D", 5, directed = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == Map("D" -> 0L))
  }

  test("intervalJoin bounds are inclusive and per-user") {
    import graft.streaming.EventStream
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, t(600), 1L, "click", 0.0, "{}"),
      (2L, t(0), 1L, "view", 0.0, "{}"),    // exactly window start: kept
      (3L, t(600), 1L, "view", 0.0, "{}"),  // same instant as click: kept
      (4L, t(601), 1L, "view", 0.0, "{}"),  // after the click: dropped
      (5L, t(300), 2L, "view", 0.0, "{}"))  // other user: dropped
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = EventStream.intervalJoin(ev, "click", "view", "10 minutes")
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (1L, 3L)))
  }

  test("shortestPaths prefers a cheaper multi-hop route over a direct edge") {
    import spark.implicits._
    val nodes = Seq("A", "B", "C", "D").toDF("id")
    val edges = Seq(
      ("A", "B", 10.0), ("B", "C", 0.05), // A->B->C costs 10.05
      ("A", "C", 99.0),                   // direct is worse
      ("C", "D", 1.0)).toDF("source", "target", "weight")
    val out = GraphAlgorithms.shortestPaths(NetworkFrame(nodes, edges), "A",
        "weight", rounds = 4, directed = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // cent-quantized: 10.0 -> 1000, 0.05 -> 5 (floor of exact doubles)
    assert(out == Map("A" -> 0L, "B" -> 1000L, "C" -> 1005L, "D" -> 1105L))
    // undirected: D reaches back to A
    val u = GraphAlgorithms.shortestPaths(NetworkFrame(nodes, edges), "D",
        "weight", rounds = 4, directed = false)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(u("A") == 1105L)
  }

  test("ivfTopKProbe broadcasts the centroid table, no shuffle on it") {
    import graft.functions.Similarity
    val emb = (1L to 60L).map(i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d) % 13 - 6).toFloat), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.ivfTopKProbe(emb, "vec_id", "embedding", "label", 2, 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastNestedLoop"),
      s"centroid side should broadcast:\n$plan")
    // every query visits exactly nprobe cells
    val probes = out.select("query_id").distinct().count()
    assert(probes == 60L)
  }

  test("labelPropagation converges two cliques to two communities") {
    import spark.implicits._
    // two triangles {0,1,2} and {10,11,12} joined by one bridge 2-10
    val nodes = Seq(0L, 1L, 2L, 10L, 11L, 12L).toDF("id")
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L),
      (10L, 11L), (11L, 12L), (12L, 10L), (2L, 10L))
      .toDF("source", "target")
    val out = GraphAlgorithms.labelPropagation(
        NetworkFrame(nodes, edges), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each triangle agrees internally; min-label tie-break keeps them distinct
    assert(Set(out(0L), out(1L), out(2L)).size == 1)
    assert(Set(out(10L), out(11L), out(12L)).size == 1)
    assert(out(0L) != out(11L))
  }

  test("runningTotals carries flatMapGroupsWithState state across batches") {
    import graft.streaming.EventStream
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    val dir = java.nio.file.Files.createTempDirectory("graft_rt_stream").toString
    val b1 = Seq((1L, t(10), 7L, "click", 1.5, "{}"),
                 (2L, t(20), 7L, "view", 2.25, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    b1.coalesce(1).write.mode("append").parquet(dir)
    val src = spark.readStream.schema(b1.schema).parquet(dir)
    val q = EventStream.runningTotals(src)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_rt_spec").start()
    try {
      q.processAllAvailable()
      Seq((3L, t(30), 7L, "click", 0.25, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("graft_rt_spec")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // batch 2's event continues from the 375-cent state, not from zero
    assert(out == Map(1L -> 150L, 2L -> 375L, 3L -> 400L))
  }

  test("personalizedPageRank keeps mass near the seed, zero when unreachable") {
    // twoCompNf: directed cycle 0->1->2->0, pair 3->4, isolated 5
    // 40 iterations: the 3-cycle's rotation mode decays as 0.85^k, so the
    // stationary ordering (seed highest, decaying along the cycle) holds
    val out = GraphAlgorithms.personalizedPageRank(twoCompNf, 0L,
        iterations = 40, damping = 85)
      .select("id", "qs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) > out(1L) && out(1L) > out(2L)) // decay along the cycle
    assert(out(3L) == 0L && out(4L) == 0L && out(5L) == 0L) // unreachable
    // global pageRank by contrast gives every node its teleport floor
    val g = GraphAlgorithms.pageRank(twoCompNf, 10, 85)
      .select("id", "qs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g(5L) > 0L)
  }

  test("saltedJoin matches the plain join and salts the shuffle key") {
    import graft.operators.SkewJoin
    val edges = (1L to 300L).map(i => (i % 3, i)).toDF("id", "payload") // 3 hot keys
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", "tag")
    val salted = SkewJoin.saltedJoin(edges, dim, Seq("id"), 8, Seq("payload"))
    val plain = edges.join(dim, Seq("id"))
    assert(salted.count() == plain.count())
    assert(salted.groupBy("tag").count().collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap ==
      plain.groupBy("tag").count().collect().map(r =>
        r.getString(0) -> r.getLong(1)).toMap)
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"))
  }

  test("clusteringCoefficient golden values on the triangle+tail fixture") {
    // simpleNf: triangle A-B-C plus tail C-D
    val out = GraphAlgorithms.clusteringCoefficient(simpleNf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("A") == ((2L, 1L, 1000000L)))
    assert(out("B") == ((2L, 1L, 1000000L)))
    assert(out("C") == ((3L, 1L, 333333L))) // 2*1e6/(3*2), floor
    assert(out("D") == ((1L, 0L, 0L)))
  }

  test("randomWalks are fixed-length, stay on edges, and reproduce exactly") {
    val nf = twoCompNf // cycle 0-1-2, pair 3-4, isolated 5
    val w1 = GraphAlgorithms.randomWalks(nf, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(w1.size == 6 * 4) // 6 walks x (start + 3 steps)
    // isolated node never moves
    assert((0 to 3).forall(s => w1((5L, s)) == 5L))
    // every hop follows a symmetrized edge
    val edges = Set((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L))
    val sym = edges ++ edges.map(_.swap)
    for (w <- Seq(0L, 1L, 2L, 3L, 4L); s <- 1 to 3)
      assert(sym.contains((w1((w, s - 1)), w1((w, s)))),
        s"walk $w step $s: ${w1((w, s - 1))} -> ${w1((w, s))}")
    // pure function of the graph: a second run is identical
    val w2 = GraphAlgorithms.randomWalks(nf, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(w1 == w2)
  }

  test("cardinalitySketch is mergeable: sketch(A ∪ B) = max(sketch(A), sketch(B))") {
    import graft.functions.TextAnalysis
    val a = (1L to 400L).toDF("k")
    val b = (300L to 700L).toDF("k")
    def sk(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.cardinalitySketch(df, "k", 16)
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val (sa, sb) = (sk(a), sk(b))
    val merged = (sa.keySet ++ sb.keySet).map(k =>
      k -> math.max(sa.getOrElse(k, 0), sb.getOrElse(k, 0))).toMap
    assert(sk(a.union(b)) == merged)
  }

  test("pageRankWeighted sends mass along the heavy edge") {
    import spark.implicits._
    // hub 0 points at 1 (weight 9) and 2 (weight 1): 1 must outrank 2
    val nodes = Seq(0L, 1L, 2L).toDF("id")
    val edges = Seq((0L, 1L, 9.0), (0L, 2L, 1.0), (1L, 0L, 1.0), (2L, 0L, 1.0))
      .toDF("source", "target", "weight")
    val out = GraphAlgorithms.pageRankWeighted(NetworkFrame(nodes, edges),
        "weight", iterations = 20)
      .select("id", "qs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) > out(2L))
    // unweighted PageRank by contrast treats the two targets identically
    val u = GraphAlgorithms.pageRank(NetworkFrame(nodes, edges), 20)
      .select("id", "qs")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(u(1L) == u(2L))
  }

  test("estimateDiameter double-sweep is exact on a path graph") {
    import spark.implicits._
    val nodes = (0L to 4L).toDF("id")
    val edges = Seq((1L, 0L), (1L, 2L), (2L, 3L), (3L, 4L)) // path 0-1-2-3-4
      .toDF("source", "target")
    val r = GraphAlgorithms.estimateDiameter(NetworkFrame(nodes, edges), 10)
      .first()
    assert(r.getLong(0) == 0L)  // seed = min id
    assert(r.getLong(1) == 4L)  // farthest from 0
    assert(r.getLong(2) == 4L)  // true diameter of the path
  }

  test("strengths sums cent-quantized weights per direction") {
    val out = simpleNf.strengths("weight") // A->B 1, A->C 2, B->C 3, C->D 4
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("A") == ((300L, 0L, 300L)))
    assert(out("B") == ((300L, 100L, 400L)))
    assert(out("C") == ((400L, 500L, 900L)))
    assert(out("D") == ((0L, 400L, 400L)))
  }

  test("degreeAssortativity is -1 on a star graph") {
    import spark.implicits._
    val nodes = (0L to 5L).toDF("id")
    val edges = (1L to 5L).map(i => (0L, i)).toDF("source", "target")
    val r = GraphAlgorithms.degreeAssortativity(NetworkFrame(nodes, edges))
      .first()
    assert(r.getLong(0) == 10L) // 5 undirected edges, both directions
    assert(math.abs(r.getDouble(1) - (-1.0)) < 1e-9)
  }

  test("BMP decode returns positive height for top-down bitmaps") {
    import graft.multimodal.Multimodal
    // BM + BITMAPINFOHEADER(40), 320 x -240 (top-down row order), 24bpp
    val bmp = Array[Int](
      'B', 'M', 0, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0,
      0x40, 1, 0, 0,          // width 320 (LE)
      0x10, 0xff, 0xff, 0xff, // height -240 (LE, signed)
      1, 0, 24, 0, 0, 0).map(_.toByte)
    val ds = Seq(Multimodal.MediaRecord(1L, bmp, "image/bmp")).toDS()
    val out = Multimodal.decodeImages(ds).collect().head
    assert((out.width, out.height, out.channels) == ((320, 240, 3)))
  }
}
