package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 batch: bipartite projection, modularity, CDC compaction,
  * sliding windows, anomaly z-scores, shingle TF-IDF cosine, PC1.
  */
class Round4BatchSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import graft.streaming.EventStream
  import graft.functions.{Similarity, TextAnalysis}

  test("bipartiteProject counts shared groups and caps mega-groups") {
    // groups: g1={1,2,3}, g2={1,2}, g3={2,3} -> pairs (1,2):2, (1,3):1, (2,3):2
    val m = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (30L, 2L), (30L, 3L), (30L, 3L)) // dup membership collapses
      .toDF("grp", "item")
    val got = GraphAlgorithms.bipartiteProject(m, "grp", "item",
        maxPerGroup = 20, minCount = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 2L) -> 2L, (2L, 3L) -> 2L))
    // cap: a group of 5 items with cap 3 keeps items 1,2,3 only -> the
    // (4,5) pair never appears even at minCount 1
    val big = (1L to 5L).map(i => (99L, i)).toDF("grp", "item")
    val capped = GraphAlgorithms.bipartiteProject(big, "grp", "item",
        maxPerGroup = 3, minCount = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("modularity matches the hand-computed two-triangle value") {
    // two triangles {1,2,3} and {4,5,6} bridged by 3-4: m=7, e_within=6,
    // degree sums per community 7 and 7 -> Q = 6/7 - 2*(7/14)^2 = 0.357142...
    val nodes = (1L to 6L).map(i => (i, (i - 1) / 3)).toDF("id", "community")
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("source", "target")
    val nf = NetworkFrame(nodes.select("id"), edges)
    val r = GraphAlgorithms.modularity(nf, nodes).collect().head
    assert(r.getLong(0) == 7L && r.getLong(1) == 6L && r.getLong(2) == 98L)
    assert(r.getLong(3) == 357142L) // floor(70e6 / 196)
  }

  test("modularity is NULL (not a crash) on an edgeless graph") {
    val nodes = Seq((1L, 0L), (2L, 1L)).toDF("id", "community")
    val nf = NetworkFrame(nodes.select("id"),
      Seq.empty[(Long, Long)].toDF("source", "target"))
    val r = GraphAlgorithms.modularity(nf, nodes).collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(3))
  }

  test("latestByKey takes ts desc then tie-breaks on event_id desc") {
    import java.sql.Timestamp
    val t1 = new Timestamp(1000L); val t2 = new Timestamp(2000L)
    val ev = Seq(
      (1L, t1, 7L, "a", 1.0), (2L, t2, 7L, "b", 2.0), (3L, t2, 7L, "c", 3.0),
      (9L, t1, 8L, "d", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventStream.latestByKey(ev, "user_id")
      .select("user_id", "event_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // user 7: ts tie at t2 between ids 2 and 3 -> id 3 wins
    assert(got == Map(7L -> 3L, 8L -> 9L))
  }

  test("slidingTypeCounts lands each event in duration/slide windows") {
    import java.sql.Timestamp
    // 05:45 -> windows starting 05:00 and 05:30 (1h windows, 30m slide)
    val ts = Timestamp.valueOf("2024-01-01 05:45:00")
    val ev = Seq((1L, ts, 7L, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventStream.slidingTypeCounts(ev, "1 hour", "30 minutes")
      .select("window_start").collect().map(_.getTimestamp(0).toString).sorted
    assert(got.toSeq == Seq("2024-01-01 05:00:00.0", "2024-01-01 05:30:00.0"))
  }

  test("hourlyAnomalies computes the exact quantized z-score") {
    import java.sql.Timestamp
    // type "a" hourly counts [1, 1, 1, 5]: mean 2, sample var 4, std 2 ->
    // z(5) = 1.5 -> z_q 15000; z(1) = -0.5 -> floor(-5000.0) = -5000
    val rows = Seq(0 -> 1, 1 -> 1, 2 -> 1, 3 -> 5).flatMap { case (h, n) =>
      (1 to n).map(k => (h * 100L + k,
        Timestamp.valueOf(f"2024-01-01 0$h%d:15:00"), 7L, "a", 1.0))
    }
    val ev = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val all = EventStream.hourlyAnomalies(ev, 0)
      .select("n_events", "z_q").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(all == Set(1L -> -5000L, 5L -> 15000L))
    // threshold keeps only the spike
    val hot = EventStream.hourlyAnomalies(ev, 10000).collect()
    assert(hot.length == 1 && hot.head.getAs[Long]("z_q") == 15000L)
  }

  test("tfidfCosinePairs finds identical docs at cos_q 1e6, skips disjoint") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.tfidfCosinePairs(docs, "doc_id", "text",
        dfCap = 10, thresholdQ = 1, ngram = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 2L) -> 1000000L))
  }

  test("associationLift computes exact quantized lift from capped supports") {
    // g1={1,2}, g2={1,2}, g3={1,3}, g4={3}: ng=4, cnt 1->3, 2->2, 3->2
    val m = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 3L),
      (4L, 3L)).toDF("grp", "item")
    val got = GraphAlgorithms.associationLift(m, "grp", "item",
        maxPerGroup = 10, minCount = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // lift(1,2) = 2*4/(3*2) = 1.3333 -> 1333333; lift(1,3) = 1*4/6 -> 666666
    assert(got == Map((1L, 2L) -> 1333333L, (1L, 3L) -> 666666L))
  }

  test("keepBestPerCluster keeps max quality, ties to the smallest id") {
    import graft.functions.Dedup
    val clusters = Seq((1L, 100L), (2L, 100L), (3L, 300L), (4L, 300L))
      .toDF("doc_id", "cluster_rep")
    val quality = Seq((1L, 5L), (2L, 9L), (3L, 7L), (4L, 7L))
      .toDF("doc_id", "n_tokens")
    val got = Dedup.keepBestPerCluster(clusters, "doc_id", quality, "n_tokens")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(100L -> ((2L, 2L, 9L)), 300L -> ((3L, 2L, 7L))))
  }

  test("rateLimit keeps the first k events per (key, hour) in event order") {
    import java.sql.Timestamp
    val h = "2024-01-01 05:%02d:00"
    val ev = Seq(
      (3L, Timestamp.valueOf(h.format(10)), 7L, "a", 1.0),
      (1L, Timestamp.valueOf(h.format(20)), 7L, "a", 1.0),
      (2L, Timestamp.valueOf(h.format(30)), 7L, "a", 1.0),
      (9L, Timestamp.valueOf("2024-01-01 06:05:00"), 7L, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val kept = EventStream.rateLimit(ev, "user_id", 2)
      .select("event_id").collect().map(_.getLong(0)).toSet
    // hour 05: first two by ts are ids 3 (05:10) and 1 (05:20); hour 06: id 9
    assert(kept == Set(3L, 1L, 9L))
  }

  test("cohortRetention counts returning users per day offset") {
    import java.sql.Timestamp
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "a", 1.0),
      (2L, Timestamp.valueOf("2024-01-03 01:00:00"), 1L, "a", 1.0),
      (3L, Timestamp.valueOf("2024-01-01 09:00:00"), 2L, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventStream.cohortRetention(ev)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(("2024-01-01", 0) -> 2L, ("2024-01-01", 2) -> 1L))
  }

  test("principalScores projects rows onto PC1 with saturated extremes") {
    val emb = Seq(
      (1L, Array(1.0f, 0.05f)), (2L, Array(-1.0f, -0.05f)),
      (3L, Array(0.5f, 0.02f)), (4L, Array(-0.5f, -0.02f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.principalScores(emb, "vec_id", "embedding", 2, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 500000L && got(2L) == -500000L, s"extremes saturate: $got")
    assert(got(3L) > 0L && got(3L) < 500000L, s"interior positive: $got")
    assert(got(4L) < 0L && got(4L) > -500000L, s"interior negative: $got")
  }

  test("runSlidingStream emits each finalized overlapping window once") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft_slide_").toString
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 05:45:00"), 7L, "a", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 06:20:00"), 7L, "a", 1.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 08:00:00"), 7L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val got = EventStream.runSlidingStream(spark, dir, "1 hour", "30 minutes",
        "10 minutes", s"slide_spec_${System.nanoTime()}")
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(2)).toMap
    // final watermark 07:50: the 05:00/05:30/06:00 windows finalize
    // (counts 1, 2, 1); 06:20's 06:30 window and both of 08:00's are open
    assert(got == Map(
      "2024-01-01 05:00:00.0" -> 1L,
      "2024-01-01 05:30:00.0" -> 2L,
      "2024-01-01 06:00:00.0" -> 1L), s"got $got")
  }

  test("pointInInterval honors [start, end) and bucket-spanning intervals") {
    import java.sql.Timestamp
    import graft.operators.RangeJoin
    val iv = Seq(
      (7L, Timestamp.valueOf("2024-01-01 10:00:00"), Timestamp.valueOf("2024-01-01 11:00:00")),
      (8L, Timestamp.valueOf("2024-01-01 10:00:00"), Timestamp.valueOf("2024-01-01 12:30:00")))
      .toDF("user_id", "t_start", "t_end")
    val pts = Seq(
      (7L, Timestamp.valueOf("2024-01-01 10:30:00")), // inside
      (7L, Timestamp.valueOf("2024-01-01 11:00:00")), // exclusive end: out
      (7L, Timestamp.valueOf("2024-01-01 09:59:59")), // before: out
      (9L, Timestamp.valueOf("2024-01-01 10:30:00")), // wrong key: out
      (8L, Timestamp.valueOf("2024-01-01 12:15:00"))) // 3rd bucket of a 2.5h span
      .toDF("user_id", "ts")
    val got = RangeJoin.pointInInterval(pts, "ts", iv, "t_start", "t_end",
        Seq("user_id"), 3600)
      .select("user_id", "p_ts").collect()
      .map(r => r.getLong(0) -> r.getTimestamp(1).toString).toSet
    assert(got == Set(7L -> "2024-01-01 10:30:00.0", 8L -> "2024-01-01 12:15:00.0"))
  }

  test("wlRefinement separates structure, keeps isomorphic nodes equal") {
    // path 1-2-3: endpoints agree, middle differs (degree splits in round 1)
    val path = NetworkFrame((1L to 3L).toDF("id"),
      Seq((1L, 2L), (2L, 3L)).toDF("source", "target"))
    val p = GraphAlgorithms.wlRefinement(path, 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(p(1L) == p(3L) && p(1L) != p(2L))
    // two disjoint triangles: all six nodes are 1-WL-equivalent
    val tri = NetworkFrame((1L to 6L).toDF("id"),
      Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
        .toDF("source", "target"))
    val t = GraphAlgorithms.wlRefinement(tri, 3)
      .collect().map(_.getString(1)).toSet
    assert(t.size == 1, s"vertex-transitive graph must collapse to one label: $t")
  }

  test("neighborSample bounds fanout and extends sampled frontiers only") {
    // star: hub 0 with 5 leaves; fanout (2, 1)
    val nf = NetworkFrame((0L to 5L).toDF("id"),
      (1L to 5L).map(i => (0L, i)).toDF("source", "target"))
    val seeds = Seq(0L).toDF("id")
    val rows = GraphAlgorithms.neighborSample(nf, seeds, Seq(2, 1))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val hop1 = rows.filter(_._2 == 1)
    assert(hop1.length == 2 && hop1.forall(_._3 == 0L), s"fanout cap: ${rows.toSeq}")
    val hop1Children = hop1.map(_._4).toSet
    val hop2 = rows.filter(_._2 == 2)
    // every hop-2 parent was sampled at hop 1 (leaves' only neighbor is 0)
    assert(hop2.nonEmpty && hop2.forall(r => hop1Children.contains(r._3)))
    // deterministic: a second run samples the identical tree
    val again = GraphAlgorithms.neighborSample(nf, seeds, Seq(2, 1))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(rows.sorted.toSeq == again.sorted.toSeq)
  }

  test("negativeSamples avoids real edges and self pairs, capped per source") {
    val nf = NetworkFrame((0L to 9L).toDF("id"),
      Seq((0L, 1L), (0L, 2L), (3L, 4L)).toDF("source", "target"))
    val neg = GraphAlgorithms.negativeSamples(nf, 8, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = Set((0L, 1L), (0L, 2L), (3L, 4L))
    assert(neg.nonEmpty)
    assert(neg.forall { case (s, t) => !edges.contains((s, t)) && s != t })
    assert(neg.groupBy(_._1).values.forall(_.length <= 3))
    assert(neg.map(_._1).toSet.subsetOf(Set(0L, 3L)))
  }

  test("ngramContainmentPairs scores subset duplication at 1e6") {
    import graft.functions.Dedup
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"),
      (2L, "w1 w2 w3 w4 w5 w6 w7"),
      (3L, "x1 x2 x3 x4"))
      .toDF("doc_id", "text")
    val got = Dedup.ngramContainmentPairs(docs, "doc_id", "text", 3, 500000, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // doc 1's 3 shingles all appear in doc 2 -> containment exactly 1.0
    assert(got == Map((1L, 2L) -> 1000000L))
  }

  test("transitivity is exact on triangle, path, and edgeless graphs") {
    val tri = NetworkFrame((1L to 3L).toDF("id"),
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("source", "target"))
    val t1 = GraphAlgorithms.transitivity(tri).collect().head
    assert(t1.getLong(0) == 1L && t1.getLong(1) == 3L && t1.getLong(2) == 1000000L)
    val path = NetworkFrame((1L to 3L).toDF("id"),
      Seq((1L, 2L), (2L, 3L)).toDF("source", "target"))
    val t2 = GraphAlgorithms.transitivity(path).collect().head
    assert(t2.getLong(0) == 0L && t2.getLong(1) == 1L && t2.getLong(2) == 0L)
    val empty = NetworkFrame((1L to 2L).toDF("id"),
      Seq.empty[(Long, Long)].toDF("source", "target"))
    assert(GraphAlgorithms.transitivity(empty).collect().head.isNullAt(2))
  }

  test("skipgramPairs counts co-occurrences within the window") {
    val walks = Seq((1L, 0, 10L), (1L, 1, 20L), (1L, 2, 30L), (1L, 3, 40L))
      .toDF("walk_id", "step", "node")
    val got = GraphAlgorithms.skipgramPairs(walks, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // within distance 2 on a 4-node walk: 10 with {20,30}, 20 with all,
    // 30 with all, 40 with {20,30} — symmetric, each pair once per side
    assert(got == Map(
      (10L, 20L) -> 1L, (10L, 30L) -> 1L, (20L, 10L) -> 1L, (20L, 30L) -> 1L,
      (20L, 40L) -> 1L, (30L, 10L) -> 1L, (30L, 20L) -> 1L, (30L, 40L) -> 1L,
      (40L, 20L) -> 1L, (40L, 30L) -> 1L))
  }

  test("rollingDailyCounts applies the trailing range frame exactly") {
    import java.sql.Timestamp
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 01:00:00"), 7L, "a", 1.0),
      (2L, Timestamp.valueOf("2024-01-07 01:00:00"), 7L, "a", 1.0),
      (3L, Timestamp.valueOf("2024-01-08 01:00:00"), 7L, "a", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventStream.rollingDailyCounts(ev, "user_id", 7)
      .collect().map(r => r.getDate(1).toString -> r.getLong(2)).toMap
    // Jan 7 still sees Jan 1 (6 days back); Jan 8 no longer does
    assert(got == Map("2024-01-01" -> 1L, "2024-01-07" -> 2L, "2024-01-08" -> 2L))
  }

  test("pqCodes picks per-subspace nearest codebook entries independently") {
    val emb = Seq(
      (1L, Array(1.0f, 1.0f, -1.0f, -1.0f), 0),
      (2L, Array(-1.0f, -1.0f, 1.0f, 1.0f), 1),
      (3L, Array(1.0f, 1.0f, 1.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.pqCodes(emb, "vec_id", "embedding", "label", 2, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    // vec 3's first half matches cell 0's codebook exactly, second half
    // its own cell's — codes mix across subspaces, the point of PQ
    assert(got((1L, 0L)) == 0 && got((1L, 1L)) == 0)
    assert(got((2L, 0L)) == 1 && got((2L, 1L)) == 1)
    assert(got((3L, 0L)) == 0 && got((3L, 1L)) == 1, s"got $got")
  }

  test("asofBackwardWithin nulls matches older than the tolerance") {
    import java.sql.Timestamp
    import graft.operators.AsOfJoin
    val clicks = Seq(
      (1L, 7L, Timestamp.valueOf("2024-01-01 01:40:00")), // purchase 70m ago
      (2L, 7L, Timestamp.valueOf("2024-01-01 01:00:00"))) // purchase 30m ago
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq((9L, 7L, Timestamp.valueOf("2024-01-01 00:30:00"), 5.0))
      .toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin.asofBackwardWithin(clicks, purchases, Seq("user_id"),
        "ts", "ts", Seq("value"), "1 HOUR", Some("event_id"))
      .select("event_id", "asof_value")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(1L -> None, 2L -> Some(5.0)), s"got $got")
  }

  test("weightedKCore peels below-threshold strength and cascades") {
    // triangle 1-2-3 (w=1.0 each) + pendant 4 on node 3 (w=0.5):
    // threshold 100 centq peels 4 (strength 50), triangle survives at 200
    val nf = NetworkFrame((1L to 4L).toDF("id"),
      Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0), (3L, 4L, 0.5))
        .toDF("source", "target", "weight"))
    val got = GraphAlgorithms.weightedKCore(nf, "weight", 100L, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 200L, 2L -> 200L, 3L -> 200L), s"got $got")
  }

  test("featureBins spans [min, max] with exact integer widths") {
    import graft.functions.Sampling
    val df = (0 to 9).map(i => Tuple1(i.toDouble)).toDF("v")
    val got = Sampling.featureBins(df, "v", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 9L).map(_ -> 1L).toMap, s"got $got")
    // negatives bin correctly (quantized range crosses zero)
    val neg = Seq(Tuple1(-1.0), Tuple1(1.0)).toDF("v")
    val nb = Sampling.featureBins(neg, "v", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nb == Map(0L -> 1L, 1L -> 1L), s"got $nb")
  }

  test("scd2History closes each interval with the next change") {
    import java.sql.Timestamp
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 01:00:00"), 7L, "a", 1.0),
      (2L, Timestamp.valueOf("2024-01-01 02:00:00"), 7L, "b", 2.0),
      (9L, Timestamp.valueOf("2024-01-01 03:00:00"), 8L, "c", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventStream.scd2History(ev, "user_id")
      .select("event_id", "effective_to", "is_current")
      .collect().map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)).map(_.toString), r.getBoolean(2)))).toMap
    assert(got(1L) == ((Some("2024-01-01 02:00:00.0"), false)))
    assert(got(2L) == ((None, true)))
    assert(got(9L) == ((None, true)))
  }

  test("principalComponent finds the dominant axis, quantized") {
    // spread along dim 1, slight correlated dim-2 noise: PC1 ~ dim 1
    val emb = Seq(
      (1L, Array(1.0f, 0.05f)), (2L, Array(-1.0f, -0.05f)),
      (3L, Array(0.5f, 0.02f)), (4L, Array(-0.5f, -0.02f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.principalComponent(emb, "vec_id", "embedding", 2, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 500000L, s"dominant dim should saturate: $got")
    assert(got(2L) > 0L && got(2L) < 100000L, s"minor dim small positive: $got")
  }
}
