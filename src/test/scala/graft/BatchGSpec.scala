package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch G: spanning forest, eccentricity, blocked edit distance,
  * mutual-kNN graph, character diversity, group token cosine.
  */
class BatchGSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import graft.functions.{Dedup, Similarity, TextAnalysis}

  test("minimumSpanningForest finds the exact MST of a known graph") {
    // square 1-2-3-4 with diagonal: MST = the three cheapest non-cycle edges
    val nodes = (1L to 4L).map(Tuple1(_)).toDF("id")
    val edges = Seq(
      (1L, 2L, 1.00), (2L, 3L, 2.00), (3L, 4L, 3.00), (4L, 1L, 4.00),
      (1L, 3L, 5.00)).toDF("source", "target", "weight")
    val got = GraphAlgorithms.minimumSpanningForest(NetworkFrame(nodes, edges))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 100L), (2L, 3L, 200L), (3L, 4L, 300L)))
  }

  test("minimumSpanningForest spans a forest and matches Kruskal's weight") {
    // deterministic pseudo-random multigraph over 40 nodes, two components
    // (even/odd ids never connect)
    val raw = (1 to 300).map { i =>
      val u = (i * 17 % 40).toLong
      val v = (i * 31 % 40).toLong
      val (a, b) = (u - u % 2, v - v % 2) // even component
      val (c, d) = (u | 1L, v | 1L)       // odd component
      if (i % 2 == 0) (a, b, (i * 7 % 100) + 1.0)
      else (c, d, (i * 7 % 100) + 1.0)
    }
    val edges = raw.toDF("source", "target", "weight")
    val nodes = (0L until 40L).map(Tuple1(_)).toDF("id")
    val got = GraphAlgorithms.minimumSpanningForest(NetworkFrame(nodes, edges))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // in-test Kruskal with the same (wq, u, v) tie-break
    val canon = raw.filter { case (u, v, _) => u != v }
      .map { case (u, v, w) =>
        (math.min(u, v), math.max(u, v), math.floor(w * 100).toLong) }
      .groupBy(t => (t._1, t._2)).map { case ((u, v), es) =>
        (es.map(_._3).min, u, v) }.toSeq.sorted
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    var (totalK, nK) = (0L, 0)
    canon.foreach { case (wq, u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru) = rv; totalK += wq; nK += 1 }
    }
    assert(got.length == nK)
    assert(got.map(_._3).sum == totalK)
    // spanning forest: n_edges = n_touched_nodes - n_components(touched)
    val touched = canon.flatMap(e => Seq(e._2, e._3)).distinct
    val comps = touched.map(find).distinct.size
    assert(got.length == touched.size - comps)
  }

  test("eccentricities on a path graph are exact per seed") {
    // path 1-2-3-4-5: ecc(1)=4, ecc(2)=3, ecc(3)=2, all reach 5 nodes
    val nodes = (1L to 5L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("source", "target")
    val got = GraphAlgorithms.eccentricities(NetworkFrame(nodes, edges),
        k = 3, maxDepth = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (4L, 5L), 2L -> (3L, 5L), 3L -> (2L, 5L)))
  }

  test("editDistancePairs respects blocks and the distance cap") {
    val df = Seq(
      (1L, "kitten", "b1"), (2L, "sitten", "b1"), (3L, "kittens", "b1"),
      (4L, "kitten", "b2"), // same text, different block: never paired with 1
      (5L, "zebra", "b1")) // distance > cap inside b1
      .toDF("id", "name", "blk")
    val got = Dedup.editDistancePairs(df, "id", "name", col("blk"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L)))
  }

  test("mutualKnnGraph keeps only mutual top-k pairs") {
    // 1 and 2 nearly parallel; 3 orthogonal-ish; 4 far from everyone.
    // With k=1: 1<->2 mutual; 3's top-1 is 1 but 1's top-1 is 2 -> dropped.
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.1f)),
      (2L, Array(0.9f, 0.0f, 0.1f)),
      (3L, Array(0.1f, 1.0f, 0.4f)),
      (4L, Array(-1.0f, -0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.mutualKnnGraph(vecs, "vec_id", "embedding", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 2L)))
    // with k=3 every reciprocal pair appears, a < b, cos_q sane
    val all = Similarity.mutualKnnGraph(vecs, "vec_id", "embedding", 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(all.keySet.forall { case (a, b) => a < b })
    assert(all((1L, 2L)) > 990000L)
  }

  test("charDiversity is exact integer arithmetic") {
    val df = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.charDiversity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // inv Simpson: n^2 * 1e6 / sum(cnt^2)
    assert(got(1L) == (1L, 4L, 1000000L))  // 16e6/16
    assert(got(2L) == (2L, 4L, 2000000L))  // 16e6/8
    assert(got(3L) == (4L, 4L, 4000000L))  // 16e6/4
  }

  test("groupTokenCosine is 1e6 on identical token multisets") {
    val df = Seq(
      ("s1", "a b b c"), ("s2", "b a c b"), // same multiset
      ("s3", "x y z"))                      // disjoint from both
      .toDF("src", "text")
    val got = TextAnalysis.groupTokenCosine(df, "src", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got(("s1", "s2")) == 1000000L)
    assert(!got.contains(("s1", "s3")) && !got.contains(("s2", "s3")))
  }

  test("intervalUnion merges overlaps and counts islands") {
    import graft.operators.RangeJoin
    // user 1: [0,10] ∪ [5,20] ∪ [30,40] -> covered 30, 2 islands;
    // touching endpoints merge ([40,50] continues the second island);
    // user 2: single point-interval [7,7] -> covered 0, 1 island
    val iv = Seq(
      (1L, 1L, 0L, 10L), (1L, 2L, 5L, 20L), (1L, 3L, 30L, 40L),
      (1L, 4L, 40L, 50L), (2L, 5L, 7L, 7L))
      .toDF("user_id", "event_id", "s", "e")
    val got = RangeJoin.intervalUnion(iv, "user_id", "s", "e", "event_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == (40L, 2L)) // [0,20]=20 + [30,50]=20
    assert(got(2L) == (0L, 1L))
  }

  test("cmsProfile estimates dominate true counts and are exact sans collisions") {
    val df = Seq((1L, "a a a b"), (2L, "a b c")).toDF("id", "text")
    val got = TextAnalysis.cmsProfile(df, "text", d = 4, w = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set("a", "b", "c"))
    got.values.foreach { case (t, e) => assert(e >= t) }
    // 3 tokens in 4x64 cells: min over 4 rows collides with prob ~(3/64)^4
    assert(got("a") == (4L, 4L) && got("b") == (2L, 2L) && got("c") == (1L, 1L))
  }

  test("temporalReachability honors time ordering on paths") {
    // 1 -t=5-> 2 -t=3-> 3: static reach would include 3, but the only
    // 2->3 edge departs BEFORE arrival at 2, so 3 is unreachable from 1.
    // 1 -t=1-> 4 -t=2-> 5 is a valid nondecreasing path.
    val edges = Seq(
      (1L, 2L, 5L), (2L, 3L, 3L), (1L, 4L, 1L), (4L, 5L, 2L))
      .toDF("source", "target", "t")
    val seeds = Seq(1L).map(Tuple1(_)).toDF("id")
    val got = GraphAlgorithms.temporalReachability(edges, seeds)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(1L -> -1L, 2L -> 5L, 4L -> 1L, 5L -> 2L))
  }

  test("zorderKey interleaves bits (Morton curve)") {
    val df = Seq((3L, 5L), (0L, 0L), (7L, 0L), (0L, 7L)).toDF("x", "y")
    val got = df.select(Storage.zorderKey(col("x"), col("y"), 3).as("z"))
      .collect().map(_.getLong(0))
    // z(3,5) = interleave(011, 101) = 100111 = 39; z(7,0)=010101=21;
    // z(0,7)=101010=42
    assert(got.toSeq == Seq(39L, 0L, 21L, 42L))
  }
}
