package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator property tests over random small graphs (SURVEY §5.3).
  * Deterministic seeds (no scalatestplus bridge on the classpath): each
  * property is checked against `n` generated graphs.
  */
class PropertySpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def forAll(n: Int)(body: ((Seq[(Long, Long)], Seq[(Long, Long)])) => Unit): Unit =
    (1 to n).foreach { i =>
      body(genGraph(Gen.Parameters.default, Seed(i.toLong)).get)
    }

  private val genGraph: Gen[(Seq[(Long, Long)], Seq[(Long, Long)])] = for {
    n <- Gen.choose(2, 12)
    nEdges <- Gen.choose(0, 20)
    edges <- Gen.listOfN(nEdges, for {
      s <- Gen.choose(0L, n - 1L); t <- Gen.choose(0L, n - 1L)
    } yield (s, t))
  } yield ((0L until n.toLong).map(i => (i, i % 3)), edges)

  private def mk(g: (Seq[(Long, Long)], Seq[(Long, Long)])): NetworkFrame =
    NetworkFrame(g._1.toDF("id", "grp"), g._2.toDF("source", "target"))

  test("queryNodes induction invariant: edge endpoints are surviving nodes") {
    forAll(8) { g =>
      val sub = mk(g).queryNodes("grp <> 1")
      val ids = sub.nodes.select("id").as[Long].collect().toSet
      val ok = sub.edges.select("source", "target").as[(Long, Long)].collect()
        .forall { case (s, t) => ids(s) && ids(t) }
      assert(ok)
    }
  }

  test("components partition the node set and are edge-consistent") {
    forAll(8) { g =>
      val nf = mk(g)
      val labels = GraphAlgorithms.componentLabels(nf, "weak").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels.keySet == g._1.map(_._1).toSet) // every node labeled once
      // every edge joins nodes of the same component
      assert(g._2.forall { case (s, t) => labels(s) == labels(t) })
      // each component label is its own min member
      labels.groupBy(_._2).foreach { case (lbl, members) =>
        assert(members.keys.min == lbl)
      }
    }
  }

  test("condense('size') preserves total edge count") {
    forAll(8) { g =>
      val nf = mk(g)
      val total = nf.condense("grp", "size").edges.agg(sum("weight")).first()
      if (g._2.nonEmpty) assert(total.getLong(0) == g._2.size.toLong)
    }
  }

  test("k-hop neighborhoods are monotone in k") {
    forAll(5) { g =>
      val nf = mk(g)
      val sizes = (0 to 2).map(k =>
        GraphAlgorithms.kHopNeighborhood(nf, 0L, k, directed = false).numNodes)
      assert(sizes == sizes.sorted)
    }
  }

  test("bfsDistances agrees with kHopNeighborhood shells") {
    forAll(5) { g =>
      val nf = mk(g)
      val dist = GraphAlgorithms.bfsDistances(nf, 0L, 3, directed = false)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the <= k ball from the distance table equals the k-hop neighborhood
      (0 to 2).foreach { k =>
        val ball = dist.filter(_._2 <= k).keySet
        val hood = GraphAlgorithms.kHopNeighborhood(nf, 0L, k, directed = false)
          .nodes.select("id").as[Long].collect().toSet
        assert(ball == hood, s"k=$k ball=$ball hood=$hood")
      }
    }
  }

  test("shortestPaths: seed at 0, every distance witnessed by an edge relaxation") {
    forAll(5) { g =>
      val nf = mk(g).copy(edges =
        g._2.map { case (s, t) => (s, t, ((s * 7 + t * 3) % 10 + 1).toDouble) }
          .toDF("source", "target", "weight"))
      val d = GraphAlgorithms.shortestPaths(nf, 0L, "weight", rounds = 4,
          directed = false)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      if (d.contains(0L)) assert(d(0L) == 0L)
      // every non-seed distance is some predecessor's distance + edge weight
      val wq = g._2.flatMap { case (s, t) =>
        val w = ((s * 7 + t * 3) % 10 + 1) * 100
        Seq((s, t, w), (t, s, w))
      }.groupBy(e => (e._1, e._2)).map { case (k, es) => k -> es.map(_._3).min }
      d.filter(kv => kv._1 != 0L || kv._2 != 0L).foreach { case (v, dv) =>
        assert(wq.exists { case ((s, t), w) => t == v && d.get(s).exists(_ + w == dv) },
          s"unwitnessed distance $v -> $dv")
      }
    }
  }

  test("cardinalitySketch buckets only grow as rows are added") {
    (1 to 4).foreach { i =>
      import graft.functions.TextAnalysis
      val base = (1L to (i * 50L)).toDF("k")
      val more = (1L to (i * 50L + 77L)).toDF("k")
      def sk(df: org.apache.spark.sql.DataFrame) =
        TextAnalysis.cardinalitySketch(df, "k", 8)
          .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val (a, b) = (sk(base), sk(more))
      assert(a.forall { case (bucket, rho) => b.getOrElse(bucket, 0) >= rho })
    }
  }

  test("MIS on random graphs is always independent and maximal") {
    forAll(6) { g =>
      val nf = mk(g)
      val out = GraphAlgorithms.maximalIndependentSet(nf, rounds = 8)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val in = out.filter(_._2 == "in").keySet
      val adj = g._2.filter { case (s, t) => s != t }
        .flatMap { case (s, t) => Seq(s -> t, t -> s) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // independence: no two 'in' nodes adjacent
      assert(in.forall(v => adj.getOrElse(v, Set.empty).intersect(in).isEmpty))
      // maximality: every decided-'out' node has an 'in' neighbor
      assert(out.filter(_._2 == "out").keySet
        .forall(v => adj.getOrElse(v, Set.empty).intersect(in).nonEmpty))
    }
  }

  test("dyad census identities hold on random graphs") {
    forAll(6) { g =>
      val nf = mk(g)
      val r = GraphAlgorithms.dyadCensus(nf).collect()(0)
      val n = r.getLong(0); val m = r.getLong(1); val a = r.getLong(2)
      val nulls = r.getLong(3)
      assert(m >= 0 && a >= 0 && nulls >= 0)
      assert(m + a + nulls == n * (n - 1) / 2)
      // mutual pairs counted independently from the raw edge list
      val e = g._2.filter { case (s, t) => s != t }.toSet
      val mm = e.count { case (s, t) => s < t && e.contains((t, s)) }
      assert(m == mm)
    }
  }

  test("kTruss supports equal common-neighbor counts within the output") {
    forAll(5) { g =>
      val out = GraphAlgorithms.kTruss(mk(g), k = 3, rounds = 3)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      val kept = out.map(_._1).toSet
      val adj = kept.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      out.foreach { case ((s, t), sup) =>
        val cn = adj.getOrElse(s, Set.empty)
          .intersect(adj.getOrElse(t, Set.empty)).size
        // reported support is the triangle count in the final subgraph,
        // and a surviving 3-truss edge must close at least one
        assert(sup == cn.toLong && sup >= 1L)
      }
    }
  }

  test("transitivity stays within [0, 1e6] and agrees with the definition") {
    forAll(6) { g =>
      val r = GraphAlgorithms.transitivity(mk(g)).collect().head
      val (tri, wedges) = (r.getLong(0), r.getLong(1))
      if (wedges == 0) assert(r.isNullAt(2))
      else {
        val q = r.getLong(2)
        assert(q >= 0L && q <= 1000000L)
        assert(q == 3 * tri * 1000000L / wedges)
      }
    }
  }

  test("bipartiteProject equals the brute-force pair count when uncapped") {
    forAll(6) { g =>
      // membership = (grp-attr, node-id): nodes sharing a grp value pair up
      val memb = g._1.map(_.swap).toDF("grp", "item")
      val got = GraphAlgorithms.bipartiteProject(memb, "grp", "item",
          maxPerGroup = 100, minCount = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val byGrp = g._1.groupBy(_._2).view.mapValues(_.map(_._1).distinct.sorted)
      val want = byGrp.values.flatMap { items =>
        for (a <- items; b <- items if a < b) yield (a, b)
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(got == want, s"got $got want $want")
    }
  }

  test("modularity of the all-in-one partition is m/m - 1 = depends only on degrees") {
    forAll(6) { g =>
      val nf = mk(g)
      val one = nf.nodes.select(col("id"), lit(0L).as("community"))
      val r = GraphAlgorithms.modularity(nf, one).collect().head
      if (r.getLong(0) > 0) {
        // single community: e_within = m and sum_deg_sq = (2m)^2, so
        // Q = 1 - 1 = 0 exactly
        assert(r.getLong(1) == r.getLong(0))
        assert(r.getLong(3) == 0L, s"single-community Q must be 0: $r")
      }
    }
  }

  test("wlRefinement refines monotonically: label classes never merge") {
    forAll(5) { g =>
      val nf = mk(g)
      val l1 = GraphAlgorithms.wlRefinement(nf, 1).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val l2 = GraphAlgorithms.wlRefinement(nf, 2).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      // 1-WL refinement: same round-2 label => same round-1 label
      l2.keys.foreach { a =>
        l2.keys.foreach { b =>
          if (l2(a) == l2(b)) assert(l1(a) == l1(b),
            s"nodes $a,$b merged between rounds")
        }
      }
    }
  }

  test("negativeSamples never emits an existing edge or a self pair") {
    forAll(5) { g =>
      val nf = mk(g)
      if (g._2.nonEmpty) {
        val edges = g._2.toSet
        val neg = GraphAlgorithms.negativeSamples(nf, 6, 2)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(neg.forall { case (s, t) => !edges.contains((s, t)) && s != t })
      }
    }
  }

  test("saltedJoin equals the plain join on random graphs") {
    forAll(5) { g =>
      import graft.operators.SkewJoin
      val probe = g._2.zipWithIndex.map { case ((s, t), i) => (s, t, i.toLong) }
        .toDF("id", "other", "row")
      val build = g._1.toDF("id", "grp")
      if (g._2.nonEmpty) {
        val salted = SkewJoin.saltedJoin(probe, build, Seq("id"), 4, Seq("row"))
          .select("id", "other", "row", "grp")
          .collect().map(_.toSeq).toSet
        val plain = probe.join(build, Seq("id"))
          .select("id", "other", "row", "grp")
          .collect().map(_.toSeq).toSet
        assert(salted == plain)
      }
    }
  }
}
