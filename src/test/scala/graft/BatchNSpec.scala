package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch N: maximal matching, token keyness, column profiling. */
class BatchNSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import graft.functions.{DataProfile, TextAnalysis}

  test("maximalMatching produces a valid maximal matching") {
    val raw = (1 to 200).map(i => ((i * 13 % 40).toLong, (i * 29 % 40).toLong))
      .filter { case (u, v) => u != v }
    val nodes = (0L until 40L).map(Tuple1(_)).toDF("id")
    val edges = raw.toDF("source", "target")
    val rows = GraphAlgorithms
      .maximalMatching(NetworkFrame(nodes, edges), rounds = 8)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    val sym = raw.flatMap { case (u, v) => Seq((u, v), (v, u)) }.toSet
    // symmetry + edges only
    rows.foreach { case (id, p) =>
      p.foreach { q =>
        assert(rows(q) == Some(id), s"partner of $q is not $id")
        assert(sym.contains((id, q)), s"matched pair ($id,$q) is not an edge")
      }
    }
    // maximality: no edge joins two unmatched nodes
    sym.foreach { case (u, v) =>
      assert(rows(u).isDefined || rows(v).isDefined,
        s"edge ($u,$v) has both endpoints unmatched")
    }
  }

  test("groupTokenKeyness surfaces group-exclusive tokens with max lift") {
    // "alpha" only in group a, "beta" only in b, "common" everywhere;
    // with equal group sizes, exclusive tokens lift to ~2e6 ppm, shared
    // tokens to ~1e6 ppm
    val df = Seq(
      ("a", Seq.fill(60)("alpha").mkString(" ") + " " + Seq.fill(60)("common").mkString(" ")),
      ("b", Seq.fill(60)("beta").mkString(" ") + " " + Seq.fill(60)("common").mkString(" ")))
      .toDF("grp", "text")
    val got = TextAnalysis.groupTokenKeyness(df, "grp", "text", k = 2,
        minTokenTotal = 50)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val a1 = got.find(t => t._1 == "a" && t._2 == 1L).get
    assert(a1._3 == "alpha" && a1._4 == 2000000L, a1)
    val b1 = got.find(t => t._1 == "b" && t._2 == 1L).get
    assert(b1._3 == "beta" && b1._4 == 2000000L, b1)
    val a2 = got.find(t => t._1 == "a" && t._2 == 2L).get
    assert(a2._3 == "common" && a2._4 == 1000000L, a2)
  }

  test("louvainMoveRoundWeighted follows weight, not degree") {
    // node 3 has two light edges into {1,2}'s community and one heavy edge
    // to 4: weighted gain prefers 4 even though link count prefers {1,2}
    val nodes = (1L to 4L).map(Tuple1(_)).toDF("id")
    val edges = Seq(
      (1L, 2L, 100.0), (1L, 3L, 1.0), (2L, 3L, 1.0), (3L, 4L, 500.0))
      .toDF("source", "target", "weight")
    val g = NetworkFrame(nodes, edges)
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 7L), (4L, 6L))
      .toDF("id", "community")
    val got = GraphAlgorithms
      .louvainMoveRoundWeighted(g, labels, "weight", down = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) == 6L, s"node 3 should join 4's heavy community: $got")
  }

  test("vocabularyGrowth counts distinct tokens at each checkpoint") {
    val df = Seq(
      (1L, "a b"), (2L, "b c"), (3L, "c d e"), (4L, "a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabularyGrowth(df, "doc_id", "text",
        Seq(1L, 2L, 4L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 3L, 4L -> 5L))
  }

  test("topologicalLayers assigns Kahn levels and nulls cycles") {
    // DAG chain 1->2->3 plus cycle 10<->11
    val nodes = Seq(1L, 2L, 3L, 10L, 11L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 10L))
      .toDF("source", "target")
    val got = GraphAlgorithms
      .topologicalLayers(NetworkFrame(nodes, edges), rounds = 5)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 10L -> -1L, 11L -> -1L))
  }

  test("incrementalComponents equals a full recompute on the union graph") {
    // base: {1,2} and {3,4} and {5}; delta edge 2-3 merges the first two
    val nodes = (1L to 5L).map(Tuple1(_)).toDF("id")
    val base = Seq((1L, 2L), (3L, 4L)).toDF("source", "target")
    val labels = GraphAlgorithms
      .componentLabels(NetworkFrame(nodes, base), "weak")
    val delta = Seq((2L, 3L), (1L, 2L)).toDF("source", "target") // one merge + one no-op
    val inc = GraphAlgorithms.incrementalComponents(labels, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = GraphAlgorithms
      .componentLabels(NetworkFrame(nodes, base.union(delta)), "weak")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == full)
    assert(inc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 5L))
  }

  test("poissonBootstrap is deterministic with mean multiplicity near 1") {
    import graft.functions.Sampling
    val df = (1L to 2000L).map(i => (i, 10.0)).toDF("k", "v")
    val a = Sampling.poissonBootstrap(df, "k", "v", replicates = 5, salt = "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val b = Sampling.poissonBootstrap(df, "k", "v", replicates = 5, salt = "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq && a.length == 5)
    a.foreach { case (_, nEff, sumCents, meanPpm) =>
      // Poisson(1): E[n_eff] = 2000, sd ~ 45 -> 5 sigma band
      assert(math.abs(nEff - 2000L) < 250, s"n_eff $nEff implausible")
      assert(sumCents == nEff * 1000L)   // constant value -> exact relation
      assert(meanPpm == sumCents * 1000000L / nEff)
    }
    // replicates differ from each other (hash actually varies with b)
    assert(a.map(_._2).distinct.length > 1)
  }

  test("GraftExtensions injects both native expressions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)   // builders + ExpressionInfos construct
    // and the per-session registration path resolves both in SQL
    graft.functions.LongDot.register(spark)
    graft.functions.NfcNormalize.register(spark)
    val r = spark.sql(
      "SELECT graft_long_dot(array(2L, 3L), array(5L, 7L)) AS d, " +
        "graft_nfc('abc') AS n").collect().head
    assert(r.getLong(0) == 31L && r.getString(1) == "abc")
  }

  test("groupTokenKeyness plans its top-k as a map-side WindowGroupLimit") {
    val df = (1 to 60).map(i => (s"g${i % 3}", s"tok$i tok$i common"))
      .toDF("grp", "text")
    val plan = TextAnalysis.groupTokenKeyness(df, "grp", "text", 5, 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(600))
  }

  test("columnProfile reports nulls, distincts, and extrema per column") {
    val df = Seq(
      (Some(3L), "x"), (Some(1L), "y"), (None, "x"), (Some(3L), "z"))
      .toDF("num", "s")
    val got = DataProfile.columnProfile(df, Seq("num", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(got("num") == ((4L, 1L, 2L, "1", "3")))
    assert(got("s") == ((4L, 0L, 3L, "x", "z")))
  }
}
