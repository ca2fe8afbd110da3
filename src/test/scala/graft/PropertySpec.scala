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
}
