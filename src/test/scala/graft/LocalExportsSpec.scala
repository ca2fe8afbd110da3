package graft

import org.scalatest.funsuite.AnyFunSuite

class LocalExportsSpec extends AnyFunSuite with SparkFixture {

  test("toLocalCsr round-trips the golden adjacency") {
    val (indptr, indices, values, n) = LocalExports.toLocalCsr(simpleNf, Some("weight"))
    assert(n == 4)
    // A->B(1), A->C(2), B->C(3), C->D(4); positions A=0 B=1 C=2 D=3
    assert(indptr.toSeq == Seq(0L, 2L, 3L, 4L, 4L))
    assert(indices.toSeq == Seq(1L, 2L, 2L, 3L))
    assert(values.toSeq == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("toTorchGeometricLocal: undirected concatenates reversed edges") {
    val (ei, feats) = LocalExports.toTorchGeometricLocal(simpleNf, directed = false)
    assert(ei(0).length == 8) // 4 edges + 4 reversed (networkframe.py:700-704)
    assert(feats.length == 4 && feats.head.length == 1) // 'size' is the only numeric col
  }

  test("toJsonLocal / fromJson round-trip") {
    val json = simpleNf.toJsonLocal()
    val back = LocalExports.fromJson(spark, json)
    assert(back.directed)
    assert(back.numNodes == 4L && back.numEdges == 4L)
    assert(back.validate().numNodes == 4L)
  }

  test("toNetworkxJson carries attributes") {
    val s = LocalExports.toNetworkxJson(simpleNf)
    assert(s.contains("\"links\":") && s.contains("\"color\":\"red\""))
  }

  test("connectedComponentFrames partitions the graph") {
    val frames = LocalExports.connectedComponentFrames(twoCompNf).toSeq
    assert(frames.map(_._1) == Seq(0L, 3L, 5L))
    assert(frames.map(_._2.numNodes) == Seq(3L, 2L, 1L))
    assert(frames.map(_._2.numEdges) == Seq(3L, 1L, 0L))
  }

  test("kHopDecomposition yields one ego frame per node") {
    val d = LocalExports.kHopDecomposition(simpleNf, 1).toMap
    assert(d.size == 4)
    assert(d("A").numNodes == 3L) // A,B,C at k=1 (test_networkframe.py:69-72)
  }

  test("groupFrames iterates the source x target group product") {
    val frames = LocalExports.groupFrames(simpleNf.groupbyNodes("color")).toSeq
    assert(frames.size == 4) // {blue,red} x {blue,red} (README.md:89-103)
    val m = frames.map { case (k, f) => k -> f.numEdges }.toMap
    assert(m(("red", "blue")) == 2L && m(("blue", "blue")) == 1L &&
      m(("blue", "red")) == 1L && m(("red", "red")) == 0L)
  }
}
