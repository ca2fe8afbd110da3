package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parallelism-independence: the determinism discipline claims every query
  * result is bit-identical at any partitioning (DECIMAL/long accumulation,
  * quantize-before-aggregate, no order-sensitive float sums). These tests
  * actually vary the execution layout — shuffle partition count AND input
  * partitioning — and assert identical results, the local stand-in for
  * "local[32] equals a 1000-executor cluster".
  */
class DeterminismSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def collectCanon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }

  /** Run `f` under n shuffle partitions with the input exploded to `parts`
    * input partitions, restoring the session conf afterwards.
    */
  private def underLayout[T](shuffle: Int)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", shuffle.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  private val docs = Seq(
    (1L, "s1", "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "s1", "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "s1", "a completely different document with other words entirely here"),
    (4L, "s2", "pack my box with five dozen liquor jugs for the judge"),
    (5L, "s2", "sphinx of black quartz judge my vow said the judge"),
    (6L, "s2", "how vexingly quick daft zebras jump over lazy dogs")
  ).toDF("doc_id", "src", "text")

  test("minhash signatures and LSH pairs are layout-independent") {
    import graft.functions.Dedup
    def run(shuffle: Int, parts: Int) = underLayout(shuffle) {
      val d = docs.repartition(parts)
      (collectCanon(Dedup.minhashSignatures(d, "doc_id", "text", 16, 3)),
        collectCanon(Dedup.minhashLshPairs(d, "doc_id", "text", 16, 4)))
    }
    val a = run(2, 1)
    val b = run(13, 7)
    assert(a._1 == b._1 && a._2 == b._2)
    assert(a._1.nonEmpty && a._2.nonEmpty)
  }

  test("curation outputs are layout-independent") {
    import graft.functions.Curation
    def run(shuffle: Int, parts: Int) = underLayout(shuffle) {
      val d = docs.repartition(parts)
      (collectCanon(Curation.mixtureWeights(d, "src", "text")),
        collectCanon(Curation.importanceRatio(d, "doc_id", "text",
          col("src") === "s2", 16)),
        collectCanon(Curation.budgetSample(d, "doc_id", "src", "text", 20L)))
    }
    assert(run(3, 1) == run(11, 5))
  }

  test("quantized pagerank and component labels are layout-independent") {
    def nf(parts: Int) = {
      val nodes = (0L to 9L).map(i => Tuple1(i)).toDF("id").repartition(parts)
      val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L),
          (5L, 3L), (6L, 7L), (8L, 9L), (0L, 3L))
        .toDF("source", "target").repartition(parts)
      NetworkFrame(nodes, edges)
    }
    def run(shuffle: Int, parts: Int) = underLayout(shuffle) {
      val g = nf(parts)
      (collectCanon(GraphAlgorithms.pageRank(g, iterations = 5)),
        collectCanon(GraphAlgorithms.componentLabels(g)))
    }
    assert(run(2, 1) == run(13, 6))
  }

  test("integer-cosine near-dup pairs are layout-independent") {
    import graft.functions.Similarity
    val vecs = (1L to 12L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11 - 5).toFloat / 5f))
    }.toDF("vec_id", "embedding")
    def run(shuffle: Int, parts: Int) = underLayout(shuffle) {
      collectCanon(Similarity.cosineNearDupPairsExact(
        vecs.repartition(parts), "vec_id", "embedding", 0.3))
    }
    assert(run(2, 1) == run(9, 4))
  }

  test("round-9 operators are layout-independent") {
    import graft.functions.{Analytics, Curation, DataProfile, Similarity}
    val vecs = (1L to 24L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d * 3) % 11 - 5).toFloat / 5f))
    }.toDF("vec_id", "embedding")
    val pts = (0L until 60L).map(i => (i, (i * 37 % 41).toDouble, (i * 53 % 29).toInt))
      .toDF("id", "cost", "gain")
    def run(shuffle: Int, parts: Int) = underLayout(shuffle) {
      val d = docs.repartition(parts)
      val v = vecs.repartition(parts)
      val p = pts.repartition(parts)
      (collectCanon(Similarity.cellScopedNearDupPairs(v, "vec_id", "embedding", 0.3)),
        collectCanon(Analytics.paretoSkyline2D(p, "cost", "gain", bins = 4)),
        collectCanon(Curation.maxCoverageSelect(d, "doc_id", "text", k = 3)),
        collectCanon(DataProfile.chiSquaredAssociation(d, "src", "text")))
    }
    val a = run(2, 1)
    val b = run(13, 7)
    assert(a == b)
    assert(a._1.nonEmpty && a._2.nonEmpty && a._3.nonEmpty)
  }

  test("round-9 graph operators are layout-independent") {
    def nf(parts: Int) = {
      val nodes = (0L to 11L).map(i => Tuple1(i)).toDF("id").repartition(parts)
      val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L),
          (5L, 3L), (6L, 7L), (8L, 9L), (0L, 3L), (2L, 4L), (10L, 11L))
        .map { case (s, t) => (s, t, (s * 3 + t).toDouble) }
        .toDF("source", "target", "weight").repartition(parts)
      NetworkFrame(nodes, edges, directed = false)
    }
    def run(shuffle: Int, parts: Int) = underLayout(shuffle) {
      val g = nf(parts)
      (collectCanon(GraphAlgorithms.densestSubgraphTrace(g, rounds = 4)),
        collectCanon(GraphAlgorithms.coarsenByMatching(g, rounds = 4)),
        collectCanon(GraphAlgorithms.node2vecTransitions(g, hubCap = 4)))
    }
    assert(run(2, 1) == run(11, 5))
  }
}
