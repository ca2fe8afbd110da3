package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch K: core numbers, Louvain move round, changelog MERGE, TWAP,
  * IVF residual energy.
  */
class BatchKSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import graft.functions.Similarity
  import graft.streaming.EventStream

  test("coreNumbers assigns exact core levels on a known graph") {
    // triangle 1-2-3 (core 2), pendant 4-1 (core 1), isolated 5 (core 0)
    val nodes = (1L to 5L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
      .toDF("source", "target")
    val got = GraphAlgorithms.coreNumbers(NetworkFrame(nodes, edges), maxK = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("louvainMoveRound applies only downward moves on a down round") {
    // C4: every node's best move has gain 8 - 2*2 = 4 toward either
    // neighbor (tie -> smaller community id); the down constraint blocks
    // node 1 (both neighbors have larger ids) and sends 2, 3, 4 to 1
    val nodes = (1L to 4L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("source", "target")
    val g = NetworkFrame(nodes, edges)
    val singles = nodes.select(col("id"), col("id").as("community"))
    val got = GraphAlgorithms.louvainMoveRound(g, singles, down = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("louvainMoveRound keeps isolated nodes and respects given labels") {
    val nodes = (1L to 3L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 2L)).toDF("source", "target")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 99L)).toDF("id", "community")
    val got = GraphAlgorithms
      .louvainMoveRound(NetworkFrame(nodes, edges), labels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 and 2 already share a community (no positive gain to leave a
    // 2-clique for nothing); 3 is isolated and keeps its label
    assert(got == Map(1L -> 10L, 2L -> 10L, 3L -> 99L))
  }

  test("greedyColoring produces a proper coloring that covers small graphs") {
    // deterministic pseudo-random graph on 30 nodes
    val raw = (1 to 120).map(i => ((i * 13 % 30).toLong, (i * 23 % 30).toLong))
      .filter { case (u, v) => u != v }
    val nodes = (0L until 30L).map(Tuple1(_)).toDF("id")
    val edges = raw.toDF("source", "target")
    val colors = GraphAlgorithms
      .greedyColoring(NetworkFrame(nodes, edges), layers = 8, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // all colored (enough layers/rounds for a 30-node graph)
    assert(colors.values.forall(_ >= 1L))
    // proper: no edge connects two nodes of the same color
    raw.foreach { case (u, v) =>
      assert(colors(u) != colors(v), s"edge ($u,$v) monochromatic")
    }
  }

  test("louvainMoveRound iterated to fixpoint finds the two cliques") {
    // two triangles joined by one bridge edge: phase-1 Louvain should
    // settle with each triangle in a single community
    val nodes = (1L to 6L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L)).toDF("source", "target")
    val g = NetworkFrame(nodes, edges)
    var labs = nodes.select(col("id"), col("id").as("community"))
    for (r <- 1 to 4)
      labs = GraphAlgorithms.louvainMoveRound(g, labs, down = r % 2 == 1)
    val got = labs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(got(1L), got(2L), got(3L)).size == 1, s"triangle A split: $got")
    assert(Set(got(4L), got(5L), got(6L)).size == 1, s"triangle B split: $got")
    assert(got(1L) != got(4L), s"triangles merged: $got")
  }

  test("applyChangelog keeps last op per key and drops deletes") {
    val log = Seq(
      (1L, 1L, 100L, "I"), (1L, 2L, 200L, "U"),   // key 1: final U
      (2L, 3L, 100L, "I"), (2L, 4L, 200L, "D"),   // key 2: deleted
      (3L, 5L, 100L, "D"), (3L, 6L, 200L, "I"))   // key 3: re-inserted
      .toDF("k", "event_id", "ts", "op")
    val got = EventStream.applyChangelog(log, "k", "op", Seq("ts", "event_id"))
      .select("k", "event_id", "op")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 2L, "U"), (3L, 6L, "I")))
  }

  test("timeWeightedAverage integrates the step function exactly") {
    // user 1: value 1.00 for 30ns, then 3.00 for 10ns ->
    //   (100*30 + 300*10) / 40 = 150 cents
    // user 2: single event -> no gaps, omitted
    val events = Seq(
      (1L, 1L, 0L, 1.00), (1L, 2L, 30L, 3.00), (1L, 3L, 40L, 99.0),
      (2L, 4L, 0L, 5.00))
      .toDF("user_id", "event_id", "ts", "value")
    val got = EventStream.timeWeightedAverage(events, "user_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ((2L, 150L))))
  }

  test("timeWeightedAverage weighs sub-second gaps exactly (no interval rounding)") {
    // Timestamp column (not long nanos): value 1.00 holds 100ms, 9.00 holds
    // 900ms -> (100*0.1 + 900*0.9)/1.0 = 820 cents. A gap computed as
    // (ts - ts).cast(decimal) rounds each gap to whole seconds and would
    // give (100*0 + 900*1)/1 = 900 — the round-6 q_twap hash fail.
    val events = Seq(
      (1L, 1L, "2024-01-01 00:00:00.000", 1.00),
      (1L, 2L, "2024-01-01 00:00:00.100", 9.00),
      (1L, 3L, "2024-01-01 00:00:01.000", 50.0))
      .toDF("user_id", "event_id", "s", "value")
      .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
    val got = EventStream.timeWeightedAverage(events, "user_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ((2L, 820L))))
  }

  test("ivfResidualEnergy is zero iff members equal their centroid") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0),   // cell 0: identical vectors -> resid 0
      (2L, Array(1.0f, 0.0f), 0),
      (3L, Array(1.0f, 1.0f), 1),   // cell 1: spread -> positive resid
      (4L, Array(0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.ivfResidualEnergy(df, "embedding", "label")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0) == ((2L, 0L)))
    // cell 1 centroid = (5e6, 5e6); each vector is 5e6 off per dim:
    // resid per vector = 2 * (5e6)^2 = 5e13
    assert(got(1) == ((2L, 50000000000000L)))
  }
}
