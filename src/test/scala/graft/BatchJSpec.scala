package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch J: Katz centrality, weighted priority sampling, Bloom membership
  * sketches, n-gram novelty, NFC normalization, streaming window top-k.
  */
class BatchJSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._
  import graft.functions.{Dedup, NfcNormalize, Sampling, TextAnalysis}

  test("katzCentrality matches the hand-computed iterate on a path graph") {
    // 1 -> 2 -> 3, alpha = 1/2, base = 1e6, two iterations:
    // v0 = 1e6 everywhere
    // v1: 1 = 1e6; 2 = 1e6 + 1e6/2; 3 = 1e6 + 1e6/2
    // v2: 1 = 1e6; 2 = 1e6 + 1e6/2; 3 = 1e6 + (1e6 + 5e5)/2 = 1.75e6
    val nodes = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("source", "target")
    val got = GraphAlgorithms
      .katzCentrality(NetworkFrame(nodes, edges), iterations = 2,
        alphaNum = 1, alphaDen = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("qs"))).toMap
    assert(got == Map(1L -> 1000000L, 2L -> 1500000L, 3L -> 1750000L))
  }

  test("katzCentrality deduplicates parallel edges") {
    val nodes = Seq(1L, 2L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 2L)).toDF("source", "target")
    val got = GraphAlgorithms
      .katzCentrality(NetworkFrame(nodes, edges), iterations = 1,
        alphaNum = 1, alphaDen = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(r.fieldIndex("qs"))).toMap
    // one logical edge: 2 receives 1e6/2 once, not three times
    assert(got == Map(1L -> 1000000L, 2L -> 1500000L))
  }

  test("weightedSample is deterministic, size-k, and matches the priority formula") {
    val df = (1L to 200L).map(i => (i, (i % 7 + 1) * 10.0)).toDF("k", "w")
    val a = Sampling.weightedSample(df, "k", "w", 20, salt = "s")
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("priority"))))
    val b = Sampling.weightedSample(df, "k", "w", 20, salt = "s")
      .collect().map(r => (r.getLong(0), r.getLong(r.fieldIndex("priority"))))
    assert(a.toSeq == b.toSeq && a.length == 20)
    // replay the formula externally for each selected row
    val md = java.security.MessageDigest.getInstance("MD5")
    a.foreach { case (k, p) =>
      val hex = md.digest(s"s$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val h = java.lang.Long.parseLong(hex, 16)
      val wq = math.floor((k % 7 + 1) * 10.0 * 100).toLong
      assert(p == h * 10000 / wq, s"priority mismatch for key $k")
    }
    // priorities selected are globally minimal: max selected <= min excluded
    val all = (1L to 200L).map { k =>
      val hex = md.digest(s"s$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val h = java.lang.Long.parseLong(hex, 16)
      (k, h * 10000 / math.floor((k % 7 + 1) * 10.0 * 100).toLong)
    }
    val excluded = all.filterNot(t => a.map(_._1).contains(t._1))
    assert(a.map(_._2).max <= excluded.map(_._2).min)
  }

  test("bloomFilter has no false negatives and merges by bitwise OR") {
    val df = Seq(("a", "apple banana cherry"), ("a", "dates elderberry"),
      ("b", "fig grape")).toDF("src", "text")
    val bloom = TextAnalysis.bloomFilter(df, "src", "text", words = 4, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    def positions(tok: String): Seq[(Long, Int)] = (0 until 3).map { j =>
      val hex = md.digest(s"$j:$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val pos = java.lang.Long.parseLong(hex, 16) % 252
      (pos / 63, (pos % 63).toInt)
    }
    // membership: every inserted token's bits are set in its group
    for (tok <- Seq("apple", "banana", "cherry", "dates", "elderberry"))
      positions(tok).foreach { case (w, b) =>
        assert((bloom.getOrElse(("a", w), 0L) & (1L << b)) != 0L,
          s"missing bit for $tok")
      }
    // mergeability: filter over the union == OR of per-shard filters
    val shard1 = TextAnalysis.bloomFilter(
      df.filter(col("text").startsWith("apple")), "src", "text", 4, 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val shard2 = TextAnalysis.bloomFilter(
      df.filter(col("src") === "a" && !col("text").startsWith("apple")),
        "src", "text", 4, 3)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (shard1.keySet ++ shard2.keySet).map(k =>
      k -> (shard1.getOrElse(k, 0L) | shard2.getOrElse(k, 0L))).toMap
    val whole = bloom.filter(_._1._1 == "a")
    assert(merged == whole)
    // sign bit never set (63-bit words)
    bloom.values.foreach(v => assert(v >= 0L))
  }

  test("ngramNovelty separates shared from unique shingles") {
    val df = Seq(
      (1L, "a b c d"),   // shingles (n=3): "a b c", "b c d" — shared with doc 2
      (2L, "a b c d"),
      (3L, "x y z w"),   // unique shingles
      (4L, "q r")        // too short: 0 shingles
    ).toDF("doc_id", "text")
    val got = Dedup.ngramNovelty(df, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got(1L) == ((2L, 0L, 0L)))
    assert(got(2L) == ((2L, 0L, 0L)))
    assert(got(3L) == ((2L, 2L, 1000000L)))
    assert(got(4L) == ((0L, 0L, -1L)))
  }

  test("graft_nfc composes decomposed sequences and is idempotent") {
    NfcNormalize.register(spark)
    val nfd = "café"          // e + COMBINING ACUTE
    val nfc = "café"           // precomposed é
    val df = Seq(Tuple1(nfd)).toDF("t")
      .select(expr("graft_nfc(t)").as("n"))
    assert(df.collect().head.getString(0) == nfc)
    val df2 = Seq(Tuple1(nfc)).toDF("t")
      .select(expr("graft_nfc(graft_nfc(t))").as("n"))
    assert(df2.collect().head.getString(0) == nfc)
    // null-safe
    val df3 = Seq(Tuple1(null: String)).toDF("t")
      .select(expr("graft_nfc(t)").as("n"))
    assert(df3.collect().head.isNullAt(0))
  }

  test("topKPerWindow keeps k rows per window with deterministic ties") {
    val df = Seq(
      ("w1", "a", 5L), ("w1", "b", 5L), ("w1", "c", 3L), ("w1", "d", 1L),
      ("w2", "x", 2L))
      .toDF("window_start", "event_type", "n_events")
    val got = graft.streaming.EventStream.topKPerWindow(df, 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSet == Set(("w1", 1L, "a"), ("w1", 2L, "b"), ("w2", 1L, "x")))
  }
}
