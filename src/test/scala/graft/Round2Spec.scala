package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Dedup, Similarity}

/** Round-2 behaviors: parameter binding collisions, frame equality,
  * conditional broadcast, df-capped Jaccard, LSH-gated near-dup.
  */
class Round2Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  // ------------------------------------------------------------ bindParams

  test("bindParams substitutes longest names first (@min vs @minbal)") {
    val bound = NetworkFrame.bindParams(
      "c_acctbal > @minbal AND c_size > @min",
      Map("min" -> 3, "minbal" -> 1000))
    assert(bound == "c_acctbal > 1000 AND c_size > 3")
  }

  test("queryNodes with colliding param prefixes filters correctly") {
    val nf = simpleNf.queryNodes("size > @s AND size < @sz", Map("s" -> 1, "sz" -> 4))
    assert(nf.nodes.select("id").as[String].collect().sorted.toSeq == Seq("B", "C"))
  }

  // ----------------------------------------------------------- frameEquals

  test("frameEquals ignores row order on both tables") {
    val a = simpleNf
    val b = a.copy(nodes = a.nodes.orderBy(desc("id")).repartition(3),
                   edges = a.edges.orderBy(desc("weight")).repartition(2))
    assert(a.frameEquals(b))
    assert(!a.frameNotEquals(b))
  }

  test("frameEquals detects a differing feature value") {
    val a = simpleNf
    val b = a.copy(nodes = a.nodes.withColumn("size",
      when(col("id") === "A", 99L).otherwise(col("size"))))
    assert(!a.frameEquals(b))
  }

  test("frameEquals is multiset-sensitive on duplicate edges") {
    val a = simpleNf
    val dup = a.edges.limit(1)
    val b = a.copy(edges = a.edges.union(dup))
    assert(!a.frameEquals(b)) // extra parallel edge differs (multigraph)
    assert(b.frameEquals(b.copy(edges = b.edges.orderBy("weight"))))
  }

  test("frameEquals requires identical column sets and directedness") {
    val a = simpleNf
    assert(!a.frameEquals(a.copy(nodes = a.nodes.drop("color"))))
    assert(!a.frameEquals(a.copy(directed = false)))
  }

  test("describe reports the reference repr shape") {
    assert(simpleNf.describe == "NetworkFrame(nodes=(4, 2), edges=(4, 3))")
  }

  // ------------------------------------------- conditional broadcast hint

  test("applyNodeFeatures broadcasts small node tables") {
    val plan = simpleNf.applyNodeFeatures(Seq("color"), "source")
      .edges.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("applyNodeFeatures omits the hint when broadcast is disabled") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val plan = simpleNf.applyNodeFeatures(Seq("color"), "source")
        .edges.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"))
    } finally spark.conf.set(key, prev)
  }

  // -------------------------------------------------- df-capped Jaccard

  test("ngramJaccardPairs maxDf drops stop-shingle-only pairs") {
    // "x y z" is shared by all four docs (df=4); "p q r" only by docs 1,2
    val docs = Seq(
      (1L, "p q r x y z"), (2L, "p q r x y z"),
      (3L, "x y z a b c"), (4L, "x y z d e f")).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, maxDf = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.size == 6) // every pair shares the stop shingles
    // only pairs sharing a rare shingle survive the cap
    assert(capped == Set((1L, 2L)))
    // surviving pair's jaccard is over the FILTERED sets: docs 1,2 share all
    // their rare shingles -> jaccard 1.0
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, maxDf = 3)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  // ---------------------------------------------- LSH-gated near-dup

  private def vecs = Seq(
    (1L, Array.fill(16)(1.0f)),
    (2L, Array.fill(16)(0.9f)),             // near-dup of 1 (cos = 1.0)
    (3L, Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)),
    (4L, Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f))
  ).toDF("vec_id", "embedding")

  test("cosineNearDupPairs finds identical-signed near-dups via LSH") {
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
        0.9, numBands = 4, bandBits = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (3L, 4L)))
  }

  test("LSH near-dup pairs are a subset of exact with identical sims") {
    val lsh = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
        0.4, numBands = 4, bandBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = Similarity.cosineNearDupPairsExact(vecs, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.keySet.subsetOf(exact.keySet))
    lsh.foreach { case (k, sim) => assert(exact(k) == sim) }
  }

  test("LSH near-dup plan contains no nested-loop join") {
    val plan = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
        0.4, numBands = 4, bandBits = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  // ------------------------------------------ pandas-orient dict round-trip

  test("toDictJson/fromDictJson round-trips every orient") {
    val nf = simpleNf
    for (orient <- Seq("records", "dict", "columns", "index")) {
      val json = LocalExports.toDictJson(nf, orient)
      val back = LocalExports.fromDictJson(spark, json, orient)
      assert(back.directed)
      assert(nf.frameEquals(back), s"orient=$orient round-trip differs")
    }
  }

  test("toDictJson columns orient keys node values by id") {
    val json = LocalExports.toDictJson(simpleNf, "columns")
    // color of node A is red, keyed by the id index
    assert(json.contains(""""color":{"A":"red""""))
  }

  // ----------------------------------------------------- near-dup clusters

  test("nearDupClusters groups LSH near-dups under the min-id representative") {
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog again and again"),
      (11L, "the quick brown fox jumps over the lazy dog again and again"),
      (12L, "the quick brown fox jumps over the lazy dog again and again"),
      (20L, "completely different text about spark catalyst plan optimization"),
      (30L, "a third unrelated document mentioning minhash banding buckets"))
      .toDF("doc_id", "text")
    val out = Dedup.nearDupClusters(docs, "doc_id", "text", 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 30L -> 30L))
  }

  // --------------------------------------------- bipartite sources/targets

  test("loc returns a non-induced frame with tracked source/target indexes") {
    val nf = simpleNf
    val rect = nf.loc(
      Seq("A", "B").toDF("id"), Seq("C", "D").toDF("id"))
    assert(rect.sources.as[String].collect().sorted.toSeq == Seq("A", "B"))
    assert(rect.targets.as[String].collect().sorted.toSeq == Seq("C", "D"))
    // sources intersect the node index: edges A->C, B->C, C->D survive loc;
    // sourceNodes carry metadata for the row index only
    assert(rect.sourceNodes.select("id", "color").collect().length == 2)
    // an induced frame reports the whole node index on both sides
    assert(nf.sources.count() == 4L && nf.targets.count() == 4L)
  }

  // --------------------------------------------------- positional codes

  test("positionsById assigns contiguous dense ranks in id order") {
    val nodes = Seq(50L, 10L, 30L, 20L, 40L).toDF("id").repartition(3)
    val pos = NetworkFrame.positionsById(nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pos == Map(10L -> 0L, 20L -> 1L, 30L -> 2L, 40L -> 3L, 50L -> 4L))
  }

  // ------------------------------------------- real image header decode

  test("decodeImages parses real PNG and BMP headers, stubs the rest") {
    import graft.multimodal.Multimodal
    // minimal PNG prefix: signature + IHDR with 640x480, bit depth 8, RGBA
    val png = Array[Int](
      0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 2, 0x80, // width 640 (BE)
      0, 0, 1, 0xe0, // height 480 (BE)
      8, 6, 0, 0, 0, 0).map(_.toByte)
    // minimal BMP prefix: BM + BITMAPINFOHEADER(40), 320x240, 24bpp
    val bmp = Array[Int](
      'B', 'M', 0, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0,
      0x40, 1, 0, 0, // width 320 (LE)
      0xf0, 0, 0, 0, // height 240 (LE)
      1, 0, 24, 0, 0, 0).map(_.toByte)
    // text that merely starts with "BM" must NOT parse as BMP
    val fake = "BMhello world this is not a bitmap at all".getBytes("UTF-8")
    val ds = Seq(
      Multimodal.MediaRecord(1L, png, "image/png"),
      Multimodal.MediaRecord(2L, bmp, "image/bmp"),
      Multimodal.MediaRecord(3L, fake, "text/plain")).toDS()
    val out = Multimodal.decodeImages(ds).collect().map(f => f.id -> f).toMap
    assert((out(1L).width, out(1L).height, out(1L).channels) == (640, 480, 4))
    assert((out(2L).width, out(2L).height, out(2L).channels) == (320, 240, 3))
    // stub path: width/height derived from leading bytes ('B'=66, 'M'=77)
    assert((out(3L).width, out(3L).height, out(3L).channels) == (3, 14, 3))
  }

  // --------------------------------------- append-mode streaming semantics

  test("append mode drops late rows beyond the watermark, emits finalized windows") {
    import graft.streaming.EventStream
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft_append_spec").toString
    val b1 = Seq(
      (Timestamp.valueOf("2024-01-01 01:30:00"), "a", 1L, 1.0),
      (Timestamp.valueOf("2024-01-01 12:30:00"), "b", 2L, 2.0))
      .toDF("ts", "event_type", "user_id", "value")
    b1.coalesce(1).write.mode("append").parquet(dir)
    val src = spark.readStream.schema(b1.schema).parquet(dir)
    val agg = EventStream.windowedTypeCounts(
      EventStream.withEventWatermark(src, "10 minutes"), "1 hour")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("graft_append_spec").start()
    try {
      q.processAllAvailable() // watermark after batch 1: 12:20
      // 01:45 is far behind the watermark -> DROPPED by the stateful agg;
      // 14:30 advances the watermark past window [12:00, 13:00)
      Seq((Timestamp.valueOf("2024-01-01 01:45:00"), "a", 3L, 5.0),
          (Timestamp.valueOf("2024-01-01 14:30:00"), "c", 4L, 1.0))
        .toDF("ts", "event_type", "user_id", "value")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("graft_append_spec")
      .select("event_type", "n_events").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // late row NOT counted (a -> 1, not 2); open window [14:00) NOT emitted
    assert(out == Map("a" -> 1L, "b" -> 1L))
  }
}
