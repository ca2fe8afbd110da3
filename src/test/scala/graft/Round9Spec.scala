package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 work: query-bank duplicate-name guard (round 8 shipped two dead
  * Map-key-shadowed definitions), fixed-size KMV sampling for the
  * self-similarity snapshot.
  */
class Round9Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("query bank has no duplicate names; all four rollup/cube variants are live") {
    // queries itself requires distinctness — calling it IS the guard; assert
    // the previously-shadowed definitions are now executable entries.
    val qs = SparkEntry.queries
    for (n <- Seq("q_rollup", "q_rollup_nodes", "q_cube", "q_cube_events"))
      assert(qs.contains(n), s"$n must be a live query")
    // every oracle key must point at a live query
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
  }

  test("syntheticPng is a real compressed PNG ImageIO decodes to the payload cycle") {
    import graft.multimodal.Multimodal
    val payload = Array[Byte](10, 20, 30)
    val png = Multimodal.syntheticPng(payload)
    // genuinely compressed: a zlib IDAT, not a stored BMP-style raster
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P')
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(im != null, "JDK must decode the synthetic PNG")
    assert(im.getWidth == 8 && im.getHeight == 8 && im.getRaster.getNumBands == 3)
    // sample j = payload(j % 3): R=10, G=20, B=30 everywhere
    val px = new Array[Int](3)
    im.getRaster.getPixel(3, 5, px)
    assert(px.toSeq == Seq(10, 20, 30))
    val stats = Multimodal.decodePixels(
      Seq(Multimodal.MediaRecord(1L, png, "image/png")).toDS()).collect().head
    assert(stats.decoded && stats.channels == 3)
    assert(stats.channel_mean.toSeq == Seq(
      (10.0 / 255).toFloat, (20.0 / 255).toFloat, (30.0 / 255).toFloat))
  }

  test("q_pipeline_e2e is a single pass over documents (scan fusion pinned)") {
    val df = SparkEntry.queries("q_pipeline_e2e")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    val census = Plans.scanCensus(plan)
    assert(census.getOrElse("documents.parquet", 0) == 1,
      s"pipeline must scan documents exactly once, census: $census\n$plan")
    // the quality gate must be fused against the scan: a Filter node whose
    // condition carries the gate threshold sits BELOW every shuffle (plan
    // toString prints top-down, so deeper nodes have LARGER offsets)
    val gateIdx = plan.indexOf("200000")
    val lastExchangeIdx = plan.lastIndexOf("Exchange")
    assert(gateIdx >= 0, "gate threshold must appear in the plan")
    assert(lastExchangeIdx < 0 || gateIdx > lastExchangeIdx,
      s"quality gate must filter below every shuffle\n$plan")
  }

  test("MultilayerNetworkFrame: single-layer view, flatten, and layered effective edges agree") {
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val edges = Seq(
      (1L, 2L, "a", 10L), (1L, 2L, "a", 5L), (1L, 2L, "b", 7L),
      (2L, 3L, "b", 2L), (3L, 1L, "a", 1L)
    ).toDF("source", "target", "layer", "w")
    val ml = MultilayerNetworkFrame(NetworkFrame(nodes, edges))
    // single-layer view is a pure edge filter
    assert(ml.layer("a").edges.count() == 3)
    // layered effective edges: (a,1,2)=15, (b,1,2)=7, (b,2,3)=2, (a,3,1)=1
    val eff = ml.effectiveEdgesByLayer(Some("w")).collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)), r.getLong(3))).toMap
    assert(eff == Map(("a", 1L, 2L) -> 15L, ("b", 1L, 2L) -> 7L,
      ("b", 2L, 3L) -> 2L, ("a", 3L, 1L) -> 1L))
    // flatten ignores layers: (1,2)=22
    val flat = ml.aggregateLayers(Some("w")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(flat((1L, 2L)) == 22L)
    // activity: node 1 active in both layers, node 3 in... a only? 3 is in
    // (2,3,b) as target and (3,1,a) as source -> both layers
    val act = ml.nodeActivity().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(act(1L) == 2L && act(2L) == 2L && act(3L) == 2L)
    // overlap: key (1,2) present in a and b -> one shared edge
    val ov = ml.layerOverlap().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ov == Map(("a", "b") -> 1L))
  }

  test("self-similarity sample is fixed-size (k smallest md5(doc_id)), not a fraction") {
    // 400 docs; the snapshot must consider at most 128 of them regardless of
    // corpus size, picked by the md5 order (deterministic across runs).
    val docs = (0L until 400L).map(i => (i, s"w$i x$i y$i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_selfsim").toString
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("q_self_similarity")(spark, dir).collect().head
    val nPairs = r.getAs[Long]("n_pairs")
    assert(nPairs == 128L * 127 / 2,
      s"pair space must be k*(k-1)/2 for k=128, got $nPairs")
  }
}
