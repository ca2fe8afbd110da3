package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 work: real ImageIO-derived image features, fixed-width SNM sort
  * keys, config-independent sketch overlap, bounded context stitching.
  */
class Round8Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("syntheticBmp is a real ImageIO-decodable image with closed-form stats") {
    import graft.multimodal.Multimodal
    // payload {10,20,30} cycling through BGR file bytes: every B sample is
    // 10, every G 20, every R 30 — the whole statistics vector is known
    val bmp = Multimodal.syntheticBmp(Array[Byte](10, 20, 30))
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(im != null, "JDK must decode the synthetic BMP")
    assert(im.getWidth == 8 && im.getHeight == 8 && im.getRaster.getNumBands == 3)
    val ds = Seq(Multimodal.MediaRecord(1L, bmp, "image/bmp")).toDS()
    val f = Multimodal.decodeImages(ds).collect().head
    assert((f.width, f.height, f.channels, f.byte_len) == ((8, 8, 3, 246L)))
    // band 0 is R (file byte i%3==2 -> payload 30), band 1 G, band 2 B
    assert(f.features.toSeq == Seq(
      (30.0 / 255).toFloat, (20.0 / 255).toFloat, (10.0 / 255).toFloat, 0f,
      (900.0 / 65025).toFloat, (400.0 / 65025).toFloat, (100.0 / 65025).toFloat, 0f))
  }

  test("decodeImages features are real raster stats for decodable payloads, stub otherwise") {
    import graft.multimodal.Multimodal
    import java.awt.image.BufferedImage
    // 2x1 RGB PNG: (255,0,0) and (0,0,255) -> means (.5,0,.5), m2 (.5,0,.5)
    val im = new BufferedImage(2, 1, BufferedImage.TYPE_3BYTE_BGR)
    im.setRGB(0, 0, 0xff0000)
    im.setRGB(1, 0, 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    val ds = Seq(
      Multimodal.MediaRecord(1L, bos.toByteArray, "image/png"),
      Multimodal.MediaRecord(2L, "not an image".getBytes("UTF-8"), "text/plain"))
      .toDS()
    val out = Multimodal.decodeImages(ds).collect().map(f => f.id -> f).toMap
    assert(out(1L).features.toSeq == Seq(0.5f, 0f, 0.5f, 0f, 0.5f, 0f, 0.5f, 0f))
    // undecodable payload keeps the deterministic byte-derived stub
    assert(out(2L).features.length == Multimodal.featureDim)
    assert(out(2L).width == 1 + ('n'.toInt % 64))
  }

  test("sortedNeighborhoodPairs fixed-width key preserves neighborhoods of near-equal texts") {
    // two near-identical long texts whose first 64 chars agree: the prefix
    // key must still rank them adjacent; the distant text sorts away
    val base = ("aaa bbb ccc ddd eee fff ggg hhh iii jjj " * 3).trim // 119 chars
    val docs = Seq(
      (1L, base + " tail one"),
      (2L, base + " tail two"),
      (3L, "zzz yyy xxx " * 10)).toDF("doc_id", "text")
    val rows = functions.Dedup
      .sortedNeighborhoodPairs(docs, "doc_id", "text", 1, 3, 0.5)
      .collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("id_a") == 1L && rows.head.getAs[Long]("id_b") == 2L)
    assert(rows.head.getAs[Double]("jaccard") > 0.5)
  }

  test("multiSourceBfsDistances: one table feeds all four centrality aggregates") {
    // path 1-2-3-4-5 plus isolate 9; seeds (k=2) = {1, 2}
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("source", "target")
    val nf = NetworkFrame(nodes, edges)
    val dist = GraphAlgorithms.multiSourceBfsDistances(nf, k = 2, maxDepth = 10)
    val dm = dist.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(dm((1L, 5L)) == 4L && dm((2L, 5L)) == 3L && dm((1L, 1L)) == 0L)
    assert(!dm.contains((1L, 9L)), "isolate unreached")
    // the aggregates over the shared frame match the all-in-one APIs
    val viaShared = GraphAlgorithms.harmonicFromDistances(nodes, dist)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = GraphAlgorithms.harmonicCentrality(nf, k = 2, maxDepth = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaShared == direct)
    val ecc = GraphAlgorithms.eccentricitiesFromDistances(dist)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ecc == Map(1L -> (4L, 5L), 2L -> (3L, 5L)))
    val vor = GraphAlgorithms.voronoiFromDistances(nodes, dist)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // ties go to the smaller seed; node 3 is 2 hops from seed 1, 1 from seed 2
    assert(vor(1L) == 1L && vor(2L) == 2L && vor(3L) == 2L && vor(9L) == -1L)
  }

  test("kHopPairs degreeCap: uncapped-equivalent at cap >= max degree, subset below") {
    // star: hub 0 — {1..6}, plus chain 1-7
    val nodes = (0L to 7L).toDF("id")
    val edges = ((1L to 6L).map(i => (0L, i)) :+ (1L, 7L)).toDF("source", "target")
    val nf = NetworkFrame(nodes, edges)
    def pairs(cap: Option[Int]) =
      GraphAlgorithms.kHopPairs(nf, 2, directed = false, dropSelf = true, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(None)
    assert(pairs(Some(100)) == exact, "cap above max degree must match exact output")
    val capped = pairs(Some(2))
    assert(capped.subsetOf(exact), "capped result is a subset of exact reachability")
    // hub kept only neighbors {1,2}: 0-3 (a direct edge's reverse 3->0 is
    // capped out of 3's adjacency? no — 3's own adjacency is just {0},
    // under cap 2 it survives) stays reachable 1-hop; but 3-4 (via hub)
    // requires hub adjacency to 4, which the cap dropped
    assert(capped.contains((3L, 0L)))
    assert(exact.contains((3L, 4L)) && !capped.contains((3L, 4L)))
  }

  test("runComponentsStream maintains labels across micro-batches == batch CC fixpoint") {
    import graft.streaming.EventStream
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_stream_spec").toString
    // 9 events, 3 users; everyNth=1 keeps all, targetMod=7 makes hub ids
    val ev = (0L until 9L).map(i => (i, 100L + i % 3)).toDF("event_id", "user_id")
    ev.coalesce(1).write.mode("overwrite").parquet(dir)
    val out = EventStream.runComponentsStream(spark, dir,
        chunks = 3, everyNth = 1, targetMod = 7, "cc_stream_spec")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch truth: same edge derivation, one weak-CC fixpoint
    val e = ev.select(col("user_id").as("source"),
      (col("event_id") % 7).as("target"))
    val n = e.select(col("source").as("id"))
      .union(e.select(col("target").as("id"))).distinct()
    val truth = GraphAlgorithms.componentLabels(NetworkFrame(n, e), "weak")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == truth, "incremental streaming labels must equal the batch fixpoint")
    assert(out.nonEmpty)
  }

  test("toLocalLil matches CSR content row for row") {
    val nodes = Seq(10L, 20L, 30L).toDF("id")
    val edges = Seq((10L, 20L, 1.5), (10L, 30L, 2.0), (30L, 10L, 4.0),
      (10L, 20L, 0.5)) // duplicate edge aggregates under sum
      .toDF("source", "target", "weight")
    val nf = NetworkFrame(nodes, edges)
    val (lil, n) = LocalExports.toLocalLil(nf, Some("weight"))
    assert(n == 3)
    assert(lil(0).toSeq == Seq((1L, 2.0), (2L, 2.0))) // 10->20 summed, 10->30
    assert(lil(1).isEmpty)
    assert(lil(2).toSeq == Seq((0L, 4.0)))
    // parity with the CSR export
    val (indptr, cols, vals, cn) = LocalExports.toLocalCsr(nf, Some("weight"))
    val fromCsr = (0 until cn).map(r =>
      (indptr(r) until indptr(r + 1)).map(i => (cols(i.toInt), vals(i.toInt))).toSeq)
    assert(lil.map(_.toSeq).toSeq == fromCsr)
  }

  test("runDriftStream: per-batch TV matches the batch lengthDrift arithmetic") {
    import graft.streaming.EventStream
    val dir = java.nio.file.Files.createTempDirectory("graft_drift_spec").toString
    // chunk 0 (ids 0,2): one short + one long doc; chunk 1 (ids 1,3): short
    // only — so chunk 1 must show positive drift vs the mixed corpus
    val docs = Seq(
      (0L, "a b"), (2L, Array.fill(40)("x").mkString(" ")),
      (1L, "c d"), (3L, "e f g")
    ).toDF("doc_id", "text")
    docs.coalesce(1).write.mode("overwrite").parquet(dir)
    val out = EventStream.runDriftStream(spark, dir, chunks = 2,
        binWidth = 32, maxBin = 15, "drift_spec")
      .collect().map(r => (r.getInt(0), r.getAs[Long]("n_docs"),
        r.getAs[Long]("tv_ppm"))).sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0, 1))
    assert(out.map(_._2).toSeq == Seq(2L, 2L))
    // corpus: bin0 3/4 (750000), bin1 1/4 (250000)
    // chunk0: bin0 1/2, bin1 1/2 -> |500000-750000|+|500000-250000| = 500000 -> tv 250000
    // chunk1: bin0 2/2, bin1 0   -> |1000000-750000|+|0-250000| = 500000 -> tv 250000
    assert(out.map(_._3).toSeq == Seq(250000L, 250000L))
  }

  test("sourceOverlapSketch reports 0 (not -1) common hashes under legacy sizeOfNull") {
    val prev = spark.conf.getOption("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try {
      val df = Seq(("a", "doc one"), ("b", "totally different")).toDF("src", "text")
      val r = functions.Dedup.sourceOverlapSketch(df, "src", "text", 4)
        .collect().head
      assert(r.getAs[Long]("n_common") == 0L, "disjoint pair must report 0, not -1")
      assert(r.getAs[Long]("est_overlap") == 0L)
    } finally {
      spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
      prev match {
        case Some(v) => spark.conf.set("spark.sql.ansi.enabled", v)
        case None => spark.conf.unset("spark.sql.ansi.enabled")
      }
    }
  }
}
