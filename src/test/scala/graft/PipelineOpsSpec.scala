package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Dedup, Similarity, TextAnalysis}
import graft.multimodal.Multimodal
import graft.streaming.EventStream

class PipelineOpsSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  private def docsDf = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the mat"), // exact dup of 1
    (3L, "der hund und die katze und der vogel"),
    (4L, "el gato y los perros y las casas"),
    (5L, "a completely different document about spark joins and shuffles")
  ).toDF("doc_id", "text")

  test("langId picks the argmax marker language") {
    val out = docsDf.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en" && out(3L) == "de" && out(4L) == "es" && out(5L) == "en")
  }

  test("token counts + bpe estimate") {
    val r = docsDf.filter(col("doc_id") === 1L)
      .select(TextAnalysis.tokenCount(col("text")), TextAnalysis.bpeTokenEstimate(col("text")))
      .first()
    assert(r.getInt(0) == 6)
    assert(r.getLong(1) == 6L) // all words <= 4 chars -> ceil(len/4)=1 each
  }

  test("qualityFeatures produces deterministic integer score") {
    val out = TextAnalysis.qualityFeatures(docsDf, "text")
    val r = out.filter(col("doc_id") === 1L).first()
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("quality_score") == 80L) // short (<10 tokens): -20; stopword + punct ratios OK
  }

  test("exact dedup keeps min doc_id per fingerprint") {
    val kept = Dedup.exactDedup(docsDf, "doc_id", "text").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L, 5L))
  }

  test("minhash LSH finds the exact duplicate pair") {
    val pairs = Dedup.minhashLshPairs(docsDf, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, j) => a == 1L && b == 2L && j == 1.0 })
  }

  test("simhash is equal for identical docs, different for unrelated ones") {
    val s = Dedup.simhash(docsDf, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s(1L) == s(2L))
    assert(s(1L) != s(5L))
  }

  test("ngram jaccard is 1.0 for identical docs") {
    val p = Dedup.ngramJaccardPairs(docsDf, "doc_id", "text", 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(p((1L, 2L)) == 1.0)
  }

  test("cosine similarity: identical vectors -> 1, orthogonal -> 0") {
    val vs = Seq((1L, Array(1f, 0f, 0f)), (2L, Array(1f, 0f, 0f)), (3L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val sims = Similarity.cosineNearDupPairs(vs, "vec_id", "embedding", -1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sims((1L, 2L)) == 1.0)
    assert(sims((1L, 3L)) == 0.0)
  }

  test("bruteForceTopK ranks by similarity, excludes self") {
    val vs = Seq((1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vs.filter(col("vec_id") === 1L), vs, "vec_id", "embedding", 2)
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank")))
    assert(top.toSeq == Seq((2L, 1), (3L, 2)))
  }

  test("signLshBucket: identical sign patterns share a bucket") {
    val vs = Seq((1L, Array.fill(8)(1f)), (2L, Array.fill(8)(0.5f)), (3L, Array.fill(8)(-1f)))
      .toDF("vec_id", "embedding")
    val b = vs.select(col("vec_id"), Similarity.signLshBucket(col("embedding"), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b(1L) == b(2L) && b(1L) == 255L && b(3L) == 0L)
  }

  test("multimodal decode stub: metadata from bytes, fixed feature dim") {
    val ds = Multimodal.fromText(spark, docsDf, "doc_id", "text")
    val out = Multimodal.decodeImages(ds).collect()
    assert(out.length == 5)
    assert(out.forall(_.features.length == Multimodal.featureDim))
    val d1 = out.find(_.id == 1L).get
    assert(d1.byte_len == 22L && d1.channels == 3)
    assert(d1.width == 1 + ('t'.toInt % 64))
  }

  test("sampleFrames fans out deterministic frame rows") {
    val ds = Multimodal.fromText(spark, docsDf.filter(col("doc_id") === 5L), "doc_id", "text")
    val frames = Multimodal.sampleFrames(ds, 8, 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(f => f.frame_index % 2 == 0 && f.frame_md5.length == 32))
  }

  test("streaming windowed agg equals the batch plan on the same data") {
    val path = "/root/testdata/sf0.001/events.parquet"
    val batch = EventStream.windowedTypeCounts(spark.read.parquet(path))
      .orderBy("window_start", "event_type").collect().toSeq
    val stream = EventStream.runStreamingOnce(spark, path, "1 hour", "spec_stream_out")
      .orderBy("window_start", "event_type").collect().toSeq
    assert(stream == batch)
  }
}
