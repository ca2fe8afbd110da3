package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{SemiStructured, TextAnalysis}
import graft.streaming.EventStream

/** Round-2 pipeline extensions: repetition metrics, TF-IDF top terms,
  * JSON extraction, streaming dedup, IVF-partitioned storage.
  */
class Round2PipelineSpec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("repetitionFeatures measures duplicate-ngram fraction") {
    val docs = Seq(
      (1L, "a b c a b c a b c"), // shingles: 7 total, 3 distinct
      (2L, "all distinct words here now"),
      (3L, "xx yy")) // too short for 3-grams -> excluded
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionFeatures(docs, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((7L, 3L, 4.0 / 7.0)))
    assert(out(2L) == ((3L, 3L, 0.0)))
    assert(!out.contains(3L))
  }

  test("tfidfTopTerms ranks rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common common unicorn"),
      (2L, "common word"),
      (3L, "common word thing"))
      .toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", 2)
      .filter(col("doc_id") === 1L).orderBy("rank")
      .select("token").as[String].collect().toSeq
    // unicorn: df=1 -> score 3e6; common: tf=2, df=3 -> 2e6: rarity wins
    assert(top == Seq("unicorn", "common"))
  }

  test("SemiStructured extracts typed JSON values and aggregates exactly") {
    val ev = Seq(
      ("a", """{"k": 5}"""), ("a", """{"k": 7}"""), ("b", """{"k": 100}"""),
      ("b", """{"nokey": 1}"""))
      .toDF("event_type", "props")
    val out = SemiStructured.propsAggByType(ev)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("a") == ((2L, 12L, 5L)))
    assert(out("b")._1 == 2L && out("b")._2 == 100L) // null k ignored by sum
    val ex = SemiStructured.withExtracted(ev, "props", Map("k" -> "$.k"))
    assert(ex.schema("k").dataType.typeName == "long")
  }

  test("streamingDedup keeps first row per key, bounded by watermark") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_stream").toString
    val b1 = Seq(
      (Timestamp.valueOf("2024-01-01 01:00:00"), "fp1", 1L),
      (Timestamp.valueOf("2024-01-01 01:01:00"), "fp2", 2L))
      .toDF("ts", "fp", "payload")
    b1.coalesce(1).write.mode("append").parquet(dir)
    val src = spark.readStream.schema(b1.schema).parquet(dir)
    val q = EventStream.streamingDedup(src, Seq("fp"), "10 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_dedup_stream").start()
    try {
      q.processAllAvailable()
      // duplicate fp1 within the watermark window -> dropped; fp3 is new
      Seq((Timestamp.valueOf("2024-01-01 01:02:00"), "fp1", 9L),
          (Timestamp.valueOf("2024-01-01 01:03:00"), "fp3", 3L))
        .toDF("ts", "fp", "payload")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("graft_dedup_stream")
      .select("fp", "payload").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("fp1" -> 1L, "fp2" -> 2L, "fp3" -> 3L))
  }

  test("simhashNearDupPairs finds identical docs at hamming 0, skips unrelated") {
    import graft.functions.Dedup
    val docs = Seq(
      (1L, "spark catalyst optimizes declarative plans"),
      (2L, "spark catalyst optimizes declarative plans"),
      (3L, "entirely unrelated words about cooking pasta recipes"))
      .toDF("doc_id", "text")
    val out = Dedup.simhashNearDupPairs(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(out.get((1L, 2L)).contains(0))
    assert(!out.contains((1L, 3L)) && !out.contains((2L, 3L)))
  }

  test("triangleCount finds the single triangle in the golden fixture") {
    // A-B, A-C, B-C close a triangle; C-D does not
    val out = GraphAlgorithms.triangleCount(simpleNf).first().getLong(0)
    assert(out == 1L)
  }

  test("ivfCentroids computes integer-exact per-cell means") {
    import graft.functions.Similarity
    val emb = Seq(
      (1L, Array(1.0f, -1.0f), 0), (2L, Array(0.5f, -0.5f), 0),
      (3L, Array(2.0f, 2.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.ivfCentroids(emb, "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out((0, 1)) == 7500000L)  // (1e7 + 5e6) div 2
    assert(out((0, 2)) == -7500000L) // truncation toward zero on negatives
    assert(out((1, 1)) == 20000000L && out((1, 2)) == 20000000L)
  }

  test("hash sampling is deterministic, salted, and split is exhaustive") {
    import graft.functions.Sampling
    val df = (1L to 1000L).toDF("id")
    val s1 = Sampling.sampleByHash(df, "id", 10).as[Long].collect().toSet
    val s2 = Sampling.sampleByHash(df, "id", 10).as[Long].collect().toSet
    assert(s1 == s2 && s1.nonEmpty && s1.size < 250) // stable, ~10%
    val salted = Sampling.sampleByHash(df, "id", 10, salt = "v2").as[Long].collect().toSet
    assert(salted != s1) // a salt re-draws the sample
    val split = Sampling.hashSplit(df, "id", Seq("train" -> 98, "val" -> 1, "test" -> 1))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split.values.sum == 1000L && split("train") > 900L)
    assert(split.keySet == Set("train", "val", "test"))
  }

  test("asofBackward matches latest preceding right row, ties right-first") {
    import graft.operators.AsOfJoin
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    val left = Seq(
      (100L, 1L, t(10)), // after r@5 -> 5.0
      (101L, 1L, t(20)), // tie with r@20 -> >= matches -> 20.0
      (102L, 1L, t(4)),  // before any right row -> null
      (103L, 2L, t(50))  // user with no right rows -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, 1L, t(5), 5.0),
      (2L, 1L, t(20), 19.0), // same (user, ts): greatest tie id wins
      (3L, 1L, t(20), 20.0)
    ).toDF("rid", "user_id", "ts", "value")
    val out = AsOfJoin.asofBackward(left, right, Seq("user_id"), "ts", "ts",
        Seq("value"), tieCol = Some("rid"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out == Map(100L -> Some(5.0), 101L -> Some(20.0),
      102L -> None, 103L -> None))
  }

  test("chunkTokens windows tokens by stride, short tail kept") {
    val docs = Seq((1L, "a b c d e f g"), (2L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(docs, "doc_id", "text", 3, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    assert(out == Map(
      (1L, 0L) -> "a b c", (1L, 2L) -> "c d e", (1L, 4L) -> "e f g",
      (1L, 6L) -> "g", (2L, 0L) -> "x"))
  }

  test("contaminatedIds flags exactly corpus docs sharing an n-gram") {
    import graft.functions.Dedup
    val bench = Seq((1L, "the quick brown fox jumps")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "lazy dog saw the quick brown fox run"), // shares 4-gram
      (11L, "quick brown cat sat still here"),       // no shared 4-gram
      (12L, "tiny")).toDF("doc_id", "text")
    val got = Dedup.contaminatedIds(corpus, bench, "doc_id", "text", 4)
      .as[Long].collect().toSet
    assert(got == Set(10L))
  }

  test("sampleStratified applies per-stratum rates") {
    import graft.functions.Sampling
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    val out = Sampling.sampleStratified(df, "id", "lang",
        Seq("en" -> 5), defaultPct = 50)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("en") < 150L && out("de") > 350L && out("de") < 650L)
    // subset property: stratified sample of a stratum == plain sample at its rate
    val en5 = Sampling.sampleByHash(df.filter($"lang" === "en"), "id", 5)
      .select("id").as[Long].collect().toSet
    val enStrat = Sampling.sampleStratified(df, "id", "lang", Seq("en" -> 5), 50)
      .filter($"lang" === "en").select("id").as[Long].collect().toSet
    assert(enStrat == en5)
  }

  test("capPerGroup keeps at most k stable rows per group") {
    import graft.functions.Sampling
    val df = (1L to 300L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val out = Sampling.capPerGroup(df, "id", "grp", 10)
    val byGrp = out.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp.values.toSet == Set(10L) && byGrp.size == 3)
    // stability: same rows kept on re-evaluation and under repartitioning
    val a = out.select("id").as[Long].collect().toSet
    val b = Sampling.capPerGroup(df.repartition(7), "id", "grp", 10)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    // a group smaller than k survives whole
    val small = Sampling.capPerGroup(df.filter($"id" <= 5), "id", "grp", 10)
    assert(small.count() == 5)
  }

  test("lengthQuantiles returns exact discrete percentiles") {
    val docs = Seq(
      (1L, "a", "s"), (2L, "a b", "s"), (3L, "a b c", "s"), (4L, "a b c d", "s"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.lengthQuantiles(docs, "source", "text").collect()(0)
    // ANSI percentile_disc over [1,2,3,4]: p50 = 2, p90 = 4
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("p50_tokens") == 2L)
    assert(r.getAs[Long]("p90_tokens") == 4L)
  }

  test("sessionize splits on gaps >= the session gap") {
    import java.sql.Timestamp
    val ev = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1L, 1.0),
      (Timestamp.valueOf("2024-01-01 10:20:00"), 1L, 2.0), // same session
      (Timestamp.valueOf("2024-01-01 11:00:00"), 1L, 4.0), // 40min gap -> new
      (Timestamp.valueOf("2024-01-01 10:00:00"), 2L, 8.0))
      .toDF("ts", "user_id", "value")
    val out = EventStream.sessionize(ev, "30 minutes")
      .orderBy("user_id", "t_start")
      .select("user_id", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, 2L, 3.0), (1L, 1L, 4.0), (2L, 1L, 8.0)))
  }

  test("cell-partitioned storage prunes to one partition on read") {
    val emb = Seq((1L, Array(1f, 2f), 0), (2L, Array(3f, 4f), 1), (3L, Array(5f, 6f), 1))
      .toDF("vec_id", "embedding", "label")
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/emb"
    Storage.writeCellPartitioned(emb, path, "label")
    val cell = Storage.readCell(spark, path, "label", 1)
    assert(cell.select("vec_id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
    val scan = cell.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("label"))
  }
}
