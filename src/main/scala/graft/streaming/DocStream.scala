package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Streaming document-ingest operators: the continuous-crawl counterpart of
  * the batch curation stack. The design rule is that everything PER-DOCUMENT
  * is a stateless in-row expression (signatures, band buckets — zero
  * shuffles on the stream) and the only streaming state is the final
  * bounded aggregation, so the same plan runs unmodified as a 100 TB/day
  * continuous pipeline: corpus-side state lives in the warehouse as static
  * tables refreshed per microbatch, never in stream memory.
  */
object DocStream {

  /** Streaming near-dup admission — `Dedup.dedupAgainstCorpus` as a live
    * ingest gate: new documents arrive as a stream, the standing corpus
    * enters ONLY as its at-rest MinHash signature table (static side).
    * Per microbatch: in-row signatures ([[Dedup.minhashArray]] — a
    * stateless map, no shuffle), in-row band buckets, a stream-static
    * equi-join against the corpus bucket table for candidates, a second
    * stream-static join to the corpus signatures for verification, and ONE
    * streaming aggregation keyed (new_id, corpus_id).
    *
    * A pair colliding in several bands enters the verify join once per
    * colliding band — deliberately NOT deduplicated (streaming distinct is
    * unbounded state): each collision contributes a complete copy of the
    * numHashes agreement rows, and sum(agree)/count(*) is invariant under
    * whole-set duplication, so est_jaccard equals the batch value exactly
    * (k/numHashes in IEEE doubles both ways; spec-pinned batch==stream).
    *
    * Returns the drained memory-sink table: (new_id, corpus_id,
    * est_jaccard) for pairs at or above `minAgree`.
    */
  def runAdmissionStream(spark: SparkSession, parquetPath: String,
                         idCol: String, textCol: String,
                         batchFilter: Column, corpusSig: DataFrame,
                         numHashes: Int = 16, bands: Int = 4,
                         shingleLen: Int = 3, minAgree: Double = 0.5,
                         queryName: String = "admission_stream"): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val src = spark.readStream.schema(schema).parquet(stageDir(parquetPath))
      .filter(batchFilter)
    val sigged = src
      .select(col(idCol).as("new_id"),
        Dedup.minhashArray(col(textCol), numHashes, shingleLen).as("sig"))
      .filter(col("sig").isNotNull)
    val banded = sigged
      .select(col("new_id"), col("sig"),
        explode(Dedup.lshBandArray(col("sig"), numHashes, bands)).as("bb"))
      .select(col("new_id"), col("sig"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val corpusBuckets = Dedup
      .lshBucketsFromSignatures(corpusSig, numHashes, bands)
      .select(col("id").as("corpus_id"), col("band"), col("bucket"))
    // NO forced broadcast on the corpus side: at 100 TB the signature and
    // bucket tables are warehouse-sized — the stream-static equi-joins must
    // be free to shuffle on their compact keys ((band, bucket) and
    // corpus_id); Spark still broadcasts them when size stats allow
    // same self-pair exclusion as the batch gate (Dedup.dedupAgainstCorpus
    // filters x.id =!= y.id): a re-crawled doc whose id already exists in
    // the corpus must not admit against itself
    val cand = banded.join(corpusBuckets, Seq("band", "bucket"))
      .filter(col("new_id") =!= col("corpus_id"))
      .select(col("new_id"), col("corpus_id"), col("sig"))
    val agg = cand
      .join(corpusSig.select(col("id").as("corpus_id"), col("h"),
        col("minhash")), Seq("corpus_id"))
      .withColumn("agree",
        when(col("minhash") === element_at(col("sig"), col("h") + 1), 1L)
          .otherwise(0L))
      .groupBy("new_id", "corpus_id")
      .agg((sum(col("agree")).cast("double") /
        count(lit(1)).cast("double")).as("est_jaccard"))
      .filter(col("est_jaccard") >= minAgree)
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName(queryName).start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(queryName)
  }

  private def stageDir(parquetPath: String): String =
    EventStream.stageDir(parquetPath)
}
