package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Dedup, TextAnalysis}
import org.apache.spark.sql.graftext.CappedCheckpoint._

/** Scratch profiling main: stage-by-stage timings for the hot operators. */
object Profile {
  def t(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val sh = docs.select(col("doc_id").as("id"),
      explode(TextAnalysis.shingles(col("text"), 3)).as("shingle"))
    t("shingles explode")(sh.count())
    val hs = sh.select(col("id"), col("shingle"),
        explode(sequence(lit(0), lit(15))).as("h"))
      .select(col("id"), col("h"),
        md5(concat(col("h").cast("string"), lit(":"), col("shingle"))).as("v"))
    t("+hash explode")(hs.count())
    t("+groupBy min (full sig)")(hs.groupBy("id", "h").agg(min("v")).count())
    t("sig via Dedup")(Dedup.minhashSignatures(docs, "doc_id", "text").count())

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.select(col("vec_id").as("id"),
      graft.functions.Similarity.quantize(col("embedding")).as("qv"))
    t("quantize only")(q.count())
    val qc = q.withColumn("n2", graft.functions.Similarity.dotLong(col("qv"), col("qv")))
      .localCheckpointCapped()
    t("quantize+n2 checkpointed")(qc.count())
    val pairs = qc.select(col("id").as("id_a"), col("qv").as("va"), col("n2").as("na"))
      .join(qc.select(col("id").as("id_b"), col("qv").as("vb"), col("n2").as("nb")),
        col("id_a") < col("id_b"))
    t("pair join only")(pairs.count())
    val sims = pairs.withColumn("dot",
      graft.functions.Similarity.dotLong(col("va"), col("vb")))
    t("pair join + HOF dot")(sims.filter(col("dot") > 0).count())
    spark.stop()
  }
}
