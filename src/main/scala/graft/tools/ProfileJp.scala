package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CappedCheckpoint._
import graft.functions.{Dedup, TextAnalysis}

/** Stage-by-stage profile of jaccardPrefixPairs (round-5 bench outlier). */
object ProfileJp {
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
    val tau = 0.5

    val sh = docs.select(col("doc_id").as("id"),
        explode(TextAnalysis.shingles(col("text"), 3)).as("shingle"))
      .localCheckpointCapped()
    t("sh checkpoint")(sh.count())
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
    t("dfreq")(dfreq.count())
    val ranked = sh.join(dfreq, Seq("shingle"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("df", "shingle")))
    t("ranked window")(ranked.count())
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val prefix = ranked.join(sizes, Seq("id"))
      .filter(col("rk") <= col("sz") - ceil(lit(tau) * col("sz")) + 1)
      .select(col("id"), col("shingle"))
    t("prefix")(prefix.count())
    val prefixCk = prefix.localCheckpointCapped()
    t("prefix checkpoint")(prefixCk.count())
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    t("cand distinct (no ckpt)")(cand.count())
    val candCk = prefixCk.as("a").join(prefixCk.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    t("cand distinct (ckpt)")(candCk.count())
    val inter = candCk
      .join(sh.select(col("id").as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    t("verify inter (ckpt cand)")(inter.count())
    t("full operator")(Dedup.jaccardPrefixPairs(docs, "doc_id", "text", 3, 0.5).count())
    spark.stop()
  }
}
