package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Stage-by-stage profile of winnowFingerprints and kCore (round-5 solo
  * outliers). */
object ProfileW {
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

    val hs = docs.select(col("doc_id").as("id"),
        posexplode(TextAnalysis.allShingles(col("text"), 4)).as(Seq("pos", "kgram")))
      .select(col("id"), col("pos"),
        conv(substring(md5(col("kgram")), 1, 8), 16, 10).cast("long").as("hq"))
    t("posexplode+md5")(hs.count())
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("pos").rowsBetween(0, 3)
    val sel = hs.withColumn("cnt", count(lit(1)).over(win))
      .withColumn("sel", min(struct(col("hq"), col("pos"))).over(win))
    t("+2 window fns")(sel.count())
    val out = sel.filter(col("cnt") === 4)
      .select(col("id"), col("sel.pos").cast("long").as("pos"), col("sel.hq").as("fp"))
    t("+filter+project")(out.count())
    t("+distinct")(out.distinct().count())
    t("full operator")(TextAnalysis.winnowFingerprints(docs, "doc_id", "text", 4, 4).count())
    t("full op 2nd run")(TextAnalysis.winnowFingerprints(docs, "doc_id", "text", 4, 4).count())

    val g = {
      val c = spark.read.parquet(s"$dir/customer.parquet")
      val n = c.count()
      val nodes = c.select(col("c_custkey").as("id"))
      val edges = spark.read.parquet(s"$dir/orders.parquet").select(
        col("o_custkey").as("source"),
        (col("o_orderkey") % n).as("target"),
        col("o_orderkey").as("edge_id"))
        .filter(col("edge_id") % 10 === 0)
      graft.NetworkFrame(nodes, edges)
    }
    t("kCore full")(graft.GraphAlgorithms.kCore(g, 3, rounds = 8).count())
    spark.stop()
  }
}
