package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CappedCheckpoint._

/** Stage-by-stage wall-time breakdown of the max-coverage greedy loop —
  * diagnostic main for the q_max_coverage 10x investigation.
  * Usage: sbt "runMain graft.tools.ProfileMc [sfDir]"
  */
object ProfileMc {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[mc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (run <- 1 to 2) {
      System.err.println(s"[mc] ===== run $run =====")
      val postings = t("postings build+checkpoint") {
        docs.select(col("doc_id").cast("long").as("id"),
            explode(graft.functions.TextAnalysis.shingles(col("text"), 3)).as("tok"))
          .filter(length(col("tok")) > 0)
          .distinct().localCheckpointCapped()
      }
      t("postings count")(System.err.println(s"[mc] rows=${postings.count()}"))
      var covered: org.apache.spark.sql.DataFrame = null
      for (p <- 1 to 5) {
        val remaining =
          if (covered == null) postings
          else postings.join(broadcast(covered), Seq("tok"), "left_anti")
        val top = t(s"round $p argmax") {
          remaining.groupBy("id").agg(count(lit(1)).as("gain"))
            .orderBy(col("gain").desc, col("id")).limit(1).collect()
        }
        val id = top(0).getLong(0)
        System.err.println(s"[mc] round $p pick=$id gain=${top(0).getLong(1)}")
        covered = t(s"round $p covered checkpoint") {
          val nc = postings.filter(col("id") === id).select("tok")
          (if (covered == null) nc else covered.union(nc)).distinct().localCheckpointCapped()
        }
      }
      // variant: BLOCKING unpersist between runs (Bench uses async), no gc
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
