package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit dump for the flagship queries: prints each query's FORMATTED
  * physical plan plus a parquet-scan census (how many times each base table
  * is scanned), the artifact a reviewer reads to confirm scan fusion,
  * pushed filters, and broadcast choices without re-deriving them.
  *
  * Usage: sbt "runMain graft.Plans [sfDir] [query1,query2,...]"
  * Defaults: sf0.001, the flagship set below.
  */
object Plans {
  val flagship = Seq("q_pipeline_e2e", "q_self_similarity", "q_ensemble_pairs",
    "q_blocking_recall", "q1_pricing",
    // round-9 scale-path flagships
    "q_cell_neardup", "q_phash_pairs", "q_skyline", "q_max_coverage")

  /** Count parquet-scan leaves per base table (by file location) in a
    * physical plan. Works on `executedPlan.toString`, where each FileScan
    * prints its InMemoryFileIndex location inline.
    */
  def scanCensus(plan: String): Map[String, Int] =
    "InMemoryFileIndex(?: ?\\(\\d+ paths?\\))?\\[([^\\],]+)".r.findAllMatchIn(plan)
      .map(m => m.group(1).split("/").last)
      .toSeq.groupBy(identity).map { case (k, v) => k -> v.size }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args(1).split(",").toSeq else flagship
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n======================== $n ========================")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      val census = scanCensus(df.queryExecution.executedPlan.toString)
      println(s"[scan census] ${census.toSeq.sortBy(_._1).map { case (c, k) => s"$k scan(s) of [$c]" }.mkString("; ")}")
    }
    spark.stop()
  }
}
