package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round evidence harness: for each named gated query, write
  * its `.explain("formatted")` physical plan to `<outDir>/<name>_<tag>.txt`
  * and time one noop-sink materialization (guide §1.4 — computes every
  * column of every row, no sink cost, full plan in the SQL tab) with the
  * job labeled (guide §1.5). Between queries it resets memoized artifacts
  * and unpersists leftover blocks so each measurement pays honest
  * first-consumer cost — the same solo discipline as Bench's outlier
  * re-runs.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <tag> q_a,q_b,...
  * (tag is `before`/`after` for the plans/r16 deliverables).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/root/repo/plans/r16"
    val tag = if (args.length > 2) args(2) else "before"
    val names: Seq[String] =
      if (args.length > 3) args(3).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark"
        else System.getProperty("java.io.tmpdir")))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    def reclaim(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      SparkEntry.resetMemoizedArtifacts()
      System.gc()
    }
    // absorb JVM/codegen/scheduler cold-start before any timed query —
    // same rationale as Bench's warmup (the first timed query otherwise
    // carries ~5-10 s of warmup and reads as a fake regression)
    SparkEntry.queries.get("q_degrees").foreach { fn =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      reclaim()
    }
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[explain] UNKNOWN query $name")
        case Some(fn) =>
          reclaim()
          try {
            spark.sparkContext.setJobDescription(s"$name ($tag)")
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir)
            df.write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t0) / 1e9
            // capture the formatted physical plan AFTER the run so AQE and
            // checkpointed fixpoint inputs reflect what actually executed
            val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[
              org.apache.spark.sql.Row]].queryExecution
              .explainString(org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            val f = new java.io.File(outDir, s"${name}_$tag.txt")
            val w = new java.io.PrintWriter(f, "UTF-8")
            try {
              w.println(f"# $name ($tag) noop-sink materialization: $sec%.2f s at $sfDir")
              w.println(plan)
            } finally w.close()
            System.err.println(f"[explain] $name%-24s $sec%8.2f s -> $f")
          } catch {
            case e: Throwable =>
              System.err.println(s"[explain] $name FAILED: ${e.getMessage}")
          } finally spark.sparkContext.setJobDescription(null)
      }
    }
    spark.stop()
  }
}
