package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Operating-point grid for the clustering gate at a given corpus: prints
  * strong-band anchored mutual-edge recall and the candidate multiplier
  * for each (nprobe, massign), the round-13 COVERAGE.md grid re-run at
  * the 10x corpus to choose the auto-scaled point (round-14 verdict #3:
  * fixed (6,3) fell 72.5% -> 43.4% strong-band as cells grew 45 -> 142).
  *
  * Usage: runMain graft.tools.GridR14 [sfDir] [nprobe,massign[,indexes] ...]
  */
object GridR14 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val points = (if (args.length > 1) args.drop(1).toSeq
      else Seq("6,3", "9,3", "11,3", "11,4", "13,4"))
      .map { s =>
        val p = s.split(",")
        (p(0).toInt, p(1).toInt, if (p.length > 2) p(2).toInt else 1)
      }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val exact = Similarity.mutualKnnEdgesAnchored(e, "vec_id", "embedding",
      k = 5, anchorCap = 128L).localCheckpoint()
    val strong = exact.filter(col("cos_q") >= 400000L).count()
    println(s"corpus=$dir anchored_exact=${exact.count()} strong=$strong")
    points.foreach { case (np, ma, ix) =>
      val t0 = System.nanoTime()
      val ivf = Similarity.mutualKnnGraphKmv(e, "vec_id", "embedding",
        k = 5, nprobe = np, massign = ma, indexes = ix).select("vec_a", "vec_b")
      val foundStrong = exact.filter(col("cos_q") >= 400000L)
        .join(ivf, Seq("vec_a", "vec_b"), "left_semi").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"nprobe=$np%2d massign=$ma indexes=$ix : strong_recall=${foundStrong * 100.0 / strong}%5.1f%% ($foundStrong/$strong) build+audit=$sec%6.1f s")
    }
    spark.stop()
  }
}
