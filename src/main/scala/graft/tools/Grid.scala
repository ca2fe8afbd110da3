package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Operating-point grid for the clustering channels at a given corpus:
  * prints strong-band anchored mutual-edge recall, the MEASURED distinct
  * candidate-pair count (the honest cost axis — "candidate units" like
  * nprobe*massign hide cell-size differences between channels), and build
  * time for each point. Two channel syntaxes:
  *
  *   np,ma[,ix]          flat KMV IVF (mutualKnnGraphKmv)
  *   2l:p1,p2,m1,m2[,raw] two-level coarse->fine residual index
  *                        (mutualKnnGraphTwoLevel; trailing "raw" turns
  *                        residual re-expression OFF for A/B)
  *
  * Usage: runMain graft.tools.Grid [sfDir] [point ...]
  * (round 14 ran this as GridR14 to choose the auto-scaled flat point;
  * round 15 adds the two-level channel — SCALE.md carries both grids)
  */
object Grid {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val points = if (args.length > 1) args.drop(1).toSeq
      else Seq("6,3", "13,4", "2l:6,24,2,2", "2l:6,24,2,2,raw")
    // Partition count must scale with CANDIDATE volume, not corpus rows:
    // the 32-partition config that served every corpus up to 60k vectors
    // (<= 180M candidate pairs) put ~53M pairs per task at 200k vectors
    // (~1.7B pairs), and the resulting GC storm stalled the shared
    // local-mode driver past the heartbeat deadline — the executor killed
    // itself after 60 missed beats. SPARK_GRAFT_SHUFFLE sizes the round's
    // grid; AQE coalesces the cheap stages back down. The raised network
    // timeout rides out full-GC pauses a 96g heap takes under a 1.7B-pair
    // distinct (local mode only — a real cluster isolates the driver).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "20s")
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
    points.foreach { p =>
      val t0 = System.nanoTime()
      val (label, graph, cand) = if (p.startsWith("2l:")) {
        val a = p.drop(3).split(",")
        val (p1, p2, m1, m2) = (a(0).toInt, a(1).toInt, a(2).toInt, a(3).toInt)
        val res = !(a.length > 4 && a(4) == "raw")
        (f"2l(p1=$p1%2d,p2=$p2%3d,m1=$m1,m2=$m2,${if (res) "res" else "raw"})",
          Similarity.mutualKnnGraphTwoLevel(e, "vec_id", "embedding",
            k = 5, pCoarse = p1, pFine = p2, mCoarse = m1, mFine = m2,
            residual = res),
          () => Similarity.twoLevelCandidateCount(e, "vec_id", "embedding",
            p1, p2, m1, m2, res))
      } else {
        val a = p.split(",")
        val (np, ma) = (a(0).toInt, a(1).toInt)
        val ix = if (a.length > 2) a(2).toInt else 1
        (f"flat(np=$np%2d,ma=$ma,ix=$ix)",
          Similarity.mutualKnnGraphKmv(e, "vec_id", "embedding",
            k = 5, nprobe = np, massign = ma, indexes = ix),
          () => Similarity.kmvCandidateCount(e, "vec_id", "embedding",
            np, ma, ix))
      }
      val foundStrong = exact.filter(col("cos_q") >= 400000L)
        .join(graph.select("vec_a", "vec_b"), Seq("vec_a", "vec_b"), "left_semi")
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      val nCand = cand()
      println(f"$label%-36s strong_recall=${foundStrong * 100.0 / strong}%5.1f%% ($foundStrong/$strong) candidates=$nCand%,12d build+audit=$sec%6.1f s")
    }
    spark.stop()
  }
}
