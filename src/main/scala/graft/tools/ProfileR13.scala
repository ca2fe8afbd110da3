package graft.tools

import org.apache.spark.sql.SparkSession
import graft.functions.Similarity

/** Stage-level timing for the round-13 clustering audit pieces. */
object ProfileR13 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    Plans.t("ivf graph (6,3)") {
      Similarity.mutualKnnGraphKmv(e, "vec_id", "embedding",
        k = 5, nprobe = 6, massign = 3).count()
    }
    Plans.t("anchored exact edges") {
      Similarity.mutualKnnEdgesAnchored(e, "vec_id", "embedding",
        k = 5, anchorCap = 128L).count()
    }
    Plans.t("full recall query") {
      graft.SparkEntry.queries("q_doc_clusters_recall")(spark, dir).count()
    }
    spark.stop()
  }
}
