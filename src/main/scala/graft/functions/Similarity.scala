package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an `ARRAY<FLOAT>` embedding
  * column. Brute-force cosine top-k is the exactness baseline (quadratic in
  * candidate count — fine when the query set is small or within a coarse
  * partition); the scale paths bound the candidate set first:
  *
  *  - signLshBucket: random-hyperplane-style sign bucket on leading
  *    dimensions — one narrow shuffle key; neighbors searched per bucket
  *  - IVF-style: a coarse cluster id column (here the precomputed `label`)
  *    partitions the search so each query only scans its own cell
  *
  * Determinism: dot products accumulate in DECIMAL (exact, order-independent)
  * and convert to DOUBLE only in the final scalar expression, so results are
  * bit-identical across engines and partitionings — no floating-point
  * sum-order sensitivity at any scale.
  */
object Similarity {

  /** Exact, order-independent dot product: each elementwise double product is
    * cast to DECIMAL(30,15) (bit-identical in any engine given identical
    * inputs) and summed exactly.
    */
  def dotDecimal(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") * y.cast("double")).cast("decimal(30,15)")),
      lit(0).cast("decimal(30,15)"),
      (acc, v) => (acc + v).cast("decimal(30,15)"))

  def normDecimal(a: Column): Column = dotDecimal(a, a)

  /** Cosine similarity with deterministic evaluation. */
  def cosine(a: Column, b: Column): Column =
    dotDecimal(a, b).cast("double") /
      (sqrt(normDecimal(a).cast("double")) * sqrt(normDecimal(b).cast("double")))

  /** All pairs (a < b) with cosine >= minSim — embedding near-duplicate
    * detection. Brute force; compose with signLshBucket / a cluster column to
    * bound candidates at scale.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         minSim: Double): DataFrame =
    df.select(col(idCol).as("id_a"), col(vecCol).as("va")).as("a")
      .join(df.select(col(idCol).as("id_b"), col(vecCol).as("vb")).as("b"),
        col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= minSim)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))

  /** Brute-force cosine top-k: for each query row, the k nearest candidates
    * (self excluded), ranked desc by similarity with id tie-break.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("sim"), 6).as("sim"))
  }

  /** Sign-LSH bucket over the first `bits` dimensions: bit j set iff
    * vec[j] > 0. A cheap hyperplane family whose planes are the coordinate
    * axes — deterministic and engine-portable. 2^bits buckets.
    */
  def signLshBucket(vec: Column, bits: Int = 8): Column =
    aggregate(
      transform(sequence(lit(1), lit(bits)),
        j => when(get(vec, j - 1) > 0f,
          pow(lit(2), j.cast("double") - 1).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)

  /** LSH-bucketed ANN: top-k within each query's sign bucket only. One
    * shuffle on the bucket id; per-bucket candidate sets are ~n/2^bits.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              k: Int, bits: Int = 8): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      signLshBucket(col(vecCol), bits).as("bucket"))
    val scored = b.as("q").join(b.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        col("q.bucket").as("bucket"),
        cosine(col("q.v"), col("c.v")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("neighbor_id"), col("rank"))
  }

  /** IVF-style ANN: search only within a coarse partition (cluster) column —
    * the standard inverted-file layout where `clusterCol` is the cell
    * assignment. At 100 TB the table is partitioned/bucketed by this column
    * so each probe is a partition-pruned scan.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, clusterCol: String,
              k: Int): DataFrame = {
    val b = df.select(col(idCol).as("id"), col(vecCol).as("v"), col(clusterCol).as("cell"))
    val scored = b.as("q").join(b.as("c"),
        col("q.cell") === col("c.cell") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("q.cell").as("cell"),
        col("c.id").as("neighbor_id"), cosine(col("q.v"), col("c.v")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cell"), col("neighbor_id"), col("rank"))
  }
}
