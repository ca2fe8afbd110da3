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

  /** Quantization scale: embedding floats become `floor(x * 1e7)` longs.
    * Deterministic in any engine (floor of identical doubles) and exact from
    * there on — integer dot products commute, so the result is independent of
    * evaluation order and partitioning. The scale cancels in cosine; the
    * ~1e-7 per-element quantization error bounds the cosine error at ~1e-6
    * (outputs are rounded to 6 decimals).
    */
  val QuantScale = 1e7

  /** Scaled-long copy of a float vector — compute ONCE per row, then every
    * pairwise dot is pure long arithmetic (no per-pair decimal boxing).
    */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(QuantScale)).cast("long"))

  /** Exact integer dot product of two quantized vectors — the codegen'd
    * LongDot expression (requires LongDot.register on the session, done by
    * `quantized`). Portable HOF fallback: `dotLongHof`.
    */
  def dotLong(a: Column, b: Column): Column = call_function("graft_long_dot", a, b)

  /** Higher-order-function fallback (no registration needed; interpreted). */
  def dotLongHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Cosine from a precomputed quantized-pair + squared norms. */
  private def cosineFrom(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))

  /** Cosine similarity of two float vectors (convenience form; for bulk
    * workloads use the precomputed-quantized path the operators below take).
    */
  def cosine(a: Column, b: Column): Column = {
    val (qa, qb) = (quantize(a), quantize(b))
    cosineFrom(dotLongHof(qa, qb), dotLongHof(qa, qa), dotLongHof(qb, qb))
  }

  /** (id, qv, n2): quantized vector + squared norm, computed once per row.
    * The repartition is a deliberate materialization barrier: without it
    * Catalyst collapses the quantize projection into the downstream
    * (nested-loop) pair join and re-evaluates it per PAIR instead of per row
    * (measured: 640s -> seconds at 125k pairs). An exchange boundary forces
    * the projection to run exactly once per input row — and is exactly the
    * layout a cluster run wants anyway.
    */
  private def quantized(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    LongDot.register(df.sparkSession)
    df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"))
      .withColumn("n2", dotLong(col("qv"), col("qv")))
      .repartition(col("id"))
  }

  /** All pairs (a < b) with cosine >= minSim — embedding near-duplicate
    * detection. Brute force; compose with signLshBucket / a cluster column to
    * bound candidates at scale.
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         minSim: Double): DataFrame = {
    val q = quantized(df, idCol, vecCol)
    q.select(col("id").as("id_a"), col("qv").as("va"), col("n2").as("na"))
      .join(q.select(col("id").as("id_b"), col("qv").as("vb"), col("n2").as("nb")),
        col("id_a") < col("id_b"))
      .withColumn("sim", cosineFrom(dotLong(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("sim") >= minSim)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
  }

  /** Brute-force cosine top-k: for each query row, the k nearest candidates
    * (self excluded), ranked desc by similarity with id tie-break.
    */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = quantized(queries, idCol, vecCol)
      .select(col("id").as("query_id"), col("qv").as("qa"), col("n2").as("na"))
    val c = quantized(candidates, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("qv").as("qb"), col("n2").as("nb"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosineFrom(dotLong(col("qa"), col("qb")), col("na"), col("nb")))
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
    LongDot.register(df.sparkSession)
    val b = df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"),
        signLshBucket(col(vecCol), bits).as("bucket"))
      .withColumn("n2", dotLong(col("qv"), col("qv")))
    val scored = b.as("q").join(b.as("c"),
        col("q.bucket") === col("c.bucket") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        col("q.bucket").as("bucket"),
        cosineFrom(dotLong(col("q.qv"), col("c.qv")), col("q.n2"), col("c.n2")).as("sim"))
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
    LongDot.register(df.sparkSession)
    val b = df.select(col(idCol).as("id"), quantize(col(vecCol)).as("qv"),
        col(clusterCol).as("cell"))
      .withColumn("n2", dotLong(col("qv"), col("qv")))
    val scored = b.as("q").join(b.as("c"),
        col("q.cell") === col("c.cell") && col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("q.cell").as("cell"),
        col("c.id").as("neighbor_id"),
        cosineFrom(dotLong(col("q.qv"), col("c.qv")), col("q.n2"), col("c.n2")).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cell"), col("neighbor_id"), col("rank"))
  }
}
