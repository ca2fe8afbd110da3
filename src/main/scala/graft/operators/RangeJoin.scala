package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval join by time bucketing — the scale-correct
  * plan for range predicates that Spark would otherwise execute as a
  * broadcast nested loop. Each interval explodes to the buckets it covers,
  * each point maps to one bucket, and the join runs as an EQUI-join on
  * (keys..., bucket) with the exact range predicate re-applied as a filter —
  * so the shuffle is hash-partitioned and the candidate set per task is
  * bounded by bucket co-residency, never |points| x |intervals|. The same
  * technique underlies production interval joins (genomics, attribution,
  * session attribution) at any scale; choose `bucketSeconds` near the
  * typical interval length so each interval explodes to O(1) buckets.
  */
object RangeJoin {

  /** Inner-join `points` (event rows with `pointTs`) to the `intervals`
    * that contain them: keys equal, start <= ts < end. Output: every
    * interval column plus the point's columns (point ts aliased `p_ts`).
    * Interval spans are exploded via `sequence()` — integer bucket ids from
    * exact microsecond division, no doubles anywhere.
    */
  def pointInInterval(points: DataFrame, pointTs: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      keys: Seq[String], bucketSeconds: Long = 3600): DataFrame = {
    require(bucketSeconds > 0, "bucket must be positive")
    val bus = bucketSeconds * 1000000L
    // integral division (positive epochs: truncation == floor); `/` on
    // longs would be a double divide in the Column API
    val iv = intervals.withColumn("bucket",
      explode(sequence(
        expr(s"unix_micros($startCol) div ${bus}L"),
        expr(s"unix_micros($endCol) div ${bus}L"))))
    val pt = points
      .withColumn("bucket", expr(s"unix_micros($pointTs) div ${bus}L"))
      .withColumnRenamed(pointTs, "p_ts")
    iv.join(pt, keys :+ "bucket")
      .filter(col("p_ts") >= col(startCol) && col("p_ts") < col(endCol))
      .drop("bucket")
  }

  /** Per-key union length of integer intervals [start, end] — the classic
    * sweep: order each key's intervals, carry the running max end over
    * PRECEDING rows, open a new island where a start clears it, then sum
    * island extents. Coverage and island counts are the standard
    * sessionized-exposure aggregates (ad attribution, uptime, sensor
    * coverage). One shuffle on the key; windows are integer-exact, ties
    * broken by (start, end, tieCol) so the island ids are deterministic at
    * any parallelism. Output: (key, covered, n_islands).
    */
  def intervalUnion(iv: DataFrame, keyCol: String, startCol: String,
                    endCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(keyCol)
    val sweep = byKey.orderBy(startCol, endCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = byKey.orderBy(startCol, endCol, tieCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv.withColumn("__pm", max(col(endCol)).over(sweep))
      .withColumn("__ni",
        when(col("__pm").isNull || col(startCol) > col("__pm"), 1L).otherwise(0L))
      .withColumn("__island", sum("__ni").over(run))
      .groupBy(col(keyCol), col("__island"))
      .agg((max(col(endCol)) - min(col(startCol))).as("__len"))
      .groupBy(keyCol)
      .agg(sum("__len").as("covered"), count(lit(1)).as("n_islands"))
  }
}
