package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: attach to each left row the most recent right row
  * with the same keys and `rightTime <= leftTime` (pandas `merge_asof` /
  * DuckDB `ASOF JOIN` semantics, which Spark has no native operator for).
  *
  * Implemented as a union + ONE window pass instead of a join: tag both
  * sides, sort each key group by (time, side, tie) with right rows first
  * on time ties, and carry right-side values forward with
  * `last(..., ignoreNulls = true)`. This costs exactly one shuffle on the
  * key columns and no join at all — at 100 TB it scales like a sort-merge
  * join's shuffle phase but skips the probe side entirely, never
  * materializes candidate pairs, and is immune to time-skew (a right row
  * matching millions of left rows is a broadcastless O(1) carry-forward,
  * where a range join would emit the cross product).
  *
  * Determinism: ties between right rows at the same (keys, time) are
  * resolved inside the same window sort — greatest `tieCol` sorts last and
  * wins the carry — so the matched value is a pure function of the data,
  * not of partitioning, at no extra shuffle.
  */
object AsOfJoin {

  /** @param left      probe rows; all columns preserved
    * @param right     reference rows; `valueCols` are attached to left
    * @param keys      equi-join key columns (present on both sides)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param valueCols right columns carried onto each left row as
    *                  `asof_<name>` (null when no right row precedes it)
    * @param tieCol    right column breaking exact-time ties (greatest wins);
    *                  None = keep whichever the sort sees last
    *                  (non-deterministic when right has duplicate
    *                  (keys, time) rows with differing values)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTime: String, rightTime: String,
                   valueCols: Seq[String],
                   tieCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "at least one equi-key required")
    val leftCols = left.columns.toSeq

    // Each carried value rides inside a single-field struct: the struct is
    // non-null whenever a right row exists, even when the value itself is
    // NULL, so `last(..., ignoreNulls)` skips only the left rows' injected
    // placeholders — a genuinely NULL right value is carried as NULL instead
    // of falling back to an older non-null one (merge_asof/ASOF semantics).
    def vType(c: String) = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("v", right.schema(c).dataType)))

    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(0))
      .withColumn("__tie", lit(null).cast(
        tieCol.map(right.schema(_).dataType)
          .getOrElse(org.apache.spark.sql.types.IntegerType)))
      .select((leftCols.map(col) :+ col("__t") :+ col("__side") :+ col("__tie")) ++
        valueCols.map(c => lit(null).cast(vType(c)).as(s"__v_$c")): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", tieCol.map(col).getOrElse(lit(null).cast("int")))
      .select((leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("__t") :+ col("__side") :+ col("__tie")) ++
        valueCols.map(c => struct(col(c).as("v")).as(s"__v_$c")): _*)

    // right rows sort before left rows at equal time (asof is `<=`); among
    // equal-time right rows the greatest tie sorts last, so `last` wins it
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").desc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .select(col("*") +: valueCols.map(c =>
        last(col(s"__v_$c"), ignoreNulls = true).over(w)
          .getField("v").as(s"__asof_$c")): _*)

    carried.filter(col("__side") === 0)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__asof_$c").as(s"asof_$c")): _*)
  }

  /** As-of backward join with a staleness tolerance: matches older than
    * `tolerance` (an interval literal, e.g. "1 HOUR") are nulled out —
    * pandas `merge_asof(tolerance=...)`. Implemented by carrying the
    * matched right row's OWN time through the same single window pass and
    * masking stale values afterwards; identical cost to `asofBackward`
    * (one shuffle, no join).
    */
  def asofBackwardWithin(left: DataFrame, right: DataFrame, keys: Seq[String],
                         leftTime: String, rightTime: String,
                         valueCols: Seq[String], tolerance: String,
                         tieCol: Option[String] = None): DataFrame = {
    val withT = asofBackward(left, right.withColumn("__rt", col(rightTime)),
      keys, leftTime, rightTime, valueCols :+ "__rt", tieCol)
    val fresh = col("asof___rt") >= col(leftTime) - expr(s"INTERVAL $tolerance")
    valueCols.foldLeft(withT) { (df, c) =>
      df.withColumn(s"asof_$c", when(fresh, col(s"asof_$c")))
    }.drop("asof___rt")
  }
}
