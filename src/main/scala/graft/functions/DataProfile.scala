package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic data-profiling: the per-column quality summary (row/null/distinct
  * counts, min/max) every ingestion pipeline runs before trusting a new
  * drop of data.
  */
object DataProfile {

  /** One-pass multi-column profile: for each requested column, non-null
    * count, exact distinct count, and min/max (cast to string AFTER the
    * aggregate, so numeric semantics drive the comparison), emitted long-form
    * via `stack`. All statistics compute in a single aggregation job; the
    * exact distincts share one Expand (rows multiplied by the number of
    * profiled columns — the standard cost of exact multi-distinct; swap in
    * approx_count_distinct at 100 TB when ±2% is acceptable). Output: one
    * row per column (col_name, n_rows, n_null, n_distinct, min_v, max_v).
    */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val groups = cols.map { c =>
      s"'$c', __total - `__nn_$c`, `__nd_$c`, `__mn_$c`, `__mx_$c`"
    }.mkString(", ")
    row.selectExpr("__total AS n_rows",
      s"stack(${cols.length}, $groups) AS (col_name, n_null, n_distinct, min_v, max_v)")
      .select("col_name", "n_rows", "n_null", "n_distinct", "min_v", "max_v")
  }
}
