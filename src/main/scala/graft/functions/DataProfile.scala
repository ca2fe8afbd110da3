package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CappedCheckpoint._

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

  /** Pearson chi-squared test of independence between two categorical
    * columns, with every arithmetic step exact: the statistic
    * sum((O - E)^2 / E) over ALL r x c cells (zero-observed cells included
    * — omitting them understates the statistic) is accumulated as the
    * per-cell floored scaled rational `((O*n - cx*cy)^2 * 1e6) div
    * (cx*cy*n)` in DECIMAL(38,0), bit-replayable by a HUGEINT oracle; the
    * only floating step is the final Cramer's V, one IEEE (correctly
    * rounded) division chain + sqrt over the exact integers. Plan: one
    * cell aggregation over the corpus, then marginal/total aggregates on
    * the (r x c)-row cell table — the full contingency grid is a broadcast
    * cross of the two marginal tables, bounded by category cardinality,
    * never by corpus size. Output one row:
    * (n, r, c, dof, chi2_q, cramers_v).
    */
  def chiSquaredAssociation(df: DataFrame, colX: String, colY: String): DataFrame = {
    val dec = "decimal(38,0)"
    // the (r x c)-row cell table feeds four downstream aggregates; without
    // materialization each one would replay the corpus scan (measured: 5
    // scans), so checkpoint it — one corpus pass total
    val cells = df.groupBy(col(colX).as("__x"), col(colY).as("__y"))
      .agg(count(lit(1)).as("o"))
      .localCheckpointCapped()
    val mx = cells.groupBy(col("__x")).agg(sum(col("o")).as("cx"))
    val my = cells.groupBy(col("__y")).agg(sum(col("o")).as("cy"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("__x")).as("r"), countDistinct(col("__y")).as("c"))
    val grid = broadcast(mx).crossJoin(broadcast(my)) // r x c rows, category-bounded
      .join(cells, Seq("__x", "__y"), "left_outer")
      .select(col("cx"), col("cy"), coalesce(col("o"), lit(0L)).as("o"))
    val terms = grid.crossJoin(broadcast(tot))
      .select(((col("o").cast(dec) * col("n") - col("cx").cast(dec) * col("cy"))
        * (col("o").cast(dec) * col("n") - col("cx").cast(dec) * col("cy"))
        * lit(1000000L)).as("num"),
        (col("cx").cast(dec) * col("cy") * col("n")).as("den"))
      .select(expr("num div den").as("term_q"))
    terms.agg(sum(col("term_q")).as("chi2_q")).crossJoin(tot)
      .select(col("n"), col("r"), col("c"),
        ((col("r") - 1) * (col("c") - 1)).as("dof"),
        col("chi2_q"),
        // single-category input: dof = 0, chi2 = 0, and the V denominator
        // n*(min(r,c)-1) is 0 — define V = 0 rather than NaN (engines
        // disagree on 0/0)
        when(col("n") * least(col("r"), col("c")) - col("n") === 0, lit(0.0d))
          .otherwise(sqrt(col("chi2_q").cast("double") / 1000000.0d /
            (col("n") * least(col("r"), col("c")) - col("n")).cast("double")))
          .as("cramers_v"))
  }

  /** k-anonymity / l-diversity audit over a set of quasi-identifier
    * columns: every row whose quasi-identifier combination is shared by
    * fewer than `k` rows is re-identifiable; a group whose sensitive
    * column takes fewer than `l` distinct values leaks the attribute even
    * when k holds. One grouped aggregation over the corpus builds the
    * (quasi-combination)-keyed group table; the audit summary is a second
    * aggregation over that (far smaller) table. Output one row:
    * (n_rows, n_groups, risk_groups, risk_rows, min_group, low_diversity_groups).
    */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[String],
                      sensitiveCol: String, k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    val groups = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("sz"),
        countDistinct(col(sensitiveCol)).as("ldiv"))
    groups.agg(
      sum(col("sz")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      sum(when(col("sz") < k, 1L).otherwise(0L)).as("risk_groups"),
      sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("risk_rows"),
      min(col("sz")).as("min_group"),
      sum(when(col("ldiv") < l, 1L).otherwise(0L)).as("low_diversity_groups"))
  }
}
