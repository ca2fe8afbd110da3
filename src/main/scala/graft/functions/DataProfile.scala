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
    * columns, with every arithmetic step exact INCLUDING the final Cramer's
    * V (no raw doubles in the output — a double column is the one thing a
    * cross-engine hash gate can disagree on). The statistic uses the
    * algebraic identity sum((O-E)^2/E) = sum(O^2 * n / (cx*cy)) - n, so
    * (a) zero-observed cells contribute nothing and the r x c grid never
    * materializes — only observed cells join their marginals — and (b) the
    * per-cell accumulator O^2*n*1e6 stays within DECIMAL(38,0) out to
    * ~4.6e10 rows (the previous (O*n - cx*cy)^2 form overflowed at ~1e8).
    * Overflow past that bound fails loudly (raise_error) instead of
    * NULL-dropping cells and silently understating chi2. Each cell's term
    * is the floored scaled rational `(O^2 * n * 1e6) div (cx*cy)`,
    * bit-replayable by a HUGEINT oracle; chi2_q = sum(term) - n*1e6 (exact
    * under perfect independence, within r*c millionths otherwise).
    * Cramer's V is emitted as exact integral ppm: the corrected integer
    * sqrt of `(max(chi2_q,0) * 1e6) div (n*min(r,c) - n)` — floor(sqrt)
    * over an integer <= 1e12 (exactly representable in double; one
    * conditional +/-1 correction makes it exact floor-sqrt in any engine).
    * Single-category input (dof = 0, V denominator 0) defines V = 0.
    * NULL-keyed rows are excluded up front: a NULL category would survive
    * the groupBy but silently drop from the marginal equi-joins (NULL never
    * equals NULL) while still counting in n, skewing chi2 negative — the
    * test is defined over rows where both categories are present.
    * Plan: one corpus aggregation, then marginal/total aggregates on the
    * observed-cell table (category-bounded, never corpus-bounded).
    * Output one row: (n, r, c, dof, chi2_q, cramers_v_ppm).
    */
  def chiSquaredAssociation(df: DataFrame, colX: String, colY: String): DataFrame = {
    val dec = "decimal(38,0)"
    // the observed-cell table feeds four downstream aggregates; without
    // materialization each one would replay the corpus scan (measured: 5
    // scans), so checkpoint it — one corpus pass total
    val cells = df
      .filter(col(colX).isNotNull && col(colY).isNotNull)
      .groupBy(col(colX).as("__x"), col(colY).as("__y"))
      .agg(count(lit(1)).as("o"))
      .localCheckpointCapped()
    val mx = cells.groupBy(col("__x")).agg(sum(col("o")).as("cx"))
    val my = cells.groupBy(col("__y")).agg(sum(col("o")).as("cy"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("__x")).as("r"), countDistinct(col("__y")).as("c"))
    val terms = cells
      .join(broadcast(mx), Seq("__x")).join(broadcast(my), Seq("__y"))
      .crossJoin(broadcast(tot))
      .select(expr(s"(CAST(o AS $dec) * o * n * 1000000) div (CAST(cx AS $dec) * cy)")
        .as("term_q"))
      // non-ANSI DECIMAL overflow becomes NULL and sum() would silently
      // drop the cell: fail loudly at the documented ~4.6e10-row bound
      .select(when(col("term_q").isNull, raise_error(lit(
          "chiSquaredAssociation: DECIMAL(38,0) term overflow (corpus beyond ~4.6e10 rows)")))
        .otherwise(col("term_q")).as("term_q"))
    // term_q itself is BIGINT (integral div), but summing BIGINTs wraps
    // silently in non-ANSI mode once n*min(r,c) > 9.2e12 — well under the
    // per-term 4.6e10-row bound whenever min(r,c) > ~200. Sum in
    // DECIMAL(38,0) (exact, matches the HUGEINT-summing oracle).
    terms.agg(sum(col("term_q").cast(dec)).as("tsum")).crossJoin(tot)
      .selectExpr("n", "r", "c", "(r - 1) * (c - 1) AS dof",
        s"CAST(tsum - CAST(n AS $dec) * 1000000 AS BIGINT) AS chi2_q")
      // corrected integer sqrt: vsq <= 1e12 is exact in double, so
      // floor(sqrt(double)) is off by at most one — fix by comparison
      .selectExpr("n", "r", "c", "dof", "chi2_q",
        "n * least(r, c) - n AS vden",
        s"CAST((CAST(greatest(chi2_q, 0) AS $dec) * 1000000) div " +
          "greatest(n * least(r, c) - n, 1) AS BIGINT) AS vsq")
      .selectExpr("n", "r", "c", "dof", "chi2_q", "vden", "vsq",
        "CAST(floor(sqrt(CAST(vsq AS DOUBLE))) AS BIGINT) AS s0")
      .selectExpr("n", "r", "c", "dof", "chi2_q",
        """CASE WHEN vden = 0 THEN 0L
                WHEN (s0 + 1) * (s0 + 1) <= vsq THEN s0 + 1
                WHEN s0 * s0 > vsq THEN s0 - 1
                ELSE s0 END AS cramers_v_ppm""")
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
