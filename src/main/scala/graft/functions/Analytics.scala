package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CappedCheckpoint._

/** Order-based analytics operators that compose into Catalyst plans rather
  * than pair joins — currently the 2-D Pareto frontier (skyline).
  */
object Analytics {

  /** Exact 2-D skyline (Pareto frontier): rows for which no other row is
    * better-or-equal on both dimensions and strictly better on one, with
    * `minCol` minimized and `maxCol` maximized. Ties on both dimensions are
    * mutually non-dominating, so exact duplicates all survive.
    *
    * Not a pair join (the textbook NOT EXISTS is O(n^2)); the 2-D frontier
    * is an order statistic:
    *
    *  1. '''Bin prune''' — bucket `minCol` into `bins` equi-width bins,
    *     take per-bin max of `maxCol`, running-max over the (tiny,
    *     <= bins-row) bin table; any row at or below the running max of the
    *     strictly-lower bins is dominated by a strictly-cheaper row and is
    *     dropped in a map-side filter against the broadcast bin table. On
    *     uniform data this leaves ~bins + frontier rows of the corpus.
    *  2. '''Exact finish''' — per-`minCol` max of `maxCol` (a row not best
    *     at its own cost is dominated there), then a running max over the
    *     strictly-cheaper distinct costs; survivors above it are the
    *     frontier.
    *
    * The only unpartitioned sort runs over the pruned survivor set (step 2)
    * and the bin table (step 1) — both frontier-sized, not corpus-sized, so
    * the shape survives 100 TB: one scan + one broadcast filter + one small
    * sort. All comparisons are on the raw column values (no arithmetic), so
    * double dimensions compare identically in any engine.
    */
  def paretoSkyline2D(df: DataFrame, minCol: String, maxCol: String,
                      bins: Int = 64): DataFrame = {
    require(bins >= 1, s"bins must be >= 1 (got $bins)")
    val mn = col(minCol)
    val mx = col(maxCol)

    // step 1: equi-width bin bounds from a 1-row min/max aggregate
    val bounds = df.agg(min(mn).as("lo"), max(mn).as("hi"))
    val binned = df.crossJoin(broadcast(bounds))
      .withColumn("__bin",
        when(col("hi") === col("lo"), lit(0))
          .otherwise(least(lit(bins - 1),
            floor((mn - col("lo")) * bins / (col("hi") - col("lo"))).cast("int"))))
    val binTable = binned.groupBy(col("__bin")).agg(max(mx).as("__bm"))
    val prevBins = Window.orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val binPrefix = binTable.withColumn("__pm", max(col("__bm")).over(prevBins))
    // a strictly-lower bin holds a strictly-cheaper row; >= its max ties or
    // beats every one of them on maxCol, so only <= __pm rows can be dropped
    // materialize the (frontier-sized) survivor set: step 2 references it
    // twice, and without the checkpoint each reference would replay the
    // full corpus scan — 3 narrow scans total instead of 6 corpus scans
    val pruned = binned.join(broadcast(binPrefix.select("__bin", "__pm")), Seq("__bin"))
      .filter(col("__pm").isNull || mx > col("__pm"))
      .drop("__bin", "__pm", "lo", "hi")
      .localCheckpointCapped()

    // step 2: exact frontier over the survivor set
    val perCost = pruned.groupBy(mn.as("__c")).agg(max(mx).as("__gm"))
    val prevCosts = Window.orderBy(col("__c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val costPrefix = perCost.withColumn("__m1", max(col("__gm")).over(prevCosts))
    pruned.join(broadcast(costPrefix), pruned(minCol) === col("__c"))
      .filter(mx === col("__gm") && (col("__m1").isNull || col("__m1") < mx))
      .drop("__c", "__gm", "__m1")
  }
}
