package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed at-rest layout for NetworkFrames — the 100 TB deployment story
  * (SCALE.md): edges bucketed by `source` (and optionally a mirrored copy
  * bucketed by `target`) let every subgraph-induction semi-join,
  * effective-edge aggregation, and iterative message join reuse the bucket
  * partitioning instead of shuffling the edge table. Nodes bucket by `id`
  * so label joins co-locate too.
  *
  * Spark bucketing requires table-managed storage (`saveAsTable`); tables
  * land in the session's warehouse dir.
  */
object Storage {

  /** Persist bucketed: `<name>_nodes` bucketed by id, `<name>_edges`
    * bucketed by source, plus `<name>_edges_bytarget` when `mirror` —
    * the two-sided layout that kills the shuffle on whichever endpoint a
    * join needs.
    */
  def writeBucketed(nf: NetworkFrame, name: String, buckets: Int = 32,
                    mirror: Boolean = false): Unit = {
    val spark = nf.nodes.sparkSession
    def writeTable(df: DataFrame, table: String, key: String): Unit = {
      // A fresh session's in-memory catalog knows nothing about a warehouse
      // dir left behind by a previous JVM; saveAsTable would then fail with
      // LOCATION_ALREADY_EXISTS. Drop both the catalog entry and the stale
      // physical location before writing.
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      val warehouse = new org.apache.hadoop.fs.Path(
        spark.sessionState.conf.warehousePath, table.toLowerCase)
      val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(warehouse)) fs.delete(warehouse, true)
      df.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, key).sortBy(key)
        .format("parquet").saveAsTable(table)
    }
    writeTable(nf.nodes, s"${name}_nodes", "id")
    writeTable(nf.edges, s"${name}_edges", "source")
    if (mirror) writeTable(nf.edges, s"${name}_edges_bytarget", "target")
  }

  /** Reload a bucketed NetworkFrame; joins on nodes.id / edges.source pick
    * up the bucket spec and skip their exchange.
    */
  def readBucketed(spark: SparkSession, name: String,
                   directed: Boolean = true): NetworkFrame =
    NetworkFrame(spark.table(s"${name}_nodes"), spark.table(s"${name}_edges"), directed)

  /** The target-bucketed mirror copy, when written. */
  def readEdgesByTarget(spark: SparkSession, name: String): DataFrame =
    spark.table(s"${name}_edges_bytarget")

  /** IVF at-rest layout: the embedding corpus partitioned by its coarse
    * cell column, so an ANN probe of cell c is a partition-pruned scan that
    * never touches the other cells' files (SCALE.md "store the corpus
    * partitioned by cell"). Plain directory-partitioned parquet — no
    * catalog dependency.
    */
  def writeCellPartitioned(df: DataFrame, path: String, cellCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cellCol).parquet(path)

  /** Scan a single IVF cell; the filter prunes at the partition level
    * (verify via PartitionFilters in the scan node).
    */
  def readCell(spark: SparkSession, path: String, cellCol: String,
               cell: Any): DataFrame =
    spark.read.parquet(path).filter(org.apache.spark.sql.functions.col(cellCol) === cell)

  /** Z-order (Morton) key: interleave the low `bits` bits of two
    * non-negative integer dimensions — sort/range-partition by this and
    * both dimensions cluster simultaneously, so min/max file statistics
    * prune scans filtered on EITHER column (the standard multi-dimensional
    * data-skipping layout; Delta/Iceberg expose the same curve). Built from
    * plain div/mod/multiply so it stays in whole-stage codegen and an
    * oracle can replay it textually.
    */
  def zorderKey(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
                bits: Int = 8): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, shiftright}
    (0 until bits).map { j =>
      shiftright(x.cast("long"), j).bitwiseAND(lit(1L)) * lit(1L << (2 * j)) +
      shiftright(y.cast("long"), j).bitwiseAND(lit(1L)) * lit(1L << (2 * j + 1))
    }.reduce(_ + _)
  }

  /** The same Morton interleave as SQL text (oracle mirror of zorderKey). */
  def zorderSql(x: String, y: String, bits: Int = 8): String =
    (0 until bits).map { j =>
      s"(($x // ${1L << j}) % 2) * ${1L << (2 * j)} + (($y // ${1L << j}) % 2) * ${1L << (2 * j + 1)}"
    }.mkString(" + ")
}
