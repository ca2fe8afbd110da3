package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A network represented as a pair of DataFrames: a node table keyed by a
  * unique `id` column and an edge table with `source`/`target` columns whose
  * values are node ids (reference semantics: networkframe.py:33-99).
  *
  * Unlike the reference (eager, driver-resident pandas), every operation here
  * composes lazy Catalyst plans and returns a new immutable wrapper — the
  * Spark analogue of the reference's shallow-copy `_return`
  * (networkframe.py:101-110). Node ids live in an explicit `id` column
  * (Spark has no row index); duplicate (source,target) edge rows are allowed
  * (multigraph, networkframe.py:86).
  *
  * Scale posture: the node table is usually small relative to edges, so node
  * lookups (`applyNodeFeatures`) broadcast; edge-side subgraph induction is
  * expressed as LEFT SEMI equi-joins on node id, which Catalyst plans as
  * broadcast-hash joins when the filtered node set is small and shuffled hash
  * joins otherwise (AQE re-plans at runtime).
  */
final case class NetworkFrame(
    nodes: DataFrame,
    edges: DataFrame,
    directed: Boolean = true,
    sourcesIndex: Option[DataFrame] = None,
    targetsIndex: Option[DataFrame] = None) {

  import NetworkFrame._

  // ------------------------------------------------- bipartite index views

  /** Source node ids (networkframe.py:147-157): the full node index for an
    * induced frame; the intersection of the node index with the declared
    * `sourcesIndex` for a non-induced (bipartite/rectangular) frame. The
    * reference marks its own implementation "currently non-functional"
    * (networkframe.py:64-67); this implements the documented intent.
    */
  def sources: DataFrame = sourcesIndex match {
    case None => nodes.select(col("id"))
    case Some(ix) => nodes.select(col("id"))
      .join(ix.select(col(ix.columns.head).as("id")), Seq("id"), "left_semi")
  }

  /** Target node ids (networkframe.py:159-169); see `sources`. */
  def targets: DataFrame = targetsIndex match {
    case None => nodes.select(col("id"))
    case Some(ix) => nodes.select(col("id"))
      .join(ix.select(col(ix.columns.head).as("id")), Seq("id"), "left_semi")
  }

  /** Source/target node rows with metadata (networkframe.py:171-177). */
  def sourceNodes: DataFrame = nodes.join(sources, Seq("id"), "left_semi")
  def targetNodes: DataFrame = nodes.join(targets, Seq("id"), "left_semi")

  // ---------------------------------------------------------------- validate

  /** Referential-integrity + uniqueness check (networkframe.py:71-81).
    * Optional by design — the reference flags it "very very slow"; here it is
    * two distributed aggregations. Throws IllegalArgumentException on
    * violation, mirroring the reference's ValueError.
    */
  def validate(): NetworkFrame = {
    val dup = nodes.groupBy(col("id")).count().filter(col("count") > 1).limit(1).count()
    require(dup == 0, "Node ids must be unique")
    val ids = nodes.select(col("id"))
    val dangling = edges.select(col("source").as("id"))
      .union(edges.select(col("target").as("id")))
      .distinct()
      .join(ids, Seq("id"), "left_anti")
      .limit(1).count()
    require(dangling == 0, "All edge endpoints must be in the node table")
    this
  }

  /** Node count — the reference's `__len__` (networkframe.py:190). Action. */
  def numNodes: Long = nodes.count()
  def numEdges: Long = edges.count()

  /** Shape summary — the reference's `__repr__` (networkframe.py:179-188),
    * e.g. `NetworkFrame(nodes=(3, 1), edges=(2, 3))`. The node column count
    * excludes `id` (the reference's index). Action (two counts).
    */
  def describe: String =
    s"NetworkFrame(nodes=($numNodes, ${nodes.columns.length - 1}), " +
      s"edges=($numEdges, ${edges.columns.length}))"

  // ----------------------------------------------------- subgraph selection

  /** Keep only edges whose BOTH endpoints are in `n` (the signature semantic
    * of the reference: filtering nodes induces a consistent edge filter,
    * networkframe.py:334-336). Two LEFT SEMI joins on node id.
    */
  private def induceEdges(e: DataFrame, n: DataFrame): DataFrame = {
    val ids = n.select(col("id"))
    e.join(ids.withColumnRenamed("id", "source"), Seq("source"), "left_semi")
      .join(ids.withColumnRenamed("id", "target"), Seq("target"), "left_semi")
  }

  /** Filter nodes by a Spark SQL boolean expression, then re-induce edges
    * (networkframe.py:273-338). `params` replaces the reference's `@var`
    * binding (networkframe.py:277-298): occurrences of `@name` in `expr` are
    * substituted with safely rendered SQL literals.
    */
  def queryNodes(expr: String, params: Map[String, Any] = Map.empty): NetworkFrame = {
    val n = nodes.filter(bindParams(expr, params))
    copy(nodes = n, edges = induceEdges(edges, n))
  }

  /** Filter edges by expression; nodes untouched — isolated nodes are
    * retained (networkframe.py:347-409, README.md:70-79).
    */
  def queryEdges(expr: String, params: Map[String, Any] = Map.empty): NetworkFrame =
    copy(edges = edges.filter(bindParams(expr, params)))

  /** Drop the given node ids, then re-induce edges (networkframe.py:223-244). */
  def removeNodes(ids: DataFrame): NetworkFrame = {
    val n = nodes.join(ids.select(col(ids.columns.head).as("id")), Seq("id"), "left_anti")
    copy(nodes = n, edges = induceEdges(edges, n))
  }

  /** Subtract edges by (source,target) key. Matches the reference: ALL
    * duplicate edges sharing a removed key are dropped (networkframe.py:250-257).
    */
  def removeEdges(remove: DataFrame): NetworkFrame =
    copy(edges = edges.join(
      remove.select(col("source"), col("target")), Seq("source", "target"), "left_anti"))

  /** Append rows; no dedup, no validation (networkframe.py:261-271). */
  def addNodes(more: DataFrame): NetworkFrame =
    copy(nodes = nodes.unionByName(more, allowMissingColumns = true))
  def addEdges(more: DataFrame): NetworkFrame =
    copy(edges = edges.unionByName(more, allowMissingColumns = true))

  /** Conform the node table to a given id list: ids present keep their
    * attributes, missing ids appear with null attributes (pandas `reindex`,
    * networkframe.py:203-221). Edges re-induced.
    */
  def reindexNodes(index: DataFrame): NetworkFrame = {
    val idx = index.select(col(index.columns.head).as("id"))
    val n = idx.join(nodes, Seq("id"), "left_outer")
    copy(nodes = n, edges = induceEdges(edges, n))
  }

  /** Drop nodes that appear in no edge (networkframe.py:411-456). */
  def removeUnusedNodes(): NetworkFrame = {
    val used = edges.select(col("source").as("id"))
      .union(edges.select(col("target").as("id"))).distinct()
    copy(nodes = nodes.join(used, Seq("id"), "left_semi"))
  }

  /** Rectangular (bipartite-style) selection: edges with source in `rows`
    * AND target in `cols`; nodes = union of both id sets, deduplicated
    * (LocIndexer, networkframe.py:1552-1609).
    */
  def loc(rows: DataFrame, cols: DataFrame): NetworkFrame = {
    val r = rows.select(col(rows.columns.head).as("id"))
    val c = cols.select(col(cols.columns.head).as("id"))
    val e = edges
      .join(r.withColumnRenamed("id", "source"), Seq("source"), "left_semi")
      .join(c.withColumnRenamed("id", "target"), Seq("target"), "left_semi")
    val n = nodes.join(r.union(c).distinct(), Seq("id"), "left_semi")
    // the result is a non-induced rectangular frame: remember the row/col
    // index sets so sources/targets report them (networkframe.py:1604-1608)
    copy(nodes = n, edges = e, sourcesIndex = Some(r), targetsIndex = Some(c))
  }

  // --------------------------------------------------------------- joins

  /** Stamp node attribute columns onto edges as `source_{col}` /
    * `target_{col}` (networkframe.py:458-498; README.md:105-119). The node
    * table is usually the small side of THE enrichment join, but a
    * billion-node table must not be forced onto the driver: the broadcast
    * hint is applied only when Catalyst's size estimate for the projected
    * node columns fits `spark.sql.autoBroadcastJoinThreshold`; otherwise the
    * join is left unhinted and AQE picks the strategy at runtime.
    * axis: "source" | "target" | "both".
    */
  def applyNodeFeatures(columns: Seq[String], axis: String = "both"): NetworkFrame = {
    def maybeBroadcast(df: DataFrame): DataFrame = {
      val threshold = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
      if (threshold > 0 &&
          df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(threshold))
        broadcast(df)
      else df
    }
    var e = edges
    if (axis == "source" || axis == "both") {
      val src = nodes.select(
        col("id").as("source") +: columns.map(c => col(c).as(s"source_$c")): _*)
      e = e.join(maybeBroadcast(src), Seq("source"), "left_outer")
    }
    if (axis == "target" || axis == "both") {
      val tgt = nodes.select(
        col("id").as("target") +: columns.map(c => col(c).as(s"target_$c")): _*)
      e = e.join(maybeBroadcast(tgt), Seq("target"), "left_outer")
    }
    copy(edges = e)
  }

  /** Fraction of this frame's node ids present in `other` (networkframe.py:1225-1239). */
  def nodeAgreement(other: NetworkFrame): DataFrame = {
    val hits = nodes.select(col("id"))
      .join(other.nodes.select(col("id")), Seq("id"), "left_semi").count()
    val total = nodes.count()
    val frac = if (total == 0) 0.0 else hits.toDouble / total
    nodes.sparkSession.sql(s"SELECT CAST($frac AS DOUBLE) AS agreement")
  }

  // --------------------------------------------------------- aggregations

  /** Multi-edge dedup: one row per (source,target) with aggregated weight —
    * the canonical effective-edges op (networkframe.py:636-645). `weightCol`
    * None => count of parallel edges.
    */
  def effectiveEdges(weightCol: Option[String] = None, aggfunc: String = "sum"): DataFrame = {
    val agg: Column = weightCol match {
      case None      => count(lit(1)).as("weight")
      case Some(w)   => namedAgg(aggfunc, col(w)).as("weight")
    }
    edges.groupBy(col("source"), col("target")).agg(agg)
  }

  /** Group the frame by a node attribute (networkframe.py:1000-1073). */
  def groupbyNodes(by: String): NodeGroupBy = NodeGroupBy(this, Seq(by), "both")

  /** Multi-column / single-axis grouping (networkframe.py:1000-1073): `by`
    * may list several node columns (pandas list-valued `by`), and `axis`
    * selects which endpoint's nodes are grouped — "source" (pandas 0),
    * "target" (pandas 1), or "both".
    */
  def groupbyNodes(by: Seq[String], axis: String): NodeGroupBy =
    NodeGroupBy(this, by, axis)

  /** Quotient / condensation graph (networkframe.py:1513-1538): new nodes =
    * distinct values of `nodes[by]`; new edges = per-(source-group,
    * target-group) aggregate of edge values.
    */
  def condense(by: String, func: String = "size", weightName: String = "weight",
               column: Option[String] = None): NetworkFrame = {
    val e = groupbyNodes(by).applyEdges(func, column, weightName)
    val n = nodes.select(col(by).as("id")).distinct()
    NetworkFrame(n, e, directed)
  }

  /** Composite-key condensation (extension: the reference rejects
    * list-valued `by` in apply_edges, groupby.py:93-96): quotient node ids
    * are structs of the `bys` values, edges aggregate per (source-tuple,
    * target-tuple). Same single-shuffle shape as `condense`.
    */
  def condenseMulti(bys: Seq[String], func: String = "size",
                    weightName: String = "weight",
                    column: Option[String] = None): NetworkFrame = {
    require(bys.nonEmpty, "at least one grouping column")
    val enriched = applyNodeFeatures(bys, "both").edges
    val valueCol = column.map(col).getOrElse(lit(1))
    val e = enriched.groupBy(
        struct(bys.map(c => col(s"source_$c").as(c)): _*).as("source"),
        struct(bys.map(c => col(s"target_$c").as(c)): _*).as("target"))
      .agg(NetworkFrame.namedAgg(func, valueCol).as(weightName))
    val n = nodes.select(struct(bys.map(col): _*).as("id")).distinct()
    NetworkFrame(n, e, directed)
  }

  /** One layer of a multilayer frame (the reference DECLARES a
    * MultilayerNetworkFrame whose every body is `pass`, multilayer.py:4-23;
    * this stakes out that surface on our schema): layers live as an edge
    * column, so selecting a layer is a pushdown-friendly edge filter. Node
    * set is unchanged (layers share the node universe); compose with
    * `removeUnusedNodes()` for the induced view.
    */
  def layer(layerCol: String, value: Any): NetworkFrame =
    copy(edges = edges.filter(col(layerCol) === lit(value)))

  /** Condense EVERY layer in one grouped aggregation — layer is just an
    * extra shuffle key alongside the endpoint groups, so 10 or 10,000
    * layers cost the same single-shuffle plan (no per-layer driver loop).
    * Returns the quotient edge table (layer, source-group, target-group,
    * aggregate).
    */
  def condenseByLayer(layerCol: String, by: String, func: String = "size",
                      weightName: String = "weight",
                      column: Option[String] = None): DataFrame = {
    val enriched = applyNodeFeatures(Seq(by), "both").edges
    val valueCol = column.map(col).getOrElse(lit(1))
    enriched.groupBy(col(layerCol).as("layer"),
        col(s"source_$by").as("source"), col(s"target_$by").as("target"))
      .agg(NetworkFrame.namedAgg(func, valueCol).as(weightName))
  }

  /** In/out/total degree per node (isolated nodes get 0). */
  def degrees(): DataFrame = {
    val out = edges.groupBy(col("source").as("id")).agg(count(lit(1)).as("out_degree"))
    val in = edges.groupBy(col("target").as("id")).agg(count(lit(1)).as("in_degree"))
    nodes.select(col("id"))
      .join(out, Seq("id"), "left_outer")
      .join(in, Seq("id"), "left_outer")
      .na.fill(0L, Seq("out_degree", "in_degree"))
      .withColumn("degree", col("out_degree") + col("in_degree"))
  }

  /** Weighted degrees (node strength): per-node sums of a cent-quantized
    * edge weight over out-, in-, and both directions — the weighted
    * companion of `degrees()`, same two aggregations + two outer joins.
    */
  def strengths(weightCol: String): DataFrame = {
    // DECIMAL weights quantize in exact decimal arithmetic (0.29 * 100 is
    // exactly 29, where the double path floors 28.999... to 28); DOUBLE
    // weights keep double arithmetic to match engines that floor in binary
    val wq = edges.schema(weightCol).dataType match {
      case _: org.apache.spark.sql.types.DecimalType =>
        floor(col(weightCol) * 100).cast("long")
      case _ => floor(col(weightCol).cast("double") * 100).cast("long")
    }
    val out = edges.select(col("source").as("id"), wq.as("wq"))
      .groupBy("id").agg(sum("wq").as("out_strength_q"))
    val in = edges.select(col("target").as("id"), wq.as("wq"))
      .groupBy("id").agg(sum("wq").as("in_strength_q"))
    nodes.select(col("id"))
      .join(out, Seq("id"), "left_outer")
      .join(in, Seq("id"), "left_outer")
      .na.fill(0L, Seq("out_strength_q", "in_strength_q"))
      .withColumn("strength_q", col("out_strength_q") + col("in_strength_q"))
  }

  /** Dense adjacency as a wide DataFrame (networkframe.py:500-543): pivot on
    * target with an explicit (driver-bounded) value list. Export-only op —
    * schema width is bounded by the driver; do not use on large id spaces.
    */
  def toAdjacency(weightCol: String, targetValues: Seq[Any],
                  aggfunc: String = "sum"): DataFrame = {
    edges.groupBy(col("source"))
      .pivot("target", targetValues)
      .agg(namedAgg(aggfunc, col(weightCol)))
      .na.fill(0)
  }

  /** Sparse adjacency in COO form with POSITIONAL codes: (row, col, value)
    * where row/col are 0-based dense ranks of node id in id order
    * (networkframe.py:592-672 — `pd.Categorical` codes). Stays relational;
    * CSR materialization is a driver-side export concern.
    */
  def toSparseAdjacencyCoo(weightCol: Option[String] = None,
                           aggfunc: String = "sum"): DataFrame = {
    val pos = positionsById(nodes)
    val eff = effectiveEdges(weightCol, aggfunc)
    eff
      .join(pos.withColumnRenamed("id", "source").withColumnRenamed("pos", "row"), Seq("source"))
      .join(pos.withColumnRenamed("id", "target").withColumnRenamed("pos", "col"), Seq("target"))
      .select(col("row"), col("col"), col("weight").as("value"))
  }

  // ------------------------------------------------------------- exports

  /** Symmetrized edge list (source,target) + (target,source) — the
    * undirected interpretation used by weak connectivity / undirected BFS.
    */
  def symmetrizedEdges: DataFrame =
    edges.select(col("source"), col("target"))
      .union(edges.select(col("target").as("source"), col("source").as("target")))

  /** JSON envelope of both tables + directed flag (networkframe.py:1175-1191).
    * Driver-memory-bound by construction; for scale use write.parquet per table.
    */
  def toJsonLocal(): String = {
    val n = nodes.toJSON.collect().mkString("[", ",", "]")
    val e = edges.toJSON.collect().mkString("[", ",", "]")
    s"""{"nodes":$n,"edges":$e,"directed":$directed}"""
  }

  // ------------------------------------------------------------- equality

  /** Order-insensitive frame equality — the reference's `__eq__`
    * (networkframe.py:1114-1154): same node rows (ids + features) and the
    * same MULTISET of edge rows, ignoring row order and, like the reference
    * documents, ignoring edge indexing. Implemented as two-sided `exceptAll`
    * per table (multiset difference in both directions), which Catalyst
    * plans as hash aggregations — no driver materialization. Column sets
    * must match exactly (order-insensitively).
    */
  def frameEquals(other: NetworkFrame): Boolean = {
    def sameRows(a: DataFrame, b: DataFrame): Boolean = {
      if (a.columns.sorted.toSeq != b.columns.sorted.toSeq) return false
      val cols = a.columns.sorted.toSeq.map(col)
      val (x, y) = (a.select(cols: _*), b.select(cols: _*))
      x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
    }
    directed == other.directed &&
      sameRows(nodes, other.nodes) && sameRows(edges, other.edges)
  }

  /** The reference's `__ne__` (networkframe.py:1146-1154). */
  def frameNotEquals(other: NetworkFrame): Boolean = !frameEquals(other)
}

object NetworkFrame {

  /** Build from an edge table alone: nodes derived as distinct endpoints. */
  def fromEdges(edges: DataFrame, directed: Boolean = true): NetworkFrame = {
    val nodes = edges.select(col("source").as("id"))
      .union(edges.select(col("target").as("id"))).distinct()
    NetworkFrame(nodes, edges, directed)
  }

  /** 0-based dense rank of each node id in id order — the positional codes
    * of `to_sparse_adjacency` (networkframe.py:660-664, pd.Categorical).
    * Computed scalably: range-repartition by id + per-partition sort gives a
    * global order and `zipWithIndex` assigns contiguous global positions
    * (one lightweight extra job for partition offsets) — unlike a
    * `row_number() OVER (ORDER BY id)` window, which would funnel every row
    * through a single partition. The (id -> pos) mapping is a pure function
    * of the id set, so results are partitioning-independent.
    */
  def positionsById(nodes: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = nodes.sparkSession
    val ids = nodes.select(col("id"))
      .repartitionByRange(col("id")).sortWithinPartitions(col("id"))
    val schema = StructType(ids.schema.fields :+ StructField("pos", LongType, false))
    val rdd = ids.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Map the reference's string agg names (groupby.py:100-112,
    * networkframe.py:501) to codegen'd built-ins.
    */
  def namedAgg(name: String, c: Column): Column = name match {
    case "size" | "count" => count(lit(1))
    case "sum"            => sum(c)
    case "mean" | "avg"   => avg(c)
    case "max"            => max(c)
    case "min"            => min(c)
    case "any"            => max(c.cast("boolean")).cast("boolean")
    case "std"            => stddev_samp(c)
    case other            => throw new IllegalArgumentException(s"unknown agg: $other")
  }

  /** Substitute `@name` parameters with safely rendered SQL literals —
    * the Spark-side equivalent of pandas query `@var` binding
    * (networkframe.py:277-298). Longest names substitute first so a param
    * that is a prefix of another (`@min` vs `@minbal`) can never capture
    * the longer name's occurrences.
    */
  def bindParams(expr: String, params: Map[String, Any]): String =
    params.toSeq.sortBy(-_._1.length).foldLeft(expr) {
      case (e, (k, v)) => e.replace("@" + k, sqlLiteral(v))
    }

  private def sqlLiteral(v: Any): String = v match {
    case s: String => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case seq: Seq[_] => seq.map(sqlLiteral).mkString("(", ",", ")")
    case null => "NULL"
    case other => other.toString
  }
}

/** Grouped view of a NetworkFrame by node attributes (groupby.py:7-161).
  * `bys` may hold several columns (pandas list-valued `by`); `axis` is
  * "source" (pandas 0), "target" (pandas 1), or "both" — fixed at
  * construction like the reference (networkframe.py:1062-1070). Nothing
  * materializes at construction; aggregation ops compile to an enrichment
  * join + one hash aggregation (one shuffle on the group pair).
  */
final case class NodeGroupBy(frame: NetworkFrame, bys: Seq[String],
                             axis: String = "both") {
  require(bys.nonEmpty, "at least one grouping column")
  require(Set("source", "target", "both")(axis),
    "axis must be 'source', 'target', or 'both'")

  /** Single-key accessor; the edge-aggregation surface is single-key only,
    * exactly like the reference (groupby.py:92-98).
    */
  def by: String = {
    require(bys.size == 1,
      "Currently can only apply edges to a single group in `by` (groupby.py:93-96)")
    bys.head
  }

  private def requireBoth(): Unit = require(axis == "both",
    "Currently can only apply edges when groupby is 'both' (groupby.py:97-98)")

  private def srcCol = s"source_$by"
  private def tgtCol = s"target_$by"

  /** Quotient-graph edge aggregation (groupby.py:91-121): stamp the group of
    * each endpoint onto edges, then aggregate per (source-group, target-group).
    * Output columns: source, target, `weightName`.
    */
  def applyEdges(func: String, column: Option[String] = None,
                 weightName: String = "weight"): DataFrame = {
    requireBoth()
    val enriched = frame.applyNodeFeatures(Seq(by), "both").edges
    val valueCol = column.map(col).getOrElse(lit(1))
    enriched.groupBy(col(srcCol).as("source"), col(tgtCol).as("target"))
      .agg(NetworkFrame.namedAgg(func, valueCol).as(weightName))
  }

  /** Block-count matrix of the quotient graph (groupby.py:123-124). */
  def sizeEdges(weightName: String = "size"): DataFrame =
    applyEdges("size", None, weightName)

  /** Arbitrary-aggregate escape hatch (the reference's Callable aggfunc,
    * groupby.py:91-112 / networkframe.py:501): any Spark aggregate Column —
    * built-in, custom `Aggregator.toColumn`, or a registered UDAF — applied
    * per (source-group, target-group). Idiomatic replacement for opaque
    * Python callables: the expression stays inside codegen.
    */
  def applyEdgesExpr(agg: Column, weightName: String = "weight"): DataFrame = {
    requireBoth()
    val enriched = frame.applyNodeFeatures(Seq(by), "both").edges
    enriched.groupBy(col(srcCol).as("source"), col(tgtCol).as("target"))
      .agg(agg.as(weightName))
  }

  /** Group-key → member-count summaries (groupby.py:42-62, :147-161), over
    * the axis-appropriate bipartite node view; raises on the missing axis
    * like the reference's ValueError.
    */
  def sourceGroups: DataFrame = {
    require(axis != "target", "No source groups, groupby was on targets only")
    frame.sourceNodes.groupBy(bys.map(col): _*).agg(count(lit(1)).as("n_nodes"))
  }
  def targetGroups: DataFrame = {
    require(axis != "source", "No target groups, groupby was on sources only")
    frame.targetNodes.groupBy(bys.map(col): _*).agg(count(lit(1)).as("n_nodes"))
  }
  def groupKeys: DataFrame =
    (if (axis == "target") frame.targetNodes else frame.sourceNodes)
      .select(bys.map(col): _*).distinct()

  /** Group count — the reference's `__len__` (groupby.py:42-52): axis="both"
    * non-induced is the source-group x target-group product.
    */
  def nGroups(induced: Boolean = false): Long = axis match {
    case "both" if !induced =>
      sourceGroups.count() * targetGroups.count()
    case "target" => targetGroups.count()
    case _ => sourceGroups.count()
  }
}
