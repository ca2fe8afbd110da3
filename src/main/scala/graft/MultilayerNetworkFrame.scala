package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multilayer network view: one shared node universe, edges tagged by a
  * layer column (the reference DECLARES this surface with every body `pass`,
  * multilayer.py:4-23; this implements the documented intent on our
  * schema).
  *
  * Design: a layer is DATA, not structure — the layer id lives as an edge
  * column, so "per layer" is always either a pushdown-friendly edge filter
  * (single-layer views) or one extra shuffle key (all-layer aggregates).
  * Nothing here loops over layers on the driver: 10 or 10,000 layers cost
  * the same plans, which is what makes the surface usable when the layer
  * key is e.g. a source/domain column at 100 TB.
  */
final case class MultilayerNetworkFrame(frame: NetworkFrame,
                                        layerCol: String = "layer") {

  /** Single-layer view (pushdown edge filter; node universe unchanged). */
  def layer(value: Any): NetworkFrame = frame.layer(layerCol, value)

  /** Distinct layer ids. */
  def layerIds: DataFrame = frame.edges.select(col(layerCol).as("layer")).distinct()

  /** Per-layer summary: edge count + active endpoint count — one grouped
    * aggregation for the edge stats plus one for the distinct-endpoint
    * count (endpoints unioned before the distinct so each (layer, id) pair
    * is counted once).
    */
  def layerSummary(weightCol: Option[String] = None): DataFrame = {
    val aggs = count(lit(1)).as("n_edges") +:
      weightCol.map(w => sum(col(w)).as("w_sum")).toSeq
    val base = frame.edges.groupBy(col(layerCol).as("layer"))
      .agg(aggs.head, aggs.tail: _*)
    val active = frame.edges
      .select(col(layerCol).as("layer"), col("source").as("id"))
      .union(frame.edges.select(col(layerCol).as("layer"), col("target").as("id")))
      .distinct()
      .groupBy("layer").agg(count(lit(1)).as("n_active_nodes"))
    base.join(active, Seq("layer"))
  }

  /** Node filtering with re-induction (delegates to
    * [[NetworkFrame.queryNodes]]): because layers share the node universe
    * and induction is a pair of semi joins on endpoint ids, ONE induction
    * pass serves every layer — the layer column rides along untouched.
    */
  def queryNodes(expr: String, params: Map[String, Any] = Map.empty): MultilayerNetworkFrame =
    copy(frame = frame.queryNodes(expr, params))

  /** Edge filtering (layer column is addressable in the expression). */
  def queryEdges(expr: String, params: Map[String, Any] = Map.empty): MultilayerNetworkFrame =
    copy(frame = frame.queryEdges(expr, params))

  /** [[NetworkFrame.effectiveEdges]] parameterized by layer: one row per
    * (layer, source, target) — layer is just an extra group key, so the
    * all-layers aggregate is the SAME single shuffle as the flat one.
    */
  def effectiveEdgesByLayer(weightCol: Option[String] = None,
                            aggfunc: String = "sum"): DataFrame = {
    val agg: Column = weightCol match {
      case None    => count(lit(1)).as("weight")
      case Some(w) => NetworkFrame.namedAgg(aggfunc, col(w)).as("weight")
    }
    frame.edges.groupBy(col(layerCol).as("layer"), col("source"), col("target"))
      .agg(agg)
  }

  /** Per-(layer, node) in/out/total degree for layer-ACTIVE nodes (a node
    * row appears only in layers where it has an edge — the nodes x layers
    * cross space is deliberately never materialized). Two grouped
    * aggregations + one outer merge, the layered `degrees()`.
    */
  def degreesByLayer(): DataFrame = {
    val out = frame.edges.groupBy(col(layerCol).as("layer"), col("source").as("id"))
      .agg(count(lit(1)).as("out_degree"))
    val in = frame.edges.groupBy(col(layerCol).as("layer"), col("target").as("id"))
      .agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("layer", "id"), "full_outer")
      .na.fill(0L, Seq("out_degree", "in_degree"))
      .withColumn("degree", col("out_degree") + col("in_degree"))
  }

  /** Multiplex node activity: per node, the number of layers it is active
    * in and its total edge incidence across layers — the "is this node a
    * single-layer or cross-layer hub" profile. One distinct + two aggs.
    */
  def nodeActivity(): DataFrame = {
    val inc = frame.edges.select(col(layerCol).as("layer"), col("source").as("id"))
      .union(frame.edges.select(col(layerCol).as("layer"), col("target").as("id")))
    inc.groupBy("id")
      .agg(countDistinct("layer").as("n_layers"),
        count(lit(1)).as("n_incident"))
  }

  /** Pairwise layer overlap: for each layer pair (a < b), how many distinct
    * (source, target) keys appear in BOTH — the multiplex edge-overlap
    * matrix. Shuffle key is the edge key (the per-key layer lists join
    * layer-deduped edge sets, never the pair-of-edges space); a key present
    * in L layers contributes C(L,2) rows before the count, so skew is
    * bounded by the LAYER count, not the corpus.
    */
  def layerOverlap(): DataFrame = {
    val keys = frame.edges.select(col(layerCol).as("layer"),
      col("source"), col("target")).distinct()
    keys.as("a").join(keys.as("b"),
        col("a.source") === col("b.source") && col("a.target") === col("b.target") &&
          col("a.layer") < col("b.layer"))
      .groupBy(col("a.layer").as("layer_a"), col("b.layer").as("layer_b"))
      .agg(count(lit(1)).as("n_shared_edges"))
  }

  /** Flatten across layers: the plain effective-edges aggregate of the
    * underlying frame (layer column dropped from the group key).
    */
  def aggregateLayers(weightCol: Option[String] = None,
                      aggfunc: String = "sum"): DataFrame =
    frame.effectiveEdges(weightCol, aggfunc)

  /** Per-layer quotient (delegates to [[NetworkFrame.condenseByLayer]]). */
  def condense(by: String, func: String = "size", weightName: String = "weight",
               column: Option[String] = None): DataFrame =
    frame.condenseByLayer(layerCol, by, func, weightName, column)
}
