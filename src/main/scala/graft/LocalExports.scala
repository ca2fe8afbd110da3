package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CappedCheckpoint._

/** Driver-side exports and iterator conveniences — the reference APIs that
  * inherently materialize on one machine (`to_sparse_adjacency` CSR,
  * `to_networkx`, `to_torch_geometric`, the generator-shaped iteration APIs,
  * networkframe.py:545-719, :785-819, :1309-1330, groupby.py:64-81).
  * Everything here collects to the driver by design and is documented as
  * driver-memory-bound; the distributed engine never depends on these.
  */
object LocalExports {

  /** CSR adjacency arrays (indptr, colIndices, values, n) from the
    * positional COO (networkframe.py:592-672's csr export).
    */
  def toLocalCsr(nf: NetworkFrame, weightCol: Option[String] = None,
                 aggfunc: String = "sum"): (Array[Long], Array[Long], Array[Double], Int) = {
    val n = nf.nodes.count().toInt
    val coo = nf.toSparseAdjacencyCoo(weightCol, aggfunc)
      .orderBy("row", "col")
      .collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1), r.get(2) match {
        case d: java.math.BigDecimal => d.doubleValue()
        case x: Number => x.doubleValue()
      }))
    val indptr = new Array[Long](n + 1)
    coo.foreach { case (r, _, _) => indptr(r + 1) += 1 }
    (1 to n).foreach(i => indptr(i) += indptr(i - 1))
    (indptr, coo.map(_._2), coo.map(_._3), n)
  }

  /** LIL adjacency (list-of-lists: per-row arrays of (col, value)) — the
    * reference's `to_sparse_adjacency(format="lil")`
    * (networkframe.py:652-668). Rows with no entries are empty arrays, so
    * the outer array always has exactly `n` rows in positional order.
    * Driver-bound like every export here; built from the same positional
    * COO as `toLocalCsr`.
    */
  def toLocalLil(nf: NetworkFrame, weightCol: Option[String] = None,
                 aggfunc: String = "sum"): (Array[Array[(Long, Double)]], Int) = {
    val n = nf.nodes.count().toInt
    val rows = Array.fill(n)(List.empty[(Long, Double)])
    nf.toSparseAdjacencyCoo(weightCol, aggfunc)
      .orderBy(desc("row"), desc("col")) // prepend in reverse = ascending lists
      .collect()
      .foreach { r =>
        val row = r.getLong(0).toInt
        val v = r.get(2) match {
          case d: java.math.BigDecimal => d.doubleValue()
          case x: Number => x.doubleValue()
        }
        rows(row) = (r.getLong(1), v) :: rows(row)
      }
    (rows.map(_.toArray), n)
  }

  /** PyG-style export (networkframe.py:677-719): positional 2 x E edge index
    * (undirected graphs get reversed edges appended, matching the
    * reference's concatenation) + numeric node-feature matrix in node-id
    * order with nulls as 0 (the reference's fillna(0)).
    */
  def toTorchGeometricLocal(nf: NetworkFrame, directed: Boolean = true)
      : (Array[Array[Long]], Array[Array[Double]]) = {
    val pos = NetworkFrame.positionsById(nf.nodes)
    val base = nf.edges
      .join(pos.withColumnRenamed("id", "source").withColumnRenamed("pos", "sp"), Seq("source"))
      .join(pos.withColumnRenamed("id", "target").withColumnRenamed("pos", "tp"), Seq("target"))
      .select(col("sp").cast("long"), col("tp").cast("long"))
    val withRev = if (directed) base
      else base.union(base.select(col("tp"), col("sp")))
    val pairs = withRev.collect().map(r => (r.getLong(0), r.getLong(1)))
    val edgeIndex = Array(pairs.map(_._1), pairs.map(_._2))
    val numericCols = nf.nodes.schema.fields.collect {
      case f if f.name != "id" && f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] => f.name
    }
    val feats = nf.nodes.orderBy("id")
      .select(numericCols.map(c => coalesce(col(c).cast("double"), lit(0.0)).as(c)).toSeq: _*)
      .collect().map(r => numericCols.indices.map(r.getDouble).toArray)
    (edgeIndex, feats)
  }

  /** Node-link JSON (the `to_networkx` data shape, networkframe.py:545-590)
    * — all node and edge attributes carried through.
    */
  def toNetworkxJson(nf: NetworkFrame): String = {
    val nodes = nf.nodes.toJSON.collect().mkString("[", ",", "]")
    val links = nf.edges.toJSON.collect().mkString("[", ",", "]")
    s"""{"directed":${nf.directed},"multigraph":true,"nodes":$nodes,"links":$links}"""
  }

  /** Rebuild a NetworkFrame from a `toJsonLocal` envelope
    * (`from_dict`/`from_json`, networkframe.py:1193-1223).
    */
  def fromJson(spark: SparkSession, json: String): NetworkFrame = {
    import spark.implicits._
    val env = spark.read.json(Seq(json).toDS)
    val nodes = env.select(explode(col("nodes")).as("n")).select("n.*")
    val edges = env.select(explode(col("edges")).as("e")).select("e.*")
    val directed = env.select("directed").first().getBoolean(0)
    NetworkFrame(nodes, edges, directed)
  }

  /** Pandas-orient dict/JSON export — `to_dict`/`to_json` orients
    * (networkframe.py:1156-1191): "records" (list of row objects),
    * "dict"/"columns" ({col: {index: value}}), "index" ({index: {col:
    * value}}). The node index is `id` (the reference's DataFrame index);
    * the edge index is positional over the all-column-sorted edge rows (the
    * reference treats the edge index as disposable, networkframe.py:256).
    * Driver-bound by design, like every export here. Uses Jackson from
    * Spark's own classpath.
    */
  def toDictJson(nf: NetworkFrame, orient: String = "records"): String = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.databind.node.ObjectNode
    val m = new ObjectMapper()
    def table(df: DataFrame, indexCol: Option[String]): com.fasterxml.jackson.databind.JsonNode = {
      val cols = df.columns.filterNot(indexCol.contains)
      val rows = df.toJSON.collect().map(m.readTree(_).asInstanceOf[ObjectNode])
      def v(r: ObjectNode, c: String) = Option[com.fasterxml.jackson.databind.JsonNode](r.get(c))
        .getOrElse(m.getNodeFactory.nullNode()) // toJSON omits null fields
      def key(r: ObjectNode, i: Int) =
        indexCol.map(ic => r.get(ic).asText).getOrElse(i.toString)
      orient match {
        case "records" =>
          val arr = m.createArrayNode(); rows.foreach(arr.add); arr
        case "dict" | "columns" =>
          val out = m.createObjectNode()
          cols.foreach { c =>
            val co = out.putObject(c)
            rows.zipWithIndex.foreach { case (r, i) => co.set[ObjectNode](key(r, i), v(r, c)) }
          }
          out
        case "index" =>
          val out = m.createObjectNode()
          rows.zipWithIndex.foreach { case (r, i) =>
            val o = out.putObject(key(r, i))
            cols.foreach(c => o.set[ObjectNode](c, v(r, c)))
          }
          out
        case other => throw new IllegalArgumentException(s"unknown orient: $other")
      }
    }
    val root = m.createObjectNode()
    root.set[ObjectNode]("nodes", table(nf.nodes.orderBy("id"), Some("id")))
    root.set[ObjectNode]("edges",
      table(nf.edges.orderBy(nf.edges.columns.map(col).toSeq: _*), None))
    root.put("directed", nf.directed)
    m.writeValueAsString(root)
  }

  /** Rebuild from a `toDictJson` envelope in any supported orient —
    * `from_dict(d, orient)` (networkframe.py:1193-1223). Index keys become
    * the `id` column for nodes (numeric when parseable, mirroring the
    * reference's `index_dtype=int` default; strings otherwise).
    */
  def fromDictJson(spark: SparkSession, json: String,
                   orient: String = "records"): NetworkFrame = {
    import com.fasterxml.jackson.databind.ObjectMapper
    import com.fasterxml.jackson.databind.node.ObjectNode
    import scala.jdk.CollectionConverters._
    val m = new ObjectMapper()
    val root = m.readTree(json)
    def putId(o: ObjectNode, k: String): Unit =
      try { o.put("id", k.toLong); () }
      catch { case _: NumberFormatException => o.put("id", k); () }
    def records(node: com.fasterxml.jackson.databind.JsonNode,
                isNodes: Boolean): Seq[String] = orient match {
      case "records" => node.elements().asScala.map(_.toString).toSeq
      case "dict" | "columns" =>
        val cols = node.fieldNames().asScala.toSeq
        val keys = scala.collection.mutable.LinkedHashSet.empty[String]
        cols.foreach(c => node.get(c).fieldNames().asScala.foreach(keys += _))
        keys.toSeq.map { k =>
          val o = m.createObjectNode()
          if (isNodes) putId(o, k)
          cols.foreach { c =>
            val cell = node.get(c).get(k)
            if (cell != null) o.set[ObjectNode](c, cell)
          }
          o.toString
        }
      case "index" =>
        node.fields().asScala.map { e =>
          val o = e.getValue.deepCopy[ObjectNode]()
          if (isNodes) putId(o, e.getKey)
          o.toString
        }.toSeq
      case other => throw new IllegalArgumentException(s"unknown orient: $other")
    }
    import spark.implicits._
    val nodes = spark.read.json(records(root.get("nodes"), isNodes = true).toDS())
    val edges = spark.read.json(records(root.get("edges"), isNodes = false).toDS())
    val directed = !root.has("directed") || root.get("directed").asBoolean
    NetworkFrame(nodes, edges, directed)
  }

  /** Per-component subframes — the reference's `connected_components`
    * iterator (networkframe.py:785-819). Driver iteration over the distinct
    * labels; each yielded frame is a lazily-filtered view.
    */
  def connectedComponentFrames(nf: NetworkFrame, connection: String = "weak")
      : Iterator[(Any, NetworkFrame)] = {
    val labels = GraphAlgorithms.componentLabels(nf, connection).localCheckpointCapped()
    val keys = labels.select("component").distinct().orderBy("component")
      .collect().map(_.get(0))
    keys.iterator.map { k =>
      val ids = labels.filter(col("component") === lit(k)).select("id")
      k -> nf.copy(
        nodes = nf.nodes.join(ids, Seq("id"), "left_semi"),
        edges = nf.edges
          .join(ids.withColumnRenamed("id", "source"), Seq("source"), "left_semi")
          .join(ids.withColumnRenamed("id", "target"), Seq("target"), "left_semi"))
    }
  }

  /** Per-ego k-hop subframes — `k_hop_decomposition` (networkframe.py:1309-1330).
    * Small-graph API: one BFS per ego on demand.
    */
  def kHopDecomposition(nf: NetworkFrame, k: Int, directed: Boolean = false)
      : Iterator[(Any, NetworkFrame)] = {
    val ids = nf.nodes.select("id").orderBy("id").collect().map(_.get(0))
    ids.iterator.map(id => id -> GraphAlgorithms.kHopNeighborhood(nf, id, k, directed))
  }

  // group keys for an axis, each as a Seq[Any] over g.bys, in sorted order
  private def axisKeys(g: NodeGroupBy, nodes: DataFrame): Array[Seq[Any]] =
    nodes.select(g.bys.map(col): _*).distinct()
      .orderBy(g.bys.map(col): _*)
      .collect().map(_.toSeq)

  private def idsForKey(g: NodeGroupBy, nodes: DataFrame, key: Seq[Any]): DataFrame =
    nodes.filter(g.bys.zip(key).map { case (c, v) => col(c) <=> lit(v) }
      .reduce(_ && _)).select("id")

  // single-column keys unwrap to the bare value (pandas group-name shape)
  private def scalarize(key: Seq[Any]): Any =
    if (key.size == 1) key.head else key

  /** Grouped subframe iteration — `NodeGroupBy.__iter__` (groupby.py:64-81):
    * the cartesian product of source-groups x target-groups, each subframe a
    * rectangular `loc` selection. `induced=true` keeps only the diagonal.
    * Multi-column `bys` yield Seq-valued group keys (pandas tuple names).
    */
  def groupFrames(g: NodeGroupBy, induced: Boolean = false)
      : Iterator[((Any, Any), NetworkFrame)] = {
    val sKeys = axisKeys(g, g.frame.sourceNodes)
    val tKeys = axisKeys(g, g.frame.targetNodes)
    (for {
      sk <- sKeys.iterator
      tk <- tKeys.iterator if !induced || sk == tk
    } yield {
      val rows = idsForKey(g, g.frame.sourceNodes, sk)
      val cols_ = idsForKey(g, g.frame.targetNodes, tk)
      (scalarize(sk), scalarize(tk)) -> g.frame.loc(rows, cols_)
    })
  }

  /** Single-axis grouped iteration — `NodeGroupBy.__iter__` for axis=
    * "source"/"target" (groupby.py:76-81): one subframe per group, the other
    * side unrestricted. (The reference's own axis=0 branch calls single-arg
    * `loc`, which its LocIndexer rejects (networkframe.py:1560-1568) — this
    * implements the documented intent via the rectangular form.)
    */
  def groupFramesAxis(g: NodeGroupBy): Iterator[(Any, NetworkFrame)] = {
    require(g.axis != "both", "use groupFrames for axis=both")
    val all = g.frame.nodes.select("id")
    val nodes = if (g.axis == "target") g.frame.targetNodes else g.frame.sourceNodes
    axisKeys(g, nodes).iterator.map { k =>
      val ids = idsForKey(g, nodes, k)
      val sub = if (g.axis == "source") g.frame.loc(ids, all)
                else g.frame.loc(all, ids)
      scalarize(k) -> sub
    }
  }
}
