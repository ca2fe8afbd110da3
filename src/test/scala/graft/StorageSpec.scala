package graft

import org.scalatest.funsuite.AnyFunSuite

class StorageSpec extends AnyFunSuite with SparkFixture {

  test("bucketed round-trip preserves the frame and carries the bucket spec") {
    val nf = simpleNf
    Storage.writeBucketed(nf, "graft_spec_bucketed", buckets = 4, mirror = true)
    val back = Storage.readBucketed(spark, "graft_spec_bucketed")
    assert(back.validate().numNodes == 4L && back.numEdges == 4L)
    assert(Storage.readEdgesByTarget(spark, "graft_spec_bucketed").count() == 4L)
    // the reloaded edge scan reports its bucket layout
    val cat = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("graft_spec_bucketed_edges"))
    assert(cat.bucketSpec.exists(b => b.numBuckets == 4 && b.bucketColumnNames == Seq("source")))
    // an aggregation on the bucket key plans without a shuffle exchange
    val agg = back.edges.groupBy("source").count()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(source"))
  }
}
