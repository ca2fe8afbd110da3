package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-structured (JSON) column handling for event/metadata ingestion:
  * typed extraction from JSON string columns with codegen'd path evaluation
  * (`get_json_object` — no UDFs), and the aggregations a pipeline runs over
  * the extracted values. At 100 TB the JSON parse is a per-row scan cost
  * with no shuffle; for hot paths, promote frequently-read keys to real
  * columns at ingestion (`withExtracted` is exactly that projection).
  */
object SemiStructured {

  /** A JSON path value as a typed column (null on missing/mismatch). */
  def jsonLong(jsonCol: Column, path: String): Column =
    get_json_object(jsonCol, path).cast("long")

  def jsonString(jsonCol: Column, path: String): Column =
    get_json_object(jsonCol, path)

  /** Promote JSON keys to real typed columns — the schema-on-read ->
    * schema-on-write step of an ingestion pipeline.
    */
  def withExtracted(df: DataFrame, jsonCol: String,
                    paths: Map[String, String]): DataFrame =
    paths.foldLeft(df) { case (d, (name, path)) =>
      d.withColumn(name, jsonLong(col(jsonCol), path))
    }

  /** Per-type aggregate of a numeric JSON property: count, exact sum
    * (decimal accumulation), min/max. One shuffle on the group key with
    * map-side partial aggregation.
    */
  def propsAggByType(events: DataFrame, jsonCol: String = "props",
                     path: String = "$.k",
                     typeCol: String = "event_type"): DataFrame = {
    val k = jsonLong(col(jsonCol), path)
    events.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n"),
        sum(k.cast("decimal(38,0)")).cast("long").as("k_sum"),
        min(k).as("k_min"),
        max(k).as("k_max"))
  }
}
