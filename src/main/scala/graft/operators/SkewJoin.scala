package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Sampling

/** Skew-mitigating equi-join — the manual form of what AQE's skew-join
  * splitting does at runtime, for when the hot keys are known to be
  * pathological (a handful of node ids owning a double-digit share of a
  * 100 TB edge table) or AQE's post-shuffle splitting is not enough.
  *
  * The probe (large, skewed) side gets a deterministic salt in
  * [0, salts) hashed from `saltBy` columns; the build (smaller) side is
  * replicated once per salt value; the join key becomes (key, salt). A hot
  * key's rows then spread across `salts` reducers instead of hot-spotting
  * one, at the cost of a `salts`x blowup of the BUILD side only. Salting
  * reshapes the shuffle, not the semantics: the result is row-identical to
  * the plain join (each probe row meets exactly the one build replica
  * carrying its salt).
  */
object SkewJoin {

  /** @param probe  large/skewed side; all columns preserved
    * @param build  side to replicate (keep it the smaller one)
    * @param keys   equi-join key columns present on both sides
    * @param salts  number of salt partitions a hot key spreads over
    * @param saltBy probe columns hashed into the salt; pick columns that
    *               vary WITHIN a hot key (e.g. the edge's other endpoint),
    *               else the salt cannot spread it
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 salts: Int, saltBy: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one join key")
    require(salts >= 1, "salts must be >= 1")
    require(saltBy.nonEmpty, "saltBy columns required")
    val saltExpr = Sampling.hashBucket(
      concat_ws("|", saltBy.map(c => col(c).cast("string")): _*), salts)
      .cast("int")
    val p = probe.withColumn("__salt", saltExpr)
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, keys :+ "__salt").drop("__salt")
  }
}
