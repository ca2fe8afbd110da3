package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data pipelines.
  * No RNG anywhere: the bucket of a row is a pure function of its key
  * (first 8 hex digits of a salted MD5), so samples and train/val/test
  * splits are reproducible across engines, reruns, partitionings, and
  * cluster sizes — and a row keeps its assignment when the corpus grows
  * (stable holdout). Pure codegen'd expressions: a sample is a pushed-down
  * filter on a scan, a split is one projected column; nothing shuffles.
  */
object Sampling {

  /** Hash bucket in [0, buckets): `conv(md5(salt || key)[0,8), 16, 10) %
    * buckets`. 32 hash bits — bucket skew is negligible for buckets << 2^32.
    */
  def hashBucket(key: Column, buckets: Int = 100, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Keep rows whose bucket falls below `pct` of `buckets` — a ~pct/buckets
    * deterministic sample by key.
    */
  def sampleByHash(df: DataFrame, keyCol: String, pct: Int,
                   buckets: Int = 100, salt: String = ""): DataFrame =
    df.filter(hashBucket(col(keyCol), buckets, salt) < pct)

  /** Stratified deterministic sample: a per-stratum keep rate (percent of
    * `buckets`), e.g. downsample the head language while keeping the tail —
    * `rates = Map("en" -> 5)`, `defaultPct = 50`. Still one pushed-down
    * filter on the scan; the stratum column only feeds a when-chain, so
    * no shuffle and no per-stratum pass (vs `df.stat.sampleBy`, which is
    * seed-based, not key-stable).
    */
  def sampleStratified(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Seq[(String, Int)], defaultPct: Int = 100,
                       buckets: Int = 100, salt: String = ""): DataFrame = {
    val pct = rates.foldRight(lit(defaultPct)) { case ((v, p), acc) =>
      when(col(strataCol) === v, lit(p)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol), buckets, salt) < pct)
  }

  /** Cap each group at `k` rows, chosen deterministically: rank rows inside
    * a group by the salted MD5 of their key (a stable uniform order, so the
    * kept set is an unbiased sample of the group) and keep rank <= k. The
    * standard per-domain document cap. One shuffle on the group column;
    * Spark plans the rank filter as WindowGroupLimit, so each partition
    * keeps only k rows per group BEFORE the exchange (map-side top-k) —
    * a 100 TB corpus with a million-document domain never materializes
    * the whole domain on one executor's sort.
    */
  def capPerGroup(df: DataFrame, keyCol: String, groupCol: String, k: Int,
                  salt: String = ""): DataFrame = {
    require(k > 0, "positive cap required")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(concat(lit(salt), col(keyCol).cast("string"))), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Assign each row a named split from weighted ranges, e.g.
    * `Seq("train" -> 98, "val" -> 1, "test" -> 1)`: buckets = weight sum,
    * split = the range the row's bucket lands in. Adds a `split` column.
    */
  def hashSplit(df: DataFrame, keyCol: String, splits: Seq[(String, Int)],
                salt: String = ""): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive split weights required")
    val buckets = splits.map(_._2).sum
    val b = hashBucket(col(keyCol), buckets, salt)
    val bounds = splits.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    val assignment = splits.zip(bounds).foldRight(lit(null).cast("string")) {
      case (((name, _), hi), acc) => when(b < hi, lit(name)).otherwise(acc)
    }
    // foldRight nests whens in order, so the FIRST range containing the
    // bucket wins — equivalent to checking cumulative upper bounds in order
    df.withColumn("split", assignment)
  }

  /** Deterministic weighted sample of k rows without replacement: each row
    * gets priority = (hash32 * 10000) DIV wq — a salted 32-bit hash scaled
    * down by its cent-quantized weight (A-ES-style priority sampling with an
    * integer key instead of u^(1/w): heavier rows draw stochastically
    * smaller priorities, and the whole draw is a pure function of the key,
    * so it replays identically in any engine) — and the k smallest
    * priorities win (ties broken by key). Rows with non-positive weight are
    * excluded. The global top-k plans as TakeOrderedAndProject (per-partition
    * heap + driver merge of k rows), NOT a global sort — the 100 TB shape.
    */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String, k: Int,
                     salt: String = ""): DataFrame = {
    require(k > 0, "positive sample size required")
    val h32 = conv(substring(md5(concat(lit(salt), col(keyCol).cast("string"))),
      1, 8), 16, 10).cast("long")
    val wq = floor(col(weightCol).cast("double") * 100).cast("long")
    df.filter(wq > 0)
      .withColumn("__h", h32).withColumn("__wq", wq)
      .withColumn("priority", expr("(__h * 10000) div __wq"))
      .drop("__h", "__wq")
      .orderBy(col("priority"), col(keyCol))
      .limit(k)
  }

  /** Deterministic Poisson bootstrap: replicate b resamples each row with
    * multiplicity drawn from Poisson(1) — but the draw is the row's salted
    * 32-bit hash cut against fixed integer thresholds (the Poisson(1) CDF
    * at the 2^32 scale, tail capped at multiplicity 5), so every replicate
    * is a pure function of (key, b): reproducible across engines, reruns,
    * and partitionings. This is THE cluster-scale bootstrap — no
    * resampling shuffle, each partition accumulates mult-weighted partial
    * sums per replicate and the reduce is `replicates` tiny rows — giving
    * standard errors / CIs for any mean without moving data. Output per
    * replicate: n_eff (resampled row count), sum of cent-quantized values,
    * and the 1e6-scaled mean by integral division.
    */
  def poissonBootstrap(df: DataFrame, keyCol: String, valueCol: String,
                       replicates: Int = 10, salt: String = ""): DataFrame = {
    require(replicates >= 1, "at least one replicate")
    // cumulative Poisson(1) cut points at the 2^32 scale: P(X<=k) for
    // k = 0..4; hashes beyond the last cut resample the row 5 times
    val cuts = Seq(1580030169L, 3160060338L, 3950075422L, 4213413784L,
      4279248375L)
    val h = conv(substring(md5(concat(lit(salt), col(keyCol).cast("string"),
      lit(":"), col("b").cast("string"))), 1, 8), 16, 10).cast("long")
    val mult = cuts.zipWithIndex.foldRight(lit(5L)) {
      case ((cut, k), acc) => when(col("h") < cut, k.toLong).otherwise(acc)
    }
    df.select(col(keyCol), floor(col(valueCol).cast("double") * 100)
        .cast("long").as("cents"),
        explode(sequence(lit(0), lit(replicates - 1))).as("b"))
      .withColumn("h", h)
      .withColumn("mult", mult)
      .groupBy("b")
      .agg(sum("mult").as("n_eff"),
        sum((col("mult") * col("cents")).cast("decimal(38,0)")).as("sum_dec"))
      .selectExpr("CAST(b AS BIGINT) AS b", "n_eff",
        "CAST(sum_dec AS BIGINT) AS sum_cents",
        "CAST((sum_dec * 1000000) DIV n_eff AS BIGINT) AS mean_cents_ppm")
  }

  /** Equal-width feature binning over the global [min, max] range —
    * histogram/discretization in exact integer arithmetic: values
    * cent-quantize to longs, bin = (q - min) * bins DIV (max - min + 1)
    * (non-negative operands, so truncating DIV == floor in every engine;
    * the +1 keeps the max value inside the last bin). The 1-row min/max
    * aggregate broadcasts via crossJoin — no driver action, one scan + one
    * tiny agg + one group-by-bin shuffle. Output: one row per non-empty
    * bin (bin, n, lo_q, hi_q — the observed quantized range).
    */
  def featureBins(df: DataFrame, valueCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, "at least one bin")
    val q = floor(col(valueCol).cast("double") * 100).cast("long")
    val vals = df.select(q.as("q"))
    val mm = vals.agg(min("q").as("mn"), max("q").as("mx"))
    vals.crossJoin(broadcast(mm))
      .withColumn("bin", expr(s"(q - mn) * $bins div (mx - mn + 1)"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), min("q").as("lo_q"), max("q").as("hi_q"))
  }

  /** Deterministic multi-epoch training order: each epoch draws a fresh
    * pseudorandom permutation from the per-row key md5("ep<epoch>:" || id) —
    * no RNG state, so any shard of the order can be regenerated
    * independently (checkpoint-resumable data loading) and the order is
    * identical across engines, reruns, and cluster sizes. Rows land in
    * `buckets` shuffle files (the shard a data-loader worker reads) with a
    * dense rank inside each; the md5 key is uniform, so shard sizes are
    * balanced whatever the id distribution.
    *
    * Scale shape: one shuffle on (epoch, bucket) + a per-shard window
    * rank. Shards are a fixed-count partition of the corpus (corpus_size /
    * buckets rows each) — size `buckets` so a shard fits a data-loader
    * worker; the window sorts one shard per task, never a global order.
    */
  def epochShuffle(df: DataFrame, idCol: String, epochs: Int,
                   buckets: Int = 8): DataFrame = {
    require(epochs >= 1 && buckets >= 1, "epochs and buckets must be >= 1")
    val e = df.select(col(idCol).as("id"),
      explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
    val key = md5(concat(lit("ep"), col("epoch").cast("string"), lit(":"),
      col("id").cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("epoch", "bucket").orderBy(col("k"), col("id"))
    e.select(col("epoch").cast("int").as("epoch"), col("id"), key.as("k"))
      .withColumn("bucket",
        (conv(substring(col("k"), 1, 8), 16, 10).cast("long") % buckets)
          .cast("int"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("epoch", "bucket", "pos", "id")
  }
}
