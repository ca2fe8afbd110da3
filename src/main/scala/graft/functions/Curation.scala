package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftext.CappedCheckpoint._

/** Corpus-curation operators for training-data assembly: mixture weighting,
  * token-budget selection, importance reweighting, and distribution-drift
  * QA. These sit downstream of the dedup/quality family — they decide HOW
  * MUCH of each (already cleaned) slice enters a training run.
  *
  * Determinism discipline (matches the rest of `graft.functions`): every
  * order-sensitive accumulation is integral (LONG / DECIMAL(38,0)); the one
  * transcendental (sqrt for temperature scaling) is IEEE-754
  * correctly-rounded in every engine, applied to an exactly-representable
  * long, and floored to a long immediately — so results hash-match a DuckDB
  * oracle bit-for-bit at any parallelism.
  */
object Curation {

  /** Temperature-scaled mixture weights over corpus slices (the
    * multilingual-LM sampling scheme: w_g ∝ p_g^α with α = 1/2, the
    * up-weight-the-tail exponent). Token mass per group is an exact long;
    * p^(1/2) is computed as floor(sqrt(tokens) · 1000) — sqrt is the one
    * IEEE operation whose correct rounding is guaranteed everywhere, and
    * int64 < 2^53 converts to double exactly, so the quantized score is
    * engine-identical. All shares are integral ppm via DECIMAL DIV.
    *
    * Output per group: n_docs, n_tokens, raw_ppm (natural share), w_ppm
    * (α-tempered share), boost_ppm (w/raw — >1e6 means the sampler
    * up-weights the slice, i.e. the long tail).
    *
    * Scale shape: one map-side-combinable aggregation on the group key (the
    * only corpus-sized shuffle), then arithmetic over the group-count-sized
    * frame with a broadcast 1-row total — groups are data domains
    * (languages, sources): bounded cardinality however large the corpus.
    */
  def mixtureWeights(df: DataFrame, groupCol: String, textCol: String)
      : DataFrame = {
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), " ")).cast("long")).as("n_tokens"))
      .withColumn("s_q", floor(sqrt(col("n_tokens")) * 1000).cast("long"))
    val tot = g.agg(sum(col("n_tokens").cast("decimal(38,0)")).as("tt"),
      sum(col("s_q").cast("decimal(38,0)")).as("st"))
    g.crossJoin(broadcast(tot))
      .selectExpr(groupCol, "n_docs", "n_tokens",
        "CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000 DIV tt AS BIGINT) AS raw_ppm",
        "CAST(CAST(s_q AS DECIMAL(38,0)) * 1000000 DIV st AS BIGINT) AS w_ppm")
      .withColumn("boost_ppm",
        expr("CAST(CAST(w_ppm AS DECIMAL(38,0)) * 1000000 DIV nullif(raw_ppm, 0) AS BIGINT)"))
  }

  /** Token-budget curriculum selection: within each group, admit documents
    * in descending lexical-diversity order (distinct-token ratio in ppm —
    * the cheap single-pass quality proxy; swap any integral score in) until
    * the group's running token total exceeds `budgetTokens`. Returns the
    * admitted rows with their running totals, i.e. the per-domain training
    * slice for a fixed token budget.
    *
    * Scale shape: one shuffle on the group key + a per-group ordered
    * running sum. The window puts each group's docs through one task's
    * sort — acceptable when groups are domains of bounded size; for a
    * single giant group use the SNM discipline instead (RDD range-sort on
    * (score, id) + zipWithIndex prefix offsets) — semantics identical, and
    * the admission threshold becomes a rank lookup.
    */
  def budgetSample(df: DataFrame, idCol: String, groupCol: String,
                   textCol: String, budgetTokens: Long): DataFrame = {
    val toks = split(col(textCol), " ")
    val base = df.select(col(idCol).as("id"), col(groupCol).as("grp"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .withColumn("score_q",
        expr("CAST(n_distinct * 1000000L DIV n_tokens AS BIGINT)"))
    val w = Window.partitionBy("grp")
      .orderBy(col("score_q").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col("id"), col("grp").as(groupCol), col("n_tokens"),
        col("score_q"), col("cum_tokens"))
  }

  /** DSIR-style hashed importance weighting, with the log-likelihood ratio
    * replaced by a smoothed probability RATIO in ppm (a monotone transform
    * of the per-bucket LLR term — ln is not correctly-rounded across libms,
    * so the log form could never hash-match an oracle; ranking by summed
    * ratios preserves the "looks like the target distribution" ordering
    * that drives selection). Features are hashed unigrams:
    * bucket = md5(token) mod `buckets`; the target distribution is the
    * rows where `targetPred` holds; the raw distribution is the whole
    * input. Per bucket, ratio_ppm = 1e6 · p̂_target(b) / p̂_raw(b) with
    * add-one smoothing; a document scores the mean ratio of its tokens.
    *
    * Output: (id, n_tokens, imp_ppm) — select the top slice by imp_ppm to
    * skew raw data toward the target domain.
    *
    * Scale shape: the bucket-count table is one map-side-combinable
    * aggregation on a `buckets`-sized key; the ratio table (`buckets`
    * rows) broadcasts back onto the token stream; one groupBy(id) rollup.
    * Two passes over the tokenized corpus, zero wide joins. The ratio
    * table is the persistable artifact — at 100 TB train it once on a
    * sample and reuse it for every scoring scan.
    */
  def importanceRatio(df: DataFrame, idCol: String, textCol: String,
                      targetPred: Column, buckets: Int = 64): DataFrame = {
    val toks = df.select(col(idCol).as("id"), targetPred.as("is_t"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("b",
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % buckets)
    val counts = toks.groupBy("b").agg(
      count(lit(1)).as("cr"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"))
    val tot = counts.agg(sum(col("cr").cast("decimal(38,0)")).as("r"),
      sum(col("ct").cast("decimal(38,0)")).as("t"))
    val ratio = counts.crossJoin(broadcast(tot))
      .selectExpr("b",
        s"""CAST((CAST(ct + 1 AS DECIMAL(38,0)) * (r + $buckets) * 1000000)
           DIV (CAST(cr + 1 AS DECIMAL(38,0)) * (t + $buckets)) AS BIGINT)
           AS ratio_ppm""")
    toks.join(broadcast(ratio), Seq("b"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("ratio_ppm").cast("decimal(38,0)")).as("sum_ratio"))
      .selectExpr("id", "n_tokens",
        "CAST(sum_ratio DIV n_tokens AS BIGINT) AS imp_ppm")
  }

  /** Per-group distribution drift against the whole corpus: total-variation
    * distance (in ppm) between a group's token-length histogram and the
    * corpus-wide histogram — the "which slice is most atypical" QA
    * dashboard (the same statistic monitors ingest drift batch-over-batch).
    * Lengths bin at `binWidth` tokens, capped at `maxBin`; every share is
    * integral ppm, so TV = Σ|share_g − share_corpus| / 2 is exact.
    *
    * Scale shape: one aggregation on (group, bin) — at most
    * groups × (maxBin+1) rows — then a broadcast join of the
    * (maxBin+1)-row corpus histogram. Nothing downstream of the first
    * aggregation scales with the corpus.
    */
  def lengthDrift(df: DataFrame, groupCol: String, textCol: String,
                  binWidth: Int = 32, maxBin: Int = 15): DataFrame = {
    val b = least(
      expr(s"CAST(size(split(`$textCol`, ' ')) AS BIGINT) div ${binWidth}L"),
      lit(maxBin.toLong))
    val gb = df.select(col(groupCol).as("grp"), b.as("b"))
      .groupBy("grp", "b").agg(count(lit(1)).as("c"))
    val g = gb.groupBy("grp").agg(sum("c").as("cg"))
    val corpus = gb.groupBy("b").agg(sum("c").as("cb"))
    val tot = corpus.agg(sum(col("cb").cast("decimal(38,0)")).as("ctot"))
    // full group x observed-bin grid: a bin the group never hits still
    // contributes |0 - corpus share| to the distance — without the grid a
    // group concentrated in one bin would report half its true TV
    g.crossJoin(broadcast(corpus))
      .join(gb, Seq("grp", "b"), "left_outer")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .crossJoin(broadcast(tot))
      .selectExpr("grp", "b",
        "CAST(CAST(c AS DECIMAL(38,0)) * 1000000 DIV cg AS BIGINT) AS grp_ppm",
        "CAST(CAST(cb AS DECIMAL(38,0)) * 1000000 DIV ctot AS BIGINT) AS corpus_ppm")
      .groupBy(col("grp").as(groupCol))
      .agg(sum(abs(col("grp_ppm") - col("corpus_ppm"))).as("sum_abs"))
      .selectExpr(groupCol, "CAST(sum_abs div 2 AS BIGINT) AS tv_ppm")
  }

  /** Greedy maximum-coverage document selection — the (1 - 1/e)-optimal
    * submodular greedy (Nemhauser/Wolsey/Fisher, Math. Prog. 14, 1978),
    * the standard data-subset-selection baseline: k rounds, each picking
    * the document that covers the most not-yet-covered distinct tokens
    * (ties: min id). Returns the greedy trajectory
    * (pick, id, gain, covered = running total), so an unrolled-CTE oracle
    * replays every step.
    *
    * Cost: one tokenize pass builds the distinct (id, token) postings
    * (checkpointed); each round is one anti-join of postings against the
    * covered-token table + one count aggregation + a 1-row argmax collect
    * (driver-bounded, the MMR/BPE greedy-trajectory discipline). The
    * covered table grows by at most one document's vocabulary per round —
    * k is a serving-size constant, so total work is k postings-sized
    * passes, never a pair space.
    */
  def maxCoverageSelect(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 5, shingleLen: Int = 1): DataFrame = {
    import org.apache.spark.sql.graftext.CappedCheckpoint._
    require(k >= 1, "select at least one document")
    require(shingleLen >= 1, "shingleLen must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    // coverage unit: word shingleLen-grams (1 = unigrams; larger grams give
    // a universe that grows with the corpus instead of saturating at a
    // small vocabulary). TextAnalysis.shingles carries the
    // descending-sequence guard for short documents.
    val unit =
      if (shingleLen == 1) explode(split(col("__t"), " "))
      else explode(TextAnalysis.shingles(col("__t"), shingleLen))
    val postings = df
      .select(col(idCol).cast("long").as("id"), col(textCol).as("__t"))
      .select(col("id"), unit.as("tok"))
      .filter(length(col("tok")) > 0)
      .distinct().localCheckpointCapped()
    // the covered-token set is at most k document vocabularies — tiny — so
    // it BROADCASTS and each round is one map-side anti-join pass over the
    // (checkpointed once) postings table plus a map-combined count
    // aggregation; only the small covered set is re-checkpointed per round
    var covered: DataFrame = null
    var total = 0L
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    var p = 1
    var exhausted = false
    while (p <= k && !exhausted) {
      val remaining =
        if (covered == null) postings
        else postings.join(broadcast(covered), Seq("tok"), "left_anti")
      val top = remaining.groupBy("id").agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("id")).limit(1).collect()
      if (top.isEmpty || top(0).getLong(1) == 0L) exhausted = true
      else {
        val id = top(0).getLong(0); val gain = top(0).getLong(1)
        total += gain
        picks += ((p, id, gain, total))
        val newCov = postings.filter(col("id") === id).select("tok")
        covered = (if (covered == null) newCov else covered.union(newCov))
          .distinct().localCheckpointCapped()
        p += 1
      }
    }
    picks.toSeq.toDF("pick", "id", "gain", "covered")
  }

  /** Curriculum training order: easy-to-hard stages with deterministic
    * per-source interleave inside each stage — the "start on fluent text,
    * end on the hard tail, never feed one domain in a block" schedule.
    *
    * Stage assignment is an exact global ntile computed the scale-safe way:
    * RDD `sortBy((-score, id))` (range partition + per-partition sort) +
    * `zipWithIndex`, NEVER `row_number() OVER (ORDER BY score)` — a global
    * window funnels the corpus through one partition. Within a stage,
    * sources interleave: each doc ranks inside its (stage, source) slice by
    * md5 shuffle key, and pos = (in_src_rank - 1) * n_sources + src_idx —
    * strictly ordered, deterministic at any parallelism, and round-robin
    * across sources (positions are not dense when source sizes differ;
    * loaders sort by (stage, pos), they never need density). The source
    * index table is bounded-cardinality (data domains) and broadcast.
    *
    * Output: (id, stage, source, in_src_rank, pos). Two driver-side counts
    * (corpus size, source count) are the only actions.
    */
  def curriculumOrder(df: DataFrame, idCol: String, sourceCol: String,
                      scoreCol: String, stages: Int = 4): DataFrame = {
    require(stages >= 1, "at least one stage")
    val spark = df.sparkSession
    import spark.implicits._
    // materialize before the three downstream passes (count, the range
    // partitioner's sample, zipWithIndex offsets) — the RDD path does not
    // reuse the DataFrame plan's exchanges, so an unmaterialized upstream
    // (e.g. q_curriculum's bigram-join scoring) would re-execute 2-3x
    val keyed = df.select(col(scoreCol).cast("long").as("sc"),
      col(idCol).cast("long").as("id"), col(sourceCol).as("source"))
      .localCheckpointCapped()
    val n = math.max(keyed.count(), 1L)
    val ranked = keyed.as[(Long, Long, String)].rdd
      .sortBy { case (sc, id, _) => (-sc, id) }
      .zipWithIndex()
      .map { case ((_, id, src), rn) => (id, src, rn) }
      .toDF("id", "source", "rn")
    val staged = ranked
      .withColumn("stage", expr(s"CAST(rn * $stages DIV ${n}L AS INT)"))
    val srcIdx = staged.select("source").distinct()
      .withColumn("src_idx",
        row_number().over(Window.orderBy("source")).cast("long") - 1)
    val m = srcIdx.count()
    val w = Window.partitionBy("stage", "source")
      .orderBy(md5(concat(lit("cur:"), col("id").cast("string"))), col("id"))
    staged.join(broadcast(srcIdx), Seq("source"))
      .withColumn("in_src_rank", row_number().over(w).cast("long"))
      .select(col("id"), col("stage"), col("source"), col("in_src_rank"),
        (expr(s"(in_src_rank - 1) * ${m}L") + col("src_idx")).as("pos"))
  }

  /** Per-source ablation profile — "what does the corpus look like WITHOUT
    * this source?", the screening pass run before any expensive
    * leave-one-out retraining: for every source, the document count, token
    * mass, and mean document length of the COMPLEMENT corpus (all other
    * sources), plus the source's own token share.
    *
    * The 100 TB shape is the point: complements are computed as
    * totals-minus-group over the per-source aggregate table — ONE
    * map-side-combinable corpus scan keyed on the (bounded-cardinality)
    * source, one broadcast 1-row total, zero per-source corpus rescans.
    * The naive form (|sources| anti-join rescans) reads the corpus
    * |sources| times; this reads it once.
    *
    * Output per source: n_docs, n_tokens, share_ppm (this source's token
    * share), rest_docs, rest_tokens, rest_avg_tokens_q (1e6-scaled mean
    * doc length of the complement; 0 when this source IS the corpus).
    */
  def sourceAblation(df: DataFrame, sourceCol: String, textCol: String)
      : DataFrame = {
    val g = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col(textCol)).cast("decimal(38,0)"))
          .cast("long").as("n_tokens"))
    val tot = g.agg(sum(col("n_docs").cast("decimal(38,0)")).cast("long").as("t_docs"),
      sum(col("n_tokens").cast("decimal(38,0)")).cast("long").as("t_tokens"))
    g.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        // DECIMAL(38,0) before the 1e6 scale: corpus token counts past
        // ~9.2e12 would otherwise wrap the int64 product at 100 TB scale
        expr("CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000 DIV t_tokens AS BIGINT)")
          .as("share_ppm"),
        (col("t_docs") - col("n_docs")).as("rest_docs"),
        (col("t_tokens") - col("n_tokens")).as("rest_tokens"),
        when(col("t_docs") - col("n_docs") > 0,
          expr("""CAST(CAST(t_tokens - n_tokens AS DECIMAL(38,0)) * 1000000
                  DIV (t_docs - n_docs) AS BIGINT)"""))
          .otherwise(0L).as("rest_avg_tokens_q"))
  }
}
