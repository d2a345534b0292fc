package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data mixing — the stage after curation in a training-data pipeline:
  * compose the final corpus by sampling each source down to a token
  * budget (upweight wiki-ish sources, downweight crawl-ish ones).
  *
  * The keep decision is `md5Bucket(key, 10000) < floor(min(1,
  * budget/total)·10000)` — a pure function of the key and the
  * per-source totals, so the sample is reproducible across runs,
  * engines, and repartitionings (the [[TextFunctions.hashSplit]]
  * discipline), monotone in the budget (a bigger budget keeps a
  * superset), and exactly mirrorable in the DuckDB oracle. Expected
  * kept token volume per source is its budget (quantized to 1e-4 of
  * the keep rate; sampling noise is doc-level, not token-level).
  *
  * Cost at corpus scale: one map-side-combined aggregate for the
  * per-source totals (|sources| rows), then one filtered scan with the
  * rates dim broadcast — no corpus shuffle, no collect.
  */
object Mixture {

  /** Per-source token-budget sample of `docs`: the rows of (idCol,
    * sourceCol, n_tokens) whose source survives its budget. `budgets`
    * is a (sourceCol, token_budget) dim; sources without a budget row
    * are dropped (an explicit mixture lists every source it wants). */
  def tokenBudgetMixture(docs: DataFrame, idCol: String, sourceCol: String,
                         textCol: String, budgets: DataFrame): DataFrame =
    tokenBudgetMixtureCounts(
      docs.select(col(idCol), col(sourceCol),
        TextFunctions.tokenCount(col(textCol)).as("n_tokens")),
      idCol, sourceCol, "n_tokens", budgets)
      .select(col(idCol), col(sourceCol), col("n_tokens"))

  /** Core of [[tokenBudgetMixture]] over precomputed per-doc token
    * counts (`tokCol`) — for callers whose docs are already scored
    * (e.g. the c06 export pipeline mixing curated survivors). All
    * input columns pass through. */
  def tokenBudgetMixtureCounts(toks: DataFrame, idCol: String,
                               sourceCol: String, tokCol: String,
                               budgets: DataFrame): DataFrame = {
    val totals = toks.groupBy(col(sourceCol))
      .agg(sum(col(tokCol).cast("long")).as("__total"))
    val rates = totals.join(budgets, sourceCol)
      .select(col(sourceCol),
        floor(least(lit(1.0),
          col("token_budget").cast("double") / col("__total")) * 10000)
          .as("__keep"))
    toks.join(broadcast(rates), sourceCol)
      .filter(TextFunctions.md5Bucket(col(idCol), 10000) < col("__keep"))
      .drop("__keep")
  }

  /** Token-budget mixture WITH upsampling — the clamp-free
    * generalization of [[tokenBudgetMixture]]: a source whose budget
    * exceeds its token volume is REPEATED (the per-source epoch count
    * training mixtures express as weight > 1). With `w =
    * budget/total`, every doc gets `floor(w)` full copies plus one
    * more iff its hash lands under the fractional rate — so expected
    * token volume is again exactly the budget, the output carries an
    * `epoch` index (1-based), and `w < 1` degenerates to the sampled
    * subset at epoch 1. The repeat is a row-local
    * `explode(sequence(...))` — no shuffle beyond the totals
    * aggregate. */
  def tokenBudgetMixtureEpochs(docs: DataFrame, idCol: String,
                               sourceCol: String, textCol: String,
                               budgets: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol), col(sourceCol),
      TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
    val totals = toks.groupBy(col(sourceCol))
      .agg(sum(col("n_tokens").cast("long")).as("__total"))
    val w = col("token_budget").cast("double") / col("__total")
    val rates = totals.join(budgets, sourceCol)
      .select(col(sourceCol), floor(w).as("__full"),
        floor((w - floor(w)) * 10000).as("__frac10k"))
    toks.join(broadcast(rates), sourceCol)
      .withColumn("n_copies", col("__full") +
        when(TextFunctions.md5Bucket(col(idCol), 10000) < col("__frac10k"),
          lit(1L)).otherwise(lit(0L)))
      .filter(col("n_copies") > 0)
      .select(col(idCol), col(sourceCol), col("n_tokens"),
        explode(sequence(lit(1L), col("n_copies"))).as("epoch"))
  }

  /** Deterministic Efraimidis–Spirakis (A-ES) sampling priority:
    * smaller = more likely sampled, P(doc wins) ∝ its weight. The
    * classic form draws u ~ U(0,1) per item and ranks by u^(1/w)
    * (equivalently by -ln(u)/w ascending); here u is a pure md5
    * function of the key — the [[TextFunctions.hashSplit]] discipline
    * applied to WEIGHTED sampling, so the sample is reproducible
    * across runs, engines, and partitionings, and a top-k by this
    * column is a weighted sample without replacement.
    *
    * Cross-engine exactness: -ln(u) is quantized to an integer 1e-9
    * grid BEFORE the divide, and the divide is integer division —
    * float `pow`/`ln` in two engines can disagree in the last ulp,
    * but a last-ulp disagreement only matters if it crosses a grid
    * boundary (p ≈ 1e-7 per row), and everything after the grid is
    * exact BIGINT arithmetic in both. Weights clamp to ≥ 1 (a
    * zero-weight doc would divide by zero; it just gets the minimum
    * priority weight instead of being silently dropped). */
  def weightedPriority(key: Column, weight: Column): Column = {
    val u32 = conv(substring(md5(key.cast("string")), 1, 8), 16, 10)
      .cast("long")
    val u = (u32.cast("double") + 0.5) / 4294967296.0
    val grid = floor(-log(u) * 1e9).cast("long")
    val w = greatest(weight.cast("long"), lit(1L))
    // exact integer division: strip the remainder first, so the double
    // divide is of an exactly-divisible pair (< 2^53 — exact result)
    ((grid - pmod(grid, w)) / w).cast("long")
  }

  /** Weighted sample without replacement, k docs per stratum: rank by
    * [[weightedPriority]] within each stratum (deterministic key
    * tie-break) and keep the top k. One shuffle on the stratum key;
    * only the winning rows survive the window filter. Emits the
    * priority and 1-based `sample_rank` alongside the input columns. */
  def weightedSample(docs: DataFrame, keyCol: String, stratumCol: String,
                     weightCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pri = weightedPriority(col(keyCol), col(weightCol))
    val win = Window.partitionBy(stratumCol).orderBy(col("__pri"), col(keyCol))
    docs.withColumn("__pri", pri)
      .withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= k)
      .withColumn("priority", col("__pri"))
      .withColumn("sample_rank", col("__rn").cast("long"))
      .drop("__pri", "__rn")
  }

  /** [[weightedSample]]'s 100 TB form for long-keyed corpora: the
    * k smallest priorities per stratum via the mergeable
    * [[graft.functions.MinKAgg]] — map-side partials keep the buffer
    * k-bounded, so only k rows per stratum cross the shuffle (the
    * window form shuffles and sorts EVERY row). Identical output to
    * [[weightedSample]] (same priority, same (priority, key) total
    * order). */
  def weightedSampleAgg(docs: DataFrame, keyCol: String, stratumCol: String,
                        weightCol: String, k: Int): DataFrame = {
    // The agg form REQUIRES an integral key: the k-bounded buffer
    // carries (priority, key, weight) as longs, and the (priority,
    // key) tie-break must order exactly like weightedSample's natural
    // key order — a silent cast would null string keys at encode time
    // and a lexicographic carry would re-order ties. Fail fast
    // instead; non-numeric keys use weightedSample (any key type).
    {
      import org.apache.spark.sql.types._
      val kt = docs.schema(keyCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(kt),
        s"weightedSampleAgg requires an integral key column; " +
          s"'$keyCol' is $kt — use weightedSample for non-numeric keys")
    }
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(stratumCol).cast("string").as("_st"),
        weightedPriority(col(keyCol), col(weightCol)).as("_p"),
        col(keyCol).cast("long").as("_id"),
        col(weightCol).cast("long").as("_w"))
      .as[(String, Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, p, id, w) => (p, id, w) }
      .agg(graft.functions.MinKAgg.of(k).toColumn.name("top"))
      .flatMap { case (st, top) =>
        top.zipWithIndex.map { case ((p, id, w), i) =>
          (st, id, w, p, (i + 1).toLong) } }
      .toDF(stratumCol, keyCol, weightCol, "priority", "sample_rank")
  }

  /** DSIR-style importance weighting (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023 — a
    * published method): score every RAW document by its mean per-token
    * log-likelihood ratio between a TARGET unigram model and the raw
    * model, both add-1 smoothed over the union vocabulary. High scores
    * = "looks like the target domain"; selecting the top slice
    * re-weights a crawl toward a curated target (the paper's hashed
    * n-gram feature space is `hashBuckets` here).
    *
    * `hashBuckets = 0` keeps raw token strings as features — exact,
    * DuckDB-mirrorable, the catalog/oracle form. `hashBuckets > 0` is
    * the 100 TB form: features are `xxhash64(token) mod B`, so the
    * model state is B-bounded no matter how the vocabulary grows
    * (Heaps' law makes raw-token state corpus-proportional; the hashed
    * model is a fixed-size dim). Collisions only blur scores the way
    * the paper accepts; [[DsirSpec]] pins the hashed/exact rank
    * agreement on the shipped corpora.
    *
    * Numerics follow the t11 discipline: per-token nats land on an
    * integer 1e-6 grid BEFORE the sum (double summation is
    * partition-order-dependent; the integer sum is exact and
    * engine-stable), and the mean divides once at the end.
    *
    * Cost at corpus scale: one explode pass; per-feature counts as ONE
    * count-window over that pass (no second explode, no self-join);
    * the three model scalars (target tokens, raw tokens, |vocab|) are
    * a driver-bounded single-row aggregate. Shuffle is one exchange of
    * the token stream on the feature key plus the per-doc re-group —
    * both linear in corpus tokens, map-side combined where Spark can.
    *
    * Output: (idCol, n_tokens, logratio) for RAW docs only, unsorted —
    * callers rank/filter (a global top-k is a TakeOrderedAndProject,
    * no full sort). */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, hashBuckets: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol), isTarget.as("__t"),
      explode(TextFunctions.tokens(col(textCol))).as("__w"))
    val ftok = tok.withColumn("__f", dsirFeature(col("__w"), hashBuckets))
    // model scalars: one single-row aggregate (driver-bounded)
    val scalars = ftok.agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("nt"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("nr"),
      count_distinct(col("__f")).as("v")).head()
    val (nt, nr, v) =
      (scalars.getLong(0), scalars.getLong(1), scalars.getLong(2))
    require(nt > 0 && nr > 0,
      "importanceWeights needs non-empty target and raw corpora")
    val w = Window.partitionBy("__f")
    ftok
      .withColumn("__ct", sum(when(col("__t"), 1L).otherwise(0L)).over(w))
      .withColumn("__cr", sum(when(!col("__t"), 1L).otherwise(0L)).over(w))
      .filter(!col("__t"))
      .withColumn("__m", round((
        log((col("__ct") + 1d) / (nt + v).toDouble) -
        log((col("__cr") + 1d) / (nr + v).toDouble)) * 1e6).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
           round(sum(col("__m")).cast("double") / count(lit(1)) / 1e6, 4)
             .as("logratio"))
  }

  /** The c10 catalog pin: the target domain the importance weights
    * select toward (src0 plays "curated target"; every other source is
    * the raw pool) and the selected-slice size. */
  val DsirTargetSource: String = "src0"
  val DsirTopK: Int = 100

  /** The feature key of one token under the c10 contract: the raw
    * token string (`hashBuckets = 0`, the exact/oracle form) or
    * `xxhash64(token) mod hashBuckets` (the bounded-state scale
    * form). Shared by the fused [[importanceWeights]], the factored
    * [[dsirModel]]/[[scoreUnderModel]] path, and the streaming
    * maintainer — one definition, so the three can never disagree. */
  private[graft] def dsirFeature(token: Column, hashBuckets: Int): Column =
    if (hashBuckets > 0) pmod(xxhash64(token), lit(hashBuckets.toLong))
    else token.cast("string")

  /** A FROZEN DSIR importance model — the factored form of
    * [[importanceWeights]] for the production shape at corpus scale:
    * train the model ONCE (on the target + a raw sample / the corpus
    * so far), then score any number of new documents in single linear
    * passes without touching the training corpus again. `weights` is
    * (`__f` feature, `__m` long) — the per-token log-likelihood-ratio
    * nats on the 1e-6 integer grid, add-1 smoothing and the
    * normalizing constants already folded in, so scoring is a pure
    * join + integer sum. Scoring a doc from the training corpus under
    * its own model reproduces [[importanceWeights]] EXACTLY (same
    * formula, same grid — spec-pinned in DsirSpec). */
  final case class DsirModel(weights: DataFrame, targetTokens: Long,
                             rawTokens: Long, vocabSize: Long,
                             hashBuckets: Int) {
    /** Per-token weight of a feature the training corpus never saw
      * (`ct = cr = 0` under add-1 smoothing) — what OOV tokens of
      * post-training documents score. */
    def oovWeight: Long = math.round(
      (math.log(1d / (targetTokens + vocabSize)) -
       math.log(1d / (rawTokens + vocabSize))) * 1e6)
  }

  /** Train a [[DsirModel]] from a corpus with target/raw labels: one
    * explode pass, per-feature counts as one map-side-combined
    * aggregate (|vocab| rows out — bounded by `hashBuckets` in the
    * scale form), scalars as one single-row aggregate. */
  def dsirModel(docs: DataFrame, textCol: String, isTarget: Column,
                hashBuckets: Int = 0): DsirModel = {
    val ftok = docs.select(isTarget.as("__t"),
        explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .select(col("__t"), dsirFeature(col("__w"), hashBuckets).as("__f"))
    dsirModelFromTokens(ftok, hashBuckets)
  }

  /** [[dsirModel]] over pre-tokenized feature rows (`__t` boolean,
    * `__f` feature, one row per token occurrence — or pass `__tf`
    * occurrence counts via [[dsirModelFromCounts]]). */
  private[graft] def dsirModelFromTokens(ftok: DataFrame,
                                         hashBuckets: Int): DsirModel =
    dsirModelFromCounts(
      ftok.select(col("__t"), col("__f"), lit(1L).as("__tf")), hashBuckets)

  /** [[dsirModel]] over aggregated (`__t`, `__f`, `__tf`) rows — the
    * form the streaming maintainer stores (one row per (doc, feature)
    * collapses to one row per (side, feature) here). */
  private[graft] def dsirModelFromCounts(rows: DataFrame,
                                         hashBuckets: Int): DsirModel = {
    val scalars = rows.agg(
      sum(when(col("__t"), col("__tf")).otherwise(0L)).as("nt"),
      sum(when(!col("__t"), col("__tf")).otherwise(0L)).as("nr"),
      count_distinct(col("__f")).as("v")).head()
    val (nt, nr, v) =
      (scalars.getLong(0), scalars.getLong(1), scalars.getLong(2))
    require(nt > 0 && nr > 0,
      "dsirModel needs non-empty target and raw corpora")
    val weights = rows.groupBy(col("__f"))
      .agg(sum(when(col("__t"), col("__tf")).otherwise(0L)).as("__ct"),
           sum(when(!col("__t"), col("__tf")).otherwise(0L)).as("__cr"))
      .select(col("__f"), round((
        log((col("__ct") + 1d) / (nt + v).toDouble) -
        log((col("__cr") + 1d) / (nr + v).toDouble)) * 1e6)
        .cast("long").as("__m"))
    DsirModel(weights, nt, nr, v, hashBuckets)
  }

  /** Score documents under a FROZEN [[DsirModel]]: per-doc distinct
    * features with occurrence counts (so the weights join moves
    * |doc vocab| rows, not |doc tokens|), left-joined to the model —
    * unseen features take [[DsirModel.oovWeight]] — and one integer
    * aggregate. Output matches [[importanceWeights]]: (idCol,
    * n_tokens, logratio). Linear in the scored corpus; the training
    * corpus is never touched. */
  def scoreUnderModel(docs: DataFrame, idCol: String, textCol: String,
                      model: DsirModel): DataFrame = {
    val rows = docs.select(col(idCol),
        explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .select(col(idCol),
        dsirFeature(col("__w"), model.hashBuckets).as("__f"))
      .groupBy(col(idCol), col("__f"))
      .agg(count(lit(1)).as("__tf"))
    scoreFeatureRows(rows, idCol, model.weights, model.oovWeight)
  }

  /** Scoring core over aggregated (idCol, `__f`, `__tf`) rows against
    * a weights frame — shared by [[scoreUnderModel]] and the streaming
    * maintainer. */
  private[graft] def scoreFeatureRows(rows: DataFrame, idCol: String,
                                      weights: DataFrame,
                                      oovWeight: Long): DataFrame =
    rows.join(weights, Seq("__f"), "left")
      .withColumn("__m", coalesce(col("__m"), lit(oovWeight)))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_tokens"),
           round(sum(col("__tf") * col("__m")).cast("double") /
             sum(col("__tf")) / 1e6, 4).as("logratio"))

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", LREC 2020 — a published method): split each language's
    * documents into `n` equal buckets by LM score (bucket 1 = lowest
    * perplexity = "head"; CCNet trains on head+middle and drops the
    * tail). This is the EXACT form — ANSI `NTILE(n)` over
    * (language, score, id), deterministic under the total order and
    * mirrorable by any SQL engine — and it costs one exchange keyed
    * by language plus a per-language sort, which is the classic
    * skew trap at corpus scale (one task per language). The 100 TB
    * path is [[perplexityBucketsByThreshold]]. */
  def perplexityBuckets(scored: DataFrame, idCol: String, langCol: String,
                        scoreCol: String, n: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    scored.withColumn("ppl_bucket",
      ntile(n).over(Window.partitionBy(col(langCol))
        .orderBy(col(scoreCol), col(idCol))).cast("long"))
  }

  /** The scale form of [[perplexityBuckets]]: per-language quantile
    * THRESHOLDS from a mergeable sketch (`approx_percentile`'s
    * Greenwald–Khanna variant — map-side combined, no per-language
    * sort, no one-task-per-language stage), broadcast back, bucket by
    * comparison. This is what CCNet actually does (thresholds come
    * from a model/sample, the corpus pass is scan-local). Differs
    * from the exact NTILE only at bucket boundaries: NTILE balances
    * bucket SIZES exactly (splitting score ties across buckets),
    * thresholding puts every tie on one side — agreement away from
    * boundaries is spec-pinned. */
  def perplexityBucketsByThreshold(scored: DataFrame, idCol: String,
                                   langCol: String, scoreCol: String,
                                   n: Int = 3,
                                   accuracy: Int = 10000): DataFrame = {
    val qs = array((1 until n).map(i => lit(i.toDouble / n)): _*)
    // null-safe language equality: the exact form buckets NULL-lang
    // docs as their own window partition, so the threshold join must
    // keep them too (a plain equi-join would silently drop them)
    val th = scored.groupBy(col(langCol))
      .agg(approx_percentile(col(scoreCol), qs, lit(accuracy)).as("__th"))
      .withColumnRenamed(langCol, "__lang")
    scored.join(broadcast(th), col(langCol) <=> col("__lang"))
      .withColumn("ppl_bucket",
        (lit(1) + aggregate(col("__th"), lit(0L),
          (acc, t) => acc + when(col(scoreCol) > t, 1L).otherwise(0L)))
          .cast("long"))
      .drop("__th", "__lang")
  }

  /** The c04 catalog pin, shared verbatim with the DuckDB oracle
    * (drift would fail the hash check, not confuse it): even-numbered
    * sources get a tight budget (keep rate well under 1 on the shipped
    * corpora), odd-numbered ones an effectively unlimited budget (rate
    * clamps to 1 — kept whole). */
  val DemoBudgets: Seq[(String, Long)] =
    Seq.tabulate(20)(i => (s"src$i", if (i % 2 == 0) 600L else 1000000L))

  /** The c05 catalog pin: even sources are upsampled (budget ≈ 2-3×
    * their shipped token volume at the verify SFs), odd ones
    * downsampled (w < 1 — the fractional-epoch-only regime). */
  val EpochBudgets: Seq[(String, Long)] =
    Seq.tabulate(20)(i => (s"src$i", if (i % 2 == 0) 3500L else 600L))

  /** The c06 catalog pins: mixture budgets over the TRAIN-split
    * curated survivors (even sources bounded, odd kept whole) and the
    * packed training-sequence length. */
  val ExportBudgets: Seq[(String, Long)] =
    Seq.tabulate(20)(i => (s"src$i", if (i % 2 == 0) 150L else 1000000L))
  val ExportSeqTokens: Long = 256L

  /** Global token budget the c09 temperature mixture distributes
    * across sources ∝ sqrt(source tokens). */
  val TemperatureBudget: Long = 1000000L
}
