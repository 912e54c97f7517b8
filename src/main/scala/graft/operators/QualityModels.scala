package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Model-based corpus quality scoring — the two classic curation stages a
 * heuristic pass ([[graft.functions.TextFunctions]]) doesn't cover:
 *
 *  - CCNet-style language-model perplexity filtering (Wenzek et al. 2020):
 *    score every document by its cross-entropy under a unigram LM trained on
 *    a trusted reference slice, then bucket the corpus into head/middle/tail
 *    by score tertiles — the published recipe keeps head+middle and drops or
 *    down-weights tail.
 *  - Naive Bayes document classification (the replayable stand-in for the
 *    fastText-style classifiers pipelines use for language/domain routing):
 *    argmax over per-label integer log-likelihood sums.
 *
 * Both follow the DSIR arithmetic discipline ([[CorpusTools
 * .importanceWeights]]): every log is taken ONCE driver-side when the
 * bounded model table is built and quantized to integer milli-nats, so
 * corpus-side scoring is an order-free integer fold that replays hash-exact
 * in any engine. Model tables are vocabulary-bounded (`vocabCap` top tokens)
 * and broadcast; scoring is explode → broadcast join → per-doc integer sum —
 * the shuffle carries ~one row per document.
 */
object QualityModels {

  /** A quantized unigram LM: token → cost in milli-nats (`-1000·ln p`), plus
    * the out-of-vocabulary cost. Add-one smoothing over the reference slice:
    * `p(t) = (count(t)+1) / (refTokens + V)`, `p(oov) = 1 / (refTokens + V)`
    * with `V` = table size. */
  final case class LmModel(costs: Map[String, Long], oovCost: Long)

  /**
   * Train the n-gram LM on the `isReference` slice (one aggregation; the
   * collected table is `vocabCap`-bounded — the same bounded-feature-space
   * cap as the DSIR weight table, ties on count broken by token text).
   *
   * `ngram = 1` is the classic unigram table; `ngram = 2+` counts word
   * n-grams (space-joined, the [[graft.functions.TextFunctions.shingles]]
   * convention), which makes the model ORDER-SENSITIVE — a bag-of-words
   * scramble of fluent reference text keeps its unigram score but loses its
   * bigram score (pinned in QualityModelsSpec). No backoff: an unseen
   * n-gram pays the flat OOV cost, the same deliberate approximation the
   * unigram table makes for unseen tokens. CCNet's published filter uses a
   * 5-gram Kneser-Ney model; this quantized no-backoff ladder is the
   * oracle-replayable counterpart — each n is one explode + one broadcast
   * join at scoring time, nothing else changes.
   */
  def lmCostTable(
      df: DataFrame,
      textCol: String,
      isReference: Column,
      vocabCap: Int = 10000,
      ngram: Int = 1): LmModel = {
    require(vocabCap >= 1, s"vocabCap must be >= 1, got $vocabCap")
    require(ngram >= 1, s"ngram must be >= 1, got $ngram")
    val counts = df.filter(isReference)
      .select(explode(lmUnits(col(textCol), ngram)).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__tok"))
      .limit(vocabCap)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    require(counts.nonEmpty,
      "the reference slice contains no tokens — an empty LM would score " +
        "everything at -ln(1/0); pass a predicate that matches documents")
    val total = counts.map(_._2).sum
    val v = counts.length
    def cost(c: Long): Long =
      math.round(-1000.0 * math.log((c + 1).toDouble / (total + v).toDouble))
    LmModel(counts.map { case (t, c) => t -> cost(c) }.toMap, cost(0L))
  }

  /** The scoring unit column for an `ngram`-gram LM: tokens at n=1, space-
    * joined word n-grams above (documents shorter than n yield one whole-
    * text unit — the shingles convention, shared by table and scorer).
    * N-grams come from the fused native WordShingles kernel (one tight loop
    * per row) rather than the HOF transform/slice chain — the same 40x
    * documented on q_window_dedup; the bench measured the HOF path at 5.2s
    * for q_lm_bigram vs 1.2s for the unigram query at sf0.1. The kernel has
    * no short-doc fallback, so the `when` restores it: the condition costs
    * one extra tokenize pass, the kernel runs once per row either way. */
  private def lmUnits(text: Column, ngram: Int): Column =
    if (ngram == 1) graft.functions.TextFunctions.tokens(text)
    else when(
      size(graft.functions.TextFunctions.tokens(text)) >= ngram,
      graft.functions.VectorExpressions.wordShingles(text, ngram))
      .otherwise(array(concat_ws(" ", graft.functions.TextFunctions.tokens(text))))

  /**
   * Score every document: `lm_cost` = summed milli-nat token costs (OOV
   * tokens pay `oovCost`), `avg_millinats` = integer-division mean — the
   * quantized per-token cross-entropy CCNet thresholds on. Low = fluent
   * under the reference LM, high = noise. Pure integers end to end.
   */
  def lmPerplexity(
      df: DataFrame, idCol: String, textCol: String, model: LmModel,
      ngram: Int = 1): DataFrame = {
    require(ngram >= 1, s"ngram must be >= 1, got $ngram")
    val spark = df.sparkSession
    import spark.implicits._
    val costDf = model.costs.toSeq.toDF("__tok", "__cost")
    df.select(col(idCol),
        explode(lmUnits(col(textCol), ngram)).as("__tok"))
      .join(broadcast(costDf), Seq("__tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__cost"), lit(model.oovCost))).as("lm_cost"))
      .withColumn("avg_millinats", expr("lm_cost div n_tokens"))
  }

  /** Exact score values at the 1/3 and 2/3 positions of the
    * (avg_millinats, id) order — collected as two integers. The limit+max
    * formulation avoids a single-partition global window but still funnels
    * up to 2n/3 rows through a GlobalLimit; it is the ORACLE arm. At real
    * scale use [[tertileThresholdsApprox]] — same bucket rule, one
    * aggregation, no global sort. */
  def tertileThresholds(scored: DataFrame, idCol: String): (Long, Long) = {
    val n = scored.count()
    require(n >= 3, s"need at least 3 documents for tertiles, got $n")
    require(n / 3 * 2 <= Int.MaxValue,
      s"exact tertiles use limit() (Int-bounded); at $n documents switch to a sampled quantile")
    def at(k: Long): Long = scored
      .orderBy(col("avg_millinats"), col(idCol))
      .limit(k.toInt)
      .agg(max(col("avg_millinats"))).collect()(0).getLong(0)
    (at(n / 3), at(2 * n / 3))
  }

  /** The at-scale arm of [[tertileThresholds]]: one `approx_percentile`
    * aggregation instead of two global-sorted limits — no GlobalLimit
    * funneling 2n/3 rows through a single partition, so it holds at any
    * corpus size. `accuracy` is Spark's inverse-epsilon knob (rank error
    * ≤ n/accuracy; exact while n ≤ accuracy). The returned thresholds may
    * sit a few RANKS off the exact arm's where scores tie or step, so
    * bucket boundaries can move by the rank tolerance — QualityModelsSpec
    * bounds the bucket disagreement at gate scale. Feed to [[lmBuckets]]
    * unchanged. */
  def tertileThresholdsApprox(scored: DataFrame, accuracy: Int = 10000): (Long, Long) = {
    require(accuracy >= 1, s"accuracy must be >= 1, got $accuracy")
    val arr = scored
      .agg(expr(s"approx_percentile(avg_millinats, array(1.0D/3.0D, 2.0D/3.0D), $accuracy)"))
      .head().getSeq[Long](0)
    (arr(0), arr(1))
  }

  /** CCNet's head/middle/tail labeling from the two threshold literals:
    * `avg <= t1` head, `<= t2` middle, else tail (boundary ties all land on
    * the lower bucket — sizes are near-tertiles, the rule is exact). */
  def lmBuckets(scored: DataFrame, t1: Long, t2: Long): DataFrame =
    scored.withColumn("bucket",
      when(col("avg_millinats") <= t1, lit("head"))
        .when(col("avg_millinats") <= t2, lit("middle"))
        .otherwise(lit("tail")))

  /** A quantized multinomial Naive Bayes model: per-label prior milli-nats
    * (`1000·ln P(label)` — negative magnitudes, stored as-is) and per
    * (token, label) log-likelihood milli-nats, add-one smoothed within each
    * label. Bounded: `vocabCap × |labels|` rows. */
  final case class NbModel(priors: Map[String, Long], loglik: Map[(String, String), Long]) {
    def labels: Seq[String] = priors.keys.toSeq.sorted
  }

  /**
   * Train Naive Bayes from a labeled frame (two aggregations; the collected
   * tables are bounded by `vocabCap × |labels|`). OOV tokens at scoring time
   * are SKIPPED — a deliberate uniform-cost approximation, not an exact
   * equivalence: under add-one smoothing the true unseen-token cost
   * `-ln(1/(tot_label + V))` depends on each label's in-vocab token total,
   * so a document dominated by OOV tokens can argmax differently from exact
   * multinomial NB. The trade buys keeping the broadcast table join the
   * only per-token work (no per-label OOV scan), and the classifier is
   * oracle-pinned under the same approximation on both engines.
   */
  def nbTrain(
      df: DataFrame,
      labelCol: String,
      textCol: String,
      vocabCap: Int = 10000): NbModel = {
    require(vocabCap >= 1, s"vocabCap must be >= 1, got $vocabCap")
    val docCounts = df.groupBy(col(labelCol).cast("string").as("__l"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(docCounts.nonEmpty, "cannot train Naive Bayes on an empty frame")
    val nDocs = docCounts.values.sum
    val priors = docCounts.map { case (l, c) =>
      l -> math.round(1000.0 * math.log(c.toDouble / nDocs))
    }
    val vocab = df
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__tok"))
      .limit(vocabCap)
      .collect().map(_.getString(0))
    val vocabSet = vocab.toSet
    // membership via ScaleTools.filterInValues: at vocabCap 100k an inline
    // isin would put 100k literal nodes in the analyzed plan (a planning
    // hazard); the helper switches to a broadcast left-semi join
    val perLabel = ScaleTools.filterInValues(df
      .select(col(labelCol).cast("string").as("__l"),
        explode(graft.functions.TextFunctions.tokens(col(textCol))).as("__tok")),
        "__tok", vocab.toSeq)
      .groupBy(col("__l"), col("__tok")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val labelTotals = perLabel.groupBy(_._1._1).map { case (l, m) => l -> m.values.sum }
    val v = vocabSet.size
    val loglik = (for {
      l <- priors.keys
      t <- vocab
    } yield {
      val c = perLabel.getOrElse((l, t), 0L)
      val tot = labelTotals.getOrElse(l, 0L)
      (t, l) -> math.round(1000.0 * math.log((c + 1).toDouble / (tot + v).toDouble))
    }).toMap
    NbModel(priors, loglik)
  }

  /**
   * Classify each document: argmax over labels of
   * `prior + Σ loglik(token, label)` (integer milli-nats; per-(doc, label)
   * sums are order-free integer folds, the argmax breaks ties on the
   * smaller label). Documents with no in-vocabulary token fall back to the
   * prior-only argmax — they still classify.
   *
   * @return (idCol, `predicted`, `score_millinats`)
   */
  def nbClassify(df: DataFrame, idCol: String, textCol: String, model: NbModel): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val likDf = broadcast(model.loglik.toSeq
      .map { case ((t, l), w) => (t, l, w) }.toDF("__tok", "__l", "__w"))
    val priorDf = broadcast(model.priors.toSeq.toDF("__l", "__prior"))
    val tokScores = df
      .select(col(idCol), explode(graft.functions.TextFunctions.tokens(col(textCol))).as("__tok"))
      .join(likDf, Seq("__tok"))
      .groupBy(col(idCol), col("__l")).agg(sum(col("__w")).as("__s"))
    // prior-only rows keep docs with zero in-vocab tokens classifiable; the
    // label axis comes from a literal-array explode, not a join
    val withPriors = df.select(col(idCol))
      .withColumn("__l", explode(array(model.labels.map(lit): _*)))
      .join(priorDf, Seq("__l"))
      .join(tokScores, Seq(idCol, "__l"), "left")
      .withColumn("__total", col("__prior") + coalesce(col("__s"), lit(0L)))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__total").desc, col("__l"))
    withPriors.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__l").as("predicted"), col("__total").as("score_millinats"))
  }
}
