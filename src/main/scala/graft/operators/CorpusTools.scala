package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-preparation operators for large-scale training-data pipelines:
 * deterministic global shuffling, weighted mixture sampling, token-budget
 * sequence packing, repeated-window mining (the scalable approximation of
 * exact substring dedup), and corpus vocabulary statistics.
 *
 * Design rules shared by every operator here:
 *   - Determinism is derived from content (md5 of a seed + the row key), never
 *     from partitioning, task order, or RNG state — results are identical
 *     across cluster sizes, retries, and engines (each operator has an exact
 *     DuckDB replay in the driver contract).
 *   - Nothing is driver-side: each operator is one scan plus at most one
 *     shuffle (a window over a key or a groupBy), so the shapes survive a
 *     100 TB corpus unchanged.
 */
object CorpusTools {

  /**
   * Deterministic global shuffle for training-data ordering, sharded so no
   * single task ever materializes the whole corpus: each row gets a stable
   * pseudo-random key `md5(seed:id)`, a `shard` from the key's first 32 bits
   * modulo `numShards`, and a dense `pos` (1-based) within its shard by key
   * order.
   *
   * A data loader that reads shards in any order and rows by `pos` within a
   * shard sees a reproducible, uniformly shuffled corpus. The per-shard
   * `row_number` keeps the ranking window partitioned — the unpartitioned
   * global-ordering variant would funnel 100 TB through one task, this one
   * is `numShards`-way parallel and each shard sorts ~1/numShards of the
   * data. Re-shuffling with a new `seed` is a full re-key; identical seeds
   * are bit-identical across runs and engines.
   *
   * The shard is `(first 8 hex chars of the key as an integer) % numShards`:
   * 32 key bits, so the worst-case shard-size skew for ANY numShards up to
   * 65,536 is a negligible numShards/2^32 (a single-nibble derivation would
   * bias shards up to 6/16 vs 5/16 for numShards = 3, 5, 6...).
   */
  def deterministicShuffle(
      df: DataFrame,
      idCol: String,
      seed: String,
      numShards: Int = 16): DataFrame = {
    require(numShards >= 1 && numShards <= 65536,
      s"numShards must be in [1,65536], got $numShards")
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    // conv parses the 8-char hex prefix as an unsigned 32-bit value (conv
    // returns a decimal STRING — cast back to long before the mod)
    val keyed = df.withColumn("_shuffle_key", key)
      .withColumn("shard",
        pmod(conv(substring(col("_shuffle_key"), 1, 8), 16, 10).cast("long"), lit(numShards))
          .cast("int"))
    val w = Window.partitionBy(col("shard")).orderBy(col("_shuffle_key"), col(idCol))
    keyed.withColumn("pos", row_number().over(w).cast("long")).drop("_shuffle_key")
  }

  /**
   * Render a keep-probability as an 8-hex-digit md5-prefix threshold: a row
   * survives iff `substring(md5(...), 1, 8) < threshold`. Weights quantize to
   * 1/2^32 (exact for the usual 1.0 / 0.5 / 0.25 / powers of two). `w >= 1`
   * maps to "g" — lexicographically above every hex string, so everything
   * passes; `w <= 0` maps to "0" — below every 8-char hex string.
   */
  private[graft] def hexThreshold(w: Double): String =
    if (w <= 0) "0"
    else {
      val units = math.round(w * 0x100000000L.toDouble)
      if (units >= 0x100000000L) "g" else f"$units%08x"
    }

  /**
   * Weighted mixture sampling across corpus sources: keep each row of class
   * `classCol` with probability `weights(class)` (or `defaultWeight`),
   * decided by a deterministic hash of (seed, id). This is the "mix 3 parts
   * web to 1 part books" step of a training-data pipeline, as a pure scan
   * filter: no shuffle, no RNG, reproducible across engines and runs, and
   * monotone in the weight (the 25% sample of a class is a subset of its 50%
   * sample — useful for ablation series that must nest).
   */
  def mixtureSample(
      df: DataFrame,
      idCol: String,
      classCol: String,
      weights: Map[String, Double],
      defaultWeight: Double,
      seed: String): DataFrame = {
    val hash8 = substring(md5(concat_ws(":", lit(seed), col(idCol).cast("string"))), 1, 8)
    val threshold = weights.foldLeft(lit(hexThreshold(defaultWeight))) {
      case (acc, (cls, w)) => when(col(classCol) === cls, lit(hexThreshold(w))).otherwise(acc)
    }
    df.filter(hash8 < threshold)
  }

  /**
   * Deterministic exact-size sample: the `n` rows with the smallest
   * `md5(seed:id)` values (ties broken by id) — a reproducible uniform
   * sample WITHOUT replacement of exactly n rows, stable under
   * repartitioning and replayable on any engine. Complements
   * [[mixtureSample]] (fraction, inexact size) and [[capPerGroup]]
   * (per-group): this is the whole-corpus "give me exactly n docs" cut,
   * and it NESTS — `sampleN(df, m)` ⊆ `sampleN(df, n)` for m <= n, the
   * ablation-series property the hash-order selection buys.
   *
   * Plans as TakeOrderedAndProject: an O(n) heap per partition, one final
   * merge task. The merge is the honest cost at huge n — for n beyond
   * tens of millions prefer [[mixtureSample]]'s threshold filter and accept
   * the size jitter.
   */
  def sampleN(df: DataFrame, idCol: String, n: Int, seed: String = "graft-sample"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    df.withColumn("__k", md5(concat_ws(":", lit(seed), col(idCol).cast("string"))))
      .orderBy(col("__k"), col(idCol))
      .limit(n)
      .drop("__k")
  }

  /**
   * Per-group cap sampling — the "at most `cap` documents per domain" step
   * of web-corpus curation (C4/RefinedWeb-style domain balancing, where a
   * handful of hot domains would otherwise dominate the corpus): keep at
   * most `cap` rows of each `groupCol` value, chosen DETERMINISTICALLY by
   * `md5(seed:id)` order — a reproducible uniform sample of each over-cap
   * group, stable across runs, engines, and partitionings, and ties broken
   * by id so equal hashes (never in practice) cannot flap.
   *
   * Semantics are exactly `row_number() over (partition by group order by
   * md5, id) <= cap`. The implementation splits on a pre-counted group size
   * so the window SORT runs only over rows of over-cap groups: one
   * map-side-combinable count aggregation, one join on the group key (both
   * sides shuffle on `groupCol` once — AQE splits a skewed hot domain's
   * join), then the under-cap majority passes through sort-free and only
   * the over-cap slice pays the per-group window. The hot-group task is
   * bounded by the largest domain — the honest cost of exact per-group
   * ranking; a corpus with a boilerplate mega-domain should cap it upstream
   * (the same argument as `dupClusters.maxClusterSize`).
   * [[CorpusToolsSpec]] pins the split path ≡ the plain-window formulation.
   */
  def capPerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      cap: Int,
      seed: String = "graft-cap"): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__gn"))
    // null-SAFE join key: groupBy and Window.partitionBy both treat NULL as
    // one ordinary group, so the count join must too — a plain equi-join
    // would silently drop every null-group row, breaking the pinned
    // row_number-formulation equivalence exactly on them. <=> is still an
    // equi-join key (one shuffle on groupCol, AQE-splittable), not a BNLJ.
    val joined = df.join(counts.withColumnRenamed(groupCol, "__cg"),
      col(groupCol) <=> col("__cg")).drop("__cg")
    val sortKey = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val w = Window.partitionBy(col(groupCol)).orderBy(sortKey, col(idCol))
    val capped = joined.filter(col("__gn") > cap)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
    joined.filter(col("__gn") <= cap).unionByName(capped).drop("__gn")
  }

  /**
   * Deterministic train/val/test split assignment: each row gets the FIRST
   * split whose cumulative weight threshold exceeds the row's content hash
   * — a pure scan projection (no shuffle, no RNG), reproducible across
   * engines, runs, and cluster sizes, and STABLE under corpus growth: a
   * document's split never changes when other documents are added or
   * removed, because the decision depends only on (seed, id). Like
   * [[mixtureSample]], weights quantize to 1/2^32 (exact for the usual
   * 0.8/0.1/0.1-style splits is close enough that only hash-boundary rows
   * could ever differ, and those are fixed by the quantization, not
   * data-dependent).
   *
   * Splits are ordered: growing the FIRST split's weight only MOVES rows
   * into it from later splits (the same nesting law mixtureSample has), so
   * an 80/10/10 split's train set contains the 70/20/10 split's train set.
   */
  def splitAssign(
      df: DataFrame,
      idCol: String,
      seed: String,
      splits: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(splits.size >= 2, s"need at least 2 splits, got ${splits.size}")
    require(splits.forall(_._2 >= 0), "split weights must be non-negative")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1.0, got ${splits.map(_._2).sum}")
    val hash8 = substring(md5(concat_ws(":", lit(seed), col(idCol).cast("string"))), 1, 8)
    val cum = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val chain = splits.zip(cum).init.foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cw)) =>
        val cond = hash8 < lit(hexThreshold(cw))
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }
    df.withColumn(splitCol, chain.get.otherwise(splits.last._1))
  }

  /**
   * Corpus-wide boilerplate LINE removal — the C4/CCNet line-dedup stage:
   * any line (newline-delimited) appearing in MORE than `maxDocFrequency`
   * distinct documents is dropped from EVERY document; surviving lines keep
   * their original order and within-doc multiplicity. Headers, navigation
   * chrome, cookie banners, and license blurbs are exactly the lines whose
   * document frequency explodes, and removing them per-line preserves the
   * surrounding prose where whole-document dedup would either keep the
   * boilerplate or drop the document.
   *
   * Output: `docs` with `textCol` replaced by the cleaned text (documents
   * whose every line was boilerplate keep an empty string — dropping them
   * is the caller's policy decision).
   *
   * Scale shape: one explode, one map-side-combinable distinct-doc count
   * per line, one anti-join on the line value (boilerplate lines are by
   * definition high-frequency, so AQE's skew handling applies to exactly
   * the rows that need it), one per-document reassembly groupBy. No
   * window, no driver-side state, nothing corpus-quadratic. The join key
   * is the raw line string — content-identical across engines, no
   * hash-collision caveat in the oracle contract.
   */
  def removeBoilerplateLines(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxDocFrequency: Long = 1L): DataFrame = {
    require(maxDocFrequency >= 1, s"maxDocFrequency must be >= 1, got $maxDocFrequency")
    val lines = docs.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val boiler = lines.groupBy("__line")
      .agg(count_distinct(col("__id")).as("__df"))
      .filter(col("__df") > maxDocFrequency)
      .select("__line")
    val kept = lines.join(boiler, Seq("__line"), "left_anti")
    val rebuilt = kept.groupBy("__id")
      .agg(concat_ws("\n",
        transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line"))).as("__new_text"))
    docs.join(rebuilt, docs(idCol) === col("__id"), "left")
      .withColumn(textCol, coalesce(col("__new_text"), lit("")))
      .drop("__id", "__new_text")
  }

  /**
   * GPT-style concat-and-chunk sequence packing: within each stream (the
   * `streamCols` tuple), documents are laid end to end in `idCol` order and
   * cut into fixed `budget`-token bins. Each doc is labeled with the bin its
   * first token lands in (`seq_id`, 0-based) and its token offset inside
   * that bin (`bin_offset`) — exactly what a loader needs to assemble
   * training sequences without materializing the concatenation.
   *
   * One window (cumulative sum) per stream: streams shuffle independently,
   * so parallelism = #streams; at real scale pass a (source, shard) tuple as
   * `streamCols` to bound per-stream data. All math is integer — replayable
   * bit-exactly by any engine.
   */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Int,
      streamCols: Seq[String]): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(streamCols.nonEmpty, "streamCols must not be empty (one global stream = one task)")
    val w = Window.partitionBy(streamCols.map(col): _*).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_start_off", sum(col(tokenCol).cast("long")).over(w) - col(tokenCol))
      .withColumn("seq_id", expr(s"_start_off div $budget"))
      .withColumn("bin_offset", pmod(col("_start_off"), lit(budget.toLong)))
      .drop("_start_off")
  }

  /**
   * Repeated n-token window mining — the scalable approximation of exact
   * substring deduplication (find text spans that recur across documents, the
   * memorization-prone boilerplate a curation pipeline wants to down-weight
   * or cut). Every document contributes its `n`-token sliding windows; a
   * window kept iff it appears in at least `minDocs` distinct documents.
   *
   * Shape: explode + one aggregation on the window text — linear in total
   * token count, never pairwise in documents (the suffix-array formulation of
   * exact substring dedup is sequential; this windowed form is the
   * embarrassingly-parallel equivalent at fixed span length). Windows are
   * plain strings here for engine-neutral verification; at 100 TB hash them
   * first (xxhash64) so the shuffle carries 8 bytes instead of the span.
   *
   * @return one row per repeated window: `win_text`, `n_docs` (distinct
   *         documents), `n_occ` (total occurrences), `first_doc` (min id).
   */
  def repeatedWindows(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Int = 2): DataFrame = {
    require(n >= 2, s"window must span at least 2 tokens, got $n")
    // native fused tokenize→window kernel: the HOF formulation
    // (transform(sequence) + per-element concat/slice) pays interpreted
    // lambda dispatch per window and was 40x slower on the sf0.1 bench.
    // The aggregation is written two-phase EXPLICITLY — collapse on
    // (window, doc), then per-window counts — which is the same plan
    // Spark's single-distinct rewrite produces for the countDistinct form
    // (round-6 A/B: statistically equivalent, no Expand in either; Expand
    // only appears with MULTIPLE distinct aggregates). The explicit form
    // states the intended shape in the source instead of depending on the
    // rewrite, and keeps within-doc repeats merging map-side pre-shuffle.
    df.select(col(idCol).as("first_doc"),
        explode(graft.functions.VectorExpressions.wordShingles(col(textCol), n)).as("win_text"))
      .groupBy(col("win_text"), col("first_doc"))
      .agg(count(lit(1)).as("occ_in_doc"))
      .groupBy(col("win_text"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("occ_in_doc")).as("n_occ"),
        min(col("first_doc")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)
  }

  /**
   * DSIR-style importance-resampling weights (Xie et al. 2023, "Data
   * Selection for Language Models via Importance Resampling"): score each
   * document by how much more likely its tokens are under a TARGET
   * distribution (a trusted slice — quality domain, target language) than
   * under the RAW corpus distribution. The published recipe estimates both
   * distributions over hashed n-gram features and weights a document by the
   * summed log-ratio; documents are then selected by weight.
   *
   * This implementation keeps the recipe but makes the arithmetic
   * engine-replayable: unigram features over the whitespace tokenization,
   * add-one-smoothed distributions estimated from the corpus itself, and
   * log-ratios stored as INTEGER milli-nats — the per-document score is
   * then a pure integer fold and replays hash-exactly in any engine
   * (floating-point log-sums differ in the last ulp across engines; the
   * rounding happens ONCE, driver-side, when the weight table is built).
   *
   * Scale shape: the weight table is bounded (`vocabCap` top tokens by raw
   * frequency — the same bounded-feature-space role the hashed buckets play
   * in the paper) and BROADCASTS; scoring is explode → broadcast join →
   * groupBy(id) sum, fully codegen'd, and map-side combine collapses each
   * document's tokens to one partial before the shuffle, so the shuffle
   * carries ~one row per document. Estimating the two distributions is one
   * additional aggregation over the same scan. Nothing driver-side except
   * the capped weight table itself.
   *
   * @param isTarget row predicate selecting the target slice
   * @return (idCol, dsir_score, kept): summed milli-nat log-ratio per
   *         document (out-of-table tokens contribute 0) and the
   *         `score >= keepThreshold` selection flag
   */
  def importanceWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      keepThreshold: Long = 0L,
      vocabCap: Int = 10000): DataFrame =
    importanceWeights(df, idCol, textCol,
      importanceWeightTable(df, textCol, isTarget, vocabCap), keepThreshold)

  /** As above with a PRECOMPUTED weight table — for scoring new deliveries
    * against distributions estimated on a reference corpus (the steady-state
    * use: estimate once, score every delivery), and for oracle replay. */
  def importanceWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: Map[String, Long],
      keepThreshold: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = broadcast(weights.toSeq.toDF("tok", "wt"))
    df.select(col(idCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .join(wdf, Seq("tok"), "left_outer")
      .groupBy(col(idCol))
      .agg(coalesce(sum(col("wt")), lit(0L)).as("dsir_score"))
      .withColumn("kept", col("dsir_score") >= lit(keepThreshold))
  }

  /**
   * The DSIR pipeline's SELECTION step (Xie et al. 2023 §3: after scoring,
   * sample the training subset WITHOUT replacement with probability
   * proportional to the importance weight): Gumbel-top-k over the per-doc
   * scores. The classic identity — argmax_i (log w_i + G_i) with i.i.d.
   * standard Gumbel noise G_i draws i with probability w_i / Σw_j, and
   * taking the TOP K of those perturbed keys is a without-replacement
   * sample — turns the sequential resampling loop into one embarrassingly
   * parallel scan + bounded top-k, which is what makes it runnable over a
   * 100 TB corpus (Spark executes the orderBy+limit as a per-partition
   * partial top-k merged on the driver: O(k) rows ever leave an executor).
   *
   * Deterministic by construction, same trick as
   * [[graft.operators.ScaleTools.hashSample]] lifted from Bernoulli
   * keep/drop to weighted without-replacement: the "noise" is a pure
   * function of (seed, id) — an md5-derived uniform u ∈ (0,1) on a 2^16
   * grid, G = -ln(-ln u) — so the same (corpus, weights, n, seed) always
   * selects the same documents, across runs AND engines (md5 is
   * engine-portable where xxhash64 is not). The Gumbel perturbation is
   * QUANTIZED to integer milli-nats, the same fixed-point scale as the
   * scores: the sort key `dsir_score + round(1000·G)` stays a pure integer
   * computation, so the selection is DuckDB-oracle-able bit-exactly (ties
   * broken by id).
   *
   * @return the `n` selected rows: (idCol, dsir_score, gumbel_key),
   *         gumbel_key descending
   */
  def dsirSample(
      df: DataFrame,
      idCol: String,
      textCol: String,
      weights: Map[String, Long],
      n: Int,
      seed: Int = 0): DataFrame = {
    require(n >= 0, s"sample size must be >= 0, was $n")
    val scored = importanceWeights(df, idCol, textCol, weights, keepThreshold = 0L)
    // 16-bit uniform from the md5 hex prefix: instr-based hex decode keeps
    // the whole expression portable SQL (both engines agree digit by digit)
    val h = s"md5(concat_ws('|', '$seed', cast($idCol as string)))"
    val hv = (0 until 4)
      .map(i => s"(instr('0123456789abcdef', substring($h, ${i + 1}, 1)) - 1) * ${1 << (4 * (3 - i))}")
      .mkString("(", " + ", ")")
    val u = s"($hv + 0.5) / 65536.0"
    scored
      .withColumn("gumbel_key",
        col("dsir_score") + expr(s"cast(round(-1000.0 * ln(-ln($u))) as bigint)"))
      .select(col(idCol), col("dsir_score"), col("gumbel_key"))
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(n)
  }

  /**
   * The bounded token → milli-nat-log-ratio table [[importanceWeights]]
   * scores with: for each of the `vocabCap` most frequent tokens,
   * `round(1000 * (ln p_target(tok) - ln p_raw(tok)))` under add-one
   * smoothing. Exposed so the driver contract can replay the EXACT integer
   * table as a SQL literal (the oracle-registry pattern the SimHash
   * dictionary uses).
   */
  def importanceWeightTable(
      df: DataFrame,
      textCol: String,
      isTarget: Column,
      vocabCap: Int = 10000): Map[String, Long] = {
    val tokCounts = df
      .select(isTarget.cast("long").as("t"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .groupBy(col("tok"))
      // coalesce: a token occurring ONLY in rows where isTarget evaluates
      // to SQL NULL (e.g. a null lang column) sums to NULL, and the
      // collected getLong would throw — such occurrences count as
      // non-target, like isTarget=false rows
      .agg(coalesce(sum(col("t")), lit(0L)).as("tc"), count(lit(1)).as("rc"))
      .persist()
    try {
      // totals and vocabulary size over the FULL token aggregate, not just
      // the vocabCap head: the estimated distributions keep all out-of-cap
      // mass in their denominators (the paper's normalization — Xie et al.
      // 2023, "Data Selection for Language Models via Importance
      // Resampling"), so in-cap weights do not shift when vocabCap changes.
      // Only the TABLE is capped (driver memory / broadcast size); the
      // persist makes the totals pass and the top-k pass share one corpus
      // scan, and the aggregate itself is O(vocabulary), not O(corpus).
      val totals = tokCounts.agg(
        coalesce(sum(col("tc")), lit(0L)), coalesce(sum(col("rc")), lit(0L)), count(lit(1))).head()
      val targetTotal = totals.getLong(0)
      val rawTotal = totals.getLong(1)
      val v = totals.getLong(2)
      val counts = tokCounts
        .orderBy(col("rc").desc, col("tok"))
        .limit(vocabCap)
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      counts.map { case (tok, tc, rc) =>
        val lt = math.log((tc + 1).toDouble / (targetTotal + v))
        val lr = math.log((rc + 1).toDouble / (rawTotal + v))
        tok -> math.round(1000.0 * (lt - lr))
      }.toMap
    } finally {
      tokCounts.unpersist()
      ()
    }
  }

  /**
   * Persist a [[importanceWeightTable]] as a versioned SNAPSHOT table
   * (columns `tok`, `wt`) — the steady-state shape for data selection at
   * scale: the distribution estimate is a full-corpus aggregation you run
   * once per reference-corpus refresh, not per delivery, and versioning it
   * makes selection REPRODUCIBLE — tag the weights a training set was
   * selected with and `loadWeightsAt` that commit forever (the same
   * pattern [[VectorIndex]] uses for the IVF index). Each refresh is one
   * atomic whole-table replace; old estimates stay time-travelable.
   */
  def saveWeights(
      engine: VersionedTables,
      table: graft.core.TableDefinition,
      weights: Map[String, Long],
      userId: graft.core.UserId,
      message: String = "importance-weight refresh"): Unit = {
    require(table.isSnapshot, s"weight tables are snapshot tables, got ${table.partitionSchema}")
    require(weights.nonEmpty,
      "refusing to persist an EMPTY weight table — an empty estimate means the reference " +
        "corpus (or the target slice) was empty, which is a pipeline error, not a model")
    val spark = engine.spark
    import spark.implicits._
    import VersionedTables.DatasetVersionedOps
    weights.toSeq.sortBy(_._1).toDF("tok", "wt")
      .coalesce(1) // vocabCap-bounded: one small file per estimate
      .versionedReplaceAll(engine, table, userId, message)
  }

  /** The current weight table of [[saveWeights]], as the Map
    * [[importanceWeights]] scores with. */
  def loadWeights(engine: VersionedTables, table: graft.core.TableDefinition): Map[String, Long] =
    weightsFrom(engine.read(table))

  /** The weight table AS OF a commit — score with the exact weights a past
    * selection used (pairs with tags for reproducible training sets). */
  def loadWeightsAt(
      engine: VersionedTables,
      table: graft.core.TableDefinition,
      at: graft.core.CommitId): Map[String, Long] =
    weightsFrom(engine.readAt(table, at))

  private def weightsFrom(df: DataFrame): Map[String, Long] =
    df.select("tok", "wt").collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /**
   * Token-budget subsampling: from each stream, keep documents in
   * deterministic hash order until the stream's token budget is reached (a
   * document is kept iff it STARTS inside the budget, so the cut is stable
   * under re-partitioning and the kept set always overshoots by less than
   * one document). This is the "take 50 B tokens of web, 10 B of books"
   * step of assembling a training mix, as one window per stream — the same
   * scale shape as [[packSequences]].
   */
  def takeTokenBudget(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      streamCols: Seq[String],
      seed: String): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(streamCols.nonEmpty, "streamCols must not be empty (one global stream = one task)")
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val w = Window.partitionBy(streamCols.map(col): _*).orderBy(key, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_start_off", sum(col(tokenCol).cast("long")).over(w) - col(tokenCol))
      .filter(col("_start_off") < budget)
      .drop("_start_off")
  }

  /**
   * Lexical commonness scoring — the exact-arithmetic stand-in for unigram
   * language-model scoring (no log/exp: transcendental functions differ in
   * the last ulp across engines, while this stays hash-verifiable). Pass 1
   * aggregates the corpus token counts; pass 2 broadcasts that vocabulary
   * back onto the exploded tokens and folds INTEGER sums per document, with
   * exactly one float division at the end:
   *
   *   commonness = sum over tokens of corpus_count(token) / n_tokens
   *
   * High = boilerplate-ish text made of frequent tokens, low = rare/noisy
   * text; downstream curation thresholds both tails. The vocabulary
   * aggregate is tiny (it's a vocabulary) — the join is broadcast; the
   * corpus is scanned twice (once to count, once to score), never shuffled
   * on the document axis.
   */
  def docCommonness(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), explode(graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("corpus_count"))
    toks.join(broadcast(vocab), "token")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("corpus_count")).as("sum_counts"))
      .withColumn("commonness", col("sum_counts").cast("double") / col("n_tokens"))
  }

  /**
   * Corpus vocabulary heavy hitters: the top-`k` tokens by total occurrence
   * count (ties broken by token text for a deterministic boundary), with
   * document frequency alongside. One explode + one aggregation + a top-k —
   * Spark plans the limit as TakeOrderedAndProject over partial aggregates,
   * so the full vocabulary is never collected anywhere.
   */
  def topTokens(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol), explode(graft.functions.TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("term_freq"), countDistinct(col(idCol)).as("doc_freq"))
      .orderBy(col("term_freq").desc, col("token"))
      .limit(k)

  /**
   * Per-document duplicated-span statistics — the document-level view of
   * [[repeatedWindows]], after Lee et al. 2022 ("Deduplicating Training Data
   * Makes Language Models Better"), whose ExactSubstr pipeline measures how
   * much of each document is covered by substrings that recur elsewhere in
   * the corpus. The suffix-array formulation is sequential; this windowed
   * form is the distributed equivalent at fixed span length `n`: a token
   * position is "duplicated" iff some `n`-token window containing it appears
   * in at least `minDocs` distinct documents.
   *
   * Shape: posexplode the sliding windows (one row per token position,
   * linear), aggregate window frequencies (two-phase, map-side combine on
   * within-doc repeats), join the repeated set back onto the positions, then
   * ONE per-document window (ordered by position) merges overlapping spans —
   * `sum(least(next_pos - pos, n))` with the last span contributing `n` is
   * exactly the merged-interval coverage, no interval list ever materialized.
   * Three shuffles, all linear in token count; per-doc window partitions are
   * bounded by document length.
   *
   * With `hashKey` (the 100 TB default) the window key is `xxhash64` of the
   * span, so the wide shuffles carry 8 bytes per position instead of the
   * span text; `hashKey = false` keeps the text key for engine-neutral
   * replay (the driver oracle) — [[CorpusToolsSpec]] pins both keyings to
   * identical results.
   *
   * @return one row per input document: (idCol, `n_tokens`, `dup_windows`
   *         — positions whose window recurs, `dup_tokens` — merged token
   *         coverage), zero-filled for documents with no duplicated spans.
   */
  def duplicatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Int = 2,
      hashKey: Boolean = true): DataFrame = {
    require(n >= 2, s"window must span at least 2 tokens, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2 (cross-document recurrence), got $minDocs")
    val wins = df.select(col(idCol).as("__id"),
        posexplode(graft.functions.VectorExpressions.wordShingles(col(textCol), n))
          .as(Seq("__pos", "__win")))
      .withColumn("__key", if (hashKey) xxhash64(col("__win")) else col("__win"))
      .select("__id", "__pos", "__key")
    val dup = wins.groupBy(col("__key"), col("__id")).agg(count(lit(1)).as("__occ"))
      .groupBy(col("__key")).agg(count(lit(1)).as("__n_docs"))
      .filter(col("__n_docs") >= minDocs)
      .select("__key")
    val hits = wins.join(dup, Seq("__key"))
    val w = Window.partitionBy(col("__id")).orderBy(col("__pos"))
    val stats = hits
      .withColumn("__next", lead(col("__pos"), 1).over(w))
      .groupBy(col("__id"))
      .agg(
        count(lit(1)).as("dup_windows"),
        sum(least(coalesce(col("__next") - col("__pos"), lit(n)), lit(n))).as("dup_tokens"))
    df.select(col(idCol),
        size(graft.functions.TextFunctions.tokens(col(textCol))).as("n_tokens"))
      .join(stats, col(idCol) === col("__id"), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }

  /**
   * Cut duplicated spans out of each document — the "remove" arm of the Lee
   * et al. recipe that [[duplicatedSpans]] measures: every token position
   * covered by a cross-document repeated `n`-token window is dropped, the
   * survivors are reassembled in order. Operates on the normalized
   * (lowercased, whitespace-split) tokenization the window mining sees, so
   * cut boundaries land exactly on the measured spans.
   *
   * Adds one linear stage over [[duplicatedSpans]]: each repeated-window hit
   * explodes into its `n` covered positions (bounded blowup ×n of only the
   * DUPLICATED positions), distinct-collapses, and anti-joins the exploded
   * token list; reassembly is the same ordered-struct fold as
   * [[removeBoilerplateLines]] — per-document work bounded by document
   * length, nothing driver-side.
   *
   * The window MINING runs on the normalized (lowercased) tokenization, but
   * the REASSEMBLY splits the original text case-preservingly (`\s+` token
   * boundaries are identical under lowercasing, so positions align), and
   * documents with no covered positions pass through verbatim — Lee et al.
   * cut spans from the original bytes; an untouched document must come back
   * byte-identical, not case-folded (round-9 fix). Only documents that
   * actually have cuts are tokenized and reassembled, so the per-token
   * explode is bounded by the documents being edited, not the corpus.
   *
   * With `hashKey` (the 100 TB default) the two wide stages key on
   * `xxhash64` of the span — 8 bytes per position through the shuffles
   * instead of the span text; `hashKey = false` keeps the text key for
   * engine-neutral oracle replay. [[CorpusToolsSpec]] pins both keyings
   * identical, like [[duplicatedSpans]].
   *
   * @return the input frame with `textCol` rewritten (documents that were
   *         entirely duplicated spans become empty strings).
   */
  def stripRepeatedSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      minDocs: Int = 2,
      hashKey: Boolean = true): DataFrame = {
    require(n >= 2, s"window must span at least 2 tokens, got $n")
    require(minDocs >= 2, s"minDocs must be >= 2 (cross-document recurrence), got $minDocs")
    val wins = df.select(col(idCol).as("__id"),
        posexplode(graft.functions.VectorExpressions.wordShingles(col(textCol), n))
          .as(Seq("__pos", "__win")))
      .withColumn("__key", if (hashKey) xxhash64(col("__win")) else col("__win"))
      .select("__id", "__pos", "__key")
    val dup = wins.groupBy(col("__key"), col("__id")).agg(count(lit(1)).as("__occ"))
      .groupBy(col("__key")).agg(count(lit(1)).as("__n_docs"))
      .filter(col("__n_docs") >= minDocs)
      .select("__key")
    val covered = wins.join(dup, Seq("__key"))
      .select(col("__id"),
        explode(sequence(col("__pos"), col("__pos") + lit(n - 1))).as("__tpos"))
      .distinct()
    val cutIds = covered.select("__id").distinct()
    // case-preserving token split; positions align with the lowercased mining
    val toks = df.select(col(idCol).as("__id"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("__tpos", "__tok")))
      .join(cutIds, Seq("__id"))
    val rebuilt = toks.join(covered, Seq("__id", "__tpos"), "left_anti")
      .groupBy(col("__id"))
      .agg(concat_ws(" ",
        transform(array_sort(collect_list(struct(col("__tpos"), col("__tok")))),
          x => x.getField("__tok"))).as("__new_text"))
      .withColumnRenamed("__id", "__rid")
    df.join(cutIds.withColumn("__has_cut", lit(true)), df(idCol) === col("__id"), "left")
      .join(rebuilt, df(idCol) === col("__rid"), "left")
      .withColumn(textCol,
        when(col("__has_cut").isNull, col(textCol))
          .otherwise(coalesce(col("__new_text"), lit(""))))
      .drop("__id", "__rid", "__has_cut", "__new_text")
  }

  /**
   * Fixed-budget document chunking with overlap — the context-window prep
   * step of retrieval and long-document training pipelines: split each
   * document into windows of at most `maxTokens` whitespace tokens, adjacent
   * chunks sharing `overlap` tokens. Chunk starts advance by
   * `maxTokens - overlap`; a start is emitted while it is below
   * `n_tokens - overlap` (plus the mandatory start 0), so the final short
   * chunk is kept but a tail chunk that would add no new tokens is not.
   *
   * Pure per-row projection — tokenize, compute starts, slice — then one
   * posexplode: no shuffle at all, chunk ids are deterministic (0-based in
   * document order), and the arithmetic is integral, so any engine replays
   * the chunking bit-exactly. Token text is preserved as-is (no case
   * folding): chunks are payload, not features.
   *
   * @return one row per chunk: (idCol, `chunk_id`, `chunk_start` — token
   *         offset of the chunk, `n_chunk_tokens`, `chunk_text`). Documents
   *         with zero tokens yield no chunks.
   */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxTokens: Int,
      overlap: Int = 0): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap for maxTokens=$maxTokens")
    val step = maxTokens - overlap
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")
    val starts = sequence(lit(0), greatest(size(col("__toks")) - lit(overlap + 1), lit(0)), lit(step))
    df.select(col(idCol), col(textCol))
      .withColumn("__toks", toks)
      .filter(size(col("__toks")) > 0)
      .withColumn("__starts", starts)
      .select(col(idCol), col("__toks"),
        posexplode(col("__starts")).as(Seq("chunk_id", "chunk_start")))
      .select(col(idCol), col("chunk_id"), col("chunk_start"),
        least(lit(maxTokens), size(col("__toks")) - col("chunk_start")).as("n_chunk_tokens"),
        concat_ws(" ", slice(col("__toks"), col("chunk_start") + lit(1), lit(maxTokens)))
          .as("chunk_text"))
  }
}
