package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus keyword search — BM25 ranking over the whitespace tokenization, the
 * retrieval primitive a curation pipeline uses to pull topical slices out of
 * a corpus (and the lexical half of hybrid lexical+embedding retrieval next
 * to [[Similarity]]).
 *
 * Engine-replayable by the same discipline as the DSIR weights
 * ([[CorpusTools.importanceWeights]]): every transcendental quantity (the
 * idf table) and every shared double constant (k1, b, avgdl and their
 * folds) is computed ONCE driver-side and embedded as a literal on both the
 * Spark and the oracle side, so per-(doc, term) contributions are identical
 * IEEE double chains floored to integers, and the per-document score is an
 * order-free integer sum — hash-exact across engines.
 *
 * Scale shape: scoring is scan → explode filtered to the query terms (only
 * matching occurrences survive the scan) → one aggregation keyed by
 * (doc, term) then doc — the shuffle carries only documents that contain a
 * query term. The stats pre-pass is one corpus aggregation whose result is
 * |terms|+2 numbers. Top-k plans as TakeOrderedAndProject: no global sort,
 * no driver-side data beyond the k results.
 */
object TextSearch {

  /** The corpus statistics BM25 needs: document count, total token count
    * (for the average document length), and per-query-term document
    * frequency. Bounded: |terms| + 2 numbers regardless of corpus size. */
  final case class Bm25Stats(nDocs: Long, totalTokens: Long, docFreq: Map[String, Long]) {
    def avgdl: Double = totalTokens.toDouble / nDocs
  }

  /** Collect [[Bm25Stats]] for `terms` in two aggregations over one scan
    * each; the collected result is |terms| rows + 2 scalars. */
  def bm25Stats(df: DataFrame, idCol: String, textCol: String, terms: Seq[String]): Bm25Stats = {
    require(terms.nonEmpty, "query terms must not be empty")
    // ONE aggregation pass (round 17): corpus totals AND every term's
    // document frequency fuse into a single job. The former shape ran two
    // actions — totals, then an explode+groupBy DF pass — each
    // re-tokenizing the whole corpus; here the token array is computed
    // once per row, each term's membership is an `array_contains` flag,
    // and the N-distinct aggregate plans as one Expand over (id, flags) —
    // trivial next to tokenization. countDistinct keeps the old groupBy's
    // duplicate-id semantics exactly (DF counts DOCUMENTS, not rows; a
    // non-containing row contributes a null, which countDistinct skips,
    // like explode dropped it).
    val base = df.select(col(idCol).as("__id"),
      graft.functions.TextFunctions.tokens(col(textCol)).as("__toks"))
    val termAggs = terms.zipWithIndex.map { case (t, i) =>
      countDistinct(when(array_contains(col("__toks"), t), col("__id"))).as(s"__df_$i")
    }
    val row = base.agg(
      count(lit(1)).as("n"),
      sum(size(col("__toks")).cast("long")).as("tot") +: termAggs: _*)
      .collect()(0)
    require(row.getLong(0) > 0,
      "BM25 statistics over an empty corpus — no documents to collect from")
    Bm25Stats(row.getLong(0), row.getLong(1),
      terms.zipWithIndex.map { case (t, i) => t -> row.getLong(2 + i) }.toMap)
  }

  /** Integer micro-nat idf table, rounded ONCE driver-side (floor, so there
    * is no round-half ambiguity to replay). The +1 inside the log is the
    * Lucene/ATIRE variant: idf stays positive even for terms in most
    * documents. */
  def idfMicro(stats: Bm25Stats): Map[String, Long] =
    stats.docFreq.map { case (t, dfT) =>
      t -> math.floor(1e6 * math.log(
        1.0 + (stats.nDocs - dfT + 0.5) / (dfT + 0.5))).toLong
    }

  /** The shared double constants of one BM25 evaluation, pre-folded
    * driver-side so both engines consume the SAME doubles (shortest
    * round-trip decimal for the SQL side): `kk = k1+1`, `c1 = 1-b`. */
  final case class Bm25Consts(k1: Double, b: Double, kk: Double, c1: Double, avgdl: Double)

  def consts(stats: Bm25Stats, k1: Double = 1.2, b: Double = 0.75): Bm25Consts =
    Bm25Consts(k1, b, k1 + 1.0, 1.0 - b, stats.avgdl)

  /** Per-(doc, term) BM25 contribution in integer micro-nats:
    * `floor(idf_t * (tf*kk) / (tf + k1*(c1 + b*(dl/avgdl))))`. Kept
    * shape-identical to the oracle SQL — change both together. Shared with
    * [[TextIndex.search]] so corpus-scan and index-read scoring are the
    * same arithmetic by construction. */
  private[operators] def contribution(idf: Column, tf: Column, dl: Column, c: Bm25Consts): Column =
    floor(idf.cast("double") *
      ((tf.cast("double") * lit(c.kk)) /
        (tf.cast("double") + lit(c.k1) * (lit(c.c1) + lit(c.b) * (dl.cast("double") / lit(c.avgdl))))))

  /**
   * Top-`k` documents by BM25 score for a bag of query `terms`.
   *
   * @param stats pass a pre-collected [[bm25Stats]] to reuse across queries
   *              (and to register the idf table for an external replay);
   *              collected from `df` when absent.
   * @return (idCol, `score_micro` — integer micro-nat BM25 score,
   *         `n_terms` — distinct query terms present), ties broken by id.
   */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      stats: Option[Bm25Stats] = None,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val st = stats.getOrElse(bm25Stats(df, idCol, textCol, terms))
    val missing = terms.filterNot(st.docFreq.contains)
    require(missing.isEmpty,
      s"stats lack document frequencies for: ${missing.mkString(", ")} — " +
        "collect bm25Stats with the SAME terms the query uses")
    val c = consts(st, k1, b)
    val idf = idfMicro(st)
    val idfCol = terms.foldLeft(lit(0L)) { (acc, t) =>
      when(col("__tok") === t, lit(idf(t))).otherwise(acc)
    }
    val dl = df.select(col(idCol),
      graft.functions.TextFunctions.tokenCount(col(textCol)).cast("long").as("__dl"))
    val tf = ScaleTools.filterInValues(df
      .select(col(idCol), explode(graft.functions.TextFunctions.tokens(col(textCol))).as("__tok")),
        "__tok", terms)
      .groupBy(col(idCol), col("__tok")).agg(count(lit(1)).as("__tf"))
    tf.join(dl, Seq(idCol))
      .withColumn("__contrib",
        contribution(idfCol, col("__tf"), col("__dl"), c).cast("long"))
      .groupBy(col(idCol))
      .agg(sum(col("__contrib")).as("score_micro"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
  }

  /**
   * Reciprocal-rank fusion of two rankings (Cormack et al. 2009) — the
   * standard way to combine lexical ([[bm25TopK]]) and vector
   * ([[Similarity]] top-k) retrieval without comparable scores: a document's
   * fused score is the sum of `1/(rrfK + rank)` over the lists it appears
   * in. Kept all-integer (`1_000_000 div (rrfK + rank)`, integer division) —
   * no floats anywhere, so the fusion replays bit-exactly in any engine.
   *
   * Both inputs are top-k lists, so the full-outer join is bounded by
   * 2k rows regardless of corpus size — the heavy lifting happened in the
   * retrieval stages.
   *
   * @param a,b frames with (idCol, `rank`) — 1-based ranks from each list
   * @return (idCol, `rank_a`, `rank_b` — null where absent, `rrf_micro`),
   *         top `k` by fused score, ties broken by id.
   */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int, rrfK: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rrfK >= 0, s"rrfK must be >= 0, got $rrfK")
    val l = a.select(col(idCol), col("rank").cast("long").as("rank_a"))
    val r = b.select(col(idCol), col("rank").cast("long").as("rank_b"))
    l.join(r, Seq(idCol), "full_outer")
      .withColumn("rrf_micro",
        expr(s"coalesce(1000000 div ($rrfK + rank_a), 0) + coalesce(1000000 div ($rrfK + rank_b), 0)"))
      .orderBy(col("rrf_micro").desc, col(idCol))
      .limit(k)
  }
}
