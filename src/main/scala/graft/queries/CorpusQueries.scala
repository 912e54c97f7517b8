package graft.queries

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.CorpusTools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Corpus-preparation query surface (deterministic shuffle, mixture sampling,
 * sequence packing, repeated-window mining, vocabulary stats, PII scan) over
 * the `documents` table. Every query is DuckDB-oracled: the operators derive
 * all randomness from md5 content hashes and keep all arithmetic integral,
 * so an independent engine replays them bit-exactly.
 */
object CorpusQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Mixture weights for q_mixture_sample — powers of two so the 1/2^32
    * threshold quantization in [[CorpusTools.hexThreshold]] is exact. */
  private val MixWeights = Map("src0" -> 1.0, "src1" -> 0.75, "src2" -> 0.5, "src3" -> 0.25)
  private val MixDefault = 0.125

  /** Deterministic synthetic contact block appended to each doc so the PII
    * extractors have real matches to find (the fixture vocabulary itself
    * contains no emails/URLs). Mirrored verbatim in the oracle SQL. */
  private def withContact(df: DataFrame): DataFrame =
    df.withColumn("contact", concat(
      col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example or https://ex"), pmod(col("doc_id"), lit(7)).cast("string"),
      lit(".example/p/"), col("doc_id").cast("string")))

  val defs: Map[String, Q] = Map(
    // sharded deterministic global shuffle: stable (shard, pos) training order
    "q_corpus_shuffle" -> ((s, d) =>
      CorpusTools.deterministicShuffle(
          Tables.documents(s, d).select(col("doc_id"), col("source")),
          idCol = "doc_id", seed = "graft", numShards = 16)
        .select("doc_id", "source", "shard", "pos")),

    // weighted per-source mixture sampling (scan filter, no shuffle)
    "q_mixture_sample" -> ((s, d) =>
      CorpusTools.mixtureSample(Tables.documents(s, d),
          idCol = "doc_id", classCol = "source",
          weights = MixWeights, defaultWeight = MixDefault, seed = "mix")
        .select("doc_id", "lang", "source")),

    // concat-and-chunk token packing into 512-token bins per source stream
    "q_pack_sequences" -> ((s, d) =>
      CorpusTools.packSequences(
          Tables.documents(s, d)
            .select(col("doc_id"), col("source"),
              TextFunctions.tokenCount(col("text")).as("n_tokens")),
          idCol = "doc_id", tokenCol = "n_tokens", budget = 512,
          streamCols = Seq("source"))
        .select("doc_id", "source", "n_tokens", "seq_id", "bin_offset")),

    // repeated 8-token windows across documents: the scalable substring-dedup
    // approximation (recurring spans a curation pipeline down-weights)
    "q_window_dedup" -> ((s, d) =>
      CorpusTools.repeatedWindows(Tables.documents(s, d),
        idCol = "doc_id", textCol = "text", n = 8, minDocs = 2)),

    // corpus vocabulary heavy hitters (top 20 by term frequency)
    "q_vocab_topk" -> ((s, d) =>
      CorpusTools.topTokens(Tables.documents(s, d),
        idCol = "doc_id", textCol = "text", k = 20)),

    // per-source token-budget cut: keep docs (hash order) until 2000 tokens
    "q_token_budget" -> ((s, d) =>
      CorpusTools.takeTokenBudget(
          Tables.documents(s, d)
            .select(col("doc_id"), col("source"),
              TextFunctions.tokenCount(col("text")).as("n_tokens")),
          idCol = "doc_id", tokenCol = "n_tokens", budget = 2000L,
          streamCols = Seq("source"), seed = "budget")
        .select("doc_id", "source", "n_tokens")),

    // lexical commonness (unigram-LM quality proxy, exact integer folds)
    "q_doc_rarity" -> ((s, d) =>
      CorpusTools.docCommonness(Tables.documents(s, d), idCol = "doc_id", textCol = "text")
        .select("doc_id", "n_tokens", "sum_counts", "commonness")),

    // web-text cleaning: strip markup, collapse whitespace — over a
    // deterministic HTML wrapping of each doc (the fixture has no markup)
    "q_clean_text" -> ((s, d) => {
      val html = concat(
        lit("<html><body>\n  <p class=\"c\">"), col("text"),
        lit("</p><br/>\n\n<div>footer "), col("doc_id").cast("string"),
        lit("</div>\n</body></html>"))
      Tables.documents(s, d)
        .withColumn("html", html)
        .select(
          col("doc_id"),
          length(col("html")).as("n_raw"),
          TextFunctions.cleanText(col("html")).as("cleaned"))
        .withColumn("n_clean", length(col("cleaned")))
    }),

    // PII scan over the synthetic contact block: extraction counts, first
    // matches, and the redacted text
    "q_pii_extract" -> ((s, d) => {
      val emails = TextFunctions.extractEmails(col("contact"))
      val urls = TextFunctions.extractUrls(col("contact"))
      withContact(Tables.documents(s, d)).select(
        col("doc_id"),
        size(emails).as("n_emails"),
        size(urls).as("n_urls"),
        get(emails, lit(0)).as("first_email"),
        get(urls, lit(0)).as("first_url"),
        TextFunctions.redactPii(col("contact")).as("redacted"))
    }),

    // corpus-wide boilerplate line removal (the C4/CCNet line-dedup stage)
    // over a deterministic line-ification of each doc (4-word lines — the
    // fixture has no newlines): any line shared by more than one document
    // vanishes from every document, surviving lines keep order
    "q_line_dedup" -> ((s, d) =>
      CorpusTools.removeBoilerplateLines(linedDocuments(s, d), maxDocFrequency = 1L)
        .select(col("doc_id"), col("text"), length(col("text")).as("n_clean"))),

    // Gopher-style within-document repetition signals: duplicate 2-/3-gram
    // ratios (1 - distinct/total) from the fused shingle kernels — one
    // native pass per n, scan-local, no shuffle. The `repetitive` flag is
    // the published filter rule (dup-2-gram ratio > 0.2); ratios are
    // integer/integer IEEE divisions, bit-exact across engines.
    "q_repetition" -> ((s, d) => {
      import graft.functions.VectorExpressions.wordShingleHashes
      def ratio(n: Int): org.apache.spark.sql.Column = {
        val total = size(wordShingleHashes(col("text"), n, distinct = false))
        val dist = size(wordShingleHashes(col("text"), n, distinct = true))
        when(total > 0, lit(1.0) - dist.cast("double") / total.cast("double"))
          .otherwise(lit(0.0))
      }
      Tables.documents(s, d).select(
        col("doc_id"),
        size(wordShingleHashes(col("text"), 1, distinct = false)).as("n_tokens"),
        ratio(2).as("dup_2gram_ratio"),
        ratio(3).as("dup_3gram_ratio"),
        (ratio(2) > 0.2).as("repetitive"))
    }),

    // deterministic 80/10/10 train/val/test assignment: a pure scan
    // projection from (seed, doc_id) — stable under corpus growth, nested
    // across weight changes, identical on any engine
    "q_split_assign" -> ((s, d) =>
      CorpusTools.splitAssign(Tables.documents(s, d), idCol = "doc_id", seed = "split",
          splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "source", "split")),

    // per-document duplicated-span coverage (Lee et al. substring-dedup
    // measurement): merged token coverage of cross-document repeated 8-token
    // windows. Text window keys here so the oracle replays them; the
    // hashKey=true production twin is pinned equal in CorpusToolsSpec.
    "q_dup_spans" -> ((s, d) =>
      CorpusTools.duplicatedSpans(Tables.documents(s, d),
        idCol = "doc_id", textCol = "text", n = 8, minDocs = 2, hashKey = false)),

    // the matching removal arm: cut every duplicated-span token position,
    // reassemble survivors in order (case-preserving; uncut docs verbatim).
    // Text window keys so the oracle replays them; the hashKey=true
    // production twin is pinned equal in CorpusToolsSpec.
    "q_strip_spans" -> ((s, d) =>
      CorpusTools.stripRepeatedSpans(Tables.documents(s, d),
          idCol = "doc_id", textCol = "text", n = 8, minDocs = 2, hashKey = false)
        .select(col("doc_id"), col("text"), length(col("text")).as("n_clean"))),

    // context-window chunking with overlap (32-token chunks, 8 shared):
    // pure projection + posexplode, no shuffle
    "q_chunk_docs" -> ((s, d) =>
      CorpusTools.chunkDocuments(Tables.documents(s, d),
        idCol = "doc_id", textCol = "text", maxTokens = 32, overlap = 8)),

    // URL provenance extraction: host + registered domain (eTLD+1 heuristic)
    // off a synthetic absolute URL exercising userinfo, ports, and ccSLD
    // (.co.uk) shapes — pure regexp/array projection, no shuffle
    "q_url_extract" -> ((s, d) =>
      withUrl(Tables.documents(s, d)).select(col("doc_id"), col("url"),
        TextFunctions.urlHost(col("url")).as("host"),
        TextFunctions.urlDomain(col("url")).as("domain"))),

    // per-domain cap sampling (C4/RefinedWeb domain balancing): keep at most
    // 10 docs per synthetic domain, chosen by deterministic md5(seed:id)
    // order; mixes over-cap hot domains with under-cap rare ones so both
    // paths of the split execute
    "q_domain_cap" -> ((s, d) =>
      CorpusTools.capPerGroup(
          Tables.documents(s, d).withColumn("domain", capDomain),
          groupCol = "domain", idCol = "doc_id", cap = 10, seed = "graft-cap")
        .select(col("doc_id"), col("domain"))),

    // deterministic exact-size sample: the 100 md5-smallest docs —
    // TakeOrderedAndProject, O(n) per partition
    "q_sample_n" -> ((s, d) =>
      CorpusTools.sampleN(Tables.documents(s, d), idCol = "doc_id", n = 100, seed = "gate")
        .select("doc_id", "lang", "source"))
  )

  /** Synthetic absolute URL, deterministic per doc: rotates userinfo (every
    * 11th doc), a port (every 7th), subdomain depth, and a ccSLD `.co.uk`
    * TLD (doc_id % 3 == 0) so every branch of urlHost/registeredDomain runs
    * at the gate. Mirrored exactly in [[urlSql]]. */
  private def withUrl(df: DataFrame): DataFrame = {
    val id = col("doc_id")
    df.withColumn("url", concat(
      lit("https://"),
      when(pmod(id, lit(11)) === 0, concat(lit("u"), id.cast("string"), lit("@"))).otherwise(lit("")),
      lit("www.Sub"), pmod(id, lit(5)).cast("string"),
      lit(".Site"), pmod(id, lit(37)).cast("string"),
      when(pmod(id, lit(3)) === 0, lit(".co.uk"))
        .when(pmod(id, lit(3)) === 1, lit(".com"))
        .otherwise(lit(".org")),
      when(pmod(id, lit(7)) === 0, lit(":8443")).otherwise(lit("")),
      lit("/p/"), id.cast("string")))
  }

  /** Synthetic domain for the cap query: ~34 hot domains (well over the cap
    * of 10 at every gate scale) plus a long tail of rare ones (under cap). */
  private def capDomain: org.apache.spark.sql.Column =
    when(pmod(col("doc_id"), lit(37)) < 3,
      concat(lit("rare"), pmod(col("doc_id"), lit(1000)).cast("string")))
      .otherwise(concat(lit("d"), pmod(col("doc_id"), lit(37)).cast("string")))

  /** Deterministic multi-line view of the corpus: each doc's words chunked
    * into 4-word lines joined by newlines. Mirrored exactly in the oracle
    * (DuckDB list slicing); 4 words over the fixture's 31-word vocabulary
    * makes cross-document line collisions present but not dominant. */
  private def linedDocuments(s: SparkSession, d: String): DataFrame = {
    val w = split(col("text"), " ")
    val numLines = ceil(size(w) / lit(4.0)).cast("int")
    Tables.documents(s, d).select(col("doc_id"),
      concat_ws("\n",
        transform(sequence(lit(0), numLines - 1),
          i => concat_ws(" ", slice(w, i * 4 + 1, lit(4))))).as("text"))
  }

  private val duckTokens = "string_split_regex(trim(lower(text)), '\\s+')"

  /** DuckDB rendition of the synthetic URL in [[withUrl]]. */
  private val urlSql =
    """'https://'
      | || CASE WHEN doc_id % 11 = 0 THEN 'u' || CAST(doc_id AS VARCHAR) || '@' ELSE '' END
      | || 'www.Sub' || CAST(doc_id % 5 AS VARCHAR)
      | || '.Site' || CAST(doc_id % 37 AS VARCHAR)
      | || CASE WHEN doc_id % 3 = 0 THEN '.co.uk'
      |         WHEN doc_id % 3 = 1 THEN '.com' ELSE '.org' END
      | || CASE WHEN doc_id % 7 = 0 THEN ':8443' ELSE '' END
      | || '/p/' || CAST(doc_id AS VARCHAR)""".stripMargin.replace("\n", "")

  /** DuckDB rendition of the synthetic contact block in [[withContact]]. */
  private val contactSql =
    """text || ' contact user' || CAST(doc_id AS VARCHAR)
      | || '@mail.example or https://ex' || CAST(doc_id % 7 AS VARCHAR)
      | || '.example/p/' || CAST(doc_id AS VARCHAR)""".stripMargin.replace("\n", "")

  // single-quoted SQL strings treat backslash literally in DuckDB, so the
  // Java-side regex strings embed unchanged
  private val emailRe = TextFunctions.EmailRegex
  private val urlRe = TextFunctions.UrlRegex

  /** CASE expression mirroring the when-chain threshold in mixtureSample. */
  private val mixThresholdSql = {
    val cases = MixWeights.toSeq.sortBy(_._1).map { case (cls, w) =>
      s"WHEN source = '${cls.replace("'", "''")}' THEN '${CorpusTools.hexThreshold(w)}'"
    }.mkString(" ")
    s"CASE $cases ELSE '${CorpusTools.hexThreshold(MixDefault)}' END"
  }

  /** The first 8 hex chars of `key` as an integer, nibble-positionally —
    * DuckDB has no hex-string-to-int cast, so the replay sums
    * nibble*16^(7-i) terms (exactly what Spark's `conv(_, 16, 10)` does). */
  private val hexPrefixToIntSql: String =
    (0 until 8).map { i =>
      val weight = 1L << (4 * (7 - i))
      s"(strpos('0123456789abcdef', substring(key, ${i + 1}, 1)) - 1) * $weight"
    }.mkString("(", " + ", ")")

  val oracles: Map[String, String] = Map(
    "q_corpus_shuffle" ->
      s"""WITH k AS (
         |  SELECT doc_id, source,
         |    md5(concat_ws(':', 'graft', doc_id)) AS key
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, source, key,
         |    $hexPrefixToIntSql % 16 AS shard
         |  FROM k)
         |SELECT doc_id, source, shard,
         |  ROW_NUMBER() OVER (PARTITION BY shard ORDER BY key, doc_id) AS pos
         |FROM s""".stripMargin,

    "q_mixture_sample" ->
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE substring(md5(concat_ws(':', 'mix', doc_id)), 1, 8) < $mixThresholdSql""".stripMargin,

    "q_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, len($duckTokens) AS n_tokens FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      - n_tokens AS start_off
         |  FROM t)
         |SELECT doc_id, source, n_tokens,
         |  start_off // 512 AS seq_id, start_off % 512 AS bin_offset
         |FROM c""".stripMargin,

    "q_window_dedup" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $duckTokens AS w FROM documents),
         |wins AS (
         |  SELECT doc_id,
         |    unnest(list_transform(generate_series(1, len(w) - 7),
         |      i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3],
         |                          w[i+4], w[i+5], w[i+6], w[i+7]))) AS win_text
         |  FROM toks WHERE len(w) >= 8)
         |SELECT win_text, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ,
         |  MIN(doc_id) AS first_doc
         |FROM wins GROUP BY win_text HAVING COUNT(DISTINCT doc_id) >= 2""".stripMargin,

    "q_vocab_topk" ->
      s"""SELECT token, COUNT(*) AS term_freq, COUNT(DISTINCT doc_id) AS doc_freq
         |FROM (SELECT doc_id, unnest($duckTokens) AS token FROM documents)
         |GROUP BY token ORDER BY term_freq DESC, token LIMIT 20""".stripMargin,

    "q_token_budget" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, len($duckTokens) AS n_tokens,
         |    md5(concat_ws(':', 'budget', doc_id)) AS key
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY key, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      - n_tokens AS start_off
         |  FROM t)
         |SELECT doc_id, source, n_tokens FROM c WHERE start_off < 2000""".stripMargin,

    "q_doc_rarity" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($duckTokens) AS token FROM documents),
         |vocab AS (
         |  SELECT token, COUNT(*) AS corpus_count FROM toks GROUP BY token)
         |SELECT doc_id, COUNT(*) AS n_tokens,
         |  CAST(SUM(corpus_count) AS BIGINT) AS sum_counts,
         |  CAST(SUM(corpus_count) AS DOUBLE) / COUNT(*) AS commonness
         |FROM toks JOIN vocab USING (token)
         |GROUP BY doc_id""".stripMargin,

    "q_clean_text" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<html><body>' || chr(10) || '  <p class="c">' || text ||
         |    '</p><br/>' || chr(10) || chr(10) || '<div>footer ' ||
         |    CAST(doc_id AS VARCHAR) || '</div>' || chr(10) || '</body></html>' AS html
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, length(html) AS n_raw,
         |    trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
         |                        '\\s+', ' ', 'g')) AS cleaned
         |  FROM h)
         |SELECT doc_id, n_raw, cleaned, length(cleaned) AS n_clean FROM c""".stripMargin,

    "q_pii_extract" ->
      s"""WITH c AS (SELECT doc_id, $contactSql AS contact FROM documents)
         |SELECT doc_id,
         |  len(regexp_extract_all(contact, '$emailRe', 0)) AS n_emails,
         |  len(regexp_extract_all(contact, '$urlRe', 0)) AS n_urls,
         |  regexp_extract_all(contact, '$emailRe', 0)[1] AS first_email,
         |  regexp_extract_all(contact, '$urlRe', 0)[1] AS first_url,
         |  regexp_replace(regexp_replace(contact, '$emailRe', '<EMAIL>', 'g'),
         |                 '$urlRe', '<URL>', 'g') AS redacted
         |FROM c""".stripMargin,

    // line-ification (4-word chunks) + doc-frequency boilerplate removal +
    // ordered reassembly — the whole pipeline replayed in SQL
    "q_line_dedup" ->
      """WITH lined AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(0, CAST(ceil(len(w) / 4.0) AS INT) - 1),
        |      i -> array_to_string(w[i*4+1 : i*4+4], ' ')) AS ls
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |l AS (
        |  SELECT doc_id, ls[i] AS line, i
        |  FROM lined, UNNEST(generate_series(1, len(ls))) AS t(i)),
        |boiler AS (
        |  SELECT line FROM l GROUP BY line HAVING count(DISTINCT doc_id) > 1),
        |kept AS (SELECT * FROM l WHERE line NOT IN (SELECT line FROM boiler)),
        |rebuilt AS (
        |  SELECT doc_id, array_to_string(list(line ORDER BY i), chr(10)) AS text
        |  FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(r.text, '') AS text,
        |  length(coalesce(r.text, '')) AS n_clean
        |FROM documents d LEFT JOIN rebuilt r USING (doc_id)""".stripMargin,

    // string shingles vs the kernel's 64-bit hashed shingles: distinct and
    // total COUNTS agree up to negligible collision odds; the short-doc
    // fallback (whole text as one shingle) mirrors WordShingleHashes
    "q_repetition" ->
      s"""WITH toks AS (SELECT doc_id, $duckTokens AS w FROM documents),
         |grams AS (
         |  SELECT doc_id, len(w) AS n_tokens,
         |    CASE WHEN len(w) >= 2 THEN list_transform(generate_series(1, len(w) - 1),
         |        i -> concat_ws(' ', w[i], w[i+1]))
         |      ELSE [array_to_string(w, ' ')] END AS g2,
         |    CASE WHEN len(w) >= 3 THEN list_transform(generate_series(1, len(w) - 2),
         |        i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
         |      ELSE [array_to_string(w, ' ')] END AS g3
         |  FROM toks),
         |r AS (
         |  SELECT doc_id, n_tokens,
         |    CASE WHEN len(g2) > 0
         |      THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) ELSE 0.0 END AS dup_2gram_ratio,
         |    CASE WHEN len(g3) > 0
         |      THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) ELSE 0.0 END AS dup_3gram_ratio
         |  FROM grams)
         |SELECT doc_id, n_tokens, dup_2gram_ratio, dup_3gram_ratio,
         |  dup_2gram_ratio > 0.2 AS repetitive
         |FROM r""".stripMargin,

    // cumulative md5-prefix thresholds: < t(0.8) -> train, < t(0.9) -> val
    "q_split_assign" ->
      s"""SELECT doc_id, source,
         |  CASE
         |    WHEN substring(md5(concat_ws(':', 'split', doc_id)), 1, 8)
         |      < '${CorpusTools.hexThreshold(0.8)}' THEN 'train'
         |    WHEN substring(md5(concat_ws(':', 'split', doc_id)), 1, 8)
         |      < '${CorpusTools.hexThreshold(0.8 + 0.1)}' THEN 'val'
         |    ELSE 'test'
         |  END AS split
         |FROM documents""".stripMargin,

    // windowed-span coverage: positions of repeated 8-token windows, merged
    // interval coverage via one LEAD per doc — the same three-stage plan the
    // Spark operator runs
    "q_dup_spans" ->
      s"""WITH toks AS (SELECT doc_id, $duckTokens AS w FROM documents),
         |wins AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3],
         |                   w[i+4], w[i+5], w[i+6], w[i+7]) AS win
         |  FROM toks, UNNEST(generate_series(1, len(w) - 7)) AS t(i)
         |  WHERE len(w) >= 8),
         |dup AS (SELECT win FROM wins GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2),
         |hits AS (SELECT doc_id, pos FROM wins JOIN dup USING (win)),
         |cov AS (
         |  SELECT doc_id, pos,
         |    LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS next
         |  FROM hits),
         |agg AS (
         |  SELECT doc_id, COUNT(*) AS dup_windows,
         |    CAST(SUM(LEAST(COALESCE(next - pos, 8), 8)) AS BIGINT) AS dup_tokens
         |  FROM cov GROUP BY doc_id)
         |SELECT t.doc_id, len(t.w) AS n_tokens,
         |  COALESCE(a.dup_windows, 0) AS dup_windows,
         |  COALESCE(a.dup_tokens, 0) AS dup_tokens
         |FROM toks t LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // duplicated positions -> covered token set -> ordered reassembly of the
    // survivors (the strip arm over the same wins/dup CTEs). Mining runs on
    // the lowercased tokens; reassembly splits the ORIGINAL text (\s+
    // boundaries are identical under lowercasing, so positions align), and
    // docs with no covered positions pass through verbatim — matching the
    // operator's round-9 case-preserving semantics.
    "q_strip_spans" ->
      s"""WITH toks AS (SELECT doc_id, $duckTokens AS w FROM documents),
         |wins AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3],
         |                   w[i+4], w[i+5], w[i+6], w[i+7]) AS win
         |  FROM toks, UNNEST(generate_series(1, len(w) - 7)) AS t(i)
         |  WHERE len(w) >= 8),
         |dup AS (SELECT win FROM wins GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2),
         |hits AS (SELECT doc_id, pos FROM wins JOIN dup USING (win)),
         |covered AS (
         |  SELECT DISTINCT doc_id, pos + j AS tpos
         |  FROM hits, UNNEST(generate_series(0, 7)) AS u(j)),
         |ptoks AS (SELECT doc_id,
         |  string_split_regex(trim(text), '\\s+') AS w FROM documents),
         |tok AS (
         |  SELECT doc_id, i - 1 AS tpos, w[i] AS tok
         |  FROM ptoks, UNNEST(generate_series(1, len(w))) AS t(i)
         |  WHERE doc_id IN (SELECT DISTINCT doc_id FROM covered)),
         |kept AS (
         |  SELECT k.doc_id, k.tpos, k.tok FROM tok k
         |  LEFT JOIN covered c ON c.doc_id = k.doc_id AND c.tpos = k.tpos
         |  WHERE c.doc_id IS NULL),
         |rebuilt AS (
         |  SELECT doc_id, array_to_string(list(tok ORDER BY tpos), ' ') AS text
         |  FROM kept GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CASE WHEN d.doc_id IN (SELECT DISTINCT doc_id FROM covered)
         |       THEN COALESCE(r.text, '') ELSE d.text END AS text,
         |  length(CASE WHEN d.doc_id IN (SELECT DISTINCT doc_id FROM covered)
         |              THEN COALESCE(r.text, '') ELSE d.text END) AS n_clean
         |FROM documents d LEFT JOIN rebuilt r USING (doc_id)""".stripMargin,

    // chunk starts 0, step, 2*step ... below len - overlap; inclusive-slice
    // reassembly — all integer arithmetic
    "q_chunk_docs" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |ex AS (
        |  SELECT doc_id, w, s,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS chunk_id
        |  FROM toks, UNNEST(generate_series(0, GREATEST(len(w) - 9, 0), 24)) AS t(s)
        |  WHERE len(w) > 0)
        |SELECT doc_id, chunk_id, s AS chunk_start,
        |  LEAST(32, len(w) - s) AS n_chunk_tokens,
        |  array_to_string(w[s+1 : s+32], ' ') AS chunk_text
        |FROM ex""".stripMargin,

    // same synthetic URL, same RE2-compatible host regex (no backslashes, so
    // single-quoted embedding is safe), same ccSLD label arithmetic
    "q_url_extract" ->
      s"""WITH u AS (SELECT doc_id, $urlSql AS url FROM documents),
         |h AS (SELECT doc_id, url,
         |  regexp_extract(lower(url),
         |    '^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1) AS host
         |  FROM u),
         |w AS (SELECT doc_id, url, host, string_split(host, '.') AS ls FROM h)
         |SELECT doc_id, url, host,
         |  CASE WHEN host = '' THEN ''
         |       WHEN len(ls) <= 2 THEN host
         |       WHEN list_contains(['co','com','net','org','ac','gov','edu'], ls[-2])
         |            AND length(ls[-1]) = 2
         |         THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
         |       ELSE ls[-2] || '.' || ls[-1] END AS domain
         |FROM w""".stripMargin,

    "q_sample_n" ->
      """SELECT doc_id, lang, source FROM documents
        |ORDER BY md5('gate:' || CAST(doc_id AS VARCHAR)), doc_id
        |LIMIT 100""".stripMargin,

    // the cap rule IS the plain window formulation (the operator's split
    // path is a performance shape, pinned equivalent in CorpusToolsSpec)
    "q_domain_cap" ->
      """WITH dd AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 37 < 3 THEN 'rare' || CAST(doc_id % 1000 AS VARCHAR)
        |         ELSE 'd' || CAST(doc_id % 37 AS VARCHAR) END AS domain
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, domain, ROW_NUMBER() OVER (
        |    PARTITION BY domain
        |    ORDER BY md5('graft-cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM dd)
        |SELECT doc_id, domain FROM r WHERE rn <= 10""".stripMargin
  )
}
