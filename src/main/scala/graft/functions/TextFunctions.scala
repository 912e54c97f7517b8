package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis building blocks for large-scale training-data pipelines:
 * tokenization, language ID (stopword n-gram heuristic), quality scoring,
 * token counting, and document fingerprinting.
 *
 * Everything is composed from codegen'd Spark built-ins (no UDFs) so the
 * whole pipeline stays inside WholeStageCodegen and scales linearly with
 * executors — the difference between "works on 60k docs" and "works on 100 TB".
 */
object TextFunctions {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word pieces + digit runs + punctuation singletons —
    * a cheap deterministic proxy for a real tokenizer's token count. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]{1,4}|[0-9]+|[^a-zA-Z0-9\\s]"), lit(0)))

  /** Distinct word set (for Jaccard-style similarity). */
  def wordSet(text: Column): Column = array_distinct(tokens(text))

  /** Sliding word n-gram shingles, e.g. n=3: "a b c d" -> ["a b c", "b c d"].
    * Documents shorter than n yield a single whole-text shingle. */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", slice(w, i + 1, lit(n)))))
      .otherwise(array(concat_ws(" ", w)))
  }

  // --- language ID: stopword-overlap heuristic ---

  val StopwordsEn: Seq[String] = Seq("the", "of", "and", "to", "in", "is", "a", "that", "for", "it", "was", "on", "as", "with")
  val StopwordsEs: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no", "por", "con", "una", "del")
  val StopwordsDe: Seq[String] = Seq("der", "die", "und", "das", "zu", "den", "von", "mit", "ist", "im", "nicht", "ein", "eine", "auf")
  val StopwordsFr: Seq[String] = Seq("le", "la", "les", "de", "des", "et", "un", "une", "du", "est", "pour", "que", "dans", "sur")

  /** Count of tokens belonging to a stopword list. */
  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(lit(stopwords.toArray), t)))

  /** Heuristic language ID over the stopword tables, deterministic tie-break
    * by declaration order (en > es > de > fr), 'und' (undetermined) when no
    * stopword hits at all. */
  def langId(text: Column): Column = {
    val en = stopwordCount(text, StopwordsEn)
    val es = stopwordCount(text, StopwordsEs)
    val de = stopwordCount(text, StopwordsDe)
    val fr = stopwordCount(text, StopwordsFr)
    when(en + es + de + fr === 0, lit("und"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  // --- quality scoring ---

  /** Number of punctuation characters. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[^.!?,;:]", ""))

  /** Ratio-based quality features; `qualityScore` is a deterministic
    * composite in [0,1]: rewards stopword presence and moderate word length,
    * penalizes punctuation soup. (Heuristics in the spirit of C4/Gopher
    * text-quality filters.) */
  def stopwordRatio(text: Column): Column =
    stopwordCount(text, StopwordsEn) / tokenCount(text)

  def punctRatio(text: Column): Column = punctCount(text) / length(text)

  def meanWordLength(text: Column): Column =
    length(regexp_replace(trim(text), "\\s+", "")) / tokenCount(text)

  def qualityScore(text: Column): Column = {
    val sw = stopwordRatio(text)
    val mwl = meanWordLength(text)
    val punct = punctRatio(text)
    val swTerm = when(sw > 0.4, lit(1.0)).otherwise(sw / 0.4)
    val lenTerm = when(mwl >= 3 && mwl <= 10, lit(1.0)).otherwise(lit(0.5))
    val punctTerm = when(punct > 0.2, lit(0.0)).otherwise(lit(1.0) - punct / 0.2)
    (swTerm + lenTerm + punctTerm) / 3
  }

  // --- fused single-pass statistics (the scale path) ---

  /** Every count the functions above derive, in ONE pass over the text
    * ([[TextStats]]): struct(n_tokens, sw_en, sw_es, sw_de, sw_fr, n_punct,
    * n_nonspace, n_chars). The composed forms above are the semantic
    * reference; the `*FromStats` helpers below reproduce their arithmetic
    * bit-for-bit from the struct, so a pipeline computes the stats once and
    * derives everything downstream. */
  def textStats(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      TextStats(org.apache.spark.sql.GraftSqlBridge.expression(text)))

  /** [[langId]] from a [[textStats]] struct. */
  def langIdFromStats(st: Column): Column = {
    val en = st.getField("sw_en"); val es = st.getField("sw_es")
    val de = st.getField("sw_de"); val fr = st.getField("sw_fr")
    when(en + es + de + fr === 0, lit("und"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** [[meanWordLength]] from a [[textStats]] struct. */
  def meanWordLengthFromStats(st: Column): Column =
    st.getField("n_nonspace") / st.getField("n_tokens")

  /** [[qualityScore]] from a [[textStats]] struct (identical arithmetic —
    * same int-division-to-double promotions, same thresholds). */
  def qualityScoreFromStats(st: Column): Column = {
    val sw = st.getField("sw_en") / st.getField("n_tokens")
    val mwl = meanWordLengthFromStats(st)
    val punct = st.getField("n_punct") / st.getField("n_chars")
    val swTerm = when(sw > 0.4, lit(1.0)).otherwise(sw / 0.4)
    val lenTerm = when(mwl >= 3 && mwl <= 10, lit(1.0)).otherwise(lit(0.5))
    val punctTerm = when(punct > 0.2, lit(0.0)).otherwise(lit(1.0) - punct / 0.2)
    (swTerm + lenTerm + punctTerm) / 3
  }

  // --- fingerprinting ---

  /** Whole-document fingerprint (content hash). */
  def docFingerprint(text: Column): Column = md5(trim(text))

  /** Winnowing-style shingle fingerprint: the lexicographic minimum of the
    * shingle hash set — robust to reordering/small edits, engine-portable
    * (md5 hex compares identically everywhere). */
  def minShingleFingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(text, n), s => md5(s)))

  // --- PII detection / redaction ---
  // ASCII-explicit character classes only: identical semantics under Java
  // regex (Spark) and RE2 (DuckDB), so extraction and redaction replay
  // exactly in the oracle. All built-ins — stays inside codegen.

  /** Email addresses: local part `@` domain with a 2+-letter final label. */
  val EmailRegex: String = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** http/https URLs up to the first character outside the path alphabet. */
  val UrlRegex: String = "https?://[a-zA-Z0-9./_%-]+"

  /** All email matches, in document order (empty array when none). */
  def extractEmails(text: Column): Column =
    regexp_extract_all(text, lit(EmailRegex), lit(0))

  /** All URL matches, in document order (empty array when none). */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(UrlRegex), lit(0))

  /** Replace every email with `<EMAIL>` and every URL with `<URL>` (emails
    * first — the two alphabets cannot produce overlapping matches, so the
    * order only matters for determinism of the spec, not the result). */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRegex, "<EMAIL>"), UrlRegex, "<URL>")

  // --- URL / domain curation (C4/RefinedWeb-style web-corpus provenance) ---

  /** Lower-cased host of an absolute URL: the authority between `://` (after
    * any userinfo `@`) and the first `/ : ? #`. Schemeless strings yield ''
    * — web-corpus provenance URLs are absolute by construction, and a loud
    * empty beats guessing. Port is excluded by the `[^/:?#]` class. Pure
    * regexp — stays inside codegen, and the same RE2-compatible pattern
    * replays in the DuckDB oracle. */
  val UrlHostRegex: String = "^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"

  def urlHost(url: Column): Column =
    regexp_extract(lower(url), UrlHostRegex, 1)

  /** Second-level labels that act as country-code TLD namespaces (the
    * high-frequency core of the Public Suffix List): `example.co.uk` must
    * group as `example.co.uk`, not `co.uk`. A full PSL is a data file, not
    * an engine primitive; this deterministic approximation covers the
    * dominant patterns and is documented as such.
    *
    * Known misgrouping classes, pinned in TextFunctionsSpec so the boundary
    * is a tested contract, not prose:
    *  - PRIVATE-REGISTRY suffixes (`user.github.io`, `blog.blogspot.com`):
    *    the PSL treats each user site as its own registrable domain; this
    *    heuristic merges them all under `github.io`/`blogspot.com`, so a
    *    per-domain cap treats the whole registry as ONE domain
    *    (under-representing its sites).
    *  - ccSLDs OUTSIDE the seven-label core (`x.ne.jp`, `y.or.kr`): the PSL
    *    makes `x.ne.jp` registrable; this heuristic groups every `*.ne.jp`
    *    host together — same over-merge direction as above. */
  val CcSecondLevels: Seq[String] = Seq("co", "com", "net", "org", "ac", "gov", "edu")

  /** Registered domain (eTLD+1) of a host, per the [[CcSecondLevels]]
    * approximation: the last two labels, or the last three when the
    * second-to-last is a country-code second-level under a 2-letter TLD.
    * Hosts with < 3 labels pass through lower-cased (already registrable or
    * a bare TLD). Array ops only — codegen'd, oracle-replayable. */
  def registeredDomain(host: Column): Column = {
    val labels = split(lower(host), "\\.")
    val n = size(labels)
    val tld = element_at(labels, -1)
    val sld = element_at(labels, -2)
    val ccSld = array_contains(lit(CcSecondLevels.toArray), sld) && length(tld) === 2
    when(n <= 2, lower(host))
      .when(ccSld, concat_ws(".", element_at(labels, -3), sld, tld))
      .otherwise(concat_ws(".", sld, tld))
  }

  /** [[registeredDomain]] straight off an absolute URL ('' when no host). */
  def urlDomain(url: Column): Column = {
    val h = urlHost(url)
    when(h === "", lit("")).otherwise(registeredDomain(h))
  }

  // --- cleaning / normalization ---

  /** Markup tags `<...>` (non-greedy to the first `>`). Tag-level stripping
    * only — entity decoding and script-content removal are corpus-specific
    * policy, not a engine primitive. */
  val HtmlTagRegex: String = "<[^>]*>"

  /** Replace markup tags with spaces (so `a<br>b` keeps a token boundary). */
  def stripHtml(text: Column): Column = regexp_replace(text, HtmlTagRegex, " ")

  /** Collapse whitespace runs to single spaces and trim the ends. */
  def collapseWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** The standard web-text cleaning pass: strip tags, normalize whitespace. */
  def cleanText(text: Column): Column = collapseWhitespace(stripHtml(text))
}
