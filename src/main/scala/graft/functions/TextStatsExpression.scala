package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/**
 * All per-document text statistics in ONE pass over the string — the fused
 * kernel behind `q_text_stats` / `q_curation_pipeline`. The composed form
 * ([[TextFunctions]]) evaluates `split(trim(lower(text)), "\\s+")` and three
 * regexes 6–7 times per row (once per stopword table, once per ratio); this
 * expression walks the text once and emits every count the downstream
 * arithmetic needs. Semantics are replicated EXACTLY (verified field-by-field
 * against the composed form in TextFunctionsSpec, and by the DuckDB oracle):
 *
 *  - `n_tokens` — `size(split(trim(lower(text)), "\\s+"))` with all of
 *    Spark's edges: `trim` strips 0x20 SPACES ONLY, and `split` runs with
 *    limit -1, so BOTH a leading and a trailing non-space whitespace run
 *    yield an empty token; "" splits to [""] (count 1).
 *  - `sw_xx` — stopword hits per language table (ASCII tables, so ASCII
 *    lowering is exact).
 *  - `n_punct` — count of [.!?,;:] code points in the ORIGINAL text.
 *  - `n_nonspace` — code points not matching Java regex `\s`
 *    (= [ \t\n\x0B\f\r], ASCII-only: NBSP etc. count as non-space).
 *  - `n_chars` — code point count of the original text (Spark's `length`).
 *
 * CodegenFallback: the win is the single pass, not the per-row dispatch
 * (same reasoning as [[WordShingleHashes]]).
 */
case class TextStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "text_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")

  override def nullSafeEval(input: Any): Any = {
    val full = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString

    // pass 1 (original text): punct, non-\s code points, total code points
    var nPunct = 0; var nNonspace = 0; var nChars = 0
    var i = 0
    while (i < full.length) {
      val cp = full.codePointAt(i)
      nChars += 1
      if (!TextStats.isJavaSpace(cp)) nNonspace += 1
      cp match {
        case '.' | '!' | '?' | ',' | ';' | ':' => nPunct += 1
        case _                                 => ()
      }
      i += Character.charCount(cp)
    }

    // pass 2 (space-trimmed region): token runs + stopword hits
    var lo = 0; var hi = full.length
    while (lo < hi && full.charAt(lo) == ' ') lo += 1
    while (hi > lo && full.charAt(hi - 1) == ' ') hi -= 1

    var nTokens = 0
    var swEn = 0; var swEs = 0; var swDe = 0; var swFr = 0
    if (lo == hi) {
      nTokens = 1 // "" splits to [""]
    } else {
      // Spark's split uses limit = -1: BOTH a leading and a trailing
      // whitespace run (of \t/\n/\x0B/\f/\r surviving the space-only trim)
      // contribute an empty element — unlike Java's String.split, which
      // drops trailing empties
      if (TextStats.isJavaSpace(full.charAt(lo).toInt)) nTokens += 1
      if (TextStats.isJavaSpace(full.charAt(hi - 1).toInt)) nTokens += 1
      val sb = new java.lang.StringBuilder(TextStats.MaxStopwordLen + 2)
      var inRun = false
      var j = lo
      while (j <= hi) {
        val isSpace = j == hi || TextStats.isJavaSpace(full.charAt(j).toInt)
        if (!isSpace) {
          if (!inRun) { inRun = true; sb.setLength(0) }
          // ASCII-lower while accumulating; stopwords are ASCII, and tokens
          // longer than the longest stopword can never match (cap the buffer)
          if (sb.length() <= TextStats.MaxStopwordLen) {
            val c = full.charAt(j)
            sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c)
          }
        } else if (inRun) {
          inRun = false
          nTokens += 1
          if (sb.length() <= TextStats.MaxStopwordLen) {
            val mask = TextStats.stopwordLang.get(sb.toString)
            if (mask != null) {
              val m = mask.intValue()
              if ((m & 1) != 0) swEn += 1
              if ((m & 2) != 0) swEs += 1
              if ((m & 4) != 0) swDe += 1
              if ((m & 8) != 0) swFr += 1
            }
          }
        }
        j += 1
      }
    }

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTokens, swEn, swEs, swDe, swFr, nPunct, nNonspace, nChars))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {

  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sw_en", IntegerType, nullable = false),
    StructField("sw_es", IntegerType, nullable = false),
    StructField("sw_de", IntegerType, nullable = false),
    StructField("sw_fr", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_nonspace", IntegerType, nullable = false),
    StructField("n_chars", IntegerType, nullable = false)))

  /** Java regex \s without UNICODE_CHARACTER_CLASS: [ \t\n\x0B\f\r]. */
  @inline private[functions] def isJavaSpace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  /** token -> bitmask of stopword tables containing it (1 en, 2 es, 4 de, 8 fr). */
  private[functions] val stopwordLang: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    def add(words: Seq[String], bit: Int): Unit = words.foreach { w =>
      m.merge(w, Integer.valueOf(bit), (a, b) => Integer.valueOf(a | b))
    }
    add(TextFunctions.StopwordsEn, 1)
    add(TextFunctions.StopwordsEs, 2)
    add(TextFunctions.StopwordsDe, 4)
    add(TextFunctions.StopwordsFr, 8)
    m
  }

  private[functions] val MaxStopwordLen: Int =
    (TextFunctions.StopwordsEn ++ TextFunctions.StopwordsEs ++
      TextFunctions.StopwordsDe ++ TextFunctions.StopwordsFr).map(_.length).max
}
