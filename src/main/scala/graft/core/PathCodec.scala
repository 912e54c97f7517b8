package graft.core

/**
 * Hive-compatible escaping of partition directory names.
 *
 * Spark's dynamic-partition writer names partition directories with
 * Hive's `escapePathName` encoding (`%XX` for a fixed set of characters:
 * control chars, DEL, double/single quote, hash, percent, star, slash,
 * colon, equals, question mark, backslash, braces, brackets, caret). Any
 * component that *builds*
 * paths to those directories must apply the identical encoding, or a write
 * with e.g. a `:` in a partition value succeeds while every later read
 * targets a nonexistent unescaped path. The character set below matches
 * `org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils` (itself a
 * copy of Hive's `FileUtils.escapePathName`); parity is pinned by a
 * generative spec that cross-checks against the Spark implementation.
 *
 * Kept in `graft.core` (Spark-free) because partition path construction is
 * part of the pure domain layer (reference `model.scala:57-69`).
 */
object PathCodec {

  private val charToEscape: java.util.BitSet = {
    val bitSet = new java.util.BitSet(128)
    // ASCII 01-1F control characters, plus the Hive special set
    (1 to 31).foreach(bitSet.set)
    ("\"#%'*/:=?\\{[]^" + "\u007F").foreach(c => bitSet.set(c.toInt)) // trailing \u007F is DEL, kept explicit
    bitSet
  }

  def needsEscaping(c: Char): Boolean =
    c >= 0 && c < charToEscape.size() && charToEscape.get(c)

  /** Escape a single path element (partition value) exactly as Spark's
    * dynamic-partition writer does. */
  def escapePathName(path: String): String =
    if (!path.exists(needsEscaping)) path
    else {
      val sb = new StringBuilder(path.length + 8)
      path.foreach { c =>
        if (needsEscaping(c)) sb.append(f"%%${c.toInt}%02X")
        else sb.append(c)
      }
      sb.toString()
    }

  /** Inverse of [[escapePathName]]: decode `%XX` sequences (malformed
    * sequences pass through verbatim, matching Hive). */
  def unescapePathName(path: String): String =
    if (!path.contains('%')) path
    else {
      val sb = new StringBuilder(path.length)
      var i = 0
      while (i < path.length) {
        val c = path.charAt(i)
        if (c == '%' && i + 2 < path.length) {
          val code =
            try Integer.parseInt(path.substring(i + 1, i + 3), 16)
            catch { case _: NumberFormatException => -1 }
          if (code >= 0) { sb.append(code.toChar); i += 3 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      }
      sb.toString()
    }

  /** The directory name Spark/Hive uses for a null (or empty-string)
    * partition value. */
  val DefaultPartitionName = "__HIVE_DEFAULT_PARTITION__"
}
