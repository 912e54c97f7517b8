package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expressions for float-vector math.
 *
 * The composable route (`zip_with` + `aggregate`) works but both higher-order
 * functions are `CodegenFallback` — every row pays interpreted-lambda and
 * boxing overhead, which dominates brute-force ANN scans. These expressions
 * generate a tight primitive loop inside whole-stage codegen instead
 * (preference order (b) of the build rules: a custom `Expression` with
 * `doGenCode` beats composed-but-interpreted built-ins when the operator is
 * on the hot path).
 *
 * Null/shape semantics match the HOF formulation: mismatched array lengths
 * or a null element yield NULL (zip_with pads with null and the aggregate
 * propagates it). Accumulation is left-to-right in a double; the only
 * intended divergence is per-element multiplication in double rather than
 * float (strictly more accurate).
 */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Tokenize → build word `n`-gram shingles → 64-bit-hash each shingle, in one
 * expression evaluation. Semantically equivalent to
 * `array_distinct(transform(shingles(text, n), s => xxhash64(s)))` but
 * without per-element interpreted-lambda dispatch and intermediate
 * UTF8String shingle allocation — the hot stage of MinHash/SimHash dedup
 * (measured ~14µs/shingle interpreted vs ~0.1µs here).
 *
 * Tokenization matches [[TextFunctions.tokens]]: trim, lower-case,
 * whitespace-run split. Hashes use Spark's XXH64 with the same seed as the
 * built-in `xxhash64`, over the UTF-8 bytes of the space-joined shingle, so
 * values are identical to the composable formulation.
 */
case class WordShingleHashes(
    child: Expression, n: Int, distinct: Boolean = true, sorted: Boolean = false)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  // CodegenFallback is fine here: the win over the HOF chain is eliminating
  // per-element lambda dispatch and intermediate shingle strings, not the
  // single virtual call per row.

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "word_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.trim.toLowerCase(java.util.Locale.ROOT)
    val words = if (text.isEmpty) Array.empty[String] else text.split("\\s+")
    val out =
      if (words.length >= n) {
        val hashes = new Array[Long](words.length - n + 1)
        var i = 0
        while (i <= words.length - n) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j)); j += 1
          }
          hashes(i) = WordShingleHashes.hash(sb.toString); i += 1
        }
        hashes
      } else if (words.length > 0) {
        Array(WordShingleHashes.hash(words.mkString(" ")))
      } else Array(WordShingleHashes.hash(""))
    val result =
      if (!distinct) out
      else {
        // distinct, preserving first-seen order (matches array_distinct)
        val seen = new java.util.LinkedHashSet[java.lang.Long]()
        out.foreach(seen.add(_))
        val arr = new Array[Long](seen.size)
        val it = seen.iterator(); var k = 0
        while (it.hasNext) { arr(k) = it.next(); k += 1 }
        arr
      }
    if (sorted) java.util.Arrays.sort(result) // enables merge-walk set ops downstream
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(result)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleHashes {
  /** Same algorithm+seed as Spark's built-in `xxhash64` over a UTF8 string. */
  private[functions] def hash(s: String): Long = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
  }
}

/**
 * Word n-gram windows as STRINGS, in one native pass: tokenize (trim, lower,
 * whitespace split) and join each n-token sliding window — the text-output
 * sibling of [[WordShingleHashes]] for consumers that must carry the span
 * itself (e.g. repeated-window mining, whose oracle replays window TEXT in
 * another engine). Unlike the hashed variant there is no short-text
 * fallback: a document with fewer than `n` tokens yields an empty array
 * (sub-window spans are not windows). Keeps the multiset — dedup is the
 * consumer's call.
 *
 * The equivalent HOF chain (`transform(sequence(...), i -> concat_ws/slice
 * ...)`) pays per-element interpreted lambda dispatch plus repeated array
 * reads; this kernel is one virtual call per row with a tight loop inside —
 * measured 40x on the q_window_dedup workload (41s -> ~1s explode+mine at
 * sf0.1).
 */
case class WordShingles(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(n >= 1, s"window must span at least 1 token, got $n")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string argument")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
      .toString.trim.toLowerCase(java.util.Locale.ROOT)
    val words = if (text.isEmpty) Array.empty[String] else text.split("\\s+")
    val out =
      if (words.length < n) Array.empty[org.apache.spark.unsafe.types.UTF8String]
      else {
        val wins = new Array[org.apache.spark.unsafe.types.UTF8String](words.length - n + 1)
        var i = 0
        while (i <= words.length - n) {
          val sb = new java.lang.StringBuilder
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(words(i + j)); j += 1
          }
          wins(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
          i += 1
        }
        wins
      }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Bucket-count (hashing-trick) term-frequency vector from a token-hash
 * array: `counts[floorMod(h, dim)] += 1` in one pass — the embedding-free
 * featurizer that bridges text to every vector operator (cosine top-k, IVF,
 * clustering, SemDeDup) with no model in the loop. Counts are small exact
 * integers, representable exactly in float, so the double-accumulated
 * cosine arithmetic downstream replays bit-identically in an independent
 * engine (the same dictionary-registration trick the SimHash oracle uses
 * covers the token hashes). A NULL array or element yields NULL.
 */
case class HashingTfVector(child: Expression, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(dim >= 1 && dim <= 65536, s"dim must be in [1, 65536], got $dim")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "hashing_tf_vector"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val counts = new Array[Float](dim)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null
      counts(java.lang.Math.floorMod(hs.getLong(i), dim.toLong).toInt) += 1f
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(counts)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Intersection size of two SORTED distinct long arrays by a single merge walk
 * — O(n+m) with zero allocation per pair, vs `size(array_intersect(a, b))`'s
 * per-pair hash-set build. This is the pair-verification kernel of the
 * n-gram-Jaccard and MinHash dedup stages: candidates × one evaluation each,
 * so the per-pair constant dominates those queries. Inputs MUST be sorted
 * ascending and duplicate-free ([[WordShingleHashes]] with `sorted = true`);
 * unsorted input yields an undercount, not an error. NULL elements violate
 * the contract too (no defined sort position): the walk returns NULL when it
 * hits one, and never reads a null slot as garbage.
 */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _                                                 => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  // always nullable: a null ELEMENT yields NULL even when the array inputs
  // themselves are non-nullable (same pattern as FloatVectorDot above)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements(); val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $n = $x.numElements(); int $m = $y.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  if ($x.isNullAt($i) || $y.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |if (!${ev.isNull}) ${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Sign-bucket id from `planes` deterministic random hyperplanes, fused: one
 * pass over the vector per plane with PRECOMPUTED weights. Replaces the
 * zip_with/sequence/aggregate HOF chain in [[graft.operators.Similarity]] —
 * that form is CodegenFallback anyway, and re-derives every weight via three
 * chained xxhash64 calls per (plane, dim) per ROW; here the weight table is
 * computed once per executor and reused. Weights replicate the HOF
 * formulation's values EXACTLY (same Spark XXH64 chain, pmod, and [-1, 1)
 * mapping), so buckets are bit-identical to the reference form
 * ([[graft.operators.Similarity.lshBucketHof]], pinned in SimilaritySpec) —
 * including the degenerate cases: a NULL vector, a NULL element, and an empty
 * vector all null every projection in the HOF form, where
 * `when(null >= 0, bit).otherwise(0)` then yields bucket 0; this kernel
 * returns 0 for all three (and is therefore never NULL itself).
 */
case class HyperplaneLshBucket(child: Expression, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(planes >= 1 && planes <= 63, s"planes must be in [1, 63], was $planes")

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hyperplane_lsh_bucket"
  override def nullable: Boolean = false

  // HOF parity for a NULL input vector too: every projection is null there,
  // so the bucket is 0 — override eval to bypass UnaryExpression's default
  // null propagation
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else nullSafeEval(v)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  // weight table [plane][dim], grown to the widest vector seen, built once
  // per deserialized expression instance (i.e. per task). @volatile publishes
  // the fully-built table: a concurrent reader either sees null (and
  // recomputes the same deterministic values) or a complete table — never a
  // partially-visible one.
  @transient @volatile private var weights: Array[Array[Double]] = _

  private def weightsFor(dims: Int): Array[Array[Double]] = {
    val w = weights
    if (w != null && w(0).length >= dims) w
    else {
      val fresh = Array.tabulate(planes, dims)((p, i) => HyperplaneLshBucket.weight(p, i))
      weights = fresh
      fresh
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0L // HOF parity: empty vector -> every projection null -> bucket 0
    val w = weightsFor(n)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val wp = w(p)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return 0L // HOF parity: null element nulls every projection
        acc += arr.getFloat(i).toDouble * wp(i)
        i += 1
      }
      if (acc >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneLshBucket {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  private val SeedTag: org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString("graft-lsh")

  /** The full weight table — public so oracle SQL can embed the SAME
    * hyperplanes as literals (the weights are deterministic constants). */
  def weightTable(planes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(planes, dims)((p, i) => weight(p, i))

  /** Exactly `(pmod(xxhash64('graft-lsh', plane, dim), 20001) - 10000) / 10000.0`
    * as Spark's XxHash64 expression evaluates it (seed 42, left-to-right
    * chaining, int operands hashed with hashInt). */
  private[functions] def weight(plane: Int, dim: Int): Double = {
    val h1 = XXH64.hashUnsafeBytes(SeedTag.getBaseObject, SeedTag.getBaseOffset, SeedTag.numBytes(), 42L)
    val h2 = XXH64.hashInt(plane, h1)
    val h3 = XXH64.hashInt(dim, h2)
    val r = h3 % 20001L
    val pm = if (r < 0) r + 20001L else r
    (pm - 10000L) / 10000.0
  }
}

/**
 * 32-bit SimHash from a token-hash array in ONE native pass. Semantically
 * identical to the HOF reference formulation
 * ([[graft.operators.Dedup.simhashFromHashesHof]]): bit i of the result is
 * set iff the sum over all token hashes of (+1 if bit i of the hash is set,
 * else -1) is positive. That composable form evaluates 32 interpreted
 * `aggregate` lambdas per row — 32 full array walks with per-element boxing;
 * this kernel does one walk with 32 integer counters (measured ~25x on the
 * sf0.1 documents table).
 *
 * Degenerate-input parity with the HOF form (pinned in DedupSpec):
 *  - NULL array: every `aggregate` yields NULL votes, `when(null > 0, bit)
 *    .otherwise(0)` picks 0 for every bit -> result 0 (never NULL).
 *  - empty array: votes are all 0, no bit passes `> 0` -> 0.
 *  - NULL element: `when(<null comparison>).otherwise(-1)` votes -1 on every
 *    bit for that element (it does NOT poison the aggregate).
 */
abstract class SimHashFromHashesBase
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  /** Signature width in bits (32 or 64). */
  def width: Int

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  // HOF parity for a NULL input array (-> 0): bypass default null propagation
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else nullSafeEval(v)
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val w = width
    val votes = new Array[Int](w)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        // HOF parity: a null element votes -1 on every bit
        var b = 0
        while (b < w) { votes(b) -= 1; b += 1 }
      } else {
        val h = a.getLong(i)
        var b = 0
        while (b < w) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < w) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

case class SimHash32FromHashes(child: Expression) extends SimHashFromHashesBase {
  override def width: Int = 32
  override def prettyName: String = "simhash32_from_hashes"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * 64-bit SimHash: identical vote rule over all 64 bits of the token hashes.
 * The extra width matters for BLOCKING, not just collision odds: chunked
 * near-dup blocking on a 32-bit signature has only 2^8 = 256 distinct values
 * per 8-bit chunk, so each block self-join is O(N²/256) at corpus scale;
 * 16-bit chunks of a 64-bit signature give 65,536-way blocking with the same
 * 4-chunk pigeonhole recall guarantee to Hamming 3.
 */
case class SimHash64FromHashes(child: Expression) extends SimHashFromHashesBase {
  override def width: Int = 64
  override def prettyName: String = "simhash64_from_hashes"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * All `numHashes` seeded MinHash values over a 64-bit-hash array in ONE native
 * pass. Element s is semantically identical to the HOF reference
 * `array_min(transform(hashes, h => xxhash64(lit(s), h)))`
 * ([[graft.operators.Dedup.minhashFromHashes]]): Spark's XxHash64 chains
 * seed 42 -> hashInt(s) -> hashLong(h), and the per-seed head hash is
 * precomputed once here, so each element costs `numHashes` hashLong finishes
 * instead of an interpreted lambda dispatch per (element, seed).
 *
 * Degenerate-input parity (pinned in DedupSpec):
 *  - NULL array -> `numHashes` NULL elements: each per-seed HOF value is
 *    NULL (transform propagates), and the signature-building `array(...)`
 *    wraps them into a non-null array of nulls.
 *  - empty array -> `numHashes` NULL elements (array_min of empty is NULL).
 *  - NULL element: xxhash64 skips null children, so the candidate value for
 *    that element is just the seed-head hash.
 */
case class MinHashes(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(numHashes >= 1, s"numHashes must be positive, was $numHashes")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = true)
  override def prettyName: String = "min_hashes"
  override def nullable: Boolean = false

  // parity with the HOF signature form for a NULL input array: a non-null
  // array of NULL minhashes, not NULL — bypass default null propagation
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](numHashes))
    else nullSafeEval(v)
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.simpleString}")
  }

  // per-seed head hash: XXH64(seed=42) over the int literal `s`, computed
  // once per task instead of per (element, seed)
  @transient private lazy val seedHeads: Array[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    Array.tabulate(numHashes)(s => XXH64.hashInt(s, 42L))
  }

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[Any](numHashes))
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val elementNull = a.isNullAt(i)
      val h = if (elementNull) 0L else a.getLong(i)
      var s = 0
      while (s < numHashes) {
        val v = if (elementNull) seedHeads(s) else XXH64.hashLong(h, seedHeads(s))
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** L2-normalize a float vector in one pass (zero vectors pass through).
  * Any null element yields NULL — same semantics as [[FloatVectorDot]]. */
case class NormalizeVector(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "l2_normalize"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble; ss += x * x; i += 1
    }
    val norm = math.sqrt(ss)
    val out = new Array[Float](n)
    i = 0
    while (i < n) { out(i) = if (norm == 0) a.getFloat(i) else (a.getFloat(i) / norm).toFloat; i += 1 }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** Symmetric int8 quantization: scale = max|x| / 127; q_i = round(x_i/scale).
  * Returns struct(scale double, q array<tinyint>) — a 4x storage cut for
  * embedding columns at ~0.4% max error, the standard trick for keeping
  * 100 TB of vectors affordable. */
case class QuantizeVector(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.types._

  override def dataType: DataType =
    StructType(Seq(StructField("scale", DoubleType, nullable = false),
      StructField("q", ArrayType(ByteType, containsNull = false), nullable = false)))
  override def prettyName: String = "quantize_int8"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = math.abs(a.getFloat(i).toDouble); if (x > maxAbs) maxAbs = x; i += 1
    }
    val scale = if (maxAbs == 0) 1.0 else maxAbs / 127.0
    val q = new Array[Byte](n)
    i = 0
    while (i < n) { q(i) = math.round(a.getFloat(i) / scale).toByte; i += 1 }
    org.apache.spark.sql.catalyst.InternalRow(
      scale, org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(q))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object VectorExpressions {

  /** Codegen'd dot product of two `array<float>` columns, accumulated in
    * double (identical semantics to the zip_with/aggregate formulation). */
  def dotNative(a: Column, b: Column): Column =
    GraftSqlBridge.column(FloatVectorDot(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def l2normNative(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotNative(a, a))

  def cosineNative(a: Column, b: Column): Column =
    dotNative(a, b) / (l2normNative(a) * l2normNative(b))

  /** 64-bit hashes of word n-gram shingles, in one native pass.
    * `distinct=false` keeps the multiset (for SimHash-style voting);
    * `sorted=true` sorts ascending for merge-walk set ops. */
  def wordShingleHashes(
      text: Column, n: Int, distinct: Boolean = true, sorted: Boolean = false): Column =
    GraftSqlBridge.column(WordShingleHashes(GraftSqlBridge.expression(text), n, distinct, sorted))

  /** Word n-gram windows as strings, in one native pass (empty array for
    * docs shorter than `n` — no whole-text fallback). */
  def wordShingles(text: Column, n: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(text), n))

  /** Hashing-trick term-frequency vector of a text column: the composed
    * [[wordShingleHashes]] token-hash pass feeding the one-pass
    * [[HashingTfVector]] bucket counter — text in, `array<float>` out,
    * ready for every Similarity operator. */
  def hashingTf(text: Column, dim: Int): Column =
    GraftSqlBridge.column(HashingTfVector(
      GraftSqlBridge.expression(wordShingleHashes(text, 1, distinct = false)), dim))

  /** 32-bit SimHash from a token-hash array, fused into one native pass. */
  def simHash32FromHashes(hashes: Column): Column =
    GraftSqlBridge.column(SimHash32FromHashes(GraftSqlBridge.expression(hashes)))

  /** 64-bit SimHash from a token-hash array, fused into one native pass.
    * Preferred over the 32-bit form for near-dup blocking: 16-bit chunks of
    * the 64-bit signature give 65,536-way blocking (vs 256-way for 8-bit
    * chunks of 32) with the same pigeonhole recall to Hamming 3. */
  def simHash64FromHashes(hashes: Column): Column =
    GraftSqlBridge.column(SimHash64FromHashes(GraftSqlBridge.expression(hashes)))

  /** All `numHashes` seeded MinHash values in one native pass. */
  def minHashes(hashes: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashes(GraftSqlBridge.expression(hashes), numHashes))

  /** Merge-walk intersection size of two sorted distinct `array<bigint>`s. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectSize(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Fused random-hyperplane LSH bucket of an `array<float>` vector. */
  def hyperplaneLshBucket(vec: Column, planes: Int): Column =
    GraftSqlBridge.column(HyperplaneLshBucket(GraftSqlBridge.expression(vec), planes))

  /** L2-normalize an `array<float>` vector. */
  def l2Normalize(a: Column): Column =
    GraftSqlBridge.column(NormalizeVector(GraftSqlBridge.expression(a)))

  /** Symmetric int8 quantization: struct(scale, q). */
  def quantizeInt8(a: Column): Column =
    GraftSqlBridge.column(QuantizeVector(GraftSqlBridge.expression(a)))

  /** Reconstruct floats from an int8-quantized struct(scale, q). */
  def dequantizeInt8(sq: Column): Column = {
    import org.apache.spark.sql.functions._
    transform(sq.getField("q"), b => (b.cast("double") * sq.getField("scale")).cast("float"))
  }
}
