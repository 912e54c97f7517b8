package graft.functions

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * SQL-surface registration of graft's native Catalyst expressions, so the
 * vector/text kernels are first-class in `spark.sql(...)` text, not just the
 * Column API:
 *
 * {{{
 *   SELECT float_vector_dot(a.embedding, b.embedding)   -- codegen'd dot
 *   SELECT l2_normalize(embedding)
 *   SELECT quantize_int8(embedding)                     -- struct(scale, int8[])
 *   SELECT word_shingle_hashes(text, 3)                 -- fused shingle+hash
 * }}}
 *
 * Two ways in:
 *  - at session build time: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
 *    (the standard `SparkSessionExtensions` hook), or
 *  - on a live session: `GraftExtensions.register(spark)`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // SQL-native versioned-table access incl. VERSION/TIMESTAMP AS OF
    // (graft.sql.GraftTableRegistry) — resolution rules can only be added
    // at session BUILD time, so this half has no live-session `register`
    // twin: set spark.sql.extensions when SQL table access is wanted.
    ext.injectResolutionRule(session => graft.sql.ResolveGraftTables(session))
    // optimizer-time metadata aggregation + manifest data skipping for
    // stats-declaring tables, both pre-CBO (after predicate pushdown,
    // before join sizing). ORDER MATTERS: the aggregate rewrite must see
    // the ORIGINAL recorded relation — the skipping rule swaps in a pruned
    // FileIndex copy that is deliberately NOT in the registry (that is its
    // own recursion guard), so it runs second.
    ext.injectPreCBORule(session => graft.sql.GraftMetadataAggregate(session))
    ext.injectPreCBORule(session => graft.sql.GraftDataSkipping(session))
    // maintenance verbs (DESCRIBE HISTORY / OPTIMIZE [ZORDER BY] / VACUUM
    // RETAIN) — a delegating parser, the Delta DeltaSqlParser pattern:
    // only whole statements targeting graft.*.* are intercepted
    ext.injectParser((_, delegate) => new graft.sql.GraftSqlParser(delegate))
  }
}

object GraftExtensions {

  private type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n, s"$name expects $n arguments, got ${args.length}")

  private def litInt(name: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal integer, got $other")
  }

  /** (name, info, builder) for every exposed function. */
  val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("float_vector_dot",
      info("float_vector_dot", "_FUNC_(a, b) - dot product of two float arrays, accumulated in double"),
      args => { arity("float_vector_dot", 2, args); FloatVectorDot(args(0), args(1)) }),
    ("l2_normalize",
      info("l2_normalize", "_FUNC_(v) - L2-normalize a float array (zero vectors pass through)"),
      args => { arity("l2_normalize", 1, args); NormalizeVector(args.head) }),
    ("quantize_int8",
      info("quantize_int8", "_FUNC_(v) - symmetric int8 quantization: struct(scale double, q tinyint[])"),
      args => { arity("quantize_int8", 1, args); QuantizeVector(args.head) }),
    ("word_shingle_hashes",
      info("word_shingle_hashes",
        "_FUNC_(text, n) - distinct sorted xxhash64 values of the text's word n-gram shingles"),
      args => {
        arity("word_shingle_hashes", 2, args)
        // sorted in the SQL surface: composes directly with sorted_intersect_size
        WordShingleHashes(args.head, litInt("word_shingle_hashes n", args(1)), sorted = true)
      }),
    ("word_shingles",
      info("word_shingles",
        "_FUNC_(text, n) - the text's word n-gram windows as strings (empty for docs shorter than n)"),
      args => {
        arity("word_shingles", 2, args)
        WordShingles(args.head, litInt("word_shingles n", args(1)))
      }),
    ("sorted_intersect_size",
      info("sorted_intersect_size",
        "_FUNC_(a, b) - intersection size of two sorted distinct bigint arrays (merge walk)"),
      args => { arity("sorted_intersect_size", 2, args); SortedIntersectSize(args(0), args(1)) }),
    ("text_stats",
      info("text_stats",
        "_FUNC_(text) - single-pass struct(n_tokens, sw_en, sw_es, sw_de, sw_fr, n_punct, n_nonspace, n_chars)"),
      args => { arity("text_stats", 1, args); TextStats(args.head) }),
    ("simhash32",
      info("simhash32",
        "_FUNC_(hashes) - 32-bit SimHash from a token-hash array (one pass, +1/-1 bit votes)"),
      args => { arity("simhash32", 1, args); SimHash32FromHashes(args.head) }),
    ("simhash64",
      info("simhash64",
        "_FUNC_(hashes) - 64-bit SimHash from a token-hash array (one pass, +1/-1 bit votes)"),
      args => { arity("simhash64", 1, args); SimHash64FromHashes(args.head) }),
    ("min_hashes",
      info("min_hashes",
        "_FUNC_(hashes, k) - k seeded MinHash values over a bigint-hash array, one pass"),
      args => {
        arity("min_hashes", 2, args)
        MinHashes(args.head, litInt("min_hashes k", args(1)))
      }),
    ("hyperplane_lsh_bucket",
      info("hyperplane_lsh_bucket",
        "_FUNC_(vec, planes) - sign-bucket id of a float vector under deterministic random hyperplanes"),
      args => {
        arity("hyperplane_lsh_bucket", 2, args)
        HyperplaneLshBucket(args.head, litInt("hyperplane_lsh_bucket planes", args(1)))
      }),
    ("hashing_tf_vector",
      info("hashing_tf_vector",
        "_FUNC_(hashes, dim) - hashing-trick TF float vector: counts[floorMod(h, dim)] += 1"),
      args => {
        arity("hashing_tf_vector", 2, args)
        HashingTfVector(args.head, litInt("hashing_tf_vector dim", args(1)))
      }))

  /** Register on a live session (idempotent: re-registration replaces). */
  def register(spark: SparkSession): Unit = {
    val registry = GraftSqlBridge.functionRegistry(spark)
    functions.foreach { case (name, inf, builder) =>
      registry.registerFunction(FunctionIdentifier(name), inf, builder)
    }
  }
}
