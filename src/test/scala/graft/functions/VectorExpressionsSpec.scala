package graft.functions

import graft.TestSpark
import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class VectorExpressionsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  "FloatVectorDot" should "agree with the HOF formulation on real embeddings" in {
    // not bit-for-bit: the HOF form multiplies in float then widens, the
    // native expression multiplies in double (strictly more accurate) — so
    // compare within float-product rounding tolerance
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = emb.select($"vec_id".as("id1"), $"embedding".as("e1"))
      .crossJoin(emb.select($"vec_id".as("id2"), $"embedding".as("e2")))
      .filter($"id2" === $"id1" + 1)
    val diffs = pairs.select(
      VectorExpressions.dotNative($"e1", $"e2").as("native"),
      Similarity.dotHof($"e1", $"e2").as("hof"))
      .filter(abs($"native" - $"hof") > greatest(abs($"native"), abs($"hof"), lit(1.0)) * 1e-5)
    diffs.count() shouldBe 0
  }

  it should "handle hand-computed values, nulls and empty arrays" in {
    val df = Seq(
      (Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(4.0f, 5.0f, 6.0f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float])),
      (None, Some(Array(1.0f)))
    ).toDF("a", "b")
    val got = df.select(VectorExpressions.dotNative($"a", $"b")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    got shouldBe Array(Some(32.0), Some(0.0), None)
  }

  it should "return NULL for mismatched lengths, matching the HOF semantics" in {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    df.select(VectorExpressions.dotNative($"a", $"b")).head().isNullAt(0) shouldBe true
    df.select(Similarity.dotHof($"a", $"b")).head().isNullAt(0) shouldBe true
  }

  "WordShingleHashes" should "produce exactly the HOF formulation's hash values" in {
    import graft.functions.TextFunctions.shingles
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val diffs = docs.select(
      VectorExpressions.wordShingleHashes($"text", 3).as("native"),
      array_distinct(transform(shingles($"text", 3), s => xxhash64(s))).as("hof"))
      .filter($"native" =!= $"hof")
    diffs.count() shouldBe 0
  }

  "WordShingles" should "produce exactly the HOF formulation's window strings" in {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val n = 8
    val elems = (0 until n).map(k => s"_toks[i + $k - 1]").mkString(", ")
    val diffs = docs
      .withColumn("_toks", graft.functions.TextFunctions.tokens($"text"))
      .select(
        VectorExpressions.wordShingles($"text", n).as("native"),
        expr(s"""CASE WHEN size(_toks) < $n THEN array()
                 ELSE transform(sequence(1, size(_toks) - ${n - 1}),
                                i -> concat_ws(' ', $elems)) END""").as("hof"))
      .filter($"native" =!= $"hof")
    diffs.count() shouldBe 0
  }

  it should "yield an empty array below n tokens and normalize like tokens()" in {
    Seq("a b c").toDF("t").select(VectorExpressions.wordShingles($"t", 4).as("w"))
      .head().getAs[scala.collection.Seq[String]]("w") shouldBe empty
    Seq("  The QUICK  brown ").toDF("t")
      .select(VectorExpressions.wordShingles($"t", 2).as("w"))
      .head().getAs[scala.collection.Seq[String]]("w") shouldBe Seq("the quick", "quick brown")
    // multiset preserved: repeated windows stay repeated
    Seq("x y x y x y").toDF("t")
      .select(VectorExpressions.wordShingles($"t", 4).as("w"))
      .head().getAs[scala.collection.Seq[String]]("w") shouldBe
      Seq("x y x y", "y x y x", "x y x y")
  }

  it should "hash the token multiset when distinct=false" in {
    val got = Seq("a b a").toDF("t")
      .select(VectorExpressions.wordShingleHashes($"t", 1, distinct = false).as("h"))
      .head().getAs[scala.collection.Seq[Long]]("h")
    got should have size 3
    got(0) shouldBe got(2) // repeated token, repeated hash
    // and tokenization normalizes like tokens(): trim + lower + \s+ split
    val norm = Seq("  A  b a ").toDF("t")
      .select(VectorExpressions.wordShingleHashes($"t", 1, distinct = false).as("h"))
      .head().getAs[scala.collection.Seq[Long]]("h")
    norm shouldBe got
  }

  it should "emit ascending hashes when sorted=true, same set as unsorted" in {
    val df = Seq("the quick brown fox the quick").toDF("t")
    val unsorted = df.select(VectorExpressions.wordShingleHashes($"t", 2).as("h"))
      .head().getAs[scala.collection.Seq[Long]]("h")
    val sorted = df.select(VectorExpressions.wordShingleHashes($"t", 2, sorted = true).as("h"))
      .head().getAs[scala.collection.Seq[Long]]("h")
    sorted.toList shouldBe unsorted.toList.sorted
    sorted.toSet shouldBe unsorted.toSet
  }

  "sortedIntersectSize" should "count common elements of sorted distinct arrays" in {
    val df = Seq(
      (Array(1L, 3L, 5L, 9L), Array(2L, 3L, 5L, 10L), 2),  // {3,5}
      (Array(1L, 2L), Array(3L, 4L), 0),
      (Array[Long](), Array(1L), 0),
      (Array(7L, 8L, 9L), Array(7L, 8L, 9L), 3)
    ).toDF("a", "b", "expected")
    df.select(VectorExpressions.sortedIntersectSize($"a", $"b").as("got"), $"expected")
      .collect().foreach(r => r.getInt(0) shouldBe r.getInt(1))
    // agrees with array_intersect on real shingle data
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
      .select(VectorExpressions.wordShingleHashes($"text", 1, sorted = true).as("w"))
    val pairs = docs.as("x").crossJoin(docs.as("y"))
      .select(
        VectorExpressions.sortedIntersectSize($"x.w", $"y.w").as("merge"),
        org.apache.spark.sql.functions.size(array_intersect($"x.w", $"y.w")).as("hash"))
      .filter($"merge" =!= $"hash")
    pairs.count() shouldBe 0
  }

  "l2Normalize" should "produce unit vectors and pass zero vectors through" in {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val norms = emb.select(
      VectorExpressions.dotNative(
        VectorExpressions.l2Normalize($"embedding"),
        VectorExpressions.l2Normalize($"embedding")).as("nn"))
      .filter(abs($"nn" - 1.0) > 1e-4)
    norms.count() shouldBe 0
    val zero = Seq(Array(0.0f, 0.0f)).toDF("v")
      .select(VectorExpressions.l2Normalize($"v")).head().getAs[scala.collection.Seq[Float]](0)
    zero shouldBe Seq(0.0f, 0.0f)
  }

  "quantizeInt8/dequantizeInt8" should "round-trip within the quantization error bound" in {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val err = emb.select(
      $"embedding",
      VectorExpressions.dequantizeInt8(VectorExpressions.quantizeInt8($"embedding")).as("dq"),
      VectorExpressions.quantizeInt8($"embedding").getField("scale").as("scale"))
      .select(aggregate(
        zip_with($"embedding", $"dq", (a, b) => abs(a - b)),
        lit(0.0d), (acc, x) => greatest(acc, x)).as("max_err"), $"scale")
      .filter($"max_err" > $"scale" * 0.5 + 1e-6)
    err.count() shouldBe 0
  }

  it should "run inside whole-stage codegen" in {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = emb.select(VectorExpressions.dotNative($"embedding", $"embedding"))
      .queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators inside a WholeStageCodegen stage
    plan should include("*(1) Project [float_vector_dot")
  }

  "shingle kernels" should "lowercase locale-independently (Turkish-I safe)" in {
    // under a Turkish default locale, String.toLowerCase maps I -> ı (dotless)
    // while Spark's lower() and the DuckDB oracle use locale-independent
    // mappings; the kernels pin Locale.ROOT so cross-engine hashes stay
    // bit-exact regardless of the JVM's default locale
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.forLanguageTag("tr-TR"))
      val df = Seq(Tuple1("III RIVER")).toDF("t")
      val kernel = df.select(
        VectorExpressions.wordShingleHashes($"t", 1, sorted = true).as("h"),
        VectorExpressions.wordShingles($"t", 1).as("s")).head()
      kernel.getSeq[String](1) shouldBe Seq("iii", "river")
      val viaRoot = Seq("III RIVER".toLowerCase(java.util.Locale.ROOT).split(" "): _*)
      kernel.getSeq[String](1) shouldBe viaRoot.map(_.trim)
    } finally java.util.Locale.setDefault(saved)
  }

  "HashingTfVector" should "count token hashes into floorMod buckets, matching a driver-side model" in {
    val dim = 16
    val docs = Seq("the cat sat on the mat", "one two three", "x").toDF("t")
    val rows = docs.select(
      VectorExpressions.wordShingleHashes($"t", 1, distinct = false).as("hs"),
      VectorExpressions.hashingTf($"t", dim).as("v")).collect()
    rows.foreach { r =>
      val hs = r.getSeq[Long](0)
      val v = r.getSeq[Float](1)
      v.length shouldBe dim
      val model = hs.groupBy(h => java.lang.Math.floorMod(h, dim.toLong).toInt)
        .view.mapValues(_.size.toFloat).toMap
      v.zipWithIndex.foreach { case (c, b) => c shouldBe model.getOrElse(b, 0f) }
      v.map(_.toDouble).sum shouldBe hs.size.toDouble // counts conserve tokens
    }
    // repeated tokens accumulate: "the" appears twice in doc 0
    rows(0).getSeq[Float](1).max should be >= 2f
  }

  it should "make text a citizen of the vector operators (self-similarity = 1)" in {
    val vecs = Seq((0L, "alpha beta gamma"), (1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("vec_id", "t")
      .select($"vec_id", VectorExpressions.hashingTf($"t", 32).as("embedding"))
    val top = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, k = 2)
      .select("neighbor_id", "cosine").as[(Long, Double)].collect().toMap
    top(1L) shouldBe 1.0 +- 1e-12 // identical text -> identical vector
    top(2L) should be < 0.999
  }
}
