package graft.functions

import graft.TestSpark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class GraftExtensionsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = {
    val s = TestSpark.spark
    GraftExtensions.register(s)
    s
  }

  behavior of "SQL-registered graft functions"

  it should "evaluate float_vector_dot in SQL text identically to the Column API" in {
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val sqlV = spark.sql("SELECT float_vector_dot(a, b) AS d FROM vecs").head().getDouble(0)
    val colV = df.select(VectorExpressions.dotNative($"a", $"b").as("d")).head().getDouble(0)
    sqlV shouldBe 32.0
    colV shouldBe sqlV
  }

  it should "evaluate l2_normalize and quantize_int8 in SQL" in {
    import spark.implicits._
    Seq(Tuple1(Array(3.0f, 4.0f))).toDF("v").createOrReplaceTempView("one_vec")
    val n = spark.sql("SELECT l2_normalize(v) AS nv FROM one_vec")
      .head().getSeq[Float](0)
    n shouldBe Seq(0.6f, 0.8f)
    val q = spark.sql("SELECT quantize_int8(v).scale AS s, quantize_int8(v).q AS q FROM one_vec").head()
    q.getDouble(0) shouldBe 4.0 / 127 +- 1e-6
    q.getSeq[Byte](1).last shouldBe 127.toByte
  }

  it should "evaluate word_shingle_hashes with the same values as the Column API" in {
    import spark.implicits._
    val df = Seq(Tuple1("the quick brown fox jumps")).toDF("t")
    df.createOrReplaceTempView("one_doc")
    val sqlV = spark.sql("SELECT word_shingle_hashes(t, 3) AS h FROM one_doc")
      .head().getSeq[Long](0)
    val colV = df.select(VectorExpressions.wordShingleHashes($"t", 3, sorted = true).as("h"))
      .head().getSeq[Long](0)
    sqlV shouldBe colV
    sqlV.length shouldBe 3
  }

  it should "compose word_shingle_hashes with sorted_intersect_size for SQL jaccard" in {
    import spark.implicits._
    Seq(("a b c d", "b c d e")).toDF("t1", "t2").createOrReplaceTempView("doc_pair")
    val inter = spark.sql(
      """SELECT sorted_intersect_size(
        |  word_shingle_hashes(t1, 1), word_shingle_hashes(t2, 1)) AS i
        |FROM doc_pair""".stripMargin).head().getInt(0)
    inter shouldBe 3 // {b, c, d}
  }

  it should "evaluate text_stats in SQL" in {
    // s.* expands the struct into top-level int columns
    val r = spark.sql(
      "SELECT s.* FROM (SELECT text_stats('the quick fox. el fin.') AS s)").head()
    r.getInt(0) shouldBe 5  // n_tokens
    r.getInt(1) shouldBe 1  // sw_en: 'the'
    r.getInt(2) shouldBe 1  // sw_es: 'el'
    r.getInt(5) shouldBe 2  // n_punct: two periods
  }

  it should "evaluate simhash32, min_hashes, and hyperplane_lsh_bucket in SQL" in {
    import spark.implicits._
    val df = Seq(Tuple1("the quick brown fox")).toDF("t")
    df.createOrReplaceTempView("sql_kernels_doc")
    val sh = spark.sql(
      "SELECT simhash32(word_shingle_hashes(t, 1)) AS sh FROM sql_kernels_doc").head().getLong(0)
    val shCol = df.select(
      VectorExpressions.simHash32FromHashes(
        VectorExpressions.wordShingleHashes($"t", 1, sorted = true)).as("sh")).head().getLong(0)
    sh shouldBe shCol
    val sh64 = spark.sql(
      "SELECT simhash64(word_shingle_hashes(t, 1)) AS sh FROM sql_kernels_doc").head().getLong(0)
    val sh64Col = df.select(
      VectorExpressions.simHash64FromHashes(
        VectorExpressions.wordShingleHashes($"t", 1, sorted = true)).as("sh")).head().getLong(0)
    sh64 shouldBe sh64Col
    val mh = spark.sql(
      "SELECT min_hashes(word_shingle_hashes(t, 1), 4) AS mh FROM sql_kernels_doc")
      .head().getSeq[Long](0)
    mh should have length 4
    Seq(Tuple1(Array(1.0f, -2.0f, 0.5f))).toDF("v").createOrReplaceTempView("sql_lsh_vec")
    val b = spark.sql("SELECT hyperplane_lsh_bucket(v, 8) AS b FROM sql_lsh_vec").head().getLong(0)
    val bCol = Seq(Tuple1(Array(1.0f, -2.0f, 0.5f))).toDF("v")
      .select(VectorExpressions.hyperplaneLshBucket($"v", 8).as("b")).head().getLong(0)
    b shouldBe bCol
  }

  it should "evaluate hashing_tf_vector in SQL, matching the column form" in {
    import spark.implicits._
    val df = Seq(Tuple1("the quick brown fox the end")).toDF("t")
    df.createOrReplaceTempView("sql_htf_doc")
    val viaSql = spark.sql(
      "SELECT hashing_tf_vector(word_shingle_hashes(t, 1), 16) AS v FROM sql_htf_doc")
      .head().getSeq[Float](0)
    // the SQL surface's word_shingle_hashes is sorted+distinct, so compose
    // the column form identically for the parity check
    val viaCol = df.select(
      VectorExpressions.hashingTf($"t", 16).as("v")).head().getSeq[Float](0)
    viaSql should have length 16
    // distinct (SQL) vs multiset (column helper): the helper counts 'the'
    // twice, the SQL-composed form once — totals differ by the duplicate
    viaSql.map(_.toDouble).sum shouldBe 5.0 // 5 distinct tokens
    viaCol.map(_.toDouble).sum shouldBe 6.0 // 6 token occurrences
  }

  it should "reject wrong arity and non-literal shingle size at analysis time" in {
    spark.sql("SELECT 1").collect() // force session init
    an[Exception] should be thrownBy
      spark.sql("SELECT float_vector_dot(array(1.0f))").collect()
    an[Exception] should be thrownBy
      spark.sql("SELECT word_shingle_hashes('a b c', cast(rand()*3 as int))").collect()
  }

  it should "register via the SparkSessionExtensions hook too" in {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // exercises injectFunction wiring
  }
}
