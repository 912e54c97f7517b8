package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class SimilaritySpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),  // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(0.0f, 0.98f, 0.2f)), // close to 2
    (4L, Array(-1.0f, 0.0f, 0.0f))  // opposite of 0
  ).toDF("vec_id", "embedding")

  "dot/cosine" should "match hand-computed values" in {
    val c = vecs.filter($"vec_id" === 0).crossJoin(
      vecs.filter($"vec_id" === 1).select($"embedding".as("e2")))
      .select(Similarity.cosine($"embedding", $"e2").as("c")).head().getDouble(0)
    val expected = 0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1)
    c shouldBe expected +- 1e-6
  }

  "bruteForceTopK" should "rank nearest neighbors correctly" in {
    val top = Similarity.bruteForceTopK(vecs.filter($"vec_id" === 0), vecs, k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    top shouldBe Array(1L, 2L) // closest first; 4 (opposite) never in top
  }

  it should "exclude self matches and respect k" in {
    val out = Similarity.bruteForceTopK(vecs, vecs, k = 2).collect()
    out.length shouldBe vecs.count() * 2
    out.foreach(r => r.getAs[Long]("query_id") should not be r.getAs[Long]("neighbor_id"))
  }

  "lshBucket (native)" should "be bit-identical to the HOF reference formulation" in {
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val mismatches = emb.select(
        Similarity.lshBucket(col("embedding"), 6).as("native"),
        Similarity.lshBucketHof(col("embedding"), 6).as("hof"))
      .filter(col("native") =!= col("hof"))
    mismatches.count() shouldBe 0
  }

  it should "match the HOF reference on degenerate vectors (null element, empty)" in {
    import org.apache.spark.sql.functions.col
    val degenerate = spark.sql(
      """SELECT CAST(array(1.0F, NULL, 3.0F) AS array<float>) AS embedding
        |UNION ALL
        |SELECT CAST(array() AS array<float>) AS embedding
        |UNION ALL
        |SELECT CAST(NULL AS array<float>) AS embedding""".stripMargin)
    val rows = degenerate.select(
      Similarity.lshBucket(col("embedding"), 4).as("native"),
      Similarity.lshBucketHof(col("embedding"), 4).as("hof")).collect()
    rows.foreach { r =>
      withClue(r.toString) {
        r.isNullAt(0) shouldBe r.isNullAt(1)
        if (!r.isNullAt(0)) r.getLong(0) shouldBe r.getLong(1)
      }
    }
  }

  "lshTopK" should "retrieve high-cosine neighbors with decent recall on real data" in {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 16)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(queries, emb, k = 5, planes = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // these embeddings are near-random (max pairwise cosine ~0.48), the
    // hardest case for sign-LSH; multi-probe at 4 planes still has to beat
    // plain chance clearly. Real clustered data does far better.
    assert(recall > 0.25, s"LSH recall unexpectedly low: $recall")
  }

  "ivfTopK" should "achieve solid recall vs brute force on real data" in {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter(col("vec_id") < 16)
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, emb, k = 5, nlist = 8, nprobe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall > 0.3, s"IVF recall unexpectedly low: $recall")
  }

  it should "always find exact duplicates (same cell, nprobe >= 1)" in {
    val planted = (0 until 64).map(i => (i.toLong, Array.tabulate(8)(d => (i % 7 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val dup = Seq((999L, Array.tabulate(8)(d => (3 + d).toFloat))).toDF("vec_id", "embedding")
    val top = Similarity.ivfTopK(dup, planted.union(dup), k = 3, nlist = 4, nprobe = 1)
      .filter(col("rank") === 1).select("neighbor_id").as[Long].head()
    // rank-1 neighbor must be one of the identical vectors (i % 7 == 3)
    (top % 7) shouldBe 3
  }

  "clusterAssign" should "label every vector with its nearest cell, matching ivf assignment" in {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = Similarity.learnCentroids(emb, nlist = 8)
    val assigned = Similarity.clusterAssign(emb, nlist = 8,
      precomputedCentroids = Some(centroids))
    assigned.count() shouldBe emb.count() // total: every vector exactly once
    assigned.select("cell").distinct().count() should be <= 8L
    // cosines are genuine: each equals cosine(vec, centroid[cell]) recomputed
    val cents = centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq.toDF("cell", "centroid")
    val recomputed = assigned.join(cents, "cell")
      .join(emb, "vec_id")
      .withColumn("expect", Similarity.cosine(col("embedding"), col("centroid")))
      .filter(col("cos") =!= col("expect"))
    recomputed.count() shouldBe 0
  }

  it should "put planted tight clusters into distinct cells" in {
    // two orthogonal bundles of near-identical vectors
    val planted = (0 until 16).map { i =>
      val base = if (i < 8) Array.tabulate(8)(d => if (d == 0) 1.0f else 0.01f * i)
                 else Array.tabulate(8)(d => if (d == 7) 1.0f else 0.01f * i)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val out = Similarity.clusterAssign(planted, nlist = 2)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val cellsA = (0L until 8L).map(out).toSet
    val cellsB = (8L until 16L).map(out).toSet
    cellsA.size shouldBe 1
    cellsB.size shouldBe 1
    cellsA should not be cellsB
  }

  "semanticNearDupPairs" should "find planted dups within cells and never cross cells" in {
    // two orthogonal bundles; dups planted inside each bundle
    val planted = (0 until 12).map { i =>
      val bundle = i / 6
      val jitter = 0.001f * (i % 6)
      val base = Array.tabulate(8)(d =>
        if (d == bundle * 7) 1.0f else jitter)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val pairs = Similarity.semanticNearDupPairs(planted, threshold = 0.99, nlist = 2)
      .select("id1", "id2", "cell").as[(Long, Long, Int)].collect()
    pairs.nonEmpty shouldBe true
    // all mined pairs stay within a bundle (cells separate the bundles)
    pairs.foreach { case (a, b, _) => (a / 6) shouldBe (b / 6) }
    // ordering contract
    pairs.foreach { case (a, b, _) => a should be < b }
  }

  it should "agree with clusterAssign blocking + exact cosine on real data" in {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val centroids = Similarity.learnCentroids(emb, nlist = 8)
    val pairs = Similarity.semanticNearDupPairs(emb, threshold = 0.3, nlist = 8,
      precomputedCentroids = Some(centroids))
    // reference: assign via clusterAssign, then plain within-cell pair join
    val assigned = Similarity.clusterAssign(emb, nlist = 8,
      precomputedCentroids = Some(centroids))
      .join(emb, "vec_id").select($"vec_id", $"cell", $"embedding")
    val expect = assigned.as("a").join(assigned.as("b"),
        $"a.cell" === $"b.cell" && $"a.vec_id" < $"b.vec_id")
      .withColumn("cosine", Similarity.cosine($"a.embedding", $"b.embedding"))
      .filter($"cosine" >= 0.3)
      .select($"a.vec_id".as("id1"), $"b.vec_id".as("id2"), $"a.cell".as("cell"), $"cosine")
    pairs.exceptAll(expect).count() shouldBe 0
    expect.exceptAll(pairs).count() shouldBe 0
  }

  "embeddingNearDupPairs" should "find planted near-duplicates" in {
    val planted = Seq(
      (100L, Array.fill(8)(0.5f)),
      (101L, Array.fill(8)(0.5f)),                       // identical -> cosine 1
      (102L, Array.tabulate(8)(i => if (i == 0) 0.52f else 0.5f)), // near-identical
      (103L, Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)) // unrelated
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(planted, threshold = 0.99, planes = 4)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    pairs should contain((100L, 101L))
    pairs should contain((100L, 102L))
    pairs should contain((101L, 102L))
    pairs.exists { case (a, b) => a == 103L || b == 103L } shouldBe false
  }
}
