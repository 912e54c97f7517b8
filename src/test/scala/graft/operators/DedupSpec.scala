package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions.{size => asize, _}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class DedupSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  val base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
  // 0,1 exact dups; 2 near-dup of 0 (one word changed); 3 unrelated; 4 near-dup of 3
  val docs = Seq(
    (0L, base),
    (1L, base),
    (2L, base.replace("lazy", "sleepy")),
    (3L, "completely different content about spark catalyst optimizer rules and physical plans here"),
    (4L, "completely different content about spark catalyst optimizer rules and logical plans here"),
    (5L, "nothing in common with anything else whatsoever just random words galore banana")
  ).toDF("doc_id", "text")

  "exactDedup" should "keep the lowest id per identical text" in {
    val kept = Dedup.exactDedup(docs).select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(0L, 2L, 3L, 4L, 5L)
  }

  "exactDupGroups" should "report only groups with >1 doc" in {
    val g = Dedup.exactDupGroups(docs).collect()
    g should have length 1
    g.head.getAs[Long]("n_docs") shouldBe 2
    g.head.getAs[Long]("keep_id") shouldBe 0
  }

  "minhashNearDupPairs" should "find exact and near dups, not unrelated pairs" in {
    val pairs = Dedup.minhashNearDupPairs(docs, threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    pairs should contain((0L, 1L)) // identical
    pairs should contain((0L, 2L)) // one word changed
    pairs should contain((1L, 2L))
    pairs should contain((3L, 4L)) // one word changed
    // unrelated docs never pair
    pairs.exists { case (a, b) => a == 5L || b == 5L } shouldBe false
    pairs.exists { case (a, b) => (Set(a, b) & Set(0L, 1L, 2L)).nonEmpty && (Set(a, b) & Set(3L, 4L)).nonEmpty } shouldBe false
  }

  it should "achieve high recall against exact shingle-jaccard ground truth on real data" in {
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    // ground truth: exact quadratic shingle-jaccard (same metric the verify stage uses)
    val sets = real.select(col("doc_id").as("id"),
      array_distinct(graft.functions.TextFunctions.shingles(col("text"), 3)).as("sh"))
    val truth = sets.as("a").join(sets.as("b"), col("a.id") < col("b.id"))
      .withColumn("j", asize(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
        asize(array_union(col("a.sh"), col("b.sh"))))
      .filter(col("j") >= 0.8)
      .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    val found = Dedup.minhashNearDupPairs(real, threshold = 0.8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // verify stage guarantees precision == 1.0
    found.subsetOf(truth) shouldBe true
    // banded LSH (b=8,r=2) recall at s>=0.8 should be ~0.999
    assert(found.size >= (truth.size * 0.9).toInt,
      s"recall too low: ${found.size}/${truth.size}")
  }

  "crossNearDupPairs" should "find only cross-side pairs, for planted corpus dups" in {
    val corpus = docs // ids 0-5
    val batch = Seq(
      (10L, base),                        // exact dup of corpus 0/1
      (11L, base.replace("dog", "cat")),  // near-dup of corpus 0
      (12L, "entirely novel text that matches nothing in the existing lake at all today")
    ).toDF("doc_id", "text")
    val pairs = Dedup.crossNearDupPairs(batch, corpus, threshold = 0.5)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    pairs should contain((10L, 0L))
    pairs should contain((10L, 1L))
    pairs should contain((11L, 0L))
    // left ids always from the batch side, and the novel doc never pairs
    pairs.foreach { case (l, r) => l should be >= 10L; r should be < 10L }
    pairs.exists(_._1 == 12L) shouldBe false
  }

  it should "equal the self-join miner's cross subset on real data" in {
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val cut = 250
    val cross = Dedup.crossNearDupPairs(
      real.filter(col("doc_id") >= cut), real.filter(col("doc_id") < cut), threshold = 0.8)
      .select("left_id", "right_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    // the same pairs the full self-join miner finds straddling the cut
    // (id1 < id2, so the new-side id is always id2)
    val full = Dedup.minhashNearDupPairs(real, threshold = 0.8)
      .filter(col("id2") >= cut && col("id1") < cut)
      .select(col("id2"), col("id1"), col("jaccard")).as[(Long, Long, Double)].collect().toSet
    cross shouldBe full
    cross should not be empty
  }

  "dedupAgainstCorpus" should "drop corpus dups, keep one canonical per in-batch cluster" in {
    val corpus = docs
    val batch = Seq(
      (10L, base),                                  // dup of the corpus -> dropped
      (12L, "entirely novel text that matches nothing in the existing lake at all today"),
      (13L, "entirely novel text that matches nothing in the existing lake at all tonight"), // near-dup of 12
      (14L, "some other fresh content never seen before anywhere in any delivery batch")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainstCorpus(batch, corpus, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(12L, 14L) // 10 rejected vs corpus; 13 loses to canonical 12
  }

  "simhashNearDupPairs" should "pair near-identical docs and skip unrelated ones" in {
    val pairs = Dedup.simhashNearDupPairs(docs, maxHamming = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    pairs should contain((0L, 1L)) // identical -> hamming 0
    pairs.exists { case (a, b) => a == 5L || b == 5L } shouldBe false
  }

  it should "find EVERY pair within Hamming distance 3 (4-chunk pigeonhole guarantee)" in {
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    // ground truth: collect 64-bit simhashes, full pairwise popcount driver-side
    val hashes = real.select(col("doc_id"), Dedup.simhash64(col("text")))
      .as[(Long, Long)].collect()
    val truth = (for {
      (i, hi) <- hashes; (j, hj) <- hashes if i < j
      if java.lang.Long.bitCount(hi ^ hj) <= 3
    } yield (i, j)).toSet
    val found = Dedup.simhashNearDupPairs(real, maxHamming = 3)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    found shouldBe truth
  }

  "dupClusters" should "label every node with its component's min id and size" in {
    // components: {1,2,3,4} (chain 1-2, 2-3, 3-4), {10,11}, {20,21,22} (star)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (20L, 22L)
    ).toDF("id1", "id2")
    val got = Dedup.dupClusters(pairs)
      .as[(Long, Long, Long)].collect().sorted
    got shouldBe Array(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (10L, 10L, 2L), (11L, 10L, 2L),
      (20L, 20L, 3L), (21L, 20L, 3L), (22L, 20L, 3L)).sorted
  }

  it should "produce identical clusters under reliable (fault-tolerant) checkpointing" in {
    // the cluster-run mode: every round a reliable checkpoint() instead of
    // executor-pinned localCheckpoint blocks — results must be identical
    // (convergence laws re-run under it), and it must refuse loudly without
    // a checkpoint directory rather than fail mid-iteration
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L), (20L, 22L))
      .toDF("id1", "id2")
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("id1", "id2")
    val hadDir = spark.sparkContext.getCheckpointDir
    if (hadDir.isEmpty) {
      val e = intercept[IllegalArgumentException] {
        Dedup.dupClusters(pairs, reliable = true).collect()
      }
      e.getMessage should include("setCheckpointDir")
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dedup-ckpt-")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    try {
      Dedup.dupClusters(pairs, reliable = true)
        .as[(Long, Long, Long)].collect().sorted shouldBe
        Dedup.dupClusters(pairs).as[(Long, Long, Long)].collect().sorted
      val got = Dedup.dupClusters(chain, reliable = true).as[(Long, Long, Long)].collect()
      got should have length 13
      got.foreach { case (_, cid, sz) => cid shouldBe 0L; sz shouldBe 13L }
    } finally hadDir match {
      case Some(d) => spark.sparkContext.setCheckpointDir(d)
      case None    => () // no API to unset; later suites are unaffected by a set dir
    }
  }

  it should "converge on a long chain (label must propagate the full diameter)" in {
    // worst case for min-label propagation: a path graph 0-1-2-...-12
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = Dedup.dupClusters(chain).as[(Long, Long, Long)].collect()
    got should have length 13
    got.foreach { case (_, cid, sz) => cid shouldBe 0L; sz shouldBe 13L }
  }

  it should "size a giant planted component without a window (skew-safe) and honor maxClusterSize" in {
    // one star component of 500 nodes around hub 0, plus a small pair
    val giant = (1L to 499L).map(i => (0L, i)).toDF("id1", "id2")
      .union(Seq((1000L, 1001L)).toDF("id1", "id2"))
    val got = Dedup.dupClusters(giant)
    // correctness: every member of the star carries the full size
    val sizes = got.select("cluster_id", "cluster_size").distinct()
      .as[(Long, Long)].collect().toMap
    sizes(0L) shouldBe 500L
    sizes(1000L) shouldBe 2L
    // plan shape: cluster_size must come from an aggregate + join, never a
    // window partitioned by the whole component (single-task hot spot at scale)
    got.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    } shouldBe empty

    // the guard trips on the giant and names it
    val ex = intercept[IllegalArgumentException] {
      Dedup.dupClusters(giant, maxClusterSize = Some(100L)).collect()
    }
    ex.getMessage should include("maxClusterSize=100")
    ex.getMessage should include("0 -> 500")
    // a cap above the largest component passes untouched
    Dedup.dupClusters(giant, maxClusterSize = Some(500L)).count() shouldBe 502L
  }

  it should "match driver-side union-find on the real near-dup pair graph" in {
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val pairs = Dedup.ngramJaccardPairs(real, threshold = 0.8, blockCol = Some("source"))
      .select("id1", "id2").localCheckpoint()
    val edges = pairs.as[(Long, Long)].collect()
    // reference: classic union-find over the collected edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap
    val got = Dedup.dupClusters(pairs)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    got shouldBe expected
  }

  "contaminationPairs" should "flag corpus docs containing a benchmark doc's shingles" in {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      // embeds the full benchmark text inside a longer doc: containment 1.0
      (1L, "some prefix words alpha beta gamma delta epsilon and a suffix"),
      // shares 1 of the 3 benchmark shingles ("beta gamma delta")
      (2L, "unrelated start beta gamma delta unrelated end"),
      // disjoint
      (3L, "completely different content with no overlap at all")
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationPairs(corpus, bench, threshold = 0.3)
      .as[(Long, Long, Double)].collect().map { case (c, b, x) => ((c, b), x) }.toMap
    got((1L, 100L)) shouldBe 1.0
    got((2L, 100L)) shouldBe (1.0 / 3.0)
    got.keySet should not contain ((3L, 100L))
  }

  "removeContaminated" should "drop exactly the flagged docs, keeping all columns" in {
    val bench = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "some prefix words alpha beta gamma delta epsilon and a suffix", "en"),
      (2L, "unrelated start beta gamma delta unrelated end", "en"),
      (3L, "completely different content with no overlap at all", "de")
    ).toDF("doc_id", "text", "lang")
    // threshold 0.5: doc 1 (containment 1.0) is cut, doc 2 (1/3) survives
    val kept = Dedup.removeContaminated(corpus, bench, threshold = 0.5)
      .select("doc_id", "lang").as[(Long, String)].collect().sorted
    kept shouldBe Array((2L, "en"), (3L, "de"))
    // and the cut set is exactly the measure arm's flagged ids
    val flagged = Dedup.contaminationPairs(corpus, bench, threshold = 0.5)
      .select("corpus_id").as[Long].collect().toSet
    val survivors = Dedup.removeContaminated(corpus, bench, threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    survivors shouldBe Set(1L, 2L, 3L) -- flagged
  }

  "keepCanonical" should "keep one doc per cluster plus all unpaired docs" in {
    val corpus = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (10L, "e"), (11L, "f"), (99L, "solo")
    ).toDF("doc_id", "text")
    // clusters {1,2,3,4} and {10,11}; 99 unpaired
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id1", "id2")
    val kept = Dedup.keepCanonical(corpus, pairs).select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(1L, 10L, 99L)
  }

  "native SimHash32FromHashes" should "equal the HOF reference formulation bit-for-bit" in {
    val th = graft.functions.VectorExpressions.wordShingleHashes(col("text"), 1, distinct = false)
    val both = docs.select(
      Dedup.simhashFromHashes(th).as("native"),
      Dedup.simhashFromHashesHof(th).as("hof"))
    both.filter(col("native") =!= col("hof")).count() shouldBe 0

    // real data too: every document at sf0.001
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rth = graft.functions.VectorExpressions.wordShingleHashes(col("text"), 1, distinct = false)
    real.select(Dedup.simhashFromHashes(rth).as("native"), Dedup.simhashFromHashesHof(rth).as("hof"))
      .filter(col("native") =!= col("hof")).count() shouldBe 0
  }

  "native SimHash64FromHashes" should "equal the 64-bit HOF reference formulation bit-for-bit" in {
    val th = graft.functions.VectorExpressions.wordShingleHashes(col("text"), 1, distinct = false)
    docs.select(
      Dedup.simhashFromHashes64(th).as("native"),
      Dedup.simhashFromHashesHof(th, width = 64).as("hof"))
      .filter(col("native") =!= col("hof")).count() shouldBe 0

    // real data too: every document at sf0.001
    val real = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val rth = graft.functions.VectorExpressions.wordShingleHashes(col("text"), 1, distinct = false)
    real.select(
      Dedup.simhashFromHashes64(rth).as("native"),
      Dedup.simhashFromHashesHof(rth, width = 64).as("hof"))
      .filter(col("native") =!= col("hof")).count() shouldBe 0
  }

  it should "have its low 32 bits agree with SimHash32 (same vote rule per bit)" in {
    val th = graft.functions.VectorExpressions.wordShingleHashes(col("text"), 1, distinct = false)
    docs.select(
      Dedup.simhashFromHashes64(th).bitwiseAND(lit(0xFFFFFFFFL)).as("low64"),
      Dedup.simhashFromHashes(th).as("sh32"))
      .filter(col("low64") =!= col("sh32")).count() shouldBe 0
  }

  "native SimHash kernels" should "match the HOF degenerate cases: null array, empty array, null element" in {
    val edge = Seq(
      (1L, Some(Seq[Option[Long]]())),                      // empty array
      (2L, None),                                           // null array
      (3L, Some(Seq[Option[Long]](Some(7L), None))),        // null element
      (4L, Some(Seq[Option[Long]](Some(-1L), Some(0L))))
    ).toDF("id", "th")
    val both = edge.select(col("id"),
      Dedup.simhashFromHashes(col("th")).as("native32"),
      Dedup.simhashFromHashesHof(col("th")).as("hof32"),
      Dedup.simhashFromHashes64(col("th")).as("native64"),
      Dedup.simhashFromHashesHof(col("th"), width = 64).as("hof64")).collect()
    both.foreach { r =>
      withClue(s"id=${r.getLong(0)}: ") {
        r.getLong(1) shouldBe r.getLong(2)
        r.getLong(3) shouldBe r.getLong(4)
      }
    }
  }

  "native MinHashes" should "equal the per-seed HOF reference on every element" in {
    val hs = Dedup.shingleHashes(col("text"))
    val n = 16
    val native = docs.select(
      graft.functions.VectorExpressions.minHashes(hs, n).as("mh"),
      array((0 until n).map(s => Dedup.minhashFromHashes(hs, s)): _*).as("ref"))
    native.filter(!(col("mh") === col("ref"))).count() shouldBe 0
  }

  it should "match the HOF degenerate cases: null array, empty array, null element" in {
    val edge = Seq(
      (1L, Some(Seq[Option[Long]]())),
      (2L, None),
      (3L, Some(Seq[Option[Long]](Some(42L), None)))
    ).toDF("id", "hs")
    val n = 4
    val rows = edge.select(col("id"),
      graft.functions.VectorExpressions.minHashes(col("hs"), n).as("mh"),
      array((0 until n).map(s => Dedup.minhashFromHashes(col("hs"), s)): _*).as("ref")).collect()
    rows.foreach { r =>
      withClue(s"id=${r.getLong(0)}: ") {
        Option(r.getSeq[Any](1)) shouldBe Option(r.getSeq[Any](2))
      }
    }
  }

  "native kernels" should "match the HOF references on randomized hash arrays" in {
    import org.scalacheck.Gen
    val gen = Gen.listOfN(40,
      Gen.containerOf[Seq, Long](Gen.oneOf(
        Gen.long, Gen.oneOf(0L, -1L, 1L, Long.MaxValue, Long.MinValue))))
    val arrays = gen.sample.getOrElse(Nil)
    arrays should not be empty
    val df = arrays.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "hs")
    val n = 8
    val mismatches = df.select(
      Dedup.simhashFromHashes(col("hs")).as("s_native"),
      Dedup.simhashFromHashesHof(col("hs")).as("s_hof"),
      Dedup.simhashFromHashes64(col("hs")).as("s64_native"),
      Dedup.simhashFromHashesHof(col("hs"), width = 64).as("s64_hof"),
      graft.functions.VectorExpressions.minHashes(col("hs"), n).as("m_native"),
      array((0 until n).map(s => Dedup.minhashFromHashes(col("hs"), s)): _*).as("m_hof"))
      .filter(col("s_native") =!= col("s_hof") || col("s64_native") =!= col("s64_hof") ||
        !(col("m_native") === col("m_hof")))
      .count()
    mismatches shouldBe 0
  }

  "editDistanceJoin" should "equal the naive cross-join fuzzy match with exact distances" in {
    import org.apache.spark.sql.functions.{col, levenshtein}
    val left = Seq((1L, "kitten"), (2L, "flaw"), (3L, "stretch")).toDF("id", "s")
    val right = Seq((10L, "sitten"), (11L, "mitten"), (12L, "law"),
      (13L, "flaws"), (14L, "stretches"), (15L, "kitten")).toDF("id", "s")

    val got = Dedup.editDistanceJoin(left, right, "id", "s", "id", "s", maxDistance = 1)
      .select("left_id", "right_id", "distance").as[(Long, Long, Int)].collect().toSet
    // ground truth: unbanded cross join + plain levenshtein
    val expected = left.as("l").crossJoin(right.as("r"))
      .withColumn("d", levenshtein(col("l.s"), col("r.s")))
      .filter(col("d") <= 1)
      .select(col("l.id"), col("r.id"), col("d")).as[(Long, Long, Int)].collect().toSet
    got shouldBe expected
    expected should contain allOf ((1L, 10L, 1), (1L, 11L, 1), (1L, 15L, 0),
      (2L, 12L, 1), (2L, 13L, 1))
    // distance 2 ("stretch" -> "stretches") is beyond k=1 and excluded
    expected.map(p => (p._1, p._2)) should not contain ((3L, 14L))
  }

  it should "restrict comparisons to equal blocks when blockCols is given" in {
    val left = Seq((1L, "abc", "x"), (2L, "abc", "y")).toDF("id", "s", "blk")
    val right = Seq((10L, "abd", "x")).toDF("id", "s", "blk")
    val got = Dedup.editDistanceJoin(left, right, "id", "s", "id", "s",
      maxDistance = 1, blockCols = Some(("blk", "blk")))
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    got shouldBe Set((1L, 10L)) // 2L is block "y": never compared
  }

  it should "keep each qualifying pair exactly once" in {
    val left = Seq((1L, "abc")).toDF("id", "s")
    val right = Seq((2L, "abc"), (3L, "ab"), (4L, "abcd")).toDF("id", "s")
    val rows = Dedup.editDistanceJoin(left, right, "id", "s", "id", "s", maxDistance = 2)
      .select("right_id").as[Long].collect().toList
    rows.sorted shouldBe List(2L, 3L, 4L) // no duplicate meetings from the band explode
  }

  "ngramJaccardPairs" should "compute exact word-set jaccard" in {
    val pairs = Dedup.ngramJaccardPairs(docs, threshold = 0.5)
      .as[(Long, Long, Double)].collect().map { case (a, b, j) => ((a, b), j) }.toMap
    pairs((0L, 1L)) shouldBe 1.0
    pairs.keySet should contain((0L, 2L))
    pairs((0L, 2L)) should be > 0.8
    pairs.keySet should not contain ((0L, 3L))
  }
}
