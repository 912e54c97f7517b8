package graft.operators

import graft.TestSpark
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class CorpusToolsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "a", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "a", "one two three four five six seven eight nine ten"),
    (3L, "b", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (4L, "b", "totally different words without any overlap at all here"),
    (5L, "a", "short text")
  ).toDF("id", "src", "text")

  // --- deterministicShuffle ---

  "deterministicShuffle" should "assign every row a shard in range and a dense per-shard position" in {
    val out = CorpusTools.deterministicShuffle(docs, "id", seed = "s1", numShards = 4)
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
    out should have length 5
    all(out.map(_._2)) should (be >= 0 and be < 4)
    // positions are 1..count(shard) within each shard
    out.groupBy(_._2).values.foreach { rows =>
      rows.map(_._3).sorted shouldBe (1L to rows.length).toVector
    }
  }

  it should "be deterministic for a seed and differ across seeds" in {
    def run(seed: String) =
      CorpusTools.deterministicShuffle(docs, "id", seed, numShards = 4)
        .select("id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
    run("s1") shouldBe run("s1")
    // 5 rows over (shard, pos): the odds of two seeds agreeing entirely are
    // negligible; this fixture is pinned non-equal
    run("s1") should not be run("s2")
  }

  it should "derive shards from 32 key bits — unbiased for numShards not dividing 16" in {
    // the old single-nibble derivation gives numShards=6 a systematic 6/16 vs
    // 5/16 skew (+20% on shards 0-3); 32 bits bound the skew at 6/2^32
    val n = 60000
    val big = spark.range(n).toDF("id")
    val counts = CorpusTools.deterministicShuffle(big, "id", seed = "bias", numShards = 6)
      .groupBy("shard").count().as[(Int, Long)].collect().toMap
    counts.keySet shouldBe (0 until 6).toSet
    val expected = n / 6.0
    counts.values.foreach { c =>
      // 3-sigma binomial noise is ~1.2%; the nibble bias would be +/-20%
      math.abs(c - expected) / expected should be < 0.05
    }
    // and the formula is exactly (first 8 hex of md5 as uint32) % numShards
    val probe = CorpusTools.deterministicShuffle(big.limit(100), "id", seed = "bias", numShards = 6)
      .select("id", "shard").as[(Long, Int)].collect()
    probe.foreach { case (id, shard) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"bias:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      shard shouldBe (java.lang.Long.parseLong(hex, 16) % 6).toInt
    }
  }

  // --- mixtureSample ---

  "mixtureSample" should "keep everything at weight 1 and nothing at weight 0" in {
    val all = CorpusTools.mixtureSample(docs, "id", "src",
      weights = Map("a" -> 1.0, "b" -> 1.0), defaultWeight = 0.0, seed = "m")
    all.count() shouldBe 5
    val none = CorpusTools.mixtureSample(docs, "id", "src",
      weights = Map("a" -> 0.0), defaultWeight = 0.0, seed = "m")
    none.count() shouldBe 0
  }

  it should "nest: a smaller weight selects a subset of a larger weight" in {
    val big = spark.range(2000).toDF("id").withColumn("src", lit("a"))
    def sample(w: Double) = CorpusTools.mixtureSample(big, "id", "src",
      weights = Map("a" -> w), defaultWeight = 0.0, seed = "m")
      .select("id").as[Long].collect().toSet
    val half = sample(0.5)
    val quarter = sample(0.25)
    quarter.subsetOf(half) shouldBe true
    // fractions land near the target (md5 is uniform; 2000 trials)
    half.size.toDouble / 2000 shouldBe 0.5 +- 0.06
    quarter.size.toDouble / 2000 shouldBe 0.25 +- 0.06
  }

  "hexThreshold" should "clamp and render 8-hex thresholds" in {
    CorpusTools.hexThreshold(0.0) shouldBe "0"
    CorpusTools.hexThreshold(-1.0) shouldBe "0"
    CorpusTools.hexThreshold(1.0) shouldBe "g"
    CorpusTools.hexThreshold(2.0) shouldBe "g"
    CorpusTools.hexThreshold(0.5) shouldBe "80000000"
    CorpusTools.hexThreshold(0.25) shouldBe "40000000"
  }

  // --- packSequences ---

  "packSequences" should "reproduce a sequential concat-and-chunk per stream" in {
    val withTokens = docs.select($"id", $"src",
      TextFunctions.tokenCount($"text").as("n_tokens"))
    val out = CorpusTools.packSequences(withTokens, "id", "n_tokens",
        budget = 16, streamCols = Seq("src"))
      .select("id", "src", "n_tokens", "seq_id", "bin_offset")
      .as[(Long, String, Int, Long, Long)].collect()
      .groupBy(_._2).view.mapValues(_.sortBy(_._1)).toMap

    // sequential reference implementation
    val ref = withTokens.as[(Long, String, Int)].collect()
      .groupBy(_._2).view.mapValues { rows =>
        var off = 0L
        rows.sortBy(_._1).map { case (id, src, n) =>
          val r = (id, src, n, off / 16, off % 16)
          off += n
          r
        }
      }.toMap
    out.keySet shouldBe ref.keySet
    out.keySet.foreach { src => out(src).toSeq shouldBe ref(src).toSeq }
  }

  it should "keep offsets inside the budget and seq ids monotone" in {
    val withTokens = docs.select($"id", $"src",
      TextFunctions.tokenCount($"text").as("n_tokens"))
    val out = CorpusTools.packSequences(withTokens, "id", "n_tokens",
        budget = 8, streamCols = Seq("src"))
      .select("id", "src", "seq_id", "bin_offset").as[(Long, String, Long, Long)].collect()
    all(out.map(_._4)) should (be >= 0L and be < 8L)
    out.groupBy(_._2).values.foreach { rows =>
      val seqs = rows.sortBy(_._1).map(_._3)
      seqs shouldBe seqs.sorted
    }
  }

  // --- takeTokenBudget ---

  "takeTokenBudget" should "keep docs in hash order until the stream budget" in {
    val big = spark.range(100).toDF("id").withColumn("src", lit("a"))
      .withColumn("n", lit(10))
    val kept = CorpusTools.takeTokenBudget(big, "id", "n", budget = 95L,
      streamCols = Seq("src"), seed = "b").select("id").as[Long].collect().toSet
    // 10 tokens per doc: starts at 0,10,...,90 are < 95 -> exactly 10 docs
    kept.size shouldBe 10
    // and they are the first 10 in md5-hash order, sequentially recomputed
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(s"b:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = (0L until 100L).sortBy(id => (h(id), id)).take(10).toSet
    kept shouldBe expect
  }

  it should "always keep the first document of a stream even over budget" in {
    val one = Seq((1L, "a", 50), (2L, "a", 50)).toDF("id", "src", "n")
    val kept = CorpusTools.takeTokenBudget(one, "id", "n", budget = 1L,
      streamCols = Seq("src"), seed = "b")
    kept.count() shouldBe 1 // whichever hashes first starts at offset 0 < 1
  }

  // --- docCommonness ---

  "docCommonness" should "fold exact corpus counts per document" in {
    val corpus = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry")
    ).toDF("id", "text")
    val out = CorpusTools.docCommonness(corpus, "id", "text")
      .select("id", "n_tokens", "sum_counts", "commonness")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // counts: apple=2, banana=2, cherry=1
    out(0) shouldBe ((1L, 3L, 6L, 2.0))      // 2+2+2
    out(1) shouldBe ((2L, 2L, 3L, 1.5))      // 2+1
  }

  // --- repeatedWindows ---

  "repeatedWindows" should "find spans shared across documents and only those" in {
    val out = CorpusTools.repeatedWindows(docs, "id", "text", n = 8, minDocs = 2)
      .as[(String, Long, Long, Long)].collect()
    // docs 1 and 3 are identical 10-token texts: three 8-token windows shared
    out should have length 3
    all(out.map(_._2)) shouldBe 2L  // n_docs
    all(out.map(_._3)) shouldBe 2L  // n_occ
    all(out.map(_._4)) shouldBe 1L  // first_doc = min id
    out.map(_._1) should contain("alpha beta gamma delta epsilon zeta eta theta")
  }

  it should "count multiple occurrences inside one document" in {
    val rep = Seq(
      (1L, "x y x y x y x y"), // "x y x y" appears at offsets 0,2,4 (n=4)
      (2L, "x y x y completely unrelated tail words")
    ).toDF("id", "text")
    val out = CorpusTools.repeatedWindows(rep, "id", "text", n = 4, minDocs = 2)
      .as[(String, Long, Long, Long)].collect()
    val xy = out.find(_._1 == "x y x y").get
    xy._2 shouldBe 2L // both docs
    xy._3 shouldBe 4L // 3 occurrences in doc 1 + 1 in doc 2
  }

  it should "emit nothing for documents shorter than the window" in {
    CorpusTools.repeatedWindows(
      Seq((1L, "a b"), (2L, "a b")).toDF("id", "text"),
      "id", "text", n = 3, minDocs = 2).count() shouldBe 0
  }

  // --- topTokens ---

  "importanceWeights" should "score docs by hand-computed integer log-ratios and keep by threshold" in {
    // target slice = src "a"; tokens deliberately overlap across slices
    val corpus = Seq(
      (1L, "a", "cat cat dog"),
      (2L, "a", "cat fish"),
      (3L, "b", "dog dog dog"),
      (4L, "b", "fish fish")
    ).toDF("id", "src", "text")
    val w = CorpusTools.importanceWeightTable(corpus, "text", col("src") === "a", vocabCap = 10)
    // hand-computed: vocab {cat:3, dog:4, fish:3} (V=3), target totals: cat 3,
    // fish 1, dog 1 (T=5); raw totals (R=10). wt = round(1000*(ln((tc+1)/(T+V)) - ln((rc+1)/(R+V)))
    def wt(tc: Long, rc: Long) =
      math.round(1000.0 * (math.log((tc + 1.0) / 8.0) - math.log((rc + 1.0) / 13.0)))
    w shouldBe Map("cat" -> wt(3, 3), "dog" -> wt(1, 4), "fish" -> wt(1, 3))
    w("cat") should be > 0L  // target-heavy token scores positive
    w("dog") should be < 0L  // raw-heavy token scores negative

    val scored = CorpusTools.importanceWeights(corpus, "id", "text", w, keepThreshold = 0L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    scored shouldBe Array(
      (1L, 2 * w("cat") + w("dog"), 2 * w("cat") + w("dog") >= 0),
      (2L, w("cat") + w("fish"), w("cat") + w("fish") >= 0),
      (3L, 3 * w("dog"), false),
      (4L, 2 * w("fish"), 2 * w("fish") >= 0))
    // the predicate overload derives the same table internally
    CorpusTools.importanceWeights(corpus, "id", "text", col("src") === "a")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSeq shouldBe scored.toSeq
  }

  it should "treat null-predicate rows as non-target instead of crashing the table build" in {
    // a null src makes isTarget = (src === "a") evaluate to SQL NULL; a token
    // occurring ONLY in such rows used to sum to NULL and NPE on collect
    val corpus = Seq((1L, "a", "cat"), (2L, null, "mystery"), (3L, "b", "cat"))
      .toDF("id", "src", "text")
    val w = CorpusTools.importanceWeightTable(corpus, "text", col("src") === "a", vocabCap = 10)
    w.keySet shouldBe Set("cat", "mystery")
    // mystery: tc=0 (null rows count as non-target), rc=1; totals T=1, R=3, V=2
    w("mystery") shouldBe math.round(1000.0 * (math.log(1.0 / 3.0) - math.log(2.0 / 5.0)))
  }

  it should "contribute zero for out-of-table tokens and bound the table by vocabCap" in {
    val corpus = Seq((1L, "a", "rare rare common"), (2L, "b", "common common common")).toDF("id", "src", "text")
    val w = CorpusTools.importanceWeightTable(corpus, "text", col("src") === "a", vocabCap = 1)
    w.keySet shouldBe Set("common") // top-1 by raw frequency
    val scored = CorpusTools.importanceWeights(corpus, "id", "text", w, keepThreshold = Long.MinValue)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 1: two OOV "rare" tokens contribute 0, one "common" counts
    scored shouldBe Array((1L, w("common")), (2L, 3 * w("common")))
  }

  "dsirSample" should "select deterministically: two runs agree row for row" in {
    val corpus = (1L to 40L).map(i => (i, s"tok$i tok${i % 7} common")).toDF("id", "text")
    val w = (0 until 7).map(i => s"tok$i" -> (i * 100L - 300L)).toMap + ("common" -> 50L)
    def run() = CorpusTools.dsirSample(corpus, "id", "text", w, n = 10, seed = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val first = run()
    first should have length 10
    run() shouldBe first // the determinism law: same (corpus, weights, n, seed)
    // a different seed perturbs differently (40 docs, 10 picks — identical
    // selections across seeds would mean the noise is not being applied)
    CorpusTools.dsirSample(corpus, "id", "text", w, n = 10, seed = 8)
      .collect().map(_.getLong(0)).toList should not be first.map(_._1)
  }

  it should "respect the integer-key arithmetic: noise bounded, big score gaps dominate" in {
    val corpus = (1L to 30L).map(i => (i, if (i <= 5) "hot hot hot" else "cold")).toDF("id", "text")
    // hot docs outscore cold by 3*20000 - (-20000) = 80000 milli-nats — far
    // beyond the 16-bit Gumbel range [-2407, 11789], so all 5 hot docs MUST
    // be selected before any cold one (the proportionality sanity check)
    val w = Map("hot" -> 20000L, "cold" -> -20000L)
    val out = CorpusTools.dsirSample(corpus, "id", "text", w, n = 8, seed = 1).collect()
    out.take(5).map(_.getLong(0)).toSet shouldBe Set(1L, 2L, 3L, 4L, 5L)
    // the quantized Gumbel perturbation stays inside its analytic bounds:
    // u on the 2^16 grid, so G = -ln(-ln u) ranges from u = 0.5/65536
    // (G = -2.4667 → -2467 milli-nats) to u = 65535.5/65536 (G = 11.783
    // → 11783 milli-nats)
    all(out.map(r => r.getLong(2) - r.getLong(1))) should (be >= -2467L and be <= 11783L)
    // n larger than the corpus returns every doc, once
    CorpusTools.dsirSample(corpus, "id", "text", w, n = 100, seed = 1)
      .collect().map(_.getLong(0)).distinct should have length 30
    an[IllegalArgumentException] should be thrownBy
      CorpusTools.dsirSample(corpus, "id", "text", w, n = -1)
  }

  "saveWeights / loadWeights" should "round-trip, refresh atomically, and time-travel" in {
    import graft.core._
    import graft.operators.VersionedTables._
    val dir = java.nio.file.Files.createTempDirectory("graft-weights-").toFile
    val engine = VersionedTables.withFileStore(spark, new java.io.File(dir, "store").toURI)
    val table = TableDefinition(TableName("test", "dsir_weights"),
      new java.io.File(dir, "weights").toURI, PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")

    val w1 = Map("cat" -> 480L, "dog" -> -270L)
    CorpusTools.saveWeights(engine, table, w1, UserId("t"))
    CorpusTools.loadWeights(engine, table) shouldBe w1
    val v1 = engine.log(table.name).head.id

    // refresh replaces the WHOLE table; the old estimate stays reachable
    val w2 = Map("cat" -> 100L, "fish" -> 7L)
    CorpusTools.saveWeights(engine, table, w2, UserId("t"), "re-estimate")
    CorpusTools.loadWeights(engine, table) shouldBe w2
    CorpusTools.loadWeightsAt(engine, table, v1) shouldBe w1

    // the loaded table drives scoring identically to the in-memory map
    val corpus = Seq((1L, "cat cat dog")).toDF("id", "text")
    CorpusTools.importanceWeights(corpus, "id", "text",
        CorpusTools.loadWeightsAt(engine, table, v1), keepThreshold = 0L)
      .select("dsir_score").as[Long].head() shouldBe (2 * 480L - 270L)

    // non-snapshot tables are refused
    val part = TableDefinition(TableName("test", "bad"),
      new java.io.File(dir, "bad").toURI, PartitionSchema("day"), FileFormat.Parquet)
    an[IllegalArgumentException] should be thrownBy
      CorpusTools.saveWeights(engine, part, w1, UserId("t"))
  }

  "topTokens" should "rank by term frequency with deterministic tiebreak" in {
    val corpus = Seq(
      (1L, "apple apple banana"),
      (2L, "apple banana cherry"),
      (3L, "banana date")
    ).toDF("id", "text")
    val out = CorpusTools.topTokens(corpus, "id", "text", k = 3)
      .as[(String, Long, Long)].collect()
    out shouldBe Array(
      ("apple", 3L, 2L),   // 3 occurrences in 2 docs
      ("banana", 3L, 3L),  // tie on term_freq broken by token text
      ("cherry", 1L, 1L))  // cherry < date on the k boundary
  }

  // --- PII functions ---

  "PII extraction" should "find emails and urls and redact them" in {
    val df = Seq(
      (1L, "reach me at jo.ann+x@mail.example or https://site.example/a_b%20c then x@y.io"),
      (2L, "no contact info here")
    ).toDF("id", "text")
    val out = df.select($"id",
      TextFunctions.extractEmails($"text").as("emails"),
      TextFunctions.extractUrls($"text").as("urls"),
      TextFunctions.redactPii($"text").as("red"))
      .as[(Long, Seq[String], Seq[String], String)].collect().sortBy(_._1)

    out(0)._2 shouldBe Seq("jo.ann+x@mail.example", "x@y.io")
    out(0)._3 shouldBe Seq("https://site.example/a_b%20c")
    out(0)._4 shouldBe "reach me at <EMAIL> or <URL> then <EMAIL>"
    out(1)._2 shouldBe empty
    out(1)._3 shouldBe empty
    out(1)._4 shouldBe "no contact info here"
  }

  "removeBoilerplateLines" should "drop cross-document lines, keep order and multiplicity" in {
    val docs = Seq(
      (1L, "COOKIE BANNER\nreal prose one\nreal prose one\nFOOTER"),
      (2L, "COOKIE BANNER\nreal prose two\nFOOTER"),
      (3L, "COOKIE BANNER\nFOOTER"),                      // all boilerplate -> empty
      (4L, "unique document with one line")
    ).toDF("doc_id", "text")
    val out = CorpusTools.removeBoilerplateLines(docs, maxDocFrequency = 1L)
      .as[(Long, String)].collect().toMap
    // "real prose one" repeats WITHIN doc 1 only -> doc frequency 1 -> kept twice, in order
    out(1L) shouldBe "real prose one\nreal prose one"
    out(2L) shouldBe "real prose two"
    out(3L) shouldBe ""
    out(4L) shouldBe "unique document with one line"
  }

  it should "honor the doc-frequency threshold and keep every input row" in {
    val docs = Seq(
      (1L, "shared\nown1"), (2L, "shared\nown2"), (3L, "shared\nown3")
    ).toDF("doc_id", "text")
    // df("shared") = 3: survives a threshold of 3, dies at 2
    CorpusTools.removeBoilerplateLines(docs, maxDocFrequency = 3L)
      .as[(Long, String)].collect().toMap.apply(2L) shouldBe "shared\nown2"
    val strict = CorpusTools.removeBoilerplateLines(docs, maxDocFrequency = 2L)
      .as[(Long, String)].collect().toMap
    strict(2L) shouldBe "own2"
    strict.keySet shouldBe Set(1L, 2L, 3L)
    an[IllegalArgumentException] should be thrownBy
      CorpusTools.removeBoilerplateLines(docs, maxDocFrequency = 0L)
  }

  "removeBoilerplateLines" should "be idempotent (a second pass removes nothing)" in {
    // a kept line's doc frequency is unchanged by removing OTHER lines, so
    // one pass reaches the fixpoint — pinned on the real corpus line-ification
    // 3-word lines over the 31-word vocabulary: collisions are guaranteed
    // present at sf0.001 (≈1200 lines over 31³ combinations)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", regexp_replace($"text", "((\\S+ ){2}\\S+) ", "$1\n").as("text"))
    val once = CorpusTools.removeBoilerplateLines(docs, maxDocFrequency = 1L)
      .select("doc_id", "text")
    val twice = CorpusTools.removeBoilerplateLines(once, maxDocFrequency = 1L)
      .select("doc_id", "text")
    twice.exceptAll(once).count() shouldBe 0
    once.exceptAll(twice).count() shouldBe 0
    // and the pass actually removed something on this corpus (non-vacuous)
    docs.exceptAll(once).count() should be > 0L
  }

  "splitAssign" should "hit the requested fractions, nest across weights, and stay stable under growth" in {
    val n = 20000
    val big = spark.range(n).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val assigned = CorpusTools.splitAssign(big, "id", seed = "s", splits)
    val counts = assigned.groupBy("split").count().as[(String, Long)].collect().toMap
    counts.keySet shouldBe Set("train", "val", "test")
    (counts("train").toDouble / n) shouldBe 0.8 +- 0.02
    (counts("val").toDouble / n) shouldBe 0.1 +- 0.01
    (counts("test").toDouble / n) shouldBe 0.1 +- 0.01

    // nesting: the 70/20/10 train set is a subset of the 80/10/10 train set
    val narrower = CorpusTools.splitAssign(big, "id", seed = "s",
      Seq("train" -> 0.7, "val" -> 0.2, "test" -> 0.1))
    val wideTrain = assigned.filter($"split" === "train").select("id").as[Long].collect().toSet
    val narrowTrain = narrower.filter($"split" === "train").select("id").as[Long].collect().toSet
    narrowTrain.subsetOf(wideTrain) shouldBe true

    // growth stability: assignments over a PREFIX of the corpus are identical
    val prefix = CorpusTools.splitAssign(spark.range(n / 2).toDF("id"), "id", seed = "s", splits)
      .as[(Long, String)].collect().toMap
    val full = assigned.as[(Long, String)].collect().toMap
    prefix.foreach { case (id, s) => full(id) shouldBe s }

    an[IllegalArgumentException] should be thrownBy
      CorpusTools.splitAssign(big, "id", "s", Seq("a" -> 0.5, "b" -> 0.4))
  }

  "duplicate n-gram ratios" should "match hand-computed repetition on planted docs" in {
    // scalatest's Matchers.size(Long) shadows functions.size here — qualify
    val arrSize = org.apache.spark.sql.functions.size _
    def ratio(k: Int) = {
      val total = arrSize(graft.functions.VectorExpressions.wordShingleHashes($"text", k, distinct = false))
      val dist = arrSize(graft.functions.VectorExpressions.wordShingleHashes($"text", k, distinct = true))
      when(total > 0, lit(1.0) - dist.cast("double") / total.cast("double")).otherwise(lit(0.0))
    }
    val docs = Seq(
      (1L, "a b a b a"),            // bigrams: ab ba ab ba -> 4 total, 2 distinct -> 0.5
      (2L, "all words are unique"), // 3 distinct bigrams of 3 -> 0.0
      (3L, "x x x x")               // bigrams: xx xx xx -> 3 total, 1 distinct -> 2/3
    ).toDF("doc_id", "text")
    val got = docs.select($"doc_id", ratio(2).as("r2"))
      .as[(Long, Double)].collect().toMap
    got(1L) shouldBe 0.5 +- 1e-12
    got(2L) shouldBe 0.0
    got(3L) shouldBe (2.0 / 3.0) +- 1e-12
  }

  // --- duplicatedSpans / stripRepeatedSpans ---

  // 1 and 3 are identical 10-token docs; a shares its FIRST 4 tokens with b's
  // start (below the n=4 window threshold only when windows differ)
  private def spanDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (4L, "unique words that appear nowhere else in the corpus"),
    (5L, "tiny doc")
  ).toDF("doc_id", "text")

  "duplicatedSpans" should "report merged coverage for fully duplicated documents" in {
    val out = CorpusTools.duplicatedSpans(spanDocs, "doc_id", "text", n = 4)
      .as[(Long, Int, Long, Long)].collect()
      .map { case (id, nt, dw, dt) => id -> ((nt, dw, dt)) }.toMap
    // docs 1 and 3: all 7 sliding 4-token windows repeat; merged coverage = 10
    out(1L) shouldBe ((10, 7L, 10L))
    out(3L) shouldBe ((10, 7L, 10L))
    out(2L) shouldBe ((10, 0L, 0L))
    out(4L) shouldBe ((9, 0L, 0L))
    out(5L) shouldBe ((2, 0L, 0L)) // shorter than the window: never duplicated
  }

  it should "merge non-adjacent duplicated spans without double counting" in {
    // doc 10 embeds doc 11's 4-token phrase twice, separated by unique filler
    val docs = Seq(
      (10L, "p q r s AA BB CC DD u v w x AA BB CC DD y z"),
      (11L, "AA BB CC DD")
    ).toDF("doc_id", "text")
    val out = CorpusTools.duplicatedSpans(docs, "doc_id", "text", n = 4)
      .as[(Long, Int, Long, Long)].collect()
      .map { case (id, nt, dw, dt) => id -> ((nt, dw, dt)) }.toMap
    // two disjoint 4-token spans in doc 10 (positions 4-7 and 12-15)
    out(10L) shouldBe ((18, 2L, 8L))
    out(11L) shouldBe ((4, 1L, 4L))
  }

  it should "produce identical results with hashed and text window keys" in {
    val byHash = CorpusTools.duplicatedSpans(spanDocs, "doc_id", "text", n = 4, hashKey = true)
      .as[(Long, Int, Long, Long)].collect().toSet
    val byText = CorpusTools.duplicatedSpans(spanDocs, "doc_id", "text", n = 4, hashKey = false)
      .as[(Long, Int, Long, Long)].collect().toSet
    byHash shouldBe byText
  }

  it should "be invariant under arbitrary repartitioning" in {
    val base = CorpusTools.duplicatedSpans(spanDocs, "doc_id", "text", n = 4)
      .as[(Long, Int, Long, Long)].collect().toSet
    Seq(1, 3, 7).foreach { parts =>
      CorpusTools.duplicatedSpans(spanDocs.repartition(parts), "doc_id", "text", n = 4)
        .as[(Long, Int, Long, Long)].collect().toSet shouldBe base
    }
  }

  "stripRepeatedSpans" should "empty fully duplicated docs and keep unique ones" in {
    val out = CorpusTools.stripRepeatedSpans(spanDocs, "doc_id", "text", n = 4)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    out(1L) shouldBe ""
    out(3L) shouldBe ""
    out(2L) shouldBe "one two three four five six seven eight nine ten"
    out(5L) shouldBe "tiny doc"
  }

  it should "cut exactly the covered span and reassemble the remainder in order" in {
    val docs = Seq(
      (10L, "p q r s AA BB CC DD u v w x"),
      (11L, "AA BB CC DD")
    ).toDF("doc_id", "text")
    val out = CorpusTools.stripRepeatedSpans(docs, "doc_id", "text", n = 4)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    out(10L) shouldBe "p q r s u v w x"
    out(11L) shouldBe ""
  }

  it should "produce identical results with hashed and text window keys" in {
    val byHash = CorpusTools.stripRepeatedSpans(spanDocs, "doc_id", "text", n = 4, hashKey = true)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    val byText = CorpusTools.stripRepeatedSpans(spanDocs, "doc_id", "text", n = 4, hashKey = false)
      .select("doc_id", "text").as[(Long, String)].collect().toSet
    byHash shouldBe byText
  }

  it should "preserve original bytes of uncut docs and original case of survivors" in {
    // mining is lowercased (21/22 share "AA BB CC DD" = "aa bb cc dd"), but
    // cutting must not normalize: doc 20 has no duplicated span and must come
    // back byte-identical (case AND double spaces intact); cut docs keep the
    // survivors' original casing
    val docs = Seq(
      (20L, "The  Quick   Brown Fox"),
      (21L, "X y Z AA BB CC DD P"),
      (22L, "q R AA BB CC DD s T")
    ).toDF("doc_id", "text")
    val out = CorpusTools.stripRepeatedSpans(docs, "doc_id", "text", n = 4)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    out(20L) shouldBe "The  Quick   Brown Fox"
    out(21L) shouldBe "X y Z P"
    out(22L) shouldBe "q R s T"
  }

  // --- sampleN ---

  "sampleN" should "return exactly n rows, nested across sizes, partition-invariant" in {
    val docs = (0L until 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val s50 = CorpusTools.sampleN(docs, "doc_id", 50).select("doc_id").as[Long].collect().toSet
    val s20 = CorpusTools.sampleN(docs, "doc_id", 20).select("doc_id").as[Long].collect().toSet
    s50 should have size 50
    s20 should have size 20
    s20.subsetOf(s50) shouldBe true // ablation series nest
    Seq(1, 7).foreach { parts =>
      CorpusTools.sampleN(docs.repartition(parts), "doc_id", 50)
        .select("doc_id").as[Long].collect().toSet shouldBe s50
    }
    // n >= corpus: everything survives
    CorpusTools.sampleN(docs, "doc_id", 500).count() shouldBe 200
  }

  // --- capPerGroup ---

  "capPerGroup" should "keep at most cap rows per group, exactly the md5-order prefix" in {
    import org.apache.spark.sql.functions.{col, concat_ws, lit, md5, row_number}
    // 3 hot groups of 20 and 7 singletons
    val docs = (0L until 67L).map(i =>
      (i, if (i < 60) s"g${i % 3}" else s"solo$i")).toDF("doc_id", "grp")
    val out = CorpusTools.capPerGroup(docs, "grp", "doc_id", cap = 5, seed = "s")
      .select("grp", "doc_id").as[(String, Long)].collect()
    out.length shouldBe 3 * 5 + 7
    out.groupBy(_._1).foreach { case (_, rows) => rows.length should be <= 5 }
    // semantics law: identical to the plain single-window formulation
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
      .orderBy(md5(concat_ws(":", lit("s"), col("doc_id").cast("string"))), col("doc_id"))
    val plain = docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).select("grp", "doc_id")
      .as[(String, Long)].collect().toSet
    out.toSet shouldBe plain
  }

  it should "treat NULL group values as one ordinary capped group" in {
    import org.apache.spark.sql.functions.{col, concat_ws, lit, md5, row_number}
    // 8 null-group rows (over a cap of 3) among named groups: groupBy and
    // Window.partitionBy both treat NULL as a group, so the split path's
    // count join must be null-safe — a plain equi-join would DROP them
    val docs = (0L until 20L).map(i =>
      (i, if (i < 8) null else s"g${i % 2}")).toDF("doc_id", "grp")
    val out = CorpusTools.capPerGroup(docs, "grp", "doc_id", cap = 3, seed = "s")
      .select("grp", "doc_id").as[(String, Long)].collect()
    out.count(_._1 == null) shouldBe 3
    // and the pinned window-formulation equivalence holds WITH nulls present
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
      .orderBy(md5(concat_ws(":", lit("s"), col("doc_id").cast("string"))), col("doc_id"))
    val plain = docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3).select("grp", "doc_id")
      .as[(String, Long)].collect().toSet
    out.toSet shouldBe plain
  }

  it should "be deterministic and invariant under repartitioning" in {
    val docs = (0L until 100L).map(i => (i, s"g${i % 4}")).toDF("doc_id", "grp")
    val base = CorpusTools.capPerGroup(docs, "grp", "doc_id", cap = 7)
      .select("grp", "doc_id").as[(String, Long)].collect().toSet
    Seq(1, 3, 13).foreach { parts =>
      CorpusTools.capPerGroup(docs.repartition(parts), "grp", "doc_id", cap = 7)
        .select("grp", "doc_id").as[(String, Long)].collect().toSet shouldBe base
    }
  }

  // --- chunkDocuments ---

  "chunkDocuments" should "chunk with overlap and keep the short tail" in {
    val doc = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = CorpusTools.chunkDocuments(doc, "doc_id", "text", maxTokens = 4, overlap = 1)
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._2)
    // step 3, starts below 10-1=9: 0, 3, 6 — start 9 would add no new token
    out.map(c => (c._2, c._3, c._4, c._5)) shouldBe Array(
      (0, 0, 4, "t1 t2 t3 t4"),
      (1, 3, 4, "t4 t5 t6 t7"),
      (2, 6, 4, "t7 t8 t9 t10"))
  }

  it should "not emit a tail chunk adding no new tokens" in {
    // n=10, max=8, overlap=4, step=4: start 8 would cover 8..9, already inside 4..9
    val doc = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = CorpusTools.chunkDocuments(doc, "doc_id", "text", maxTokens = 8, overlap = 4)
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._2)
    out.map(_._3) shouldBe Array(0, 4)
    out.map(_._4) shouldBe Array(8, 6)
  }

  it should "emit one chunk for short docs, none for empty, and cover every token" in {
    val docs = Seq((1L, "only three tokens"), (2L, "   "), (3L, ""))
      .toDF("doc_id", "text")
    val out = CorpusTools.chunkDocuments(docs, "doc_id", "text", maxTokens = 8, overlap = 2)
      .as[(Long, Int, Int, Int, String)].collect()
    out.map(_._1).toSet shouldBe Set(1L)
    out.head shouldBe ((1L, 0, 0, 3, "only three tokens"))

    // coverage law on a bigger doc: chunks concatenated minus overlaps = doc
    val big = Seq((9L, (1 to 103).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = CorpusTools.chunkDocuments(big, "doc_id", "text", maxTokens = 16, overlap = 4)
      .as[(Long, Int, Int, Int, String)].collect().sortBy(_._2)
    // every token index 0..102 covered; adjacent chunks agree on the overlap
    val covered = chunks.flatMap(c => c._3 until (c._3 + c._4)).toSet
    covered shouldBe (0 until 103).toSet
    chunks.sliding(2).foreach {
      case Array(a, b) =>
        val aToks = a._5.split(" ")
        val bToks = b._5.split(" ")
        aToks.drop(b._3 - a._3) shouldBe bToks.take(a._3 + a._4 - b._3)
      case _ =>
    }
    an[IllegalArgumentException] should be thrownBy
      CorpusTools.chunkDocuments(big, "doc_id", "text", maxTokens = 4, overlap = 4)
  }
}
