package graft.operators

import graft.TestSpark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class QualityModelsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  // reference slice (ref=true) speaks "good" tokens; the noisy doc doesn't
  private def corpus = Seq(
    (1L, true, "good clean fluent text here"),
    (2L, true, "good clean text again here"),
    (3L, false, "good clean fluent text here"),
    (4L, false, "zz qq xx vv ww"),
    (5L, false, "good clean mixed zz qq")
  ).toDF("doc_id", "ref", "text")

  "lmCostTable" should "assign lower cost to frequent reference tokens, highest to OOV" in {
    val m = QualityModels.lmCostTable(corpus, "text", $"ref")
    // reference slice: good/clean/text/here x2, fluent/again x1 -> 6 types
    m.costs.keySet shouldBe Set("good", "clean", "fluent", "text", "here", "again")
    m.costs("good") should be < m.costs("fluent")
    m.oovCost should be > m.costs("fluent")
    // exact arithmetic: cost = round(-1000 ln((c+1)/(T+V))), T=10, V=6
    m.costs("good") shouldBe math.round(-1000.0 * math.log(3.0 / 16.0))
    m.oovCost shouldBe math.round(-1000.0 * math.log(1.0 / 16.0))
  }

  "lmPerplexity" should "rank in-distribution docs below noise, with exact integer sums" in {
    val m = QualityModels.lmCostTable(corpus, "text", $"ref")
    val scored = QualityModels.lmPerplexity(corpus, "doc_id", "text", m)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 3 == doc 1 text: identical cost; doc 4 is all OOV
    scored(3L) shouldBe scored(1L)
    scored(4L)._2 shouldBe 5 * m.oovCost
    scored(4L)._3 should be > scored(1L)._3 // avg: noise > fluent
    // integer mean is cost div n
    val (n1, c1, a1) = scored(1L)
    a1 shouldBe c1 / n1
  }

  "lmBuckets" should "split head/middle/tail on the threshold literals" in {
    val m = QualityModels.lmCostTable(corpus, "text", $"ref")
    val scored = QualityModels.lmPerplexity(corpus, "doc_id", "text", m)
    val (t1, t2) = QualityModels.tertileThresholds(scored, "doc_id")
    t1 should be <= t2
    val buckets = QualityModels.lmBuckets(scored, t1, t2)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    buckets(4L) shouldBe "tail" // the all-OOV doc is never head
    buckets.values.toSet should contain("head")
    // boundary rule: every head doc's avg <= every tail doc's avg
    val avg = QualityModels.lmPerplexity(corpus, "doc_id", "text", m)
      .select("doc_id", "avg_millinats").as[(Long, Long)].collect().toMap
    val headMax = buckets.collect { case (id, "head") => avg(id) }.max
    val tailMin = buckets.collect { case (id, "tail") => avg(id) }.min
    headMax should be <= tailMin
  }

  "ngram lmCostTable" should "see word order where the unigram model cannot" in {
    // fluent reference prose, repeated so bigram counts have mass
    val ref = (1L to 8L).map(i =>
      (i, true, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "ref", "text")
    val natural = "the quick brown fox jumps over the lazy dog"
    val scrambled = "dog the over quick lazy fox brown jumps the" // same bag of words
    val probe = Seq((10L, false, natural), (11L, false, scrambled)).toDF("doc_id", "ref", "text")
    val corpus = ref.unionByName(probe)

    def avg(model: QualityModels.LmModel, n: Int): Map[Long, Long] =
      QualityModels.lmPerplexity(probe, "doc_id", "text", model, ngram = n)
        .select("doc_id", "avg_millinats").as[(Long, Long)].collect().toMap

    // unigram: identical bags -> identical scores (the blindness)
    val uni = QualityModels.lmCostTable(corpus, "text", $"ref", ngram = 1)
    avg(uni, 1)(10L) shouldBe avg(uni, 1)(11L)
    // bigram: the scramble's transitions are all OOV -> strictly worse
    val bi = QualityModels.lmCostTable(corpus, "text", $"ref", ngram = 2)
    avg(bi, 2)(11L) should be > avg(bi, 2)(10L)
    // and the natural-order probe scores exactly as in-distribution text:
    // every one of its bigrams is in the reference table
    bi.costs.keySet should contain("quick brown")
  }

  "tertileThresholdsApprox" should "agree with the exact arm within rank tolerance" in {
    import org.apache.spark.sql.functions.{col, expr}
    // deterministic skewed scores with heavy ties (step function) — the shape
    // where a rank-tolerant percentile can legitimately sit a step away from
    // the exact limit-based threshold; 3000 docs ≤ the default accuracy, so
    // the sketch is rank-exact and only the definition offset can differ
    val scored = spark.range(3000).select(
      col("id").as("doc_id"),
      expr("id % 7 * 100 + id div 30").as("avg_millinats"))
    val (e1, e2) = QualityModels.tertileThresholds(scored, "doc_id")
    val (a1, a2) = QualityModels.tertileThresholdsApprox(scored)
    a1 should be <= a2
    val exact = QualityModels.lmBuckets(scored, e1, e2)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val approx = QualityModels.lmBuckets(scored, a1, a2)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    val disagree = exact.count { case (id, b) => approx(id) != b }
    // boundary-rank drift only: at most 1% of docs may change bucket
    disagree.toDouble / exact.size should be <= 0.01
  }

  private def labeled = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog sat on the rug"),
    (3L, "en", "the cat and the dog"),
    (4L, "fr", "le chat et le chien"),
    (5L, "fr", "le chien dort sur le tapis"),
    (6L, "fr", "le chat dort")
  ).toDF("doc_id", "lang", "text")

  "nbTrain/nbClassify" should "recover the training labels on separable text" in {
    val m = QualityModels.nbTrain(labeled, "lang", "text")
    m.labels shouldBe Seq("en", "fr")
    // balanced priors: ln(1/2) milli-nats each
    m.priors("en") shouldBe math.round(1000.0 * math.log(0.5))
    val out = QualityModels.nbClassify(labeled, "doc_id", "text", m)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    out shouldBe Map(1L -> "en", 2L -> "en", 3L -> "en", 4L -> "fr", 5L -> "fr", 6L -> "fr")
  }

  it should "classify unseen and all-OOV docs deterministically" in {
    val m = QualityModels.nbTrain(labeled, "lang", "text")
    val probes = Seq(
      (10L, "?", "le chat sat"),            // mixed evidence
      (11L, "?", "zz qq totally unseen")    // all-OOV -> prior-only argmax
    ).toDF("doc_id", "lang", "text")
    val out = QualityModels.nbClassify(probes, "doc_id", "text", m)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    // equal priors: the all-OOV tie breaks to the smaller label
    out(11L) shouldBe "en"
    // and runs are identical
    val again = QualityModels.nbClassify(probes, "doc_id", "text", m)
      .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
    again shouldBe out
  }
}
