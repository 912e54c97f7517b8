package graft.operators

import graft.TestSpark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class TextSearchSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 6 docs, 5 tokens each (equal length isolates tf/idf effects from the
  // length normalization); "rare" appears in one doc, "common" in five
  private def corpus = Seq(
    (1L, "common alpha beta gamma delta"),
    (2L, "common common alpha beta gamma"),
    (3L, "common epsilon zeta eta theta"),
    (4L, "rare epsilon zeta eta theta"),
    (5L, "common iota kappa mu nu"),
    (6L, "common xi omicron pi rho")
  ).toDF("doc_id", "text")

  "bm25Stats" should "count docs, tokens, and per-term document frequency exactly" in {
    val st = TextSearch.bm25Stats(corpus, "doc_id", "text", Seq("common", "rare", "absent"))
    st.nDocs shouldBe 6L
    st.totalTokens shouldBe 30L
    st.avgdl shouldBe 5.0
    st.docFreq shouldBe Map("common" -> 5L, "rare" -> 1L, "absent" -> 0L)
  }

  "idfMicro" should "order terms by rarity, absent terms highest, all positive" in {
    val st = TextSearch.bm25Stats(corpus, "doc_id", "text", Seq("common", "rare", "absent"))
    val idf = TextSearch.idfMicro(st)
    idf("absent") should be > idf("rare")
    idf("rare") should be > idf("common")
    idf("common") should be > 0L // the +1 variant never goes negative
    // spot value: ln(1 + (6 - 1 + 0.5) / 1.5) = ln(4.666...) in micro-nats
    idf("rare") shouldBe math.floor(1e6 * math.log(1.0 + 5.5 / 1.5)).toLong
  }

  "bm25TopK" should "rank the rare-term doc first and repeat-tf above single-tf" in {
    val out = TextSearch.bm25TopK(corpus, "doc_id", "text", Seq("common", "rare"), k = 10)
      .as[(Long, Long, Long)].collect()
    out.map(_._1) should have length 6
    // doc 4 holds the only "rare" occurrence: idf dominates
    out.head._1 shouldBe 4L
    val score = out.map(r => r._1 -> r._2).toMap
    // doc 2 has tf=2 of "common" vs doc 1's tf=1, same length
    score(2L) should be > score(1L)
    // docs 1, 3, 5, 6 are identical wrt the query: exact ties, id order
    val tied = out.filter(r => Set(1L, 3L, 5L, 6L).contains(r._1))
    tied.map(_._2).toSet should have size 1
    tied.map(_._1) shouldBe Array(1L, 3L, 5L, 6L)
    // n_terms counts DISTINCT matched terms
    out.find(_._1 == 4L).get._3 shouldBe 1L
    out.find(_._1 == 2L).get._3 shouldBe 1L
  }

  it should "respect k, skip docs with no query term, and be deterministic" in {
    val top2 = TextSearch.bm25TopK(corpus, "doc_id", "text", Seq("common", "rare"), k = 2)
      .as[(Long, Long, Long)].collect()
    top2 should have length 2
    top2.map(_._1) shouldBe Array(4L, 2L)

    // a query matching nothing returns no rows (not zero-score rows)
    TextSearch.bm25TopK(corpus, "doc_id", "text", Seq("absent"), k = 5).count() shouldBe 0L

    val a = TextSearch.bm25TopK(corpus, "doc_id", "text", Seq("common", "rare"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    val b = TextSearch.bm25TopK(corpus, "doc_id", "text", Seq("common", "rare"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    a shouldBe b
  }

  it should "normalize by document length: same tf, longer doc scores lower" in {
    val docs = Seq(
      (1L, "term alpha beta"),
      (2L, "term alpha beta gamma delta epsilon zeta eta theta iota")
    ).toDF("doc_id", "text")
    val score = TextSearch.bm25TopK(docs, "doc_id", "text", Seq("term"), k = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    score(1L) should be > score(2L)
  }

  it should "be invariant under arbitrary repartitioning (order-free integer sums)" in {
    val base = TextSearch.bm25TopK(corpus, "doc_id", "text", Seq("common", "rare"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    Seq(1, 3, 7).foreach { n =>
      val re = TextSearch.bm25TopK(corpus.repartition(n), "doc_id", "text",
          Seq("common", "rare"), k = 10)
        .as[(Long, Long, Long)].collect().toSeq
      re shouldBe base
    }
  }

  "rrfFuse" should "compute the exact integer RRF sum over both lists" in {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val out = TextSearch.rrfFuse(a, b, "id", k = 10, rrfK = 60)
      .as[(Long, Option[Long], Option[Long], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    def c(r: Int) = 1000000L / (60 + r)
    // doc 20 is in both lists: contributions add
    out(20L) shouldBe ((Some(2L), Some(1L), c(2) + c(1)))
    out(10L) shouldBe ((Some(1L), None, c(1)))
    out(40L) shouldBe ((None, Some(2L), c(2)))
    out(30L) shouldBe ((Some(3L), None, c(3)))
    // both-lists membership outranks a single first place here
    val ordered = TextSearch.rrfFuse(a, b, "id", k = 10, rrfK = 60)
      .as[(Long, Option[Long], Option[Long], Long)].collect().map(_._1)
    ordered.head shouldBe 20L
  }

  it should "cap output at k with deterministic id tiebreaks" in {
    // two docs with identical single-list rank sum tie; ids break it
    val a = Seq((5L, 1), (9L, 2)).toDF("id", "rank")
    val b = Seq((7L, 1), (3L, 2)).toDF("id", "rank")
    val out = TextSearch.rrfFuse(a, b, "id", k = 3, rrfK = 60)
      .as[(Long, Option[Long], Option[Long], Long)].collect()
    out should have length 3
    // ranks 1: docs 5 and 7 tie -> id order; then rank-2 docs 3 and 9 tie
    out.map(_._1) shouldBe Array(5L, 7L, 3L)
  }
}
