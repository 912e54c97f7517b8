package graft.operators

import graft.TestSpark
import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * End-to-end curation pipeline: the published web-corpus recipe (clean →
 * language filter → exact dedup → near-dup dedup → span strip →
 * decontaminate → quality bucket → domain cap → split → pack) composed from
 * the library's operators over ONE synthetic corpus with planted artifacts
 * for every stage. Each operator is unit- and oracle-tested on its own;
 * this spec pins that they COMPOSE — schemas line up, row accounting is
 * exact at every stage, and the whole chain is deterministic end to end.
 */
class CurationPipelineSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 46 docs with planted work for each stage:
    *  - ids 0-19   clean English prose (unique), wrapped in HTML
    *  - ids 20-23  exact duplicates of doc 0's text
    *  - ids 24-27  near-duplicates of doc 1 (one word appended)
    *  - ids 28-31  share an 8-token span (span-strip targets)
    *  - ids 32-35  German (language-filtered)
    *  - ids 36-39  contain the benchmark item verbatim (decontaminated)
    *  - ids 40-45  noise gibberish (quality-bucketed to tail)
    * Sources rotate web/books/news so the domain cap and packing streams
    * have structure. */
  private def corpus: DataFrame = {
    // $i recurs every <= 5 tokens, so no 6-token window is shared between
    // two different prose docs — the span-strip stage must leave them alone
    def en(i: Long) =
      s"the quick brown fox $i number jumped over $i the lazy dog and $i it was good day $i for all of the $i animals in the field"
    val span = "shared span alpha beta gamma delta epsilon zeta"
    val bench = "benchmark question what is the capital of atlantis answer none"
    val rows: Seq[(Long, String)] =
      (0L to 19L).map(i => i -> s"<html><p>${en(i)}</p></html>") ++
        (20L to 23L).map(i => i -> s"<div>${en(0)}</div>") ++
        (24L to 27L).map(i => i -> s"<p>${en(1)} extra$i</p>") ++
        (28L to 31L).map(i => i -> s"<p>document $i begins $span and then document $i ends here now</p>") ++
        (32L to 35L).map(i => i -> s"<p>der hund und die katze mit dem ball $i im garten und das ist gut</p>") ++
        // frames are doc-specific enough (J < 0.7 pairwise) that 36-39 are
        // NOT near-dups of each other — only the decontamination stage,
        // which keys on benchmark containment, may cut them
        (36L to 39L).map(i =>
          i -> s"<p>frame$i one$i two$i the three$i four$i five$i six$i $bench seven$i eight$i nine$i ten$i</p>") ++
        (40L to 45L).map(i => i -> s"<p>the zx$i of qq$i vv$i it was ww$i kk$i</p>")
    rows.map { case (id, text) =>
      (id, text, Seq("web", "books", "news")(pos(id)), s"d${id % 5}")
    }.toDF("doc_id", "html", "source", "domain")
  }
  private def pos(id: Long): Int = (id % 3).toInt

  "the full curation recipe" should "compose with exact row accounting" in {
    val raw = corpus
    raw.count() shouldBe 46

    // 1. clean: strip markup, collapse whitespace
    val cleaned = raw.withColumn("text", TextFunctions.cleanText(col("html"))).drop("html")
    cleaned.filter(col("text").contains("<")).count() shouldBe 0

    // 2. language filter: langId == en drops the 4 German docs
    val english = cleaned.filter(TextFunctions.langId(col("text")) === "en")
    english.count() shouldBe 42

    // 3. exact dedup: the 4 copies of doc 0 collapse onto the canonical
    //    min-id (doc 0 itself survives)
    val afterExact = Dedup.exactDedup(english)
    afterExact.count() shouldBe 38
    afterExact.filter(col("doc_id") === 0).count() shouldBe 1
    afterExact.filter(col("doc_id").between(20, 23)).count() shouldBe 0

    // 4. near-dup dedup: docs 24-27 are one-word variants of doc 1; with
    //    doc 1 they form one cluster — only the canonical survives
    val nearPairs = Dedup.minhashNearDupPairs(afterExact, threshold = 0.7)
    val afterNear = Dedup.keepCanonical(afterExact, nearPairs)
    afterNear.filter(col("doc_id") === 1).count() shouldBe 1
    afterNear.filter(col("doc_id").between(24, 27)).count() shouldBe 0
    val nNear = afterNear.count()
    nNear shouldBe 34

    // 5. decontaminate BEFORE generic span dedup: docs 36-39 share the
    //    benchmark block, so a span-strip run first would cut the very
    //    shingles decontamination keys on and let the documents through —
    //    the reason real pipelines decontaminate early
    val bench = Seq((0L, "benchmark question what is the capital of atlantis answer none"))
      .toDF("doc_id", "text")
    val afterDecon = Dedup.removeContaminated(afterNear, bench, threshold = 0.8)
    afterDecon.count() shouldBe nNear - 4
    afterDecon.filter(col("doc_id").between(36, 39)).count() shouldBe 0

    // 6. span strip: the shared 8-token span vanishes from docs 28-31 but
    //    their unique frames survive; every OTHER doc is byte-identical
    val afterSpans = CorpusTools.stripRepeatedSpans(afterDecon, "doc_id", "text", n = 6)
    afterSpans.count() shouldBe nNear - 4
    val spanTexts = afterSpans.filter(col("doc_id").between(28, 31))
      .select("text").as[String].collect()
    // the covered run is "begins ... then document" (every 6-window inside
    // it repeats across 28-31); the doc-specific frame survives
    spanTexts.foreach(_ should not include "alpha beta gamma")
    spanTexts.foreach(_ should include("ends here now"))
    val untouched = afterDecon.filter(!col("doc_id").between(28, 31))
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    afterSpans.filter(!col("doc_id").between(28, 31))
      .select("doc_id", "text").as[(Long, String)].collect().toMap shouldBe untouched

    // 7. quality bucket: train the LM on the clean prose slice; the noise
    //    docs land in the tail bucket and are dropped
    val model = QualityModels.lmCostTable(afterSpans, "text", col("doc_id") <= 19)
    val scored = QualityModels.lmPerplexity(afterSpans, "doc_id", "text", model)
    val (t1, t2) = QualityModels.tertileThresholds(scored, "doc_id")
    val bucketed = QualityModels.lmBuckets(scored, t1, t2)
    val tails = bucketed.filter(col("bucket") === "tail")
      .select("doc_id").as[Long].collect().toSet
    (40L to 45L).foreach(id => tails should contain(id))
    val kept = afterSpans.join(
      bucketed.filter(col("bucket") =!= "tail").select("doc_id"), "doc_id")

    // 8. domain cap: at most 3 docs per planted domain, deterministic
    val capped = CorpusTools.capPerGroup(kept, "domain", "doc_id", cap = 3)
    capped.groupBy("domain").count().select("count").as[Long].collect()
      .foreach(_ should be <= 3L)

    // 9. split assignment: every surviving doc gets exactly one split
    val split = CorpusTools.splitAssign(capped, "doc_id", "pipe",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    split.count() shouldBe capped.count()
    split.select("split").distinct().as[String].collect().toSet subsetOf
      Set("train", "val", "test") shouldBe true

    // 10. pack the train split into 64-token bins per source stream; packing
    //     must account for every token of every packed doc
    val train = split.filter(col("split") === "train")
      .withColumn("n_tokens", TextFunctions.tokenCount(col("text")))
    val packed = CorpusTools.packSequences(train, "doc_id", "n_tokens",
      budget = 64, streamCols = Seq("source"))
    packed.count() shouldBe train.count()
    packed.agg(sum("n_tokens")).as[Long].head() shouldBe
      train.agg(sum("n_tokens")).as[Long].head()

    // end-to-end determinism: the whole chain replays identically
    val again = CorpusTools.capPerGroup(kept, "domain", "doc_id", cap = 3)
      .select("doc_id").as[Long].collect().sorted
    capped.select("doc_id").as[Long].collect().sorted shouldBe again
  }
}
