package graft.streaming

import graft.TestSpark
import graft.operators.CorpusTools
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

case class CurDoc(doc_id: Long, domain: String)

class StreamingCurationSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  "capPerGroupStream" should "admit at most cap per group across micro-batches, first delivery wins" in {
    val source = MemoryStream[CurDoc](spark)
    val admitted = StreamingCuration.capPerGroupStream(
      source.toDF(), "domain", "doc_id", cap = 3, seed = "s")
    val q = admitted.writeStream.format("memory").queryName("stream_cap")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    // batch 1: 2 docs for d0 (both admitted — under budget), 4 for d1
    // (md5-best 3 admitted)
    source.addData(
      CurDoc(1, "d0"), CurDoc(2, "d0"),
      CurDoc(10, "d1"), CurDoc(11, "d1"), CurDoc(12, "d1"), CurDoc(13, "d1"))
    q.processAllAvailable()
    val afterB1 = spark.table("stream_cap").as[(Long, String)].collect().toSet
    afterB1.count(_._2 == "d0") shouldBe 2
    afterB1.count(_._2 == "d1") shouldBe 3

    // batch 2: d0 gets 3 more candidates but only 1 budget slot remains;
    // d1 is exhausted — nothing admitted no matter how well they hash
    source.addData(
      CurDoc(3, "d0"), CurDoc(4, "d0"), CurDoc(5, "d0"),
      CurDoc(14, "d1"), CurDoc(15, "d1"))
    q.processAllAvailable()
    q.stop()
    val afterB2 = spark.table("stream_cap").as[(Long, String)].collect().toSet
    afterB2.count(_._2 == "d0") shouldBe 3
    afterB2.count(_._2 == "d1") shouldBe 3
    // batch-1 admissions were never revoked
    afterB1.subsetOf(afterB2) shouldBe true
    // the batch-2 d0 slot went to the md5-best of batch 2's candidates ONLY
    val batch2d0 = (afterB2 -- afterB1).collect { case (id, "d0") => id }
    batch2d0 should have size 1
  }

  it should "degenerate to the batch operator's exact selection on a batch frame" in {
    val docs = (0L until 40L).map(i => (i, s"g${i % 3}")).toDF("doc_id", "grp")
    val streamOp = StreamingCuration.capPerGroupStream(docs, "grp", "doc_id", cap = 4)
      .collect().map(a => (a.id, a.group)).toSet
    val batchOp = CorpusTools.capPerGroup(docs, "grp", "doc_id", cap = 4)
      .select("doc_id", "grp").as[(Long, String)].collect().toSet
    streamOp shouldBe batchOp
  }
}
