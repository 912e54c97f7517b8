package graft.streaming

import graft.TestSpark
import graft.operators.CorpusTools
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

case class CurDoc(doc_id: Long, domain: String)
case class CurEv(user_id: Long, event_type: String, ts: java.sql.Timestamp)

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

  "funnelStepsStream" should "equal the batch funnel under ordered delivery, emitting only advances" in {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    val steps = Seq("view", "click", "buy")
    val all = Seq(
      CurEv(1, "view", t(1)), CurEv(1, "click", t(2)), CurEv(1, "buy", t(3)), // full funnel
      CurEv(2, "click", t(1)), CurEv(2, "view", t(2)),                  // out of order: stops at 1
      CurEv(3, "view", t(1)), CurEv(3, "error", t(2)))                  // non-step noise

    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[CurEv](spark)
    val q = StreamingCuration.funnelStepsStream(
        source.toDF(), "user_id", "event_type", "ts", steps)
      .writeStream.format("memory").queryName("stream_funnel")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0)).start()
    // ordered delivery split across micro-batches MID-FUNNEL for user 1
    // (view+click in batch 1, buy in batch 2)
    source.addData(all.take(2): _*)
    q.processAllAvailable()
    source.addData(all.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    // latest row per user (update semantics)
    val latest = spark.table("stream_funnel").as[(Long, Int)].collect()
      .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).max }
    val batch = graft.operators.EventAnalytics.funnelSteps(
        all.toDF(), "user_id", "event_type", "ts", steps)
      .as[(Long, Int)].collect().toMap
    latest shouldBe batch
    // and user 1's progress was emitted incrementally: step 2 in batch 1
    // (view+click arrived), step 3 after the buy in batch 2
    val u1 = spark.table("stream_funnel").as[(Long, Int)].collect()
      .filter(_._1 == 1L).map(_._2).sorted
    u1 shouldBe Array(2, 3)
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
