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
    val afterB1 = spark.table("stream_cap").as[(String, String)].collect().toSet
    afterB1.count(_._2 == "d0") shouldBe 2
    afterB1.count(_._2 == "d1") shouldBe 3

    // batch 2: d0 gets 3 more candidates but only 1 budget slot remains;
    // d1 is exhausted — nothing admitted no matter how well they hash
    source.addData(
      CurDoc(3, "d0"), CurDoc(4, "d0"), CurDoc(5, "d0"),
      CurDoc(14, "d1"), CurDoc(15, "d1"))
    q.processAllAvailable()
    q.stop()
    val afterB2 = spark.table("stream_cap").as[(String, String)].collect().toSet
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

    // latest row per user (update semantics); the stream keys on the id's
    // string form so any id type flows through — compare on that form
    val latest = spark.table("stream_funnel").as[(String, Int)].collect()
      .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).max }
    val batch = graft.operators.EventAnalytics.funnelSteps(
        all.toDF(), "user_id", "event_type", "ts", steps)
      .as[(Long, Int)].collect().map { case (u, n) => u.toString -> n }.toMap
    latest shouldBe batch
    // and user 1's progress was emitted incrementally: step 2 in batch 1
    // (view+click arrived), step 3 after the buy in batch 2
    val u1 = spark.table("stream_funnel").as[(String, Int)].collect()
      .filter(_._1 == "1").map(_._2).sorted
    u1 shouldBe Array(2, 3)
  }

  "windowedFunnelStepsStream" should "equal the batch windowed funnel under ordered delivery" in {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    val steps = Seq("view", "click", "buy")
    val w5min = 5L * 60 * 1000000
    val all = Seq(
      // user 1: the re-anchoring shape — the first view expires, the later
      // one completes; the expiry happens ACROSS the micro-batch split
      CurEv(1, "view", t(0)), CurEv(1, "click", t(2)),
      CurEv(1, "view", t(10)), CurEv(1, "click", t(12)), CurEv(1, "buy", t(14)),
      // user 2: chain spans the batch split and stays inside the window
      CurEv(2, "view", t(20)), CurEv(2, "click", t(21)), CurEv(2, "buy", t(23)),
      // user 3: full sequence but too slow for the window — stalls at 2
      CurEv(3, "view", t(0)), CurEv(3, "click", t(2)), CurEv(3, "buy", t(30)))

    val source = MemoryStream[CurEv](spark)
    val q = StreamingCuration.windowedFunnelStepsStream(
        source.toDF(), "user_id", "event_type", "ts", steps, w5min)
      .writeStream.format("memory").queryName("stream_wfunnel")
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
    // ordered delivery split mid-funnel: user 1's second view and user 2's
    // click/buy land in batch 2, so their frontiers must survive in state
    val (b1, b2) = all.sortBy(_.ts.getTime).splitAt(5)
    source.addData(b1: _*); q.processAllAvailable()
    source.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val latest = spark.table("stream_wfunnel").as[(String, Int)].collect()
      .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).max }
    val batch = graft.operators.EventAnalytics.windowedFunnelSteps(
        all.toDF(), "user_id", "event_type", "ts", steps, w5min)
      .as[(Long, Int)].collect().map { case (u, n) => u.toString -> n }.toMap
    latest shouldBe batch
    latest shouldBe Map("1" -> 3, "2" -> 3, "3" -> 2)
  }

  it should "only under-count on late delivery, never over-count" in {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    val steps = Seq("view", "click", "buy")
    val w5min = 5L * 60 * 1000000
    // the view is delivered AFTER the click/buy it should precede: the
    // stream cannot retro-link the already-folded click(1)/buy(3) onto
    // view(0), so it under-counts (a valid lower bound) — it must NOT
    // fabricate the chain
    val early = Seq(CurEv(1, "click", t(1)), CurEv(1, "buy", t(3)))
    val late = Seq(CurEv(1, "view", t(0)))

    val source = MemoryStream[CurEv](spark)
    val q = StreamingCuration.windowedFunnelStepsStream(
        source.toDF(), "user_id", "event_type", "ts", steps, w5min)
      .writeStream.format("memory").queryName("stream_wfunnel_late")
      .outputMode("update").trigger(Trigger.ProcessingTime(0)).start()
    source.addData(early: _*); q.processAllAvailable()
    source.addData(late: _*); q.processAllAvailable()

    def emittedMax() = spark.table("stream_wfunnel_late")
      .as[(String, Int)].collect().map(_._2).maxOption.getOrElse(0)
    val batchOverDelivered = graft.operators.EventAnalytics.windowedFunnelSteps(
        (early ++ late).toDF(), "user_id", "event_type", "ts", steps, w5min)
      .as[(Long, Int)].collect().head._2
    batchOverDelivered shouldBe 3 // the retro-linked chain view(0)→click(1)→buy(3)
    emittedMax() shouldBe 1       // the stream saw only the late view anchor: under-count

    // the late view DID enter the carried frontier: a genuinely-ordered
    // suffix extends it into a REAL chain view(0)→click(2)→buy(4)
    source.addData(CurEv(1, "click", t(2)), CurEv(1, "buy", t(4)))
    q.processAllAvailable()
    q.stop()
    emittedMax() shouldBe 3
  }

  it should "carry frontiers across a query RESTART (real state-store round trip)" in {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    val steps = Seq("view", "click", "buy")
    val w5min = 5L * 60 * 1000000
    val ckpt = java.nio.file.Files.createTempDirectory("graft-wf-ckpt-").toString
    val source = MemoryStream[CurEv](spark)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int)]()
    def start() = StreamingCuration.windowedFunnelStepsStream(
        source.toDF(), "user_id", "event_type", "ts", steps, w5min)
      .writeStream
      .option("checkpointLocation", ckpt) // memory sink can't recover; foreachBatch can
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[FunnelProgress], _: Long) =>
        batch.collect().foreach(p => emitted.add((p.user_id, p.steps_completed)))
      }
      .start()
    // the WfState encoder must survive the checkpointed state store, not
    // just consecutive micro-batches of one query: stop mid-chain, restart,
    // and the carried frontier must complete the funnel
    val q1 = start()
    source.addData(CurEv(1, "view", t(0)), CurEv(1, "click", t(2)))
    q1.processAllAvailable(); q1.stop()
    val q2 = start()
    source.addData(CurEv(1, "buy", t(4)))
    q2.processAllAvailable(); q2.stop()
    import scala.jdk.CollectionConverters._
    emitted.asScala.map(_._2).max shouldBe 3
  }

  "retentionCohortsStream" should "reproduce the batch cohort table over ordered batches" in {
    import java.sql.Timestamp
    def week(w: Int, dow: Int) = Timestamp.valueOf(f"2024-01-${1 + w * 7 + dow}%02d 12:00:00")
    val all = Seq(
      (1L, week(0, 0)), (1L, week(0, 3)), (1L, week(2, 1)), // cohort w0, active 0 and 2
      (2L, week(0, 5)),                                     // cohort w0, active 0
      (3L, week(1, 0)), (3L, week(2, 2)))                   // cohort w1, offsets 0 and 1
    val source = MemoryStream[(Long, Timestamp)](spark)
    val q = StreamingCuration.retentionCohortsStream(
        source.toDF().toDF("user_id", "ts"), "user_id", "ts")
      .writeStream.format("memory").queryName("stream_retention")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // ordered delivery, split so user 1 and 3 span batches
    val sorted = all.sortBy(_._2.getTime)
    val (b1, b2) = sorted.splitAt(3)
    source.addData(b1: _*); q.processAllAvailable()
    source.addData(b2: _*); q.processAllAvailable()
    // redelivery of an already-emitted week must NOT re-emit (bitmap law)
    source.addData(sorted.head); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_retention")
      .groupBy("cohort_week", "week_offset")
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n_users"))
      .as[(java.sql.Date, Int, Long)].collect()
      .map { case (c, o, n) => (c.toString, o) -> n }.toMap
    val batch = graft.operators.EventAnalytics.retentionCohorts(
        all.toDF("user_id", "ts"), "user_id", "ts")
      .as[(java.sql.Date, Int, Long)].collect()
      .map { case (c, o, n) => (c.toString, o) -> n }.toMap
    streamed shouldBe batch
    // first-time-only emission means a plain count agrees too
    spark.table("stream_retention").count() shouldBe batch.values.sum
  }

  it should "stay exact under late first events via cohort-correction rows" in {
    import java.sql.Timestamp
    def week(w: Int, dow: Int) = Timestamp.valueOf(f"2024-01-${1 + w * 7 + dow}%02d 12:00:00")
    // user 1's FIRST event (week 0) is delivered after two later weeks: the
    // provisional cohort w1 must be retracted cell-by-cell and re-added
    // shifted under w0. user 2 is the ordered control.
    val all = Seq(
      (1L, week(0, 2)), (1L, week(1, 0)), (1L, week(3, 4)),
      (2L, week(1, 1)), (2L, week(2, 1)))
    val delivery1 = Seq(all(1), all(2), all(3)) // user 1 w1+w3 (cohort w1), user 2 w1
    val delivery2 = Seq(all(0), all(4))         // user 1's TRUE first event arrives late

    val source = MemoryStream[(Long, Timestamp)](spark)
    val q = StreamingCuration.retentionCohortsStream(
        source.toDF().toDF("user_id", "ts"), "user_id", "ts")
      .writeStream.format("memory").queryName("stream_retention_late")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    source.addData(delivery1: _*); q.processAllAvailable()
    source.addData(delivery2: _*); q.processAllAvailable()
    q.stop()

    val rows = spark.table("stream_retention_late")
    // corrections really fired: the provisional (w1-cohort) cells retracted
    rows.filter("sign = -1").count() shouldBe 2L
    // changelog law: sum(sign) per cell IS the batch table, late data and all
    val streamed = rows.groupBy("cohort_week", "week_offset")
      .agg(org.apache.spark.sql.functions.sum("sign").as("n_users"))
      .filter("n_users > 0")
      .as[(java.sql.Date, Int, Long)].collect()
      .map { case (c, o, n) => (c.toString, o) -> n }.toMap
    val batch = graft.operators.EventAnalytics.retentionCohorts(
        all.toDF("user_id", "ts"), "user_id", "ts")
      .as[(java.sql.Date, Int, Long)].collect()
      .map { case (c, o, n) => (c.toString, o) -> n }.toMap
    streamed shouldBe batch
    // and every retraction nets to zero — no phantom cells survive
    rows.groupBy("user_id", "cohort_week", "week_offset")
      .agg(org.apache.spark.sql.functions.sum("sign").as("net"))
      .filter("net < 0 or net > 1").count() shouldBe 0L
  }

  it should "degenerate to the batch operator's exact selection on a batch frame" in {
    val docs = (0L until 40L).map(i => (i, s"g${i % 3}")).toDF("doc_id", "grp")
    val streamOp = StreamingCuration.capPerGroupStream(docs, "grp", "doc_id", cap = 4)
      .collect().map(a => (a.id, a.group)).toSet
    val batchOp = CorpusTools.capPerGroup(docs, "grp", "doc_id", cap = 4)
      .select("doc_id", "grp").as[(Long, String)].collect()
      .map { case (id, g) => (id.toString, g) }.toSet
    streamOp shouldBe batchOp
  }

  "scd2Stream" should "equal the batch SCD2 build under ordered delivery split mid-history" in {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    val all = Seq(
      CurEv(1, "bronze", t(1)), CurEv(1, "bronze", t(2)), CurEv(1, "gold", t(5)),
      CurEv(1, "gold", t(8)), CurEv(1, "silver", t(12)),
      CurEv(2, "gold", t(3)), CurEv(2, "gold", t(9)))

    val source = MemoryStream[CurEv](spark)
    val q = StreamingCuration.scd2Stream(
        source.toDF(), Seq("user_id"), Seq("event_type"), "ts")
      .writeStream.format("memory").queryName("stream_scd2")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    // split lands user 1's unchanged gold@8 and the silver change in batch
    // 2 — the watermark and current-attrs state must both survive
    val (b1, b2) = all.sortBy(_.ts.getTime).splitAt(4)
    source.addData(b1: _*); q.processAllAvailable()
    source.addData(b2: _*); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_scd2").as[Scd2Change].collect()
      .map(c => (c.key_json, c.effective_from_micros, c.attrs_json)).toSet
    val batch = graft.operators.Scd2.buildScd2(
        all.toDF(), Seq("user_id"), Seq("event_type"), "ts")
      .select(
        org.apache.spark.sql.functions.to_json(
          org.apache.spark.sql.functions.struct($"user_id")).as("k"),
        org.apache.spark.sql.functions.unix_micros($"effective_from").as("f"),
        org.apache.spark.sql.functions.to_json(
          org.apache.spark.sql.functions.struct($"event_type")).as("a"))
      .as[(String, Long, String)].collect().toSet
    streamed shouldBe batch
    streamed.size shouldBe 4 // bronze@1, gold@5, silver@12, u2 gold@3
  }

  it should "carry the (attrs, watermark) state across a query RESTART (real state-store round trip)" in {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-scd2-ckpt-").toString
    val source = MemoryStream[CurEv](spark)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    def start() = StreamingCuration.scd2Stream(
        source.toDF(), Seq("user_id"), Seq("event_type"), "ts")
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Scd2Change], _: Long) =>
        batch.collect().foreach(c => emitted.add((c.effective_from_micros, c.attrs_json)))
      }
      .start()
    // the Scd2StState encoder must survive the checkpointed state store:
    // an unchanged observation after restart must emit NOTHING (current
    // attrs carried), and a late row must still be watermark-skipped
    val q1 = start()
    source.addData(CurEv(1, "gold", t(1)), CurEv(1, "gold", t(5)))
    q1.processAllAvailable(); q1.stop()
    val q2 = start()
    source.addData(CurEv(1, "gold", t(7)))   // unchanged: no emission
    q2.processAllAvailable()
    source.addData(CurEv(1, "silver", t(3))) // below watermark 7: skipped
    q2.processAllAvailable()
    source.addData(CurEv(1, "silver", t(9))) // real change
    q2.processAllAvailable(); q2.stop()
    import scala.jdk.CollectionConverters._
    val changes = emitted.asScala.toList.sortBy(_._1)
      .map { case (m, a) => (m / 60000000 % 60, a) }
    changes shouldBe List(
      (1L, """{"event_type":"gold"}"""), (9L, """{"event_type":"silver"}"""))
  }

  it should "skip observations below the per-key watermark (late rows never corrupt the chain)" in {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    val source = MemoryStream[CurEv](spark)
    val q = StreamingCuration.scd2Stream(
        source.toDF(), Seq("user_id"), Seq("event_type"), "ts")
      .writeStream.format("memory").queryName("stream_scd2_late")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    source.addData(CurEv(1, "a", t(1)), CurEv(1, "a", t(5))); q.processAllAvailable()
    source.addData(CurEv(1, "b", t(3))); q.processAllAvailable() // late: below watermark 5
    source.addData(CurEv(1, "b", t(7))); q.processAllAvailable() // in order: real change
    q.stop()

    val rows = spark.table("stream_scd2_late").as[Scd2Change].collect()
      .map(c => (c.effective_from_micros / 60000000 % 60, c.attrs_json)).sorted
    // the late b@3 emitted nothing; the chain is a@1 -> b@7, exactly
    // buildScd2 over the observations with the late row dropped
    rows shouldBe Array((1L, """{"event_type":"a"}"""), (7L, """{"event_type":"b"}"""))
  }
}
