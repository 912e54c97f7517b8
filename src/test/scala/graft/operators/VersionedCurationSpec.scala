package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * The two halves of the library composed: a CURATED corpus as a VERSIONED
 * table — every curation stage lands as a commit, tags pin dataset
 * releases, deliveries append as batch partitions, CDC reads exactly the
 * delta, and vacuum reclaims history WITHOUT ever breaking a tagged
 * release. Each piece is contract-tested on its own; this pins the
 * composition a training-data platform actually runs: "model X trained on
 * tag curated-v1, reproduce its exact corpus forever".
 */
class VersionedCurationSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  "a versioned curation pipeline" should "tag releases, append deliveries, CDC the delta, survive vacuum" in {
    val root = java.nio.file.Files.createTempDirectory("graft-vcur-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("curation", "corpus"),
      root.resolve("corpus").toUri, PartitionSchema("batch"), FileFormat.Parquet)
    engine.initTable(table, UserId("curator"), "init")

    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), col("source"))

    // --- release v1: curate batch b0 (exact dedup + per-source cap) ---
    val batch0 = docs.filter(col("doc_id") < 120)
    val curated0 = CorpusTools.capPerGroup(
        Dedup.exactDedup(batch0), "source", "doc_id", cap = 20)
      .withColumn("batch", lit("b0"))
    curated0.versionedReplaceAll(engine, table, UserId("curator"), "curated release v1")
    val c1 = engine.tracker.currentRef(table.name)
    engine.tracker.createTag(table.name, "curated-v1", c1)
    val v1Ids = engine.read(table).select("doc_id").as[Long].collect().toSet

    // --- delivery: new docs plus re-delivered duplicates of batch 0 text;
    // only the novel slice may land ---
    val delivery = docs.filter(col("doc_id") >= 120 && col("doc_id") < 150)
      .unionByName(batch0.limit(5)) // exact re-deliveries
    val existing = engine.read(table).select(col("text"))
    val novel = Dedup.exactDedup(delivery)
      .join(existing, Seq("text"), "left_anti")
      .withColumn("batch", lit("b1"))
    val novelIds = novel.select("doc_id").as[Long].collect().toSet
    novelIds.intersect(v1Ids) shouldBe empty
    novel.versionedInsertInto(engine, table, UserId("curator"), "delivery b1")
    val c2 = engine.tracker.currentRef(table.name)
    engine.tracker.createTag(table.name, "curated-v2", c2)

    // the tagged v1 release is byte-stable AFTER v2 landed
    engine.readAtTag(table, "curated-v1")
      .select("doc_id").as[Long].collect().toSet shouldBe v1Ids
    // the head is exactly v1 + the novel delivery
    engine.read(table)
      .select("doc_id").as[Long].collect().toSet shouldBe (v1Ids ++ novelIds)
    // CDC between the releases reads EXACTLY the delta (the b1 partition)
    engine.readChangesBetween(table, c1, c2)
      .select("doc_id").as[Long].collect().toSet shouldBe novelIds

    // --- an untagged maintenance rewrite, then vacuum: reclaim must spare
    // every tagged release even though keepLast=1 would expire them ---
    engine.read(table).withColumn("batch", lit("compacted"))
      .versionedReplaceAll(engine, table, UserId("curator"), "compact rewrite")
    val result = engine.vacuum(table, keepLast = 1, dryRun = false)
    result.failed shouldBe empty
    engine.readAtTag(table, "curated-v1")
      .select("doc_id").as[Long].collect().toSet shouldBe v1Ids
    engine.readAtTag(table, "curated-v2")
      .select("doc_id").as[Long].collect().toSet shouldBe (v1Ids ++ novelIds)
    // and the head survived its own rewrite
    engine.read(table)
      .select("doc_id").as[Long].collect().toSet shouldBe (v1Ids ++ novelIds)
  }

  "a versioned funnel state table" should "answer 'the funnel as of commit X' via time travel" in {
    // the commit-driven incremental pair's headline: the per-user state is
    // a plain DataFrame, so each advance lands as a snapshot commit and
    // readAt rebuilds ANY historical funnel without event history
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 09:$m%02d:00")
    val steps = Seq("view", "click", "buy")
    val w5min = 5L * 60 * 1000000
    val root = java.nio.file.Files.createTempDirectory("graft-vfunnel-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("analytics", "funnel_state"),
      root.resolve("funnel_state").toUri, PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("analytics"), "init")

    // delivery 1: user 1 mid-chain, user 2 complete
    val d1 = Seq(
      (1L, "view", t(0)), (1L, "click", t(2)),
      (2L, "view", t(1)), (2L, "click", t(3)), (2L, "buy", t(4))
    ).toDF("user_id", "event_type", "ts")
    val s1 = EventAnalytics.advanceWindowedFunnelState(
      EventAnalytics.emptyWindowedFunnelState(spark), d1,
      "user_id", "event_type", "ts", steps, w5min)
    s1.versionedReplaceAll(engine, table, UserId("analytics"), "delivery d1")
    val c1 = engine.tracker.currentRef(table.name)

    // delivery 2: user 1 completes within the window
    val d2 = Seq((1L, "buy", t(4))).toDF("user_id", "event_type", "ts")
    EventAnalytics.advanceWindowedFunnelState(engine.read(table), d2,
        "user_id", "event_type", "ts", steps, w5min)
      .versionedReplaceAll(engine, table, UserId("analytics"), "delivery d2")

    def achieved(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "achieved").as[(String, Int)].collect().toMap
    // head: both users converted
    achieved(engine.read(table)) shouldBe Map("1" -> 3, "2" -> 3)
    // as of c1: user 1 was still mid-chain — no event replay needed
    achieved(engine.readAt(table, c1)) shouldBe Map("1" -> 2, "2" -> 3)
    // the dashboard table reads straight off either state version
    EventAnalytics.funnelConversionFromState(engine.readAt(table, c1))
      .as[(Int, Long)].collect().toMap shouldBe Map(2 -> 2L, 3 -> 1L)
    EventAnalytics.funnelConversionFromState(engine.read(table))
      .as[(Int, Long)].collect().toMap shouldBe Map(3 -> 2L)
  }
}
