package graft.streaming

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.nio.file.Files

class EventStreamsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Stage the sf0.001 events (ts normalized to microseconds) as a parquet
    * dir a file-source stream can consume. */
  lazy val stagedDir: String = {
    val dir = Files.createTempDirectory("graft-stream-in-").toString
    graft.Tables.events(spark, "/root/testdata/sf0.001").write.mode("overwrite").parquet(dir)
    dir
  }
  lazy val staged = spark.read.parquet(stagedDir)

  "windowedCounts" should "match the equivalent batch aggregation" in {
    val stream = EventStreams.readEventStream(spark, stagedDir, staged.schema)
    val q = EventStreams.windowedCounts(stream, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("win_counts")
      .select("window_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val expected = staged
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("event_type"), col("n"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    // append-mode emits only windows the final watermark passed; all emitted
    // rows must agree with batch, and most windows should be emitted
    got.subsetOf(expected) shouldBe true
    assert(got.size >= (expected.size * 0.9).toInt, s"${got.size}/${expected.size} windows emitted")
  }

  "sessionWindowCounts" should "produce per-user gap sessions consistent with totals" in {
    val stream = EventStreams.readEventStream(spark, stagedDir, staged.schema)
    val q = EventStreams.sessionWindowCounts(stream, "30 minutes", "10 minutes")
      .writeStream.format("memory").queryName("sess_win")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val sessions = spark.table("sess_win")
    sessions.count() should be > 0L
    // no session may contain more events than its user has in total
    val perUser = staged.groupBy("user_id").count()
    val joined = sessions.groupBy("user_id").agg(sum("n_events").as("emitted"))
      .join(perUser, "user_id")
      .filter(col("emitted") > col("count"))
    joined.count() shouldBe 0L
  }

  "sessionize (flatMapGroupsWithState)" should "close sessions on gaps and preserve event counts" in {
    val stream = EventStreams.readEventStream(spark, stagedDir, staged.schema)
    val q = EventStreams.sessionize(stream, gapMillis = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val sessions = spark.table("sessions").as[UserSession].collect()
    sessions.length should be > 0
    sessions.foreach { s =>
      s.session_end.getTime should be >= s.session_start.getTime
      s.n_events should be > 0L
    }
    // closed sessions never over-count a user's events
    val total = staged.groupBy("user_id").count().as[(Long, Long)].collect().toMap
    sessions.groupBy(_.user_id).foreach { case (u, ss) =>
      ss.map(_.n_events).sum should be <= total(u)
    }
  }

  "writeVersioned with an all-filtered stream" should "skip empty micro-batches instead of failing" in {
    val root = Files.createTempDirectory("graft-empty-batch-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("stream", "empty"),
      root.resolve("data").toUri, PartitionSchema("event_date"), FileFormat.Parquet)
    engine.initTable(table, UserId("s"), "init")
    val stream = EventStreams.readEventStream(spark, stagedDir, staged.schema)
      .filter(col("event_type") === "no_such_type")
      .withColumn("event_date", to_date(col("ts")))
    val q = EventStreams.writeVersioned(stream, engine, table, UserId("s"),
      root.resolve("chk").toString)
    q.processAllAvailable(); q.stop() // must not throw
    engine.log(table.name).map(_.message) shouldBe List("init")
    engine.read(table).count() shouldBe 0
  }

  "writeVersioned(exactlyOnce)" should "skip replayed batches via the commit-log ledger" in {
    val root = Files.createTempDirectory("graft-stream-once-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("stream", "once"),
      root.resolve("once").toUri, PartitionSchema("event_date"), FileFormat.Parquet)
    engine.initTable(table, UserId("s"), "init")
    val stream = EventStreams.readEventStream(spark, stagedDir, staged.schema)
      .withColumn("event_date", to_date(col("ts")))
    def run(chk: String, app: Option[String]): Unit = {
      val q = EventStreams.writeVersioned(stream, engine, table, UserId("s"),
        root.resolve(chk).toString, exactlyOnce = true, appId = app)
      q.processAllAvailable(); q.stop()
    }
    run("chk1", Some("ingest-a"))
    val log1 = engine.log(table.name)
    log1.head.message should include("[graft-delivery ingest-a#")
    // a FULL replay (fresh checkpoint, SAME appId — the crash-recovery
    // shape) re-offers every batch; the ledger skips them all: zero new
    // commits, zero rewritten partitions
    run("chk2", Some("ingest-a"))
    engine.log(table.name) shouldBe log1
    // a DIFFERENT appId (a genuinely new pipeline) delivers normally
    run("chk3", Some("ingest-b"))
    engine.log(table.name).size should be > log1.size
  }

  "intervalJoin" should "match a batch interval join on the same data" in {
    val signups = EventStreams.readEventStream(spark, stagedDir, staged.schema)
      .filter(col("event_type") === "signup")
    val purchases = EventStreams.readEventStream(spark, stagedDir, staged.schema)
      .filter(col("event_type") === "purchase")
    val q = EventStreams.intervalJoin(signups, purchases, "user_id", "2 hours", "10 minutes")
      .select(col("event_id"), col("event_id_r"))
      .writeStream.format("memory").queryName("ij_out")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.processAllAvailable(); q.stop()

    val got = spark.table("ij_out").as[(Long, Long)].collect().toSet
    val s = staged.filter(col("event_type") === "signup").select(col("event_id"), col("user_id"), col("ts"))
    val p = staged.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("puid"), col("ts").as("pts"))
    val expected = s.join(p, col("user_id") === col("puid") &&
        col("pts") >= col("ts") && col("pts") <= col("ts") + expr("interval '2 hours'"))
      .select(col("event_id"), col("pid")).as[(Long, Long)].collect().toSet
    got shouldBe expected
    got.size should be > 0
  }

  "streamingDedup" should "drop duplicate keys within the watermark" in {
    // duplicate every event, stream through dedup on event_id
    val dupDir = Files.createTempDirectory("graft-stream-dup-").toString
    staged.union(staged).write.mode("overwrite").parquet(dupDir)
    val stream = EventStreams.readEventStream(spark, dupDir, staged.schema)
    val q = EventStreams.streamingDedup(stream, Seq("event_id"), "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.processAllAvailable(); q.stop()
    spark.table("dedup_out").count() shouldBe staged.count()
    spark.table("dedup_out").select("event_id").distinct().count() shouldBe staged.count()
  }

  "writeVersioned" should "commit one table version per micro-batch with time travel" in {
    val root = Files.createTempDirectory("graft-stream-sink-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("stream", "events"),
      root.resolve("events").toUri, PartitionSchema("event_date"), FileFormat.Parquet)
    engine.initTable(table, UserId("stream"), "init")

    val stream = EventStreams.readEventStream(spark, stagedDir, staged.schema)
      .withColumn("event_date", to_date(col("ts")))
    val q = EventStreams.writeVersioned(stream, engine, table, UserId("stream"),
      root.resolve("chk").toString)
    q.processAllAvailable(); q.stop()

    val log = engine.log(table.name)
    log.size should be >= 2 // init + at least one batch commit
    log.head.message should startWith("stream batch")
    engine.read(table).count() shouldBe staged.count()
    // time travel to before the stream: empty table
    engine.readAt(table, log.last.id).count() shouldBe 0L
  }
}
