package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._

import java.io.File
import java.nio.file.Files
import java.sql.{Date, Timestamp}
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

case class User(id: String, name: String, email: String)
case class Pageview(id: String, path: String, timestamp: Timestamp, date: Date)
case class AdImpression(user_id: String, ad_id: String, timestamp: Timestamp,
    impression_date: Date, processed_date: Date)

/** End-to-end acceptance specs translated from the reference's three scenario
  * specs (SnapshotTableSpec, DatePartitionedTableSpec, MultiPartitionTableSpec)
  * — asserting BOTH query-visible results and on-disk `_version=` layout. */
class VersionedTablesSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  def newEngine(): (VersionedTables, File) = {
    val dir = Files.createTempDirectory("graft-accept-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    (engine, dir)
  }

  def versionDirs(dir: File): List[String] = {
    val fs = Option(dir.listFiles()).getOrElse(Array.empty)
    fs.filter(_.isDirectory).map(_.getName).filter(_.startsWith("_version=")).toList.sorted
  }

  behavior of "snapshot tables (reference SnapshotTableSpec)"

  it should "version whole-table writes and support rollback/forward" in {
    val (engine, dir) = newEngine()
    val loc = new File(dir, "users")
    val table = TableDefinition(TableName("test", "users"), loc.toURI, PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("alice"), "init")

    engine.read(table).count() shouldBe 0

    val day1 = Seq(User("user-1", "Alice", "alice@mail.com"),
      User("user-2", "Bob", "bob@mail.com"), User("user-3", "Carol", "carol@mail.com"))
    day1.toDS().versionedInsertInto(engine, table, UserId("alice"), "day 1")

    val day2 = Seq(User("user-2", "Bob", "bob@mail.com"),
      User("user-3", "Carol", "carol@othermail.com"), User("user-4", "Dave", "dave@mail.com"))
    day2.toDS().versionedInsertInto(engine, table, UserId("alice"), "day 2")

    engine.read(table).as[User].collect() should contain theSameElementsAs day2
    versionDirs(loc) should have size 2

    // rollback: metadata only, data still on disk
    val log = engine.log(table.name)
    log.map(_.message) shouldBe List("day 2", "day 1", "init")
    engine.checkout(table.name, log(1).id)
    engine.read(table).as[User].collect() should contain theSameElementsAs day1
    // roll forward
    engine.checkout(table.name, log(0).id)
    engine.read(table).as[User].collect() should contain theSameElementsAs day2
    // time travel without mutation
    engine.readAt(table, log(1).id).as[User].collect() should contain theSameElementsAs day1
    engine.read(table).as[User].collect() should contain theSameElementsAs day2
  }

  it should "refuse an EMPTY snapshot write instead of committing a data-less version" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "empty_snap"),
      new File(dir, "empty_snap").toURI, PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    // a 0-row partitionBy append writes NO _version= dir, so the commit
    // would reference a directory that never exists — the post-write dir
    // probe fails the call before the commit lands (checked after the write,
    // not via ds.isEmpty, so the input plan is evaluated only once and a
    // nondeterministic source can't slip an empty write past the guard)
    val e = intercept[IllegalArgumentException] {
      Seq.empty[User].toDS().versionedInsertInto(engine, table, UserId("t"), "empty")
    }
    e.getMessage should include("no rows")
    // the table is untouched and still readable
    engine.log(table.name).map(_.message) shouldBe List("init")
    engine.read(table).count() shouldBe 0
  }

  behavior of "versionedReplaceAll"

  it should "make the table's content exactly the dataset, removing absent partitions atomically" in {
    val (engine, dir) = newEngine()
    val loc = new File(dir, "replace_all")
    val table = TableDefinition(TableName("test", "replace_all"), loc.toURI,
      PartitionSchema("date"), FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    def pvx(id: String, d: String) = pv(id, "/p", s"${d}T00:00:00Z")
    Seq(pvx("a", "2024-01-01"), pvx("b", "2024-01-02")).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "two days")
    val before = engine.log(table.name).head.id

    // replace with a dataset covering only one (different) day: the two old
    // partitions are REMOVED in the same commit that adds the new one
    val (_, changes) = Seq(pvx("c", "2024-01-03")).toDS()
      .versionedReplaceAll(engine, table, UserId("t"), "full refresh")
    engine.read(table).as[Pageview].collect().map(_.id).toList shouldBe List("c")
    changes.operations.count(_.isInstanceOf[MetastoreOperation.RemovePartition]) shouldBe 2

    // one commit; time travel still sees the replaced content
    engine.readAt(table, before).as[Pageview].collect().map(_.id).toSet shouldBe Set("a", "b")
    // partitions present in BOTH old and new state are simply repointed
    Seq(pvx("d", "2024-01-03"), pvx("e", "2024-01-04")).toDS()
      .versionedReplaceAll(engine, table, UserId("t"), "refresh again")
    engine.read(table).as[Pageview].collect().map(_.id).toSet shouldBe Set("d", "e")
  }

  behavior of "date-partitioned tables (reference DatePartitionedTableSpec)"

  def pv(id: String, path: String, ts: String): Pageview = {
    val t = Timestamp.from(java.time.Instant.parse(ts))
    Pageview(id, path, t, Date.valueOf(t.toInstant.atOffset(java.time.ZoneOffset.UTC).toLocalDate))
  }

  it should "write per-partition versions, reprocess, and roll back per-partition" in {
    val (engine, dir) = newEngine()
    val loc = new File(dir, "pageview")
    val table = TableDefinition(TableName("test", "pageview"), loc.toURI,
      PartitionSchema("date"), FileFormat.Parquet)
    engine.initTable(table, UserId("alice"), "init")

    val day13 = List(
      pv("user-1", "/home", "2019-03-13T00:10:00Z"), pv("user-1", "/about", "2019-03-13T01:00:00Z"),
      pv("user-2", "/home", "2019-03-13T10:00:00Z"), pv("user-3", "/about", "2019-03-13T23:00:00Z"))
    val day14 = List(
      pv("user-2", "/home", "2019-03-14T05:00:00Z"), pv("user-3", "/home", "2019-03-14T06:00:00Z"),
      pv("user-4", "/about", "2019-03-14T07:00:00Z"))
    val day15 = List(
      pv("user-1", "/home", "2019-03-15T08:00:00Z"), pv("user-2", "/profile", "2019-03-15T09:00:00Z"),
      pv("user-3", "/home", "2019-03-15T20:00:00Z"))

    day13.toDS().versionedInsertInto(engine, table, UserId("a"), "day 13")
    (day14 ++ day15).toDS().versionedInsertInto(engine, table, UserId("a"), "days 14+15")

    engine.read(table).as[Pageview].collect() should contain theSameElementsAs (day13 ++ day14 ++ day15)

    // reprocess day 14 without user-4: only that partition gets a new version
    val day14Fixed = day14.filterNot(_.id == "user-4")
    day14Fixed.toDS().versionedInsertInto(engine, table, UserId("a"), "reprocess day 14")

    engine.read(table).as[Pageview].collect() should contain theSameElementsAs (day13 ++ day14Fixed ++ day15)

    // on-disk layout: day13/day15 have 1 version dir, day14 has 2
    versionDirs(new File(loc, "date=2019-03-13")) should have size 1
    versionDirs(new File(loc, "date=2019-03-14")) should have size 2
    versionDirs(new File(loc, "date=2019-03-15")) should have size 1

    // partition filter answers from the current version only
    engine.read(table).where($"date" === "2019-03-14").as[Pageview].collect() should
      contain theSameElementsAs day14Fixed

    // driver-side partition pruning
    engine.readPartitions(table, _.columnValues.head.value == "2019-03-15")
      .as[Pageview].collect() should contain theSameElementsAs day15

    // Catalyst partition pruning: a partition-column filter on a versioned
    // read must land in the scan's PartitionFilters (date survives as a real
    // partition column through the basePath read)
    val pruned = engine.read(table).where($"date" === "2019-03-14")
    val scan = pruned.queryExecution.executedPlan.toString
    scan should include("PartitionFilters: [isnotnull(date")

    // rollback chain: head -> before reprocess -> before day14/15 -> init(empty)
    val log = engine.log(table.name)
    log.map(_.message) shouldBe List("reprocess day 14", "days 14+15", "day 13", "init")

    engine.checkout(table.name, log(1).id)
    engine.read(table).as[Pageview].collect() should contain theSameElementsAs (day13 ++ day14 ++ day15)

    engine.checkout(table.name, log(2).id)
    engine.read(table).as[Pageview].collect() should contain theSameElementsAs day13

    engine.checkout(table.name, log(3).id)
    engine.read(table).count() shouldBe 0

    // a new write returns to head semantics: full history + new commit visible
    val day16 = List(pv("user-9", "/home", "2019-03-16T10:00:00Z"))
    day16.toDS().versionedInsertInto(engine, table, UserId("a"), "day 16")
    engine.read(table).as[Pageview].collect() should
      contain theSameElementsAs (day13 ++ day14Fixed ++ day15 ++ day16)
  }

  behavior of "multi-partition ORC tables (reference MultiPartitionTableSpec)"

  it should "version (impression_date, processed_date) partitions in ORC" in {
    val (engine, dir) = newEngine()
    val loc = new File(dir, "ad_impressions")
    val table = TableDefinition(TableName("test", "ad_impressions"), loc.toURI,
      PartitionSchema("impression_date", "processed_date"), FileFormat.Orc)
    engine.initTable(table, UserId("bob"), "init")

    def imp(u: String, ad: String, ts: String, processed: String): AdImpression = {
      val t = Timestamp.from(java.time.Instant.parse(ts))
      AdImpression(u, ad, t,
        Date.valueOf(t.toInstant.atOffset(java.time.ZoneOffset.UTC).toLocalDate),
        Date.valueOf(processed))
    }

    val batch1 = List(
      imp("user-1", "ad-1", "2019-03-13T23:59:00Z", "2019-03-14"),
      imp("user-2", "ad-1", "2019-03-14T00:01:00Z", "2019-03-14"),
      imp("user-3", "ad-2", "2019-03-14T00:02:00Z", "2019-03-14"))
    batch1.toDS().versionedInsertInto(engine, table, UserId("bob"), "batch 1")

    val batch2 = List(
      imp("user-1", "ad-3", "2019-03-14T23:59:30Z", "2019-03-15"),
      imp("user-4", "ad-2", "2019-03-15T00:00:10Z", "2019-03-15"))
    batch2.toDS().versionedInsertInto(engine, table, UserId("bob"), "batch 2")

    engine.read(table).as[AdImpression].collect() should contain theSameElementsAs (batch1 ++ batch2)

    versionDirs(new File(loc, "impression_date=2019-03-13/processed_date=2019-03-14")) should have size 1
    versionDirs(new File(loc, "impression_date=2019-03-14/processed_date=2019-03-14")) should have size 1
    versionDirs(new File(loc, "impression_date=2019-03-14/processed_date=2019-03-15")) should have size 1
    versionDirs(new File(loc, "impression_date=2019-03-15/processed_date=2019-03-15")) should have size 1

    // two-level partition filter
    engine.read(table)
      .where($"impression_date" === "2019-03-14" && $"processed_date" === "2019-03-15")
      .as[AdImpression].collect() should contain theSameElementsAs List(batch2.head)
  }

  behavior of "schema-drift guard on partial writes"

  it should "reject renamed/retyped/dropped columns on insert, allow them via replace-all" in {
    val (engine, dir) = newEngine()
    val loc = new File(dir, "drift")
    val table = TableDefinition(TableName("test", "drift"), loc.toURI,
      PartitionSchema("day"), FileFormat.Parquet)
    engine.initTable(table, UserId("u"), "init")

    // the first write defines the schema
    Seq(("a", 1.0, "d1")).toDF("sensor", "value", "day")
      .versionedInsertInto(engine, table, UserId("u"), "v1")

    // same schema, different column ORDER and an extra cast-compatible write: fine
    Seq((2.0, "b", "d2")).toDF("value", "sensor", "day")
      .versionedInsertInto(engine, table, UserId("u"), "reordered")
    engine.read(table).count() shouldBe 2

    // renamed column
    intercept[IllegalArgumentException] {
      Seq(("c", 3.0, "d3")).toDF("sensor", "reading", "day")
        .versionedInsertInto(engine, table, UserId("u"), "renamed")
    }.getMessage should include("Schema drift")
    // retyped column
    intercept[IllegalArgumentException] {
      Seq(("c", "high", "d3")).toDF("sensor", "value", "day")
        .versionedInsertInto(engine, table, UserId("u"), "retyped")
    }.getMessage should include("Schema drift")
    // dropped column
    intercept[IllegalArgumentException] {
      Seq(("c", "d3")).toDF("sensor", "day")
        .versionedInsertInto(engine, table, UserId("u"), "dropped")
    }.getMessage should include("Schema drift")
    // nothing landed from the refused writes
    engine.read(table).count() shouldBe 2
    engine.log(table.name).map(_.message) shouldBe List("reordered", "v1", "init")

    // replace-all IS the schema-change path: full rewrite under the new shape
    Seq(("c", 3L, "happy", "d3")).toDF("sensor", "reading", "mood", "day")
      .versionedReplaceAll(engine, table, UserId("u"), "new schema")
    engine.read(table).count() shouldBe 1
    // and subsequent partial writes must match the NEW schema
    Seq(("d", 4L, "calm", "d4")).toDF("sensor", "reading", "mood", "day")
      .versionedInsertInto(engine, table, UserId("u"), "v2 new shape")
    engine.read(table).count() shouldBe 2
    intercept[IllegalArgumentException] {
      Seq(("e", 5.0, "d5")).toDF("sensor", "value", "day")
        .versionedInsertInto(engine, table, UserId("u"), "old shape again")
    }.getMessage should include("Schema drift")
  }

  it should "never apply to snapshot tables (every insert is a whole-table replace)" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "snapdrift"),
      new File(dir, "snapdrift").toURI, PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("u"), "init")
    Seq(("a", 1.0)).toDF("sensor", "value")
      .versionedInsertInto(engine, table, UserId("u"), "v1")
    // a snapshot insert replaces the whole visible table: a new schema is
    // legitimate (no mixed-schema state is possible) and must not be blocked
    Seq(("b", 2L, "extra")).toDF("sensor", "reading", "note")
      .versionedInsertInto(engine, table, UserId("u"), "v2 new schema")
    engine.read(table).columns.sorted shouldBe Array("note", "reading", "sensor")
    engine.read(table).count() shouldBe 1
    // and time travel still reads the old shape
    val v1 = engine.log(table.name).find(_.message == "v1").get.id
    engine.readAt(table, v1).columns.sorted shouldBe Array("sensor", "value")
  }

  behavior of "timestamp time travel and version auditing"

  it should "read as of a timestamp and report orphaned version dirs" in {
    val (engine, dir) = newEngine()
    val loc = new File(dir, "asof")
    val table = TableDefinition(TableName("test", "asof"), loc.toURI,
      PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("u"), "init")

    Seq(User("u1", "A", "a@x")).toDS().versionedInsertInto(engine, table, UserId("u"), "v1")
    val betweenCommits = java.time.Instant.now()
    Thread.sleep(5)
    Seq(User("u1", "A", "a@x"), User("u2", "B", "b@x")).toDS()
      .versionedInsertInto(engine, table, UserId("u"), "v2")

    engine.read(table).count() shouldBe 2
    engine.readAsOf(table, betweenCommits).count() shouldBe 1
    engine.readAsOf(table, java.time.Instant.now()).count() shouldBe 2
    an[IllegalArgumentException] should be thrownBy
      engine.readAsOf(table, java.time.Instant.EPOCH)

    // SQL over the versioned table without any Hive catalog
    engine.createView(table, "asof_view")
    try spark.sql("SELECT count(*) AS n FROM asof_view").head().getLong(0) shouldBe 2
    finally spark.catalog.dropTempView("asof_view")

    // no orphans after clean writes
    engine.orphanedVersions(table) shouldBe Nil

    // fabricate debris from a "failed write": a version dir no commit references
    val orphan = new File(loc, s"_version=${Version.generate().label}")
    Seq(User("ghost", "X", "x@x")).toDS().write.parquet(orphan.toString)
    val found = engine.orphanedVersions(table)
    found should have size 1
    found.head.getPath should endWith(orphan.getName)
    // and the orphan is invisible to reads
    engine.read(table).count() shouldBe 2
  }

  behavior of "optimistic-concurrency (CAS) writes"

  it should "refuse a versionedInsertIntoIf based on a stale head, leaving reclaimable debris" in {
    val (engine, dir) = newEngine()
    val loc = new File(dir, "cas_users")
    val table = TableDefinition(TableName("test", "cas_users"), loc.toURI, PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("a"), "init")
    Seq(User("u1", "A", "a@m")).toDS().versionedInsertInto(engine, table, UserId("a"), "v1")

    // writer W reads the head, then a concurrent writer lands v2
    val staleHead = engine.tracker.tableState(table.name).currentVersion
    Seq(User("u2", "B", "b@m")).toDS().versionedInsertInto(engine, table, UserId("b"), "v2")

    // W's CAS write must fail without changing the visible state...
    an[CommitConflictError] should be thrownBy
      Seq(User("u3", "C", "c@m")).toDS()
        .versionedInsertIntoIf(engine, table, UserId("a"), "w-stale", staleHead)
    engine.read(table).as[User].collect().map(_.id) shouldBe Array("u2")
    engine.log(table.name).map(_.message) shouldBe List("v2", "v1", "init")

    // ...and its already-written version dir is orphaned debris the auditor sees
    engine.orphanedVersions(table) should have size 1

    // re-read and retry succeeds
    val freshHead = engine.tracker.tableState(table.name).currentVersion
    Seq(User("u3", "C", "c@m")).toDS()
      .versionedInsertIntoIf(engine, table, UserId("a"), "w-retry", freshHead)
    engine.read(table).as[User].collect().map(_.id) shouldBe Array("u3")
  }

  it should "refuse a versionedReplaceAllIf whose remove set was derived from a stale head" in {
    val (engine, dir) = newEngine()
    val loc = new File(dir, "cas_pages")
    val table = TableDefinition(TableName("test", "cas_pages"), loc.toURI, PartitionSchema("date"), FileFormat.Parquet)
    engine.initTable(table, UserId("a"), "init")
    val d1 = Date.valueOf("2024-01-01"); val d2 = Date.valueOf("2024-01-02")
    def pv(id: String, d: Date) = Pageview(id, s"/$id", Timestamp.valueOf("2024-01-01 00:00:00"), d)
    Seq(pv("p1", d1)).toDS().versionedInsertInto(engine, table, UserId("a"), "day1")

    val staleHead = engine.tracker.tableState(table.name).currentVersion
    Seq(pv("p2", d2)).toDS().versionedInsertInto(engine, table, UserId("b"), "day2")

    // a stale replace-all would silently drop day2 from its remove
    // computation — the CAS makes it fail instead
    an[CommitConflictError] should be thrownBy
      Seq(pv("p9", d1)).toDS()
        .versionedReplaceAllIf(engine, table, UserId("a"), "stale-replace", staleHead)
    engine.read(table).as[Pageview].collect().map(_.id).sorted shouldBe Array("p1", "p2")
  }

  behavior of "partitionValues"

  it should "extract distinct partition tuples" in {
    val ds = List(
      Pageview("a", "/", new Timestamp(0), Date.valueOf("2020-01-01")),
      Pageview("b", "/", new Timestamp(0), Date.valueOf("2020-01-01")),
      Pageview("c", "/", new Timestamp(0), Date.valueOf("2020-01-02"))).toDS()
    VersionedTables.partitionValues(ds, PartitionSchema("date")) should contain theSameElementsAs List(
      Partition("date", "2020-01-01"), Partition("date", "2020-01-02"))
  }

  it should "require dynamic partition overwrite mode" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "cfg"), new File(dir, "cfg").toURI,
      PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("u"), "init")
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    try {
      an[IllegalArgumentException] should be thrownBy
        Seq(User("x", "y", "z")).toDS().versionedInsertInto(engine, table, UserId("u"), "w")
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }
}
