package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._

import java.io.File
import java.nio.file.Files
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

case class Reading(sensor: String, day: String, value: Double)

/** Incremental (CDC-style) reads between commits + small-file compaction —
  * the consumer/maintenance pair a 100 TB training pipeline needs on top of
  * the reference's write/read/rollback surface (no reference counterpart;
  * semantics follow the same commit-log model, core/VersionTracker.scala). */
class IncrementalCompactionSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newTable(): (VersionedTables, TableDefinition, File) = {
    val dir = Files.createTempDirectory("graft-inc-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val loc = new File(dir, "readings")
    val table = TableDefinition(TableName("test", "readings"), loc.toURI,
      PartitionSchema("day"), FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    (engine, table, loc)
  }

  private def head(engine: VersionedTables, t: TableDefinition): CommitId =
    engine.log(t.name).head.id

  private def dataFiles(loc: File, day: String, label: String): Array[File] = {
    val leaf = new File(new File(loc, s"day=$day"), s"_version=$label")
    Option(leaf.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith("part-"))
  }

  private def currentLabel(engine: VersionedTables, t: TableDefinition, day: String): String =
    engine.tracker.currentVersion(t.name) match {
      case PartitionedTableVersion(pvs) =>
        pvs.collectFirst { case (p, v) if p.toPath == s"day=$day" => v.label }.get
      case _ => fail("expected partitioned version")
    }

  behavior of "readChangesBetween"

  it should "return exactly the rows of partitions added or repointed in the range" in {
    val (engine, table, _) = newTable()
    Seq(Reading("a", "d1", 1.0), Reading("b", "d2", 2.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "t1")
    val t1 = head(engine, table)
    val d2new = Seq(Reading("b", "d2", 20.0), Reading("c", "d2", 21.0))
    val d3 = Seq(Reading("d", "d3", 3.0))
    (d2new ++ d3).toDS().versionedInsertInto(engine, table, UserId("t"), "t2")
    val t2 = head(engine, table)

    val got = engine.readChangesBetween(table, t1, t2)
      .select("sensor", "day", "value").as[Reading].collect()
    got should contain theSameElementsAs (d2new ++ d3)

    // the metadata diff agrees: d2 repointed, d3 added, d1 untouched
    val ops = engine.changesBetween(table.name, t1, t2).operations
    ops.collect { case MetastoreOperation.AddPartition(p, _) => p.toPath } shouldBe List("day=d3")
    ops.collect { case MetastoreOperation.UpdatePartitionVersion(p, _) => p.toPath } shouldBe List("day=d2")
    ops.collect { case MetastoreOperation.RemovePartition(p) => p.toPath } shouldBe Nil
  }

  it should "be empty for an empty range and directional for a reversed one" in {
    val (engine, table, _) = newTable()
    Seq(Reading("a", "d1", 1.0)).toDS().versionedInsertInto(engine, table, UserId("t"), "t1")
    val t1 = head(engine, table)
    engine.readChangesBetween(table, t1, t1).count() shouldBe 0

    Seq(Reading("a", "d1", 9.0), Reading("b", "d2", 2.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "t2")
    val t2 = head(engine, table)
    // reversed range: "undo" view — d1 at its t1 version; d2 has no t1 version
    val back = engine.readChangesBetween(table, t2, t1)
      .select("sensor", "day", "value").as[Reading].collect()
    back should contain theSameElementsAs Seq(Reading("a", "d1", 1.0))
  }

  it should "error on unknown commits" in {
    val (engine, table, _) = newTable()
    Seq(Reading("a", "d1", 1.0)).toDS().versionedInsertInto(engine, table, UserId("t"), "t1")
    val t1 = head(engine, table)
    an[UnknownCommitError] should be thrownBy
      engine.readChangesBetween(table, t1, CommitId.generate())
  }

  it should "prune the CDC file listing driver-side under keep (and so must readAt/readChangesAt)" in {
    val (engine, table, _) = newTable()
    Seq(Reading("a", "d1", 1.0), Reading("b", "d2", 2.0), Reading("c", "d3", 3.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "t1")
    val t1 = head(engine, table)
    // repoint ALL THREE days; the pruned consumer wants only d2's changes
    Seq(Reading("a", "d1", 10.0), Reading("b", "d2", 20.0), Reading("c", "d3", 30.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "t2")
    val t2 = head(engine, table)

    val keepD2: Partition => Boolean = _.columnValues.head.value == "d2"
    val cdc = engine.readChangesBetween(table, t1, t2, keepD2)
    cdc.select("sensor", "day", "value").as[Reading].collect() should
      contain theSameElementsAs Seq(Reading("b", "d2", 20.0))
    // the proof of pruning: the scan's file listing is restricted to the
    // kept partition BEFORE listing — no d1/d3 paths anywhere in the plan
    val cdcFiles = cdc.inputFiles
    cdcFiles should not be empty
    all(cdcFiles) should include("day=d2")

    val at = engine.readAt(table, t1, keepD2)
    at.select("sensor", "day", "value").as[Reading].collect() should
      contain theSameElementsAs Seq(Reading("b", "d2", 2.0))
    val atFiles = at.inputFiles
    atFiles should not be empty
    all(atFiles) should include("day=d2")

    val one = engine.readChangesAt(table, t2, keepD2)
    one.select("sensor", "day", "value").as[Reading].collect() should
      contain theSameElementsAs Seq(Reading("b", "d2", 20.0))
    all(one.inputFiles) should include("day=d2")

    // timestamp time travel prunes the same way
    val asOf = engine.readAsOf(table, java.time.Instant.now(), keepD2)
    asOf.select("sensor", "day", "value").as[Reading].collect() should
      contain theSameElementsAs Seq(Reading("b", "d2", 20.0))
    all(asOf.inputFiles) should include("day=d2")

    // keep selecting nothing = empty frame, zero files listed
    val none = engine.readChangesBetween(table, t1, t2, _ => false)
    none.count() shouldBe 0
    none.inputFiles shouldBe empty
  }

  it should "handle snapshot tables (full new version or empty)" in {
    val dir = Files.createTempDirectory("graft-inc-snap-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val table = TableDefinition(TableName("test", "snap"), new File(dir, "snap").toURI,
      PartitionSchema.snapshot, FileFormat.Parquet)
    engine.initTable(table, UserId("t"), "init")
    Seq(Reading("a", "d1", 1.0)).toDS().versionedInsertInto(engine, table, UserId("t"), "v1")
    val v1 = head(engine, table)
    engine.readChangesBetween(table, v1, v1).count() shouldBe 0
    val v2data = Seq(Reading("a", "d1", 2.0), Reading("b", "d1", 3.0))
    v2data.toDS().versionedInsertInto(engine, table, UserId("t"), "v2")
    val v2 = head(engine, table)
    engine.readChangesBetween(table, v1, v2)
      .select("sensor", "day", "value").as[Reading].collect() should
      contain theSameElementsAs v2data
  }

  behavior of "compact"

  it should "rewrite fragmented partitions to one file with identical rows, keeping history" in {
    val (engine, table, loc) = newTable()
    val rows = (1 to 40).map(i => Reading(s"s$i", if (i % 2 == 0) "d1" else "d2", i.toDouble))
    // 4 input tasks => 4 files per partition directory
    rows.toDS().repartition(4).versionedInsertInto(engine, table, UserId("t"), "fragmented")
    val before = head(engine, table)
    dataFiles(loc, "d1", currentLabel(engine, table, "d1")).length should be > 1

    engine.compact(table, UserId("t"), "compact all")
    val after = head(engine, table)
    after should not be before

    // rows identical, one file per partition, old layout still time-travelable
    engine.read(table).select("sensor", "day", "value").as[Reading].collect() should
      contain theSameElementsAs rows
    dataFiles(loc, "d1", currentLabel(engine, table, "d1")).length shouldBe 1
    dataFiles(loc, "d2", currentLabel(engine, table, "d2")).length shouldBe 1
    engine.readAt(table, before).select("sensor", "day", "value").as[Reading].collect() should
      contain theSameElementsAs rows
  }

  it should "compact only the selected partitions" in {
    val (engine, table, _) = newTable()
    val rows = (1 to 20).map(i => Reading(s"s$i", if (i % 2 == 0) "d1" else "d2", i.toDouble))
    rows.toDS().repartition(4).versionedInsertInto(engine, table, UserId("t"), "fragmented")
    val before = head(engine, table)
    engine.compact(table, UserId("t"), "compact d1 only",
      keep = _.columnValues.exists(_.value == "d1"))
    val ops = engine.changesBetween(table.name, before, head(engine, table)).operations
    ops.collect { case MetastoreOperation.UpdatePartitionVersion(p, _) => p.toPath } shouldBe
      List("day=d1")
    engine.read(table).select("sensor", "day", "value").as[Reading].collect() should
      contain theSameElementsAs rows
  }

  it should "cluster rows within files when clusterBy is given" in {
    val (engine, table, loc) = newTable()
    // values deliberately unsorted in input order
    val rows = Seq(5, 2, 9, 1, 7, 3, 8, 4, 6).map(i => Reading(s"s$i", "d1", i.toDouble))
    rows.toDS().repartition(3).versionedInsertInto(engine, table, UserId("t"), "unsorted")
    engine.compact(table, UserId("t"), "cluster on value", clusterBy = Seq("value"))
    engine.read(table).select("sensor", "day", "value").as[Reading].collect() should
      contain theSameElementsAs rows
    // the single compacted file is sorted on value => parquet min/max stats
    // on that column are tight for every row group
    val file = dataFiles(loc, "d1", currentLabel(engine, table, "d1")).head
    val vals = spark.read.parquet(file.toString).select("value")
      .collect().map(_.getDouble(0)).toList
    vals shouldBe vals.sorted
  }

  it should "no-op (no write, no commit) when the keep predicate selects nothing" in {
    val (engine, table, _) = newTable()
    val rows = Seq(Reading("a", "d1", 1.0))
    rows.toDS().versionedInsertInto(engine, table, UserId("t"), "w1")
    val before = engine.log(table.name)
    val (version, changes) = engine.compact(table, UserId("t"), "matches nothing",
      keep = _.columnValues.exists(_.value == "no-such-day"))
    changes.operations shouldBe Nil
    version shouldBe engine.tracker.currentVersion(table.name)
    engine.log(table.name) shouldBe before // no commit was appended
    engine.read(table).select("sensor", "day", "value").as[Reading].collect() should
      contain theSameElementsAs rows
  }

  behavior of "expirableVersions"

  it should "report superseded versions outside the retention window, partition-granular" in {
    val (engine, table, _) = newTable()
    Seq(Reading("a", "d1", 1.0), Reading("b", "d2", 2.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "w1")
    val v1d1 = currentLabel(engine, table, "d1")
    Seq(Reading("a", "d1", 10.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "w2") // supersedes d1 only
    Seq(Reading("a", "d1", 100.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "w3")
    val v3d1 = currentLabel(engine, table, "d1")

    // generous retention: nothing expirable
    engine.expirableVersions(table, keepLast = 10) shouldBe Nil

    // keep only the latest commit: both old d1 versions go; d2's only version
    // is still live in the head state and must NOT be listed
    val expirable = engine.expirableVersions(table, keepLast = 1).map(_.toString)
    expirable should have size 2
    expirable.foreach { uri =>
      uri should include("day=d1")
      uri should not include v3d1
    }
    expirable.exists(_.contains(v1d1)) shouldBe true

    // a checked-out head is protected even when older than the window
    val commits = engine.log(table.name).reverse // oldest first: init, w1, w2, w3
    engine.checkout(table.name, commits(1).id)
    val afterCheckout = engine.expirableVersions(table, keepLast = 1).map(_.toString)
    afterCheckout.exists(_.contains(v1d1)) shouldBe false // head state uses v1 again
  }

  it should "never list versions pinned by a tag, and readAtTag survives vacuum" in {
    val (engine, table, _) = newTable()
    Seq(Reading("a", "d1", 1.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "w1")
    // pin the w1 state as the training snapshot
    engine.tracker.createTag(table.name, "train-v1", engine.log(table.name).head.id)
    Seq(Reading("a", "d1", 10.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "w2")
    Seq(Reading("a", "d1", 100.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "w3")

    // without the tag, w1's and w2's d1 versions would both be expirable at
    // keepLast=1; the tag pins w1's — only w2's remains expirable
    val expirable = engine.expirableVersions(table, keepLast = 1)
    expirable should have size 1

    val r = engine.vacuum(table, keepLast = 1, dryRun = false)
    r.failed shouldBe Nil
    r.deleted should contain theSameElementsAs expirable
    // the tagged dataset state reads back EXACTLY, after physical vacuum
    engine.readAtTag(table, "train-v1").select("sensor", "day", "value")
      .as[Reading].collect() shouldBe Array(Reading("a", "d1", 1.0))

    // dropping the tag releases the pin: the formerly-tagged version joins
    // the expirable list (alongside the already-vacuumed one — retention is
    // metadata-based and vacuum never rewrites history)
    engine.tracker.deleteTag(table.name, "train-v1")
    val released = engine.expirableVersions(table, keepLast = 1)
    released should have size 2
    released should contain allElementsOf expirable
  }

  behavior of "vacuum"

  it should "dry-run by default, then physically reclaim expired versions only" in {
    val (engine, table, _) = newTable()
    Seq(Reading("a", "d1", 1.0), Reading("b", "d2", 2.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "w1")
    val firstCommit = engine.log(table.name).head.id
    Seq(Reading("a", "d1", 10.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "w2")
    Seq(Reading("a", "d1", 100.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "w3")

    val fs = new org.apache.hadoop.fs.Path(table.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // dry run: targets listed, nothing touched
    val dry = engine.vacuum(table, keepLast = 1)
    dry.targets should have size 2
    dry.deleted shouldBe Nil
    dry.targets.foreach(u => fs.exists(new org.apache.hadoop.fs.Path(u)) shouldBe true)

    // real run: the two superseded d1 versions are gone, nothing failed
    val real = engine.vacuum(table, keepLast = 1, dryRun = false)
    real.deleted should contain theSameElementsAs dry.targets
    real.failed shouldBe Nil
    real.deleted.foreach(u => fs.exists(new org.apache.hadoop.fs.Path(u)) shouldBe false)

    // current read unaffected; history metadata intact
    engine.read(table).select("sensor", "day", "value").as[Reading].collect() should
      contain theSameElementsAs Seq(Reading("a", "d1", 100.0), Reading("b", "d2", 2.0))
    engine.log(table.name) should have size 4 // init + 3 writes: log never shrinks

    // THE retention × time-travel interaction law (SCALE.md §3's claim,
    // pinned): a historical read whose state references a reclaimed version
    // fails LOUDLY at read time — and the error NAMES the reclaimed
    // `_version=` directory, so the operator can see retention (not
    // corruption) ate the state. The firstCommit state points d1 at its
    // vacuumed first version; d2's version is still live.
    // match on the raw path, trailing slash stripped: URI renderings differ
    // (file:/ vs file:///, dir slash) between the report and Spark's error
    val reclaimedD1 = real.deleted.map(_.getPath.stripSuffix("/")).filter(_.contains("day=d1"))
    reclaimedD1 should not be empty
    val eAt = intercept[Exception](engine.readAt(table, firstCommit).collect())
    reclaimedD1.exists(eAt.getMessage.contains) shouldBe true
    // same law through timestamp-based time travel...
    val ts = engine.log(table.name).find(_.id == firstCommit).get.timestamp
    val eAsOf = intercept[Exception](engine.readAsOf(table, ts).collect())
    reclaimedD1.exists(eAsOf.getMessage.contains) shouldBe true
    // ...and through an explicit checkout of the vacuumed commit
    engine.checkout(table.name, firstCommit)
    try {
      val eRead = intercept[Exception](engine.read(table).collect())
      reclaimedD1.exists(eRead.getMessage.contains) shouldBe true
    } finally engine.checkout(table.name, engine.log(table.name).head.id) // roll forward
    // partitions whose versions survived the vacuum stay readable at the
    // historical commit: the failure is per-reclaimed-partition, not global
    engine.readAt(table, firstCommit, keep = _.columnValues.exists(_.value == "d2"))
      .select("sensor", "day", "value").as[Reading].collect() should
      contain theSameElementsAs Seq(Reading("b", "d2", 2.0))
  }

  it should "be a clean no-op when nothing is expirable" in {
    val (engine, table, _) = newTable()
    Seq(Reading("a", "d1", 1.0)).toDS()
      .versionedInsertInto(engine, table, UserId("t"), "w1")
    val r = engine.vacuum(table, keepLast = 1, dryRun = false)
    r.targets shouldBe Nil
    r.deleted shouldBe Nil
    r.failed shouldBe Nil
  }

  it should "refuse forged targets: bad leaf, prefix-sibling dirs, and foreign filesystems" in {
    import graft.sources.VersionJanitor
    val conf = spark.sparkContext.hadoopConfiguration
    val root = java.nio.file.Files.createTempDirectory("graft-janitor-")
    val tableLoc = root.resolve("events").toUri
    // a sibling whose path shares the table prefix, plus a legit victim dir
    val sibling = java.nio.file.Files.createDirectories(
      root.resolve("events_archive").resolve("_version=20240101-000000.000000000-x"))
    val legit = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(tableLoc.getPath).resolve("day=d1")
        .resolve("_version=20240101-000000.000000000-y"))

    val legitUri = legit.toUri // capture now: toUri drops the trailing slash once deleted
    val outcome = VersionJanitor.deleteVersionDirs(conf, tableLoc, List(
      new java.net.URI(tableLoc + "/day=d1/notaversion/"),            // bad leaf
      sibling.toUri,                                                  // prefix sibling
      new java.net.URI("s3a://bucket" + tableLoc.getPath +            // same path, other fs
        "/day=d1/_version=20240101-000000.000000000-y/"),
      legitUri))                                                      // the only valid one

    outcome.deleted shouldBe List(legitUri)
    outcome.failed should have size 3
    outcome.failed.map(_._2).count(_.startsWith("refusing")) shouldBe 3
    java.nio.file.Files.exists(sibling) shouldBe true   // refused => untouched
    java.nio.file.Files.exists(legit) shouldBe false
  }

  it should "refuse dot-segment escapes, fail-all on opaque locations, and accept qualified targets for scheme-less locations" in {
    import graft.sources.VersionJanitor
    val conf = spark.sparkContext.hadoopConfiguration
    val root = java.nio.file.Files.createTempDirectory("graft-janitor2-")
    val tableLoc = root.resolve("events").toUri

    // '..' passes a lexical startsWith but must be refused
    val escape = new java.net.URI(null, null,
      tableLoc.getPath + "/../victim/_version=20240101-000000.000000000-z/", null)
    val r1 = VersionJanitor.deleteVersionDirs(conf, tableLoc, List(escape))
    r1.deleted shouldBe Nil
    r1.failed.head._2 should include("dot segments")

    // opaque location (missing '//'): everything refused, nothing thrown
    val r2 = VersionJanitor.deleteVersionDirs(conf,
      new java.net.URI("s3a:bucket/warehouse/t"), List(escape))
    r2.deleted shouldBe Nil
    r2.failed.head._2 should include("not a hierarchical URI")

    // scheme-less table location + Hadoop-qualified (file:) target — the
    // orphanedVersions shape — must be accepted, not false-refused
    val dir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(tableLoc.getPath).resolve("day=d1")
        .resolve("_version=20240101-000000.000000000-w"))
    val schemelessLoc = new java.net.URI(null, null, tableLoc.getPath, null)
    val qualifiedTarget = new java.net.URI("file", null, dir.toString, null)
    val r3 = VersionJanitor.deleteVersionDirs(conf, schemelessLoc, List(qualifiedTarget))
    r3.failed shouldBe Nil
    r3.deleted shouldBe List(qualifiedTarget)
    java.nio.file.Files.exists(dir) shouldBe false
  }

  it should "honor filesPerPartition for partitions too big for one write task" in {
    val (engine, table, loc) = newTable()
    val rows = (1 to 100).map(i => Reading(s"s$i", "d1", i.toDouble))
    rows.toDS().repartition(5).versionedInsertInto(engine, table, UserId("t"), "fragmented")
    engine.compact(table, UserId("t"), "compact to 2", filesPerPartition = 2)
    dataFiles(loc, "d1", currentLabel(engine, table, "d1")).length shouldBe 2
    engine.read(table).select("sensor", "day", "value").as[Reading].collect() should
      contain theSameElementsAs rows
  }
}
