package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * Write-audit-publish over the versioned layer: staged data is invisible
 * until published, the audit runs against exactly what WOULD become
 * visible, a failed audit leaves only vacuum-reclaimable debris, and the
 * one-call `auditedInsertInto` makes bad data unobservable by readers.
 */
class WriteAuditPublishSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture() = {
    val root = java.nio.file.Files.createTempDirectory("graft-wap-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("wap", "docs"),
      root.resolve("docs").toUri, PartitionSchema("batch"), FileFormat.Parquet)
    engine.initTable(table, UserId("writer"), "init")
    (engine, table)
  }

  "stageInsertInto" should "stage invisibly, audit the staged read, publish atomically" in {
    val (engine, table) = fixture()
    Seq((1L, "alpha", "b0"), (2L, "beta", "b0")).toDF("doc_id", "text", "batch")
      .versionedInsertInto(engine, table, UserId("writer"), "base")
    val headBefore = engine.tracker.currentRef(table.name)

    val staged = Seq((3L, "gamma", "b1"), (4L, "delta", "b1"))
      .toDF("doc_id", "text", "batch")
      .stageInsertInto(engine, table, UserId("writer"), "delivery b1")

    // invisible: no commit, no visible rows, head unmoved
    engine.read(table).select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 2L)
    engine.tracker.currentRef(table.name) shouldBe headBefore
    // the audit surface is EXACTLY the staged slice — committed rows excluded
    staged.staged.select("doc_id").as[Long].collect().toSet shouldBe Set(3L, 4L)
    Expectations.audit(staged.staged,
      Seq(Expectations.Unique(Seq("doc_id")))).head.ok shouldBe true

    staged.publish()
    engine.read(table).select("doc_id").as[Long].collect().toSet shouldBe
      Set(1L, 2L, 3L, 4L)
  }

  it should "leave an abandoned stage as vacuum-reclaimable debris, never visible" in {
    val (engine, table) = fixture()
    Seq((1L, "alpha", "b0")).toDF("doc_id", "text", "batch")
      .versionedInsertInto(engine, table, UserId("writer"), "base")

    val staged = Seq((1L, "alpha-dup", "b1")).toDF("doc_id", "text", "batch")
      .stageInsertInto(engine, table, UserId("writer"), "bad delivery")
    // abandon by simply not publishing: the staged version is orphan debris
    val orphans = engine.orphanedVersions(table)
    orphans.exists(_.toString.contains(staged.version.label)) shouldBe true
    // a PLAIN vacuum must NOT touch it — includeOrphans=false is exactly
    // what protects an in-flight stage another writer is about to publish
    engine.vacuum(table, keepLast = 10, dryRun = false).failed shouldBe empty
    engine.orphanedVersions(table)
      .exists(_.toString.contains(staged.version.label)) shouldBe true
    // opting into orphan reclaim deletes it; the visible table never changed
    engine.vacuum(table, keepLast = 10, includeOrphans = true, dryRun = false)
      .failed shouldBe empty
    engine.orphanedVersions(table)
      .exists(_.toString.contains(staged.version.label)) shouldBe false
    engine.read(table).select("doc_id").as[Long].collect().toSet shouldBe Set(1L)
  }

  "auditedInsertInto" should "publish a clean delivery and refuse a dirty one untouched" in {
    val (engine, table) = fixture()
    val checks = Seq(
      Expectations.NotNull(Seq("text")),
      Expectations.Unique(Seq("doc_id")),
      Expectations.Satisfies("nonempty_text",
        org.apache.spark.sql.functions.length(col("text")) > 0))

    Seq((1L, "alpha", "b0"), (2L, "beta", "b0")).toDF("doc_id", "text", "batch")
      .auditedInsertInto(engine, table, UserId("writer"), "clean b0", checks)
    engine.read(table).count() shouldBe 2L

    val dirty = Seq((3L, "gamma", "b1"), (3L, null, "b1"))
      .toDF("doc_id", "text", "batch")
    val err = intercept[Expectations.ExpectationsFailedError] {
      dirty.auditedInsertInto(engine, table, UserId("writer"), "dirty b1", checks)
    }
    err.results.filterNot(_.ok).map(_.check).toSet shouldBe
      Set("not_null(text)", "unique(doc_id)", "satisfies(nonempty_text)")
    // the refusal is total: visible table unchanged, no commit landed
    engine.read(table).select("doc_id").as[Long].collect().toSet shouldBe Set(1L, 2L)
    engine.log(table.name).map(_.message) shouldBe List("clean b0", "init")
    // and the dirty files are reclaimable debris
    engine.orphanedVersions(table) should not be empty
  }

  "wouldBeVisible" should "overlay the staged partitions on the untouched head" in {
    val (engine, table) = fixture()
    Seq((1L, "alpha", "b0"), (2L, "beta", "b0")).toDF("doc_id", "text", "batch")
      .versionedInsertInto(engine, table, UserId("writer"), "base")

    val staged = Seq((2L, "beta-again", "b1"), (3L, "gamma", "b1"))
      .toDF("doc_id", "text", "batch")
      .stageInsertInto(engine, table, UserId("writer"), "delivery b1")
    // delivery-scoped view: only b1; table-wide view: b0 ∪ b1, exactly
    // what a reader would see post-publish
    staged.staged.select("doc_id").as[Long].collect().toSet shouldBe Set(2L, 3L)
    staged.wouldBeVisible.select("doc_id").as[Long].collect().sorted shouldBe
      Array(1L, 2L, 2L, 3L)
    staged.publish()
    engine.read(table).select("doc_id").as[Long].collect().sorted shouldBe
      Array(1L, 2L, 2L, 3L)
  }

  it should "equal the staged read for a replace-all stage" in {
    val (engine, table) = fixture()
    Seq((1L, "alpha", "b0")).toDF("doc_id", "text", "batch")
      .versionedInsertInto(engine, table, UserId("writer"), "base")
    val staged = Seq((9L, "omega", "b9")).toDF("doc_id", "text", "batch")
      .stageReplaceAll(engine, table, UserId("writer"), "replace")
    // the RemovePartition ops drop b0 from the overlay
    staged.wouldBeVisible.select("doc_id").as[Long].collect().toSet shouldBe Set(9L)
  }

  "findStaged" should "re-attach a replace-all stage faithfully through its manifest" in {
    val (engine, table) = fixture()
    Seq((1L, "alpha", "b0"), (2L, "beta", "b1")).toDF("doc_id", "text", "batch")
      .versionedInsertInto(engine, table, UserId("writer"), "base")
    val staged = Seq((9L, "omega", "b9")).toDF("doc_id", "text", "batch")
      .stageReplaceAll(engine, table, UserId("writer"), "replace")
    val label = staged.version.label
    // the manifest recorded the stage's exact ops — removes included
    val manifest = VersionedTables.readStagingManifest(
      engine.spark.sparkContext.hadoopConfiguration, table.location, label)
    manifest.map(_.operations.count {
      case graft.core.TableOperation.RemovePartition(_) => true; case _ => false
    }) shouldBe Some(2)
    // a DIFFERENT engine instance (as a separate process would build)
    // re-attaches and publishes with replace-all semantics intact
    val engine2 = new VersionedTables(spark, engine.tracker)
    val sw = engine2.findStaged(table, label, UserId("op"), "publish from cli")
      .toOption.get
    sw.publish()
    engine2.read(table).select("doc_id").as[Long].collect().toSet shouldBe Set(9L)
    // publish consumed the manifest
    VersionedTables.readStagingManifest(
      engine.spark.sparkContext.hadoopConfiguration, table.location, label) shouldBe None
    // and a second re-attach is refused: the label is committed
    engine2.findStaged(table, label, UserId("op"), "again").isLeft shouldBe true
  }

  it should "refuse a manifest-less stage that covers every head partition" in {
    val (engine, table) = fixture()
    Seq((1L, "alpha", "b0")).toDF("doc_id", "text", "batch")
      .versionedInsertInto(engine, table, UserId("writer"), "base")
    val staged = Seq((2L, "beta", "b0")).toDF("doc_id", "text", "batch")
      .stageReplaceAll(engine, table, UserId("writer"), "replace")
    // simulate a pre-manifest stage: delete the manifest out of band
    VersionedTables.deleteStagingManifest(
      engine.spark.sparkContext.hadoopConfiguration, table.location, staged.version.label)
    // the scan sees adds covering the whole head and cannot tell replace
    // from insert — refusal, not a silent downgrade
    val err = engine.findStaged(table, staged.version.label, UserId("op"), "m")
    err.isLeft shouldBe true
    err.left.toOption.get should include("cannot tell a replace-all stage from an insert")
  }

  it should "refuse a manifest-less re-attach when a staged partition dir does not parse back" in {
    val (engine, table) = fixture()
    Seq((1L, "alpha", "b0")).toDF("doc_id", "text", "batch")
      .versionedInsertInto(engine, table, UserId("writer"), "base")
    val staged = Seq((2L, "beta", "b1")).toDF("doc_id", "text", "batch")
      .stageInsertInto(engine, table, UserId("writer"), "delivery b1")
    VersionedTables.deleteStagingManifest(
      engine.spark.sparkContext.hadoopConfiguration, table.location, staged.version.label)
    // plant a staged dir whose name the partition codec rejects (empty
    // value): omitting it would publish an INCOMPLETE stage with no error,
    // so the whole re-attach must refuse instead
    val bogus = new java.io.File(new java.io.File(table.location), "batch=/" +
      graft.core.VersionPaths.VersionDirPrefix + staged.version.label)
    bogus.mkdirs() shouldBe true
    val err = engine.findStaged(table, staged.version.label, UserId("op"), "m")
    err.isLeft shouldBe true
    err.left.toOption.get should include("do not parse back")
  }

  it should "leave an abandoned stage's manifest to vacuum(includeOrphans)" in {
    val (engine, table) = fixture()
    Seq((1L, "alpha", "b0")).toDF("doc_id", "text", "batch")
      .versionedInsertInto(engine, table, UserId("writer"), "base")
    val staged = Seq((2L, "beta", "b1")).toDF("doc_id", "text", "batch")
      .stageInsertInto(engine, table, UserId("writer"), "abandoned")
    val conf = engine.spark.sparkContext.hadoopConfiguration
    VersionedTables.readStagingManifest(conf, table.location, staged.version.label) should not be None
    engine.vacuum(table, keepLast = 10, includeOrphans = true, dryRun = false)
      .failed shouldBe empty
    VersionedTables.readStagingManifest(conf, table.location, staged.version.label) shouldBe None
  }

  "auditedInsertInto(TableWide)" should "catch cross-delivery duplicates the delivery scope passes" in {
    val (engine, table) = fixture()
    val checks = Seq(Expectations.Unique(Seq("doc_id")))
    Seq((1L, "alpha", "b0")).toDF("doc_id", "text", "batch")
      .auditedInsertInto(engine, table, UserId("writer"), "b0", checks)

    // doc_id=1 again in b1: unique WITHIN the delivery, duplicate across
    val redelivery = Seq((1L, "alpha-redux", "b1")).toDF("doc_id", "text", "batch")
    val err = intercept[Expectations.ExpectationsFailedError] {
      redelivery.auditedInsertInto(engine, table, UserId("writer"), "b1", checks,
        scope = Expectations.AuditScope.TableWide)
    }
    err.results.filterNot(_.ok).map(_.violations) shouldBe Seq(1L)
    engine.read(table).count() shouldBe 1L // refused: table untouched

    // the default delivery scope documents the opposite: it publishes
    redelivery.auditedInsertInto(engine, table, UserId("writer"), "b1 again", checks)
    engine.read(table).count() shouldBe 2L
  }
}
