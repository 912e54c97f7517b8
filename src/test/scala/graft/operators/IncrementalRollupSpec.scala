package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.VersionedTables._

import java.io.File
import java.nio.file.Files
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Incrementally maintained rollup == full recompute, at every commit of the
  * source's life, including partition updates and removals. */
class IncrementalRollupSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("day").agg(
      count(lit(1)).as("n"),
      sum($"value").cast("double").as("total"))

  private def newPair(): (VersionedTables, TableDefinition, TableDefinition) = {
    val dir = Files.createTempDirectory("graft-rollup-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val src = TableDefinition(TableName("test", "readings_src"),
      new File(dir, "src").toURI, PartitionSchema("day"), FileFormat.Parquet)
    val dst = TableDefinition(TableName("test", "readings_rollup"),
      new File(dir, "dst").toURI, PartitionSchema("day"), FileFormat.Parquet)
    engine.initTable(src, UserId("t"), "init src")
    engine.initTable(dst, UserId("t"), "init dst")
    (engine, src, dst)
  }

  private def head(engine: VersionedTables, t: TableDefinition): CommitId =
    engine.log(t.name).head.id

  /** dst rows in a fixed column order (the versioned read appends the
    * partition column last via partition discovery). */
  private def rollupRows(engine: VersionedTables, dst: TableDefinition) =
    engine.read(dst).select("day", "n", "total").as[(String, Long, Double)].collect().toSet

  it should "track the source through adds, updates, and removals" in {
    val (engine, src, dst) = newPair()
    val t0 = head(engine, src)

    // commit 1: d1 (2 rows) + d2
    Seq(Reading("a", "d1", 1.0), Reading("b", "d1", 2.0), Reading("c", "d2", 5.0))
      .toDS().versionedInsertInto(engine, src, UserId("t"), "load 1")
    val t1 = head(engine, src)
    val (rec1, rem1) = IncrementalRollup.refresh(engine, src, dst, t0, t1, agg, UserId("t"))
    (rec1, rem1) shouldBe ((2, 0))
    rollupRows(engine, dst) shouldBe agg(engine.read(src))
      .select("day", "n", "total").as[(String, Long, Double)].collect().toSet

    // commit 2: d2 reprocessed + d3 added — d1 must NOT be recomputed
    Seq(Reading("c", "d2", 50.0), Reading("d", "d3", 7.0))
      .toDS().versionedInsertInto(engine, src, UserId("t"), "load 2")
    val t2 = head(engine, src)
    val (rec2, rem2) = IncrementalRollup.refresh(engine, src, dst, t1, t2, agg, UserId("t"))
    (rec2, rem2) shouldBe ((2, 0))
    rollupRows(engine, dst) shouldBe agg(engine.read(src))
      .select("day", "n", "total").as[(String, Long, Double)].collect().toSet
    // d1's rollup partition was untouched: still exactly one version dir
    new File(new File(src.location.getPath).getParentFile, "dst/day=d1")
      .listFiles().count(_.getName.startsWith("_version=")) shouldBe 1

    // commit 3: replace-all WITHOUT d1 -> d1 removed from src, then from dst
    Seq(Reading("c", "d2", 50.0), Reading("d", "d3", 7.0))
      .toDS().versionedReplaceAll(engine, src, UserId("t"), "drop d1")
    val t3 = head(engine, src)
    val (rec3, rem3) = IncrementalRollup.refresh(engine, src, dst, t2, t3, agg, UserId("t"))
    rem3 shouldBe 1
    rollupRows(engine, dst) shouldBe agg(engine.read(src))
      .select("day", "n", "total").as[(String, Long, Double)].collect().toSet
    engine.read(dst).select("day").as[String].collect().toSet shouldBe Set("d2", "d3")

    // idempotence: re-running the last range changes nothing
    IncrementalRollup.refresh(engine, src, dst, t2, t3, agg, UserId("t"))
    rollupRows(engine, dst) shouldBe agg(engine.read(src))
      .select("day", "n", "total").as[(String, Long, Double)].collect().toSet

    // empty range: no commits, no changes
    val dstLog = engine.log(dst.name).length
    IncrementalRollup.refresh(engine, src, dst, t3, t3, agg, UserId("t")) shouldBe ((0, 0))
    engine.log(dst.name).length shouldBe dstLog
  }

  it should "drop the dst partition when a changed src partition aggregates to zero rows" in {
    val (engine, src, dst) = newPair()
    val t0 = head(engine, src)
    Seq(Reading("a", "d1", 1.0), Reading("b", "d2", 2.0))
      .toDS().versionedInsertInto(engine, src, UserId("t"), "load")
    val t1 = head(engine, src)
    IncrementalRollup.refresh(engine, src, dst, t0, t1, agg, UserId("t")) shouldBe ((2, 0))

    // repoint d2 to a version whose dir EXISTS but holds zero rows — the
    // adopted/repointed-to-empty case from the round-6 advice: the changed
    // partition reads empty at `to`, so its rollup row must be REMOVED,
    // not silently kept
    val emptyVersion = Version.generate()
    val d2 = Partition("day", "d2")
    val emptyDir = VersionPaths.pathFor(d2.resolvePath(src.location), emptyVersion)
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("sensor", org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType))))
      .repartition(1).write.parquet(emptyDir.toString)
    engine.tracker.commit(src.name, TableUpdate(UserId("t"), "repoint d2 empty",
      java.time.Instant.now(), List(TableOperation.AddPartitionVersion(d2, emptyVersion))))
    val t2 = head(engine, src)

    val (rec, rem) = IncrementalRollup.refresh(engine, src, dst, t1, t2, agg, UserId("t"))
    // the empty partition counts as removed, not recomputed
    (rec, rem) shouldBe ((0, 1))
    // invariant restored: dst == agg(read(src)) — d2 gone from both
    rollupRows(engine, dst) shouldBe agg(engine.read(src))
      .select("day", "n", "total").as[(String, Long, Double)].collect().toSet
    engine.read(dst).select("day").as[String].collect().toSet shouldBe Set("d1")

    // idempotence: re-running the range re-drops nothing and changes nothing
    IncrementalRollup.refresh(engine, src, dst, t1, t2, agg, UserId("t")) shouldBe ((0, 1))
    engine.read(dst).select("day").as[String].collect().toSet shouldBe Set("d1")
  }

  it should "reject snapshot tables and mismatched partition schemas" in {
    val (engine, src, _) = newPair()
    val dir = Files.createTempDirectory("graft-rollup-bad-").toFile
    val snap = TableDefinition(TableName("test", "snap"),
      new File(dir, "snap").toURI, PartitionSchema.snapshot, FileFormat.Parquet)
    val other = TableDefinition(TableName("test", "other"),
      new File(dir, "other").toURI, PartitionSchema("sensor"), FileFormat.Parquet)
    val id = head(engine, src)
    an[IllegalArgumentException] should be thrownBy
      IncrementalRollup.refresh(engine, src, snap, id, id, identity, UserId("t"))
    an[IllegalArgumentException] should be thrownBy
      IncrementalRollup.refresh(engine, src, other, id, id, identity, UserId("t"))
  }
}
