package graft.sources

import graft.core._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.net.URI

/**
 * Catalog-agnostic laws of the [[Metastore]] seam (reference
 * `core/src/test/scala/dev/chronicles/core/MetastoreSpec.scala:14-197`),
 * run over every implementation — Hive ([[HiveMetastoreContractSpec]]) and
 * Glue ([[GlueMetastoreSpec]]) — to prove the seam carries more than one
 * catalog. Implementations provide table creation in their own catalog; the
 * laws drive everything through `computeChanges` + `update`, exactly as the
 * versioning engine does.
 */
abstract class MetastoreContract extends AnyFlatSpec with Matchers {

  def metastore: Metastore

  /** Register a fresh, empty table in the backing catalog. */
  def createTable(name: String, partitionColumns: List[String]): (TableName, URI)

  private def sync(t: TableName, target: TableVersion): Unit =
    metastore.update(t, Metastore.computeChanges(metastore.currentVersion(t), target))

  "a Metastore" should "raise UnknownTableError for untracked tables" in {
    an[UnknownTableError] should be thrownBy
      metastore.currentVersion(TableName("nope", "missing"))
  }

  it should "leave state unchanged when applying an empty change list" in {
    val (t, _) = createTable("noop_t", Nil)
    val before = metastore.currentVersion(t)
    metastore.update(t, TableChanges.empty)
    metastore.currentVersion(t) shouldBe before
  }

  it should "progress snapshot versions and revert on checkout" in {
    val (t, loc) = createTable("snap_t", Nil)
    metastore.currentVersion(t) shouldBe SnapshotTableVersion(Version.Unversioned)

    val v1 = Version.generate(); val v2 = Version.generate()
    // the version directories must exist: a catalog may validate the
    // location it is pointed at (Hive does on the subsequent read)
    Seq(v1, v2).foreach(v => java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(loc).resolve(VersionPaths.VersionDirPrefix + v.label)))
    sync(t, SnapshotTableVersion(v1))
    metastore.currentVersion(t) shouldBe SnapshotTableVersion(v1)
    sync(t, SnapshotTableVersion(v2))
    metastore.currentVersion(t) shouldBe SnapshotTableVersion(v2)
    sync(t, SnapshotTableVersion(v1)) // rollback is just another sync
    metastore.currentVersion(t) shouldBe SnapshotTableVersion(v1)
  }

  it should "add, update and remove partition versions" in {
    val (t, _) = createTable("part_t", List("date"))
    metastore.currentVersion(t) shouldBe PartitionedTableVersion(Map.empty)

    val day1 = Partition("date", "2024-01-01")
    val day2 = Partition("date", "2024-01-02")
    val v1 = Version.generate(); val v2 = Version.generate(); val v3 = Version.generate()

    sync(t, PartitionedTableVersion(Map(day1 -> v1, day2 -> v2)))
    metastore.currentVersion(t) shouldBe PartitionedTableVersion(Map(day1 -> v1, day2 -> v2))

    // reprocess day1 (update), keep day2
    sync(t, PartitionedTableVersion(Map(day1 -> v3, day2 -> v2)))
    metastore.currentVersion(t) shouldBe PartitionedTableVersion(Map(day1 -> v3, day2 -> v2))

    // drop day2
    sync(t, PartitionedTableVersion(Map(day1 -> v3)))
    metastore.currentVersion(t) shouldBe PartitionedTableVersion(Map(day1 -> v3))

    sync(t, PartitionedTableVersion(Map.empty))
    metastore.currentVersion(t) shouldBe PartitionedTableVersion(Map.empty)
  }

  it should "apply a many-partition commit in one update" in {
    val (t, _) = createTable("batch_t", List("day"))
    val versions = (1 to 7).map(i => Partition("day", f"2024-01-$i%02d") -> Version.generate()).toMap
    sync(t, PartitionedTableVersion(versions))
    metastore.currentVersion(t) shouldBe PartitionedTableVersion(versions)

    val keep = versions.filter { case (p, _) => p.columnValues.head.value <= "2024-01-03" }
    sync(t, PartitionedTableVersion(keep))
    metastore.currentVersion(t) shouldBe PartitionedTableVersion(keep)
  }

  it should "support multi-column partitions" in {
    val (t, _) = createTable("multi_t", List("year", "month"))
    val p = Partition(ColumnValue(PartitionColumn("year"), "2024"),
      ColumnValue(PartitionColumn("month"), "02"))
    val v = Version.generate()
    sync(t, PartitionedTableVersion(Map(p -> v)))
    metastore.currentVersion(t) shouldBe PartitionedTableVersion(Map(p -> v))
  }
}

/** The contract over the Glue-shaped catalog (in-memory API stub with the
  * real catalog's error semantics) — the A11 seam proven on a second,
  * non-Hive metastore. */
class GlueMetastoreSpec extends MetastoreContract {

  val glue = new InMemoryGlueApi
  override val metastore = new GlueMetastore(glue)

  override def createTable(name: String, partitionColumns: List[String]): (TableName, URI) = {
    val location = java.nio.file.Files.createTempDirectory(s"glue-$name-").toUri
    glue.registerTable(GlueTableInfo("glue_db", name, partitionColumns,
      GlueStorage(location.toString.stripSuffix("/"),
        inputFormat = Some("org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat"),
        outputFormat = Some("org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat"),
        serdeLibrary = Some("org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe"))))
    (TableName("glue_db", name), location)
  }

  "GlueMetastore" should "copy the table's format params onto every partition it writes" in {
    val (t, _) = createTable("fmt_t", List("date"))
    val v = Version.generate()
    metastore.update(t, TableChanges(List(
      MetastoreOperation.AddPartition(Partition("date", "2024-03-01"), v))))
    val stored = glue.getPartitions("glue_db", "fmt_t").head
    stored.storage.inputFormat shouldBe defined
    stored.storage.outputFormat shouldBe defined
    stored.storage.serdeLibrary shouldBe defined
    stored.storage.location should endWith(s"date=2024-03-01/_version=${v.label}/")
  }

  it should "surface catalog errors instead of masking them (double add, update of missing)" in {
    val (t, _) = createTable("err_t", List("date"))
    val p = Partition("date", "2024-04-01")
    val add = TableChanges(List(MetastoreOperation.AddPartition(p, Version.generate())))
    metastore.update(t, add)
    a[GlueAlreadyExists] should be thrownBy metastore.update(t, add)
    a[GlueEntityNotFound] should be thrownBy metastore.update(t, TableChanges(List(
      MetastoreOperation.UpdatePartitionVersion(Partition("date", "1999-01-01"), Version.generate()))))
  }

  it should "widen the column list on UpdateSchema — additive, idempotent, never retyping" in {
    val (t, _) = createTable("evo_t", List("date"))
    val schema1 =
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":{}},
        |{"name":"date","type":"string","nullable":true,"metadata":{}}]}""".stripMargin
    metastore.update(t, TableChanges(List(MetastoreOperation.UpdateSchema(schema1))))
    glue.getTable("glue_db", "evo_t").get.columns shouldBe List("id" -> "bigint")
    // evolution adds score; partition keys never join the column list
    val schema2 =
      """{"type":"struct","fields":[
        |{"name":"id","type":"long","nullable":true,"metadata":{}},
        |{"name":"score","type":"double","nullable":true,"metadata":{}},
        |{"name":"date","type":"string","nullable":true,"metadata":{}}]}""".stripMargin
    metastore.update(t, TableChanges(List(MetastoreOperation.UpdateSchema(schema2))))
    glue.getTable("glue_db", "evo_t").get.columns shouldBe
      List("id" -> "bigint", "score" -> "double")
    // idempotent: re-applying the same schema changes nothing
    metastore.update(t, TableChanges(List(MetastoreOperation.UpdateSchema(schema2))))
    glue.getTable("glue_db", "evo_t").get.columns shouldBe
      List("id" -> "bigint", "score" -> "double")
  }

  it should "refuse deletion-vector marker versions like the Hive catalog does" in {
    val (t, _) = createTable("dv_t", List("date"))
    an[IllegalArgumentException] should be thrownBy metastore.update(t,
      TableChanges(List(MetastoreOperation.AddPartition(
        Partition("date", "2024-01-01"), Version.generateDeleteMarker()))))
  }

  it should "swap the trailing _version element on snapshot updates, preserving the base path" in {
    val (t, _) = createTable("swap_t", Nil)
    val v1 = Version.generate(); val v2 = Version.generate()
    metastore.update(t, TableChanges(List(MetastoreOperation.UpdateTableVersion(v1))))
    val loc1 = glue.getTable("glue_db", "swap_t").get.storage.location
    loc1 should endWith(s"/_version=${v1.label}/")
    metastore.update(t, TableChanges(List(MetastoreOperation.UpdateTableVersion(v2))))
    val loc2 = glue.getTable("glue_db", "swap_t").get.storage.location
    loc2 should endWith(s"/_version=${v2.label}/")
    // the second swap replaced the version element instead of nesting it
    loc2 should not include v1.label
    VersionPaths.versionedToBasePath(new URI(loc2)) shouldBe
      VersionPaths.versionedToBasePath(new URI(loc1))
  }
}

/** The same contract over the Hive/Derby-backed implementation — in addition
  * to the Hive-specific end-to-end visibility tests in
  * [[SparkHiveMetastoreSpec]]. */
class HiveMetastoreContractSpec extends MetastoreContract {

  lazy val spark = graft.TestSpark.spark
  override lazy val metastore: Metastore = new SparkHiveMetastore(spark)

  override def createTable(name: String, partitionColumns: List[String]): (TableName, URI) = {
    spark.sql("CREATE DATABASE IF NOT EXISTS contract_db")
    val location = java.nio.file.Files.createTempDirectory(s"hive-$name-").toUri
    val partitionClause =
      if (partitionColumns.isEmpty) ""
      else partitionColumns.map(c => s"`$c` STRING").mkString("PARTITIONED BY (", ", ", ")")
    spark.sql(
      s"""CREATE EXTERNAL TABLE contract_db.$name (value STRING)
         |$partitionClause STORED AS PARQUET
         |LOCATION '${location.toString.stripSuffix("/")}'""".stripMargin)
    (TableName("contract_db", name), location)
  }
}
