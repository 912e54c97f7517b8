package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.ChangeFeed._
import graft.operators.VersionedMerge._
import graft.operators.VersionedTables._

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * Round-12 capstone composition: the new pieces working as ONE pipeline —
 * stats-declared ingestion, keyed corrections via MERGE (the discovery
 * pruned to the touched day, asserted via the merge's own partition
 * bill), a downstream consumer reproducing the table from the ROW-level
 * change feed, a tagged release read back through pure SQL time travel,
 * and a selective debugging read that provably skips files. The
 * pruning-never-reads-untouched-partitions proofs live in
 * VersionedMergeSpec/ChangeFeedSpec (corrupt-the-rest laws); this spec
 * pins that the pieces COMPOSE.
 */
class Round12PipelineSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  it should "run ingestion → merge corrections → CDC consumer → tagged SQL release → skipped reads" in {
    val dir = Files.createTempDirectory("graft-r12cap-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    val table = TableDefinition(TableName("cap", "tx"),
      new File(dir, "tx").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(
        statsColumns = List("tx_id", "amount"), bloomKeyColumns = List("tx_id"))))
    engine.initTable(table, UserId("pipe"), "init")

    // ── stage 1: three daily ingests, range-split so files carry disjoint
    // tx_id ranges (the layout every later pruning stage relies on)
    def day(n: Int, ids: Range, bad: Set[Int] = Set.empty) =
      ids.map(i => (i.toLong, s"2024-02-0$n",
        if (bad(i)) -999.0 else i * 1.5, s"m$i")).toDF("tx_id", "day", "amount", "memo")
    day(1, 0 until 100).repartitionByRange(4, col("tx_id"))
      .versionedInsertInto(engine, table, UserId("pipe"), "ingest d1")
    day(2, 100 until 200, bad = Set(150, 151))
      .repartitionByRange(4, col("tx_id"))
      .versionedInsertInto(engine, table, UserId("pipe"), "ingest d2")
    day(3, 200 until 300).repartitionByRange(4, col("tx_id"))
      .versionedInsertInto(engine, table, UserId("pipe"), "ingest d3")
    engine.read(table).count() shouldBe 300

    // ── stage 2: corrections keyed by tx_id — fix the two bad rows, void
    // one tx (deleteWhen). The merge's bill pins partition granularity:
    // only day 2 was rewritten, days 1 and 3 kept their version dirs
    val fixes = Seq(
      (150L, "2024-02-02", 225.0, "m150-fixed"),
      (151L, "2024-02-02", 226.5, "m151-fixed"),
      (199L, "2024-02-02", -1.0, "void")).toDF("tx_id", "day", "amount", "memo")
    val r = engine.mergeInto(table, fixes, Seq("tx_id"), UserId("pipe"), "corrections",
      deleteWhen = Some(col("amount") < 0))
    r.rewritten.map(_.toPath) shouldBe List("day=2024-02-02")
    r.removed shouldBe Nil
    engine.read(table).count() shouldBe 299
    engine.read(table).filter(col("amount") === -999.0).count() shouldBe 0

    // ── stage 3: a downstream consumer reproduces the table PURELY from
    // per-commit row feeds (the replay law, composed over real history)
    var state = Map.empty[(Long, String), (Double, String)]
    engine.log(table.name).reverse.map(_.id).foreach { id =>
      engine.readRowChangesAt(table, Seq("tx_id", "day"), id)
        .select("tx_id", "day", "amount", "memo", ChangeFeed.ChangeTypeColumn)
        .as[(Long, String, Double, String, String)].collect()
        .foreach {
          case (k, d, _, _, "delete") => state -= ((k, d))
          case (k, d, a, m, _)        => state += (k, d) -> ((a, m))
        }
    }
    state.size shouldBe 299
    val expected = engine.read(table)
      .agg(sum(col("amount")).as("s"), count(lit(1)).as("n")).head()
    state.values.map(_._1).sum shouldBe expected.getDouble(0) +- 1e-9
    state((150L, "2024-02-02")) shouldBe ((225.0, "m150-fixed"))
    state.get((199L, "2024-02-02")) shouldBe None // voided

    // ── stage 4: pin the release, read it back through PURE SQL at the tag
    val head = engine.headCommit(table.name)
    engine.tracker.createTag(table.name, "release_1", head)
    graft.sql.GraftTableRegistry.register(engine, table)
    val sqlRow = spark.sql(
      "SELECT count(*) AS n, sum(amount) AS s FROM graft.cap.tx VERSION AS OF 'release_1'")
      .head()
    sqlRow.getLong(0) shouldBe 299
    sqlRow.getDouble(1) shouldBe expected.getDouble(0) +- 1e-9
    // ...and the pin survives LATER writes: ingest day 4, the tag still
    // reads the release exactly while plain SQL follows the head
    day(4, 300 until 320).repartitionByRange(2, col("tx_id"))
      .versionedInsertInto(engine, table, UserId("pipe"), "ingest d4")
    spark.sql("SELECT count(*) AS n FROM graft.cap.tx VERSION AS OF 'release_1'")
      .head().getLong(0) shouldBe 299
    spark.sql("SELECT count(*) AS n FROM graft.cap.tx").head().getLong(0) shouldBe 319

    // ── stage 5: selective debugging read skips files — the corrected rows
    // fetched by key range read a fraction of the table's files
    val probe = engine.readWhere(table,
      col("tx_id").between(150L, 151L) && col("day") === "2024-02-02")
    probe.select("memo").as[String].collect().sorted shouldBe
      Array("m150-fixed", "m151-fixed")
    val allFiles = engine.read(table).inputFiles.length
    withClue(s"probe ${probe.inputFiles.length} of $allFiles files: ") {
      probe.inputFiles.length should be < allFiles / 3
    }

    // ── stage 6: the ops dashboard goes metadata-only. The whole-table
    // summary folds from the same manifests every earlier stage wrote —
    // including the merge commit's (skipping survives rewrites)...
    val summary = MetadataQuery.summarize(engine, table, Seq("tx_id", "amount")).head()
    summary.getLong(0) shouldBe 319L
    summary.getLong(1) shouldBe 0L    // tx_id min
    summary.getLong(2) shouldBe 319L  // tx_id max (day 4's last ingest)
    summary.getDouble(5) shouldBe 478.5 // amount max = 319 * 1.5
    // ...and the windowed SQL count collapses to a one-row LocalRelation:
    // the WHERE is decided per partition (values are known), no scan node
    val windowed = spark.sql(
      "SELECT COUNT(*) AS n FROM graft.cap.tx WHERE day >= '2024-02-03'")
    windowed.head().getLong(0) shouldBe 120L // day 3 (100) + day 4 (20)
    val plan = windowed.queryExecution.optimizedPlan
    plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    } should not be empty
    plan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
    } shouldBe empty
  }
}
