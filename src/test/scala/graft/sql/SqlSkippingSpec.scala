package graft.sql

import graft.TestSpark
import graft.core._
import graft.operators.{TableStats, VersionedTables}
import graft.operators.VersionedTables._

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Optimizer-time data skipping (graft.sql.GraftDataSkipping): SQL `WHERE`
  * over the graft catalog and plain `read().filter(…)` both get the same
  * manifest-driven file pruning as `readWhere` — proven by plan inspection
  * (the pruned FileIndex in the optimized plan), by corrupting the pruned
  * files in place (a read that touched them would fail loudly), and by
  * value equality against the skipping-disabled reference. */
class SqlSkippingSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark

  private def newEngine(): (VersionedTables, File) = {
    val dir = Files.createTempDirectory("graft-sqlskip-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    (engine, dir)
  }

  private val cfg = ColumnStatsConfig(
    statsColumns = List("id", "v", "cat"), bloomKeyColumns = List("id"),
    bloomExpectedItems = 1000)

  /** The shared skipping layout ([[graft.StatsFixtures.rangeEvents]]).
    * Unique table name per call — the SQL registry is global. */
  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def fixture(statsCfg: Option[ColumnStatsConfig] = Some(cfg))
      : (VersionedTables, TableDefinition) =
    graft.StatsFixtures.rangeEvents(spark, "sqlskip", s"events_${seq.incrementAndGet()}", statsCfg)

  private def withSkippingDisabled[T](f: => T): T = {
    spark.conf.set(GraftDataSkipping.EnabledKey, "false")
    try f finally spark.conf.set(GraftDataSkipping.EnabledKey, "true")
  }

  /** The pruned file indexes the optimizer put into `df`'s plan (empty =
    * the skipping rule did not fire). */
  private def prunedIndexes(df: DataFrame): Seq[PrunedGraftFileIndex] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location match {
          case p: PrunedGraftFileIndex => Some(p)
          case _                       => None
        }
        case _ => None
      }
    }.flatten

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.select("id", "day", "v", "cat").collect().map(_.toSeq).toSeq.sortBy(_.toString)

  behavior of "transparent skipping on read().filter"

  it should "prune files in the optimized plan and match the unpruned reference" in {
    val (engine, table) = fixture()
    val pred = col("id") < 100

    val skipped = engine.read(table).filter(pred)
    val idx = prunedIndexes(skipped)
    idx should have size 1
    // ~1 of 4 range files per partition (+ sampled-boundary slack)
    idx.head.inputFiles.length should be <= 8
    idx.head.inputFiles.length should be >= 4

    val reference = withSkippingDisabled {
      val df = engine.read(table).filter(pred)
      prunedIndexes(df) shouldBe empty // conf off: rule must not fire
      rows(df)
    }
    rows(skipped) should contain theSameElementsInOrderAs reference
  }

  it should "shrink sizeInBytes so the pruned side is honestly smaller" in {
    val (engine, table) = fixture()
    val full = engine.read(table)
    val fullSize = full.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation.asInstanceOf[HadoopFsRelation].location.sizeInBytes
    }.head
    val idx = prunedIndexes(engine.read(table).filter(col("id") === 17))
    idx should have size 1
    idx.head.sizeInBytes should be < fullSize
    idx.head.sizeInBytes should be > 0L
  }

  it should "leave non-pruning predicates, stats-less tables and disabled sessions untouched" in {
    // every file holds cat a..c → nothing prunable: the rule must keep the
    // ORIGINAL relation (no pointless index swap)
    val (engine, table) = fixture()
    prunedIndexes(engine.read(table).filter(col("cat") === "b")) shouldBe empty

    // no ColumnStatsConfig → never recorded → never swapped
    val (engine2, table2) = fixture(statsCfg = None)
    prunedIndexes(engine2.read(table2).filter(col("id") < 100)) shouldBe empty
  }

  it should "stay correct (and keep files) for predicates the evaluator cannot bound" in {
    val (engine, table) = fixture()
    // arithmetic atom: conservative, no swap, exact result
    val df = engine.read(table).filter((col("id") + 1) > 395)
    prunedIndexes(df) shouldBe empty
    df.count() shouldBe 5 * 4 // ids 395..399 in each of 4 days
  }

  behavior of "SQL WHERE over the graft catalog"

  it should "prune through spark.sql text and equal the plain-filter reference" in {
    val (engine, table) = fixture()
    GraftTableRegistry.register(engine, table)
    val sql = s"SELECT id, day, v, cat FROM graft.${table.name.fullyQualifiedName} WHERE id < 100"

    val skipped = spark.sql(sql)
    val idx = prunedIndexes(skipped)
    idx should have size 1
    idx.head.inputFiles.length should be <= 8

    val reference = withSkippingDisabled(rows(spark.sql(sql)))
    rows(skipped) should contain theSameElementsInOrderAs reference
    reference.size shouldBe 100 * 4
  }

  it should "never read pruned files: corrupting them in place leaves the query exact" in {
    val (engine, table) = fixture()
    GraftTableRegistry.register(engine, table)
    val sql = s"SELECT id, day, v, cat FROM graft.${table.name.fullyQualifiedName} WHERE id < 100"
    val expected = withSkippingDisabled(rows(spark.sql(sql)))

    // corrupt every data file the skip planner would NOT load
    val decision = TableStats.planRead(engine, table,
      engine.tracker.currentVersion(table.name), col("id") < 100)
    val keptAbs = decision.paths
      .map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath).toSet
    val corrupted = graft.StatsFixtures.corruptParquet(table,
      spare = f => keptAbs.contains(f.getAbsolutePath))
    corrupted should be >= 8 // most of the 16 files are out of range

    // the skipping read never opens them — still exact
    rows(spark.sql(sql)) should contain theSameElementsInOrderAs expected
    // ...while a genuinely-unpruned read fails loudly, proving the
    // corruption took (and that skipping was what saved the query)
    withSkippingDisabled {
      intercept[Exception](spark.sql(sql).collect())
    }
  }

  it should "skip under VERSION AS OF time travel with the pinned version's manifest" in {
    val (engine, table) = fixture()
    GraftTableRegistry.register(engine, table)
    val c0 = engine.headCommit(table.name)
    // reprocess day 1 with ids shifted to 1000+ — head and c0 prune differently
    spark.range(400).select(
        (col("id") + 1000).as("id"), lit("2024-01-01").as("day"),
        col("id").cast("double").as("v"), lit("z").as("cat"))
      .repartitionByRange(2, col("id"))
      .versionedInsertInto(engine, table, UserId("t"), "reprocess day 1")

    val asOf = spark.sql(
      s"""SELECT id, day, v, cat FROM graft.${table.name.fullyQualifiedName}
         |VERSION AS OF '${c0.id}' WHERE id < 100""".stripMargin)
    val idx = prunedIndexes(asOf)
    idx should have size 1
    idx.head.inputFiles.length should be <= 8
    asOf.count() shouldBe 100 * 4 // the ORIGINAL state, all four days

    // head: day 1 holds no id < 100 → all its files pruned
    val head = spark.sql(
      s"SELECT id FROM graft.${table.name.fullyQualifiedName} WHERE id < 100")
    prunedIndexes(head).head.inputFiles.length should be <= 6
    head.count() shouldBe 100 * 3
  }

  behavior of "metadata-only SQL aggregates (GraftMetadataAggregate)"

  private def corruptAll(table: TableDefinition): Int =
    graft.StatsFixtures.corruptParquet(table)

  private def isMetadataAnswered(df: DataFrame): Boolean = {
    val plan = df.queryExecution.optimizedPlan
    val hasLocal = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.nonEmpty
    val hasScan = plan.collect { case lr: LogicalRelation => lr }.nonEmpty
    hasLocal && !hasScan
  }

  it should "collapse global COUNT/MIN/MAX to a LocalRelation that survives total corruption" in {
    val (engine, table) = fixture()
    GraftTableRegistry.register(engine, table)
    val sql = s"""SELECT COUNT(*) AS n, COUNT(v) AS nv, MIN(id) AS mn, MAX(id) AS mx
                 |FROM graft.${table.name.fullyQualifiedName}""".stripMargin

    val df = spark.sql(sql)
    isMetadataAnswered(df) shouldBe true
    val r = df.head()
    r.getLong(0) shouldBe 1600L
    r.getLong(1) shouldBe 1440L // v null on every 10th id
    r.getLong(2) shouldBe 0L
    r.getLong(3) shouldBe 399L

    // analyzed-but-unexecuted frames: building a v1 relation reads ONE
    // footer for schema inference, so analysis must precede the corruption
    // — what the law pins is that EXECUTION never touches the data
    val again = spark.sql(sql)
    val real = withSkippingDisabled {
      val d = spark.sql(sql)
      // the conf is read at OPTIMIZATION time — force the unrewritten
      // plan while still disabled
      isMetadataAnswered(d) shouldBe false
      d
    }

    corruptAll(table) shouldBe 16
    // the metadata answer never opens a file — still exact
    again.head() shouldBe r
    // ...while the genuine aggregation must read the (now corrupt) files
    intercept[Exception](real.collect())
  }

  it should "not rewrite data-column WHERE / DISTINCT / unsupported aggregates" in {
    val (engine, table) = fixture()
    GraftTableRegistry.register(engine, table)
    val t = s"graft.${table.name.fullyQualifiedName}"
    isMetadataAnswered(spark.sql(s"SELECT COUNT(*) AS n FROM $t WHERE id < 10")) shouldBe false
    isMetadataAnswered(spark.sql(s"SELECT COUNT(DISTINCT id) AS n FROM $t")) shouldBe false
    isMetadataAnswered(spark.sql(s"SELECT AVG(id) AS a FROM $t")) shouldBe false
    // and the unrewritten plans still answer correctly
    spark.sql(s"SELECT COUNT(*) AS n FROM $t WHERE id < 10").head().getLong(0) shouldBe 40L
    spark.sql(s"SELECT AVG(id) AS a FROM $t").head().getDouble(0) shouldBe 199.5
  }

  behavior of "GROUP BY partition-column metadata aggregates"

  it should "fold per-group from manifests into a multi-row LocalRelation that survives corruption" in {
    val (engine, table) = fixture()
    GraftTableRegistry.register(engine, table)
    val t = s"graft.${table.name.fullyQualifiedName}"
    val sql = s"""SELECT day, COUNT(*) AS n, COUNT(v) AS nv, MIN(id) AS mn, MAX(id) AS mx
                 |FROM $t GROUP BY day""".stripMargin

    val df = spark.sql(sql)
    isMetadataAnswered(df) shouldBe true
    val got = df.collect().map(_.toSeq).sortBy(_.head.toString)
    got should have size 4
    got.foreach { r =>
      r(1) shouldBe 400L; r(2) shouldBe 360L; r(3) shouldBe 0L; r(4) shouldBe 399L
    }
    // figures equal the genuinely-scanned reference
    val ref = withSkippingDisabled {
      val d = spark.sql(sql)
      isMetadataAnswered(d) shouldBe false
      d.collect().map(_.toSeq).sortBy(_.head.toString)
    }
    got shouldBe ref

    // the analyzed frame never opens a data file
    val again = spark.sql(sql)
    corruptAll(table) shouldBe 16
    again.collect().map(_.toSeq).sortBy(_.head.toString) shouldBe ref
  }

  it should "compose GROUP BY with a partition WHERE, HAVING and grouped-key aggregates" in {
    val (engine, table) = fixture()
    GraftTableRegistry.register(engine, table)
    val t = s"graft.${table.name.fullyQualifiedName}"

    val filtered = spark.sql(
      s"""SELECT day, COUNT(*) AS n FROM $t
         |WHERE day >= '2024-01-02' GROUP BY day""".stripMargin)
    isMetadataAnswered(filtered) shouldBe true
    filtered.collect().map(_.getLong(1)).toSeq shouldBe Seq(400L, 400L, 400L)

    // HAVING over a supported aggregate: a Filter above the Aggregate —
    // rides on top of the LocalRelation untouched
    val having = spark.sql(
      s"SELECT day, MAX(id) AS mx FROM $t GROUP BY day HAVING COUNT(*) > 1")
    isMetadataAnswered(having) shouldBe true
    having.count() shouldBe 4

    // selecting the grouped key + aggregates OVER the key itself
    val keyAgg = spark.sql(
      s"SELECT day, MIN(day) AS mn, COUNT(day) AS n FROM $t GROUP BY day")
    isMetadataAnswered(keyAgg) shouldBe true
    keyAgg.collect().foreach { r => r.get(0) shouldBe r.get(1); r.getLong(2) shouldBe 400L }
  }

  it should "group the null partition as a NULL key" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("sqlskip", s"gbnull_${seq.incrementAndGet()}"),
      new File(dir, "gbnull").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("id"))))
    engine.initTable(table, UserId("t"), "init")
    spark.range(300).select(col("id"),
        when(col("id") % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("d"), (col("id") % 2).cast("string"))).as("day"))
      .repartition(col("day"))
      .versionedInsertInto(engine, table, UserId("t"), "load with null partition")
    GraftTableRegistry.register(engine, table)
    val sql = s"SELECT day, COUNT(*) AS n FROM graft.${table.name.fullyQualifiedName} GROUP BY day"
    val df = spark.sql(sql)
    isMetadataAnswered(df) shouldBe true
    val got = df.collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    got shouldBe Map(None -> 100L, Some("d0") -> 100L, Some("d1") -> 100L)
    got shouldBe withSkippingDisabled(
      spark.sql(sql).collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap)
  }

  it should "refuse data-column grouping, derived grouping keys and uncovered groups" in {
    val (engine, table) = fixture()
    GraftTableRegistry.register(engine, table)
    val t = s"graft.${table.name.fullyQualifiedName}"
    // data column grouping: partition values say nothing about it
    isMetadataAnswered(spark.sql(s"SELECT cat, COUNT(*) AS n FROM $t GROUP BY cat")) shouldBe false
    // a FUNCTION of the partition column: no longer a known scalar per
    // partition in the plan's terms — refuse (Spark computes it exactly)
    isMetadataAnswered(spark.sql(
      s"SELECT year(day) AS y, COUNT(*) AS n FROM $t GROUP BY year(day)")) shouldBe false
    // mixed partition+data grouping refuses too
    isMetadataAnswered(spark.sql(
      s"SELECT day, cat, COUNT(*) AS n FROM $t GROUP BY day, cat")) shouldBe false
    // ...and each refused plan still answers correctly
    spark.sql(s"SELECT cat, COUNT(*) AS n FROM $t GROUP BY cat").count() shouldBe 3

    // delete ONE partition version's manifest: its group is uncovered →
    // the whole rewrite refuses and the scan answers
    val conf = spark.sparkContext.hadoopConfiguration
    val label = engine.tracker.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion].partitionVersions.values.head.label
    graft.operators.TableStats.deleteManifest(conf, table.location, label)
    val df = spark.sql(s"SELECT day, COUNT(*) AS n FROM $t GROUP BY day")
    isMetadataAnswered(df) shouldBe false
    df.collect().map(_.getLong(1)).sum shouldBe 1600L
  }

  it should "answer VERSION AS OF aggregates from the pinned version's manifests" in {
    val (engine, table) = fixture()
    GraftTableRegistry.register(engine, table)
    val c0 = engine.headCommit(table.name)
    spark.range(50).select(
        (col("id") + 7000).as("id"), lit("2024-01-02").as("day"),
        lit(1.0).as("v"), lit("z").as("cat"))
      .repartition(1)
      .versionedInsertInto(engine, table, UserId("t"), "reprocess day 2")

    val t = s"graft.${table.name.fullyQualifiedName}"
    val head = spark.sql(s"SELECT COUNT(*) AS n, MAX(id) AS mx FROM $t")
    val asOf = spark.sql(s"SELECT COUNT(*) AS n, MAX(id) AS mx FROM $t VERSION AS OF '${c0.id}'")
    isMetadataAnswered(head) shouldBe true
    isMetadataAnswered(asOf) shouldBe true
    head.head().toSeq shouldBe Seq(1600L - 400L + 50L, 7049L)
    asOf.head().toSeq shouldBe Seq(1600L, 399L)
  }

  it should "refuse NaN-touched bounds but still answer COUNT from metadata" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("sqlskip", s"nan_${seq.incrementAndGet()}"),
      new File(dir, "nan").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("x"))))
    engine.initTable(table, UserId("t"), "init")
    spark.range(100).select(
        lit("d1").as("day"),
        when(col("id") === 50, lit(Double.NaN)).otherwise(col("id").cast("double")).as("x"))
      .repartition(1).versionedInsertInto(engine, table, UserId("t"), "load with NaN")
    GraftTableRegistry.register(engine, table)
    val t = s"graft.${table.name.fullyQualifiedName}"

    // MAX(x): the NaN made the manifest bound unrepresentable → real scan
    val mx = spark.sql(s"SELECT MAX(x) AS mx FROM $t")
    isMetadataAnswered(mx) shouldBe false
    mx.head().getDouble(0).isNaN shouldBe true
    // COUNT needs no bounds → still metadata-answered on the same table,
    // for COUNT(*) AND for COUNT(x) itself (null counts are always exact)
    val cnt = spark.sql(s"SELECT COUNT(*) AS n, COUNT(x) AS nx FROM $t")
    isMetadataAnswered(cnt) shouldBe true
    cnt.head().toSeq shouldBe Seq(100L, 100L) // NaN is not NULL — COUNT keeps it
    // ...but mixing in a bounds request drops the whole query to the scan
    isMetadataAnswered(spark.sql(s"SELECT COUNT(x) AS nx, MAX(x) AS mx FROM $t")) shouldBe false
  }

  it should "answer partition-filtered aggregates exactly (two-valued partition eval)" in {
    val (engine, table) = fixture()
    GraftTableRegistry.register(engine, table)
    val t = s"graft.${table.name.fullyQualifiedName}"

    // equality on the partition column: one partition's fold
    val eq = spark.sql(
      s"SELECT COUNT(*) AS n, MIN(id) AS mn, MAX(id) AS mx FROM $t WHERE day = '2024-01-02'")
    isMetadataAnswered(eq) shouldBe true
    eq.head().toSeq shouldBe Seq(400L, 0L, 399L)

    // range + IN on the partition column
    val gt = spark.sql(s"SELECT COUNT(*) AS n FROM $t WHERE day > '2024-01-01'")
    isMetadataAnswered(gt) shouldBe true
    gt.head().getLong(0) shouldBe 1200L
    val in = spark.sql(
      s"SELECT COUNT(*) AS n, MAX(id) AS mx FROM $t WHERE day IN ('2024-01-01', '2024-01-03')")
    isMetadataAnswered(in) shouldBe true
    in.head().toSeq shouldBe Seq(800L, 399L)

    // aggregates OVER the partition column: values fold exactly (typed as
    // partition discovery types them — DATE here)
    val pc = spark.sql(s"SELECT MIN(day) AS mn, MAX(day) AS mx, COUNT(day) AS n FROM $t")
    isMetadataAnswered(pc) shouldBe true
    pc.head().toSeq shouldBe Seq(
      java.sql.Date.valueOf("2024-01-01"), java.sql.Date.valueOf("2024-01-04"), 1600L)

    // all figures match the genuinely-scanned reference
    val refSql = s"SELECT COUNT(*) AS n, MIN(id) AS mn FROM $t WHERE day <> '2024-01-03'"
    val got = spark.sql(refSql)
    isMetadataAnswered(got) shouldBe true
    got.head().toSeq shouldBe withSkippingDisabled(spark.sql(refSql).head().toSeq)
  }

  it should "fold the null partition soundly under filters and partition-column aggregates" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("sqlskip", s"nullpart_${seq.incrementAndGet()}"),
      new File(dir, "nullpart").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("id"))))
    engine.initTable(table, UserId("t"), "init")
    spark.range(300).select(col("id"),
        when(col("id") % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("d"), (col("id") % 2).cast("string"))).as("day"))
      .repartition(col("day"))
      .versionedInsertInto(engine, table, UserId("t"), "load with null partition")
    GraftTableRegistry.register(engine, table)
    val t = s"graft.${table.name.fullyQualifiedName}"

    // WHERE day = 'd0': the null partition is excluded (SQL: NULL ≠ 'd0')
    val eq = spark.sql(s"SELECT COUNT(*) AS n FROM $t WHERE day = 'd0'")
    isMetadataAnswered(eq) shouldBe true
    eq.head().getLong(0) shouldBe 100L // ids ≡ 1,3,5 mod 6 → even half of non-null

    // IS NULL keeps exactly the null partition
    val isNull = spark.sql(s"SELECT COUNT(*) AS n FROM $t WHERE day IS NULL")
    isMetadataAnswered(isNull) shouldBe true
    isNull.head().getLong(0) shouldBe 100L

    // COUNT(day) excludes the null partition's rows; MIN skips them
    val agg = spark.sql(s"SELECT COUNT(day) AS n, MIN(day) AS mn FROM $t")
    isMetadataAnswered(agg) shouldBe true
    agg.head().toSeq shouldBe Seq(200L, "d0")

    // every figure equals the scanned truth
    Seq(
      s"SELECT COUNT(*) AS n FROM $t WHERE day = 'd0'",
      s"SELECT COUNT(*) AS n FROM $t WHERE day IS NULL",
      s"SELECT COUNT(day) AS n, MIN(day) AS mn, MAX(day) AS mx FROM $t"
    ).foreach { q =>
      spark.sql(q).head().toSeq shouldBe withSkippingDisabled(spark.sql(q).head().toSeq)
    }
  }

  it should "refuse data-column filters for the aggregate rewrite but still answer them" in {
    val (engine, table) = fixture()
    GraftTableRegistry.register(engine, table)
    val t = s"graft.${table.name.fullyQualifiedName}"
    // id is a data column: per-partition eval would be a guess → no rewrite,
    // and the skipping rule prunes the scan instead
    val df = spark.sql(s"SELECT COUNT(*) AS n FROM $t WHERE id = 17 AND day = '2024-01-02'")
    isMetadataAnswered(df) shouldBe false
    prunedIndexes(df) should have size 1
    df.head().getLong(0) shouldBe 1L
  }

  it should "prune by partition Bloom through SQL text (unclustered point lookup)" in {
    // grp partitions, files hash-split on a bucket uncorrelated with id:
    // every file's id range contains the needle, so only the Bloom prunes —
    // the same planRead path q_bloom_skip_scan gates (resolved
    // AttributeReference + post-analysis literal, vs readWhere's unresolved
    // Column in TableStatsSpec)
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("sqlskip", s"bloom_${seq.incrementAndGet()}"),
      new File(dir, "bloom").toURI, PartitionSchema("grp"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("id"), bloomKeyColumns = List("id"),
        bloomExpectedItems = 2000)))
    engine.initTable(table, UserId("t"), "init")
    spark.range(2000).select(
        (col("id") * 2).as("id"),
        concat(lit("g"), (col("id") % 5).cast("string")).as("grp"),
        pmod(xxhash64(col("id") + 7), lit(4)).as("bucket"))
      .repartition(4, col("bucket")).drop("bucket")
      .versionedInsertInto(engine, table, UserId("t"), "load hash-split")
    GraftTableRegistry.register(engine, table)
    val all = engine.read(table).inputFiles.length
    val df = spark.sql(
      s"SELECT id, grp FROM graft.${table.name.fullyQualifiedName} WHERE id = 1234")
    val idx = prunedIndexes(df)
    idx should have size 1
    idx.head.inputFiles.length should be <= all / 3 // ~one partition of five (+fp slack)
    df.collect().map(_.toSeq) shouldBe Seq(Seq(1234L, "g2"))
  }

  it should "prune big IN lists too (InSet re-expressed for the evaluator)" in {
    val (engine, table) = fixture()
    GraftTableRegistry.register(engine, table)
    // 15 > the 10-item In→InSet optimizer threshold; all ids in [0, 15)
    val ids = (0 until 15).mkString(", ")
    val df = spark.sql(
      s"SELECT id, day FROM graft.${table.name.fullyQualifiedName} WHERE id IN ($ids)")
    val idx = prunedIndexes(df)
    idx should have size 1
    idx.head.inputFiles.length should be <= 8
    df.count() shouldBe 15 * 4
  }
}
