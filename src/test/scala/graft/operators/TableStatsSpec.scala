package graft.operators

import graft.TestSpark
import graft.core._
import graft.operators.TableStats._
import graft.operators.VersionedTables._

import java.io.File
import java.nio.file.Files
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Commit-time stats manifest + data-skipping reads (TableStats): manifest
  * shape, the conservative three-valued skip evaluator, and the law that
  * `readWhere` ALWAYS equals `read().filter` while scanning fewer files. */
class TableStatsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newEngine(): (VersionedTables, File) = {
    val dir = Files.createTempDirectory("graft-stats-").toFile
    val engine = VersionedTables.withFileStore(spark, new File(dir, "store").toURI)
    (engine, dir)
  }

  /** 4 date partitions × ids 0..399, ids range-split into 4 files per
    * partition; `v` is null for every 10th id; `cat` cycles a/b/c. */
  private def fixture(statsCfg: Option[ColumnStatsConfig]): (VersionedTables, TableDefinition) = {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "stats_events"),
      new File(dir, "stats_events").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = statsCfg)
    engine.initTable(table, UserId("t"), "init")
    val df = spark.range(1600).select(
      (col("id") % 400).as("id"),
      concat(lit("2024-01-0"), (floor(col("id") / 400) + 1).cast("int").cast("string")).as("day"),
      when(col("id") % 10 === 0, lit(null).cast("double"))
        .otherwise(col("id").cast("double") * 1.5).as("v"),
      element_at(array(lit("a"), lit("b"), lit("c")), (col("id") % 3 + 1).cast("int")).as("cat"))
    // range-split on id INSIDE each day so each partition dir gets several
    // files with disjoint id ranges — the layout data skipping rewards
    df.repartitionByRange(4, col("id"))
      .versionedInsertInto(engine, table, UserId("t"), "load")
    (engine, table)
  }

  private val cfg = ColumnStatsConfig(
    statsColumns = List("id", "v", "cat"), bloomKeyColumns = List("id"),
    bloomExpectedItems = 1000)

  behavior of "stats collection"

  it should "write a per-file manifest with exact min/max/null counts and partition blooms" in {
    val (engine, table) = fixture(Some(cfg))
    val label = engine.tracker.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion].partitionVersions.values.head.label
    val m = TableStats.readManifest(
      spark.sparkContext.hadoopConfiguration, table.location, label).get
    m.statsColumns shouldBe List("id", "v", "cat")
    m.bloomKeyColumns shouldBe List("id")
    m.files should have size 16 // 4 partitions × 4 range files
    m.files.map(_.partition).distinct.sorted shouldBe
      List("day=2024-01-01", "day=2024-01-02", "day=2024-01-03", "day=2024-01-04")
    // per-file ranges are disjoint per partition and cover 0..399
    val perPart = m.files.groupBy(_.partition)
    perPart.values.foreach { files =>
      files.map(_.rows).sum shouldBe 400
      val ranges = files.map { f =>
        val cs = f.columns("id")
        (cs.min.get.toLong, cs.max.get.toLong)
      }.sortBy(_._1)
      ranges.head._1 shouldBe 0L
      ranges.last._2 shouldBe 399L
      ranges.sliding(2).foreach {
        case Seq((_, hi), (lo2, _)) => hi should be < lo2
        case _ => ()
      }
      // v is null on every 10th id; per-file null counts sum to 40
      files.map(_.columns("v").nullCount).sum shouldBe 40
      // cat covers all three values in every file of this size
      files.foreach { f =>
        f.columns("cat").min.get shouldBe "a"
        f.columns("cat").max.get shouldBe "c"
      }
    }
    // partition blooms: every id in, disjoint ids mostly out
    m.partitionBlooms.keySet shouldBe perPart.keySet
    val bloom = TableStats.deserializeBloom(m.partitionBlooms("day=2024-01-01"))
    val hashes = spark.range(400).select(TableStats.keyHashColumn(Seq("id")).as("h"))
      .as[Long].collect()
    hashes.foreach(h => bloom.mightContainLong(h) shouldBe true)
    val misses = spark.range(400).withColumn("id2", col("id") + 1000000)
      .select(xxhash64(col("id2")).as("h")).as[Long].collect()
      .count(bloom.mightContainLong)
    misses.toDouble / 400 should be < 0.2 // fpp 0.03 configured, generous bound
  }

  it should "survive a JSON round-trip byte-identically" in {
    val (engine, table) = fixture(Some(cfg))
    val label = engine.tracker.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion].partitionVersions.values.head.label
    val m = TableStats.readManifest(
      spark.sparkContext.hadoopConfiguration, table.location, label).get
    val back = TableStats.fromJson(TableStats.toJson(m)).toOption.get
    back.copy(partitionBlooms = Map.empty) shouldBe m.copy(partitionBlooms = Map.empty)
    back.partitionBlooms.keySet shouldBe m.partitionBlooms.keySet
    back.partitionBlooms.foreach { case (k, v) =>
      v should equal(m.partitionBlooms(k))
    }
  }

  behavior of "readWhere"

  private def checkEquivalent(
      engine: VersionedTables, table: TableDefinition, pred: Column): Long = {
    val skipped = engine.readWhere(table, pred)
    val plain = engine.read(table).filter(pred)
    val s = skipped.select("id", "day", "v", "cat").collect().map(_.toSeq).sortBy(_.toString)
    val p = plain.select("id", "day", "v", "cat").collect().map(_.toSeq).sortBy(_.toString)
    s should contain theSameElementsInOrderAs p
    skipped.inputFiles.length.toLong
  }

  it should "equal read().filter for a battery of predicates while scanning fewer files" in {
    val (engine, table) = fixture(Some(cfg))
    val allFiles = engine.read(table).inputFiles.length.toLong
    allFiles shouldBe 16

    // selective id range: ~1 of 4 range files per partition (range-split
    // boundaries are sampled, so allow one boundary file of slack)
    checkEquivalent(engine, table, col("id") < 100) should be <= 8L
    checkEquivalent(engine, table, col("id") >= 350) should be <= 8L
    // equality: exactly one file per partition
    checkEquivalent(engine, table, col("id") === 17) shouldBe 4L
    // partition-column predicate: whole-partition prune, no file listing
    checkEquivalent(engine, table, col("day") === "2024-01-02") shouldBe 4L
    // combined: one file of one partition
    checkEquivalent(engine, table, col("day") === "2024-01-02" && col("id") === 17) shouldBe 1L
    // negated equality on the partition column
    checkEquivalent(engine, table, col("day") =!= "2024-01-02") shouldBe 12L
    // In on the partition column
    checkEquivalent(engine, table, col("day").isin("2024-01-01", "2024-01-03")) shouldBe 8L
    // negation pushes through: NOT(id < 300) ≡ id >= 300
    checkEquivalent(engine, table, !(col("id") < 300)) should be <= 8L
    // string stats: every file holds a..c, so this prunes nothing but stays correct
    checkEquivalent(engine, table, col("cat") === "b") shouldBe 16L
    // impossible predicate: zero files, empty result
    checkEquivalent(engine, table, col("id") > 10000) shouldBe 0L
    // disjunction across partitions and ranges
    checkEquivalent(engine, table,
      (col("day") === "2024-01-01" && col("id") < 50) || col("id") > 380) should be <= 8L
    // null-aware: v IS NULL rows exist in every file (every 10th id)
    checkEquivalent(engine, table, col("v").isNull) shouldBe 16L
    // unsupported atom shapes stay conservative but correct
    checkEquivalent(engine, table, (col("id") + 1) > 395) shouldBe 16L
  }

  it should "read versions without a manifest unpruned but correct" in {
    val (engine, table) = fixture(None) // no stats declared
    val n = checkEquivalent(engine, table, col("id") < 100)
    n shouldBe 16L // nothing pruned — and results still exact
  }

  it should "time-travel with the same skipping via readAtWhere" in {
    val (engine, table) = fixture(Some(cfg))
    val c0 = engine.headCommit(table.name)
    // second write replaces day 1 with ids shifted up — head skips differently
    val df2 = spark.range(400).select(
      (col("id") + 1000).as("id"), lit("2024-01-01").as("day"),
      col("id").cast("double").as("v"), lit("z").as("cat"))
    df2.repartitionByRange(2, col("id"))
      .versionedInsertInto(engine, table, UserId("t"), "reprocess day 1")

    val atOld = engine.readAtWhere(table, c0, col("id") < 100)
    atOld.count() shouldBe engine.readAt(table, c0).filter(col("id") < 100).count()
    // ~one range file per original partition (+1 sampled-boundary file slack)
    atOld.inputFiles.length should be <= 8

    // head: day 1 has no id<100 anymore → its files all pruned; the three
    // untouched days keep ~one range file each (+ sampled-boundary slack,
    // the same nondeterminism as the battery above)
    val atHead = engine.readWhere(table, col("id") < 100)
    atHead.count() shouldBe 300 // 100 ids × 3 untouched days, minus none (id<100 ∈ 0..399)
    atHead.inputFiles.length should be <= 6
  }

  it should "handle the null partition and all-null files soundly" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "stats_nullpart"),
      new File(dir, "stats_nullpart").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("v"))))
    engine.initTable(table, UserId("t"), "init")
    val df = Seq(
      (1L, "2024-01-01", Some(1.0)),
      (2L, "2024-01-01", Some(2.0)),
      (3L, null.asInstanceOf[String], None: Option[Double]), // null partition, all-null v
      (4L, null.asInstanceOf[String], None: Option[Double])
    ).toDF("id", "day", "v")
    df.repartition(col("day")).versionedInsertInto(engine, table, UserId("t"), "load")

    // v = 1.0 can only live in the non-null partition's file
    val hit = engine.readWhere(table, col("v") === 1.0)
    hit.select("id").as[Long].collect().sorted shouldBe Array(1L)
    hit.inputFiles.length shouldBe 1
    // v IS NULL must keep the all-null file
    engine.readWhere(table, col("v").isNull).select("id")
      .as[Long].collect().sorted shouldBe Array(3L, 4L)
    // day IS NULL prunes to the default partition
    val nullDay = engine.readWhere(table, col("day").isNull)
    nullDay.select("id").as[Long].collect().sorted shouldBe Array(3L, 4L)
    nullDay.inputFiles.length shouldBe 1
    // day IS NOT NULL prunes the default partition
    engine.readWhere(table, col("day").isNotNull).select("id")
      .as[Long].collect().sorted shouldBe Array(1L, 2L)
  }

  it should "never mis-prune on cross-family or NaN comparisons" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "stats_nan"),
      new File(dir, "stats_nan").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("v", "id"))))
    engine.initTable(table, UserId("t"), "init")
    Seq((1L, "d1", 1.0), (2L, "d1", Double.NaN), (3L, "d1", 3.0))
      .toDF("id", "day", "v")
      .repartition(1)
      .versionedInsertInto(engine, table, UserId("t"), "load")
    // NaN is the file's max in Spark ordering → max is unusable; a v > 2
    // predicate must keep the file (NaN > 2 is true in Spark semantics)
    engine.readWhere(table, col("v") > 2.0).count() shouldBe
      engine.read(table).filter(col("v") > 2.0).count()
    // comparing the numeric id against a STRING literal: cross-family →
    // conservative keep, result still equals the plain filter
    engine.readWhere(table, col("id") === "2").count() shouldBe
      engine.read(table).filter(col("id") === "2").count()
  }

  behavior of "the q_stats_skip_scan gate fixture"

  it should "scan a fraction of the version's files at sf0.001" in {
    val df = graft.SparkEntry.queries("q_stats_skip_scan")(spark, "/root/testdata/sf0.001")
    val kept = df.inputFiles
    kept should not be empty
    // recover the table root from any scanned file and count ALL data files
    // of the version — the skipped read must touch well under half of them
    // (the fixture keeps the bottom ~10% of the id range over 8 range files)
    val tableDir = kept.head.substring(0, kept.head.indexOf("/events_stats/") + "/events_stats/".length)
    val root = new File(new java.net.URI(tableDir))
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[File]).toSeq.flatMap(walk)
      else Seq(f)
    val all = walk(root).count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    withClue(s"kept ${kept.length} of $all files: ") {
      kept.length.toDouble should be < all.toDouble / 2
    }
  }

  behavior of "the q_bloom_skip_scan gate fixture"

  it should "read roughly one partition's files for the point lookup at sf0.001" in {
    val df = graft.SparkEntry.queries("q_bloom_skip_scan")(spark, "/root/testdata/sf0.001")
    df.count() shouldBe 1
    val kept = df.inputFiles
    kept should not be empty
    val tableDir = kept.head.substring(0,
      kept.head.indexOf("/events_bloom/") + "/events_bloom/".length)
    val root = new File(new java.net.URI(tableDir))
    def walk(f: File): Seq[File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[File]).toSeq.flatMap(walk)
      else Seq(f)
    val all = walk(root).count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    withClue(s"kept ${kept.length} of $all files: ") {
      // 5 event_type partitions; the Bloom keeps ~1 (+ fp slack) while the
      // hash-split layout makes every file's id range contain the needle
      kept.length.toDouble should be < all.toDouble / 2
    }
  }

  it should "keep files with nulls under negated NULL-SAFE equality (review finding)" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "stats_nseq"),
      new File(dir, "stats_nseq").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("v"))))
    engine.initTable(table, UserId("t"), "init")
    // ONE file holding values [5.0, 5.0, null]: min == max == 5 but a null
    // row exists. NOT(v <=> 5) is TRUE on the null row, so the file must be
    // kept — the plain negated-equality rule (min==max==literal → prune)
    // only applies to the null-blind operators.
    Seq((1L, "d1", Some(5.0)), (2L, "d1", Some(5.0)), (3L, "d1", None: Option[Double]))
      .toDF("id", "day", "v").repartition(1)
      .versionedInsertInto(engine, table, UserId("t"), "load")
    val skipped = engine.readWhere(table, !(col("v") <=> 5.0))
    skipped.select("id").as[Long].collect() shouldBe Array(3L)
    // the null-blind form still prunes: NOT(v = 5) is NULL on the null row
    engine.readWhere(table, !(col("v") === 5.0)).count() shouldBe 0
    engine.readWhere(table, !(col("v") === 5.0)).inputFiles.length shouldBe 0
  }

  it should "compare string stats in UTF-8 byte order, not UTF-16 (review finding)" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "stats_utf8"),
      new File(dir, "stats_utf8").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("s"))))
    engine.initTable(table, UserId("t"), "init")
    // U+10000 (surrogate pair) sorts ABOVE U+FFFF in UTF-8 byte order (the
    // order Spark's min/max used for the manifest) but BELOW it in Java's
    // UTF-16 compareTo — a UTF-16 comparison would conclude U+FFFF > max
    // and mis-prune the file that holds it
    Seq((1L, "d1", "\uFFFF"), (2L, "d1", "\uD800\uDC00"))
      .toDF("id", "day", "s").repartition(1)
      .versionedInsertInto(engine, table, UserId("t"), "load")
    engine.readWhere(table, col("s") === "\uFFFF")
      .select("id").as[Long].collect() shouldBe Array(1L)
    engine.readWhere(table, col("s") >= "\uFFFF").count() shouldBe
      engine.read(table).filter(col("s") >= "\uFFFF").count()
  }

  it should "keep skipping after compaction (the compacted version carries its own manifest)" in {
    val (engine, table) = fixture(Some(cfg))
    // compact day 1 to one file: the rewrite goes through the same staged
    // write path, so the NEW version dir gets a fresh manifest and selective
    // reads keep pruning (now at whole-partition granularity for day 1)
    engine.compact(table, UserId("t"), "compact day1",
      keep = _.columnValues.exists(_.value == "2024-01-01"),
      clusterBy = Seq("id"))
    val pruned = engine.readWhere(table, col("id") < 50)
    pruned.collect().map(_.getLong(0)).toSet shouldBe
      engine.read(table).filter(col("id") < 50).collect().map(_.getLong(0)).toSet
    // day 1 is now ONE file (kept whole); days 2-4 still prune to ~1 range file
    pruned.inputFiles.length should be <= (1 + 3 * 2)
  }

  it should "skip on BOTH dimensions of a z-ordered layout (multi-dimensional skipping)" in {
    // the layout half (ScaleTools.zorderBy: every file covers a small
    // bounding BOX in all clustered dims) composes with the stats half
    // (per-file min/max manifests) into genuine multi-dimensional data
    // skipping: predicates on EITHER dimension prune files, where a linear
    // sort's layout only serves its leading column
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "stats_z"),
      new File(dir, "stats_z").toURI, PartitionSchema.snapshot, FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("x", "y"))))
    engine.initTable(table, UserId("t"), "init")
    val grid = spark.range(64 * 64).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    ScaleTools.zorderBy(grid, Seq("x", "y"), numFiles = 16)
      .versionedInsertInto(engine, table, UserId("t"), "z-ordered load")
    engine.read(table).inputFiles.length shouldBe 16
    def prunedFiles(pred: Column): Int = {
      val skipped = engine.readWhere(table, pred)
      skipped.count() shouldBe engine.read(table).filter(pred).count()
      skipped.inputFiles.length
    }
    // a thin slab in EACH dimension touches ~one 4x4-grid column/row of boxes
    prunedFiles(col("x") < 8) should be <= 6
    prunedFiles(col("y") < 8) should be <= 6
    // the corner: both predicates compose to ~one box
    prunedFiles(col("x") < 8 && col("y") < 8) should be <= 2
  }

  behavior of "bloom partition skipping"

  /** The layout Blooms exist for: grp partitions (g0..g4) with files
    * hash-split on a bucket UNCORRELATED with id, so every file's id range
    * spans ~the whole domain and min/max pruning keeps everything — only
    * the per-partition Bloom can exclude. Each id lives in exactly ONE
    * partition (id % 5). Ids are EVEN (2×k), so odd probes are absent but
    * inside every range. */
  private def bloomFixture(): (VersionedTables, TableDefinition) = {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "stats_bloom"),
      new File(dir, "stats_bloom").toURI, PartitionSchema("grp"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("id"), bloomKeyColumns = List("id"),
        bloomExpectedItems = 2000)))
    engine.initTable(table, UserId("t"), "init")
    val df = spark.range(2000).select(
      (col("id") * 2).as("id"),
      concat(lit("g"), (col("id") % 5).cast("string")).as("grp"),
      pmod(xxhash64(col("id") + 7), lit(4)).as("bucket"))
    df.repartition(4, col("bucket")).drop("bucket")
      .versionedInsertInto(engine, table, UserId("t"), "load hash-split")
    (engine, table)
  }

  it should "prune partitions on equality where ranges cannot (and record it in the decision)" in {
    val (engine, table) = bloomFixture()
    val all = engine.read(table).inputFiles.length
    all should be >= 15 // ~4 files × 5 partitions
    // 1234 = 2×617, lives in grp g2 (617 % 5 = 2) — NOTE the Scala literal
    // is an INT against the BIGINT column: the probe must widen exactly
    val pred = col("id") === 1234
    val skipped = engine.readWhere(table, pred)
    skipped.select("id", "grp").collect().map(_.toSeq) shouldBe
      engine.read(table).filter(pred).select("id", "grp").collect().map(_.toSeq)
    skipped.inputFiles.length should be <= all / 3 // one partition's files (+fp slack)
    val d = TableStats.planRead(engine, table, engine.tracker.currentVersion(table.name), pred)
    d.bloomPrunedPartitions should be >= 3
  }

  it should "prune on IN lists (union of candidate tuples) and compose with partition predicates" in {
    val (engine, table) = bloomFixture()
    // 20 ∈ g0, 1234 ∈ g2 — the union of candidates keeps both partitions
    val pred = col("id").isin(20, 1234)
    val skipped = engine.readWhere(table, pred)
    skipped.select("id").as[Long].collect().sorted shouldBe Array(20L, 1234L)
    val d = TableStats.planRead(engine, table, engine.tracker.currentVersion(table.name), pred)
    d.bloomPrunedPartitions should be >= 2
    // conjunction with an explicit partition atom: value pruning first,
    // blooms on the survivors
    val d2 = TableStats.planRead(engine, table, engine.tracker.currentVersion(table.name),
      col("grp").isin("g0", "g2", "g3") && col("id") === 1234)
    d2.partitionsKept shouldBe 3 // g1/g4 dropped by VALUE before any bloom
    d2.bloomPrunedPartitions should be >= 1 // g0+g3 bloom-pruned (fp slack of one)
  }

  it should "exclude absent keys that every range contains" in {
    val (engine, table) = bloomFixture()
    // odd → absent, but 0 <= 777 <= max so every file's range keeps it
    val pred = col("id") === 777
    val skipped = engine.readWhere(table, pred)
    skipped.count() shouldBe 0
    skipped.inputFiles.length should be <= 8 // 0 + deterministic fp slack
  }

  it should "never read bloom-pruned partitions: corrupting them leaves the lookup exact" in {
    val (engine, table) = bloomFixture()
    val pred = col("id") === 1234
    val expected = engine.read(table).filter(pred).select("id", "grp")
      .collect().map(_.toSeq)
    val decision = TableStats.planRead(
      engine, table, engine.tracker.currentVersion(table.name), pred)
    val keptAbs = decision.paths
      .map(p => new org.apache.hadoop.fs.Path(p).toUri.getPath).toSet
    val corrupted = graft.StatsFixtures.corruptParquet(table,
      spare = f => keptAbs.contains(f.getAbsolutePath))
    corrupted should be >= 12 // at least 3 of 5 partitions went
    engine.readWhere(table, pred).select("id", "grp").collect().map(_.toSeq) shouldBe expected
    // control: corruption is real — with transparent skipping DISABLED the
    // same read must touch the corrupted files and fail. (Round 17: the
    // plain read no longer samples a footer at construction — the recorded
    // schema serves planning — and its filter composition prunes through
    // GraftDataSkipping just like readWhere, so an undisabled control would
    // prune its way around the corruption and prove nothing.)
    val spark2 = engine.spark
    val prevSkip = spark2.conf.getOption("spark.graft.dataSkipping.enabled")
    spark2.conf.set("spark.graft.dataSkipping.enabled", "false")
    try intercept[Exception](engine.read(table).filter(pred).collect())
    finally prevSkip match {
      case Some(v) => spark2.conf.set("spark.graft.dataSkipping.enabled", v)
      case None    => spark2.conf.unset("spark.graft.dataSkipping.enabled")
    }
  }

  it should "probe string and multi-column key tuples in the written hash domain" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "stats_bloom_mc"),
      new File(dir, "stats_bloom_mc").toURI, PartitionSchema("grp"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("k"), bloomKeyColumns = List("k", "s"),
        bloomExpectedItems = 1000)))
    engine.initTable(table, UserId("t"), "init")
    // key tuple (k, s) deterministic; each tuple in ONE of 3 partitions
    spark.range(600).select(
        col("id").as("k"),
        concat(lit("s"), (col("id") % 7).cast("string")).as("s"),
        concat(lit("g"), (col("id") % 3).cast("string")).as("grp"),
        pmod(xxhash64(col("id") + 13), lit(3)).as("bucket"))
      .repartition(3, col("bucket")).drop("bucket")
      .versionedInsertInto(engine, table, UserId("t"), "load")
    // (100, s2) lives in g1 (100 % 3 = 1; 100 % 7 = 2)
    val pred = col("k") === 100L && col("s") === "s2"
    val skipped = engine.readWhere(table, pred)
    skipped.select("grp").as[String].collect().toSeq shouldBe Seq("g1")
    val d = TableStats.planRead(engine, table, engine.tracker.currentVersion(table.name), pred)
    d.bloomPrunedPartitions should be >= 1
    // pinning only HALF the tuple must not probe (the bloom hashed pairs)
    val dHalf = TableStats.planRead(engine, table,
      engine.tracker.currentVersion(table.name), col("k") === 100L)
    dHalf.bloomPrunedPartitions shouldBe 0
  }

  it should "fall back to ranges for manifests without recorded bloom key types" in {
    val (engine, table) = bloomFixture()
    val conf = spark.sparkContext.hadoopConfiguration
    val version = engine.tracker.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion]
    // strip bloomKeyTypes in place — the shape of a pre-upgrade manifest
    version.partitionVersions.values.map(_.label).toSet[String].foreach { label =>
      val m = TableStats.readManifest(conf, table.location, label).get
      TableStats.deleteManifest(conf, table.location, label)
      val stripped = TableStats.fromJson(
        TableStats.toJson(m.copy(bloomKeyTypes = Nil))).toOption.get
      stripped.bloomKeyTypes shouldBe Nil
      val p = TableStats.statsManifestPath(table.location, label)
      java.nio.file.Files.write(java.nio.file.Paths.get(p.toUri),
        TableStats.toJson(stripped).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val pred = col("id") === 1234
    val d = TableStats.planRead(engine, table, engine.tracker.currentVersion(table.name), pred)
    d.bloomPrunedPartitions shouldBe 0 // no literal probing without the type record
    // ...and the read is simply unpruned-by-bloom, still exact
    engine.readWhere(table, pred).select("id").as[Long].collect() shouldBe Array(1234L)
  }

  behavior of "layout report"

  it should "find fragmented partitions from manifests alone and feed targeted compaction" in {
    val (engine, table) = fixture(Some(cfg)) // 4 files per partition
    // fragment day 1: a rewrite spread over 20 shuffle partitions → many
    // tiny files (some round-robin partitions may be empty, so assert a
    // bound, not the exact count)
    spark.range(40).select((col("id") + 2000).as("id"), lit("2024-01-01").as("day"),
        lit(1.0).as("v"), lit("x").as("cat"))
      .repartition(20)
      .versionedInsertInto(engine, table, UserId("t"), "fragmented rewrite")
    val report = TableStats.layoutReport(engine, table)
    report.size shouldBe 4
    report.forall(_.covered) shouldBe true
    val d1 = report.find(_.partition.exists(_.toPath == "day=2024-01-01")).get
    d1.files should be > 8
    d1.rows shouldBe 40
    // target exactly the fragmented partition; untouched days keep versions
    val keep = TableStats.smallFileKeep(report, maxFiles = 8)
    report.count(e => e.partition.exists(keep)) shouldBe 1
    engine.compact(table, UserId("t"), "pack day1", keep = keep)
    val after = TableStats.layoutReport(engine, table)
    after.find(_.partition.exists(_.toPath == "day=2024-01-01")).get.files shouldBe 1
    // compaction is row-identical and the other partitions' labels unchanged
    after.find(_.partition.exists(_.toPath == "day=2024-01-01")).get.rows shouldBe 40
    report.filterNot(e => e.partition.exists(keep)).map(_.versionLabel) shouldBe
      after.filterNot(e => e.partition.exists(keep)).map(_.versionLabel)
  }

  behavior of "stats checkpoints"

  /** A table whose partitions were committed ONE write each — the
    * high-commit-rate shape checkpointing exists for: k labels, k per-label
    * manifests. */
  private def manyCommitFixture(k: Int): (VersionedTables, TableDefinition) = {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "stats_ckpt"),
      new File(dir, "stats_ckpt").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("id"))))
    engine.initTable(table, UserId("t"), "init")
    (0 until k).foreach { i =>
      spark.range(10).select((col("id") + i * 100).as("id"), lit(f"d$i%02d").as("day"))
        .repartition(1)
        .versionedInsertInto(engine, table, UserId("t"), s"commit $i")
    }
    (engine, table)
  }

  it should "serve manifests from the checkpoint identically to per-label reads" in {
    val (engine, table) = manyCommitFixture(6)
    val pred = col("id") >= 300 // commits 3..5 only
    val before = TableStats.planRead(engine, table,
      engine.tracker.currentVersion(table.name), pred)
    engine.checkpointStats(table) should not be empty
    // drop the caches AND the per-label files: only the checkpoint remains
    TableStats.clearStatsCachesForTesting()
    val conf = spark.sparkContext.hadoopConfiguration
    engine.tracker.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion].partitionVersions.values
      .foreach(v => new File(new File(new File(table.location), "_stats"), s"${v.label}.json")
        .delete())
    val after = TableStats.planRead(engine, table,
      engine.tracker.currentVersion(table.name), pred)
    after shouldBe before // same decision, checkpoint-served
    // ...and the skipped read still equals the plain filter
    engine.readWhere(table, pred).count() shouldBe
      engine.read(table).filter(pred).count()
  }

  it should "cost one checkpoint read plus one read per label since (I/O counter law)" in {
    val (engine, table) = manyCommitFixture(8)
    engine.checkpointStats(table) should not be empty
    // two MORE commits after the checkpoint
    (8 until 10).foreach { i =>
      spark.range(10).select((col("id") + i * 100).as("id"), lit(f"d$i%02d").as("day"))
        .repartition(1)
        .versionedInsertInto(engine, table, UserId("t"), s"commit $i")
    }
    TableStats.clearStatsCachesForTesting()
    val m0 = TableStats.manifestFsReads.get(); val c0 = TableStats.checkpointFsReads.get()
    val d = TableStats.planRead(engine, table,
      engine.tracker.currentVersion(table.name), col("id") >= 0)
    d.partitionsTotal shouldBe 10
    (TableStats.checkpointFsReads.get() - c0) shouldBe 1L
    // exactly the two post-checkpoint labels miss the checkpoint
    (TableStats.manifestFsReads.get() - m0) shouldBe 2L
  }

  it should "retire older checkpoints and survive a corrupt one" in {
    val (engine, table) = manyCommitFixture(3)
    engine.checkpointStats(table)
    engine.checkpointStats(table)
    val statsDir = new File(new File(table.location), "_stats")
    statsDir.listFiles().count(_.getName.startsWith("_checkpoint-")) shouldBe 1
    // corrupt the survivor: readers must degrade to per-label files
    val ckpt = statsDir.listFiles().find(_.getName.startsWith("_checkpoint-")).get
    java.nio.file.Files.write(ckpt.toPath, "garbage".getBytes)
    TableStats.clearStatsCachesForTesting()
    engine.readWhere(table, col("id") >= 100).count() shouldBe
      engine.read(table).filter(col("id") >= 100).count()
  }

  it should "write a fresh checkpoint on real vacuum runs" in {
    val (engine, table) = manyCommitFixture(3)
    // rewrite d00 twice so history exceeds keepLast
    (1 to 2).foreach { i =>
      spark.range(10).select((col("id") + 1000 * i).as("id"), lit("d00").as("day"))
        .repartition(1)
        .versionedInsertInto(engine, table, UserId("t"), s"rewrite $i")
    }
    val statsDir = new File(new File(table.location), "_stats")
    statsDir.listFiles().count(_.getName.startsWith("_checkpoint-")) shouldBe 0
    engine.vacuum(table, keepLast = 1, dryRun = false)
    statsDir.listFiles().count(_.getName.startsWith("_checkpoint-")) shouldBe 1
    // checkpoint-served skipping still equals the filter after vacuum
    TableStats.clearStatsCachesForTesting()
    engine.readWhere(table, col("id") >= 100).count() shouldBe
      engine.read(table).filter(col("id") >= 100).count()
  }

  behavior of "vacuum integration"

  it should "keep a label's manifest while ANY partition still reads that label (review finding)" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "stats_live"),
      new File(dir, "stats_live").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("id"))))
    engine.initTable(table, UserId("t"), "init")
    // v1 covers BOTH days in one write (one shared manifest)
    spark.range(200).select(col("id"),
        when(col("id") < 100, "d1").otherwise("d2").as("day"))
      .repartitionByRange(4, col("id"))
      .versionedInsertInto(engine, table, UserId("t"), "v1 both days")
    val v1 = engine.tracker.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion].partitionVersions.values.head.label
    // two rewrites of d1 ONLY: (d1, v1) ages out of keepLast=1, but d2
    // still READS v1 — its manifest must survive the vacuum
    (1 to 2).foreach { i =>
      spark.range(100).select((col("id") + i * 1000).as("id"), lit("d1").as("day"))
        .repartition(1)
        .versionedInsertInto(engine, table, UserId("t"), s"rewrite d1 #$i")
    }
    val result = engine.vacuum(table, keepLast = 1, dryRun = false)
    result.deleted.exists(_.toString.contains(v1)) shouldBe true // (d1, v1) dir went
    TableStats.readManifest(
      spark.sparkContext.hadoopConfiguration, table.location, v1) should not be empty
    // ...and d2's skipping still works off it
    val pruned = engine.readWhere(table, col("day") === "d2" && col("id") >= 150)
    pruned.count() shouldBe 50
    pruned.inputFiles.length should be < 4
  }

  it should "reclaim stats manifests alongside their expired version dirs" in {
    val (engine, table) = fixture(Some(cfg))
    // three more writes so the first version ages out of keepLast=1
    (1 to 2).foreach { i =>
      spark.range(400).select(
        (col("id") + i * 10000).as("id"), lit("2024-01-01").as("day"),
        col("id").cast("double").as("v"), lit("x").as("cat"))
        .repartition(1)
        .versionedInsertInto(engine, table, UserId("t"), s"w$i")
    }
    val statsDir = new File(new File(table.location), "_stats")
    // count per-LABEL manifests only: vacuum additionally WRITES a fresh
    // checkpoint file into _stats, which this law is not about
    def labelManifests(): Int = statsDir.listFiles()
      .count(f => f.getName.endsWith(".json") && !f.getName.startsWith("_checkpoint-"))
    val before = labelManifests()
    before should be >= 3
    val result = engine.vacuum(table, keepLast = 1, dryRun = false)
    result.deleted should not be empty
    labelManifests() should be < before
    // the current version's manifest survives and still prunes
    engine.readWhere(table, col("id") < 100).count() shouldBe
      engine.read(table).filter(col("id") < 100).count()
  }

  behavior of "footer-served stats collection (round 17)"

  /** The round-17 equivalence law: for a BLOOM-LESS parquet config the
    * manifest is served from parquet footers with NO Spark job, and its
    * JSON is byte-identical to what the one-job scan path computes over the
    * same files — across nulls, an all-null file, NaN/Infinity doubles,
    * strings, dates, and multi-column partitions. */
  it should "serve bloom-less parquet stats from footers, byte-identical to the scan path" in {
    val (engine, dir) = newEngine()
    val cfgNB = ColumnStatsConfig(statsColumns = List("id", "v", "cat", "d"))
    val table = TableDefinition(TableName("test", "footer_stats"),
      new File(dir, "footer_stats").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(cfgNB))
    engine.initTable(table, UserId("t"), "init")
    val df = spark.range(300).select(
      col("id"),
      concat(lit("2024-02-0"), (col("id") % 3 + 1).cast("int").cast("string")).as("day"),
      // doubles with nulls and one +Infinity value (encoded as None on both
      // paths); NaN is exercised in the fallback test below — parquet omits
      // footer min/max for NaN-bearing chunks, so NaN forces the scan path
      when(col("id") % 10 === 0, lit(null).cast("double"))
        .when(col("id") === 8, lit(Double.PositiveInfinity))
        .otherwise(col("id").cast("double") * 1.5).as("v"),
      // a string column that is ALL NULL in one partition (day 3)
      when(col("id") % 3 === 2, lit(null).cast("string"))
        .otherwise(concat(lit("cat-"), (col("id") % 5).cast("string"))).as("cat"),
      date_add(lit("2024-01-01").cast("date"), (col("id") % 7).cast("int")).as("d"))
    val served0 = TableStats.footerServedWrites.get()
    df.repartitionByRange(3, col("id"))
      .versionedInsertInto(engine, table, UserId("t"), "load")
    TableStats.footerServedWrites.get() shouldBe served0 + 1 // footer path, no read-back job

    val pvs = engine.tracker.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion].partitionVersions
    val version = graft.core.Version.parse(pvs.values.head.label)
      .getOrElse(fail("bad version label"))
    val footerM = TableStats.readManifest(
      spark.sparkContext.hadoopConfiguration, table.location, version.label).get
    footerM.partitionBlooms shouldBe empty

    // the scan path over the SAME leaf dirs must produce the SAME BYTES as
    // the footer path persisted (the raw _stats file — a readManifest
    // round-trip loses map order, so compare against the disk bytes)
    val persisted = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      new File(new File(table.location), s"_stats/${version.label}.json").toURI)),
      java.nio.charset.StandardCharsets.UTF_8)
    val leafDirs = pvs.keys.toSeq.map(p =>
      graft.core.VersionPaths.pathFor(p.resolvePath(table.location), version))
    TableStats.disableFooterStatsForTesting = true
    try {
      val scanM = TableStats.scanStatsManifest(spark, table, cfgNB, version, leafDirs).get
      TableStats.toJson(scanM) shouldBe persisted
    } finally TableStats.disableFooterStatsForTesting = false

    // and the data-skipping law holds over the footer-served manifest
    engine.readWhere(table, col("id") < 100).count() shouldBe
      engine.read(table).filter(col("id") < 100).count()
    engine.readWhere(table, col("cat") === "cat-1").count() shouldBe
      engine.read(table).filter(col("cat") === "cat-1").count()
  }

  it should "fall back to the scan path for bloom-bearing configs and configured truncation" in {
    // bloom config: the existing fixture — footer counter must NOT move
    val served0 = TableStats.footerServedWrites.get()
    val (engine, table) = fixture(Some(cfg))
    TableStats.footerServedWrites.get() shouldBe served0
    val label = engine.tracker.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion].partitionVersions.values.head.label
    TableStats.readManifest(
      spark.sparkContext.hadoopConfiguration, table.location, label)
      .get.partitionBlooms should not be empty

    // configured statistics truncation: explicit guard refuses the footer path
    spark.conf.set("parquet.statistics.truncate.length", "64")
    try {
      val (e2, d2) = newEngine()
      val t2 = TableDefinition(TableName("test", "footer_trunc"),
        new File(d2, "footer_trunc").toURI, PartitionSchema("day"), FileFormat.Parquet,
        stats = Some(ColumnStatsConfig(statsColumns = List("id"))))
      e2.initTable(t2, UserId("t"), "init")
      val before = TableStats.footerServedWrites.get()
      spark.range(10).select(col("id"), lit("2024-01-01").as("day"))
        .versionedInsertInto(e2, t2, UserId("t"), "load")
      TableStats.footerServedWrites.get() shouldBe before // scan path used
      val lbl = e2.tracker.currentVersion(t2.name)
        .asInstanceOf[PartitionedTableVersion].partitionVersions.values.head.label
      // ...and the manifest is still there, from the scan path
      TableStats.readManifest(
        spark.sparkContext.hadoopConfiguration, t2.location, lbl) should not be empty
    } finally spark.conf.unset("parquet.statistics.truncate.length")
  }

  it should "fall back for NaN-bearing float/double chunks (parquet omits their footer min/max)" in {
    val (engine, dir) = newEngine()
    val table = TableDefinition(TableName("test", "footer_nan"),
      new File(dir, "footer_nan").toURI, PartitionSchema("day"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(statsColumns = List("v"))))
    engine.initTable(table, UserId("t"), "init")
    val before = TableStats.footerServedWrites.get()
    spark.range(20).select(
      lit("2024-01-01").as("day"),
      when(col("id") === 3, lit(Double.NaN)).otherwise(col("id").cast("double")).as("v"))
      .repartition(1)
      .versionedInsertInto(engine, table, UserId("t"), "load")
    TableStats.footerServedWrites.get() shouldBe before // scan path used
    val lbl = engine.tracker.currentVersion(table.name)
      .asInstanceOf[PartitionedTableVersion].partitionVersions.values.head.label
    val m = TableStats.readManifest(
      spark.sparkContext.hadoopConfiguration, table.location, lbl).get
    // the scan path records what Spark's agg sees: real min, NaN max → None
    val cs = m.files.head.columns("v")
    cs.min shouldBe Some("0.0")
    cs.max shouldBe None
  }
}
