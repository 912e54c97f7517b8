package graft

import graft.core._
import graft.operators.VersionedTables
import graft.operators.VersionedTables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: TPC-H Q1-style pricing summary through the versioned engine —
    * lineitem is loaded into a versioned table, read back at its current
    * version, then aggregated. Driver smoke-checks rows>0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    Tables.prepare(spark)
    val root = graft.FixtureTempDirs.create("graft-entry-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("graft", "lineitem"), root.resolve("lineitem").toUri,
      PartitionSchema("l_returnflag"), FileFormat.Parquet)
    engine.initTable(table, UserId("driver"), "init")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .versionedInsertInto(engine, table, UserId("driver"), "load sf0.001")
    engine.read(table)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        avg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queries_relational ++ queries_versioned ++ graft.queries.PipelineQueries.defs ++
      graft.queries.CorpusQueries.defs

  private def queries_relational: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.defs

  /** Chronicles-specific capabilities over one shared fixture: versioned read,
    * time travel, incremental (CDC) read between commits, and compaction.
    * Every fixture state is expressible as plain SQL over the raw `events`
    * parquet, so all four ARE DuckDB-oracled (see `oracles_versioned`). */
  private def queries_versioned: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_versioned_read" -> ((spark, dir) => versionedFixture(spark, dir).current),
    "q_time_travel" -> ((spark, dir) => versionedFixture(spark, dir).asOf),
    // the SAME pinned state through PURE SQL: Spark 4's native
    // `VERSION AS OF` on a graft-catalog name, resolved through the
    // version tracker (graft.sql.GraftTableRegistry + resolution rule)
    "q_sql_time_travel" -> ((spark, dir) => versionedFixture(spark, dir).sqlAsOf),
    "q_incremental_read" -> ((spark, dir) => versionedFixture(spark, dir).incremental),
    "q_compact_read" -> ((spark, dir) => versionedFixture(spark, dir).compacted),

    // ORC + MULTI-COLUMN partitions through the whole versioned stack: the
    // events table versioned as (event_date, event_type) ORC partitions,
    // read with a driver-side partition prune on the SECOND partition
    // column (readPartitions lists only event_type=click leaf dirs — the
    // reference's aws/ORC layout, exercised at the gate, not just in specs).
    // The written fixture is memoized per (session, sfDir) like
    // versionedFixture: the one-time ORC load is paid once per session and
    // the bench entry measures the pruned READ, which is the steady state.
    "q_versioned_orc" -> ((spark, dir) => {
      val (engine, table) = orcFixture(spark, dir)
      engine.readPartitions(table,
          _.columnValues.exists(cv => cv.column.name == "event_type" && cv.value == "click"))
        .groupBy(col("event_date"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    }),

    // THE reference's core design claim at the gate (docs/concepts.md:60-67):
    // after versioned writes sync an embedded Hive (Derby) catalog, a PLAIN
    // `spark.table(...)` — no graft API in the read path at all — sees
    // exactly the committed data, because each Hive partition's location is
    // a pointer into the current `_version=` directory. The fixture loads
    // events into a versioned+synced table, then REPROCESSES one partition
    // (dropping 'error' rows of the click type... see buildHiveFixture) so
    // the read demonstrably follows the version POINTERS, not just the raw
    // directory tree. Oracled as plain SQL over the raw events parquet.
    "q_hive_read" -> ((spark, dir) => {
      val name = hiveFixture(spark, dir)
      spark.table(name)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    }),

    // CSV through the whole versioned stack (reference README.md:79-83 claims
    // format passthrough; Parquet/ORC are covered above — this closes the
    // offline-verifiable half of the format matrix at the gate, with JSON
    // riding the same passthrough in FormatPassthroughSpec). orders versioned
    // as CSV partitions on o_orderstatus, ONE partition reprocessed (status F
    // drops every 10th order key) so the read provably follows the version
    // pointers, then read back with EXPLICIT casts — CSV carries no types, so
    // the query pins the output schema rather than trusting inference.
    "q_versioned_csv" -> ((spark, dir) => {
      val (engine, table) = csvFixture(spark, dir)
      engine.read(table)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("v"))
    }),

    // the JSON leg of the format matrix (Parquet/ORC/CSV gate-exercised
    // already): same pointer-following proof, O partition reprocessed
    "q_versioned_json" -> ((spark, dir) => {
      val (engine, table) = jsonFixture(spark, dir)
      engine.read(table)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("v"))
    }),

    // commit-time stats + data-skipping at the gate: events versioned with a
    // ColumnStatsConfig on (event_id, value), range-split on event_id inside
    // each date partition so each file covers a disjoint id range, then a
    // selective readWhere (bottom ~10% of ids). The manifest prunes ~7 of 8
    // files per partition BEFORE listing; the result must equal the plain
    // filter, which is exactly what the SQL oracle computes. The files-
    // scanned assertion lives in TableStatsSpec (inputFiles deltas).
    "q_stats_skip_scan" -> ((spark, dir) => statsSkipFixture(spark, dir).scalaSkip),

    // the SAME selective scan through PURE SQL text: no readWhere in sight —
    // the optimizer-time skipping rule (graft.sql.GraftDataSkipping) prunes
    // the WHERE's files from the graft-catalog relation transparently,
    // closing the SQL/file-skipping asymmetry. Identical oracle.
    "q_sql_skip_scan" -> ((spark, dir) => statsSkipFixture(spark, dir).sqlSkip),

    // partition-Bloom skipping at the gate: a table clustered by ONE
    // dimension (event_type partitions, files hash-split on user_id) probed
    // by an UNCLUSTERED key (event_id). Per-file id ranges span nearly the
    // whole domain, so min/max pruning keeps everything — the per-partition
    // Bloom over xxhash64(event_id), already paid for at write time, is
    // what excludes the partitions that provably don't hold the needle.
    // Oracle = the plain filter; the never-reads-pruned-partitions law
    // lives in TableStatsSpec (corrupt-the-excluded-partitions).
    "q_bloom_skip_scan" -> ((spark, dir) => bloomFixture(spark, dir).lookup),

    // metadata-only aggregation over the same fixture: COUNT/MIN/MAX/null
    // counts folded from the commit-time stats manifests DRIVER-side
    // (graft.operators.MetadataQuery) — zero data files opened for the
    // covered table; the oracle recomputes the same figures by scanning
    "q_metadata_agg" -> ((spark, dir) => statsSkipFixture(spark, dir).metaAgg),

    // the SQL face of the same capability: a global COUNT/MIN/MAX in pure
    // SQL text collapses to a one-row LocalRelation answered from the
    // manifests (graft.sql.GraftMetadataAggregate) — no scan in the plan
    "q_sql_metadata_agg" -> ((spark, dir) => statsSkipFixture(spark, dir).sqlMetaAgg),

    // ...and the partition-FILTERED form: COUNT/MIN over the last six days
    // only. The WHERE references only the partition column, so the rewrite
    // evaluates it two-valued against each partition's known value and
    // folds just the kept partitions' manifests — an exact windowed count
    // with no scan in the plan
    "q_sql_meta_count_range" -> ((spark, dir) => statsSkipFixture(spark, dir).sqlMetaRange),

    // ...and the GROUP-BY-partition-column form — THE ops-dashboard query
    // (`SELECT day, COUNT(*) … GROUP BY day`): every grouping expression is
    // a partition column whose per-partition value is a known scalar, so
    // the groups form exactly and each folds from its partitions' manifests
    // into one row of a multi-row LocalRelation — per-day row counts and id
    // ranges for a 30-day table with no scan node in the plan
    "q_sql_meta_groupby" -> ((spark, dir) => statsSkipFixture(spark, dir).sqlMetaGroupBy),

    // the SQL WRITE surface at the gate: a versioned events table populated
    // ENTIRELY through SQL text — INSERT INTO (full load, schema defined by
    // the first write), INSERT INTO again (an APPEND of synthetic rows into
    // existing partitions: old rows must survive), then INSERT OVERWRITE of
    // the max-date partition (error rows dropped; the appended synthetics
    // of that date go with it — overwrite replaces the whole partition).
    // All three land as commits through graft.sql.GraftSqlWrites; the
    // oracle replays the same append/overwrite algebra over the raw parquet
    "q_sql_insert" -> ((spark, dir) => sqlInsertFixture(spark, dir).readBack),

    // predicate DML at the gate: a versioned events table mutated by pure
    // SQL UPDATE (clicks with id%7==0 get +500) then DELETE (errors with
    // id%3==0 removed) — both routed through graft.operators.VersionedDml
    // with stats/Bloom-pruned partition discovery and CAS commits. Two
    // reads of the final state gate different aspects: per-type counts +
    // sums (the update's arithmetic and the delete's removals) and per-day
    // counts (the rewrite bill's distribution); both oracles replay the
    // two statements as set algebra
    "q_sql_update" -> ((spark, dir) => sqlDmlFixture(spark, dir).byType),
    "q_sql_delete" -> ((spark, dir) => sqlDmlFixture(spark, dir).byDay),

    // merge-on-read DELETE at the gate (deletion vectors,
    // graft.operators.DeleteVectors): two STACKED DV deletes (every 97th,
    // then every 101st orderkey — the second rebases onto the first) made
    // rows invisible WITHOUT rewriting a single data byte; the commit
    // repoints partitions at marker versions whose _dv sidecars
    // broadcast-anti-join at read. Three reads gate the model: the
    // post-delete state, time travel to the pre-delete commit (base files
    // untouched), and the state after compact FOLDED the DVs into plain
    // data files (the OPTIMIZE-folds-DV equivalence)
    "q_delete_dv" -> ((spark, dir) => dvFixture(spark, dir).afterDelete),
    "q_delete_dv_tt" -> ((spark, dir) => dvFixture(spark, dir).preDelete),
    "q_delete_dv_fold" -> ((spark, dir) => dvFixture(spark, dir).folded),
    // ...and the SQL face: `SET spark.graft.delete.mode=dv` routes a plain
    // SQL DELETE through the deletion-vector path (the fixture asserts the
    // head really is a marker version — the fallback would be invisible in
    // results, by design); the read-back is pure SQL over the graft catalog
    "q_sql_delete_dv" -> ((spark, dir) => sqlDvFixture(spark, dir).readBack),
    // merge-on-read UPDATE through pure SQL (spark.graft.update.mode=dv):
    // post-images land in the marker version beside the DV hiding their
    // pre-images — zero base bytes rewritten; stacks over the delete's
    // markers (update-over-delete rebases; only update-over-update defers
    // to a fold). The fixture pins the routing via the commit message.
    "q_sql_update_dv" -> ((spark, dir) => sqlDvFixture(spark, dir).updated),
    // a SECOND merge-on-read UPDATE stacked onto the update-markers: the
    // engine folds JUST the hot partitions inline (depth-1 preserved) and
    // applies — the fixture pins both the fold commit and the dv routing
    "q_sql_update_dv_stacked" -> ((spark, dir) => sqlDvFixture(spark, dir).stacked),

    // SQL-only ROLLBACK at the gate: load, SQL DELETE a class, then
    // RESTORE TABLE ... TO VERSION AS OF the pre-delete commit — the
    // read-back must equal the PLAIN table aggregate (the delete fully
    // undone, metadata-only). The verb every Delta operator reaches for
    // after a bad write, proven against the oracle.
    "q_sql_restore" -> ((spark, dir) => sqlRestoreFixture(spark, dir)),

    // DURABLE rollback at the gate: after the RESTORE, an UNRELATED SQL
    // INSERT lands — the restored rows must SURVIVE it (a ref-move
    // "restore" would silently re-apply the rolled-back delete when the
    // next commit folds the full history; the restore commit carries the
    // tip->target diff precisely so that cannot happen).
    "q_sql_restore_write" -> ((spark, dir) => sqlRestoreWriteFixture(spark, dir)),

    // keyed MERGE INTO at the gate: events loaded as a versioned table, then
    // ONE merge commit that updates every 10th click (+1000 to value),
    // inserts a synthetic twin of every 100th view (id offset +10M), and
    // deletes every 10th error — the read aggregates the POST-MERGE table
    // and the oracle replays the same upsert/insert/delete algebra as plain
    // SQL over the raw parquet (anti-join + unions). All three source
    // classes are non-empty at sf0.001/0.01/0.1.
    "q_merge_upsert" -> ((spark, dir) => mergeFixture(spark, dir).merged),

    // the SAME merge algebra through a pure SQL MERGE INTO statement
    // (WHEN MATCHED AND s.value < 0 THEN DELETE / WHEN MATCHED THEN UPDATE
    // SET * / WHEN NOT MATCHED THEN INSERT *), converted by
    // ResolveGraftTables into the engine's keyed pruned-discovery merge —
    // oracle identical to q_merge_upsert by construction
    "q_sql_merge" -> ((spark, dir) => sqlMergeFixture(spark, dir).merged),

    // the GENERAL clause merge (graft.operators.MergeApply) as one SQL
    // statement: conditional matched DELETE, partial-column
    // target-referencing UPDATE, conditional sparse INSERT, and a WHEN NOT
    // MATCHED BY SOURCE DELETE — none of which the keyed source-row merge
    // can express. Oracle replays the four clauses as set algebra.
    "q_sql_merge_mixed" -> ((spark, dir) => sqlMergeMixedFixture(spark, dir).merged),

    // additive schema evolution: the table's old partitions were written
    // WITHOUT the value column (versionedInsertInto), the last five days
    // with it (versionedInsertIntoEvolving) — the union read NULLs the old
    // rows; the oracle replays the split with a CASE on the date
    "q_schema_evolution" -> ((spark, dir) => schemaEvolutionFixture(spark, dir).readBack),

    // the SQL DDL surface: CREATE TABLE through the graft catalog (schema
    // opened via registerSchema), first INSERT aligned to the DECLARED
    // columns, read back — the whole lifecycle in SQL text
    "q_sql_create" -> ((spark, dir) => sqlCreateFixture(spark, dir).readBack),

    // the maintenance SQL verbs (parser extension, the DeltaSqlParser
    // pattern): OPTIMIZE ... ZORDER BY rewrote the table's layout — the
    // read-back proves rows are bit-identical after the Morton clustering
    "q_sql_optimize" -> ((spark, dir) => sqlMaintFixture(spark, dir).optimized),
    // partition-SCOPED OPTIMIZE: the fixture pins the scoping law (only the
    // WHERE-selected partition repoints); the oracle checks data intact
    "q_sql_optimize_where" -> ((spark, dir) => sqlOptWhereFixture(spark, dir).aggregate),
    // SHOW PARTITIONS straight from the commit log — zero filesystem I/O
    "q_sql_show_partitions" -> ((spark, dir) => sqlOptWhereFixture(spark, dir).partitions),
    // ANALYZE TABLE backfills stats manifests for a table written BEFORE
    // any stats config — the read then goes through the skipping path
    "q_sql_analyze" -> ((spark, dir) => sqlAnalyzeFixture(spark, dir)),
    // DESCRIBE HISTORY: the commit log as SQL rows — seq/user/verb pinned
    // exactly, operation counts recomputed by the oracle from the data
    // (load and optimize each touch one op per live partition)
    "q_sql_history" -> ((spark, dir) => sqlMaintFixture(spark, dir).history),

    // row-level CHANGE FEED of that same merge commit: per-row
    // insert/update/delete reconstructed from the two pinned states
    // (graft.operators.ChangeFeed), aggregated per change class — the
    // oracle replays the three merge classes as plain SQL
    "q_change_feed" -> ((spark, dir) => mergeFixture(spark, dir).changeFeed),

    // the FULL Delta-CDF shape of the same commit: updatePreimages = true
    // splits every update into an update_preimage / update_postimage row
    // pair (both sides come from the one compare join — no second read of
    // the old state); the oracle replays both sides of the update class
    "q_change_feed_pre" -> ((spark, dir) => mergeFixture(spark, dir).changeFeedPre)
  )

  /** CSV fixture: orders (projected to key/price/status) written as a
    * versioned CSV table (header on), status-F partition reprocessed.
    * Memoized per (session, sfDir) like the other fixtures. */
  private val csvFixtureCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (VersionedTables, TableDefinition)]()

  private def csvFixture(spark: SparkSession, sfDir: String): (VersionedTables, TableDefinition) =
    csvFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      val root = graft.FixtureTempDirs.create("graft-csv-q-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", "orders_csv"),
        root.resolve("orders_csv").toUri, PartitionSchema("o_orderstatus"), FileFormat.Csv,
        // header carries the column NAMES through the text format; types are
        // re-established by inference on read + explicit casts in the query
        Map("header" -> "true", "inferSchema" -> "true"))
      engine.initTable(table, UserId("driver"), "init")
      val orders = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .localCheckpoint()
      orders.repartition(col("o_orderstatus"))
        .versionedInsertInto(engine, table, UserId("driver"), "load csv")
      orders.where(col("o_orderstatus") === "F" && col("o_orderkey") % 10 =!= 0)
        .repartition(col("o_orderstatus"))
        .versionedInsertInto(engine, table, UserId("driver"), "reprocess F")
      (engine, table)
    })

  /** JSON fixture: the CSV fixture's twin through `FileFormat.Json` —
    * same orders projection, the O partition reprocessed (drop every 7th
    * key) so the read provably follows version pointers. JSON lines carry
    * types structurally; no reader options needed. */
  private val jsonFixtureCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (VersionedTables, TableDefinition)]()

  private def jsonFixture(spark: SparkSession, sfDir: String): (VersionedTables, TableDefinition) =
    jsonFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      val root = graft.FixtureTempDirs.create("graft-json-q-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", "orders_json"),
        root.resolve("orders_json").toUri, PartitionSchema("o_orderstatus"), FileFormat.Json)
      engine.initTable(table, UserId("driver"), "init")
      val orders = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .localCheckpoint()
      orders.repartition(col("o_orderstatus"))
        .versionedInsertInto(engine, table, UserId("driver"), "load json")
      orders.where(col("o_orderstatus") === "O" && col("o_orderkey") % 7 =!= 0)
        .repartition(col("o_orderstatus"))
        .versionedInsertInto(engine, table, UserId("driver"), "reprocess O")
      (engine, table)
    })

  /** Hive-read fixture: a versioned events table synced into the session's
    * embedded Hive (Derby) catalog, one partition reprocessed so the
    * `spark.table` read proves it follows the catalog's version POINTERS
    * (partition locations inside `_version=` dirs), not the raw directory
    * tree. Returns the fully-qualified table name; memoized per (session,
    * sfDir) with a unique table name per build (a session's catalog is
    * shared state — a retry session must not trip over the first session's
    * table). Requires a Hive-enabled session (Verify/Bench/TestSpark all
    * are; reference docs/concepts.md:60-67 is the claim under test). */
  private val hiveFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()
  private val hiveFixtureSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def hiveFixture(spark: SparkSession, sfDir: String): String =
    hiveFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      val n = hiveFixtureSeq.incrementAndGet()
      val root = graft.FixtureTempDirs.create("graft-hive-q-")
      val loc = root.resolve("events_hive").toUri.toString.stripSuffix("/")
      val qname = s"graft_hive.events_hive_$n"
      spark.sql("CREATE DATABASE IF NOT EXISTS graft_hive")
      spark.sql(
        s"""CREATE EXTERNAL TABLE $qname
           |(event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE, props STRING)
           |PARTITIONED BY (event_type STRING) STORED AS PARQUET LOCATION '$loc'""".stripMargin)
      val engine = new VersionedTables(spark,
        new graft.sources.FileBackedVersionTracker(root.resolve("store").toUri),
        new graft.sources.SparkHiveMetastore(spark))
      val table = TableDefinition(TableName("graft_hive", s"events_hive_$n"),
        new java.net.URI(loc), PartitionSchema("event_type"), FileFormat.Parquet)
      engine.initTable(table, UserId("driver"), "init")
      // materialize once: both versioned writes (and their partition
      // discovery) re-scan this frame — re-reading parquet each time
      // roughly doubled the fixture build (round-7 watch item)
      val events = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"),
          col("props"), col("event_type"))
        .localCheckpoint()
      events.repartition(col("event_type"))
        .versionedInsertInto(engine, table, UserId("driver"), "load")
      // reprocess ONE partition (clicks drop every 10th event id): the
      // catalog pointer for event_type=click swaps to the new version dir,
      // so a raw-directory read would see BOTH versions' rows and fail the
      // oracle — only the pointer-following read matches
      events.where(col("event_type") === "click" && col("event_id") % 10 =!= 0)
        .repartition(col("event_type"))
        .versionedInsertInto(engine, table, UserId("driver"), "reprocess clicks")
      qname
    })

  private val orcFixtureCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (VersionedTables, TableDefinition)]()

  private def orcFixture(spark: SparkSession, sfDir: String): (VersionedTables, TableDefinition) =
    orcFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      val root = graft.FixtureTempDirs.create("graft-orc-q-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", "events_orc"),
        root.resolve("events_orc").toUri,
        PartitionSchema("event_date", "event_type"), FileFormat.Orc)
      engine.initTable(table, UserId("driver"), "init")
      Tables.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts")))
        .repartition(col("event_date"), col("event_type"))
        .versionedInsertInto(engine, table, UserId("driver"), "load orc")
      (engine, table)
    })

  private final case class VersionedFixture(
      current: DataFrame, asOf: DataFrame, incremental: DataFrame, compacted: DataFrame,
      sqlAsOf: DataFrame)

  /** Build four reads over a versioned events table: initial load (t1), one
    * day reprocessed without 'error' rows (t2), that day compacted to one file
    * (t3). `current` reflects t3 (= t2's rows: compaction is row-identical by
    * contract), `asOf` pins t1, `incremental` is what changed t1→t2 (just the
    * reprocessed day), `compacted` explicitly reads the t3 commit. Memoized
    * per (session, sfDir): the four queries share one fixture build. */
  private val fixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), VersionedFixture]()

  private def versionedFixture(spark: SparkSession, sfDir: String): VersionedFixture =
    fixtureCache.computeIfAbsent((spark, sfDir), _ => buildVersionedFixture(spark, sfDir))

  private def buildVersionedFixture(spark: SparkSession, sfDir: String): VersionedFixture = {
    Tables.prepare(spark)
    val root = graft.FixtureTempDirs.create("graft-vfix-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("graft", "events"), root.resolve("events").toUri,
      PartitionSchema("event_date"), FileFormat.Parquet)
    engine.initTable(table, UserId("driver"), "init")
    // materialize once: the fixture scans this frame five times (partition
    // discovery + write, twice, + max(date)); re-reading parquet each time
    // roughly doubles the fixture cost
    val events = Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
      .localCheckpoint()
    // cluster on the partition column before writing: one file per partition
    // dir instead of (input tasks × days) small files — the write-side twin
    // of compact(), and the difference between 90 and ~3000 files here
    events.repartition(col("event_date"))
      .versionedInsertInto(engine, table, UserId("driver"), "initial load")
    val firstLoad = engine.log(table.name).head.id
    val day = events.select(max("event_date")).head().getDate(0)
    events.where(col("event_date") === lit(day) && col("event_type") =!= "error")
      .repartition(col("event_date"))
      .versionedInsertInto(engine, table, UserId("driver"), "reprocess")
    val reproHead = engine.log(table.name).head.id
    engine.compact(table, UserId("driver"), "compact reprocessed day",
      keep = _.columnValues.exists(_.value == day.toString))
    val compactHead = engine.log(table.name).head.id
    // decimal-exact value sums: aggregation order can't drift the oracle hash
    def agg(df: DataFrame): DataFrame = df
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    // SQL-native time travel over the SAME fixture: the table registered in
    // the graft SQL catalog, the pre-reprocess commit pinned with Spark's
    // native VERSION AS OF syntax — resolved through the version tracker by
    // the GraftExtensions rule, same oracle as q_time_travel
    graft.sql.GraftTableRegistry.register(engine, table)
    val sqlAsOf = spark.sql(
      s"""SELECT event_date, event_type, COUNT(1) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         |FROM graft.graft.events VERSION AS OF '${firstLoad.id}'
         |GROUP BY event_date, event_type""".stripMargin)
    VersionedFixture(
      current = agg(engine.read(table)),
      asOf = agg(engine.readAt(table, firstLoad)),
      incremental = agg(engine.readChangesBetween(table, firstLoad, reproHead)),
      compacted = agg(engine.readAt(table, compactHead)),
      sqlAsOf = sqlAsOf)
  }

  /** q_delete_dv / _tt / _fold share one fixture: lineitem loaded as a
    * versioned table (partitioned by l_returnflag, multiple files per
    * partition so positions span files), two stacked merge-on-read DV
    * deletes, then a compact that folds them. All three reads resolve from
    * pinned commits, so the memoized frames stay stable. */
  private final case class DvFixture(
      afterDelete: DataFrame, preDelete: DataFrame, folded: DataFrame)

  private val dvFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DvFixture]()

  private def dvFixture(spark: SparkSession, sfDir: String): DvFixture =
    dvFixtureCache.computeIfAbsent((spark, sfDir), _ => buildDvFixture(spark, sfDir))

  private def buildDvFixture(spark: SparkSession, sfDir: String): DvFixture = {
    import graft.operators.DeleteVectors._
    Tables.prepare(spark)
    val root = graft.FixtureTempDirs.create("graft-dvfix-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("graft", "lineitem_dv"),
      root.resolve("lineitem_dv").toUri, PartitionSchema("l_returnflag"), FileFormat.Parquet)
    engine.initTable(table, UserId("driver"), "init")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"))
      .localCheckpoint()
    // hash-repartition so every partition's rows span several files —
    // positional deletes must prove themselves across file boundaries
    li.repartition(4)
      .versionedInsertInto(engine, table, UserId("driver"), "load")
    val preDeleteHead = engine.headCommit(table.name)
    val r1 = engine.deleteWhereDV(table, col("l_orderkey") % 97 === 0,
      UserId("driver"), "dv delete %97")
    require(r1.affected.nonEmpty, "q_delete_dv fixture: first DV delete matched nothing")
    val r2 = engine.deleteWhereDV(table, col("l_orderkey") % 101 === 0,
      UserId("driver"), "dv delete %101 (rebases)")
    require(r2.affected.nonEmpty, "q_delete_dv fixture: second DV delete matched nothing")
    val afterDeleteHead = engine.headCommit(table.name)
    engine.compact(table, UserId("driver"), "fold DVs")
    def agg(df: DataFrame): DataFrame = df
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("v"))
    DvFixture(
      afterDelete = agg(engine.readAt(table, afterDeleteHead)),
      preDelete = agg(engine.readAt(table, preDeleteHead)),
      folded = agg(engine.read(table)))
  }

  /** q_sql_delete_dv: the merge-on-read delete through PURE SQL — table
    * registered in the graft catalog, `spark.graft.delete.mode=dv` set,
    * one SQL DELETE, SQL read-back. Asserts the head is a marker version
    * so a silent fallback to the rewrite path can never pass the gate. */
  private final case class SqlDvFixture(
      readBack: DataFrame, updated: DataFrame, stacked: DataFrame)

  private val sqlDvFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), SqlDvFixture]()

  private def sqlDvFixture(spark: SparkSession, sfDir: String): SqlDvFixture =
    sqlDvFixtureCache.computeIfAbsent((spark, sfDir), _ => buildSqlDvFixture(spark, sfDir))

  private def buildSqlDvFixture(spark: SparkSession, sfDir: String): SqlDvFixture = {
    val phases = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def phase[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      phases += name -> (System.nanoTime() - t0) / 1e9
      a
    }
    Tables.prepare(spark)
    val root = graft.FixtureTempDirs.create("graft-sqldvfix-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("graft", "lineitem_sqldv"),
      root.resolve("lineitem_sqldv").toUri, PartitionSchema("l_returnflag"),
      FileFormat.Parquet)
    engine.initTable(table, UserId("driver"), "init")
    graft.sql.GraftTableRegistry.register(engine, table)
    phase("load")(spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      .repartition(4)
      .versionedInsertInto(engine, table, UserId("driver"), "load"))
    val prev = spark.conf.getOption(graft.sql.GraftSqlWrites.DeleteModeKey)
    spark.conf.set(graft.sql.GraftSqlWrites.DeleteModeKey, "dv")
    try phase("sql_delete_dv")(
      spark.sql("DELETE FROM graft.graft.lineitem_sqldv WHERE l_orderkey % 97 = 0"))
    finally prev match {
      case Some(v) => spark.conf.set(graft.sql.GraftSqlWrites.DeleteModeKey, v)
      case None    => spark.conf.unset(graft.sql.GraftSqlWrites.DeleteModeKey)
    }
    engine.tracker.currentVersion(table.name) match {
      case PartitionedTableVersion(pvs) =>
        require(pvs.valuesIterator.exists(Version.isDeleteMarker),
          "q_sql_delete_dv fixture: SQL DELETE did not take the deletion-vector path")
      case other => sys.error(s"unexpected $other")
    }
    val readbackSql =
      """SELECT l_returnflag, COUNT(1) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS v
        |FROM graft.graft.lineitem_sqldv
        |GROUP BY l_returnflag""".stripMargin
    // relation substitution pins versions at ANALYSIS time, so this frame
    // keeps reading the post-delete/pre-update state after the next commit
    val postDelete = spark.sql(readbackSql)
    val prevU = spark.conf.getOption(graft.sql.GraftSqlWrites.UpdateModeKey)
    spark.conf.set(graft.sql.GraftSqlWrites.UpdateModeKey, "dv")
    try phase("sql_update_dv")(spark.sql(
      "UPDATE graft.graft.lineitem_sqldv SET l_quantity = l_quantity + 1000 " +
        "WHERE l_orderkey % 89 = 0"))
    finally prevU match {
      case Some(v) => spark.conf.set(graft.sql.GraftSqlWrites.UpdateModeKey, v)
      case None    => spark.conf.unset(graft.sql.GraftSqlWrites.UpdateModeKey)
    }
    require(engine.log(table.name).head.message.startsWith("SQL UPDATE (dv)"),
      "q_sql_update_dv fixture: SQL UPDATE did not take the deletion-vector path")
    val postUpdate = spark.sql(readbackSql)

    // STACKED merge-on-read UPDATE: the table now carries UPDATE-markers,
    // so this statement exercises the inline auto-fold (fold JUST the hot
    // partitions, then apply — position chains stay depth 1). The commit
    // log must show both the fold and the dv update, or the gate fails.
    spark.conf.set(graft.sql.GraftSqlWrites.UpdateModeKey, "dv")
    try phase("sql_update_dv_stacked")(spark.sql(
      "UPDATE graft.graft.lineitem_sqldv SET l_quantity = l_quantity + 500 " +
        "WHERE l_orderkey % 83 = 0"))
    finally prevU match {
      case Some(v) => spark.conf.set(graft.sql.GraftSqlWrites.UpdateModeKey, v)
      case None    => spark.conf.unset(graft.sql.GraftSqlWrites.UpdateModeKey)
    }
    val messages = engine.log(table.name).map(_.message)
    require(messages.head.startsWith("SQL UPDATE (dv)"),
      "q_sql_update_dv_stacked fixture: stacked UPDATE did not take the dv path")
    require(messages.exists(_.startsWith("auto-fold update-marker")),
      "q_sql_update_dv_stacked fixture: the inline auto-fold never ran")
    graft.queries.FixturePhases.record(spark, "q_sql_delete_dv", phases.toSeq)
    SqlDvFixture(readBack = postDelete, updated = postUpdate,
      stacked = spark.sql(readbackSql))
  }

  /** q_sql_restore: SQL DELETE then SQL RESTORE to the pre-delete commit —
    * the read-back equals the plain aggregate. Memoized per (session, dir). */
  private val sqlRestoreFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def sqlRestoreFixture(spark: SparkSession, sfDir: String): DataFrame =
    sqlRestoreFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      val root = graft.FixtureTempDirs.create("graft-restorefix-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", "events_restore"),
        root.resolve("events_restore").toUri, PartitionSchema("event_date"),
        FileFormat.Parquet)
      engine.initTable(table, UserId("driver"), "init")
      graft.sql.GraftTableRegistry.register(engine, table)
      Tables.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts")))
        .repartition(col("event_date"))
        .versionedInsertInto(engine, table, UserId("driver"), "load")
      val preDelete = engine.headCommit(table.name)
      spark.sql("DELETE FROM graft.graft.events_restore WHERE event_type = 'error'")
      require(engine.headCommit(table.name) != preDelete,
        "q_sql_restore fixture: the delete committed nothing")
      val restored = spark.sql(
        s"RESTORE TABLE graft.graft.events_restore TO VERSION AS OF '${preDelete.id}'")
        .head().getString(0)
      require(restored == preDelete.id, "q_sql_restore fixture: restore missed")
      spark.sql(
        s"""SELECT event_type, $duckFixtureAgg
           |FROM graft.graft.events_restore GROUP BY 1""".stripMargin)
    })

  /** q_sql_restore_write: SQL DELETE → SQL RESTORE (durable: a NEW commit
    * carries the tip→target diff) → an UNRELATED SQL INSERT of probe rows.
    * The read-back must show the restored rows AND the probe — the law a
    * ref-move rollback breaks (the insert's commit would fold the full
    * history and re-apply the delete). Memoized per (session, dir). */
  private val sqlRestoreWriteFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def sqlRestoreWriteFixture(spark: SparkSession, sfDir: String): DataFrame =
    sqlRestoreWriteFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      val root = graft.FixtureTempDirs.create("graft-restorewfix-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", "events_restorew"),
        root.resolve("events_restorew").toUri, PartitionSchema("event_date"),
        FileFormat.Parquet)
      engine.initTable(table, UserId("driver"), "init")
      graft.sql.GraftTableRegistry.register(engine, table)
      Tables.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts")))
        .repartition(col("event_date"))
        .versionedInsertInto(engine, table, UserId("driver"), "load")
      val preDelete = engine.headCommit(table.name)
      spark.sql("DELETE FROM graft.graft.events_restorew WHERE event_type = 'error'")
      spark.sql(
        s"RESTORE TABLE graft.graft.events_restorew TO VERSION AS OF '${preDelete.id}'")
      // the unrelated write AFTER the restore: deterministic probe rows
      // (every 100th click, re-keyed and re-typed), inserted through SQL
      engine.read(table)
        .filter(col("event_type") === "click" && col("event_id") % 100 === 0)
        .withColumn("event_id", col("event_id") + 20000000L)
        .withColumn("event_type", lit("zprobe"))
        .createOrReplaceTempView("graft_restore_probe_src")
      spark.sql(
        "INSERT INTO graft.graft.events_restorew SELECT * FROM graft_restore_probe_src")
      spark.sql(
        s"""SELECT event_type, $duckFixtureAgg
           |FROM graft.graft.events_restorew GROUP BY 1""".stripMargin)
    })

  /** q_merge_upsert + q_change_feed share one fixture: one CAS-guarded
    * [[graft.operators.VersionedMerge]] commit over a versioned events
    * table. `merged` aggregates the post-merge state; `changeFeed`
    * aggregates the ROW-LEVEL diff of the merge commit
    * ([[graft.operators.ChangeFeed]]) by change class. Memoized per
    * (session, sfDir). */
  private final case class MergeFixture(
      merged: DataFrame, changeFeed: DataFrame, changeFeedPre: DataFrame)

  private val mergeFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), MergeFixture]()

  private def mergeFixture(spark: SparkSession, sfDir: String): MergeFixture =
    mergeFixtureCache.computeIfAbsent((spark, sfDir), _ => buildMergeFixture(spark, sfDir))

  private def buildMergeFixture(spark: SparkSession, sfDir: String): MergeFixture = {
    import graft.operators.VersionedMerge._
    Tables.prepare(spark)
    val root = graft.FixtureTempDirs.create("graft-mfix-")
    val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
    val table = TableDefinition(TableName("graft", "events_merge"),
      root.resolve("events_merge").toUri, PartitionSchema("event_date"), FileFormat.Parquet)
    engine.initTable(table, UserId("driver"), "init")
    val events = Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts")))
      .localCheckpoint()
    events.repartition(col("event_date"))
      .versionedInsertInto(engine, table, UserId("driver"), "initial load")
    // the three merge classes, all derived deterministically from the data:
    // value stays a DOUBLE and the +1000 is a double add, mirrored exactly
    // in the oracle so the final decimal-cast sums are bit-identical
    val updates = events
      .filter(col("event_type") === "click" && col("event_id") % 10 === 0)
      .withColumn("value", col("value") + lit(1000.0))
    val inserts = events
      .filter(col("event_type") === "view" && col("event_id") % 100 === 0)
      .withColumn("event_id", col("event_id") + lit(10000000L))
      .withColumn("event_type", lit("synthetic"))
    val deletes = events
      .filter(col("event_type") === "error" && col("event_id") % 10 === 0)
      .withColumn("value", lit(-1.0)) // the delete marker: real values are >= 0
    val c0 = engine.headCommit(table.name)
    engine.mergeInto(table, updates.unionByName(inserts).unionByName(deletes),
      Seq("event_id"), UserId("driver"), "merge upsert+insert+delete",
      deleteWhen = Some(col("value") < 0))
    val c1 = engine.headCommit(table.name)
    val merged = engine.read(table)
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    // the same commit's ROW-LEVEL diff, aggregated per change class: the
    // oracle replays the three merge classes directly (update post-images
    // carry the +1000, deletes carry their PRE-image values)
    import graft.operators.ChangeFeed._
    def feedAgg(updatePreimages: Boolean): DataFrame =
      engine.readRowChangesBetween(table, Seq("event_id"), c0, c1,
          updatePreimages = updatePreimages)
        .withColumnRenamed(graft.operators.ChangeFeed.ChangeTypeColumn, "change_type")
        .groupBy(col("change_type"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
    MergeFixture(merged, feedAgg(updatePreimages = false),
      feedAgg(updatePreimages = true))
  }

  /** q_stats_skip_scan / q_sql_skip_scan / the three metadata-aggregate
    * queries share one fixture: versioned events table declaring stats
    * columns, written range-split on event_id so data skipping has
    * disjoint per-file ranges to prune, registered in the SQL catalog.
    * ONLY the table build is memoized — every frame below is constructed
    * per invocation, so a timed rep (Bench) re-runs the real work each
    * time: the manifest fold inside `summarize`, and the optimizer passes
    * (incl. the metadata-aggregate rewrite) of the SQL frames. */
  private final case class StatsSkipFixture(
      spark: SparkSession, engine: VersionedTables, table: TableDefinition,
      threshold: Long, cutoff: java.time.LocalDate) {

    def scalaSkip: DataFrame = engine.readWhere(table, col("event_id") <= threshold)
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))

    def sqlSkip: DataFrame = spark.sql(
      s"""SELECT event_date, event_type, COUNT(1) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         |FROM graft.graft.events_stats
         |WHERE event_id <= $threshold
         |GROUP BY event_date, event_type""".stripMargin)

    def metaAgg: DataFrame = graft.operators.MetadataQuery.summarize(
      engine, table, Seq("event_id", "value"))

    def sqlMetaAgg: DataFrame = spark.sql(
      """SELECT COUNT(*) AS n_rows, COUNT(value) AS n_values,
        |  MIN(event_id) AS event_id_min, MAX(event_id) AS event_id_max
        |FROM graft.graft.events_stats""".stripMargin)

    def sqlMetaRange: DataFrame = spark.sql(
      s"""SELECT COUNT(*) AS n_rows, MIN(event_id) AS event_id_min
         |FROM graft.graft.events_stats
         |WHERE event_date >= DATE'$cutoff'""".stripMargin)

    def sqlMetaGroupBy: DataFrame = spark.sql(
      """SELECT event_date, COUNT(*) AS n, MIN(event_id) AS id_min, MAX(event_id) AS id_max
        |FROM graft.graft.events_stats
        |GROUP BY event_date""".stripMargin)
  }

  /** q_bloom_skip_scan fixture: events versioned by event_type with files
    * HASH-split on user_id (deliberately uncorrelated with event_id), stats
    * + Blooms on event_id. The point lookup's needle sits mid-domain
    * (max/2), so every file's [min,max] contains it and range skipping
    * keeps all files — only the Bloom probe prunes, at partition
    * granularity. Only the table build is memoized; the lookup frame is
    * re-planned per invocation so timed reps pay the real planning. */
  private final case class BloomFixture(
      engine: VersionedTables, table: TableDefinition, needle: Long) {
    def lookup: DataFrame = engine.readWhere(table, col("event_id") === needle)
      .select(col("event_id"), col("event_type"), col("user_id"), col("value"))
  }

  private val bloomFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), BloomFixture]()

  private def bloomFixture(spark: SparkSession, sfDir: String): BloomFixture =
    bloomFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      val root = graft.FixtureTempDirs.create("graft-bloomfix-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", "events_bloom"),
        root.resolve("events_bloom").toUri, PartitionSchema("event_type"), FileFormat.Parquet,
        stats = Some(ColumnStatsConfig(
          statsColumns = List("event_id"), bloomKeyColumns = List("event_id"))))
      engine.initTable(table, UserId("driver"), "init")
      val events = Tables.events(spark, sfDir).localCheckpoint()
      events.repartition(8, col("user_id"))
        .versionedInsertInto(engine, table, UserId("driver"), "load hash-split")
      val needle = events.agg(max(col("event_id"))).head().getLong(0) / 2
      BloomFixture(engine, table, needle)
    })

  /** q_sql_insert fixture: the table is built by three pure-SQL statements
    * (load / append / partition overwrite) through the GraftSqlWrites
    * command path; only the build is memoized — `readBack` re-plans per
    * invocation. */
  private final case class SqlInsertFixture(spark: SparkSession, name: String) {
    def readBack: DataFrame = spark.sql(
      s"""SELECT event_date, event_type, COUNT(1) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         |FROM $name GROUP BY event_date, event_type""".stripMargin)
  }

  private val sqlInsertFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), SqlInsertFixture]()
  private val sqlInsertFixtureSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def sqlInsertFixture(spark: SparkSession, sfDir: String): SqlInsertFixture =
    sqlInsertFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      val n = sqlInsertFixtureSeq.incrementAndGet()
      val root = graft.FixtureTempDirs.create("graft-sqlins-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", s"events_sql_$n"),
        root.resolve("events_sql").toUri, PartitionSchema("event_date"), FileFormat.Parquet)
      engine.initTable(table, UserId("driver"), "init")
      graft.sql.GraftTableRegistry.register(engine, table)
      val t = s"graft.${table.name.fullyQualifiedName}"
      val view = s"events_sql_src_$n"
      Tables.events(spark, sfDir).localCheckpoint().createOrReplaceTempView(view)
      // load: the first write defines the schema (partition column LAST,
      // the order every later positional INSERT follows)
      spark.sql(
        s"""INSERT INTO $t
           |SELECT event_id, ts, user_id, value, props, event_type,
           |  CAST(ts AS DATE) AS event_date
           |FROM $view""".stripMargin)
      // append: synthetic twins of every 100th click, into EXISTING
      // partitions — INSERT INTO unions with the current rows
      spark.sql(
        s"""INSERT INTO $t
           |SELECT event_id + 20000000, ts, user_id, value, props,
           |  'synthetic', CAST(ts AS DATE) AS event_date
           |FROM $view WHERE event_type = 'click' AND event_id % 100 = 0""".stripMargin)
      // overwrite ONE partition: the max date reprocessed without errors
      // (dynamic partition overwrite — only that partition is replaced,
      // taking its appended synthetics with it)
      val maxDate = spark.table(view).agg(max(to_date(col("ts")))).head().getDate(0)
      spark.sql(
        s"""INSERT OVERWRITE $t
           |SELECT event_id, ts, user_id, value, props, event_type,
           |  CAST(ts AS DATE) AS event_date
           |FROM $view
           |WHERE CAST(ts AS DATE) = DATE'$maxDate' AND event_type <> 'error'""".stripMargin)
      SqlInsertFixture(spark, t)
    })

  /** q_sql_update / q_sql_delete fixture: one SQL UPDATE + one SQL DELETE
    * over a versioned events table; only the build is memoized, the two
    * read-backs re-plan per invocation. */
  private final case class SqlDmlFixture(spark: SparkSession, name: String) {
    def byType: DataFrame = spark.sql(
      s"""SELECT event_type, COUNT(1) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         |FROM $name GROUP BY event_type""".stripMargin)
    def byDay: DataFrame = spark.sql(
      s"""SELECT event_date, COUNT(1) AS n
         |FROM $name GROUP BY event_date""".stripMargin)
  }

  private val sqlDmlFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), SqlDmlFixture]()
  private val sqlDmlFixtureSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def sqlDmlFixture(spark: SparkSession, sfDir: String): SqlDmlFixture =
    sqlDmlFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      val n = sqlDmlFixtureSeq.incrementAndGet()
      val root = graft.FixtureTempDirs.create("graft-sqldml-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", s"events_dml_$n"),
        root.resolve("events_dml").toUri, PartitionSchema("event_date"), FileFormat.Parquet,
        stats = Some(ColumnStatsConfig(
          statsColumns = List("event_id", "value"), bloomKeyColumns = List("event_id"))))
      engine.initTable(table, UserId("driver"), "init")
      graft.sql.GraftTableRegistry.register(engine, table)
      val t = s"graft.${table.name.fullyQualifiedName}"
      Tables.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts")))
        .repartition(col("event_date"))
        .versionedInsertInto(engine, table, UserId("driver"), "load")
      spark.sql(
        s"UPDATE $t SET value = value + 500.0 WHERE event_type = 'click' AND event_id % 7 = 0")
      spark.sql(
        s"DELETE FROM $t WHERE event_type = 'error' AND event_id % 3 = 0")
      SqlDmlFixture(spark, t)
    })

  /** q_sql_merge fixture: the q_merge_upsert classes replayed as ONE SQL
    * MERGE statement over a versioned events table. Only the build is
    * memoized. */
  private final case class SqlMergeFixture(spark: SparkSession, name: String) {
    def merged: DataFrame = spark.sql(
      s"""SELECT event_date, event_type, COUNT(1) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         |FROM $name GROUP BY event_date, event_type""".stripMargin)
  }

  private val sqlMergeFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), SqlMergeFixture]()
  private val sqlMergeFixtureSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def sqlMergeFixture(spark: SparkSession, sfDir: String): SqlMergeFixture =
    sqlMergeFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      val n = sqlMergeFixtureSeq.incrementAndGet()
      val root = graft.FixtureTempDirs.create("graft-sqlmerge-q-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", s"events_sqlmerge_$n"),
        root.resolve("events_sqlmerge").toUri, PartitionSchema("event_date"),
        FileFormat.Parquet,
        stats = Some(ColumnStatsConfig(
          statsColumns = List("event_id"), bloomKeyColumns = List("event_id"))))
      engine.initTable(table, UserId("driver"), "init")
      graft.sql.GraftTableRegistry.register(engine, table)
      val t = s"graft.${table.name.fullyQualifiedName}"
      val events = Tables.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts")))
        .localCheckpoint()
      events.repartition(col("event_date"))
        .versionedInsertInto(engine, table, UserId("driver"), "load")
      // the three merge classes as ONE source view (see buildMergeFixture —
      // identical arithmetic, so the oracle string is shared verbatim)
      val updates = events
        .filter(col("event_type") === "click" && col("event_id") % 10 === 0)
        .withColumn("value", col("value") + lit(1000.0))
      val inserts = events
        .filter(col("event_type") === "view" && col("event_id") % 100 === 0)
        .withColumn("event_id", col("event_id") + lit(10000000L))
        .withColumn("event_type", lit("synthetic"))
      val deletes = events
        .filter(col("event_type") === "error" && col("event_id") % 10 === 0)
        .withColumn("value", lit(-1.0))
      val view = s"merge_sqlsrc_$n"
      updates.unionByName(inserts).unionByName(deletes).createOrReplaceTempView(view)
      spark.sql(
        s"""MERGE INTO $t AS tgt USING $view AS s ON tgt.event_id = s.event_id
           |WHEN MATCHED AND s.value < 0 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      SqlMergeFixture(spark, t)
    })

  /** q_sql_merge_mixed fixture: the general clause merge as ONE SQL
    * statement — conditional DELETE, partial target-referencing UPDATE,
    * conditional sparse INSERT, and NOT MATCHED BY SOURCE DELETE. Only the
    * build is memoized. */
  private final case class SqlMergeMixedFixture(spark: SparkSession, name: String) {
    def merged: DataFrame = spark.sql(
      s"""SELECT event_type, COUNT(1) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         |FROM $name GROUP BY event_type""".stripMargin)
  }

  private val sqlMergeMixedFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), SqlMergeMixedFixture]()
  private val sqlMergeMixedFixtureSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def sqlMergeMixedFixture(spark: SparkSession, sfDir: String): SqlMergeMixedFixture =
    sqlMergeMixedFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      val n = sqlMergeMixedFixtureSeq.incrementAndGet()
      val root = graft.FixtureTempDirs.create("graft-sqlmergemix-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", s"events_sqlmergemix_$n"),
        root.resolve("events_sqlmergemix").toUri, PartitionSchema("event_date"),
        FileFormat.Parquet,
        stats = Some(ColumnStatsConfig(
          statsColumns = List("event_id"), bloomKeyColumns = List("event_id"))))
      engine.initTable(table, UserId("driver"), "init")
      graft.sql.GraftTableRegistry.register(engine, table)
      val t = s"graft.${table.name.fullyQualifiedName}"
      val events = Tables.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts")))
        .localCheckpoint()
      events.repartition(col("event_date"))
        .versionedInsertInto(engine, table, UserId("driver"), "load")
      // three source classes: partial updates (+100 on every 10th click),
      // deletes (every 10th error), fresh inserts (every 100th view, new id)
      val updates = events
        .filter(col("event_type") === "click" && col("event_id") % 10 === 0)
        .select(col("event_id"), col("event_date"),
          lit(100.0).as("delta"), lit("up").as("flag"))
      val deletes = events
        .filter(col("event_type") === "error" && col("event_id") % 10 === 0)
        .select(col("event_id"), col("event_date"),
          lit(0.0).as("delta"), lit("del").as("flag"))
      val news = events
        .filter(col("event_type") === "view" && col("event_id") % 100 === 0)
        .select((col("event_id") + lit(30000000L)).as("event_id"), col("event_date"),
          col("value").as("delta"), lit("new").as("flag"))
      val view = s"merge_mixed_src_$n"
      updates.unionByName(deletes).unionByName(news).createOrReplaceTempView(view)
      spark.sql(
        s"""MERGE INTO $t AS tgt USING $view AS s
           |ON tgt.event_date = s.event_date AND tgt.event_id = s.event_id
           |WHEN MATCHED AND s.flag = 'del' THEN DELETE
           |WHEN MATCHED THEN UPDATE SET value = tgt.value + s.delta
           |WHEN NOT MATCHED AND s.flag = 'new' THEN INSERT
           |  (event_id, ts, user_id, value, props, event_type, event_date)
           |  VALUES (s.event_id, TIMESTAMP'2024-01-01 00:00:00', CAST(-1 AS BIGINT),
           |          s.delta, NULL, 'synthetic', s.event_date)
           |WHEN NOT MATCHED BY SOURCE
           |  AND tgt.event_type = 'error' AND tgt.event_id % 5 = 0 THEN DELETE""".stripMargin)
      SqlMergeMixedFixture(spark, t)
    })

  /** q_schema_evolution fixture: narrow history + evolved recent days.
    * Only the build is memoized. */
  private final case class SchemaEvolutionFixture(
      engine: VersionedTables, table: TableDefinition) {
    def readBack: DataFrame = engine.read(table)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), count(col("value")).as("nv"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
  }

  private val schemaEvolutionFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), SchemaEvolutionFixture]()
  private val schemaEvolutionFixtureSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def schemaEvolutionFixture(spark: SparkSession, sfDir: String): SchemaEvolutionFixture =
    schemaEvolutionFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      val n = schemaEvolutionFixtureSeq.incrementAndGet()
      val root = graft.FixtureTempDirs.create("graft-evolve-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", s"events_evolve_$n"),
        root.resolve("events_evolve").toUri, PartitionSchema("event_date"),
        FileFormat.Parquet, options = Map("mergeSchema" -> "true"))
      engine.initTable(table, UserId("driver"), "init")
      val events = Tables.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts")))
        .localCheckpoint()
      val cutoff = java.sql.Date.valueOf(
        events.agg(max(col("event_date"))).head().getDate(0).toLocalDate.minusDays(5))
      events.filter(col("event_date") < lit(cutoff))
        .select("event_id", "event_type", "event_date")
        .repartition(col("event_date"))
        .versionedInsertInto(engine, table, UserId("driver"), "narrow history")
      events.filter(col("event_date") >= lit(cutoff))
        .select("event_id", "event_type", "value", "event_date")
        .repartition(col("event_date"))
        .versionedInsertIntoEvolving(engine, table, UserId("driver"), "evolved +value")
      SchemaEvolutionFixture(engine, table)
    })

  /** q_sql_create fixture: the SQL-only lifecycle — open a schema for DDL,
    * CREATE TABLE (declared schema + stats TBLPROPERTIES), INSERT INTO
    * positionally (the declaration aligns it), read back. Only the build
    * is memoized. */
  private final case class SqlCreateFixture(spark: SparkSession, name: String) {
    def readBack: DataFrame = spark.sql(
      s"""SELECT event_date, event_type, COUNT(1) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         |FROM $name GROUP BY event_date, event_type""".stripMargin)
  }

  private val sqlCreateFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), SqlCreateFixture]()
  private val sqlCreateFixtureSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def sqlCreateFixture(spark: SparkSession, sfDir: String): SqlCreateFixture =
    sqlCreateFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      val n = sqlCreateFixtureSeq.incrementAndGet()
      val root = graft.FixtureTempDirs.create("graft-sqlddl-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val schema = s"ddlfix$n"
      graft.sql.GraftTableRegistry.registerSchema(schema, engine, root.resolve("tables").toUri)
      val t = s"graft.$schema.events_ddl"
      spark.sql(
        s"""CREATE TABLE $t (
           |  event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING,
           |  value DOUBLE, props STRING, event_date DATE
           |) PARTITIONED BY (event_date)
           |TBLPROPERTIES ('stats.columns' = 'event_id,value')""".stripMargin)
      val view = s"events_ddl_src_$n"
      Tables.events(spark, sfDir).localCheckpoint().createOrReplaceTempView(view)
      spark.sql(
        s"""INSERT INTO $t
           |SELECT event_id, ts, user_id, event_type, value, props,
           |  CAST(ts AS DATE) FROM $view""".stripMargin)
      SqlCreateFixture(spark, t)
    })

  /** q_sql_optimize / q_sql_history fixture: load → SQL OPTIMIZE ZORDER BY,
    * then read the table and its DESCRIBE HISTORY. Only the build is
    * memoized. */
  private final case class SqlMaintFixture(spark: SparkSession, name: String) {
    def optimized: DataFrame = spark.sql(
      s"""SELECT event_type, COUNT(1) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
         |FROM $name GROUP BY event_type""".stripMargin)
    def history: DataFrame = spark.sql(s"DESCRIBE HISTORY $name")
      .selectExpr("seq", "user_id", "substring(message, 1, 12) AS verb", "n_operations")
  }

  private val sqlMaintFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), SqlMaintFixture]()
  private val sqlMaintFixtureSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  private def sqlMaintFixture(spark: SparkSession, sfDir: String): SqlMaintFixture =
    sqlMaintFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      spark.conf.set(graft.sql.GraftSqlWrites.UserKey, "driver")
      val n = sqlMaintFixtureSeq.incrementAndGet()
      val root = graft.FixtureTempDirs.create("graft-sqlmaint-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", s"events_sqlmaint_$n"),
        root.resolve("events_sqlmaint").toUri, PartitionSchema("event_date"),
        FileFormat.Parquet,
        stats = Some(ColumnStatsConfig(statsColumns = List("event_id", "value"))))
      engine.initTable(table, UserId("driver"), "init")
      graft.sql.GraftTableRegistry.register(engine, table)
      val t = s"graft.${table.name.fullyQualifiedName}"
      Tables.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts")))
        .repartition(col("event_date"))
        .versionedInsertInto(engine, table, UserId("driver"), "load")
      spark.sql(s"OPTIMIZE $t ZORDER BY (event_id, value)").collect()
      SqlMaintFixture(spark, t)
    })

  /** q_sql_optimize_where / q_sql_show_partitions fixture: load, then a
    * PARTITION-SCOPED `OPTIMIZE ... WHERE` — the fixture itself pins the
    * scoping law (untouched partitions keep their exact versions, the
    * selected one repoints) so the gate cannot pass on an accidental
    * whole-table rewrite; the oracles check the data and the partition
    * listing. Memoized per (session, dir). */
  private final case class SqlOptWhereFixture(spark: SparkSession, name: String) {
    def aggregate: DataFrame = spark.sql(
      s"""SELECT event_date, event_type, $duckFixtureAgg
         |FROM $name GROUP BY 1, 2""".stripMargin)
    def partitions: DataFrame = spark.sql(s"SHOW PARTITIONS $name")
  }

  private val sqlOptWhereFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), SqlOptWhereFixture]()

  private def sqlOptWhereFixture(spark: SparkSession, sfDir: String): SqlOptWhereFixture =
    sqlOptWhereFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      spark.conf.set(graft.sql.GraftSqlWrites.UserKey, "driver")
      val root = graft.FixtureTempDirs.create("graft-sqloptw-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", "events_optwhere"),
        root.resolve("events_optwhere").toUri, PartitionSchema("event_date"),
        FileFormat.Parquet)
      engine.initTable(table, UserId("driver"), "init")
      graft.sql.GraftTableRegistry.register(engine, table)
      val t = s"graft.${table.name.fullyQualifiedName}"
      Tables.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts")))
        .repartition(4) // several files per partition: the compact has work
        .versionedInsertInto(engine, table, UserId("driver"), "load")
      val pre = engine.tracker.currentVersion(table.name) match {
        case PartitionedTableVersion(pvs) => pvs
        case other => sys.error(s"unexpected $other")
      }
      val target = pre.keys.map(_.columnValues.head.value).max
      spark.sql(s"OPTIMIZE $t WHERE event_date = '$target'").collect()
      val post = engine.tracker.currentVersion(table.name) match {
        case PartitionedTableVersion(pvs) => pvs
        case other => sys.error(s"unexpected $other")
      }
      val targetPart = Partition("event_date", target)
      require(post(targetPart) != pre(targetPart),
        "q_sql_optimize_where fixture: the selected partition was not rewritten")
      (pre.keySet - targetPart).foreach { p =>
        require(post(p) == pre(p),
          s"q_sql_optimize_where fixture: OPTIMIZE WHERE touched unselected '${p.toPath}'")
      }
      SqlOptWhereFixture(spark, t)
    })

  /** q_sql_analyze fixture: a table written BEFORE any stats config (no
    * manifests), re-registered with one, then `ANALYZE TABLE ... COMPUTE
    * STATISTICS` backfills the missing manifests — the fixture requires
    * the manifest to exist afterwards (so the gate can't pass on a no-op)
    * and the query reads through the skipping path. */
  private val sqlAnalyzeFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def sqlAnalyzeFixture(spark: SparkSession, sfDir: String): DataFrame =
    sqlAnalyzeFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      spark.conf.set(graft.sql.GraftSqlWrites.UserKey, "driver")
      val root = graft.FixtureTempDirs.create("graft-sqlanalyze-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val bare = TableDefinition(TableName("graft", "events_analyze"),
        root.resolve("events_analyze").toUri, PartitionSchema("event_date"),
        FileFormat.Parquet) // NO stats config: the load writes no manifests
      engine.initTable(bare, UserId("driver"), "init")
      val events = Tables.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts"))).localCheckpoint()
      events.repartitionByRange(8, col("event_id"))
        .versionedInsertInto(engine, bare, UserId("driver"), "pre-stats load")
      val statted = bare.copy(stats = Some(graft.core.ColumnStatsConfig(
        statsColumns = List("event_id", "value"))))
      graft.sql.GraftTableRegistry.register(engine, statted)
      val t = s"graft.${statted.name.fullyQualifiedName}"
      val written = spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS").collect()
      require(written.nonEmpty, "q_sql_analyze fixture: backfill wrote no manifest")
      val threshold = events.agg(max(col("event_id"))).head().getLong(0) / 10
      spark.sql(
        s"""SELECT event_type, $duckFixtureAgg
           |FROM $t WHERE event_id < $threshold GROUP BY 1""".stripMargin)
    })

  private val statsSkipFixtureCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), StatsSkipFixture]()

  private def statsSkipFixture(spark: SparkSession, sfDir: String): StatsSkipFixture =
    statsSkipFixtureCache.computeIfAbsent((spark, sfDir), _ => {
      Tables.prepare(spark)
      val root = graft.FixtureTempDirs.create("graft-skipfix-")
      val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
      val table = TableDefinition(TableName("graft", "events_stats"),
        root.resolve("events_stats").toUri, PartitionSchema("event_date"), FileFormat.Parquet,
        stats = Some(ColumnStatsConfig(
          statsColumns = List("event_id", "value"),
          bloomKeyColumns = List("event_id"))))
      engine.initTable(table, UserId("driver"), "init")
      val events = Tables.events(spark, sfDir)
        .withColumn("event_date", to_date(col("ts")))
        .localCheckpoint()
      // range-split on event_id ACROSS the date partitions: each of the 8
      // writer tasks holds one id range, so every partition dir gets up to 8
      // files with disjoint event_id ranges — the layout skipping rewards
      events.repartitionByRange(8, col("event_id"))
        .versionedInsertInto(engine, table, UserId("driver"), "load range-split")
      val threshold = events.agg(max(col("event_id"))).head().getLong(0) / 10
      val cutoff = events.agg(max(col("event_date"))).head().getDate(0)
        .toLocalDate.minusDays(5)
      graft.sql.GraftTableRegistry.register(engine, table)
      StatsSkipFixture(spark, engine, table, threshold, cutoff)
    })

  /** The fixture's states re-expressed as SQL over the raw events parquet:
    * current/compacted = everything except the max-day 'error' rows;
    * time travel = the full table; incremental = only the reprocessed day. */
  private val duckFixtureAgg =
    "COUNT(*) AS n, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v"

  /** One oracle string for BOTH skip-scan queries (Scala readWhere and SQL
    * WHERE are the same scan by contract — a single binding keeps their
    * gates provably identical). */
  private val skipScanOracle =
    s"""SELECT CAST(ts AS DATE) AS event_date, event_type, $duckFixtureAgg
       |FROM events
       |WHERE event_id <= CAST(FLOOR((SELECT MAX(event_id) FROM events) / 10) AS BIGINT)
       |GROUP BY 1, 2""".stripMargin

  /** One oracle for BOTH merge gates (Scala mergeInto and the SQL MERGE
    * statement run the same algebra): survivors (keys matched by neither
    * the update nor the delete class) + updated rows + inserted rows. */
  private val mergeOracle =
    s"""WITH merged AS (
       |  SELECT CAST(ts AS DATE) AS event_date, event_type, value
       |  FROM events
       |  WHERE NOT (event_id % 10 = 0 AND event_type IN ('click', 'error'))
       |  UNION ALL
       |  SELECT CAST(ts AS DATE), event_type, value + 1000.0
       |  FROM events WHERE event_type = 'click' AND event_id % 10 = 0
       |  UNION ALL
       |  SELECT CAST(ts AS DATE), 'synthetic', value
       |  FROM events WHERE event_type = 'view' AND event_id % 100 = 0
       |)
       |SELECT event_date, event_type, $duckFixtureAgg
       |FROM merged GROUP BY 1, 2""".stripMargin

  private def oracles_versioned: Map[String, String] = {
    val currentSql =
      s"""SELECT CAST(ts AS DATE) AS event_date, event_type, $duckFixtureAgg
         |FROM events
         |WHERE NOT (CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events)
         |           AND event_type = 'error')
         |GROUP BY 1, 2""".stripMargin
    Map(
      "q_versioned_read" -> currentSql,
      "q_compact_read" -> currentSql,
      "q_time_travel" ->
        s"""SELECT CAST(ts AS DATE) AS event_date, event_type, $duckFixtureAgg
           |FROM events GROUP BY 1, 2""".stripMargin,
      // identical state pinned via SQL VERSION AS OF — identical oracle
      "q_sql_time_travel" ->
        s"""SELECT CAST(ts AS DATE) AS event_date, event_type, $duckFixtureAgg
           |FROM events GROUP BY 1, 2""".stripMargin,
      "q_incremental_read" ->
        s"""SELECT CAST(ts AS DATE) AS event_date, event_type, $duckFixtureAgg
           |FROM events
           |WHERE CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events)
           |  AND event_type <> 'error'
           |GROUP BY 1, 2""".stripMargin,
      "q_versioned_orc" ->
        s"""SELECT CAST(ts AS DATE) AS event_date, $duckFixtureAgg
           |FROM events WHERE event_type = 'click'
           |GROUP BY 1""".stripMargin,
      "q_hive_read" ->
        s"""SELECT event_type, $duckFixtureAgg
           |FROM events
           |WHERE NOT (event_type = 'click' AND event_id % 10 = 0)
           |GROUP BY 1""".stripMargin,
      "q_versioned_csv" ->
        s"""SELECT o_orderstatus,
           |  COUNT(*) AS n,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
           |FROM orders
           |WHERE NOT (o_orderstatus = 'F' AND o_orderkey % 10 = 0)
           |GROUP BY 1""".stripMargin,
      "q_versioned_json" ->
        s"""SELECT o_orderstatus,
           |  COUNT(*) AS n,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS v
           |FROM orders
           |WHERE NOT (o_orderstatus = 'O' AND o_orderkey % 7 = 0)
           |GROUP BY 1""".stripMargin,
      // the skipping read is semantically a plain filter — the oracle IS the
      // filter; integer division (max>=0) matches FLOOR(max/10). The SQL
      // variant (optimizer-time skipping over the graft catalog) is the
      // SAME scan, so it shares the one oracle string by construction.
      "q_stats_skip_scan" -> skipScanOracle,
      "q_sql_skip_scan" -> skipScanOracle,
      // the Bloom-pruned point lookup is semantically the plain filter;
      // the needle (max/2, integer division) exists because event ids are
      // dense from 0
      "q_bloom_skip_scan" ->
        s"""SELECT event_id, event_type, user_id, value
           |FROM events
           |WHERE event_id = CAST(FLOOR((SELECT MAX(event_id) FROM events) / 2) AS BIGINT)""".stripMargin,
      // the metadata-only summary, recomputed by an actual scan: identical
      // figures prove the driver-side manifest fold is exact
      "q_metadata_agg" ->
        s"""SELECT COUNT(*) AS n_rows,
           |  MIN(event_id) AS event_id_min, MAX(event_id) AS event_id_max,
           |  CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS event_id_nulls,
           |  MIN(value) AS value_min, MAX(value) AS value_max,
           |  CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls
           |FROM events""".stripMargin,
      // the SQL metadata-aggregate, recomputed by scanning
      "q_sql_metadata_agg" ->
        s"""SELECT COUNT(*) AS n_rows, COUNT(value) AS n_values,
           |  MIN(event_id) AS event_id_min, MAX(event_id) AS event_id_max
           |FROM events""".stripMargin,
      // the partition-filtered metadata count, recomputed by scanning (the
      // fixture embeds max(event_date) - 5 days as a literal; the oracle
      // re-derives the same cutoff)
      "q_sql_meta_count_range" ->
        s"""SELECT COUNT(*) AS n_rows, MIN(event_id) AS event_id_min
           |FROM events
           |WHERE CAST(ts AS DATE) >= (SELECT MAX(CAST(ts AS DATE)) FROM events) - 5""".stripMargin,
      // the per-day GROUP BY, recomputed by scanning
      "q_sql_meta_groupby" ->
        s"""SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n,
           |  MIN(event_id) AS id_min, MAX(event_id) AS id_max
           |FROM events GROUP BY 1""".stripMargin,
      // the DML fixture's two statements replayed as set algebra: +500 on
      // the updated clicks, every third error removed
      "q_sql_update" ->
        s"""WITH final AS (
           |  SELECT event_type,
           |    value + CASE WHEN event_type = 'click' AND event_id % 7 = 0
           |                 THEN 500.0 ELSE 0.0 END AS value
           |  FROM events
           |  WHERE NOT (event_type = 'error' AND event_id % 3 = 0)
           |)
           |SELECT event_type, $duckFixtureAgg
           |FROM final GROUP BY 1""".stripMargin,
      "q_sql_delete" ->
        s"""SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n
           |FROM events
           |WHERE NOT (event_type = 'error' AND event_id % 3 = 0)
           |GROUP BY 1""".stripMargin,
      // the SQL-write fixture's three statements replayed as set algebra:
      // non-max-date base rows + their synthetic appends, then the max-date
      // partition as the overwrite left it (errors and synthetics gone)
      "q_sql_insert" ->
        s"""WITH base AS (
           |  SELECT event_id, ts, user_id, value, props, event_type,
           |         CAST(ts AS DATE) AS event_date
           |  FROM events
           |), maxd AS (SELECT MAX(event_date) AS m FROM base)
           |SELECT event_date, event_type, $duckFixtureAgg
           |FROM (
           |  SELECT * FROM base WHERE event_date <> (SELECT m FROM maxd)
           |  UNION ALL
           |  SELECT event_id + 20000000, ts, user_id, value, props,
           |         'synthetic', event_date
           |  FROM base
           |  WHERE event_type = 'click' AND event_id % 100 = 0
           |    AND event_date <> (SELECT m FROM maxd)
           |  UNION ALL
           |  SELECT * FROM base
           |  WHERE event_date = (SELECT m FROM maxd) AND event_type <> 'error'
           |)
           |GROUP BY 1, 2""".stripMargin,
      // merge-on-read DV deletes are plain set subtraction to the oracle;
      // the folded (post-compact) read must equal it bit-for-bit, and time
      // travel to the pre-delete commit must see every row
      "q_delete_dv" ->
        s"""SELECT l_returnflag, COUNT(1) AS n,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS v
           |FROM lineitem
           |WHERE NOT (l_orderkey % 97 = 0 OR l_orderkey % 101 = 0)
           |GROUP BY l_returnflag""".stripMargin,
      "q_delete_dv_fold" ->
        s"""SELECT l_returnflag, COUNT(1) AS n,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS v
           |FROM lineitem
           |WHERE NOT (l_orderkey % 97 = 0 OR l_orderkey % 101 = 0)
           |GROUP BY l_returnflag""".stripMargin,
      "q_delete_dv_tt" ->
        s"""SELECT l_returnflag, COUNT(1) AS n,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS v
           |FROM lineitem GROUP BY l_returnflag""".stripMargin,
      "q_sql_delete_dv" ->
        s"""SELECT l_returnflag, COUNT(1) AS n,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS v
           |FROM lineitem
           |WHERE NOT (l_orderkey % 97 = 0)
           |GROUP BY l_returnflag""".stripMargin,
      "q_sql_update_dv" ->
        s"""SELECT l_returnflag, COUNT(1) AS n,
           |  CAST(SUM(CAST(CASE WHEN l_orderkey % 89 = 0 THEN l_quantity + 1000
           |    ELSE l_quantity END AS DECIMAL(18,2))) AS DOUBLE) AS v
           |FROM lineitem
           |WHERE NOT (l_orderkey % 97 = 0)
           |GROUP BY l_returnflag""".stripMargin,
      // both updates applied in order: +1000 on %89 keys, then +500 on %83
      // keys (a key divisible by both gets both)
      "q_sql_update_dv_stacked" ->
        s"""SELECT l_returnflag, COUNT(1) AS n,
           |  CAST(SUM(CAST(
           |    (CASE WHEN l_orderkey % 89 = 0 THEN l_quantity + 1000 ELSE l_quantity END)
           |    + (CASE WHEN l_orderkey % 83 = 0 THEN 500 ELSE 0 END)
           |    AS DECIMAL(18,2))) AS DOUBLE) AS v
           |FROM lineitem
           |WHERE NOT (l_orderkey % 97 = 0)
           |GROUP BY l_returnflag""".stripMargin,
      // RESTORE fully undid the delete: the plain aggregate
      "q_sql_restore" ->
        s"""SELECT event_type, $duckFixtureAgg
           |FROM events GROUP BY 1""".stripMargin,
      // durable restore: the full table (delete undone) PLUS the probe rows
      // the post-restore insert added — rows a ref-move rollback would lose
      "q_sql_restore_write" ->
        s"""SELECT event_type, $duckFixtureAgg
           |FROM (
           |  SELECT event_type, value FROM events
           |  UNION ALL
           |  SELECT 'zprobe' AS event_type, value FROM events
           |  WHERE event_type = 'click' AND event_id % 100 = 0
           |) GROUP BY 1""".stripMargin,
      // MERGE algebra replayed in SQL: survivors (keys matched by neither the
      // update nor the delete class) + updated rows + inserted rows
      "q_merge_upsert" -> mergeOracle,
      // the SQL MERGE statement runs the same algebra — same oracle string
      // by construction (one binding keeps the two gates provably identical)
      "q_sql_merge" -> mergeOracle,
      // the GENERAL clause merge replayed as set algebra: matched deletes
      // (every 10th error) + by-source deletes (error ids ≡5 mod 10) drop
      // rows, every 10th click gains +100 (the partial target-referencing
      // UPDATE), and every 100th view spawns a 'synthetic' insert carrying
      // its value
      // schema evolution replayed: value exists only where the date is in
      // the evolved (last-five-days) slice
      "q_schema_evolution" ->
        s"""SELECT event_type, COUNT(*) AS n,
           |  COUNT(CASE WHEN CAST(ts AS DATE) >=
           |    (SELECT MAX(CAST(ts AS DATE)) FROM events) - 5 THEN value END) AS nv,
           |  CAST(SUM(CAST(CASE WHEN CAST(ts AS DATE) >=
           |    (SELECT MAX(CAST(ts AS DATE)) FROM events) - 5 THEN value END
           |    AS DECIMAL(18,2))) AS DOUBLE) AS v
           |FROM events GROUP BY 1""".stripMargin,
      // DDL lifecycle: create+insert+select equals the plain aggregate
      "q_sql_create" ->
        s"""SELECT CAST(ts AS DATE) AS event_date, event_type, $duckFixtureAgg
           |FROM events GROUP BY 1, 2""".stripMargin,
      // OPTIMIZE is layout-only: the read-back equals the plain aggregate
      "q_sql_optimize" ->
        s"""SELECT event_type, $duckFixtureAgg
           |FROM events GROUP BY 1""".stripMargin,
      // scoped OPTIMIZE is layout-only too (the SCOPING itself is pinned by
      // the fixture's version-identity requires)
      "q_sql_optimize_where" ->
        s"""SELECT CAST(ts AS DATE) AS event_date, event_type, $duckFixtureAgg
           |FROM events GROUP BY 1, 2""".stripMargin,
      // the live partition listing == the distinct partition values
      "q_sql_show_partitions" ->
        s"""SELECT DISTINCT 'event_date=' || CAST(CAST(ts AS DATE) AS VARCHAR)
           |  AS partition FROM events""".stripMargin,
      // backfilled skipping is exact: the filtered aggregate, plainly
      "q_sql_analyze" ->
        s"""SELECT event_type, $duckFixtureAgg
           |FROM events
           |WHERE event_id < (SELECT CAST(FLOOR(MAX(event_id) / 10) AS BIGINT) FROM events)
           |GROUP BY 1""".stripMargin,
      // the commit log: init (1 op) → load (one AddPartitionVersion per
      // live event_date partition PLUS the round-14 SetTableSchema record —
      // the first data write is the schema-defining commit) → SQL OPTIMIZE
      // (partition ops only; the shape is unchanged, nothing re-records)
      "q_sql_history" ->
        s"""WITH d AS (
           |  SELECT CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS INTEGER) AS nd FROM events
           |)
           |SELECT CAST(seq AS BIGINT) AS seq, user_id, verb, n_operations FROM (
           |  SELECT 3 AS seq, 'driver' AS user_id, 'SQL OPTIMIZE' AS verb,
           |         (SELECT nd FROM d) AS n_operations
           |  UNION ALL SELECT 2, 'driver', 'load', (SELECT nd FROM d) + 1
           |  UNION ALL SELECT 1, 'driver', 'init', 1
           |) t""".stripMargin,
      "q_sql_merge_mixed" ->
        s"""WITH base AS (
           |  SELECT event_id, value, event_type FROM events
           |), final AS (
           |  SELECT event_type,
           |    value + CASE WHEN event_type = 'click' AND event_id % 10 = 0
           |                 THEN 100.0 ELSE 0.0 END AS value
           |  FROM base
           |  WHERE NOT (event_type = 'error' AND event_id % 10 = 0)
           |    AND NOT (event_type = 'error' AND event_id % 5 = 0 AND event_id % 10 <> 0)
           |  UNION ALL
           |  SELECT 'synthetic', value FROM base
           |  WHERE event_type = 'view' AND event_id % 100 = 0
           |)
           |SELECT event_type, $duckFixtureAgg
           |FROM final GROUP BY 1""".stripMargin,
      // the merge's three change classes, replayed directly: updates emit
      // post-images (+1000), inserts the synthetic rows, deletes PRE-images
      "q_change_feed" ->
        s"""WITH changes AS (
           |  SELECT 'update' AS change_type, event_type, value + 1000.0 AS value
           |  FROM events WHERE event_type = 'click' AND event_id % 10 = 0
           |  UNION ALL
           |  SELECT 'insert', 'synthetic', value
           |  FROM events WHERE event_type = 'view' AND event_id % 100 = 0
           |  UNION ALL
           |  SELECT 'delete', event_type, value
           |  FROM events WHERE event_type = 'error' AND event_id % 10 = 0
           |)
           |SELECT change_type, event_type, $duckFixtureAgg
           |FROM changes GROUP BY 1, 2""".stripMargin,
      // the full-CDF twin: the update class replayed as BOTH its sides
      "q_change_feed_pre" ->
        s"""WITH changes AS (
           |  SELECT 'update_preimage' AS change_type, event_type, value
           |  FROM events WHERE event_type = 'click' AND event_id % 10 = 0
           |  UNION ALL
           |  SELECT 'update_postimage', event_type, value + 1000.0
           |  FROM events WHERE event_type = 'click' AND event_id % 10 = 0
           |  UNION ALL
           |  SELECT 'insert', 'synthetic', value
           |  FROM events WHERE event_type = 'view' AND event_id % 100 = 0
           |  UNION ALL
           |  SELECT 'delete', event_type, value
           |  FROM events WHERE event_type = 'error' AND event_id % 10 = 0
           |)
           |SELECT change_type, event_type, $duckFixtureAgg
           |FROM changes GROUP BY 1, 2""".stripMargin)
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++ graft.queries.PipelineQueries.oracles ++
      graft.queries.CorpusQueries.oracles ++ oracles_versioned
}
