package graft.examples

import graft.core._
import graft.operators.{CorpusTools, Dedup, QualityModels, Similarity, TextIndex, TextSearch, VersionedTables}
import graft.operators.VersionedTables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-growth probe: measures the wall-clock SLOPE of the heaviest operator
 * families between sf0.1 and a locally generated ~10× dataset ("sfx1"),
 * because plan shapes argue linearity but only a measurement shows it.
 *
 * The 10× corpus is built to preserve WORKLOAD SHAPE, not just row count:
 *  - `documents`: 10 replicas with every token suffixed `_r<k>` — within a
 *    replica the exact/near-dup structure is identical to sf0.1, across
 *    replicas no shingle (and no full text) collides, so total dup/near-dup
 *    pairs scale ×10 (NOT ×100, which naive copying would produce via
 *    cross-replica duplicates and which would make any pair-mining operator
 *    look super-linear by fixture construction). Two coprime-free suffixes
 *    per replica avoid the LCG-aliasing trap recorded in round 6.
 *  - `events`: user_id offset per replica — per-user session/window
 *    structure identical, ×10 users.
 *  - `lineitem`: order-key offset — partition CARDINALITY under
 *    l_returnflag stays 3, partition SIZE grows ×10 (the versioned-write
 *    scaling question is bytes-per-partition, not partition count).
 *  - `embeddings`: vec_id offset, vectors unchanged (ANN probes measure
 *    scan/rank cost against a FIXED query set; duplicate neighbors don't
 *    change the work per candidate).
 *
 * Prints one `SCALEPROBE family=<f> scale=<s> rep=<r> s=<secs>` line per
 * timed run (interleaved reps, min taken) and a final `SCALE_SLOPE` table.
 * Usage: `tools/run.sh graft.examples.ScaleProbe [baseDir] [xDir] [replicas]
 * [family,family,...]` — the optional fourth arg restricts to named
 * families (new-operator probes without re-running the whole battery).
 */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val xDir = args.lift(1).getOrElse("/tmp/graft-sfx1")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    generateIfMissing(spark, baseDir, xDir, replicas)

    def docs(dir: String) = spark.read.parquet(s"$dir/documents.parquet")
    def emb(dir: String) = spark.read.parquet(s"$dir/embeddings.parquet")
    def li(dir: String) = spark.read.parquet(s"$dir/lineitem.parquet")

    // fixed 100-query set present identically at both scales (replica 0)
    def queries(dir: String) = emb(dir).filter(col("vec_id") < 100)

    val bm25IndexCache =
      scala.collection.mutable.Map.empty[String, (VersionedTables, TableDefinition)]
    def bm25IndexFor(dir: String): (VersionedTables, TableDefinition) =
      bm25IndexCache.getOrElseUpdate(dir, {
        val root = java.nio.file.Files.createTempDirectory("graft-scale-bm25-")
        val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
        val table = TableDefinition(TableName("scale", "postings"),
          root.resolve("postings").toUri, TextIndex.indexSchema, FileFormat.Parquet)
        engine.initTable(table, UserId("probe"), "init")
        TextIndex.buildIndex(engine, table, docs(dir), buckets = 64, userId = UserId("probe"))
        (engine, table)
      })

    // shared stats-manifest fixture (stats_skip / merge_pruned): one
    // range-split versioned events table per data dir, built on first use —
    // the build lands in a probe's rep 1; min-over-reps sees steady state
    val statsFixtures =
      scala.collection.mutable.Map.empty[String, (VersionedTables, TableDefinition, Long)]
    def statsFixture(dir: String): (VersionedTables, TableDefinition, Long) =
      statsFixtures.getOrElseUpdate(dir, {
        val root = graft.FixtureTempDirs.create("graft-probe-skip-")
        val e = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
        val t = TableDefinition(TableName("probe", "events_stats"),
          root.resolve("events_stats").toUri, PartitionSchema("event_date"),
          FileFormat.Parquet,
          stats = Some(ColumnStatsConfig(List("event_id", "value"),
            bloomKeyColumns = List("event_id"))))
        e.initTable(t, UserId("probe"), "init")
        val ev = graft.Tables.events(spark, dir)
          .withColumn("event_date", to_date(col("ts"))).localCheckpoint()
        ev.repartitionByRange(8, col("event_id"))
          .versionedInsertInto(e, t, UserId("probe"), "load")
        (e, t, ev.agg(max(col("event_id"))).head().getLong(0) / 10)
      })

    // bloom_skip fixture: events by event_type, files HASH-split on user_id
    // (uncorrelated with event_id) — the layout where only the partition
    // Blooms can prune a point lookup; needle = max id / 2 (mid-domain, so
    // every file's range contains it)
    val bloomFixtures =
      scala.collection.mutable.Map.empty[String, (VersionedTables, TableDefinition, Long)]
    def bloomFixture(dir: String): (VersionedTables, TableDefinition, Long) =
      bloomFixtures.getOrElseUpdate(dir, {
        val root = graft.FixtureTempDirs.create("graft-probe-bloom-")
        val e = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
        val t = TableDefinition(TableName("probe", "events_bloom"),
          root.resolve("events_bloom").toUri, PartitionSchema("event_type"),
          FileFormat.Parquet,
          stats = Some(ColumnStatsConfig(List("event_id"),
            bloomKeyColumns = List("event_id"))))
        e.initTable(t, UserId("probe"), "init")
        val ev = graft.Tables.events(spark, dir).localCheckpoint()
        ev.repartition(8, col("user_id"))
          .versionedInsertInto(e, t, UserId("probe"), "load hash-split")
        (e, t, ev.agg(max(col("event_id"))).head().getLong(0) / 2)
      })

    // evolve_write fixture: a mergeSchema table (16 files per partition)
    // evolved once — the timed family then measures GUARDED WRITES and
    // planning-only reads with a cold schema cache, i.e. exactly the
    // per-statement schema-resolution cost that used to footer-merge every
    // live file. With the round-14 log-recorded schema the slope must stay
    // flat as the file count grows ~10×.
    val evolveFixtures = scala.collection.mutable.Map
      .empty[String, (VersionedTables, TableDefinition, org.apache.spark.sql.DataFrame)]
    def evolveFixture(dir: String): (VersionedTables, TableDefinition, org.apache.spark.sql.DataFrame) =
      evolveFixtures.getOrElseUpdate(dir, {
        val root = graft.FixtureTempDirs.create("graft-probe-evolve-")
        val e = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
        val t = TableDefinition(TableName("probe", "events_evolve"),
          root.resolve("events_evolve").toUri, PartitionSchema("event_type"),
          FileFormat.Parquet, options = Map("mergeSchema" -> "true"))
        e.initTable(t, UserId("probe"), "init")
        val ev = graft.Tables.events(spark, dir).localCheckpoint()
        // same rows-per-file discipline as the control twin: x100 rows
        // means ~x100 files, which is what schema resolution must survive
        val nFiles = math.max(4, (ev.count() / 20000L).toInt)
        ev.repartition(nFiles).versionedInsertInto(e, t, UserId("probe"), "load")
        val one = ev.limit(1).withColumn("extra", lit(1.0)).localCheckpoint()
        one.versionedInsertIntoEvolving(e, t, UserId("probe"), "evolve +extra")
        (e, t, one)
      })

    // CONTROL twin of evolve_write: the same evolved layout built through
    // RAW tracker commits, so the history carries NO SetTableSchema — the
    // guard and the read must footer-merge every live file, the pre-round-14
    // cost the log-recorded schema eliminates. The base/x100 pair measures
    // how that cost scales with file count; compare against evolve_write's.
    val evolveNoSchemaFixtures = scala.collection.mutable.Map
      .empty[String, (VersionedTables, TableDefinition, org.apache.spark.sql.DataFrame)]
    def evolveNoSchemaFixture(dir: String)
        : (VersionedTables, TableDefinition, org.apache.spark.sql.DataFrame) =
      evolveNoSchemaFixtures.getOrElseUpdate(dir, {
        val root = graft.FixtureTempDirs.create("graft-probe-evolve-ns-")
        val e = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
        val t = TableDefinition(TableName("probe", "events_evolve_ns"),
          root.resolve("events_evolve_ns").toUri, PartitionSchema("event_type"),
          FileFormat.Parquet, options = Map("mergeSchema" -> "true"))
        e.initTable(t, UserId("probe"), "init")
        val ev = graft.Tables.events(spark, dir).localCheckpoint()
        // file count must scale with the data (footer-merge cost is per
        // FILE): ~20k rows per task, so x100 rows means ~x100 files
        val nFiles = math.max(4, (ev.count() / 20000L).toInt)
        def rawCommit(df: org.apache.spark.sql.DataFrame, msg: String): Unit = {
          val v = Version.generate()
          df.withColumn(Version.VersionColumn, lit(v.label))
            .write.partitionBy("event_type", Version.VersionColumn)
            .mode("append").parquet(t.location.toString)
          val parts = VersionedTables.partitionValues(df, t.partitionSchema)
          e.tracker.commit(t.name, TableUpdate(UserId("probe"), msg, java.time.Instant.now(),
            parts.map(TableOperation.AddPartitionVersion(_, v))))
        }
        rawCommit(ev.repartition(nFiles), "load (no schema record)")
        val one = ev.limit(1).withColumn("extra", lit(1.0)).localCheckpoint()
        rawCommit(one, "evolve (no schema record)")
        (e, t, one)
      })

    val families: Seq[(String, String => Unit)] = Seq(
      "evolve_write_noschema" -> (dir => {
        val (e, t, one) = evolveNoSchemaFixture(dir)
        (1 to 3).foreach { _ =>
          val cold = new VersionedTables(spark, e.tracker)
          one.versionedInsertInto(cold, t, UserId("probe"), "steady write")
          cold.read(t).schema
        }
      }),
      "evolve_write" -> (dir => {
        val (e, t, one) = evolveFixture(dir)
        (1 to 3).foreach { _ =>
          // a FRESH engine per write: empty schema-shape cache, so the
          // drift guard must resolve the table's union schema — from the
          // log (flat cost) rather than all live footers (linear cost)
          val cold = new VersionedTables(spark, e.tracker)
          one.versionedInsertInto(cold, t, UserId("probe"), "steady write")
          cold.read(t).schema // planning-only read of the evolved table
        }
      }),
      "exact_dedup" -> (dir => { Dedup.exactDupGroups(docs(dir)).count(); () }),
      "lsh_dedup_chain" -> (dir => {
        Dedup.dupClusters(Dedup.minhashNearDupPairs(docs(dir), threshold = 0.8)).count(); ()
      }),
      "window_dedup" -> (dir => {
        CorpusTools.repeatedWindows(docs(dir), "doc_id", "text", n = 5).count(); ()
      }),
      "dsir_weight_table" -> (dir => {
        CorpusTools.importanceWeightTable(docs(dir), "text", col("lang") === "en"); ()
      }),
      "ann_brute" -> (dir => {
        Similarity.bruteForceTopK(queries(dir), emb(dir), k = 10).count(); ()
      }),
      "ann_ivf" -> (dir => {
        Similarity.ivfTopK(queries(dir), emb(dir), k = 10, nlist = 16, nprobe = 4).count(); ()
      }),
      "versioned_write_read" -> (dir => {
        val root = java.nio.file.Files.createTempDirectory("graft-scale-vw-")
        val engine = VersionedTables.withFileStore(spark, root.resolve("store").toUri)
        val table = TableDefinition(TableName("scale", "lineitem"),
          root.resolve("lineitem").toUri, PartitionSchema("l_returnflag"), FileFormat.Parquet)
        engine.initTable(table, UserId("probe"), "init")
        li(dir).repartition(col("l_returnflag"))
          .versionedInsertInto(engine, table, UserId("probe"), "load")
        engine.read(table).count()
        ()
      }),
      "span_dedup" -> (dir => {
        // aggregate a COMPUTED column: a bare count() lets Catalyst drop the
        // stats join entirely (left join on an aggregate's unique keys never
        // changes cardinality) and the probe would time a bare scan
        CorpusTools.duplicatedSpans(docs(dir), "doc_id", "text", n = 8)
          .agg(sum(col("dup_tokens"))).collect(); ()
      }),
      "bm25_search" -> (dir => {
        // replica tokens carry a _r<k> suffix: probe the replica-0 terms at
        // scale so the matching-doc volume stays one replica's worth and the
        // measured growth is the stats scan + term-filtered explode
        val terms = if (dir == baseDir) Seq("hash", "join", "dup")
                    else Seq("hash_r0", "join_r0", "dup_r0")
        TextSearch.bm25TopK(docs(dir), "doc_id", "text", terms, k = 50).count(); ()
      }),
      "lm_perplexity" -> (dir => {
        val m = QualityModels.lmCostTable(docs(dir), "text", col("lang") === "en")
        QualityModels.lmPerplexity(docs(dir), "doc_id", "text", m)
          .agg(sum(col("lm_cost"))).collect(); ()
      }),
      "funnel" -> (dir => {
        // events replicate with user offsets: per-user structure identical,
        // x10/x100 users — funnel cost must track the step-typed slice.
        // Tables.events (not a bare cast): the testdata layout stores ts as
        // TIMESTAMP(NANOS) → LongType under nanosAsLong, and long→timestamp
        // CAST means SECONDS — the dispatch there is the only correct read,
        // for both the base dir and the replicas (which copy ts verbatim)
        val ev = graft.Tables.events(spark, dir)
        graft.operators.EventAnalytics.funnelSteps(
          ev, "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
          .agg(sum(col("steps_completed"))).collect(); ()
      }),
      "funnel_windowed" -> (dir => {
        val ev = graft.Tables.events(spark, dir)
        graft.operators.EventAnalytics.windowedFunnelSteps(
          ev, "user_id", "event_type", "ts", Seq("view", "click", "purchase"),
          windowMicros = 6L * 3600 * 1000000)
          .agg(sum(col("steps_completed"))).collect(); ()
      }),
      "retention" -> (dir => {
        val ev = graft.Tables.events(spark, dir)
        graft.operators.EventAnalytics.retentionCohorts(ev, "user_id", "ts")
          .agg(sum(col("n_users"))).collect(); ()
      }),
      "sessions" -> (dir => {
        // the incremental session fold over one delivery: per-user structure
        // identical across replicas, x10/x100 users — the user-keyed
        // collect + fold must track the event volume linearly
        val ev = graft.Tables.events(spark, dir)
        val st = graft.operators.EventAnalytics.advanceSessionState(
          graft.operators.EventAnalytics.emptySessionState(spark),
          ev, "user_id", "ts", "value", 30L * 60 * 1000000)
        graft.operators.EventAnalytics.sessionsFromState(st)
          .agg(sum(col("n_events"))).collect(); ()
      }),
      "heavy_hitters" -> (dir => {
        // replica tokens are suffixed, so a base hot word's copies are 100
        // DISTINCT words each holding 1/100th the corpus share — scale the
        // threshold down with the replica count to keep the WORKLOAD shape
        // (30 hitters per replica: the heavy slice grows with the data and
        // the probe measures sketch pass + prefilter scan + heavy-slice
        // shuffle, not an emptying result set). The operator derives its
        // sketch eps from minShare (eps must sit well UNDER the threshold
        // or the prefilter admits the tail — the round-11 review's point).
        val share = if (dir == baseDir) 0.005 else 0.005 / replicas
        graft.operators.ScaleTools.heavyHitters(
          docs(dir).select(explode(
            graft.functions.TextFunctions.tokens(col("text"))).as("word")),
          "word", minShare = share).count(); ()
      }),
      "stats_skip" -> (dir => {
        // data-skipping READ (q_stats_skip_scan shape): versioned events
        // with a stats manifest, range-split on event_id inside each date
        // partition, read back through the bottom ~10% of ids. The fixture
        // build (write + one-pass stats collection) lands in rep 1 only —
        // min-over-reps isolates the steady pruned read, whose cost must
        // track the MATCHING slice, not the table: the manifest drops ~7/8
        // of each partition's files before any listing.
        val (engine, table, thr) = statsFixture(dir)
        engine.readWhere(table, col("event_id") <= thr)
          .agg(count(lit(1)), sum(col("value"))).collect(); ()
      }),
      "bloom_skip" -> (dir => {
        // Bloom-pruned point lookup on an UNCLUSTERED key (the
        // q_bloom_skip_scan shape): event_type partitions with files
        // hash-split on user_id, so every file's event_id range contains
        // the mid-domain needle — min/max pruning keeps everything and the
        // per-partition Bloom is what excludes ~4 of 5 partitions. Steady
        // cost must track the ONE surviving partition's files, never the
        // table; the build lands in rep 1 only.
        val (engine, table, needle) = bloomFixture(dir)
        engine.readWhere(table, col("event_id") === needle)
          .agg(count(lit(1))).collect(); ()
      }),
      "metadata_agg" -> (dir => {
        // metadata-only aggregation (q_metadata_agg shape): COUNT + two
        // columns' MIN/MAX/nulls folded from the manifests driver-side. The
        // fixture build lands in rep 1; the steady state is pure driver
        // work over CACHED manifests — the slope should track the FILE
        // count (more writer tasks at ×N), never the row count, and stay
        // milliseconds at any scale. The collect() is a 1-row local frame.
        val (engine, table, _) = statsFixture(dir)
        graft.operators.MetadataQuery.summarize(
          engine, table, Seq("event_id", "value")).collect(); ()
      }),
      "merge_pruned" -> (dir => {
        // MERGE discovery pruning: the source updates ~1/50 of ONE date's
        // keys; the manifest Blooms prove the other 29 partitions hold none
        // of them, so discovery + rewrite cost tracks the TOUCHED partition
        // (whose size grows with the data), never the table. Each rep adds
        // one commit — steady state, same touched slice every time.
        import graft.operators.VersionedMerge._
        val (engine, table, _) = statsFixture(dir)
        val maxDate = graft.Tables.events(spark, dir)
          .agg(max(to_date(col("ts")))).head().getDate(0)
        val source = graft.Tables.events(spark, dir)
          .withColumn("event_date", to_date(col("ts")))
          .filter(col("event_date") === lit(maxDate) && col("event_id") % 50 === 0)
          .withColumn("value", col("value") + lit(1.0))
        engine.mergeInto(table, source, Seq("event_id"), UserId("probe"),
          "probe merge"); ()
      }),
      "merge_general" -> (dir => {
        // the GENERAL clause merge (MergeApply): a partial conditional
        // UPDATE of ~1/50 of one date's keys plus a by-source DELETE whose
        // condition scopes it to that same date. Keys ⊇ partition column →
        // candidate discovery is a zero-scan value intersection; the
        // by-source scope prunes from the clause condition — the rewrite
        // cost tracks the ONE touched partition, never the table.
        import graft.operators.MergeApply._
        val (engine, table, _) = statsFixture(dir)
        val maxDate = graft.Tables.events(spark, dir)
          .agg(max(to_date(col("ts")))).head().getDate(0)
        val source = graft.Tables.events(spark, dir)
          .withColumn("event_date", to_date(col("ts")))
          .filter(col("event_date") === lit(maxDate) && col("event_id") % 50 === 0)
          .select(col("event_id"), col("event_date"))
        engine.mergeApply(table, source, Seq("event_date", "event_id"),
          UserId("probe"), "probe general merge",
          matched = Seq(MatchedUpdate(None,
            Map("value" -> (coalesce(col("value"), lit(0.0)) + lit(1.0))))),
          notMatchedBySource = Seq(BySourceDelete(Some(
            col("event_date") === lit(maxDate) && col("event_id") % 97 === 0))))
        ()
      }),
      "change_feed" -> (dir => {
        // row-level CDC between the two newest commits of the stats fixture
        // (merge_pruned keeps committing one-partition merges into it): the
        // feed must track the CHANGED slice — one repointed partition read
        // twice + one keyed compare — never the table. Runs after the
        // fixture has at least one merge commit; a fresh fixture gets one.
        import graft.operators.ChangeFeed._
        import graft.operators.VersionedMerge._
        val (engine, table, _) = statsFixture(dir)
        if (engine.log(table.name).size < 3) {
          val maxDate = graft.Tables.events(spark, dir)
            .agg(max(to_date(col("ts")))).head().getDate(0)
          val source = graft.Tables.events(spark, dir)
            .withColumn("event_date", to_date(col("ts")))
            .filter(col("event_date") === lit(maxDate) && col("event_id") % 50 === 0)
            .withColumn("value", col("value") + lit(1.0))
          engine.mergeInto(table, source, Seq("event_id"), UserId("probe"), "feed seed")
        }
        val ids = engine.log(table.name).map(_.id)
        engine.readRowChangesBetween(table, Seq("event_id"), ids(1), ids(0))
          .groupBy(col("_change_type")).count().collect(); ()
      }),
      "scd2_build" -> (dir => {
        // events replicate with user offsets: per-user observation history
        // identical, xN keys — the ONE-exchange two-window build must track
        // the filtered slice linearly. Aggregate a window-derived column so
        // Catalyst cannot shortcut the build.
        val ev = graft.Tables.events(spark, dir)
        graft.operators.Scd2.buildScd2(
            ev.filter(col("event_type").isin("signup", "error")),
            Seq("user_id"), Seq("event_type"), "ts", tieBreak = Seq("event_id"))
          .agg(sum(col("is_current").cast("long"))).collect(); ()
      }),
      "scd2_lookup" -> (dir => {
        // the q_scd2_lookup shape: dimension build + as-of enrichment of the
        // purchase facts; the join is equi-keyed on user_id, so the probe
        // measures build + one hash/sort-merge pass over the fact slice
        val ev = graft.Tables.events(spark, dir)
        val dim = graft.operators.Scd2.buildScd2(
            ev.filter(col("event_type").isin("signup", "error")),
            Seq("user_id"), Seq("event_type"), "ts", tieBreak = Seq("event_id"))
          .withColumnRenamed("event_type", "status")
        val facts = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        graft.operators.Scd2.asOfLookup(facts, dim, Seq("user_id"), "ts")
          .agg(sum(col("status").isNotNull.cast("long"))).collect(); ()
      }),
      "scd2_advance" -> (dir => {
        // one incremental delivery folded from the empty state + the full
        // dimension rebuild off the state — the commit-driven twin's cost
        // for the same slice scd2_build measures
        val ev = graft.Tables.events(spark, dir)
          .filter(col("event_type").isin("signup", "error"))
        val st = graft.operators.Scd2.advanceScd2State(
          graft.operators.Scd2.emptyScd2State(ev, Seq("user_id"), Seq("event_type"), "ts"),
          ev, Seq("user_id"), Seq("event_type"), "ts", tieBreak = Seq("event_id"))
        graft.operators.Scd2.scd2FromState(st, Seq("user_id"), Seq("event_type"))
          .agg(sum(col("is_current").cast("long"))).collect(); ()
      }),
      "domain_cap" -> (dir => {
        // same 37 hot domains at both scales (pmod over offset ids), so the
        // groups grow x10 while the cap stays 10 — measures the split path:
        // count agg + join + WindowGroupLimit'd window over over-cap groups
        val d = docs(dir).withColumn("domain",
          concat(lit("d"), pmod(col("doc_id"), lit(37)).cast("string")))
        CorpusTools.capPerGroup(d, "domain", "doc_id", cap = 10).count(); ()
      }),
      "bm25_index_search" -> (dir => {
        // the index builds ONCE per dir (untimed, memoized) — the family
        // times the pruned SEARCH alone, the number that must stay flat-ish
        // while bm25_search (full corpus scan + explode) grows with the data
        val (engine, table) = bm25IndexFor(dir)
        val terms = if (dir == baseDir) Seq("hash", "join", "dup")
                    else Seq("hash_r0", "join_r0", "dup_r0")
        TextIndex.search(engine, table, terms, k = 50).count(); ()
      }),
      // --- multimodal: the "batched codec boundary" claim, measured. Each
      // arm synthesizes its media INSIDE the timed run (the per-row
      // encode is part of the boundary cost a real pipeline pays to stage
      // binary payloads) and then runs the real JDK decode + fingerprint.
      "image_ahash" -> (dir => {
        import spark.implicits._
        val media = docs(dir).select(col("doc_id")).as[Long].filter(_ % 3 == 0)
          .map(id => graft.operators.MediaRecord(
            id, "image", graft.operators.Multimodal.syntheticGradientBmp(id), "synthetic"))
        // bit_count before sum: raw 64-bit hashes overflow a long sum (ANSI)
        graft.operators.Multimodal.imageAHashes(media)
          .agg(sum(bit_count(col("ahash")))).collect(); ()
      }),
      "audio_signature" -> (dir => {
        import spark.implicits._
        val media = docs(dir).select(col("doc_id")).as[Long].filter(_ % 3 == 1)
          .map(id => graft.operators.MediaRecord(
            id, "audio", graft.operators.Multimodal.syntheticModulatedWav(id), "synthetic"))
        graft.operators.Multimodal.audioSignatures(media)
          .agg(sum(bit_count(col("asig")))).collect(); ()
      }),
      "video_frames" -> (dir => {
        // the video leg of the codec-boundary trio: encode the multi-frame
        // GIF, then the REAL ImageIO multi-frame decode over every frame
        import spark.implicits._
        val media = docs(dir).select(col("doc_id")).as[Long].filter(_ % 3 == 2)
          .map(id => graft.operators.MediaRecord(
            id, "video", graft.operators.Multimodal.syntheticAnimatedGif(id), "synthetic"))
        graft.operators.Multimodal.extractFeatures(media)
          .agg(sum(col("n_frames"))).collect(); ()
      }),
      "image_near_dup" -> (dir => {
        // NOT the gate's gradient images: those collide corpus-wide by
        // construction (6 hash classes), so their pair OUTPUT is quadratic
        // and any engine would measure quadratic. This arm's 8x8 pattern
        // images pin the near-dup CLASS SIZE at 4 (three single-bit
        // variants around each group pattern), so true pairs grow linearly
        // and the probe measures the chunk-join engine, not the answer size.
        import spark.implicits._
        val media = docs(dir).select(col("doc_id")).as[Long].filter(_ % 3 == 0)
          .map(id => graft.operators.MediaRecord(
            id, "image", patternBmp(id), "synthetic"))
        graft.operators.Multimodal.imageNearDupPairs(media).count(); ()
      }))

    val selected = args.lift(3) match {
      case Some(filter) =>
        val wanted = filter.split(",").map(_.trim).toSet
        val unknown = wanted -- families.map(_._1).toSet
        require(unknown.isEmpty, s"unknown probe families: ${unknown.mkString(", ")}")
        families.filter(f => wanted.contains(f._1))
      case None => families
    }

    // one untimed warm-up of the cheapest family absorbs codegen/session cost
    Dedup.exactDupGroups(docs(baseDir)).count()
    // pre-build the BM25 index fixtures OUTSIDE the timing loop — the
    // memoized build would otherwise land inside rep 1's timed run and the
    // printed rep-1 line would report build+search as a search time
    if (selected.exists(_._1 == "bm25_index_search")) {
      bm25IndexFor(baseDir); bm25IndexFor(xDir)
    }
    if (selected.exists(_._1 == "evolve_write")) {
      evolveFixture(baseDir); evolveFixture(xDir)
    }
    if (selected.exists(_._1 == "evolve_write_noschema")) {
      evolveNoSchemaFixture(baseDir); evolveNoSchemaFixture(xDir)
    }

    // interleaved reps (base, x, base, x ...) so ambient drift hits both
    // scales alike; min-of-2 per cell discards one-off stalls
    val times = scala.collection.mutable.Map.empty[(String, String), Double]
    val xLabel = s"x$replicas"
    for (rep <- 1 to 2; (name, run) <- selected; (scale, dir) <- Seq("base" -> baseDir, xLabel -> xDir)) {
      val t0 = System.nanoTime()
      run(dir)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE family=$name scale=$scale rep=$rep s=$s%.2f")
      val k = (name, scale)
      times(k) = math.min(times.getOrElse(k, Double.MaxValue), s)
    }

    println(f"${"SCALE_SLOPE family"}%-32s ${"base_s"}%8s ${xLabel + "_s"}%8s ${"slope"}%6s")
    selected.foreach { case (name, _) =>
      val b = times((name, "base")); val x = times((name, xLabel))
      println(f"SCALE_SLOPE $name%-20s $b%8.2f $x%8.2f ${x / b}%6.1f")
    }
    spark.stop()
  }

  /** 8x8 bit-pattern BMP whose aHash IS the pattern: pixel (x,y) is 200
    * when pattern bit `8y+x` is set, else 0. An 8x8 input makes every aHash
    * cell a single pixel, and the mean (200·p/64 for p set bits) sits
    * strictly between the two levels whenever 0 < p < 64 (probability
    * 1 - 2^-63 for the splitmix64 draw), so aHash(img) == pattern exactly.
    * Ids in a group of 4 (id >> 2) share a base pattern; variants 1..3 each
    * flip one distinct bit, so within-group Hamming ≤ 2 and cross-group
    * hashes are independent draws — near-dup classes of EXACTLY 4 at any
    * corpus size, which keeps the true pair count linear in rows. */
  private def patternBmp(id: Long): Array[Byte] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val base = mix(id >> 2)
    val v = (id & 3L).toInt
    val pattern = if (v == 0) base else base ^ (1L << ((v * 19) % 64))
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var i = 0
    while (i < 64) {
      val g = if ((pattern >>> i & 1L) == 1L) 200 else 0
      img.setRGB(i % 8, i / 8, (g << 16) | (g << 8) | g)
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", out)
    out.toByteArray
  }

  private def generateIfMissing(
      spark: SparkSession, baseDir: String, xDir: String, replicas: Int): Unit = {
    val marker = java.nio.file.Paths.get(xDir, "_GENERATED")
    if (java.nio.file.Files.exists(marker)) { println(s"SCALEPROBE reuse $xDir"); return }
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(xDir))
    val t0 = System.nanoTime()

    def replicate(table: String)(perReplica: (DataFrame, Int) => DataFrame): Unit = {
      val base = spark.read.parquet(s"$baseDir/$table.parquet")
      (0 until replicas).map(k => perReplica(base, k))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$xDir/$table.parquet")
    }

    val Off = 100000000L // beyond every base id range
    replicate("documents") { (df, k) =>
      // suffix every token with the replica id: within-replica dup structure
      // is EXACTLY sf0.1's; across replicas no token (hence no shingle, no
      // exact text) matches
      df.select(
        (col("doc_id") + lit(k * Off)).as("doc_id"),
        array_join(transform(split(col("text"), "\\s+"), w => concat(w, lit(s"_r$k"))), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    replicate("events") { (df, k) =>
      df.select((col("event_id") + lit(k * Off)).as("event_id"), col("ts"),
        (col("user_id") + lit(k * Off)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    replicate("lineitem") { (df, k) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(k * Off))
    }
    replicate("embeddings") { (df, k) =>
      df.withColumn("vec_id", col("vec_id") + lit(k * Off))
    }
    java.nio.file.Files.createFile(marker)
    println(f"SCALEPROBE generated $xDir (${replicas}x) in ${(System.nanoTime() - t0) / 1e9}%.1f s")
  }
}
