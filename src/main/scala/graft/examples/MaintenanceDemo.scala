package graft.examples

import graft.core._
import graft.operators.{VectorIndex, VersionedTables}
import graft.operators.VersionedTables._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * End-to-end drive of the round-2 data-management surface on a scratch
 * events table: fragmented load → compaction (with clustering) → incremental
 * CDC read → replace-all refresh → retention report → commit stream (batch
 * drain) → versioned IVF index build/query. Prints one labeled line per
 * checkpoint so the output is greppable (same convention as VersioningDemo).
 */
object MaintenanceDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-maintenance-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.prepare(spark)

    val root = java.nio.file.Files.createTempDirectory("graft-maint-")
    val storeRoot = root.resolve("store").toUri
    val engine = VersionedTables.withFileStore(spark, storeRoot)
    val table = TableDefinition(TableName("demo", "events"), root.resolve("events").toUri,
      PartitionSchema("event_date"), FileFormat.Parquet,
      // stats-declared: every write below also records its data-skipping
      // manifest, which is what the LAYOUT_* report lines read — small-file
      // discovery without listing a single data file
      stats = Some(ColumnStatsConfig(List("event_id"))))
    engine.initTable(table, UserId("demo"), "init")

    // 1. fragmented load (4 input tasks x days = many small files)
    val events = graft.Tables.events(spark, sfDir)
      .withColumn("event_date", to_date(col("ts"))).localCheckpoint()
    events.repartition(4).versionedInsertInto(engine, table, UserId("demo"), "fragmented load")
    val t1 = engine.log(table.name).head.id
    println(s"LOADED=${engine.read(table).count()}")
    val layout = graft.operators.TableStats.layoutReport(engine, table)
    println(s"LAYOUT_PARTS=${layout.size} LAYOUT_FRAGMENTED=${layout.count(_.files > 1)}")

    // metadata-only aggregation off the same manifests: COUNT/MIN/MAX with
    // zero data files opened (cross-checked against the real scan)
    locally {
      val s = graft.operators.MetadataQuery.summarize(engine, table, Seq("event_id")).head()
      val ref = engine.read(table)
        .agg(count(lit(1)), min(col("event_id")), max(col("event_id"))).head()
      println(s"SUMMARY_ROWS=${s.getLong(0)} SUMMARY_ID_MAX=${s.getLong(2)} " +
        s"SUMMARY_MATCHES_SCAN=${
          s.getLong(0) == ref.getLong(0) && s.getLong(1) == ref.getLong(1) &&
          s.getLong(2) == ref.getLong(2)}")
    }

    // 2. compact everything to one clustered file per partition
    engine.compact(table, UserId("demo"), "compact+cluster", clusterBy = Seq("user_id"))
    val t2 = engine.log(table.name).head.id
    println(s"COMPACTED_ROWS=${engine.read(table).count()}")
    println(s"POST_PACK_MAX_FILES=${
      graft.operators.TableStats.layoutReport(engine, table).map(_.files).max}")

    // 3. incremental read: what changed t1 -> t2 (everything — full rewrite)
    println(s"CDC_T1_T2=${engine.readChangesBetween(table, t1, t2).count()}")
    println(s"CDC_OPS=${engine.changesBetween(table.name, t1, t2).operations.size}")

    // 3b. incrementally maintained rollup: events-per-day table refreshed
    // from the t1->t2 range only (compaction repoints every partition, so
    // every day recomputes here; a single-day load would recompute one)
    val rollup = TableDefinition(TableName("demo", "events_by_day"),
      root.resolve("events_by_day").toUri, PartitionSchema("event_date"), FileFormat.Parquet)
    engine.initTable(rollup, UserId("demo"), "init rollup")
    val (rolledUp, rolledOff) = graft.operators.IncrementalRollup.refresh(
      engine, table, rollup, t1, t2,
      df => df.groupBy("event_date").agg(count(lit(1)).as("n_events")), UserId("demo"))
    println(s"ROLLUP_RECOMPUTED=$rolledUp ROLLUP_REMOVED=$rolledOff " +
      s"ROLLUP_DAYS=${engine.read(rollup).count()}")

    // 4. replace-all refresh down to the latest day only
    val day = events.select(max("event_date")).head().getDate(0)
    events.where(col("event_date") === lit(day))
      .versionedReplaceAll(engine, table, UserId("demo"), "keep latest day only")
    println(s"AFTER_REPLACE_PARTS=${engine.tracker.currentVersion(table.name) match {
      case PartitionedTableVersion(p) => p.size
      case _ => -1
    }}")

    // 4b. tags + CAS: pin the pre-vacuum state as an immutable named ref
    // (vacuum below must never reclaim it), and probe the optimistic-
    // concurrency commit path — a stale-head CAS write must fail loudly
    val pinHead = engine.tracker.tableState(table.name).currentVersion
    engine.tracker.createTag(table.name, "demo-pin", pinHead)
    println(s"TAGS=${engine.tracker.tags(table.name).map(_._1).mkString(",")}")
    val casConflict =
      try {
        events.limit(5).versionedInsertIntoIf(engine, table, UserId("demo"), "stale cas",
          engine.log(table.name).last.id) // the INIT commit — definitely stale
        "none"
      } catch { case _: CommitConflictError => "conflict" }
    println(s"CAS_STALE=$casConflict")

    // 5. retention: versions invisible in the last 1 commit, then reclaim
    // them physically (dry-run plan first, real delete after)
    println(s"EXPIRABLE=${engine.expirableVersions(table, keepLast = 1).size}")
    println(s"ORPHANED=${engine.orphanedVersions(table).size}")
    val vacPlan = engine.vacuum(table, keepLast = 1) // dryRun default
    val vacRun = engine.vacuum(table, keepLast = 1, dryRun = false)
    println(s"VACUUM_PLANNED=${vacPlan.targets.size} VACUUM_DELETED=${vacRun.deleted.size} VACUUM_FAILED=${vacRun.failed.size}")
    // current read still intact after the vacuum, and the tagged state
    // reads back (tags pin their versions out of the expirable set)
    println(s"POST_VACUUM_ROWS=${engine.read(table).count()}")
    println(s"TAGGED_READ_ROWS=${engine.readAtTag(table, "demo-pin").count()}")

    // 6. the commit log as a (batch-drained) stream
    import org.apache.spark.sql.streaming.Trigger
    val q = graft.streaming.CommitStream.commits(spark, storeRoot, table.name)
      .writeStream.format("memory").queryName("maint_commits")
      .trigger(Trigger.AvailableNow()).outputMode("append").start()
    q.processAllAvailable(); q.stop()
    println(s"STREAMED_COMMITS=${spark.table("maint_commits").count()}")

    // 7. versioned IVF index over the embeddings table
    val emb = graft.Tables.embeddings(spark, sfDir)
    val ivf = TableDefinition(TableName("demo", "ivf"), root.resolve("ivf").toUri,
      VectorIndex.indexSchema, FileFormat.Parquet)
    engine.initTable(ivf, UserId("demo"), "init index")
    VectorIndex.buildIvf(engine, ivf, emb, nlist = 8, userId = UserId("demo"))
    val hits = VectorIndex.queryIvf(engine, ivf, emb.filter(col("vec_id") < 4), k = 3)
    println(s"IVF_HITS=${hits.count()}")

    // 8. index-backed corpus ingestion: two deliveries through acceptBatch —
    // the second dedups against the PERSISTED index, not delivery 1's text
    val docs = graft.Tables.documents(spark, sfDir)
    val corpusTable = TableDefinition(TableName("demo", "corpus"),
      root.resolve("corpus").toUri,
      PartitionSchema(graft.streaming.StreamingCorpusDedup.BatchCol), FileFormat.Parquet)
    val bandIndex = TableDefinition(TableName("demo", "corpus_index"),
      root.resolve("corpus_index").toUri,
      PartitionSchema(graft.streaming.StreamingCorpusDedup.BatchCol), FileFormat.Parquet)
    engine.initTable(corpusTable, UserId("demo"), "init corpus")
    engine.initTable(bandIndex, UserId("demo"), "init corpus index")
    val acc1 = graft.streaming.StreamingCorpusDedup.acceptBatch(
      docs.filter(col("doc_id") < 250), engine, corpusTable, bandIndex, "d1", UserId("demo"))
    // delivery 2 overlaps delivery 1 (ids 200-299): the overlap's near-dups
    // are rejected via the index
    val acc2 = graft.streaming.StreamingCorpusDedup.acceptBatch(
      docs.filter(col("doc_id") >= 200), engine, corpusTable, bandIndex, "d2", UserId("demo"))
    println(s"INGEST_D1=$acc1 INGEST_D2=$acc2 CORPUS_ROWS=${engine.read(corpusTable).count()}")

    // 9. write-back interop, streamed: export THIS store's tables as a
    // reference-layout (chronicles) store — the export walks each history in
    // keyset pages (small pageSize here to force multi-page walks), and the
    // exported store reads back in place
    val exportDest = root.resolve("exported").toUri
    val exported = graft.sources.ChroniclesExport.exportAllTables(
      engine.tracker, exportDest, pageSize = 2)
    val backReader = new graft.sources.FileBackedVersionTracker(exportDest)
    println(s"EXPORTED_TABLES=${exported.size} " +
      s"EXPORT_READBACK_COMMITS=${backReader.tableState(table.name).updates.size}")

    // 10. DSIR end-to-end: estimate weights against the English slice, then
    // Gumbel-top-k select 20 docs without replacement (deterministic)
    val w = graft.operators.CorpusTools.importanceWeightTable(
      docs, "text", col("lang") === "en", vocabCap = 1000)
    val sampled = graft.operators.CorpusTools.dsirSample(
      docs, "doc_id", "text", w, n = 20, seed = 42)
    val again = graft.operators.CorpusTools.dsirSample(
      docs, "doc_id", "text", w, n = 20, seed = 42)
    println(s"DSIR_SAMPLED=${sampled.count()} " +
      s"DSIR_DETERMINISTIC=${sampled.collect().toList == again.collect().toList}")

    // 11. versioned BM25 postings index: base build + incremental batch,
    // index search vs corpus-scan parity, time travel to the pre-batch state
    val tiTable = graft.core.TableDefinition(
      graft.core.TableName("maint", "bm25_index"),
      root.resolve("bm25_index").toUri,
      graft.operators.TextIndex.indexSchema, graft.core.FileFormat.Parquet)
    engine.initTable(tiTable, UserId("demo"), "init bm25 index")
    graft.operators.TextIndex.buildIndex(engine, tiTable,
      docs.filter(col("doc_id") < 250), buckets = 8, userId = UserId("demo"))
    val preBatch = engine.log(tiTable.name).head.id
    graft.operators.TextIndex.addBatch(engine, tiTable,
      docs.filter(col("doc_id") >= 250), batchLabel = "b1", userId = UserId("demo"))
    val terms = Seq("hash", "join", "dup")
    val viaIndex = graft.operators.TextIndex.search(engine, tiTable, terms, k = 10)
      .collect().toList
    val viaScan = graft.operators.TextSearch.bm25TopK(
      docs, "doc_id", "text", terms, k = 10).collect().toList
    val oldHits = graft.operators.TextIndex.search(
      engine, tiTable, terms, k = 10, at = Some(preBatch)).count()
    println(s"BM25_INDEX_TOPK=${viaIndex.size} BM25_INDEX_PARITY=${viaIndex == viaScan} " +
      s"BM25_TIMETRAVEL_HITS=$oldHits")

    // 12. hybrid retrieval + model-based curation one-liners
    val lex = graft.operators.TextSearch.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("score_micro").desc, col("doc_id"))))
      .select(col("doc_id"), col("rank"))
    val fused = graft.operators.TextSearch.rrfFuse(lex, lex, "doc_id", k = 5)
    val lmModel = graft.operators.QualityModels.lmCostTable(docs, "text", col("lang") === "en")
    val lmScored = graft.operators.QualityModels.lmPerplexity(docs, "doc_id", "text", lmModel)
    val (lo, hi) = graft.operators.QualityModels.tertileThresholds(lmScored, "doc_id")
    val buckets = graft.operators.QualityModels.lmBuckets(lmScored, lo, hi)
      .groupBy(col("bucket")).count().collect()
      .map(r => s"${r.getString(0)}:${r.getLong(1)}").sorted.mkString(",")
    val nb = graft.operators.QualityModels.nbTrain(docs, "lang", "text")
    val acc = graft.operators.QualityModels.nbClassify(docs, "doc_id", "text", nb)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .agg(org.apache.spark.sql.functions.avg(
        (col("predicted") === col("lang")).cast("double"))).collect()(0).getDouble(0)
    println(f"HYBRID_FUSED=${fused.count()} LM_BUCKETS=$buckets NB_SELF_ACC=$acc%.2f")

    // write-audit-publish: a clean delivery publishes, a dirty one is
    // refused whole — readers never see data that failed its audit
    import spark.implicits._
    val wapTable = TableDefinition(TableName("demo", "wap_docs"),
      root.resolve("wap_docs").toUri, PartitionSchema("batch"), FileFormat.Parquet)
    engine.initTable(wapTable, UserId("demo"), "init")
    val checks = Seq(
      graft.operators.Expectations.NotNull(Seq("text")),
      graft.operators.Expectations.Unique(Seq("doc_id")))
    Seq((1L, "alpha", "b0"), (2L, "beta", "b0")).toDF("doc_id", "text", "batch")
      .auditedInsertInto(engine, wapTable, UserId("demo"), "clean", checks)
    val refused =
      try {
        Seq((3L, "gamma", "b1"), (3L, null, "b1")).toDF("doc_id", "text", "batch")
          .auditedInsertInto(engine, wapTable, UserId("demo"), "dirty", checks)
        false
      } catch { case _: graft.operators.Expectations.ExpectationsFailedError => true }
    println(s"WAP_CLEAN_ROWS=${engine.read(wapTable).count()} " +
      s"WAP_DIRTY_REFUSED=$refused " +
      s"WAP_DEBRIS=${engine.orphanedVersions(wapTable).size}")

    // streaming write-audit-publish: same checks per MICRO-BATCH through
    // the versioned streaming sink — the dirty batch is refused invisibly
    // (orphan debris), the clean ones publish, the query keeps running
    val swapTable = TableDefinition(TableName("demo", "wap_stream"),
      root.resolve("wap_stream").toUri, PartitionSchema("batch"), FileFormat.Parquet)
    engine.initTable(swapTable, UserId("demo"), "init")
    val swapSource = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)](spark)
    val refusedBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val swapQ = graft.streaming.EventStreams.writeVersionedAudited(
      swapSource.toDF().toDF("doc_id", "text", "batch"),
      engine, swapTable, UserId("demo"),
      root.resolve("wap_stream_chk").toString, checks,
      onRefused = (_, _) => { refusedBatches.incrementAndGet(); () },
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    swapSource.addData((10L, "clean-a", "s0"), (11L, "clean-b", "s0"))
    swapQ.processAllAvailable()
    swapSource.addData((12L, null, "s1")) // fails not_null(text)
    swapQ.processAllAvailable()
    swapSource.addData((13L, "clean-c", "s2"))
    swapQ.processAllAvailable()
    swapQ.stop()
    println(s"STREAM_WAP_ROWS=${engine.read(swapTable).count()} " +
      s"STREAM_WAP_REFUSED=${refusedBatches.get()} " +
      s"STREAM_WAP_DEBRIS=${engine.orphanedVersions(swapTable).size}")

    // keyed MERGE INTO: update a1, insert a5, delete a2; only the touched
    // partition is rewritten, and the pre-merge commit stays time-travelable
    locally {
      import graft.operators.VersionedMerge._
      val mTable = TableDefinition(TableName("demo", "merge_accounts"),
        root.resolve("merge_accounts").toUri, PartitionSchema("region"), FileFormat.Parquet)
      engine.initTable(mTable, UserId("demo"), "init")
      Seq(("a1", "eu", 10L), ("a2", "eu", 20L), ("a3", "us", 30L))
        .toDF("id", "region", "balance")
        .versionedInsertInto(engine, mTable, UserId("demo"), "base")
      val src = Seq(("a1", "eu", 11L), ("a5", "eu", 50L), ("a2", "eu", -1L))
        .toDF("id", "region", "balance")
      val res = engine.mergeInto(mTable, src, Seq("id"), UserId("demo"), "merge",
        deleteWhen = Some(col("balance") < 0))
      val log = engine.log(mTable.name)
      println(s"MERGE_ROWS=${engine.read(mTable).count()} " +
        s"MERGE_REWRITTEN=${res.rewritten.map(_.toPath).mkString(",")} " +
        s"MERGE_PREMERGE_ROWS=${engine.readAt(mTable, log(1).id).count()}")
    }

    spark.stop()
  }
}
