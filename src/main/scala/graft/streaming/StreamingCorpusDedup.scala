package graft.streaming

import graft.core._
import graft.operators.{Dedup, VersionedTables}
import graft.operators.VersionedTables._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/**
 * Incremental corpus deduplication for a DOCUMENT STREAM: every micro-batch
 * is near-dup-filtered against everything accepted so far, the survivors are
 * committed to a versioned docs table, and their MinHash band signatures are
 * appended to a versioned index table — so the dedup state itself is
 * versioned, time-travelable, and rebuildable, and no stage is ever
 * corpus-quadratic. This is the streaming face of the batch LSH pipeline
 * (`Dedup.minhashNearDupPairs` → `dupClusters` → `keepCanonical`).
 *
 * Scale shape per batch: candidate generation is an equi-join of the batch's
 * band rows against the persisted index on (band, band_hash) — O(batch ×
 * collisions), never O(corpus²); verification is the exact merge-walk
 * Jaccard on the colliding pairs only. Both tables are partitioned by
 * `batch`, so each commit appends one partition (no overwrite of history)
 * and incremental consumers (`readChangesAt`) see exactly the newly accepted
 * docs per commit.
 */
object StreamingCorpusDedup {

  /** Partition column both sink tables must use: one partition per
    * micro-batch = append semantics under `versionedInsertInto` (which
    * overwrites partitions PRESENT in its input). */
  val BatchCol = "batch"

  /**
   * MinHash band signature rows for a set of documents:
   * `(id, hs, band, band_hash)` — `hs` is the sorted 64-bit shingle-hash set
   * (carried for the exact verification stage), `(band, band_hash)` the LSH
   * bucket key. Same kernels, parameters and therefore the same collisions
   * as the batch `minhashNearDupPairs` path.
   */
  def bandedSignatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      bands: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3): DataFrame = {
    val hs = docs.select(col(idCol).as("id"),
      Dedup.shingleHashes(col(textCol), shingleSize).as("hs"))
      .localCheckpoint() // barrier: keep the fused shingle pass a single evaluation
    hs.select(col("id"), col("hs"),
      graft.functions.VectorExpressions.minHashes(col("hs"), bands * rowsPerBand).as("mh"))
      .select(col("id"), col("hs"), posexplode(
        array((0 until bands).map(Dedup.bandHash(col("mh"), _, rowsPerBand)): _*))
        .as(Seq("band", "band_hash")))
  }

  /**
   * The subset of `newDocs` that is novel: no near-dup (shingle Jaccard >=
   * `threshold`) in `index` (band-signature rows from [[bandedSignatures]]),
   * and deduped WITHIN the batch (min-id canonical survives). Pass an empty
   * or zero-column `index` on cold start.
   */
  def filterNovel(
      newDocs: DataFrame,
      index: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3): DataFrame = {
    val sigs = bandedSignatures(newDocs, idCol, textCol, bands, rowsPerBand, shingleSize)
      .localCheckpoint() // reused: candidate join + verification + in-batch LSH
    // Round 17: the cross-batch dup ids are mined ONCE into a checkpointed
    // (tiny — ids only) frame reused by BOTH anti-joins below. The former
    // shape embedded the mining subplan — including the corpus-sized index
    // scan — in `crossBatchNovel`, which the in-batch prep AND the final
    // result each re-evaluated: two full index scans per delivery. Also
    // gone: the eager `index.isEmpty` probe job (an empty index now just
    // mines zero candidates — same result, no pre-flight action).
    val dupIds: Option[DataFrame] =
      if (index.columns.isEmpty) None
      else {
        // candidates: bucket collisions between the batch and the corpus,
        // then exact merge-walk verification on the colliding pairs only.
        // The BATCH side broadcasts (explicitly — a micro-batch is small by
        // definition) and is slimmed to its bucket keys first, so the
        // broadcast payload carries no shingle arrays and the corpus-sized
        // index streams through the join without ever shuffling — per-batch
        // cost is O(index scan), not O(index shuffle), at corpus scale.
        val batchBuckets = sigs.select(col("id").as("new_id"), col("band"), col("band_hash"))
        val candidates = broadcast(batchBuckets)
          .join(index.as("c"),
            batchBuckets("band") === col("c.band") &&
              batchBuckets("band_hash") === col("c.band_hash"))
          .select(col("new_id"), col("c.hs").as("corpus_hs"))
          .distinct()
        // re-attach the batch's shingle sets (batch-sized, broadcast) for
        // the exact verification of the colliding pairs
        val newHs = sigs.select(col("id").as("new_id"), col("hs").as("new_hs")).distinct()
        Some(candidates
          .join(broadcast(newHs), "new_id")
          .filter(Dedup.sortedSetJaccard(col("new_hs"), col("corpus_hs")) >= threshold)
          .select(col("new_id"))
          .distinct()
          .localCheckpoint())
      }
    val crossBatchNovel = dupIds.fold(newDocs)(d =>
      newDocs.join(broadcast(d), newDocs(idCol) === col("new_id"), "left_anti"))
    // In-batch dedup from the CHECKPOINTED signatures: `sigs` already holds
    // the LSH bucket rows (band, band_hash) and the sorted shingle hashes,
    // so candidate pairs and their exact-Jaccard verification reuse it
    // directly — the former `minhashNearDupPairs(crossBatchNovel)` re-paid
    // the whole shingle+minhash pass over the novel docs per delivery. The
    // novel restriction keeps the pair set exactly what mining the novel
    // docs produced: bands/minhashes are deterministic functions of `hs`,
    // so the reused bucket rows equal a recomputation's.
    val novelSigs = dupIds.fold(sigs)(d =>
      sigs.join(broadcast(d), sigs("id") === d("new_id"), "left_anti"))
    val inBatchCandidates = novelSigs.as("a")
      .join(novelSigs.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    val novelHs = novelSigs.select(col("id"), col("hs")).dropDuplicates("id")
    val inBatchPairs = inBatchCandidates
      .join(novelHs.select(col("id").as("id1"), col("hs").as("sh1")), "id1")
      .join(novelHs.select(col("id").as("id2"), col("hs").as("sh2")), "id2")
      .withColumn("jaccard", Dedup.sortedSetJaccard(col("sh1"), col("sh2")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
    Dedup.keepCanonical(crossBatchNovel, inBatchPairs, idCol)
  }

  /**
   * Accept one delivery: dedup `batch` against the persisted index, commit
   * the novel documents into `docsTable` and their band signatures into
   * `indexTable` (one partition = `batchLabel` in each), and return the
   * accepted count. This is the WHOLE ingestion transaction a 100 TB lake
   * runs per delivery — one index scan, two versioned commits, no corpus
   * rescan — shared verbatim by the streaming sink ([[writeDeduped]]) and
   * batch callers (a nightly crawl drop is just `acceptBatch(..., "2024-06-01")`).
   *
   * Concurrency: the index commit is a CAS on the index head this call
   * FILTERED against — if another delivery indexed concurrently, the batch
   * was deduped against a stale index and might accept its near-dups, so
   * the call raises [[graft.core.CommitConflictError]] instead of silently
   * committing. The head is re-checked immediately BEFORE the docs commit
   * (after the expensive filter), so a conflicting delivery detected there
   * fails the call with docsTable untouched; only a conflict landing in the
   * narrow docs-commit-to-CAS window leaves the `batchLabel` docs partition
   * committed under a stale filter — possibly under-deduped UNTIL the call
   * is re-run. Re-running the same call IS the retry (idempotent per
   * `batchLabel`: the docs partition is overwritten with the re-filtered
   * survivors); a caller that abandons the retry keeps that partition in
   * the possibly-under-deduped state until re-run or [[rebuildIndex]].
   * Commit order is docs-then-signatures deliberately: a crash
   * between them leaves accepted-but-unindexed docs — a RECALL loss
   * (later near-dups may slip through) that [[rebuildIndex]] repairs —
   * never ghost signatures that would silently reject future novel docs.
   */
  def acceptBatch(
      batch: DataFrame,
      engine: VersionedTables,
      docsTable: TableDefinition,
      indexTable: TableDefinition,
      batchLabel: String,
      userId: UserId,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3): Long = {
    require(docsTable.partitionSchema == PartitionSchema(BatchCol),
      s"docsTable must be partitioned by '$BatchCol', got ${docsTable.partitionSchema}")
    require(indexTable.partitionSchema == PartitionSchema(BatchCol),
      s"indexTable must be partitioned by '$BatchCol', got ${indexTable.partitionSchema}")
    if (batch.isEmpty) return 0L
    // O(1) ref read (head file / indexed SELECT), not a history
    // materialization — and the REF is the right CAS anchor: commitIf
    // compares against it, so this stays correct even if the index table
    // was checked out to a historical commit
    val indexHead = engine.headCommit(indexTable.name)
    val index = engine.read(indexTable)
    val novel = filterNovel(batch, index, idCol, textCol, threshold, bands, rowsPerBand, shingleSize)
      .localCheckpoint() // evaluated thrice (count + docs write + signature build)
    val accepted = novel.count()
    if (accepted > 0) {
      // conflict check BEFORE the docs commit: the filter above ran against
      // `indexHead`; if another delivery moved the index meanwhile, fail now
      // — docsTable untouched — rather than committing stale-filtered docs
      // and only then failing the CAS (that residual window still exists
      // between here and the CAS, but it is commit-sized, not filter-sized)
      val headNow = engine.headCommit(indexTable.name)
      if (headNow != indexHead)
        throw graft.core.CommitConflictError(indexTable.name, indexHead, headNow)
      novel.withColumn(BatchCol, lit(batchLabel))
        .versionedInsertInto(engine, docsTable, userId, s"accept batch $batchLabel")
      bandedSignatures(novel, idCol, textCol, bands, rowsPerBand, shingleSize)
        .withColumn(BatchCol, lit(batchLabel))
        .versionedInsertIntoIf(engine, indexTable, userId, s"index batch $batchLabel", indexHead)
    }
    accepted
  }

  /**
   * Rebuild the band-signature index FROM the accepted corpus — the
   * recovery primitive for the documented crash window (docs committed,
   * signatures not) and for parameter migrations: recompute every accepted
   * document's signatures and atomically replace the index's whole visible
   * content in one commit (the stale index stays time-travelable). The
   * index is always derivable from the docs table, which is why
   * accepted-but-unindexed is the safe failure direction.
   */
  def rebuildIndex(
      engine: VersionedTables,
      docsTable: TableDefinition,
      indexTable: TableDefinition,
      userId: UserId,
      idCol: String = "doc_id",
      textCol: String = "text",
      bands: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3): Long = {
    val docs = engine.read(docsTable)
    val sigs = bandedSignatures(
        docs.select(col(idCol), col(textCol), col(BatchCol)), idCol, textCol,
        bands, rowsPerBand, shingleSize)
      .join(docs.select(col(idCol).as("id"), col(BatchCol)), "id")
      .localCheckpoint() // count + write
    sigs.versionedReplaceAll(engine, indexTable, userId, "rebuild index from corpus")
    sigs.count()
  }

  /**
   * Streaming sink: per micro-batch, accept the novel documents into
   * `docsTable` and their band signatures into `indexTable` (both
   * partitioned by [[BatchCol]]; one commit each per non-empty batch). The
   * accepted corpus and its dedup index version together — time-travel the
   * docs table and the matching index state is the same commit index away.
   */
  def writeDeduped(
      stream: DataFrame,
      engine: VersionedTables,
      docsTable: TableDefinition,
      indexTable: TableDefinition,
      userId: UserId,
      checkpointDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(docsTable.partitionSchema == PartitionSchema(BatchCol),
      s"docsTable must be partitioned by '$BatchCol', got ${docsTable.partitionSchema}")
    require(indexTable.partitionSchema == PartitionSchema(BatchCol),
      s"indexTable must be partitioned by '$BatchCol', got ${indexTable.partitionSchema}")
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try acceptBatch(batch, engine, docsTable, indexTable, batchId.toString, userId,
          idCol, textCol, threshold, bands, rowsPerBand, shingleSize)
        finally { batch.unpersist(); () }
        ()
      }
      .start()
  }
}
