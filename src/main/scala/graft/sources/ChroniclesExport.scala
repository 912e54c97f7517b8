package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.net.URI
import java.nio.charset.StandardCharsets
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneId}

/**
 * Write-back interop: export a graft table's commit history as a store in the
 * reference implementation's file layout, so the reference (or any tool built
 * against it) can read what graft wrote. The inverse of
 * [[FileBackedVersionTracker.migrateChroniclesTables]], and tracker-agnostic —
 * it reads through the [[VersionTracker]] interface, so a JDBC-backed history
 * exports the same way as a file-backed one.
 *
 * Layout and wire format follow the reference exactly
 * (`files/src/main/scala/dev/chronicles/files/versiontracker/FileBackedVersionTracker.scala:157-175`,
 * `JsonCodecs.scala:38-117`):
 *
 *   - directory `_chronicles_table_<schema>.<table>/`
 *   - `table-metadata`: `{"is_snapshot": <bool>}`
 *   - `head_ref`: `{"head_ref": "<commit id>"}`
 *   - one `table_update_yyyy-MM-dd'T'HH-mm-ss.SSS` file per commit
 *     (snake_case commit document; UTC-millis filename), with file names AND
 *     mtimes strictly ascending in commit order — the reference reconstructs
 *     history by sorting on (mtime, name)
 *     (`FileBackedVersionTracker.scala:90-99`).
 *
 * The chronicles format stores partition values RAW (no path escaping), so a
 * partition whose values would not survive its `Partition.parse` round-trip
 * (values containing `/` or `=`, or empty) cannot be represented; export
 * refuses loudly rather than writing a store the reference would misread.
 */
object ChroniclesExport {

  private val mapper = new ObjectMapper()

  private val FilenameFormat =
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH-mm-ss.SSS").withZone(ZoneId.of("UTC"))

  /** Commits held in memory at once during an export: history is walked in
    * [[VersionTracker.commitsPageAsc]] pages of this size, so exporting a
    * 100k-commit streaming-sink table peaks at O(page) commits, never the
    * full log (the eager analogue of the reference's fs2-streamed history,
    * reference VersionTracker.scala:137-151). */
  val ExportPageSize = 1024

  /** Export every table of the tracker; returns the exported names.
    *
    * All-or-nothing FOR THE HISTORY PRESENT WHEN THE EXPORT BEGAN: every
    * table is validated (partition representability AND destination-dir
    * absence) BEFORE the first byte is written, so a failure on the Nth
    * table's pre-existing history cannot leave a partial destination store —
    * the per-table checks inside [[exportTable]] would otherwise only fire
    * after earlier tables had already landed. The one residual: a commit
    * LANDING mid-export with an unrepresentable partition postdates the
    * validation pass and fails at its own write, truncating that table's
    * export there (quiesce writers for a clean snapshot — an export is a
    * snapshot copy by contract). Both passes walk the history in
    * [[ExportPageSize]] keyset pages (two paged scans — the price of never
    * materializing the log). */
  def exportAllTables(
      tracker: VersionTracker,
      destRoot: URI,
      conf: Configuration = new Configuration(),
      pageSize: Int = ExportPageSize): List[TableName] = {
    val tables = tracker.tables()
    val fs = FileSystem.get(destRoot, conf)
    tables.foreach { table =>
      tracker.forEachCommitAsc(table, pageSize)(requireRepresentable(table, _))
      val dir = new Path(new Path(destRoot), "_chronicles_table_" + table.fullyQualifiedName)
      if (fs.exists(dir))
        throw new IllegalStateException(
          s"Export destination $dir already exists; refusing to mix exported histories " +
            "(no table was exported)")
    }
    tables.foreach(writeTable(tracker, _, destRoot, conf, pageSize))
    tables
  }

  /**
   * Export one table's full history + head pointer. Refuses if the
   * destination table directory already exists (an export is a snapshot copy,
   * not an incremental sync) or if any partition value is unrepresentable in
   * the reference's raw partition encoding (checked in a paged pre-pass so a
   * late bad partition cannot leave a half-written table behind).
   */
  def exportTable(
      tracker: VersionTracker,
      table: TableName,
      destRoot: URI,
      conf: Configuration = new Configuration(),
      pageSize: Int = ExportPageSize): Unit = {
    // currentRef doubles as the UnknownTableError probe for unknown tables
    tracker.currentRef(table)
    tracker.forEachCommitAsc(table, pageSize)(requireRepresentable(table, _))
    writeTable(tracker, table, destRoot, conf, pageSize)
  }

  /**
   * INCREMENTAL write-back (replication): bring a previously exported
   * chronicles store up to date with the source tracker by appending only
   * the commits it is missing and moving its `head_ref` — O(delta) writes
   * where a fresh [[exportTable]] of a 100k-commit log would be O(n) per
   * sync. Correct because the chronicles layout is append-only: newer
   * commits are just newer `table_update_` files, and the reference's
   * (mtime, name) ordering puts appended files after existing ones (new
   * names/mtimes continue strictly ascending from the destination's newest
   * file). An absent destination table degrades to a fresh export.
   *
   * The sync point is recovered from the destination alone: its newest
   * commit file (ONE document parsed) names the last replicated commit id;
   * the source is then walked in ascending keyset pages, skipping up to
   * that id. A destination head commit that does not exist in the source
   * history means the stores diverged (or the destination was written from
   * a different table) — refused loudly, nothing written. The skip phase
   * also COUNTS the source prefix and compares it with the replica's
   * commit-file count: a mismatch means the replica is not a faithful
   * prefix of the source — e.g. a clock-skewed cross-process commit landed
   * BELOW the sync point since the last sync (the skew caveat on
   * [[VersionTracker.commitsPageAsc]]), or replica files were added or
   * removed by hand — and appending would silently diverge, so it is
   * refused with a pointer at re-export. Source-side parses remain O(n)
   * per sync (the skip-scan); WRITES — the expensive half — are O(delta),
   * and memory stays O(page). The O(n) skip-scan is deliberate, not an
   * oversight: persisting a page cursor in the replica would make reads
   * O(delta) but forfeits exactly this prefix-faithfulness check (and a
   * cursor is only meaningful to the store that issued it) — at the
   * measured 0.4s/5k commits (HistoryScaleProbe) the scan costs ~8s per
   * sync of a 100k-commit log, a fair price for a checked replica.
   *
   * CONCURRENT syncs of the SAME destination are the caller's orchestration
   * concern (run one replicator per store): two racing syncs would each
   * append the same delta under different file names, duplicating history
   * in the replica. Same stance as the reference's cross-process writer
   * discipline — its layout has no locking primitive to build on.
   *
   * @return the number of commits appended (full history size on a fresh
   *         export)
   */
  def syncTable(
      tracker: VersionTracker,
      table: TableName,
      destRoot: URI,
      conf: Configuration = new Configuration(),
      pageSize: Int = ExportPageSize): Long = {
    val fs = FileSystem.get(destRoot, conf)
    val dir = new Path(new Path(destRoot), "_chronicles_table_" + table.fullyQualifiedName)
    tracker.currentRef(table) // UnknownTableError probe
    if (!fs.exists(dir)) {
      // validate pass first (all-or-nothing for the pre-existing history,
      // like exportTable), then the write walk's own count is returned —
      // counting the validation walk instead would misreport when a commit
      // lands between the two walks
      tracker.forEachCommitAsc(table, pageSize)(requireRepresentable(table, _))
      return writeTable(tracker, table, destRoot, conf, pageSize)
    }
    val destCommitFiles = fs.listStatus(dir).toList
      .filter(_.getPath.getName.startsWith("table_update_"))
      .sortBy(s => (s.getModificationTime, s.getPath.getName))
    val newest = destCommitFiles.lastOption
      .getOrElse(throw new IllegalStateException(
        s"Sync destination $dir exists but holds no commit files; " +
          "delete it for a fresh export"))
    val lastSynced = {
      val n = mapper.readTree(read(fs, newest.getPath))
      if (n == null || n.get("commit_id") == null)
        throw new IllegalStateException(s"Corrupt exported commit file ${newest.getPath}")
      n.get("commit_id").asText
    }

    // head BEFORE the walk, same discipline as writeTable. ONE skip-scan
    // pass: nothing is written until the sync point is found, so the
    // divergence check (lastSynced must exist in the source history) falls
    // out of the same walk for free — no separate validation pass, because
    // unlike the snapshot export, a sync is RESUMABLE by contract: a bad
    // commit mid-delta truncates the sync at its own position and a re-run
    // resumes (and re-fails) right there, never corrupting the replica.
    val head = tracker.currentRef(table)
    var appended = 0L
    var prefixCount = 0L // source commits up to and INCLUDING the sync point
    var lastMillis = newest.getModificationTime // names/mtimes continue ascending
    var writing = false
    tracker.forEachCommitAsc(table, pageSize) { update =>
      if (writing) {
        requireRepresentable(table, update)
        val millis = math.max(update.metadata.timestamp.toEpochMilli, lastMillis + 1)
        lastMillis = millis
        val name = "table_update_" + FilenameFormat.format(Instant.ofEpochMilli(millis))
        // temp + rename, unlike the fresh export's direct writes: a sync
        // appends to a LIVE replica, and a reader's listing must never
        // catch a half-written commit document
        writeAtomicWithMtime(fs, new Path(dir, name), chroniclesUpdateJson(update), millis)
        appended += 1
      } else {
        prefixCount += 1
        if (update.metadata.id.id == lastSynced) {
          // the prefix check fires AT the transition, before the first delta
          // write — a mismatching replica is refused with nothing appended
          if (prefixCount != destCommitFiles.size)
            throw new IllegalStateException(
              s"Sync destination $dir holds ${destCommitFiles.size} commit files but the " +
                s"source history up to its head commit '$lastSynced' has $prefixCount " +
                "commits — the replica is not a faithful prefix of the source (a " +
                "clock-skewed commit landed below the sync point, or replica files were " +
                "added/removed); nothing was appended — re-export for a faithful replica")
          writing = true
        }
      }
    }
    if (!writing)
      throw new IllegalStateException(
        s"Sync destination $dir head commit '$lastSynced' is not in the source history of " +
          s"$table — the stores have diverged (or the destination was exported from a " +
          "different table); nothing was appended")
    // head_ref is replaced ATOMICALLY (temp + rename), and only when it
    // actually moved: a +0 catch-up leaves the replica byte-untouched. An
    // ABSENT head_ref is repaired, not crashed on: export/sync write it
    // last, so a crashed run leaves commit files with no head — this sync
    // appends the remaining delta and creates the head, converging the
    // replica instead of wedging it permanently head-less.
    val headPath = new Path(dir, "head_ref")
    val headJson = mapper.createObjectNode().put("head_ref", head.id).toPrettyString
    val existing =
      try Some(read(fs, headPath))
      catch { case _: java.io.FileNotFoundException => None }
    if (!existing.contains(headJson)) writeReplaceAtomic(fs, headPath, headJson)
    appended
  }

  /** [[syncTable]] for every table of the tracker; returns (table, commits
    * appended) pairs. Unlike [[exportAllTables]] there is no all-or-nothing
    * pre-pass across tables: a sync is an idempotent catch-up (re-running it
    * resumes where the failure left off), not a snapshot copy. */
  def syncAllTables(
      tracker: VersionTracker,
      destRoot: URI,
      conf: Configuration = new Configuration(),
      pageSize: Int = ExportPageSize): List[(TableName, Long)] =
    tracker.tables().map(t => t -> syncTable(tracker, t, destRoot, conf, pageSize))

  /** Write the full history + head into a FRESH directory; returns the
    * number of commits written (counted in the same walk that writes, so
    * the figure is exact even if a commit lands mid-export). */
  private def writeTable(
      tracker: VersionTracker,
      table: TableName,
      destRoot: URI,
      conf: Configuration,
      pageSize: Int): Long = {
    val fs = FileSystem.get(destRoot, conf)
    val dir = new Path(new Path(destRoot), "_chronicles_table_" + table.fullyQualifiedName)
    if (fs.exists(dir))
      throw new IllegalStateException(
        s"Export destination $dir already exists; refusing to mix exported histories")
    fs.mkdirs(dir)

    write(fs, new Path(dir, "table-metadata"),
      mapper.createObjectNode().put("is_snapshot", tracker.isSnapshotTable(table)).toPrettyString)

    // head BEFORE history: ascending pages yield every commit present at
    // iteration start, so a head snapshotted first always has its commit in
    // the exported set — the reverse order could export a head_ref pointing
    // at a commit no page ever saw
    val head = tracker.currentRef(table)

    // filenames derive from each commit's own timestamp, bumped by 1 ms on
    // collision so names stay unique and strictly ascending in commit order;
    // mtime is set to the same instant so the reference's (mtime, name) sort
    // reconstructs exactly this order
    var lastMillis = Long.MinValue
    var written = 0L
    tracker.forEachCommitAsc(table, pageSize) { update =>
      // re-checked per commit: a commit landing AFTER the validation pass
      // must not be written unrepresentably (it can at worst truncate the
      // export at its own position — the pre-pass guarantee covers the
      // history that existed when the export began)
      requireRepresentable(table, update)
      val millis = math.max(update.metadata.timestamp.toEpochMilli, lastMillis + 1)
      lastMillis = millis
      val name = "table_update_" + FilenameFormat.format(Instant.ofEpochMilli(millis))
      writeWithMtime(fs, new Path(dir, name), chroniclesUpdateJson(update), millis)
      written += 1
    }

    write(fs, new Path(dir, "head_ref"),
      mapper.createObjectNode().put("head_ref", head.id).toPrettyString)
    written
  }

  /** One commit rendered as the reference's snake_case commit document. */
  def chroniclesUpdateJson(update: TableUpdate): String = {
    val root = mapper.createObjectNode()
    root.put("commit_id", update.metadata.id.id)
    root.put("user_id", update.metadata.userId.value)
    root.put("message", update.metadata.message)
    root.put("timestamp", update.metadata.timestamp.toString)
    val ops = root.putArray("operations")
    update.operations.foreach { op =>
      val n = mapper.createObjectNode()
      op match {
        case TableOperation.InitTable(t, snap) =>
          n.put("type", "init-table")
          n.put("table_name", t.fullyQualifiedName)
          n.put("is_snapshot", snap)
        case TableOperation.AddTableVersion(v) =>
          n.put("type", "add-table-version")
          n.put("version", v.label)
        case TableOperation.AddPartitionVersion(p, v) =>
          n.put("type", "add-partition-version")
          n.put("partition", p.toPath)
          n.put("version", v.label)
        case TableOperation.RemovePartition(p) =>
          n.put("type", "remove-partition")
          n.put("partition", p.toPath)
        // graft-only metadata the reference doesn't track: the schema record
        // is a read/guard optimization (chronicles reads footers anyway), so
        // dropping it on export loses nothing the reference could use.
        // SetVersionBase never reaches here — requireRepresentable refuses
        // the whole export — but skipping (not MatchError) keeps this
        // renderer total.
        case TableOperation.SetTableSchema(_) | TableOperation.SetVersionBase(_, _, _) => ()
      }
      if (!n.isEmpty) ops.add(n)
    }
    root.toPrettyString
  }

  /** The chronicles wire format can only carry partitions whose RAW path form
    * round-trips (no escaping exists there). */
  private def requireRepresentable(table: TableName, update: TableUpdate): Unit = {
    def check(p: Partition): Unit =
      if (Partition.parse(p.toPath) != Right(p))
        throw new IllegalArgumentException(
          s"Partition '${p.toPath}' of $table (commit ${update.metadata.id.id}) cannot be " +
            "represented in the reference's raw partition encoding (value contains " +
            "path-special characters); the chronicles layout has no escaping for it")
    update.operations.foreach {
      case TableOperation.AddPartitionVersion(p, _) => check(p)
      case TableOperation.RemovePartition(p)        => check(p)
      // a deletion-vector version is unreadable by a chronicles reader (its
      // directory holds a deletion sidecar, not data) — exporting one would
      // hand the reference a state that silently reads EMPTY partitions
      case TableOperation.SetVersionBase(p, v, _) =>
        throw new IllegalArgumentException(
          s"Commit ${update.metadata.id.id} of $table carries a deletion-vector version " +
            s"(${v.label} on '${p.toPath}') — the chronicles format cannot represent " +
            "merge-on-read deletes; OPTIMIZE/compact the table to fold them first")
      case _ => ()
    }
  }

  /** Exclusive-create write. Local filesystems bypass the Hadoop
    * ChecksumFileSystem layer (NIO direct, CREATE_NEW keeps the
    * fail-if-exists semantics) — measured ~7ms vs ~0.1ms per commit file,
    * the difference between a 36s and a ~2s export of a 5,000-commit
    * history (HistoryScaleProbe); remote stores keep the Hadoop path. */
  private def write(fs: FileSystem, path: Path, content: String): Unit =
    if ("file" == fs.getUri.getScheme) {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(path.toUri.getPath),
        content.getBytes(StandardCharsets.UTF_8),
        java.nio.file.StandardOpenOption.CREATE_NEW)
      ()
    } else {
      val out = fs.create(path, false)
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }

  /** Read; a missing file surfaces as FileNotFoundException on BOTH I/O
    * branches (NIO's NoSuchFileException is converted — the same
    * normalization [[FileBackedVersionTracker]]'s read does, so callers can
    * catch one type regardless of scheme). */
  private def read(fs: FileSystem, path: Path): String =
    if ("file" == fs.getUri.getScheme)
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path.toUri.getPath)), StandardCharsets.UTF_8)
      catch {
        case e: java.nio.file.NoSuchFileException =>
          throw new java.io.FileNotFoundException(e.getFile)
      }
    else {
      val in = fs.open(path)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    }

  /** Atomic-appearance write for a file readers may be LISTING right now
    * (the sync path): content + mtime land on a temp name, then one rename
    * publishes the finished file — a replica reader can never parse a
    * half-written commit document (the same temp+rename discipline
    * [[FileBackedVersionTracker]] uses for its own commit files). */
  private def writeAtomicWithMtime(fs: FileSystem, path: Path, content: String, mtimeMs: Long): Unit = {
    val tmp = new Path(path.getParent, s".${path.getName}.tmp-${java.util.UUID.randomUUID()}")
    writeWithMtime(fs, tmp, content, mtimeMs)
    if ("file" == fs.getUri.getScheme)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(path.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    else if (!fs.rename(tmp, path)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"Sync commit-file rename failed for $path")
    }
    ()
  }

  /** Atomic REPLACE — for `head_ref`, the one file a sync overwrites in a
    * live replica: temp + rename-over, so a reader never observes a
    * truncated or absent head (a crash mid-sync leaves the OLD head, which
    * is a consistent, merely stale, replica). */
  private def writeReplaceAtomic(fs: FileSystem, path: Path, content: String): Unit = {
    val tmp = new Path(path.getParent, s".${path.getName}.tmp-${java.util.UUID.randomUUID()}")
    write(fs, tmp, content)
    if ("file" == fs.getUri.getScheme) {
      // drop any stale Hadoop checksum sidecar BEFORE the swap: a replica
      // written through ChecksumFileSystem (pre-round-8 exports) carries a
      // .head_ref.crc that would no longer match the NIO-replaced content,
      // and Hadoop-layer readers — the reference implementation itself —
      // would fail the whole read on it. A missing crc merely skips
      // verification; a stale one poisons the file.
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
        new Path(path.getParent, s".${path.getName}.crc").toUri.getPath))
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(path.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    } else
      // FileContext's OVERWRITE rename, like the tracker's head swap: plain
      // FileSystem.rename refuses existing targets on several stores
      org.apache.hadoop.fs.FileContext.getFileContext(path.toUri, fs.getConf)
        .rename(tmp, path, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** [[write]] + mtime stamp (the reference reconstructs order from
    * (mtime, name), so each commit file's mtime must equal its filename
    * instant). Same NIO fast path. */
  private def writeWithMtime(fs: FileSystem, path: Path, content: String, mtimeMs: Long): Unit = {
    write(fs, path, content)
    if ("file" == fs.getUri.getScheme)
      java.nio.file.Files.setLastModifiedTime(
        java.nio.file.Paths.get(path.toUri.getPath),
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    else fs.setTimes(path, mtimeMs, -1)
    ()
  }
}
