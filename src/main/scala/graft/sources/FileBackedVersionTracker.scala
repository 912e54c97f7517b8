package graft.sources

import graft.core._
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import java.net.URI
import java.nio.charset.StandardCharsets
import java.time.Instant

/**
 * Commit log persisted as JSON files on a Hadoop `FileSystem` — works on
 * `file://`, `hdfs://` and `s3a://` alike, which is what makes the version
 * store usable next to 100 TB of lake data.
 *
 * Layout mirrors the reference
 * (`files/src/main/scala/dev/chronicles/files/FileBackedVersionTracker.scala:85-176`):
 * {{{
 *   <root>/_graft_table_<schema>.<table>/
 *     table-metadata.json            // {"isSnapshot": …}
 *     head.json                      // current ref (commit id)
 *     table_update_<sortable-ts>.json  // one file per commit
 * }}}
 * Commit files are named with a strictly-monotonic timestamp so lexicographic
 * name order == commit order (the history-ordering law; reference sorts by
 * (mtime, name), we make the name alone sufficient). Like the reference's
 * file-backed store, this provides single-PROCESS-writer semantics:
 * within one JVM, commits to the same table are serialized on a per-table
 * lock (so e.g. two streaming queries sinking into one table can't race the
 * head rename into a partial commit); concurrent writers in SEPARATE
 * processes remain an orchestration concern, exactly as in the reference
 * (FileBackedVersionTracker.scala:23-25) — the JDBC tracker is the
 * serializable-isolation option.
 */
final class FileBackedVersionTracker(rootUri: URI, hadoopConf: Configuration = new Configuration())
    extends VersionTracker {

  import FileBackedVersionTracker._

  private val fs: FileSystem = FileSystem.get(rootUri, hadoopConf)
  private val root = new Path(rootUri)

  override def initTable(
      table: TableName, isSnapshot: Boolean, userId: UserId, message: String, timestamp: Instant): Unit = {
    val dir = tableDir(table)
    tableLock(dir).synchronized {
      if (!fs.exists(new Path(dir, MetadataFile))) {
        fs.mkdirs(dir)
        write(new Path(dir, MetadataFile), JsonCodecs.metadataToJson(isSnapshot))
        val update = TableUpdate(userId, message, timestamp, List(TableOperation.InitTable(table, isSnapshot)))
        writeCommit(dir, update)
        writeAtomic(new Path(dir, HeadFile), update.metadata.id.id)
      }
    }
  }

  override def tables(): List[TableName] =
    if (!fs.exists(root)) Nil
    else
      fs.listStatus(root).toList
        .filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(_.startsWith(TableDirPrefix))
        .flatMap(n => TableName.parse(n.stripPrefix(TableDirPrefix)).toOption)
        .sortBy(_.fullyQualifiedName)

  override def commit(table: TableName, update: TableUpdate): Unit = {
    val dir = existingTableDir(table)
    // serialize per table WITHIN the process: commit-file order and head
    // order stay consistent, and two in-JVM writers can't race the head
    // rename into an exception after their commit file already landed
    tableLock(dir).synchronized {
      writeCommit(dir, update)
      writeAtomic(new Path(dir, HeadFile), update.metadata.id.id)
    }
  }

  override def setCurrentVersion(table: TableName, id: CommitId): Unit = {
    val st = tableState(table)
    if (!st.updates.exists(_.metadata.id == id)) throw UnknownCommitError(id)
    val dir = existingTableDir(table)
    tableLock(dir).synchronized {
      writeAtomic(new Path(dir, HeadFile), id.id)
    }
  }

  override def tableState(table: TableName): TableState = {
    val dir = existingTableDir(table)
    // read head BEFORE listing: a concurrent in-JVM commit (file + head, in
    // that order under the table lock) can then only make the listing see
    // MORE commits than head — which folds correctly — never a head id
    // missing from the listing (which would look like a corrupt store).
    // The head read itself takes the table lock: FileContext.rename with
    // OVERWRITE is delete-then-rename on the local filesystem, so an
    // unlocked reader could catch the head file mid-swap and see it absent
    // (HDFS/S3A renames are atomic; the lock closes the local-FS window for
    // in-process readers, which is the concurrency this store supports)
    val head = FileBackedVersionTracker.tableLock(dir).synchronized {
      CommitId(read(new Path(dir, HeadFile)).trim)
    }
    val files = fs.listStatus(dir).toList
      .map(_.getPath)
      .filter(p => p.getName.startsWith(CommitFilePrefix) && p.getName.endsWith(".json"))
      .sortBy(_.getName)
    val updates = files.map { p =>
      JsonCodecs.fromJson(read(p)).fold(e => sys.error(s"Corrupt commit file $p: $e"), identity)
    }
    TableState(head, updates)
  }

  override def isSnapshotTable(table: TableName): Boolean = {
    val p = new Path(existingTableDir(table), MetadataFile)
    JsonCodecs.metadataFromJson(read(p)).fold(e => sys.error(s"Corrupt metadata $p: $e"), identity)
  }

  // ---- helpers ----

  private def tableDir(table: TableName): Path =
    new Path(root, TableDirPrefix + table.fullyQualifiedName)

  private def existingTableDir(table: TableName): Path = {
    val dir = tableDir(table)
    if (!fs.exists(new Path(dir, MetadataFile))) throw UnknownTableError(table)
    dir
  }

  private def writeCommit(dir: Path, update: TableUpdate): Unit = {
    val name = CommitFilePrefix + Version.TimestampFormat.format(
      MonotonicClock.nextUniqueInstant().atOffset(java.time.ZoneOffset.UTC)) + ".json"
    write(new Path(dir, name), JsonCodecs.toJson(update))
  }

  private def write(path: Path, content: String): Unit = {
    val out = fs.create(path, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Overwrite `path` via temp-file + atomic rename, so a crash mid-write can
    * never leave a truncated/corrupt head ref behind (commit files are only
    * ever CREATED, so plain `write` is fine for them). */
  private def writeAtomic(path: Path, content: String): Unit = {
    val tmp = new Path(path.getParent, s".${path.getName}.tmp-${java.util.UUID.randomUUID()}")
    write(tmp, content)
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(path.toUri, hadoopConf)
      fc.rename(tmp, path, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case e: Exception =>
        fs.delete(tmp, false)
        throw new java.io.IOException(s"Atomic head update failed for $path", e)
    }
  }

  private def read(path: Path): String = {
    val in = fs.open(path)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }
}

object FileBackedVersionTracker {
  val TableDirPrefix = "_graft_table_"
  val MetadataFile = "table-metadata.json"
  val HeadFile = "head.json"
  val CommitFilePrefix = "table_update_"

  /** JVM-wide striped locks: two tracker INSTANCES over the same table
    * directory must serialize on the same monitor, so the lock is keyed by
    * the directory, not the instance. A fixed stripe (two dirs may share a
    * monitor — extra serialization, never less) bounds memory for drivers
    * that create many short-lived stores. */
  private val lockStripe = Array.fill(64)(new Object)
  private[sources] def tableLock(dir: Path): Object =
    lockStripe(math.floorMod(dir.toString.hashCode, lockStripe.length))
}
