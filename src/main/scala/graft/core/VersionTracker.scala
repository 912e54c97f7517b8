package graft.core

import java.time.Instant
import java.util.UUID

/** Identifies a single commit in a table's history
  * (reference `VersionTracker.scala:91-123`: random UUID string). */
final case class CommitId(id: String) {
  override def toString: String = id
}
object CommitId {
  def generate(): CommitId = CommitId(UUID.randomUUID().toString)
}

final case class UserId(value: String)

/** Metadata of one commit. */
final case class TableUpdateMetadata(
    id: CommitId,
    userId: UserId,
    message: String,
    timestamp: Instant)

/** One commit: metadata + the list of operations it applies.
  * The table's state is a fold over the operations of all commits up to the
  * current ref — an event-sourced log (reference VersionTracker.scala:127-135). */
final case class TableUpdate(metadata: TableUpdateMetadata, operations: List[TableOperation])

object TableUpdate {
  def apply(userId: UserId, message: String, timestamp: Instant, operations: List[TableOperation]): TableUpdate =
    TableUpdate(TableUpdateMetadata(CommitId.generate(), userId, message, timestamp), operations)
}

/** Version-store-side operation ADT (reference VersionTracker.scala:127-135). */
sealed trait TableOperation
object TableOperation {
  /** Commit #0 of every table. */
  final case class InitTable(tableName: TableName, isSnapshot: Boolean) extends TableOperation
  /** Snapshot tables: replace the whole-table version. */
  final case class AddTableVersion(version: Version) extends TableOperation
  /** Partitioned tables: set/replace one partition's version. */
  final case class AddPartitionVersion(partition: Partition, version: Version) extends TableOperation
  /** Partitioned tables: make a partition invisible. */
  final case class RemovePartition(partition: Partition) extends TableOperation

  /** Records the table's COLUMN SCHEMA as of this commit — written by every
    * schema-defining commit (first write, additive evolution, replace-all
    * under a new shape). `schemaJson` is an opaque document to this layer
    * (the Spark engine stores `StructType.json`); the core model stays
    * Spark-free. Purely informational for the state fold (visible data is
    * still the partition→version map); its consumers are the schema-drift
    * guard and the mergeSchema read path, which resolve a table's schema
    * from the LOG instead of footer-merging every live data file — the
    * difference between O(1) and O(all files) schema resolution per
    * statement on evolved tables at 100 TB. Tables whose history carries no
    * SetTableSchema (adopted / chronicles-imported / pre-upgrade) fall back
    * to footer reads exactly as before. */
  final case class SetTableSchema(schemaJson: String) extends TableOperation

  /** Ties a DELETION-VECTOR version to the DATA version it filters: the
    * partition's directory `_version=<version>` holds only a deletion
    * sidecar (parquet files under `_dv` plus `_base.json`), and reads
    * resolve data files
    * from `_version=<base>`. Informational for the fold (the partition map
    * carries `version` like any other); retention consumes it — a live DV
    * version PINS its base (expiring the base while the DV is visible
    * would break every read of the partition). */
  final case class SetVersionBase(partition: Partition, version: Version, base: Version)
      extends TableOperation
}

/** Current ref + full ordered history (oldest first). */
final case class TableState(currentVersion: CommitId, updates: List[TableUpdate]) {

  /** Replay history only up to (and including) the current ref, then fold
    * (reference VersionTracker.scala:37-55). A head ref that is absent from
    * the update list means a corrupt store — fail loudly rather than silently
    * reading the full history as "latest". */
  def currentTableVersion: TableVersion = {
    val idx = updates.indexWhere(_.metadata.id == currentVersion)
    if (idx < 0) throw UnknownCommitError(currentVersion)
    TableState.foldVersion(updates.take(idx + 1))
  }

  /** The visible state as of commit `id` (UnknownCommitError if absent). */
  def versionAt(id: CommitId): TableVersion =
    copy(currentVersion = id).currentTableVersion

  /** The commit a TIMESTAMP resolves to: the LATEST commit whose commit
    * time is at or before `instant` — SQL `TIMESTAMP AS OF` semantics,
    * shared by the SQL face, the Scala read API ([[graft.operators
    * .VersionedTables.readAsOf]]) and the CLI so a timestamp can never
    * mean different commits on different surfaces. Ties (several commits
    * on the same instant) fall to the latest in COMMIT order, matching the
    * history's ordering law. None when the table had no commit yet. */
  def commitIdAsOf(instant: java.time.Instant): Option[CommitId] =
    updates.filter(!_.metadata.timestamp.isAfter(instant)).lastOption.map(_.metadata.id)

  /** The recorded schema document as of commit `id`: the LAST
    * [[TableOperation.SetTableSchema]] at or before `id`, or None for
    * histories that never recorded one (adopted / imported / pre-upgrade
    * tables — callers fall back to reading data-file footers). Resolving at
    * the commit (not the head) is what keeps time travel honest: a read at
    * a pre-evolution commit sees the pre-evolution schema. */
  def schemaJsonAt(id: CommitId): Option[String] = {
    val idx = updates.indexWhere(_.metadata.id == id)
    if (idx < 0) throw UnknownCommitError(id)
    TableState.lastSchemaJson(updates.take(idx + 1))
  }

  /** [[schemaJsonAt]] the current ref. */
  def currentSchemaJson: Option[String] = schemaJsonAt(currentVersion)

  /** (partition, DV version) → base DATA version, from every
    * [[TableOperation.SetVersionBase]] in the FULL history. A (p, v)→base
    * binding never changes once committed, so the whole-history map is
    * valid for resolving ANY historical state's DV versions. */
  def versionBases: Map[(Partition, Version), Version] = TableState.basesOf(updates)
}

/** The current ref's RESOLVED read-side state in one value: the ref, the
  * visible [[TableVersion]], the recorded schema document at the ref, and
  * the (partition, marker)→base bindings — everything a per-statement read
  * needs. Derivable from [[TableState]]; the point of the type is the
  * persistent stores' [[VersionTracker.headState]] overrides, which serve
  * it from their fold checkpoint + commit tail in O(partitions + tail)
  * instead of materializing a 100k-commit history per statement. */
final case class HeadState(
    head: CommitId,
    version: TableVersion,
    schemaJson: Option[String],
    versionBases: Map[(Partition, Version), Version])

object TableState {

  /** Fold a commit list into the visible `TableVersion`
    * (reference `applyPartitionUpdates` VersionTracker.scala:156-183; laws in
    * VersionTrackerObjectSpec.scala:218-289):
    *  - `AddPartitionVersion` = map put, `RemovePartition` = map remove
    *  - snapshot tables: last `AddTableVersion` wins
    */
  def foldVersion(updates: List[TableUpdate]): TableVersion = {
    val ops = updates.flatMap(_.operations)
    val isSnapshot = ops.collectFirst { case TableOperation.InitTable(_, snap) => snap }.getOrElse(false)
    if (isSnapshot) {
      val last = ops.reverseIterator.collectFirst { case TableOperation.AddTableVersion(v) => v }
      SnapshotTableVersion(last.getOrElse(Version.Unversioned))
    } else {
      val partitions = ops.foldLeft(Map.empty[Partition, Version]) {
        case (acc, TableOperation.AddPartitionVersion(p, v)) => acc.updated(p, v)
        case (acc, TableOperation.RemovePartition(p))        => acc - p
        case (acc, _)                                        => acc
      }
      PartitionedTableVersion(partitions)
    }
  }

  /** The LAST recorded schema document across `updates` (newest wins), or
    * None when none recorded — the fold rule behind
    * [[TableState.schemaJsonAt]] and the stores' fold-checkpoint extras. */
  def lastSchemaJson(updates: List[TableUpdate]): Option[String] =
    updates.reverseIterator.flatMap(_.operations.reverseIterator).collectFirst {
      case TableOperation.SetTableSchema(json) => json
    }

  /** Every (partition, marker)→base binding across `updates` — the fold
    * rule behind [[TableState.versionBases]]. Bindings are write-once, so
    * folding forward is a plain map union. */
  def basesOf(updates: List[TableUpdate]): Map[(Partition, Version), Version] =
    updates.iterator.flatMap(_.operations).collect {
      case TableOperation.SetVersionBase(p, v, base) => (p, v) -> base
    }.toMap

  /** Continue a fold from an already-folded state: apply `updates`' operations
    * on top of `start`. Law (pinned by TableStateSpec):
    * `foldForward(foldVersion(a), b) == foldVersion(a ++ b)` — which is what
    * lets a store fold "checkpointed state + commit tail" into the current
    * version without ever materializing the checkpointed history as a
    * `List[TableUpdate]` (the bounded-memory analogue of the reference's
    * lazily streamed history, reference VersionTracker.scala:137-151).
    * The start state fixes the table flavor: `InitTable` ops in the tail are
    * no-ops (commit #0 is always inside the checkpointed prefix). */
  def foldForward(start: TableVersion, updates: List[TableUpdate]): TableVersion = {
    val ops = updates.iterator.flatMap(_.operations)
    start match {
      case SnapshotTableVersion(v0) =>
        var v = v0
        ops.foreach {
          case TableOperation.AddTableVersion(nv) => v = nv
          case _                                  => ()
        }
        SnapshotTableVersion(v)
      case PartitionedTableVersion(m0) =>
        var m = m0
        ops.foreach {
          case TableOperation.AddPartitionVersion(p, v) => m = m.updated(p, v)
          case TableOperation.RemovePartition(p)        => m = m - p
          case _                                        => ()
        }
        PartitionedTableVersion(m)
    }
  }
}

/** Errors raised by version trackers (reference VersionTrackerSpec.scala:433-492). */
final case class UnknownTableError(table: TableName)
    extends Exception(s"Unknown table: '$table'")
final case class UnknownCommitError(id: CommitId)
    extends Exception(s"Unknown commit: '$id'")

/** Raised by [[VersionTracker.commitIf]] when the head moved since the writer
  * read it — the optimistic-concurrency conflict signal. The log is left
  * untouched; the writer should re-read the table and retry or abort. */
final case class CommitConflictError(table: TableName, expected: CommitId, actual: CommitId)
    extends Exception(
      s"Commit conflict on '$table': expected head '$expected' but found '$actual' — " +
        "another writer committed since this transaction read the table")

final case class TagExistsError(table: TableName, tag: String)
    extends Exception(s"Tag '$tag' already exists on '$table' (tags are immutable; delete it first)")
final case class UnknownTagError(table: TableName, tag: String)
    extends Exception(s"Unknown tag '$tag' on '$table'")

/**
 * The transactional commit log for versioned tables — the reference's central
 * seam (`core/src/main/scala/dev/chronicles/core/VersionTracker.scala`).
 * Implementations: [[InMemoryVersionTracker]] and
 * [[graft.sources.FileBackedVersionTracker]].
 *
 * All methods are driver-side and eager (the reference's cats-effect `F[_]`
 * machinery is an implementation idiom, not a semantic, and is not ported).
 */
trait VersionTracker {

  /** Begin tracking a table. Idempotent: a second init is a no-op
    * (reference VersionTrackerSpec.scala:57-77). */
  def initTable(table: TableName, isSnapshot: Boolean, userId: UserId, message: String, timestamp: Instant): Unit

  /** All tracked tables. */
  def tables(): List[TableName]

  /** Append a commit and move the current ref to it. */
  def commit(table: TableName, update: TableUpdate): Unit

  /**
   * Optimistic-concurrency (compare-and-swap) commit: append `update` and
   * move the head ONLY if the current ref still equals `expectedHead` — the
   * head this writer based its read-modify-write cycle on. A moved head
   * raises [[CommitConflictError]] and leaves the log untouched; the caller
   * re-reads and retries (or aborts). The check-and-append is atomic within
   * each implementation's isolation domain: the in-memory monitor, the
   * file store's per-table + cross-process commit lock, or the JDBC store's
   * serializable transaction. Plain [[commit]] remains last-writer-appends
   * (the reference's semantics); `commitIf` is what concurrent writers that
   * both read-then-write the SAME partitions need to avoid silently basing
   * a commit on a stale snapshot.
   */
  def commitIf(table: TableName, update: TableUpdate, expectedHead: CommitId): Unit

  /** Move the current ref to ANY historical commit (rollback / roll-forward).
    * Unknown commit ⇒ [[UnknownCommitError]]. */
  def setCurrentVersion(table: TableName, id: CommitId): Unit

  // ---- tags: named IMMUTABLE refs into history ----
  //
  // The reproducibility primitive of a training-data pipeline: `createTag
  // (t, "model-v3-train", head)` pins the exact dataset state a model
  // trained on; `readAtTag` re-reads it forever (and retention/vacuum keeps
  // tagged states alive regardless of the keep-last window). git-tag
  // semantics: create-once, never moved, deletable.

  /** All tags of a table, sorted by name. */
  def tags(table: TableName): List[(String, CommitId)]

  /** Create tag `name` pointing at commit `at`. Errors: unknown table/
    * commit; [[TagExistsError]] (tags never move — delete first);
    * IllegalArgumentException for names outside `[A-Za-z0-9][A-Za-z0-9._-]*`. */
  def createTag(table: TableName, name: String, at: CommitId): Unit

  /** Delete tag `name`; [[UnknownTagError]] if absent. */
  def deleteTag(table: TableName, name: String): Unit

  /** The commit a tag points at; [[UnknownTagError]] if absent. */
  def tagCommit(table: TableName, name: String): CommitId =
    tags(table).collectFirst { case (`name`, id) => id }
      .getOrElse(throw UnknownTagError(table, name))

  /** Current ref + ordered history; [[UnknownTableError]] if untracked. */
  def tableState(table: TableName): TableState

  /** The current REF alone — what a CAS writer compares against. Distinct
    * from "the newest commit": after a historical checkout the ref points
    * mid-history. The file store overrides this to one head-file read and
    * the JDBC store to one indexed SELECT — O(1) however long the log — so
    * per-delivery head probes never pay a history materialization. */
  def currentRef(table: TableName): CommitId = tableState(table).currentVersion

  /** Visible state at the current ref. */
  def currentVersion(table: TableName): TableVersion =
    tableState(table).currentTableVersion

  /** Visible state AS OF commit `id` ([[UnknownCommitError]] if absent).
    * The persistent stores resolve it boundedly whenever `id` lies PAST
    * their fold boundary — which is always true for a just-committed id,
    * making this the post-commit pin/sync path's cheap form — and fall
    * back to the full replay for ids inside the checkpointed prefix. */
  def versionAt(table: TableName, id: CommitId): TableVersion =
    tableState(table).versionAt(id)

  /** The ref's RESOLVED read-side state — visible version, recorded schema,
    * DV base bindings — in ONE call (see [[HeadState]]). Semantically
    * identical to deriving the pieces from [[tableState]]; the file and
    * JDBC stores override it to fold "checkpoint extras + commit tail", so
    * the per-statement read path of a long-history table materializes
    * O(partitions + tail), never the full log. */
  def headState(table: TableName): HeadState = {
    val st = tableState(table)
    HeadState(st.currentVersion, st.currentTableVersion, st.currentSchemaJson, st.versionBases)
  }

  /** Version history, most recent first. Ordering law: insertion (commit)
    * order, NOT timestamp order (reference VersionTrackerSpec.scala:402-431). */
  def updates(table: TableName): List[TableUpdateMetadata] =
    tableState(table).updates.reverse.map(_.metadata)

  /** Paged history, most recent first — same ordering law as [[updates]]:
    * skip the `offset` most recent commits, return at most `limit`. The
    * reference streams history lazily (fs2, VersionTracker.scala:137-151);
    * this is the eager analogue of that boundedness: the file and JDBC
    * stores override it to read O(page) commit documents/rows, so a
    * 100k-commit streaming-sink table doesn't materialize its whole history
    * for one CLI `log` page. Law (pinned by the contract spec):
    * `updates(t, l, o) == updates(t).slice(o, o + l)`. */
  def updates(table: TableName, limit: Int, offset: Int): List[TableUpdateMetadata] = {
    VersionTracker.requireValidPage(limit, offset)
    // bound computed in Long: offset + limit can overflow Int, and
    // slice(o, negative) would silently return an empty page
    updates(table).slice(offset, (offset.toLong + limit).min(Int.MaxValue).toInt)
  }

  /**
   * One KEYSET page of history, most recent first, plus the cursor for the
   * next page. `after = None` starts at the newest commit; passing the
   * returned cursor back yields the next-older page; a `None` cursor out
   * means the history is exhausted. Cursors are store-opaque strings — a
   * commit file name (file store), a sequence id (JDBC), a commit id (the
   * default) — and anchor the page on the last-seen COMMIT rather than a
   * positional offset. That is what offset paging cannot give on a live log:
   * a commit landing between page reads shifts every offset (the boundary
   * entry prints twice); a keyset page is unaffected, so iterating to
   * exhaustion yields every commit present at iteration start EXACTLY once.
   * Laws (pinned by the contract spec): concatenating pages == [[updates]];
   * pages taken while a writer commits contain no duplicates and miss no
   * pre-existing commit. Cursors are only meaningful to the store that
   * issued them: a fabricated cursor is store-defined behavior (the default
   * implementation raises [[UnknownCommitError]]; keyset stores treat it as
   * a pure position anchor).
   */
  def updatesPage(
      table: TableName, limit: Int, after: Option[String]): (List[TableUpdateMetadata], Option[String]) = {
    VersionTracker.requireValidPage(limit, 0)
    val all = updates(table)
    val start = after match {
      case None => 0
      case Some(tok) =>
        val i = all.indexWhere(_.id.id == tok)
        if (i < 0) throw UnknownCommitError(CommitId(tok))
        i + 1
    }
    if (limit == 0) (Nil, after)
    else {
      val page = all.slice(start, (start.toLong + limit).min(Int.MaxValue).toInt)
      (page, if (page.size < limit) None else page.lastOption.map(_.id.id))
    }
  }

  /**
   * One keyset page of FULL commits (metadata + operations), OLDEST first —
   * the bulk-consumption face of the history ([[updatesPage]] is the
   * newest-first metadata face the CLI `log` uses). `after = None` starts at
   * commit #0; passing the returned cursor back yields the next-newer page;
   * a `None` cursor out means every commit present at that point has been
   * seen. Cursors are store-opaque, same as [[updatesPage]]'s. This is what
   * lets a bulk consumer (export, replication) walk a 100k-commit history
   * holding O(page) commits — the eager analogue of the reference's lazily
   * streamed `TableState.updates` (fs2, reference VersionTracker.scala:137-151).
   * Ascending iteration guarantee: every commit PRESENT AT ITERATION START
   * is yielded exactly once. Commits landing mid-iteration are additionally
   * picked up when their sort key is past the cursor — which monotonic
   * same-process clocks always give, but cross-process clock skew can
   * violate on the file store (a skewed writer's commit can sort below the
   * cursor and be missed), the SAME assumption the store's commit-name
   * ordering already makes (see FileBackedVersionTracker's header). Laws
   * (pinned by the contract spec): concatenating pages ==
   * `tableState(t).updates`; the file and JDBC stores read O(listing) +
   * O(page) documents/rows per call.
   */
  def commitsPageAsc(
      table: TableName, limit: Int, after: Option[String]): (List[TableUpdate], Option[String]) = {
    VersionTracker.requireValidPage(limit, 0)
    if (limit == 0) (Nil, after) // short-circuit BEFORE any history I/O, like the store overrides
    else {
      val all = tableState(table).updates
      val start = after match {
        case None => 0
        case Some(tok) =>
          val i = all.indexWhere(_.metadata.id.id == tok)
          if (i < 0) throw UnknownCommitError(CommitId(tok))
          i + 1
      }
      val page = all.slice(start, (start.toLong + limit).min(Int.MaxValue).toInt)
      (page, if (page.size < limit) None else page.lastOption.map(_.metadata.id.id))
    }
  }

  /**
   * The commit a TIMESTAMP resolves to — the LATEST commit (in COMMIT
   * order) whose time is at or before `instant`; None when no commit is
   * that old. Same rule as [[TableState.commitIdAsOf]] (SQL
   * `TIMESTAMP AS OF` semantics, shared by every surface), but BOUNDED: a
   * newest-first page walk stops at the first qualifying commit — which IS
   * the latest-in-commit-order qualifier, exactly, even under
   * non-monotonic commit timestamps — so resolving a recent timestamp on
   * a 100k-commit table reads O(distance from head) metadata (one
   * manifest-served page on the file store), never the whole history.
   */
  def commitIdAsOf(table: TableName, instant: Instant): Option[CommitId] = {
    var cursor: Option[String] = None
    var more = true
    while (more) {
      val (page, next) = updatesPage(table, 64, cursor)
      page.find(!_.timestamp.isAfter(instant)).foreach(m => return Some(m.id))
      cursor = next
      more = next.isDefined
    }
    None
  }

  /**
   * The PARENT of commit `id` — the commit immediately before it in
   * history order — or None when `id` is the table's first commit;
   * [[UnknownCommitError]] when `id` is not in the history. The row-level
   * change feed resolves every delivered commit through this, so the
   * default walks [[updatesPage]] newest-first (O(distance from head) —
   * the CDC case reads commits near the head); the file store overrides it
   * to serve tail ids straight from the head manifest with ZERO directory
   * listings.
   */
  def parentCommit(table: TableName, id: CommitId): Option[CommitId] = {
    var cursor: Option[String] = None
    // None = id not seen yet; Some(None) = id seen, parent is the next
    // (older) entry — possibly on the next page; Some(Some(p)) = done
    var found: Option[Option[CommitId]] = None
    var more = true
    while (found.flatten.isEmpty && more) {
      val (page, next) = updatesPage(table, 256, cursor)
      page.foreach { m =>
        if (found.isEmpty) { if (m.id == id) found = Some(None) }
        else if (found.contains(None)) found = Some(Some(m.id))
      }
      cursor = next
      more = next.isDefined
    }
    found match {
      case None => throw UnknownCommitError(id)
      case Some(p) => p // Some = parent; None = `id` is the oldest commit
    }
  }

  /** Stream every commit oldest-first through `f`, holding O(pageSize)
    * commits — the one shared walk loop over [[commitsPageAsc]] that export,
    * migration, and probes all consume (same coverage guarantee as the
    * paging method itself). */
  final def forEachCommitAsc(table: TableName, pageSize: Int)(f: TableUpdate => Unit): Unit = {
    var cursor: Option[String] = None
    var more = true
    while (more) {
      val (page, next) = commitsPageAsc(table, pageSize, cursor)
      page.foreach(f)
      cursor = next
      more = next.isDefined
    }
  }

  /** Whether the table was initialised as a snapshot table. */
  def isSnapshotTable(table: TableName): Boolean =
    tableState(table).updates.flatMap(_.operations).collectFirst {
      case TableOperation.InitTable(_, snap) => snap
    }.getOrElse(false)
}

/**
 * Optional tracker capability: MULTI-TABLE atomic commit groups — the
 * "publish N tables from one pipeline run" primitive. All commits verify
 * their expected heads and land together, or none advances: concurrent
 * writers (thread or process) can never observe or produce an interleaving
 * where table A carries group X's commit while table B carries group Y's
 * based on stale state, because every head is CAS-verified and written
 * under ALL the group's table locks, acquired in one global (sorted) order.
 *
 * Isolation caveat, stated like the reference states its own commit-layout
 * caveats (reference FileBackedVersionTracker analog): atomicity is
 * against CONCURRENT WRITERS, not against crashes or readers — a process
 * dying between head writes leaves a partial group (re-run publishes the
 * rest; each table's own commit is still atomic), and a reader scanning
 * tables mid-publish can see table A advanced before table B.
 */
trait GroupCommitTracker { self: VersionTracker =>

  /** Atomically commit `(table, update, expectedHead)` for every entry —
    * all-or-nothing against concurrent writers. Any moved head raises
    * [[CommitConflictError]] BEFORE any table advances. Tables must be
    * distinct. */
  def commitGroup(commits: List[(TableName, TableUpdate, CommitId)]): Unit
}

object VersionTracker {
  private val TagNamePattern = "[A-Za-z0-9][A-Za-z0-9._-]*".r
  private val TagNameMaxLength = 200

  /** Shared tag-name validation: a safe filename / SQL identifier subset
    * (and a length every backend can store — filenames and the VARCHAR(256)
    * column alike), so every store can persist the name verbatim. Applied on
    * DELETE as well as create: on the file store an unvalidated name is a
    * path (`x/../head` would resolve onto the head ref), so the check is a
    * safety boundary, not just hygiene. */
  def requireValidTagName(name: String): Unit = {
    require(TagNamePattern.matches(name),
      s"Invalid tag name '$name': must match [A-Za-z0-9][A-Za-z0-9._-]*")
    require(name.length <= TagNameMaxLength,
      s"Invalid tag name: ${name.length} chars exceeds the $TagNameMaxLength limit")
  }

  /** Shared page validation for [[VersionTracker.updates(table,limit,offset)*]]. */
  def requireValidPage(limit: Int, offset: Int): Unit = {
    require(limit >= 0, s"page limit must be >= 0, was $limit")
    require(offset >= 0, s"page offset must be >= 0, was $offset")
  }
}

/** Simple in-memory tracker (reference `InMemoryVersionTracker.scala`).
  * Single-JVM; useful for tests and as the semantic baseline. */
final class InMemoryVersionTracker extends VersionTracker with GroupCommitTracker {

  /** One monitor guards everything, so verify-all-then-apply-all is
    * trivially atomic here — the semantic baseline the file store's
    * sorted-lock implementation must match. */
  override def commitGroup(commits: List[(TableName, TableUpdate, CommitId)]): Unit =
    synchronized {
      require(commits.nonEmpty, "commitGroup needs at least one commit")
      require(commits.map(_._1).distinct.size == commits.size,
        "commitGroup: tables must be distinct")
      commits.foreach { case (table, _, expected) =>
        val st = states.getOrElse(table, throw UnknownTableError(table))
        if (st.currentVersion != expected)
          throw CommitConflictError(table, expected, st.currentVersion)
      }
      commits.foreach { case (table, update, _) =>
        val st = states(table)
        states += table -> TableState(update.metadata.id, st.updates :+ update)
      }
    }
  private var states = Map.empty[TableName, TableState]

  override def initTable(table: TableName, isSnapshot: Boolean, userId: UserId, message: String, timestamp: Instant): Unit =
    synchronized {
      if (!states.contains(table)) {
        val update = TableUpdate(userId, message, timestamp, List(TableOperation.InitTable(table, isSnapshot)))
        states += table -> TableState(update.metadata.id, List(update))
      }
    }

  override def tables(): List[TableName] = synchronized(states.keys.toList.sortBy(_.fullyQualifiedName))

  override def commit(table: TableName, update: TableUpdate): Unit =
    commitInternal(table, update, None)

  override def commitIf(table: TableName, update: TableUpdate, expectedHead: CommitId): Unit =
    commitInternal(table, update, Some(expectedHead))

  private def commitInternal(
      table: TableName, update: TableUpdate, expectedHead: Option[CommitId]): Unit =
    synchronized {
      val st = states.getOrElse(table, throw UnknownTableError(table))
      expectedHead.foreach { h =>
        if (st.currentVersion != h) throw CommitConflictError(table, h, st.currentVersion)
      }
      states += table -> TableState(update.metadata.id, st.updates :+ update)
    }

  override def setCurrentVersion(table: TableName, id: CommitId): Unit = synchronized {
    val st = states.getOrElse(table, throw UnknownTableError(table))
    if (!st.updates.exists(_.metadata.id == id)) throw UnknownCommitError(id)
    states += table -> st.copy(currentVersion = id)
  }

  override def tableState(table: TableName): TableState = synchronized {
    states.getOrElse(table, throw UnknownTableError(table))
  }

  private var tagRefs = Map.empty[(TableName, String), CommitId]

  override def tags(table: TableName): List[(String, CommitId)] = synchronized {
    if (!states.contains(table)) throw UnknownTableError(table)
    tagRefs.collect { case ((`table`, n), id) => (n, id) }.toList.sortBy(_._1)
  }

  override def createTag(table: TableName, name: String, at: CommitId): Unit = synchronized {
    VersionTracker.requireValidTagName(name)
    val st = states.getOrElse(table, throw UnknownTableError(table))
    if (!st.updates.exists(_.metadata.id == at)) throw UnknownCommitError(at)
    if (tagRefs.contains((table, name))) throw TagExistsError(table, name)
    tagRefs += (table, name) -> at
  }

  override def deleteTag(table: TableName, name: String): Unit = synchronized {
    VersionTracker.requireValidTagName(name)
    if (!states.contains(table)) throw UnknownTableError(table)
    if (!tagRefs.contains((table, name))) throw UnknownTagError(table, name)
    tagRefs -= ((table, name))
  }
}
