package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import graft.core._

import java.time.Instant
import scala.jdk.CollectionConverters._

/**
 * JSON wire format for the file-backed commit log.
 *
 * Shape follows the reference's commit-file codec
 * (`files/src/main/scala/dev/chronicles/files/JsonCodecs.scala:89-170`,
 * golden document `JsonCodecsSpec.scala:38-60`): one object per commit with
 * metadata fields plus a typed operation list. Built on Jackson (ships with
 * Spark) with explicit tree construction — no reflection magic, stable format.
 */
object JsonCodecs {

  /**
   * Commit-file format version. v2 serializes partition values Hive-escaped
   * (`toHivePath` / `Partition.parseEscaped`); the unmarked v1 format kept
   * raw values. Decoding accepts three shapes, dispatched per file:
   *
   *  - graft v2 (`formatVersion: 2`): partition values Hive-escaped
   *  - graft v1 (no `formatVersion`, graft field names): partition values
   *    decoded RAW, exactly as v1 wrote them — old stores stay readable
   *  - the reference's chronicles wire format (`commit_id` / snake_case,
   *    `files/src/main/scala/dev/chronicles/files/versiontracker/JsonCodecs.scala:62-117`,
   *    golden document `JsonCodecsSpec.scala:38-66`): read-only import, raw
   *    partition values (the reference has no path escaping)
   */
  val FormatVersion = 2

  private val mapper = new ObjectMapper()

  // ---- encode ----

  def toJson(update: TableUpdate): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(updateToNode(update))

  private def updateToNode(update: TableUpdate): ObjectNode = {
    val root = mapper.createObjectNode()
    root.put("formatVersion", FormatVersion)
    root.put("id", update.metadata.id.id)
    root.put("userId", update.metadata.userId.value)
    root.put("message", update.metadata.message)
    root.put("timestamp", update.metadata.timestamp.toString)
    val ops = root.putArray("operations")
    update.operations.foreach(op => ops.add(opToNode(op)))
    root
  }

  /**
   * State-checkpoint document: the folded commit history up to a point, so
   * `tableState` reconstruction reads one checkpoint file + the tail of new
   * commits instead of every commit file ever written (O(1) + tail opens vs
   * O(#commits) — the difference between milliseconds and minutes for a
   * streaming sink that has made 100k micro-batch commits).
   *
   * `covered` lists the commit FILE NAMES folded into `updates` (parallel
   * arrays, file order) rather than a high-water mark, so a cross-process
   * commit whose clock-derived name sorts below the checkpoint boundary is
   * still picked up by the tail scan (names not in the set) — and the reader
   * merges tail and checkpoint back into name order, folding it exactly
   * where a full scan would.
   */
  def checkpointToJson(covered: List[String], updates: List[TableUpdate]): String = {
    val root = mapper.createObjectNode()
    root.put("formatVersion", FormatVersion)
    val cov = root.putArray("covered")
    covered.foreach(cov.add)
    val ups = root.putArray("updates")
    updates.foreach(u => ups.add(updateToNode(u)))
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Returns (covered commit-file names, folded updates) as PARALLEL lists in
    * file(-name) order — the reader re-sorts checkpointed and tail commits
    * together by name, so a clock-skewed cross-process commit whose name
    * sorts below the checkpoint boundary still folds in the same position a
    * full scan would put it. */
  def checkpointFromJson(json: String): Either[String, (List[String], List[TableUpdate])] =
    try {
      val root = mapper.readTree(json)
      for {
        _ <- Option(root.get("formatVersion")).map(_.asInt) match {
          case Some(FormatVersion) => Right(())
          case other               => Left(s"unsupported checkpoint formatVersion $other")
        }
        covNode <- Option(root.get("covered")).collect { case a: ArrayNode => a }
          .toRight("missing 'covered' array")
        upsNode <- Option(root.get("updates")).collect { case a: ArrayNode => a }
          .toRight("missing 'updates' array")
        covered = covNode.elements().asScala.map(_.asText).toList
        updates <- sequence(upsNode.elements().asScala.toList.map(fromNode))
        _ <- if (covered.length == updates.length) Right(())
             else Left(s"checkpoint covered/updates length mismatch: ${covered.length} vs ${updates.length}")
      } yield (covered, updates)
    } catch {
      case e: Exception => Left(s"Invalid checkpoint JSON: ${e.getMessage}")
    }

  /**
   * Folded-state document: the [[TableVersion]] that results from folding the
   * checkpointed history prefix, plus the boundary it covers — small (O(#live
   * partitions), i.e. the size of the ANSWER) where the checkpoint document is
   * O(#commits). `currentVersion` reads THIS plus the commit tail, so the
   * common "what is the table now?" query never materializes the history
   * (the eager analogue of the reference's lazily streamed fold,
   * reference VersionTracker.scala:137-151).
   *
   *  - `lastCovered`: fold boundary — the highest covered commit FILE NAME
   *    (file store) or sequence id rendered as a string (JDBC store)
   *  - `lastCommitId`: id of the newest covered commit (head == this ⇒ the
   *    folded state IS the current version)
   *  - `coveredCount`: number of commits folded in — lets the file store
   *    detect a clock-skewed commit whose name sorts below the boundary
   *    (covered + tail ≠ total ⇒ fall back to the full merge)
   */
  /** Resolved READ-SIDE extras folded at the checkpoint boundary: the last
    * recorded schema document and every (partition, marker)→base binding —
    * what lets a store serve [[graft.core.VersionTracker.headState]] from
    * "fold doc + tail" without replaying history. Absent on fold docs
    * written before the field existed: readers must then FALL BACK to the
    * full fold for schema/bases (an empty map would silently unpin live DV
    * bases), which is why this is an Option and not defaults. */
  final case class FoldResolved(
      schemaJson: Option[String],
      bases: Map[(Partition, Version), Version])

  /** A parsed fold document. `resolved` is None on pre-upgrade docs. */
  final case class FoldDoc(
      lastCovered: String,
      lastCommitId: String,
      coveredCount: Int,
      state: TableVersion,
      resolved: Option[FoldResolved])

  def foldDocToJson(
      lastCovered: String, lastCommitId: String, coveredCount: Int, state: TableVersion,
      schemaJson: Option[String], bases: Map[(Partition, Version), Version]): String = {
    val root = mapper.createObjectNode()
    root.put("formatVersion", FormatVersion)
    root.put("lastCovered", lastCovered)
    root.put("lastCommitId", lastCommitId)
    root.put("coveredCount", coveredCount)
    root.set[ObjectNode]("state", versionStateToNode(state))
    val resolved = mapper.createObjectNode()
    schemaJson match {
      case Some(j) => resolved.put("schemaJson", j)
      case None    => resolved.putNull("schemaJson")
    }
    val arr = resolved.putArray("bases")
    bases.toList.sortBy { case ((p, v), _) => (p.toHivePath, v.label) }.foreach {
      case ((p, v), base) =>
        val e = mapper.createObjectNode()
        e.put("partition", p.toHivePath)
        e.put("version", v.label)
        e.put("base", base.label)
        arr.add(e)
    }
    root.set[ObjectNode]("resolved", resolved)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def foldDocFromJson(json: String): Either[String, FoldDoc] =
    try {
      val root = mapper.readTree(json)
      for {
        _ <- Option(root.get("formatVersion")).map(_.asInt) match {
          case Some(FormatVersion) => Right(())
          case other               => Left(s"unsupported fold-doc formatVersion $other")
        }
        lastCovered <- str(root, "lastCovered")
        lastCommitId <- str(root, "lastCommitId")
        count <- Option(root.get("coveredCount")).filter(_.isInt).map(_.asInt)
          .toRight("missing int field 'coveredCount'")
        stateNode <- Option(root.get("state")).toRight("missing 'state' object")
        state <- versionStateFromNode(stateNode)
        resolved <- Option(root.get("resolved")) match {
          case None => Right(None) // pre-upgrade doc: version only
          case Some(r) =>
            val schema = Option(r.get("schemaJson")).filter(!_.isNull).map(_.asText)
            val basesNode = Option(r.get("bases")).collect { case a: ArrayNode => a }
              .toRight("missing 'bases' array in 'resolved'")
            basesNode.flatMap { arr =>
              sequence(arr.elements().asScala.toList.map { e =>
                for {
                  p <- str(e, "partition").flatMap(Partition.parseEscaped)
                  v <- str(e, "version").flatMap(Version.parse)
                  b <- str(e, "base").flatMap(Version.parse)
                } yield (p, v) -> b
              }).map(entries => Some(FoldResolved(schema, entries.toMap)))
            }
        }
      } yield FoldDoc(lastCovered, lastCommitId, count, state, resolved)
    } catch {
      case e: Exception => Left(s"Invalid fold-doc JSON: ${e.getMessage}")
    }

  /**
   * Head-manifest document: the compact per-table index that lets every
   * per-statement state read (`currentVersion` / `headState` / `versionAt`)
   * skip the table-directory LISTING entirely. Maintained by writers under
   * the same table + cross-process locks as the head ref itself:
   *
   *  - `foldDoc`: name of the newest fold document (None = DEGRADED — a
   *    clock-skewed commit landed at or below the fold boundary, or a
   *    checkpoint couldn't prove the tail complete; readers fall back to
   *    the listing-based path until the next checkpoint rebuilds it)
   *  - `lastCovered`: the fold boundary (highest covered commit file name)
   *  - `tail`: EVERY commit file name past the boundary, in name order —
   *    the authoritative post-boundary commit set, O(checkpointInterval)
   *
   * With it, a hot-table state read costs head + manifest + fold doc +
   * O(tail) commit opens — independent of history length — where the
   * pre-manifest path paid an O(#commits) `listStatus` per statement.
   */
  final case class HeadManifest(foldDoc: Option[String], lastCovered: String, tail: List[String])

  def manifestToJson(m: HeadManifest): String = {
    val root = mapper.createObjectNode()
    root.put("formatVersion", FormatVersion)
    m.foldDoc match {
      case Some(f) => root.put("foldDoc", f)
      case None    => root.putNull("foldDoc")
    }
    root.put("lastCovered", m.lastCovered)
    val arr = root.putArray("tail")
    m.tail.foreach(arr.add)
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def manifestFromJson(json: String): Either[String, HeadManifest] =
    try {
      val root = mapper.readTree(json)
      for {
        _ <- Option(root.get("formatVersion")).map(_.asInt) match {
          case Some(FormatVersion) => Right(())
          case other               => Left(s"unsupported manifest formatVersion $other")
        }
        foldDoc = Option(root.get("foldDoc")).filter(!_.isNull).map(_.asText)
        lastCovered <- str(root, "lastCovered")
        tailNode <- Option(root.get("tail")).collect { case a: ArrayNode => a }
          .toRight("missing 'tail' array")
      } yield HeadManifest(foldDoc, lastCovered, tailNode.elements().asScala.map(_.asText).toList)
    } catch {
      case e: Exception => Left(s"Invalid head-manifest JSON: ${e.getMessage}")
    }

  private def versionStateToNode(state: TableVersion): ObjectNode = {
    val n = mapper.createObjectNode()
    state match {
      case SnapshotTableVersion(v) =>
        n.put("type", "snapshot")
        n.put("version", v.label)
      case PartitionedTableVersion(m) =>
        n.put("type", "partitioned")
        val parts = n.putArray("partitions")
        // sorted for a deterministic document (map order is not)
        m.toList.sortBy(_._1.toHivePath).foreach { case (p, v) =>
          val e = mapper.createObjectNode()
          e.put("partition", p.toHivePath) // Hive-escaped, like v2 commit docs
          e.put("version", v.label)
          parts.add(e)
        }
    }
    n
  }

  private def versionStateFromNode(n: JsonNode): Either[String, TableVersion] =
    str(n, "type").flatMap {
      case "snapshot" =>
        str(n, "version").flatMap(Version.parse).map(SnapshotTableVersion.apply)
      case "partitioned" =>
        for {
          parts <- Option(n.get("partitions")).collect { case a: ArrayNode => a }
            .toRight("missing 'partitions' array")
          entries <- sequence(parts.elements().asScala.toList.map { e =>
            for {
              p <- str(e, "partition").flatMap(Partition.parseEscaped)
              v <- str(e, "version").flatMap(Version.parse)
            } yield p -> v
          })
        } yield PartitionedTableVersion(entries.toMap)
      case other => Left(s"Unknown version-state type: '$other'")
    }

  private def opToNode(op: TableOperation): ObjectNode = {
    val n = mapper.createObjectNode()
    op match {
      case TableOperation.InitTable(table, isSnapshot) =>
        n.put("type", "init-table")
        n.put("table", table.fullyQualifiedName)
        n.put("isSnapshot", isSnapshot)
      case TableOperation.AddTableVersion(version) =>
        n.put("type", "add-table-version")
        n.put("version", version.label)
      // Hive-escaped form: total round-trip for values containing '=', '/',
      // or other path-special characters (identical to raw for safe values)
      case TableOperation.AddPartitionVersion(partition, version) =>
        n.put("type", "add-partition-version")
        n.put("partition", partition.toHivePath)
        n.put("version", version.label)
      case TableOperation.RemovePartition(partition) =>
        n.put("type", "remove-partition")
        n.put("partition", partition.toHivePath)
      case TableOperation.SetTableSchema(json) =>
        n.put("type", "set-table-schema")
        n.put("schema", json)
      case TableOperation.SetVersionBase(partition, version, base) =>
        n.put("type", "set-version-base")
        n.put("partition", partition.toHivePath)
        n.put("version", version.label)
        n.put("base", base.label)
    }
    n
  }

  def metadataToJson(isSnapshot: Boolean): String = {
    val root = mapper.createObjectNode()
    root.put("isSnapshot", isSnapshot)
    mapper.writeValueAsString(root)
  }

  // ---- decode ----

  def fromJson(json: String): Either[String, TableUpdate] =
    try fromNode(mapper.readTree(json))
    catch {
      case e: Exception => Left(s"Invalid commit JSON: ${e.getMessage}")
    }

  private def fromNode(root: JsonNode): Either[String, TableUpdate] =
    try {
      if (root.has("commit_id")) fromReferenceNode(root)
      else
        for {
          escaped <- Option(root.get("formatVersion")).map(_.asInt) match {
            case Some(FormatVersion) => Right(true)
            case None                => Right(false) // graft v1: raw partition values
            case Some(other) =>
              Left(s"unsupported commit formatVersion $other (this build reads v$FormatVersion and below)")
          }
          id <- str(root, "id")
          userId <- str(root, "userId")
          message <- str(root, "message")
          tsStr <- str(root, "timestamp")
          ts <- parseInstant(tsStr)
          opsNode <- Option(root.get("operations")).collect { case a: ArrayNode => a }
            .toRight("missing 'operations' array")
          ops <- sequence(opsNode.elements().asScala.toList.map(opFromNode(_, escaped)))
        } yield TableUpdate(TableUpdateMetadata(CommitId(id), UserId(userId), message, ts), ops)
    } catch {
      case e: Exception => Left(s"Invalid commit JSON: ${e.getMessage}")
    }

  /** Decode the reference's chronicles commit document (snake_case fields,
    * raw partition strings). Read-only interop: graft never WRITES this shape. */
  private def fromReferenceNode(root: JsonNode): Either[String, TableUpdate] =
    for {
      id <- str(root, "commit_id")
      userId <- str(root, "user_id")
      message <- str(root, "message")
      tsStr <- str(root, "timestamp")
      ts <- parseInstant(tsStr)
      opsNode <- Option(root.get("operations")).collect { case a: ArrayNode => a }
        .toRight("missing 'operations' array")
      ops <- sequence(opsNode.elements().asScala.toList.map(refOpFromNode))
    } yield TableUpdate(TableUpdateMetadata(CommitId(id), UserId(userId), message, ts), ops)

  private def refOpFromNode(n: JsonNode): Either[String, TableOperation] =
    str(n, "type").flatMap {
      case "init-table" =>
        for {
          t <- str(n, "table_name").flatMap(TableName.parse)
          snap <- Option(n.get("is_snapshot")).map(_.asBoolean).toRight("missing is_snapshot")
        } yield TableOperation.InitTable(t, snap)
      case "add-table-version" =>
        str(n, "version").flatMap(Version.parse).map(TableOperation.AddTableVersion)
      case "add-partition-version" =>
        for {
          p <- str(n, "partition").flatMap(Partition.parse)
          v <- str(n, "version").flatMap(Version.parse)
        } yield TableOperation.AddPartitionVersion(p, v)
      case "remove-partition" =>
        str(n, "partition").flatMap(Partition.parse).map(TableOperation.RemovePartition)
      case other => Left(s"Unknown operation type: '$other'")
    }

  private def opFromNode(n: JsonNode, escaped: Boolean): Either[String, TableOperation] = {
    def partition(s: String): Either[String, Partition] =
      if (escaped) Partition.parseEscaped(s) else Partition.parse(s)
    str(n, "type").flatMap {
      case "init-table" =>
        for {
          t <- str(n, "table").flatMap(TableName.parse)
          snap <- Option(n.get("isSnapshot")).map(_.asBoolean).toRight("missing isSnapshot")
        } yield TableOperation.InitTable(t, snap)
      case "add-table-version" =>
        str(n, "version").flatMap(Version.parse).map(TableOperation.AddTableVersion)
      case "add-partition-version" =>
        for {
          p <- str(n, "partition").flatMap(partition)
          v <- str(n, "version").flatMap(Version.parse)
        } yield TableOperation.AddPartitionVersion(p, v)
      case "remove-partition" =>
        str(n, "partition").flatMap(partition).map(TableOperation.RemovePartition)
      case "set-table-schema" =>
        str(n, "schema").map(TableOperation.SetTableSchema.apply)
      case "set-version-base" =>
        for {
          p <- str(n, "partition").flatMap(partition)
          v <- str(n, "version").flatMap(Version.parse)
          b <- str(n, "base").flatMap(Version.parse)
        } yield TableOperation.SetVersionBase(p, v, b)
      case other => Left(s"Unknown operation type: '$other'")
    }
  }

  /** Decode the reference's head/state file `{"head_ref": "<commit id>"}`
    * (`JsonCodecs.scala:127-134` in the reference). */
  def chroniclesHeadFromJson(json: String): Either[String, String] =
    try {
      val root = mapper.readTree(json)
      str(root, "head_ref")
    } catch {
      case e: Exception => Left(s"Invalid head_ref JSON: ${e.getMessage}")
    }

  /** Accepts graft's `isSnapshot` and the reference's `is_snapshot`
    * (`JsonCodecs.scala:18-25` in the reference). */
  def metadataFromJson(json: String): Either[String, Boolean] =
    try {
      val root = mapper.readTree(json)
      Option(root.get("isSnapshot")).orElse(Option(root.get("is_snapshot")))
        .map(_.asBoolean).toRight("missing isSnapshot")
    } catch {
      case e: Exception => Left(s"Invalid metadata JSON: ${e.getMessage}")
    }

  private def str(n: JsonNode, field: String): Either[String, String] =
    Option(n.get(field)).filter(_.isTextual).map(_.asText).toRight(s"missing string field '$field'")

  private def parseInstant(s: String): Either[String, Instant] =
    try Right(Instant.parse(s))
    catch { case e: Exception => Left(s"bad timestamp '$s': ${e.getMessage}") }

  private def sequence[A](xs: List[Either[String, A]]): Either[String, List[A]] =
    xs.partitionMap(identity) match {
      case (Nil, oks) => Right(oks)
      case (errs, _)  => Left(errs.mkString("; "))
    }
}
