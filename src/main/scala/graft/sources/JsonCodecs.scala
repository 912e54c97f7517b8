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
   * raw values, so a v1 commit whose value contains a literal `%XX` sequence
   * would silently decode differently under the v2 rules. Decoding therefore
   * refuses unmarked files loudly instead of guessing.
   */
  val FormatVersion = 2

  private val mapper = new ObjectMapper()

  // ---- encode ----

  def toJson(update: TableUpdate): String = {
    val root = mapper.createObjectNode()
    root.put("formatVersion", FormatVersion)
    root.put("id", update.metadata.id.id)
    root.put("userId", update.metadata.userId.value)
    root.put("message", update.metadata.message)
    root.put("timestamp", update.metadata.timestamp.toString)
    val ops = root.putArray("operations")
    update.operations.foreach(op => ops.add(opToNode(op)))
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
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
    try {
      val root = mapper.readTree(json)
      for {
        _ <- Option(root.get("formatVersion")).map(_.asInt) match {
          case Some(FormatVersion) => Right(())
          case Some(other) =>
            Left(s"unsupported commit formatVersion $other (this build reads v$FormatVersion)")
          case None =>
            Left("commit file has no formatVersion: written by a pre-v2 build " +
              "whose partition encoding was raw (not Hive-escaped); refusing to " +
              "decode under v2 rules — re-create the store or migrate the log")
        }
        id <- str(root, "id")
        userId <- str(root, "userId")
        message <- str(root, "message")
        tsStr <- str(root, "timestamp")
        ts <- parseInstant(tsStr)
        opsNode <- Option(root.get("operations")).collect { case a: ArrayNode => a }
          .toRight("missing 'operations' array")
        ops <- sequence(opsNode.elements().asScala.toList.map(opFromNode))
      } yield TableUpdate(TableUpdateMetadata(CommitId(id), UserId(userId), message, ts), ops)
    } catch {
      case e: Exception => Left(s"Invalid commit JSON: ${e.getMessage}")
    }

  private def opFromNode(n: JsonNode): Either[String, TableOperation] =
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
          p <- str(n, "partition").flatMap(Partition.parseEscaped)
          v <- str(n, "version").flatMap(Version.parse)
        } yield TableOperation.AddPartitionVersion(p, v)
      case "remove-partition" =>
        str(n, "partition").flatMap(Partition.parseEscaped).map(TableOperation.RemovePartition)
      case other => Left(s"Unknown operation type: '$other'")
    }

  def metadataFromJson(json: String): Either[String, Boolean] =
    try {
      val root = mapper.readTree(json)
      Option(root.get("isSnapshot")).map(_.asBoolean).toRight("missing isSnapshot")
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
