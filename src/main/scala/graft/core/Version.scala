package graft.core

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.UUID
import java.util.concurrent.atomic.AtomicReference

/**
 * A unique version of (a partition of) a table.
 *
 * Label format pinned by the reference
 * (`core/src/main/scala/dev/chronicles/core/Version.scala:137-187`):
 * `yyyyMMdd-HHmmss.nnnnnnnnn-<uuid>`, e.g.
 * `20181102-235912.987654321-4920d06f-2233-4b4a-9521-8e730eee89c5`.
 * The sentinel [[Version.Unversioned]] (empty label) marks pre-adoption data
 * (Version.scala:141-144, 158).
 */
final case class Version(timestamp: Instant, uuid: UUID) {
  def label: String =
    if (this == Version.Unversioned) ""
    else Version.TimestampFormat.format(timestamp.atOffset(ZoneOffset.UTC)) + "-" + uuid.toString
}

object Version {

  /** Sortable timestamp pattern shared by version labels and commit-file names. */
  val TimestampFormat: DateTimeFormatter =
    DateTimeFormatter.ofPattern("yyyyMMdd-HHmmss.nnnnnnnnn")

  /** Sentinel for data that predates version tracking (empty label). */
  val Unversioned: Version = Version(Instant.EPOCH, new UUID(0L, 0L))

  /** Directory-name key used below the Hive partition path. */
  val VersionColumn: String = "_version"

  private val LabelRegex =
    "(\\d{8}-\\d{6}\\.\\d{9})-([0-9a-fA-F-]{36})".r

  def parse(label: String): Either[String, Version] =
    if (label.isEmpty) Right(Unversioned)
    else
      label match {
        case LabelRegex(ts, uuid) =>
          try {
            val instant = java.time.LocalDateTime
              .parse(ts, TimestampFormat)
              .toInstant(ZoneOffset.UTC)
            Right(Version(instant, UUID.fromString(uuid)))
          } catch {
            case e: Exception => Left(s"Invalid version label '$label': ${e.getMessage}")
          }
        case _ => Left(s"Invalid version label: '$label'")
      }

  /** Generate a fresh version from the wall clock + a random UUID, with a
    * strictly-increasing timestamp so that labels sort in generation order
    * even within one nanosecond tick (reference MonotonicClock.scala:200-216). */
  def generate(): Version = Version(MonotonicClock.nextUniqueInstant(), UUID.randomUUID())

  /** UUID "version" nibble reserved for DELETION-VECTOR versions. Standard
    * UUIDs use 1-8 (random UUIDs are 4), so the flag can never collide with
    * a [[generate]]d label or one imported from a chronicles store — and it
    * rides inside the label's existing wire format, so every codec, store
    * and path builder carries it unchanged. The flag is what lets a reader
    * decide "does this version dir hold data files or a deletion sidecar?"
    * with ZERO I/O, making a DV-unaware read path impossible by
    * construction (the central read resolves flagged versions through
    * their `_base.json`; see graft.operators.DeleteVectors). */
  private val DvUuidVersion = 0xD

  /** Generate a fresh DELETION-VECTOR version label: [[generate]] with the
    * UUID version nibble forced to the reserved [[DvUuidVersion]]. */
  def generateDeleteMarker(): Version = {
    val v = generate()
    val msb = (v.uuid.getMostSignificantBits & ~0x000000000000F000L) |
      (DvUuidVersion.toLong << 12)
    Version(v.timestamp, new UUID(msb, v.uuid.getLeastSignificantBits))
  }

  /** Whether `v` is a deletion-vector version (its directory holds a
    * deletion sidecar, not data files). Pure bit check — no I/O. */
  def isDeleteMarker(v: Version): Boolean =
    v != Unversioned && v.uuid.version() == DvUuidVersion
}

/** Strictly-monotonic wall clock: never returns the same or an earlier
  * instant twice within this JVM. */
object MonotonicClock {
  private val last = new AtomicReference[Instant](Instant.EPOCH)

  def nextUniqueInstant(): Instant =
    last.updateAndGet { prev =>
      val now = Instant.now()
      if (now.isAfter(prev)) now else prev.plusNanos(1000)
    }
}
