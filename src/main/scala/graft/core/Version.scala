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
