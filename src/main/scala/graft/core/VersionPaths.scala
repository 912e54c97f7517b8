package graft.core

import java.net.URI

/**
 * Codec between table/partition base paths and versioned paths.
 *
 * Versioned layout (reference `VersionPaths.scala:12-57`, docs/concepts.md:50-57):
 * one extra `_version=<label>` directory level below the Hive partition path:
 * {{{
 *   <table>/date=2019-03-13/_version=20190313-235900.123456789-<uuid>/part-*.parquet
 *   <table>/_version=<label>/part-*.parquet            // snapshot tables
 * }}}
 */
object VersionPaths {

  val VersionDirPrefix: String = Version.VersionColumn + "="

  /** Append the version directory to a base (table or partition) path.
    * [[Version.Unversioned]] maps to the base path itself — pre-adoption data
    * lives unversioned at the original location (reference VersionPaths.scala:18-25). */
  def pathFor(basePath: URI, version: Version): URI =
    if (version == Version.Unversioned) basePath
    else Partition.normalizedUri(basePath).resolve(VersionDirPrefix + version.label + "/")

  /** Resolve the versioned path of every partition of a table. */
  def resolveVersionedPartitionPaths(
      partitionVersions: Map[Partition, Version],
      tableLocation: URI): Map[Partition, URI] =
    partitionVersions.map { case (partition, version) =>
      partition -> pathFor(partition.resolvePath(tableLocation), version)
    }

  /** Recover the Version from a location URI; `Unversioned` if the final
    * path element is not a `_version=` directory (reference VersionPaths.scala:30-41). */
  def parseVersion(location: URI): Version = {
    val lastElement = stripTrailingSlash(location.toString).split("/").lastOption.getOrElse("")
    if (lastElement.startsWith(VersionDirPrefix))
      Version.parse(lastElement.stripPrefix(VersionDirPrefix)).getOrElse(Version.Unversioned)
    else Version.Unversioned
  }

  /** Strip a trailing `_version=` element, yielding the base path
    * (reference VersionPaths.scala:46-57). */
  def versionedToBasePath(location: URI): URI = {
    val str = stripTrailingSlash(location.toString)
    val idx = str.lastIndexOf("/")
    if (idx >= 0 && str.substring(idx + 1).startsWith(VersionDirPrefix))
      new URI(str.substring(0, idx + 1))
    else location
  }

  private def stripTrailingSlash(s: String): String =
    if (s.endsWith("/")) s.dropRight(1) else s
}
