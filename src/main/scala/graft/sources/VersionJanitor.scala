package graft.sources

import graft.core.VersionPaths
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import java.net.URI

/**
 * The delete half of the vacuum lifecycle, shared by the engine
 * ([[graft.operators.VersionedTables.vacuum]]) and the CLI (`graft-cli
 * vacuum --apply`) so the safety rules exist exactly once. Spark-free —
 * plain Hadoop FileSystem.
 *
 * Defense in depth per target (a corrupted report can refuse, never
 * over-delete):
 *  - the leaf must be a `_version=` directory;
 *  - no `.`/`..` path segments — `startsWith` is lexical, and Hadoop
 *    resolves dot segments at delete time, so an uncanonical path could
 *    otherwise escape the table root;
 *  - the target must be on the SAME filesystem as the (Hadoop-qualified)
 *    table location — scheme + authority; an equal path on another bucket or
 *    namenode is a forgery, not a match. Scheme-less targets resolve against
 *    the same default filesystem as a scheme-less location and are accepted;
 *  - the target path must sit strictly UNDER the table location — compared
 *    with a path-boundary slash, so a sibling directory sharing the prefix
 *    (`/warehouse/events_archive` vs `/warehouse/events`) is refused.
 */
object VersionJanitor {

  final case class DeleteOutcome(deleted: List[URI], failed: List[(URI, String)])

  def deleteVersionDirs(conf: Configuration, location: URI, targets: List[URI]): DeleteOutcome = {
    if (location.isOpaque || location.getPath == null)
      return DeleteOutcome(Nil,
        targets.map(_ -> s"refusing all: table location '$location' is not a hierarchical URI"))
    // qualify the location ONCE: a scheme-less location gets the default
    // filesystem's scheme/authority, so report URIs that Hadoop already
    // qualified (e.g. file:/...) still compare equal
    val fs = new Path(location).getFileSystem(conf)
    val rootUri = fs.makeQualified(new Path(location)).toUri
    val rootPath = rootUri.getPath.stripSuffix("/")
    def fsId(u: URI): (String, String) =
      (Option(u.getScheme).getOrElse(""), Option(u.getAuthority).getOrElse(""))
    val rootId = fsId(rootUri)

    targets.foldLeft(DeleteOutcome(Nil, Nil)) { case (acc, uri) =>
      // report URIs carry a trailing slash — normalize before the checks
      val path = Option(uri.getPath).getOrElse("").stripSuffix("/")
      val segments = path.split('/')
      val leaf = if (segments.nonEmpty) segments.last else ""
      val targetId = fsId(uri)
      if (!leaf.startsWith(VersionPaths.VersionDirPrefix))
        acc.copy(failed = acc.failed :+ (uri -> "refusing: not a _version directory"))
      else if (segments.exists(s => s == "." || s == ".."))
        acc.copy(failed = acc.failed :+ (uri -> "refusing: dot segments in path"))
      else if (targetId != rootId && targetId != ("", ""))
        acc.copy(failed = acc.failed :+ (uri -> s"refusing: different filesystem than $rootUri"))
      else if (!path.startsWith(rootPath + "/"))
        acc.copy(failed = acc.failed :+ (uri -> s"refusing: not under $rootUri"))
      else {
        // rebuild with the ROOT's scheme+authority (same filesystem by the
        // check above) — the multi-arg constructor re-encodes the decoded
        // path correctly even when partition values contain '%'
        val p = new Path(new URI(rootUri.getScheme, rootUri.getAuthority, path, null, null))
        try {
          if (!fs.exists(p) || fs.delete(p, true)) acc.copy(deleted = acc.deleted :+ uri)
          else acc.copy(failed = acc.failed :+ (uri -> "filesystem delete returned false"))
        } catch {
          case e: java.io.IOException =>
            acc.copy(failed = acc.failed :+ (uri -> e.toString))
        }
      }
    }
  }
}
