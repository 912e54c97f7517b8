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
 *  - the target must be on the SAME filesystem as the table location
 *    (scheme + authority — an equal path on another bucket/namenode is a
 *    forgery, not a match);
 *  - the target path must sit strictly UNDER the table location — compared
 *    with a path-boundary slash, so a sibling directory sharing the prefix
 *    (`/warehouse/events_archive` vs `/warehouse/events`) is refused.
 */
object VersionJanitor {

  final case class DeleteOutcome(deleted: List[URI], failed: List[(URI, String)])

  def deleteVersionDirs(conf: Configuration, location: URI, targets: List[URI]): DeleteOutcome = {
    val rootPath = location.getPath.stripSuffix("/")
    def fsId(u: URI): (String, String) =
      (Option(u.getScheme).getOrElse(""), Option(u.getAuthority).getOrElse(""))
    targets.foldLeft(DeleteOutcome(Nil, Nil)) { case (acc, uri) =>
      // report URIs carry a trailing slash — normalize before the checks
      val path = uri.getPath.stripSuffix("/")
      val leaf = path.substring(path.lastIndexOf('/') + 1)
      if (!leaf.startsWith(VersionPaths.VersionDirPrefix))
        acc.copy(failed = acc.failed :+ (uri -> "refusing: not a _version directory"))
      else if (fsId(uri) != fsId(location))
        acc.copy(failed = acc.failed :+ (uri -> s"refusing: different filesystem than $location"))
      else if (!path.startsWith(rootPath + "/"))
        acc.copy(failed = acc.failed :+ (uri -> s"refusing: not under $location"))
      else {
        // rebuild the URI WITH its authority (bucket/namenode) — the
        // multi-arg constructor re-encodes the decoded path correctly even
        // when partition values contain '%'
        val p = new Path(new URI(uri.getScheme, uri.getAuthority, path, null, null))
        try {
          val fs = p.getFileSystem(conf)
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
