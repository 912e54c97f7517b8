package graft

import java.nio.file.{Files, Path}

/** Temp roots for the memoized query fixtures (versioned-table builds,
  * index builds, z-order rewrites). The fixture caches are keyed by
  * (SparkSession, sfDir) and live for the JVM — correct for a bench/verify
  * main, but each entry carries an on-disk table copy, and a bench RETRY
  * adds a whole second set under a fresh session. Registering every root
  * here bounds the debris to the JVM's lifetime: one shutdown hook removes
  * them all, so back-to-back driver runs don't accumulate table copies in
  * /tmp. (In-JVM eviction would be wrong — a cached DataFrame's plan still
  * reads its fixture's files.) */
object FixtureTempDirs {

  private val roots = java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()

  private val hook = new Thread(() => {
    roots.forEach { root =>
      try {
        Files.walk(root)
          .sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
      } catch { case _: Exception => () }
    }
  }, "graft-fixture-tempdir-cleanup")
  Runtime.getRuntime.addShutdownHook(hook)

  /** `Files.createTempDirectory(prefix)` + registration for exit cleanup. */
  def create(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    roots.add(p)
    p
  }
}
