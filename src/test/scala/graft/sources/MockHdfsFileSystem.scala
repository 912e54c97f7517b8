package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{DelegateToFileSystem, FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

import java.net.URI

/**
 * A local-disk Hadoop `FileSystem` registered under the NON-`file` scheme
 * `mockhdfs`, so `FileBackedVersionTracker.isLocalFs` is false and the
 * tracker runs its Hadoop/remote-FS I/O branch end to end: `fs.create`
 * writes, `fs.open` reads, `FileContext` OVERWRITE renames (the
 * delete-then-rename whose visibility window `readWithRetry` closes), and
 * the Hadoop-side lock create/break/release.
 *
 * The one semantic HDFS/S3 provides that a raw local `FileSystem` does not
 * is an ATOMIC `create(overwrite = false)` (HDFS serializes it at the
 * NameNode; Hadoop's local implementation is check-then-create). The
 * override below restores that guarantee with an O_EXCL claim, so the
 * cross-process lock tests exercise the Hadoop branch under the same
 * atomicity contract the production stores give it — without it the test
 * would probe a weaker store than any the branch actually targets.
 */
class MockHdfsFileSystem extends RawLocalFileSystem {
  override def getScheme: String = MockHdfsFileSystem.Scheme
  override def getUri: URI = MockHdfsFileSystem.Name

  /** The atomic `overwrite = false` claim (O_EXCL). RawLocalFileSystem routes
    * different `FileSystem.create` entry points through BOTH public variants
    * below without funnelling one into the other, so each must claim — the
    * first version of this class overrode only the permission variant, and
    * `fs.create(p, false)` (the tracker's lock create) bypassed it straight
    * into check-then-create, which the dual-branch multi-process race
    * promptly caught as a double CAS winner. */
  private def claimExclusive(f: Path): Unit = {
    val local = pathToFile(f).toPath
    try java.nio.file.Files.createFile(local)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
      case _: java.nio.file.NoSuchFileException =>
        // parent missing: match FileSystem semantics (create parents), then claim
        java.nio.file.Files.createDirectories(local.getParent)
        java.nio.file.Files.createFile(local)
    }
    ()
  }

  override def create(
      f: Path,
      permission: FsPermission,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (!overwrite) {
      claimExclusive(f)
      // the claim IS the exclusive create; open the now-existing file for write
      super.create(f, permission, true, bufferSize, replication, blockSize, progress)
    } else super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)

  override def create(
      f: Path,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (!overwrite) {
      claimExclusive(f)
      super.create(f, true, bufferSize, replication, blockSize, progress)
    } else super.create(f, overwrite, bufferSize, replication, blockSize, progress)
}

/** `AbstractFileSystem` binding for the same scheme, so
  * `FileContext.getFileContext(mockhdfs-uri)` resolves — this is the API the
  * tracker's `writeAtomic` uses for its OVERWRITE rename on non-local stores. */
final class MockHdfsAbstractFileSystem(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new MockHdfsFileSystem, conf, MockHdfsFileSystem.Scheme, false)

/**
 * [[MockHdfsFileSystem]] plus deterministic fault injection, under its own
 * scheme `faulthdfs`. The one failure mode the Hadoop branch's
 * `readWithRetry` exists for is the OVERWRITE-rename visibility window: on a
 * non-POSIX store the head swap is delete-then-rename, so a reader in
 * another process can observe the head file ABSENT for a moment. That window
 * is microseconds wide in the real store — too narrow to hit reliably from a
 * test — so this filesystem fakes the reader's view of it: while armed, the
 * next `n` opens of the targeted file name throw `FileNotFoundException`
 * exactly as a mid-rename reader would see, then reads flow normally
 * (the rename "completed"). Chaos specs assert the retry loop crosses the
 * gap, and gives up loudly when the gap never closes.
 */
final class FaultyHdfsFileSystem extends MockHdfsFileSystem {
  override def getScheme: String = FaultyHdfsFileSystem.Scheme
  override def getUri: URI = FaultyHdfsFileSystem.Name

  override def open(f: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    FaultyHdfsFileSystem.maybeFail(f)
    super.open(f, bufferSize)
  }
}

/** `AbstractFileSystem` binding, so the tracker's `FileContext` rename
  * resolves over the faulty scheme too. */
final class FaultyHdfsAbstractFileSystem(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new FaultyHdfsFileSystem, conf, FaultyHdfsFileSystem.Scheme, false)

object FaultyHdfsFileSystem {
  val Scheme = "faulthdfs"
  val Name: URI = URI.create(s"$Scheme:///")

  // fault plan (static: FileSystem.get caches instances per scheme, so the
  // spec and the cached filesystem must share state). Armed per test, always
  // disarmed in a finally.
  @volatile private var targetName: String = ""
  private val remaining = new java.util.concurrent.atomic.AtomicInteger(0)
  /** Faults actually delivered since the last [[armOpenFaults]] — lets a
    * spec assert the gap really was observed, not silently missed. */
  val faultsInjected = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The next `n` opens of any path named `fileName` throw
    * `FileNotFoundException` (the mid-rename reader's view). */
  def armOpenFaults(fileName: String, n: Int): Unit = {
    targetName = fileName
    faultsInjected.set(0)
    remaining.set(n)
  }

  def disarm(): Unit = remaining.set(0)

  private[sources] def maybeFail(f: Path): Unit =
    if (f.getName == targetName &&
        remaining.getAndUpdate(b => if (b > 0) b - 1 else 0) > 0) {
      faultsInjected.incrementAndGet()
      throw new java.io.FileNotFoundException(s"[injected mid-rename gap] $f")
    }

  def conf(): Configuration = {
    val c = new Configuration()
    c.set(s"fs.$Scheme.impl", classOf[FaultyHdfsFileSystem].getName)
    c.set(s"fs.AbstractFileSystem.$Scheme.impl", classOf[FaultyHdfsAbstractFileSystem].getName)
    c
  }

  /** A faulthdfs:// URI over a local directory. */
  def uriFor(dir: java.nio.file.Path): URI = URI.create(s"$Scheme:${dir.toAbsolutePath}")
}

object MockHdfsFileSystem {
  val Scheme = "mockhdfs"
  val Name: URI = URI.create(s"$Scheme:///")

  /** Configuration that binds both APIs for the scheme. */
  def conf(): Configuration = {
    val c = new Configuration()
    c.set(s"fs.$Scheme.impl", classOf[MockHdfsFileSystem].getName)
    c.set(s"fs.AbstractFileSystem.$Scheme.impl", classOf[MockHdfsAbstractFileSystem].getName)
    c
  }

  /** Conf appropriate for a root URI — mockhdfs bindings for mockhdfs roots,
    * plain defaults otherwise (used by the forked multi-process workers). */
  def confFor(uri: URI): Configuration =
    if (uri.getScheme == Scheme) conf() else new Configuration()

  /** A mockhdfs:// URI over a local directory. */
  def uriFor(dir: java.nio.file.Path): URI = URI.create(s"$Scheme:${dir.toAbsolutePath}")
}
