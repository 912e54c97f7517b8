package graft.sources

import graft.core._
import java.nio.file.Files
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class FileBackedVersionTrackerSpec extends VersionTrackerContract {
  override def newTracker(): VersionTracker = {
    val dir = Files.createTempDirectory("graft-tracker-").toUri
    new FileBackedVersionTracker(dir)
  }
}

/** The same contract over the tracker's Hadoop/remote-FS I/O branch: a
  * `mockhdfs://`-scheme store ([[MockHdfsFileSystem]]) disables the NIO
  * local fast path, so `fs.create` writes, Hadoop reads, the `FileContext`
  * OVERWRITE head rename, and Hadoop lock handling — the code that runs on
  * HDFS/S3A in production — are pinned by every contract law, not just by
  * the `file://` fast path the other specs take. */
class FileBackedVersionTrackerHadoopIoSpec extends VersionTrackerContract {
  override def newTracker(): VersionTracker = {
    val dir = Files.createTempDirectory("graft-hadoop-tracker-")
    new FileBackedVersionTracker(MockHdfsFileSystem.uriFor(dir), MockHdfsFileSystem.conf())
  }
}

/** Reopen-from-disk persistence over the Hadoop branch (same law as
  * [[FileBackedPersistenceSpec]] runs on the NIO branch). */
class FileBackedHadoopIoPersistenceSpec extends AnyFlatSpec with Matchers {
  "FileBackedVersionTracker (hadoop io)" should "survive a reopen" in {
    val dir = Files.createTempDirectory("graft-hadoop-reopen-")
    val uri = MockHdfsFileSystem.uriFor(dir)
    val t = TableName("test", "t")
    val p = Partition("date", "2019-01-01")
    val v = Version.generate()

    val tr1 = new FileBackedVersionTracker(uri, MockHdfsFileSystem.conf())
    tr1.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())
    tr1.commit(t, TableUpdate(UserId("u"), "add", java.time.Instant.now(),
      List(TableOperation.AddPartitionVersion(p, v))))

    val tr2 = new FileBackedVersionTracker(uri, MockHdfsFileSystem.conf())
    tr2.tables() shouldBe List(t)
    tr2.currentVersion(t) shouldBe PartitionedTableVersion(Map(p -> v))
    tr2.updates(t).map(_.message) shouldBe List("add", "init")
    // and the NIO branch reads the same store identically (layout parity)
    new FileBackedVersionTracker(dir.toUri).updates(t).map(_.message) shouldBe List("add", "init")
  }
}

/**
 * Chaos specs for the Hadoop branch's failure windows. The OVERWRITE head
 * rename on a non-POSIX store is delete-then-rename, so a reader in another
 * process can catch the head file ABSENT mid-swap; `readWithRetry` exists to
 * cross exactly that gap. The window is microseconds wide in the real store,
 * so [[FaultyHdfsFileSystem]] fakes the reader's view deterministically:
 * armed, the next n opens of the targeted file throw FileNotFoundException.
 */
class HadoopIoFailureWindowSpec extends AnyFlatSpec with Matchers {

  private def newFaultyTracker(): (FileBackedVersionTracker, TableName) = {
    val dir = Files.createTempDirectory("graft-faulty-")
    val tr = new FileBackedVersionTracker(FaultyHdfsFileSystem.uriFor(dir), FaultyHdfsFileSystem.conf())
    val t = TableName("chaos", "t")
    tr.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())
    tr.commit(t, TableUpdate(UserId("u"), "add", java.time.Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("date", "2024-01-01"), Version.generate()))))
    (tr, t)
  }

  "the Hadoop head-swap visibility window" should "be crossed by readWithRetry: a reader observing the gap recovers" in {
    val (tr, t) = newFaultyTracker()
    val head = tr.currentRef(t) // un-faulted baseline
    FaultyHdfsFileSystem.armOpenFaults(FileBackedVersionTracker.HeadFile, 2)
    try {
      // two consecutive opens see the file missing (mid-rename), the third
      // sees the re-created head — the reader must come back with the right
      // answer, not an exception and not a stale value
      tr.currentRef(t) shouldBe head
      FaultyHdfsFileSystem.faultsInjected.get() shouldBe 2 // the gap WAS observed
      // and the full state read (head + listing) recovers the same way
      FaultyHdfsFileSystem.armOpenFaults(FileBackedVersionTracker.HeadFile, 3)
      tr.tableState(t).currentVersion shouldBe head
      FaultyHdfsFileSystem.faultsInjected.get() shouldBe 3
    } finally FaultyHdfsFileSystem.disarm()
  }

  it should "give up LOUDLY when the gap never closes (bounded retry, no hang)" in {
    val (tr, t) = newFaultyTracker()
    FaultyHdfsFileSystem.armOpenFaults(FileBackedVersionTracker.HeadFile, 1000)
    try {
      val e = intercept[java.io.FileNotFoundException](tr.currentRef(t))
      e.getMessage should include("injected mid-rename gap")
      // 1 initial attempt + 5 retries, then the failure propagates — the
      // retry budget is finite (a permanently missing head is a corrupt
      // store, not a rename window)
      FaultyHdfsFileSystem.faultsInjected.get() shouldBe 6
    } finally FaultyHdfsFileSystem.disarm()
  }

  "a torn (partially written) commit document" should "fail loudly on read, both I/O branches" in {
    // graft never tears its own files (temp + rename everywhere); a torn
    // document models a crashed FOREIGN writer or filesystem damage. The
    // contract is loud refusal at parse time, naming the file — never a
    // silent misparse folded into table state.
    val cases = List[(String, java.nio.file.Path => VersionTracker)](
      "nio" -> (dir => new FileBackedVersionTracker(dir.toUri)),
      "hadoop" -> (dir => new FileBackedVersionTracker(MockHdfsFileSystem.uriFor(dir), MockHdfsFileSystem.conf())))
    cases.foreach { case (branch, mk) =>
      withClue(s"branch=$branch: ") {
        val dir = Files.createTempDirectory(s"graft-torn-$branch-")
        val tr = mk(dir)
        val t = TableName("chaos", "torn")
        tr.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())
        tr.commit(t, TableUpdate(UserId("u"), "add", java.time.Instant.now(),
          List(TableOperation.AddPartitionVersion(Partition("date", "2024-01-01"), Version.generate()))))

        // truncate the newest commit file mid-document: valid prefix, torn tail
        val tableDir = dir.resolve("_graft_table_chaos.torn")
        val newest = Files.list(tableDir).iterator()
        val commitFile = scala.jdk.CollectionConverters.IteratorHasAsScala(newest).asScala
          .map(_.getFileName.toString).filter(_.startsWith("table_update_")).toList.sorted.last
        val p = tableDir.resolve(commitFile)
        val bytes = Files.readAllBytes(p)
        Files.write(p, java.util.Arrays.copyOf(bytes, bytes.length / 2))

        val e = intercept[RuntimeException](mk(dir).tableState(t))
        e.getMessage should include("Corrupt commit file")
        e.getMessage should include(commitFile)
      }
    }
  }

  it should "surface a torn head ref as an unknown-commit failure, not a silent fold" in {
    val dir = Files.createTempDirectory("graft-torn-head-")
    val tr = new FileBackedVersionTracker(MockHdfsFileSystem.uriFor(dir), MockHdfsFileSystem.conf())
    val t = TableName("chaos", "head")
    tr.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())
    tr.commit(t, TableUpdate(UserId("u"), "add", java.time.Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("date", "2024-01-01"), Version.generate()))))
    // tear the head file: half a commit id survives
    val headPath = dir.resolve("_graft_table_chaos.head").resolve(FileBackedVersionTracker.HeadFile)
    val bytes = Files.readAllBytes(headPath)
    Files.write(headPath, java.util.Arrays.copyOf(bytes, bytes.length / 2))
    // a fresh reader must refuse the torn ref (it matches no commit), never
    // silently fold the full history as if the head were the newest commit
    intercept[UnknownCommitError] {
      new FileBackedVersionTracker(MockHdfsFileSystem.uriFor(dir), MockHdfsFileSystem.conf()).currentVersion(t)
    }
  }
}

/** Persistence-specific behavior beyond the shared contract. */
class FileBackedPersistenceSpec extends AnyFlatSpec with Matchers {

  "FileBackedVersionTracker" should "survive a reopen (state is on disk, not in memory)" in {
    val dir = Files.createTempDirectory("graft-reopen-").toUri
    val t = TableName("test", "t")
    val p = Partition("date", "2019-01-01")
    val v = Version.generate()

    val tr1 = new FileBackedVersionTracker(dir)
    tr1.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())
    tr1.commit(t, TableUpdate(UserId("u"), "add", java.time.Instant.now(),
      List(TableOperation.AddPartitionVersion(p, v))))

    val tr2 = new FileBackedVersionTracker(dir)
    tr2.tables() shouldBe List(t)
    tr2.currentVersion(t) shouldBe PartitionedTableVersion(Map(p -> v))
    tr2.updates(t).map(_.message) shouldBe List("add", "init")
  }

  it should "lay out the commit log as documented" in {
    val root = Files.createTempDirectory("graft-layout-")
    val tr = new FileBackedVersionTracker(root.toUri)
    val t = TableName("db", "tbl")
    tr.initTable(t, isSnapshot = true, UserId("u"), "init", java.time.Instant.now())
    tr.commit(t, TableUpdate(UserId("u"), "v1", java.time.Instant.now(),
      List(TableOperation.AddTableVersion(Version.generate()))))

    val tableDir = root.resolve("_graft_table_db.tbl")
    Files.exists(tableDir.resolve("table-metadata.json")) shouldBe true
    Files.exists(tableDir.resolve("head.json")) shouldBe true
    val commits = Files.list(tableDir).filter(_.getFileName.toString.startsWith("table_update_")).count()
    commits shouldBe 2
  }
}

/** Pins the in-process concurrency contract: commits to one table serialize
  * on a JVM-wide per-table-directory lock, so racing in-JVM writers all land
  * (commit-file order == head order, head = the last serialized commit) and
  * concurrent readers never observe a head id missing from the commit
  * listing. Writers in SEPARATE processes remain an orchestration concern
  * (reference README.md:53-55); the JDBC tracker is the serializable option. */
class FileBackedConcurrencySpec extends AnyFlatSpec with Matchers {

  "FileBackedVersionTracker" should "preserve every commit under concurrent writers" in {
    val dir = Files.createTempDirectory("graft-race-").toUri
    val tracker = new FileBackedVersionTracker(dir)
    val t = TableName("race", "t")
    tracker.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())

    val n = 16
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val latch = new java.util.concurrent.CountDownLatch(n)
    val readersDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    // concurrent READERS race the writers: currentVersion must never throw
    // (e.g. a head id not yet visible in the commit listing)
    val readerPool = java.util.concurrent.Executors.newFixedThreadPool(2)
    (1 to 2).foreach { _ =>
      readerPool.execute { () =>
        while (!readersDone.get()) {
          try tracker.currentVersion(t)
          catch { case e: Throwable => failures.add(e); readersDone.set(true) }
        }
      }
    }
    (1 to n).foreach { i =>
      pool.execute { () =>
        try tracker.commit(t, TableUpdate(UserId("u"), s"c$i", java.time.Instant.now(),
          List(TableOperation.AddPartitionVersion(Partition("day", f"d$i%02d"), Version.generate()))))
        catch { case e: Throwable => failures.add(e) }
        finally latch.countDown()
      }
    }
    latch.await()
    pool.shutdown()
    readersDone.set(true)
    readerPool.shutdown()
    readerPool.awaitTermination(10, java.util.concurrent.TimeUnit.SECONDS)

    failures.toArray shouldBe empty
    // no commit lost: all n land in history with distinct messages
    val messages = tracker.updates(t).map(_.message)
    messages should have size (n + 1).toLong
    messages.toSet should contain allElementsOf (1 to n).map(i => s"c$i")
    // state is a consistent fold up to whichever head won the race
    val st = tracker.tableState(t)
    tracker.currentVersion(t) shouldBe st.versionAt(st.currentVersion)
    // a fresh reader over the same directory sees the identical log
    new FileBackedVersionTracker(dir).updates(t).map(_.message) shouldBe messages
  }
}

class JsonCodecsSpec extends AnyFlatSpec with Matchers {

  "JsonCodecs" should "round-trip a commit with all four operation types" in {
    val update = TableUpdate(
      TableUpdateMetadata(CommitId("abc-123"), UserId("alice"), "msg with \"quotes\"\nand newline",
        java.time.Instant.parse("2019-03-13T23:59:00.123456789Z")),
      List(
        TableOperation.InitTable(TableName("s", "t"), isSnapshot = false),
        TableOperation.AddTableVersion(Version.generate()),
        TableOperation.AddPartitionVersion(
          Partition(ColumnValue(PartitionColumn("year"), "2019"), ColumnValue(PartitionColumn("month"), "01")),
          Version.generate()),
        TableOperation.RemovePartition(Partition("date", "2019-01-01"))))
    JsonCodecs.fromJson(JsonCodecs.toJson(update)) shouldBe Right(update)
  }

  it should "round-trip ARBITRARY commits (property: fromJson . toJson == id)" in {
    import org.scalacheck.Gen
    val nastyString: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar,
      3 -> Gen.oneOf("\"\\/{}[]:,\n\t\r '%=#".toList),
      1 -> Gen.oneOf('é', '中', '☃', '\u0000', '\u001f')
    )).map(_.mkString)
    val nonEmptyNasty: Gen[String] = nastyString.suchThat(_.nonEmpty)
    val genInstant: Gen[java.time.Instant] = for {
      s <- Gen.choose(0L, 4102444800L) // 1970..2100 (label format range)
      n <- Gen.choose(0L, 999999999L)
    } yield java.time.Instant.ofEpochSecond(s, n)
    val genVersion: Gen[Version] = Gen.frequency(
      9 -> (for { ts <- genInstant; hi <- Gen.long; lo <- Gen.long }
        yield Version(ts, new java.util.UUID(hi, lo))),
      1 -> Gen.const(Version.Unversioned))
    val genColName: Gen[String] = for {
      h <- Gen.alphaLowerChar
      t <- Gen.listOfN(4, Gen.frequency(5 -> Gen.alphaLowerChar, 2 -> Gen.numChar, 1 -> Gen.const('_')))
    } yield (h :: t).mkString
    val genPartition: Gen[Partition] = for {
      n <- Gen.choose(1, 3)
      cols <- Gen.listOfN(n, genColName)
      vals <- Gen.listOfN(n, nonEmptyNasty)
    } yield Partition(cols.distinct.zip(vals).map { case (c, v) => ColumnValue(PartitionColumn(c), v) })
    val genOp: Gen[TableOperation] = Gen.frequency(
      1 -> Gen.const(TableOperation.InitTable(TableName("s", "t"), isSnapshot = false)),
      2 -> genVersion.map(TableOperation.AddTableVersion(_)),
      5 -> (for { p <- genPartition; v <- genVersion } yield TableOperation.AddPartitionVersion(p, v)),
      2 -> genPartition.map(TableOperation.RemovePartition(_)))
    val genUpdate: Gen[TableUpdate] = for {
      user <- nastyString
      msg <- nastyString
      ts <- genInstant
      ops <- Gen.listOf(genOp)
    } yield TableUpdate(TableUpdateMetadata(
      CommitId(java.util.UUID.randomUUID().toString), UserId(user), msg, ts), ops)

    (1 to 200).foreach { seedNo =>
      val seed = org.scalacheck.rng.Seed(seedNo.toLong)
      genUpdate.apply(Gen.Parameters.default, seed).foreach { update =>
        withClue(s"seed $seedNo, update $update:\n") {
          JsonCodecs.fromJson(JsonCodecs.toJson(update)) shouldBe Right(update)
        }
      }
    }
  }

  it should "round-trip the Unversioned sentinel" in {
    val update = TableUpdate(
      TableUpdateMetadata(CommitId("c"), UserId("u"), "m", java.time.Instant.EPOCH),
      List(TableOperation.AddTableVersion(Version.Unversioned)))
    JsonCodecs.fromJson(JsonCodecs.toJson(update)) shouldBe Right(update)
  }

  it should "reject malformed documents" in {
    JsonCodecs.fromJson("{}").isLeft shouldBe true
    JsonCodecs.fromJson("not json").isLeft shouldBe true
    JsonCodecs.fromJson("""{"formatVersion":2,"id":"a","userId":"u","message":"m","timestamp":"2020-01-01T00:00:00Z","operations":[{"type":"wat"}]}""").isLeft shouldBe true
  }

  it should "accept unmarked pre-v2 commit files, decoding partition values RAW as v1 wrote them" in {
    val v = Version.generate()
    val v1Style =
      s"""{"id":"a","userId":"u","message":"m","timestamp":"2020-01-01T00:00:00Z","operations":[
         |  {"type":"add-partition-version","partition":"tag=A%2FB","version":"${v.label}"}]}""".stripMargin
    // v1 serialized raw values: "A%2FB" means the literal four characters,
    // NOT an escaped slash — unescaping it under v2 rules would corrupt it
    JsonCodecs.fromJson(v1Style) shouldBe Right(TableUpdate(
      TableUpdateMetadata(CommitId("a"), UserId("u"), "m", java.time.Instant.parse("2020-01-01T00:00:00Z")),
      List(TableOperation.AddPartitionVersion(Partition("tag", "A%2FB"), v))))
  }

  it should "decode the reference's chronicles wire format (golden document)" in {
    // shape pinned by the reference's own golden test:
    // files/src/test/scala/dev/chronicles/files/versiontracker/JsonCodecsSpec.scala:38-66
    val tv = Version.generate()
    val pv = Version.generate()
    val goldenJson =
      s"""{
         |  "commit_id" : "update-id",
         |  "user_id" : "user ID",
         |  "message" : "update message",
         |  "timestamp" : "2021-12-03T10:15:30.010Z",
         |  "operations" : [
         |    {
         |      "type" : "init-table",
         |      "table_name" : "schema.table",
         |      "is_snapshot" : true
         |    },
         |    {
         |      "type" : "add-table-version",
         |      "version" : "${tv.label}"
         |    },
         |    {
         |      "type" : "add-partition-version",
         |      "partition" : "year=2020/month=12",
         |      "version" : "${pv.label}"
         |    },
         |    {
         |      "type" : "remove-partition",
         |      "partition" : "year=2020"
         |    }
         |  ]
         |}""".stripMargin
    JsonCodecs.fromJson(goldenJson) shouldBe Right(TableUpdate(
      TableUpdateMetadata(CommitId("update-id"), UserId("user ID"), "update message",
        java.time.Instant.parse("2021-12-03T10:15:30.010Z")),
      List(
        TableOperation.InitTable(TableName("schema", "table"), isSnapshot = true),
        TableOperation.AddTableVersion(tv),
        TableOperation.AddPartitionVersion(
          Partition(ColumnValue(PartitionColumn("year"), "2020"), ColumnValue(PartitionColumn("month"), "12")), pv),
        TableOperation.RemovePartition(Partition("year", "2020")))))
  }

  it should "decode the reference's head_ref and table-metadata documents" in {
    JsonCodecs.chroniclesHeadFromJson("""{ "head_ref" : "xyz" }""") shouldBe Right("xyz")
    JsonCodecs.metadataFromJson("""{ "is_snapshot" : true }""") shouldBe Right(true)
  }

  it should "round-trip a state checkpoint document" in {
    val updates = List(
      TableUpdate(TableUpdateMetadata(CommitId("c1"), UserId("u"), "init", java.time.Instant.EPOCH),
        List(TableOperation.InitTable(TableName("s", "t"), isSnapshot = false))),
      TableUpdate(TableUpdateMetadata(CommitId("c2"), UserId("u"), "add", java.time.Instant.EPOCH),
        List(TableOperation.AddPartitionVersion(Partition("date", "2020-01-01"), Version.generate()))))
    val covered = List("table_update_a.json", "table_update_b.json")
    JsonCodecs.checkpointFromJson(JsonCodecs.checkpointToJson(covered, updates)) shouldBe
      Right((covered, updates))
  }

  it should "round-trip a folded-state document (both table flavors)" in {
    val v = Version.generate()
    JsonCodecs.foldDocFromJson(JsonCodecs.foldDocToJson(
      "table_update_x.json", "commit-1", 7, SnapshotTableVersion(v), None, Map.empty)) shouldBe
      Right(JsonCodecs.FoldDoc("table_update_x.json", "commit-1", 7, SnapshotTableVersion(v),
        Some(JsonCodecs.FoldResolved(None, Map.empty))))
    val state = PartitionedTableVersion(Map(
      Partition("date", "2024-01-01") -> Version.generate(),
      Partition(ColumnValue(PartitionColumn("year"), "2024"),
        ColumnValue(PartitionColumn("tag"), "a/b=c")) -> Version.generate()))
    // read-side extras (schema + DV bases) round-trip, Hive-escaped partitions included
    val marker = Version.generateDeleteMarker()
    val base = Version.generate()
    val bases = Map(
      (Partition("date", "2024-01-01"), marker) -> base,
      (Partition(ColumnValue(PartitionColumn("year"), "2024"),
        ColumnValue(PartitionColumn("tag"), "a/b=c")), marker) -> base)
    val schema = Some("""{"type":"struct","fields":[]}""")
    JsonCodecs.foldDocFromJson(
      JsonCodecs.foldDocToJson("42", "commit-2", 42, state, schema, bases)) shouldBe
      Right(JsonCodecs.FoldDoc("42", "commit-2", 42, state,
        Some(JsonCodecs.FoldResolved(schema, bases))))
    // a PRE-UPGRADE doc (no 'resolved' field) parses with resolved = None —
    // readers must fall back to the full fold for schema/bases, never
    // fabricate an empty base map
    val legacy = JsonCodecs.foldDocToJson("42", "commit-2", 42, state, schema, bases)
      .replaceAll("(?s),\\s*\"resolved\"\\s*:\\s*\\{.*\\}(\\s*\\})\\s*$", "$1")
    JsonCodecs.foldDocFromJson(legacy) shouldBe
      Right(JsonCodecs.FoldDoc("42", "commit-2", 42, state, None))
  }

  it should "reject malformed or future-versioned fold documents" in {
    JsonCodecs.foldDocFromJson("not json").isLeft shouldBe true
    JsonCodecs.foldDocFromJson("{}").isLeft shouldBe true
    JsonCodecs.foldDocFromJson(
      """{"formatVersion":99,"lastCovered":"x","lastCommitId":"c","coveredCount":1,
        |"state":{"type":"snapshot","version":"Unversioned"}}""".stripMargin).isLeft shouldBe true
  }

  it should "refuse commit files from a future format version" in {
    val future = """{"formatVersion":99,"id":"a","userId":"u","message":"m","timestamp":"2020-01-01T00:00:00Z","operations":[]}"""
    val result = JsonCodecs.fromJson(future)
    result.isLeft shouldBe true
    result.swap.getOrElse("") should include("99")
  }

  it should "stamp the current format version on every encoded commit" in {
    val update = TableUpdate(
      TableUpdateMetadata(CommitId("c"), UserId("u"), "m", java.time.Instant.EPOCH),
      List(TableOperation.AddTableVersion(Version.Unversioned)))
    JsonCodecs.toJson(update) should include(s""""formatVersion" : ${JsonCodecs.FormatVersion}""")
  }
}
