package graft.sources

import graft.core._
import java.nio.file.Files
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** The shared tracker contract against the Derby-backed JDBC store. */
class JdbcVersionTrackerSpec extends VersionTrackerContract {
  override def newTracker(): VersionTracker = {
    val db = Files.createTempDirectory("graft-jdbc-").resolve("db")
    new JdbcVersionTracker(s"jdbc:derby:$db;create=true")
  }
}

/** JDBC-specific behavior beyond the contract. */
class JdbcPersistenceSpec extends AnyFlatSpec with Matchers {

  "JdbcVersionTracker" should "survive a reopen (state is in the database)" in {
    val db = Files.createTempDirectory("graft-jdbc-reopen-").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    val t = TableName("test", "t")
    val p = Partition("date", "2024-01-01")
    val v = Version.generate()

    val tr1 = new JdbcVersionTracker(url)
    tr1.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())
    tr1.commit(t, TableUpdate(UserId("u"), "add", java.time.Instant.now(),
      List(TableOperation.AddPartitionVersion(p, v))))
    tr1.close()

    val tr2 = new JdbcVersionTracker(url)
    tr2.tables() shouldBe List(t)
    tr2.currentVersion(t) shouldBe PartitionedTableVersion(Map(p -> v))
    tr2.updates(t).map(_.message) shouldBe List("add", "init")
    tr2.close()
  }

  it should "escape quotes in messages and user ids" in {
    val db = Files.createTempDirectory("graft-jdbc-esc-").resolve("db")
    val tr = new JdbcVersionTracker(s"jdbc:derby:$db;create=true")
    val t = TableName("test", "q")
    tr.initTable(t, isSnapshot = true, UserId("o'brien"), "it's; DROP TABLE--", java.time.Instant.now())
    tr.updates(t).head.userId shouldBe UserId("o'brien")
    tr.updates(t).head.message shouldBe "it's; DROP TABLE--"
    tr.close()
  }

  it should "read O(tail) history rows once a checkpoint exists" in {
    val db = Files.createTempDirectory("graft-jdbc-cp-").resolve("db")
    val tr = new JdbcVersionTracker(s"jdbc:derby:$db;create=true", checkpointInterval = 10)
    val t = TableName("test", "cp")
    tr.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())
    val versions = (1 to 35).map { i =>
      val v = Version.generate()
      tr.commit(t, TableUpdate(UserId("u"), s"c$i", java.time.Instant.now(),
        List(TableOperation.AddPartitionVersion(Partition("date", f"2024-01-${i % 28 + 1}%02d"), v))))
      v
    }
    // 36 updates total (init + 35), interval 10 -> last checkpoint covers 30;
    // a state read scans only the 6 tail commits' rows (1 op each), never 36
    val before = tr.historyRowsScanned
    val st = tr.tableState(t)
    st.updates should have length 36
    (tr.historyRowsScanned - before) should be <= 10L
    // and the checkpointed read is the SAME state a full fold produces
    st.updates.map(_.metadata.message) shouldBe "init" +: (1 to 35).map(i => s"c$i")
    st.currentTableVersion.asInstanceOf[PartitionedTableVersion]
      .partitionVersions.values should contain(versions.last)
    tr.close()
  }

  it should "survive reopen with checkpoints and degrade to full scan on a corrupt checkpoint" in {
    val db = Files.createTempDirectory("graft-jdbc-cpcorrupt-").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    val t = TableName("test", "cpc")
    val tr = new JdbcVersionTracker(url, checkpointInterval = 5)
    tr.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())
    (1 to 12).foreach { i =>
      tr.commit(t, TableUpdate(UserId("u"), s"c$i", java.time.Instant.now(),
        List(TableOperation.AddPartitionVersion(Partition("date", "2024-01-01"), Version.generate()))))
    }
    val full = tr.tableState(t)
    tr.close()

    // reopened instance reads the persisted checkpoint row
    val tr2 = new JdbcVersionTracker(url, checkpointInterval = 5)
    val before = tr2.historyRowsScanned
    tr2.tableState(t) shouldBe full
    (tr2.historyRowsScanned - before) should be <= 5L

    // corrupt the checkpoint state in place: the read must fall back to the
    // full join and still return identical history (never brick the store)
    val raw = java.sql.DriverManager.getConnection(url)
    val st = raw.createStatement()
    st.executeUpdate("UPDATE graft_checkpoints SET state = 'not json at all'")
    st.close(); raw.close()
    val tr3 = new JdbcVersionTracker(url, checkpointInterval = 5)
    tr3.tableState(t) shouldBe full
    // and the next interval's commits self-heal the corrupt row
    (1 to 5).foreach { i =>
      tr3.commit(t, TableUpdate(UserId("u"), s"h$i", java.time.Instant.now(),
        List(TableOperation.AddPartitionVersion(Partition("date", "2024-01-02"), Version.generate()))))
    }
    val healedBefore = tr3.historyRowsScanned
    tr3.tableState(t).updates should have length 18
    (tr3.historyRowsScanned - healedBefore) should be <= 5L
    tr3.close()
  }

  it should "answer headState (version + schema + DV bases) from the fold row + tail" in {
    val db = Files.createTempDirectory("graft-jdbc-hs-").resolve("db")
    val tr = new JdbcVersionTracker(s"jdbc:derby:$db;create=true", checkpointInterval = 5)
    val t = TableName("test", "hs")
    tr.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())
    val v1 = Version.generate()
    tr.commit(t, TableUpdate(UserId("u"), "c1", java.time.Instant.now(), List(
      TableOperation.AddPartitionVersion(Partition("day", "d001"), v1),
      TableOperation.SetTableSchema("""{"v":1}"""))))
    (2 to 5).foreach { i =>
      tr.commit(t, TableUpdate(UserId("u"), s"c$i", java.time.Instant.now(),
        List(TableOperation.AddPartitionVersion(Partition("day", f"d$i%03d"), Version.generate()))))
    }
    // tail past the fold boundary: DV marker + base binding + newer schema
    val marker = Version.generateDeleteMarker()
    tr.commit(t, TableUpdate(UserId("u"), "c6", java.time.Instant.now(), List(
      TableOperation.AddPartitionVersion(Partition("day", "d001"), marker),
      TableOperation.SetVersionBase(Partition("day", "d001"), marker, v1),
      TableOperation.SetTableSchema("""{"v":2}"""))))

    val st = tr.tableState(t)
    val before = tr.historyRowsScanned
    val hs = tr.headState(t)
    (tr.historyRowsScanned - before) should be <= 5L // the tail, never all 7 commits
    hs.head shouldBe st.currentVersion
    hs.version shouldBe st.currentTableVersion
    hs.schemaJson shouldBe Some("""{"v":2}""")
    hs.schemaJson shouldBe st.currentSchemaJson
    hs.versionBases shouldBe Map((Partition("day", "d001"), marker) -> v1)
    hs.versionBases shouldBe st.versionBases
    tr.close()
  }

  it should "resolve versionAt boundedly for tail ids (post-commit pin path)" in {
    val db = Files.createTempDirectory("graft-jdbc-vat-").resolve("db")
    val tr = new JdbcVersionTracker(s"jdbc:derby:$db;create=true", checkpointInterval = 5)
    val t = TableName("test", "vat")
    tr.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())
    (1 to 8).foreach { i =>
      tr.commit(t, TableUpdate(UserId("u"), s"c$i", java.time.Instant.now(),
        List(TableOperation.AddPartitionVersion(Partition("day", f"d$i%03d"), Version.generate()))))
    }
    val st = tr.tableState(t)
    val tailId = st.updates.last.metadata.id
    val before = tr.historyRowsScanned
    tr.versionAt(t, tailId) shouldBe st.versionAt(tailId)
    (tr.historyRowsScanned - before) should be <= 5L // the tail rows only
    // covered-prefix ids replay, still exact; unknown ids raise
    val covered = st.updates(2).metadata.id
    tr.versionAt(t, covered) shouldBe st.versionAt(covered)
    intercept[UnknownCommitError] { tr.versionAt(t, CommitId("nope")) }
    tr.close()
  }

  it should "answer currentVersion from the fold row + tail without materializing history" in {
    val db = Files.createTempDirectory("graft-jdbc-fold-").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    val t = TableName("test", "fold")
    val tr = new JdbcVersionTracker(url, checkpointInterval = 5)
    tr.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())
    (1 to 12).foreach { i =>
      tr.commit(t, TableUpdate(UserId("u"), s"c$i", java.time.Instant.now(),
        List(TableOperation.AddPartitionVersion(Partition("day", f"d$i%03d"), Version.generate()))))
    }
    // 13 updates; last fold boundary at 10 → the fast path fetches 3 tail
    // commits' rows, not 13 (a full tableState replay would count all 13)
    val expected = tr.tableState(t).currentTableVersion
    val before = tr.historyRowsScanned
    tr.currentVersion(t) shouldBe expected
    (tr.historyRowsScanned - before) should be <= 5L

    // land exactly on the boundary: zero history rows at all
    (13 to 14).foreach { i =>
      tr.commit(t, TableUpdate(UserId("u"), s"c$i", java.time.Instant.now(),
        List(TableOperation.AddPartitionVersion(Partition("day", f"d$i%03d"), Version.generate()))))
    }
    val atBoundary = tr.historyRowsScanned
    val got = tr.currentVersion(t)
    (tr.historyRowsScanned - atBoundary) shouldBe 0L
    got shouldBe tr.tableState(t).currentTableVersion

    // checkout INTO the covered prefix falls back to the full replay, still correct
    val st = tr.tableState(t)
    val early = st.updates(3).metadata.id
    tr.setCurrentVersion(t, early)
    tr.currentVersion(t) shouldBe st.versionAt(early)

    // a corrupt fold row degrades to the replay (never bricks the store)
    tr.setCurrentVersion(t, st.updates.last.metadata.id)
    val raw = java.sql.DriverManager.getConnection(url)
    val rst = raw.createStatement()
    rst.executeUpdate("UPDATE graft_state_folds SET folded = 'not json'")
    rst.close(); raw.close()
    val tr2 = new JdbcVersionTracker(url, checkpointInterval = 5)
    tr2.currentVersion(t) shouldBe got
    tr2.close()
    tr.close()
  }

  it should "escape quotes in commit ids (imported/hand-built histories)" in {
    val db = Files.createTempDirectory("graft-jdbc-cid-").resolve("db")
    val tr = new JdbcVersionTracker(s"jdbc:derby:$db;create=true")
    val t = TableName("test", "cid")
    tr.initTable(t, isSnapshot = true, UserId("u"), "init", java.time.Instant.now())
    val odd = CommitId("it's-not-a-uuid")
    tr.commit(t, TableUpdate(
      TableUpdateMetadata(odd, UserId("u"), "odd id", java.time.Instant.now()),
      List(TableOperation.AddTableVersion(Version.generate()))))
    tr.tableState(t).currentVersion shouldBe odd
    // CAS against the odd head works too (the guard interpolates the id)
    tr.commitIf(t, TableUpdate(UserId("u"), "after", java.time.Instant.now(),
      List(TableOperation.AddTableVersion(Version.generate()))), odd)
    tr.updates(t).head.message shouldBe "after"
    tr.close()
  }

  it should "never fail a commit because checkpointing failed (undecodable imported row)" in {
    val db = Files.createTempDirectory("graft-jdbc-cpfail-").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    val t = TableName("test", "cpfail")
    val tr = new JdbcVersionTracker(url, checkpointInterval = 3)
    tr.initTable(t, isSnapshot = false, UserId("u"), "init", java.time.Instant.now())
    val seed = TableUpdate(UserId("u"), "seed", java.time.Instant.now(),
      List(TableOperation.AddPartitionVersion(Partition("date", "2024-01-01"), Version.generate())))
    tr.commit(t, seed)
    // plant an undecodable operation row (imported/hand-built history)
    val raw = java.sql.DriverManager.getConnection(url)
    val st = raw.createStatement()
    st.executeUpdate(
      s"""INSERT INTO graft_operations VALUES
         |('${seed.metadata.id.id}', 99, 'mystery-op', NULL, NULL, NULL, NULL)""".stripMargin)
    st.close(); raw.close()
    // every further commit trips the checkpoint fold onto the bad row; the
    // fold fails — the COMMITS must not
    (1 to 6).foreach { i =>
      tr.commit(t, TableUpdate(UserId("u"), s"c$i", java.time.Instant.now(),
        List(TableOperation.AddPartitionVersion(Partition("date", s"2024-02-0$i"), Version.generate()))))
    }
    // the log is intact (metadata reads don't decode the bad op... they do —
    // so clean the planted row and confirm everything committed)
    val raw2 = java.sql.DriverManager.getConnection(url)
    val st2 = raw2.createStatement()
    st2.executeUpdate("DELETE FROM graft_operations WHERE op_type = 'mystery-op'")
    st2.close(); raw2.close()
    tr.updates(t).map(_.message) shouldBe
      ("c6" :: "c5" :: "c4" :: "c3" :: "c2" :: "c1" :: "seed" :: "init" :: Nil)
    tr.close()
  }

  it should "keep checkpoints coherent across two live connections to one database" in {
    val db = Files.createTempDirectory("graft-jdbc-2conn-").resolve("db")
    val url = s"jdbc:derby:$db;create=true"
    val t = TableName("test", "multi")
    val a = new JdbcVersionTracker(url, checkpointInterval = 2)
    val b = new JdbcVersionTracker(url, checkpointInterval = 2)
    a.initTable(t, isSnapshot = false, UserId("a"), "init", java.time.Instant.now())
    // alternate writers: each commit may trigger a checkpoint on ITS
    // connection, and the other connection must fold past it correctly
    (1 to 10).foreach { i =>
      val tr = if (i % 2 == 0) a else b
      tr.commit(t, TableUpdate(UserId(s"w${i % 2}"), s"c$i", java.time.Instant.now(),
        List(TableOperation.AddPartitionVersion(Partition("date", f"2024-02-$i%02d"), Version.generate()))))
    }
    val sa = a.tableState(t)
    val sb = b.tableState(t)
    sa shouldBe sb
    sa.updates.map(_.metadata.message) shouldBe "init" +: (1 to 10).map(i => s"c$i")
    // a THIRD fresh connection reads O(tail) off the shared checkpoint
    val c = new JdbcVersionTracker(url, checkpointInterval = 2)
    val before = c.historyRowsScanned
    c.tableState(t) shouldBe sa
    (c.historyRowsScanned - before) should be <= 2L
    a.close(); b.close(); c.close()
  }

  it should "leave the connection usable after a CAS conflict (transaction ended)" in {
    val db = Files.createTempDirectory("graft-jdbc-cas-").resolve("db")
    val tr = new JdbcVersionTracker(s"jdbc:derby:$db;create=true")
    val t = TableName("test", "cas")
    tr.initTable(t, isSnapshot = true, UserId("u"), "init", java.time.Instant.now())
    val head = tr.tableState(t).currentVersion
    tr.commit(t, TableUpdate(UserId("u"), "moved", java.time.Instant.now(),
      List(TableOperation.AddTableVersion(Version.generate()))))
    val conflict = intercept[CommitConflictError] {
      tr.commitIf(t, TableUpdate(UserId("u"), "stale", java.time.Instant.now(),
        List(TableOperation.AddTableVersion(Version.generate()))), head)
    }
    conflict.actual shouldBe tr.tableState(t).currentVersion
    // the failed CAS left no trace and the connection transacts normally
    tr.updates(t).map(_.message) shouldBe List("moved", "init")
    tr.commit(t, TableUpdate(UserId("u"), "next", java.time.Instant.now(),
      List(TableOperation.AddTableVersion(Version.generate()))))
    tr.updates(t).head.message shouldBe "next"
    tr.close()
  }
}

/** The full contract again at checkpointInterval=2: every second commit
  * folds, so every contract law (checkout to every point, commit order,
  * tags, CAS) is exercised THROUGH the checkpointed read path. */
class JdbcVersionTrackerCheckpointedSpec extends VersionTrackerContract {
  override def newTracker(): VersionTracker = {
    val db = Files.createTempDirectory("graft-jdbc-cp2-").resolve("db")
    new JdbcVersionTracker(s"jdbc:derby:$db;create=true", checkpointInterval = 2)
  }
}
