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
}
