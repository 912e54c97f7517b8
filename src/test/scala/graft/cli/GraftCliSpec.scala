package graft.cli

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import java.io.{PrintWriter, StringWriter}
import java.nio.file.Files

class GraftCliSpec extends AnyFlatSpec with Matchers {

  val store: String = Files.createTempDirectory("graft-cli-").toUri.toString

  def cli(args: String*): (Int, String) = {
    val sw = new StringWriter()
    val code = GraftCli.run(List("--store", store) ++ args.toList, new PrintWriter(sw, true))
    (code, sw.toString)
  }

  "the CLI" should "init, list and log tables" in {
    val (c1, _) = cli("init", "sales.orders", "--user", "alice", "--message", "new table")
    c1 shouldBe 0
    val (c2, out2) = cli("tables")
    c2 shouldBe 0
    out2.trim shouldBe "sales.orders"
    val (c3, out3) = cli("log", "sales.orders")
    c3 shouldBe 0
    out3 should include("alice")
    out3 should include("new table")
  }

  it should "add, list and remove partitions" in {
    cli("init", "sales.events")
    val (ca, outa) = cli("partition", "add", "sales.events", "date=2024-01-01", "--user", "bob")
    ca shouldBe 0
    outa should include("added date=2024-01-01")
    val (cp, outp) = cli("partitions", "sales.events")
    cp shouldBe 0
    outp should include("date=2024-01-01")
    val (cr, _) = cli("partition", "remove", "sales.events", "date=2024-01-01")
    cr shouldBe 0
    val (_, outp2) = cli("partitions", "sales.events")
    outp2 should not include "date=2024-01-01"
  }

  it should "checkout a historical commit" in {
    cli("init", "sales.hist")
    cli("partition", "add", "sales.hist", "date=2024-01-01")
    cli("partition", "add", "sales.hist", "date=2024-01-02")
    val (_, logOut) = cli("log", "sales.hist")
    val commits = logOut.linesIterator.map(_.split("\\s+").head).toList
    commits should have size 3
    val (cc, _) = cli("checkout", "sales.hist", commits(1)) // after first add
    cc shouldBe 0
    val (_, parts) = cli("partitions", "sales.hist")
    parts should include("date=2024-01-01")
    parts should not include "date=2024-01-02"
  }

  it should "tag, list, refuse re-tagging, and untag" in {
    cli("init", "sales.tagme")
    cli("partition", "add", "sales.tagme", "date=2024-01-01")
    val (ct, outt) = cli("tag", "sales.tagme", "train-v1")
    ct shouldBe 0
    outt should include("tagged train-v1 -> ")
    // tag an explicit (older) commit by id
    val (_, logOut) = cli("log", "sales.tagme")
    val initCommit = logOut.linesIterator.toList.last.split("\\s+").head
    cli("tag", "sales.tagme", "empty-state", initCommit)._1 shouldBe 0
    val (cl, outl) = cli("tags", "sales.tagme")
    cl shouldBe 0
    outl should include("train-v1")
    outl should include(s"empty-state  $initCommit")
    // tags are immutable
    val (cdup, outdup) = cli("tag", "sales.tagme", "train-v1")
    cdup shouldBe 1
    outdup should include("already exists")
    // invalid names are a usage error
    cli("tag", "sales.tagme", "bad name")._1 shouldBe 2
    val (cu, _) = cli("untag", "sales.tagme", "train-v1")
    cu shouldBe 0
    cli("tags", "sales.tagme")._2 should not include "train-v1"
    cli("untag", "sales.tagme", "train-v1")._1 shouldBe 1
  }

  it should "print the metadata diff between two commits" in {
    cli("init", "sales.diff")
    cli("partition", "add", "sales.diff", "date=2024-01-01")
    cli("partition", "add", "sales.diff", "date=2024-01-02")
    cli("partition", "remove", "sales.diff", "date=2024-01-01")
    val (_, logOut) = cli("log", "sales.diff")
    val commits = logOut.linesIterator.map(_.split("\\s+").head).toList // newest first
    val (cc, out) = cli("changes", "sales.diff", commits(2), commits.head)
    cc shouldBe 0
    out should include("add     date=2024-01-02")
    out should include("remove  date=2024-01-01")
    // empty range
    cli("changes", "sales.diff", commits.head, commits.head)._2.trim shouldBe "no changes"
    // unknown commit fails loudly
    cli("changes", "sales.diff", "bogus", commits.head)._1 shouldBe 1
  }

  it should "vacuum expired version dirs: report by default, delete with --apply" in {
    cli("init", "sales.vac")
    // three versions of the same partition: two are expirable at keep-last 1
    cli("partition", "add", "sales.vac", "date=2024-03-01")
    cli("partition", "add", "sales.vac", "date=2024-03-01")
    cli("partition", "add", "sales.vac", "date=2024-03-01")
    // build the on-disk layout the commits reference
    val loc = java.nio.file.Files.createTempDirectory("graft-cli-vac-")
    val (rc0, report) = cli("vacuum", "sales.vac", loc.toUri.toString, "--keep-last", "1")
    rc0 shouldBe 0
    report.linesIterator.count(_.startsWith("expirable")) shouldBe 2
    // create the reported dirs so --apply has something to delete
    report.linesIterator.filter(_.startsWith("expirable")).foreach { line =>
      val uri = new java.net.URI(line.split("\\s+").last)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(uri.getPath))
    }
    val (rc1, applied) = cli("vacuum", "sales.vac", loc.toUri.toString, "--keep-last", "1", "--apply")
    rc1 shouldBe 0
    applied.linesIterator.count(_.startsWith("deleted")) shouldBe 2
    // idempotent: nothing left to report... the dirs are gone but commits
    // still reference them — a re-run re-lists and re-"deletes" (exists=false
    // counts as reclaimed), still exit 0
    cli("vacuum", "sales.vac", loc.toUri.toString, "--keep-last", "1", "--apply")._1 shouldBe 0
  }

  it should "work against a jdbc: store" in {
    val db = java.nio.file.Files.createTempDirectory("graft-cli-jdbc-").resolve("db")
    val jdbcStore = s"jdbc:derby:$db;create=true"
    def jcli(args: String*): (Int, String) = {
      val sw = new StringWriter()
      val code = GraftCli.run(List("--store", jdbcStore) ++ args.toList, new PrintWriter(sw, true))
      (code, sw.toString)
    }
    jcli("init", "jdbc.t")._1 shouldBe 0
    jcli("partition", "add", "jdbc.t", "date=2024-02-02")._1 shouldBe 0
    jcli("tables")._2.trim shouldBe "jdbc.t"
    jcli("partitions", "jdbc.t")._2 should include("date=2024-02-02")
  }

  it should "print every commit exactly once when the full log spans multiple keyset pages" in {
    cli("init", "sales.paged")._1 shouldBe 0
    (1 to 7).foreach(i => cli("partition", "add", "sales.paged", s"date=2024-03-0$i")._1 shouldBe 0)
    // 8 commits over --page-size 3 = 3 keyset pages; ids must be unique
    // (the offset-paged loop could double-print a boundary entry if a
    // commit landed mid-walk; keyset pages anchor on the last-seen commit)
    val (code, outp) = cli("log", "sales.paged", "--page-size", "3")
    code shouldBe 0
    val ids = outp.linesIterator.map(_.split("\\s+").head).toList
    ids should have size 8
    ids.distinct shouldBe ids
    // and matches the single-page read
    val (_, one) = cli("log", "sales.paged", "100")
    one.linesIterator.map(_.split("\\s+").head).toList shouldBe ids
  }

  it should "fail cleanly on bad input" in {
    cli("log", "not-a-table")._1 shouldBe 2
    cli("log", "no.such")._1 shouldBe 1
    // an over-Int page argument is a usage error, not a NumberFormatException
    cli("log", "sales.hist", "99999999999")._1 shouldBe 2
    cli("log", "sales.hist", "5", "99999999999")._1 shouldBe 2
    cli("checkout", "sales.hist", "bogus")._1 shouldBe 1
    cli("partition", "add", "sales.hist", "not a partition")._1 shouldBe 2
    cli("frobnicate")._1 shouldBe 2
    GraftCli.run(List("--config", "/nonexistent/config", "tables"),
      new PrintWriter(new StringWriter, true)) shouldBe 2
    // vacuum argument errors follow the same convention (no stack traces)
    cli("vacuum", "sales.hist", "/tmp/x", "--keep-last", "abc")._1 shouldBe 2
    cli("vacuum", "sales.hist", "/tmp/x", "--keep-last", "0")._1 shouldBe 2
    cli("vacuum", "sales.hist", "ht tp://bad uri")._1 shouldBe 2
  }

  it should "pick up the store from a config file, with flags taking precedence" in {
    // store precedence is flag > GRAFT_STORE env > config; an ambient env
    // var would shadow the config under test
    assume(!sys.env.contains("GRAFT_STORE"), "GRAFT_STORE set in test environment")
    val confStore = Files.createTempDirectory("graft-cli-conf-").toUri.toString
    val conf = Files.createTempFile("graft-config-", "")
    Files.writeString(conf,
      s"""# graft CLI config (simple key: value subset of HOCON)
         |store: "$confStore"  // the version store
         |user: "configured-user"
         |""".stripMargin)

    def confCli(args: String*): (Int, String) = {
      val sw = new StringWriter()
      val code = GraftCli.run(List("--config", conf.toString) ++ args.toList, new PrintWriter(sw, true))
      (code, sw.toString)
    }

    confCli("init", "conf.t")._1 shouldBe 0
    confCli("tables")._2.trim shouldBe "conf.t"
    // the configured user is recorded on commits
    confCli("log", "conf.t")._2 should include("configured-user")
    // an explicit --store beats the config file
    val sw = new StringWriter()
    GraftCli.run(List("--config", conf.toString, "--store", store, "tables"),
      new PrintWriter(sw, true)) shouldBe 0
    sw.toString should not include "conf.t"
  }

  it should "assemble a JDBC URL from the reference's db-config shape" in {
    GraftCli.storeFromConfig(Map(
      "type" -> "db-config", "db-type" -> "postgresql", "hostname" -> "db.example.com",
      "port" -> "5432", "db-name" -> "chronicles", "username" -> "svc", "password" -> "")) shouldBe
      Some("jdbc:postgresql://db.example.com:5432/chronicles?user=svc")
    GraftCli.storeFromConfig(Map(
      "type" -> "db-config", "db-type" -> "h2", "hostname" -> "localhost", "db-name" -> "v")) shouldBe
      Some("jdbc:h2://localhost/v")
    GraftCli.storeFromConfig(Map("store" -> "file:///tmp/s")) shouldBe Some("file:///tmp/s")
    GraftCli.storeFromConfig(Map.empty) shouldBe None
  }

  it should "parse the documented config syntax (comments, quotes, colons and equals)" in {
    val conf = Files.createTempFile("graft-config-syntax-", "")
    Files.writeString(conf,
      """|# full-line comment
         |store = "file:///tmp/store"   # trailing comment
         |db-type: postgresql
         |empty:
         |  indented: "ok"  // other comment style
         |broken line without separator
         |quoted-hash: "a#b"
         |""".stripMargin)
    val parsed = GraftCli.loadConfig(conf)
    parsed("store") shouldBe "file:///tmp/store"
    parsed("db-type") shouldBe "postgresql"
    parsed("indented") shouldBe "ok"
    parsed("quoted-hash") shouldBe "a#b"
    parsed.get("broken line without separator") shouldBe None
  }

  it should "keep // inside unquoted URIs (comment only at token boundaries)" in {
    val conf = Files.createTempFile("graft-config-uri-", "")
    Files.writeString(conf,
      """|store: file:///tmp/unquoted  // trailing note
         |other = jdbc:postgresql://db.example.com:5432/x
         |""".stripMargin)
    val parsed = GraftCli.loadConfig(conf)
    parsed("store") shouldBe "file:///tmp/unquoted"
    parsed("other") shouldBe "jdbc:postgresql://db.example.com:5432/x"
  }

  it should "migrate a reference-layout store via the migrate command" in {
    // minimal chronicles-layout table written by hand (same shape as
    // ChroniclesCompatSpec); the CLI must convert it and then read it
    val root = Files.createTempDirectory("graft-cli-migrate-")
    val dir = Files.createDirectory(root.resolve("_chronicles_table_ref.t"))
    val v = graft.core.Version.generate()
    Files.writeString(dir.resolve("table-metadata"), """{ "is_snapshot" : false }""")
    Files.writeString(dir.resolve("head_ref"), """{ "head_ref" : "c1" }""")
    Files.writeString(dir.resolve("table_update_2021-01-01T00-00-00.000"),
      s"""{
         |  "commit_id" : "c1", "user_id" : "u", "message" : "init",
         |  "timestamp" : "2021-01-01T00:00:00Z",
         |  "operations" : [
         |    { "type" : "init-table", "table_name" : "ref.t", "is_snapshot" : false },
         |    { "type" : "add-partition-version", "partition" : "date=2021-01-01", "version" : "${v.label}" }
         |  ]
         |}""".stripMargin)

    def mcli(args: String*): (Int, String) = {
      val sw = new StringWriter()
      val code = GraftCli.run(List("--store", root.toUri.toString) ++ args.toList, new PrintWriter(sw, true))
      (code, sw.toString)
    }
    val (c1, out1) = mcli("migrate")
    c1 shouldBe 0
    out1 should include("migrated  ref.t")
    val (c2, out2) = mcli("migrate")
    c2 shouldBe 0
    out2.trim shouldBe "nothing to migrate"
    mcli("partitions", "ref.t")._2 should include("date=2021-01-01")
    Files.exists(root.resolve("_graft_table_ref.t").resolve("table-metadata.json")) shouldBe true
  }

  it should "export a store into the reference layout, readable back end-to-end" in {
    val src = Files.createTempDirectory("graft-cli-export-src-").toUri.toString
    val dst = Files.createTempDirectory("graft-cli-export-dst-")
    def scli(args: String*): (Int, String) = {
      val sw = new StringWriter()
      (GraftCli.run(List("--store", src) ++ args.toList, new PrintWriter(sw, true)), sw.toString)
    }
    scli("init", "exp.t")._1 shouldBe 0
    scli("partition", "add", "exp.t", "date=2024-05-01")._1 shouldBe 0
    val (c, out) = scli("export", dst.toUri.toString)
    c shouldBe 0
    out should include("exported  exp.t")
    Files.exists(dst.resolve("_chronicles_table_exp.t").resolve("head_ref")) shouldBe true
    // the exported store is a fully usable chronicles-layout store for the CLI
    val sw = new StringWriter()
    GraftCli.run(List("--store", dst.toUri.toString, "partitions", "exp.t"),
      new PrintWriter(sw, true)) shouldBe 0
    sw.toString should include("date=2024-05-01")

    // incremental catch-up: new source commits flow to the replica via sync,
    // O(delta) — and an up-to-date replica syncs +0
    scli("partition", "add", "exp.t", "date=2024-05-02")._1 shouldBe 0
    val (cs, outs) = scli("sync", dst.toUri.toString)
    cs shouldBe 0
    outs should include("synced  exp.t  +1")
    val sw2 = new StringWriter()
    GraftCli.run(List("--store", dst.toUri.toString, "partitions", "exp.t"),
      new PrintWriter(sw2, true)) shouldBe 0
    sw2.toString should include("date=2024-05-02")
    scli("sync", dst.toUri.toString)._2 should include("synced  exp.t  +0")

    // operational refusals surface as clean errors, not stack traces:
    // re-exporting over the existing replica is an IllegalStateException
    // inside the library, exit 1 + "error:" out here
    val (ce, oute) = scli("export", dst.toUri.toString)
    ce shouldBe 1
    oute should include("error:")
    oute should include("already exists")
  }

  it should "stage, audit, and publish a delivery end-to-end (write-audit-publish)" in {
    // the shared Hive-enabled session must exist BEFORE the CLI's lazy
    // getOrCreate so later suites keep their harness session
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cli-wap-")
    val src = root.resolve("src").toString
    Seq((1L, "alpha", "b0"), (2L, "beta", "b0")).toDF("doc_id", "text", "batch")
      .write.parquet(src)
    cli("init", "sales.wapdocs")._1 shouldBe 0
    val loc = root.resolve("docs").toUri.toString

    val (cs, outS) = cli("stage", "sales.wapdocs", loc, src, "--partition-by", "batch")
    cs shouldBe 0
    outS.linesIterator.next() should startWith("staged")
    outS should include("batch=b0")
    val label = outS.linesIterator.next().trim.split("\\s+").last
    // staged ≠ visible: the table still has no partitions
    cli("partitions", "sales.wapdocs")._2 should not include "batch=b0"

    // NO --partition-by here: audit/publish recover the partition schema
    // from the stage's manifest
    val (ca, outA) = cli("audit", "sales.wapdocs", loc, label,
      "--check", "not-null:text",
      "--check", "unique:doc_id",
      "--check", "unique-approx:doc_id@0.03",
      "--check", "in-range:doc_id:0:100",
      "--check", "satisfies:nonempty:length(text) > 0")
    ca shouldBe 0
    outA.linesIterator.count(_.startsWith("ok")) shouldBe 5
    // audit without checks is a usage error
    cli("audit", "sales.wapdocs", loc, label)._1 shouldBe 2
    // a --check referencing a column the staged data lacks is a clean
    // error, not a stack trace
    val (cm, outM) = cli("audit", "sales.wapdocs", loc, label,
      "--check", "not-null:no_such_column")
    cm shouldBe 1
    outM should include("error:")

    val (cp, outP) = cli("publish", "sales.wapdocs", loc, label)
    cp shouldBe 0
    outP should include("published")
    cli("partitions", "sales.wapdocs")._2 should include("batch=b0")
    // double publish is refused: the label is already committed
    val (cd, outD) = cli("publish", "sales.wapdocs", loc, label, "--partition-by", "batch")
    cd shouldBe 2
    outD should include("already committed")
    // unknown label is a clean error
    cli("audit", "sales.wapdocs", loc, "not-a-version", "--check", "unique:doc_id",
      "--partition-by", "batch")._1 shouldBe 2
  }

  it should "print an exact metadata-fast table summary via the summary verb" in {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import graft.core._
    import graft.operators.VersionedTables._
    val root = Files.createTempDirectory("graft-cli-summary-")
    val loc = root.resolve("summ").toUri.toString
    cli("init", "sales.summ")._1 shouldBe 0
    val tracker = new graft.sources.FileBackedVersionTracker(
      new java.net.URI(store), spark.sparkContext.hadoopConfiguration)
    val engine = new graft.operators.VersionedTables(spark, tracker)
    val table = TableDefinition(TableName("sales", "summ"),
      new java.net.URI(loc), PartitionSchema("region"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("balance"))))
    Seq(("a1", "eu", 10L), ("a2", "us", 20L), ("a3", "eu", 5L))
      .toDF("id", "region", "balance")
      .versionedInsertInto(engine, table, UserId("t"), "load")
    val (c, o) = cli("summary", "sales.summ", loc,
      "--partition-by", "region", "--columns", "balance")
    c shouldBe 0
    o should include("rows    3")
    o should include("min=5")
    o should include("max=20")
    o should include("nulls=0")
    // flavor guard holds for the new verb too
    cli("summary", "sales.summ", loc, "--columns", "balance")._1 shouldBe 2

    // --at reports a historical commit from ITS manifests (the reprocess
    // REPOINTS the eu partition: head = {a9/eu, a2/us}, c0 = all three)
    val c0 = engine.headCommit(table.name)
    Seq(("a9", "eu", 500L)).toDF("id", "region", "balance")
      .versionedInsertInto(engine, table, UserId("t"), "reprocess eu")
    val (cHead, oHead) = cli("summary", "sales.summ", loc,
      "--partition-by", "region", "--columns", "balance")
    cHead shouldBe 0
    oHead should include("rows    2")
    oHead should include("max=500")
    val (cAt, oAt) = cli("summary", "sales.summ", loc,
      "--partition-by", "region", "--columns", "balance", "--at", c0.id)
    cAt shouldBe 0
    oAt should include("rows    3")
    oAt should include("max=20")
  }

  it should "report per-partition stats manifests via the stats verb" in {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import graft.core._
    import graft.operators.VersionedTables._
    val root = Files.createTempDirectory("graft-cli-stats-")
    val loc = root.resolve("ledger").toUri.toString
    cli("init", "sales.ledger")._1 shouldBe 0
    // write WITH a stats config through the Scala API against the same store
    val tracker = new graft.sources.FileBackedVersionTracker(
      new java.net.URI(store), spark.sparkContext.hadoopConfiguration)
    val engine = new graft.operators.VersionedTables(spark, tracker)
    val table = TableDefinition(TableName("sales", "ledger"),
      new java.net.URI(loc), PartitionSchema("region"), FileFormat.Parquet,
      stats = Some(ColumnStatsConfig(List("balance"), bloomKeyColumns = List("id"))))
    Seq(("a1", "eu", 10L), ("a2", "us", 20L)).toDF("id", "region", "balance")
      .versionedInsertInto(engine, table, UserId("t"), "load")
    val (c, o) = cli("stats", "sales.ledger", loc, "--partition-by", "region")
    c shouldBe 0
    o should include("region=eu")
    o should include("bloom")
    o should include("stats[balance]")
    o should include("rows=1")

    // CLI vacuum reclaims expired labels' stats manifests like engine.vacuum
    // — but keeps a label's manifest while any partition still reads it
    (1 to 2).foreach { i =>
      Seq((s"b$i", "eu", 30L + i)).toDF("id", "region", "balance")
        .versionedInsertInto(engine, table, UserId("t"), s"rewrite eu $i")
    }
    val statsDir = new java.io.File(new java.net.URI(loc).getPath, "_stats")
    def manifests() = statsDir.listFiles()
      .count(f => f.getName.endsWith(".json") && !f.getName.startsWith("."))
    manifests() shouldBe 3
    cli("vacuum", "sales.ledger", loc, "--keep-last", "1", "--apply")._1 shouldBe 0
    // v1 stays live through region=us (never rewritten); only the middle
    // eu-only rewrite's manifest is reclaimable
    manifests() shouldBe 2
    val (c2, o2) = cli("stats", "sales.ledger", loc, "--partition-by", "region")
    c2 shouldBe 0
    o2 should include("region=us")
    o2 should not include "(no stats manifest)"
  }

  it should "refuse flavor-mismatched stage/audit/publish instead of silently committing nothing" in {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cli-flavor-")
    val src = root.resolve("src").toString
    Seq((1L, "alpha", "b0"), (2L, "beta", "b0")).toDF("doc_id", "text", "batch")
      .write.parquet(src)
    val loc = root.resolve("docs").toUri.toString

    // partitioned-tracked table, stage WITHOUT --partition-by: before the
    // guard this staged snapshot-flavored ops that foldVersion ignores at
    // commit — publish would print "published" while the table stayed
    // empty and the label was stranded forever
    cli("init", "sales.flavdocs")._1 shouldBe 0
    val (cs, outS) = cli("stage", "sales.flavdocs", loc, src)
    cs shouldBe 2
    outS should include("needs --partition-by")

    // snapshot-tracked table, verbs WITH --partition-by: same refusal class
    cli("init", "sales.flavsnap", "--isSnapshot")._1 shouldBe 0
    val (c2, out2) = cli("stage", "sales.flavsnap", loc, src, "--partition-by", "batch")
    c2 shouldBe 2
    out2 should include("drop --partition-by")
    // a correctly-flavored stage against the partitioned table still works
    val (c3, out3) = cli("stage", "sales.flavdocs", loc, src, "--partition-by", "batch")
    c3 shouldBe 0
    val label = out3.linesIterator.next().trim.split("\\s+").last
    // ...and auditing it against the wrong-flavored table is refused too
    val (c4, out4) = cli("audit", "sales.flavsnap", loc, label, "--check", "unique:doc_id",
      "--partition-by", "batch")
    c4 shouldBe 2
    out4 should include("drop --partition-by")
    val (c5, _) = cli("publish", "sales.flavdocs", loc, label, "--partition-by", "batch")
    c5 shouldBe 0
    cli("partitions", "sales.flavdocs")._2 should include("batch=b0")
  }

  it should "delete and update by predicate end-to-end" in {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cli-dml-")
    val loc = root.resolve("accts").toUri.toString
    cli("init", "sales.dml_accts")._1 shouldBe 0
    val src = root.resolve("src").toString
    Seq(("a1", "eu", 10L), ("a2", "eu", 20L), ("a3", "us", 30L), ("a4", "ap", 40L))
      .toDF("id", "region", "balance").write.parquet(src)
    cli("merge", "sales.dml_accts", loc, src,
      "--keys", "id", "--partition-by", "region")._1 shouldBe 0

    // update: SET expressions over the OLD row, only where the predicate is TRUE
    val (cu, ou) = cli("update", "sales.dml_accts", loc,
      "--where", "balance >= 20 AND region = 'eu'",
      "--set", "balance = balance * 2", "--partition-by", "region")
    cu shouldBe 0
    ou should include("rewrote region=eu")
    ou should not include "region=us" // untouched partitions never rewritten

    // delete: emptied partitions are removed from the commit
    val (cd, od) = cli("delete", "sales.dml_accts", loc,
      "--where", "region = 'us'", "--partition-by", "region")
    cd shouldBe 0
    od should include("removed region=us")
    cli("partitions", "sales.dml_accts")._2 should not include "region=us"

    // a predicate matching nothing commits nothing
    val logBefore = cli("log", "sales.dml_accts")._2.linesIterator.size
    val (cn, on) = cli("delete", "sales.dml_accts", loc,
      "--where", "balance > 1000000", "--partition-by", "region")
    cn shouldBe 0
    on should include("no rows matched")
    cli("log", "sales.dml_accts")._2.linesIterator.size shouldBe logBefore

    // usage errors
    cli("delete", "sales.dml_accts", loc, "--partition-by", "region")._1 shouldBe 2
    cli("update", "sales.dml_accts", loc, "--where", "balance > 0",
      "--partition-by", "region")._1 shouldBe 2
  }

  it should "optimize: compact and z-order the layout, CAS-committed" in {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cli-opt-")
    val loc = root.resolve("ev").toUri.toString
    cli("init", "sales.opt_ev")._1 shouldBe 0
    val src = root.resolve("src").toString
    (0L until 400L).map(i => (i, i * 1.5, if (i % 2 == 0) "d1" else "d2"))
      .toDF("k", "v", "day").repartition(6).write.parquet(src)
    cli("merge", "sales.opt_ev", loc, src, "--keys", "k", "--partition-by", "day")._1 shouldBe 0

    val (c1, o1) = cli("optimize", "sales.opt_ev", loc, "--partition-by", "day")
    c1 shouldBe 0
    o1 should include("2 partition ops")
    val (c2, o2) = cli("optimize", "sales.opt_ev", loc,
      "--zorder", "k,v", "--partition-by", "day")
    c2 shouldBe 0
    o2 should include("partition ops")
    // rows intact after both rewrites
    val tracker = new graft.sources.FileBackedVersionTracker(new java.net.URI(store))
    val engine = new graft.operators.VersionedTables(spark, tracker)
    engine.read(graft.core.TableDefinition(
      graft.core.TableName("sales", "opt_ev"), new java.net.URI(loc),
      graft.core.PartitionSchema("day"), graft.core.FileFormat.Parquet))
      .count() shouldBe 400
    // z-order on a partition column refuses
    cli("optimize", "sales.opt_ev", loc, "--zorder", "day",
      "--partition-by", "day")._1 shouldBe 2

    // --where scopes the rewrite to the matching partitions only
    val preWhere = tracker.currentVersion(graft.core.TableName("sales", "opt_ev"))
      .asInstanceOf[graft.core.PartitionedTableVersion].partitionVersions
    val (c3, _) = cli("optimize", "sales.opt_ev", loc,
      "--where", "day = 'd1'", "--partition-by", "day")
    c3 shouldBe 0
    val postWhere = tracker.currentVersion(graft.core.TableName("sales", "opt_ev"))
      .asInstanceOf[graft.core.PartitionedTableVersion].partitionVersions
    postWhere(graft.core.Partition("day", "d2")) shouldBe
      preWhere(graft.core.Partition("day", "d2"))
    postWhere(graft.core.Partition("day", "d1")) should not be
      preWhere(graft.core.Partition("day", "d1"))
  }

  it should "analyze: backfill stats manifests for a pre-stats table" in {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import graft.operators.VersionedTables._
    val root = Files.createTempDirectory("graft-cli-analyze-")
    val loc = root.resolve("ev").toUri
    cli("init", "sales.an_ev")._1 shouldBe 0
    val tracker = new graft.sources.FileBackedVersionTracker(new java.net.URI(store))
    val engine = new graft.operators.VersionedTables(spark, tracker)
    val bare = graft.core.TableDefinition(
      graft.core.TableName("sales", "an_ev"), loc,
      graft.core.PartitionSchema("day"), graft.core.FileFormat.Parquet)
    (0L until 200L).map(i => (i, if (i % 2 == 0) "d1" else "d2"))
      .toDF("k", "day").versionedInsertInto(engine, bare, graft.core.UserId("t"), "load")

    // missing --stats-columns on a config-less table is a usage error
    cli("analyze", "sales.an_ev", loc.toString, "--partition-by", "day")._1 shouldBe 2
    val (ca, outA) = cli("analyze", "sales.an_ev", loc.toString,
      "--stats-columns", "k", "--partition-by", "day")
    ca shouldBe 0
    outA should include("wrote manifest")
    // idempotent
    cli("analyze", "sales.an_ev", loc.toString,
      "--stats-columns", "k", "--partition-by", "day")._2 should
      include("already carry manifests")
    // the backfilled table prunes through readWhere like a stats-born one
    val statted = bare.copy(stats =
      Some(graft.core.ColumnStatsConfig(List("k"))))
    engine.readWhere(statted, org.apache.spark.sql.functions.col("k") < 10)
      .count() shouldBe 10
  }

  it should "optimize an EVOLVED table with --merge-schema, keeping the new column" in {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import graft.operators.VersionedTables._
    val root = Files.createTempDirectory("graft-cli-evopt-")
    val loc = root.resolve("ev").toUri
    cli("init", "sales.evopt")._1 shouldBe 0
    val tracker = new graft.sources.FileBackedVersionTracker(new java.net.URI(store))
    val engine = new graft.operators.VersionedTables(spark, tracker)
    val table = graft.core.TableDefinition(
      graft.core.TableName("sales", "evopt"), loc,
      graft.core.PartitionSchema("day"), graft.core.FileFormat.Parquet,
      options = Map("mergeSchema" -> "true"))
    Seq((1L, "d1"), (2L, "d1")).toDF("k", "day")
      .versionedInsertInto(engine, table, graft.core.UserId("t"), "narrow")
    Seq((10L, 5.0, "d2")).toDF("k", "score", "day")
      .versionedInsertIntoEvolving(engine, table, graft.core.UserId("t"), "wide")
    val (c, o) = cli("optimize", "sales.evopt", loc.toString,
      "--partition-by", "day", "--merge-schema")
    c shouldBe 0
    o should include("partition ops")
    val cur = engine.read(table)
    cur.columns should contain("score") // the evolved column survived
    cur.filter(org.apache.spark.sql.functions.col("score").isNotNull).count() shouldBe 1
    cur.count() shouldBe 3
  }

  it should "merge a keyed source end-to-end: bootstrap, upsert, delete" in {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cli-merge-")
    val loc = root.resolve("accts").toUri.toString
    cli("init", "sales.accts")._1 shouldBe 0

    // bootstrap merge into the never-written table = pure insert
    val src1 = root.resolve("src1").toString
    Seq(("a1", "eu", 10L), ("a2", "us", 20L)).toDF("id", "region", "balance")
      .write.parquet(src1)
    val (c1, o1) = cli("merge", "sales.accts", loc, src1,
      "--keys", "id", "--partition-by", "region")
    c1 shouldBe 0
    o1 should include("merged")
    cli("partitions", "sales.accts")._2 should include("region=eu")

    // second merge: update a1, delete a2 via --delete-when, insert a3
    val src2 = root.resolve("src2").toString
    Seq(("a1", "eu", 11L), ("a2", "us", -1L), ("a3", "ap", 30L))
      .toDF("id", "region", "balance").write.parquet(src2)
    val (c2, o2) = cli("merge", "sales.accts", loc, src2,
      "--keys", "id", "--delete-when", "balance < 0", "--partition-by", "region")
    c2 shouldBe 0
    o2 should include("removed region=us")
    val parts = cli("partitions", "sales.accts")._2
    parts should include("region=ap")
    parts should not include "region=us"

    // missing --keys is a usage error
    cli("merge", "sales.accts", loc, src2, "--partition-by", "region")._1 shouldBe 2

    // flavor mismatch guard: omitting --partition-by against this
    // PARTITIONED table would have been a silent no-op that printed
    // "merged" — it must refuse loudly instead
    val (cg, og) = cli("merge", "sales.accts", loc, src2, "--keys", "id")
    cg shouldBe 2
    og should include("needs --partition-by")

    // row-changes: the second merge's row-level feed, written as parquet
    val log = cli("log", "sales.accts")._2.linesIterator.toList
    val ids = log.map(_.trim.split("\\s+").head)
    val (cR, oR) = cli("row-changes", "sales.accts", loc, ids(1), ids(0),
      "--keys", "id", "--partition-by", "region",
      "--out", root.resolve("feed").toString)
    cR shouldBe 0
    oR should include("insert  1")
    oR should include("update  1")
    oR should include("delete  1")
    val feed = spark.read.parquet(root.resolve("feed").toString)
    feed.select("id", "_change_type").as[(String, String)].collect().toSet shouldBe
      Set(("a1", "update"), ("a2", "delete"), ("a3", "insert"))
    // missing --out / --keys are usage errors
    cli("row-changes", "sales.accts", loc, ids(1), ids(0),
      "--keys", "id", "--partition-by", "region")._1 shouldBe 2
    cli("row-changes", "sales.accts", loc, ids(1), ids(0),
      "--partition-by", "region", "--out", root.resolve("f2").toString)._1 shouldBe 2
  }

  it should "refuse to publish a staged delivery that fails its expectations" in {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cli-wap-dirty-")
    val src = root.resolve("src").toString
    Seq((3L, Some("gamma"), "b1"), (3L, None, "b1"))
      .toDF("doc_id", "text", "batch").write.parquet(src)
    cli("init", "sales.wapdirty")._1 shouldBe 0
    val loc = root.resolve("docs").toUri.toString

    val (_, outS) = cli("stage", "sales.wapdirty", loc, src, "--partition-by", "batch")
    val label = outS.linesIterator.next().trim.split("\\s+").last

    // the audit reports the violations and exits 1
    val (ca, outA) = cli("audit", "sales.wapdirty", loc, label, "--partition-by", "batch",
      "--check", "not-null:text", "--check", "unique:doc_id")
    ca shouldBe 1
    outA should include("FAIL  not_null(text)  1")
    outA should include("FAIL  unique(doc_id)  1")

    // a gated publish refuses and leaves the stage as invisible debris
    val (cp, outP) = cli("publish", "sales.wapdirty", loc, label, "--partition-by", "batch",
      "--check", "not-null:text", "--check", "unique:doc_id")
    cp shouldBe 1
    outP should include("refused")
    cli("partitions", "sales.wapdirty")._2 should not include "batch=b1"
    val (_, logOut) = cli("log", "sales.wapdirty")
    logOut.linesIterator.size shouldBe 1 // init only — no commit landed
  }

  it should "report a clean error for a nonexistent stage source" in {
    graft.TestSpark.spark
    cli("init", "sales.wapnosrc")._1 shouldBe 0
    val root = Files.createTempDirectory("graft-cli-wap-nosrc-")
    val (c, outS) = cli("stage", "sales.wapnosrc", root.resolve("docs").toUri.toString,
      root.resolve("no-such-source").toString, "--partition-by", "batch")
    c shouldBe 1
    outS should include("error:")
    outS should not include "at org.apache.spark" // no stack trace
  }

  it should "reject malformed --check specs with a usage error" in {
    for (bad <- Seq("unknown:x", "not-null:", "in-range:col:a:b", "in-range:col:1",
        "unique-approx:id@7", "satisfies:only-name"))
      GraftCli.parseCheck(bad).isLeft shouldBe true
    GraftCli.parseCheck("unique-approx:a,b@0.1").toOption.get shouldBe
      graft.operators.Expectations.UniqueApprox(Seq("a", "b"), 0.1)
  }

  it should "degrade to no-config on unreadable or malformed config paths" in {
    // a directory at the config path must not crash commands that pass --store
    val dir = Files.createTempDirectory("graft-config-dir-")
    GraftCli.loadConfig(dir) shouldBe Map.empty
    val sw = new StringWriter()
    GraftCli.run(List("--config", dir.toString, "--store", store, "tables"),
      new PrintWriter(sw, true)) shouldBe 0
  }

  it should "publish-group two staged tables atomically" in {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cli-grp-")
    val srcA = root.resolve("srcA").toString
    val srcB = root.resolve("srcB").toString
    Seq((1L, "a", "b0")).toDF("doc_id", "text", "batch").write.parquet(srcA)
    Seq((2L, "b", "b0")).toDF("doc_id", "text", "batch").write.parquet(srcB)
    cli("init", "sales.grpa")._1 shouldBe 0
    cli("init", "sales.grpb")._1 shouldBe 0
    val locA = root.resolve("ta").toUri.toString
    val locB = root.resolve("tb").toUri.toString
    val (ca, outA) = cli("stage", "sales.grpa", locA, srcA, "--partition-by", "batch")
    ca shouldBe 0
    val labelA = outA.linesIterator.next().trim.split("\\s+").last
    val (cb, outB) = cli("stage", "sales.grpb", locB, srcB, "--partition-by", "batch")
    cb shouldBe 0
    val labelB = outB.linesIterator.next().trim.split("\\s+").last
    // nothing visible before the group lands
    cli("partitions", "sales.grpa")._2 should not include "batch=b0"
    val (cg, outG) = cli("publish-group",
      "sales.grpa", locA, labelA, "sales.grpb", locB, labelB)
    cg shouldBe 0
    outG should include("published sales.grpa")
    outG should include("published sales.grpb")
    cli("partitions", "sales.grpa")._2 should include("batch=b0")
    cli("partitions", "sales.grpb")._2 should include("batch=b0")
    // a bad member refuses the WHOLE group with a clean error
    val (ce, outE) = cli("publish-group",
      "sales.grpa", locA, labelA, "sales.grpb", locB, "20990101-000000.000000000-00000000-0000-0000-0000-000000000000")
    ce shouldBe 2
    outE should include("error:")
    // arity misuse is a usage error
    cli("publish-group", "sales.grpa", locA)._1 shouldBe 2
  }

  it should "checkout by timestamp or tag through the shared ref resolution" in {
    cli("init", "sales.tsref")
    cli("partition", "add", "sales.tsref", "date=2024-01-01")
    cli("partition", "add", "sales.tsref", "date=2024-01-02")
    // a future date resolves to the latest commit at or before it (= head)
    val (ct, outT) = cli("checkout", "sales.tsref", "2999-01-01")
    ct shouldBe 0
    outT should startWith("checked out")
    cli("partitions", "sales.tsref")._2 should include("date=2024-01-02")
    // a timestamp before every commit is a clean error, not a stack trace
    val (cp, outP) = cli("checkout", "sales.tsref", "1999-01-01")
    cp should be > 0
    outP should include("error")
    // tags resolve too (tag-first, like SQL VERSION AS OF)
    val (_, logOut) = cli("log", "sales.tsref")
    val mid = logOut.linesIterator.toList(1).split("\\s+").head
    cli("tag", "sales.tsref", "pin-mid", mid)._1 shouldBe 0
    val (cc, _) = cli("checkout", "sales.tsref", "pin-mid")
    cc shouldBe 0
    cli("partitions", "sales.tsref")._2 should not include "date=2024-01-02"
  }

  it should "resolve a tag named like a commit id TAG-FIRST, matching SQL VERSION AS OF" in {
    cli("init", "sales.shadow")
    cli("partition", "add", "sales.shadow", "date=2024-01-01")
    cli("partition", "add", "sales.shadow", "date=2024-01-02")
    val (_, logOut) = cli("log", "sales.shadow")
    val commits = logOut.linesIterator.map(_.split("\\s+").head).toList // newest first
    // tag the OLDEST commit with the NEWEST commit's id — the pathological
    // shadowing case: the tag must win on both surfaces
    cli("tag", "sales.shadow", commits.head, commits.last)._1 shouldBe 0
    cli("checkout", "sales.shadow", commits.head)._1 shouldBe 0
    cli("partitions", "sales.shadow")._2 should not include "date=2024-01-01"
  }

  it should "restore durably: the rolled-back delete stays undone after later commits" in {
    cli("init", "sales.rest")
    cli("partition", "add", "sales.rest", "date=2024-01-01")
    cli("partition", "add", "sales.rest", "date=2024-01-02")
    val (_, logOut) = cli("log", "sales.rest")
    val both = logOut.linesIterator.map(_.split("\\s+").head).toList.head
    // the bad remove...
    cli("partition", "remove", "sales.rest", "date=2024-01-02")._1 shouldBe 0
    // ...undone durably: restore commits the tip->target diff
    val (cr, outR) = cli("restore", "sales.rest", both)
    cr shouldBe 0
    outR should startWith(s"restored $both as ")
    cli("partitions", "sales.rest")._2 should include("date=2024-01-02")
    // an unrelated commit AFTER the restore must not re-apply the remove
    cli("partition", "add", "sales.rest", "date=2024-01-03")._1 shouldBe 0
    val (_, parts) = cli("partitions", "sales.rest")
    parts should include("date=2024-01-01")
    parts should include("date=2024-01-02")
    parts should include("date=2024-01-03")
    // a bogus ref is a clean error
    cli("restore", "sales.rest", "bogus")._1 shouldBe 1
  }
}
