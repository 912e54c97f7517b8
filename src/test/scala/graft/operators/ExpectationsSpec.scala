package graft.operators

import graft.TestSpark
import graft.operators.Expectations._
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class ExpectationsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame = Seq(
    (1L, Some("a"), 10.0, "us"),
    (2L, Some("b"), 55.0, "de"),
    (3L, None, 99.0, "us"),       // null name
    (4L, Some("d"), 150.0, "xx"), // out of range + orphan country
    (4L, Some("e"), 20.0, "de")   // duplicate id
  ).toDF("id", "name", "score", "country")

  private val dims = Seq("us", "de", "fr").toDF("code")

  "audit" should "count violations per check, row-local checks fused in one pass" in {
    val results = Expectations.audit(frame, Seq(
      NotNull(Seq("name")),
      Unique(Seq("id")),
      InRange("score", 0.0, 100.0),
      RefIntegrity("country", dims, "code"),
      Satisfies("id_positive", col("id") > 0)))
    results.map(r => r.check -> r.violations) shouldBe Seq(
      "not_null(name)" -> 1L,
      "unique(id)" -> 1L, // id 4 twice: one EXTRA row
      "in_range(score,0.0,100.0)" -> 1L,
      "ref_integrity(country)" -> 1L,
      "satisfies(id_positive)" -> 0L)
    results.count(_.ok) shouldBe 1
  }

  it should "treat nulls as non-violations for InRange (compose NotNull when needed)" in {
    val df = Seq((1L, Some(5.0)), (2L, None)).toDF("id", "v")
    Expectations.audit(df, Seq(InRange("v", 0, 10))).head.violations shouldBe 0L
    Expectations.audit(df, Seq(NotNull(Seq("v")))).head.violations shouldBe 1L
  }

  it should "pass every check on an empty frame" in {
    Expectations.audit(frame.limit(0), Seq(
      NotNull(Seq("name")), Unique(Seq("id")), InRange("score", 0, 100)))
      .forall(_.ok) shouldBe true
  }

  it should "attribute counts positionally when two checks share a name" in {
    // round-10 advice: name-keyed counts collapsed duplicate checkNames to
    // the LAST check's count — positional keying reports each its own
    val results = Expectations.audit(frame, Seq(
      Satisfies("p", col("id") > 1),   // violated by id=1 → 1
      Satisfies("p", col("id") > 100), // violated by all  → 5
      NotNull(Seq("id")),
      NotNull(Seq("id"))))             // duplicate spec: both report 0
    results.map(_.check) shouldBe
      Seq("satisfies(p)", "satisfies(p)", "not_null(id)", "not_null(id)")
    results.map(_.violations) shouldBe Seq(1L, 5L, 0L, 0L)
  }

  it should "run a multi-class audit in ONE pass over the input, RefIntegrity included" in {
    // Every check references the UDF-computed column, so any extra audit
    // pass would re-run the UDF — the accumulator counts evaluations.
    // Round 17: RefIntegrity fuses into the shared aggregation (dimension
    // keys left-joined with a presence marker), so fused + any number of
    // RefIntegrity checks is ONE scan, one action, and never a persist.
    val acc = spark.sparkContext.longAccumulator("scan-ticks")
    val tick = udf { (x: Long) => acc.add(1L); x }
    val n = 1000L
    val tracked = spark.range(n).toDF("id").withColumn("k", tick(col("id")))
    val results = Expectations.audit(tracked, Seq(
      NotNull(Seq("k")),
      Unique(Seq("k")),
      RefIntegrity("k", spark.range(n).toDF("code"), "code"),
      RefIntegrity("k", spark.range(n).toDF("code2"), "code2")))
    results.forall(_.ok) shouldBe true
    acc.value shouldBe n
    tracked.storageLevel shouldBe org.apache.spark.storage.StorageLevel.NONE
  }

  it should "count RefIntegrity orphans identically to the anti-join shape" in {
    // duplicate dimension keys must NOT multiply fact rows (the join is on
    // the dimension's DISTINCT keys), a null dimension key matches nothing,
    // null fact keys never violate, and an empty dimension orphans every
    // non-null fact key — the exact semantics of the former per-check
    // LEFT ANTI join pass.
    val facts = Seq(Some("us"), Some("de"), Some("xx"), None).toDF("country")
    val dupDims = Seq(Some("us"), Some("us"), Some("de"), None).toDF("code")
    val r = Expectations.audit(facts, Seq(
      NotNull(Seq("country")),
      RefIntegrity("country", dupDims, "code")))
    r.map(_.violations) shouldBe Seq(1L, 1L) // only "xx" is an orphan
    Expectations.audit(facts, Seq(
      RefIntegrity("country", spark.emptyDataset[String].toDF("code"), "code")))
      .head.violations shouldBe 3L
  }

  it should "leave a caller-persisted input's storage level alone" in {
    val df = frame.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      Expectations.audit(df, Seq(NotNull(Seq("name")), Unique(Seq("id"))))
        .map(_.violations) shouldBe Seq(1L, 1L)
      df.storageLevel shouldBe org.apache.spark.storage.StorageLevel.MEMORY_ONLY
    } finally df.unpersist()
  }

  it should "not persist a single-pass audit at all" in {
    // row-local checks + UniqueApprox all fuse into one aggregation pass —
    // one scan, no caching needed or taken
    val acc = spark.sparkContext.longAccumulator("fused-ticks")
    val tick = udf { (x: Long) => acc.add(1L); x }
    val n = 500L
    val tracked = spark.range(n).toDF("id").withColumn("k", tick(col("id")))
    Expectations.audit(tracked, Seq(
      NotNull(Seq("k")),
      UniqueApprox(Seq("k")),
      InRange("k", 0, n.toDouble))).forall(_.ok) shouldBe true
    acc.value shouldBe n
  }

  "UniqueApprox" should "report zero on a truly unique key despite sketch noise" in {
    val clean = spark.range(20000).toDF("id")
    Expectations.audit(clean, Seq(UniqueApprox(Seq("id"))))
      .head.violations shouldBe 0L
  }

  it should "catch heavy duplication, never exceeding the exact count" in {
    // 2x-duplicated key: exact extras = 5000, far above the 3·rsd slack
    val dup = spark.range(5000).toDF("id").union(spark.range(5000).toDF("id"))
    val Seq(approx, exact) = Expectations.audit(dup,
      Seq(UniqueApprox(Seq("id")), Unique(Seq("id")))).map(_.violations)
    exact shouldBe 5000L
    approx should be > 0L
    approx should be <= exact
  }

  it should "ignore null keys like the sketch does, keeping the ≤-exact law" in {
    // an all-null key: the HLL skips nulls, so the row count must too —
    // count(*) would report every row as a violation (> exact's k-1)
    val allNull = Seq[Option[Long]](None, None, None).toDF("id")
    val Seq(approx, exact) = Expectations.audit(allNull,
      Seq(UniqueApprox(Seq("id")), Unique(Seq("id")))).map(_.violations)
    exact shouldBe 2L // null is one group of 3 for the exact check
    approx shouldBe 0L // invisible to the sketch arm — compose NotNull
    approx should be <= exact
  }

  it should "handle multi-column keys and an empty frame" in {
    val df = Seq((1L, "a"), (1L, "b"), (1L, "a")).toDF("id", "s")
    // exact extras = 1 ((1,a) twice); the sketch's slack may hide it at
    // this size, but it must never report MORE than exact
    val Seq(approx, exact) = Expectations.audit(df,
      Seq(UniqueApprox(Seq("id", "s")), Unique(Seq("id", "s")))).map(_.violations)
    exact shouldBe 1L
    approx should be <= exact
    Expectations.audit(df.limit(0), Seq(UniqueApprox(Seq("id", "s"))))
      .head.violations shouldBe 0L
    // triage falls back to the exact offender view
    Expectations.violations(df, UniqueApprox(Seq("id", "s"))).count() shouldBe 2L
  }

  it should "keep the null contract consistent across arities: all-null keys are invisible" in {
    // ten duplicate ALL-null two-column keys: a bare struct() key would be
    // non-null, counted by count(key) AND the sketch, so these rows would
    // read as duplicates — breaking the documented single-column contract
    // ("null keys are invisible; compose NotNull when they should fail")
    val allNull = (1 to 10).map(_ => (None: Option[Long], None: Option[String]))
      .toDF("id", "s")
    Expectations.audit(allNull, Seq(UniqueApprox(Seq("id", "s"))))
      .head.violations shouldBe 0L
    // PARTIALLY-null keys participate as distinct values: heavy duplication
    // of (null, "x") is still caught
    val partial = ((1 to 40).map(_ => (None: Option[Long], Some("x"))) ++
      Seq((Some(1L), Some("y")))).toDF("id", "s")
    Expectations.audit(partial, Seq(UniqueApprox(Seq("id", "s"))))
      .head.violations should be > 0L
  }

  "violations" should "surface bounded offender rows per check" in {
    Expectations.violations(frame, NotNull(Seq("name")))
      .select("id").as[Long].collect() shouldBe Array(3L)
    Expectations.violations(frame, Unique(Seq("id")))
      .select("id").as[Long].collect().toSet shouldBe Set(4L) // both rows of the dup key
    Expectations.violations(frame, Unique(Seq("id"))).count() shouldBe 2L
    Expectations.violations(frame, RefIntegrity("country", dims, "code"))
      .select("id").as[Long].collect().toSet shouldBe Set(4L)
    Expectations.violations(frame, InRange("score", 0, 100), limit = 1).count() shouldBe 1L
  }
}
