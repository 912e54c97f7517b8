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
