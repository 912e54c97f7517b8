package graft.operators

import graft.TestSpark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class ProfileSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  behavior of "Profile.profile"

  it should "compute rows/nulls/distinct/min/max per column in one pass" in {
    val df = Seq(
      (Some(1), Some("a"), Some(2.5)),
      (Some(1), None, Some(-1.0)),
      (Some(3), Some("b"), None),
      (None, Some("a"), Some(2.5))
    ).toDF("i", "s", "d")

    val prof = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    prof.keySet shouldBe Set("i", "s", "d")

    val i = prof("i")
    (i.getLong(1), i.getLong(2), i.getLong(3)) shouldBe ((4L, 1L, 2L)) // rows, nulls, distinct
    (i.getDouble(4), i.getDouble(5)) shouldBe ((1.0, 3.0))             // min/max num
    i.isNullAt(6) shouldBe true                                        // no string min

    val s = prof("s")
    (s.getLong(1), s.getLong(2), s.getLong(3)) shouldBe ((4L, 1L, 2L))
    s.isNullAt(4) shouldBe true
    (s.getString(6), s.getString(7)) shouldBe (("a", "b"))

    val d = prof("d")
    (d.getLong(2), d.getLong(3)) shouldBe ((1L, 2L))
    (d.getDouble(4), d.getDouble(5)) shouldBe ((-1.0, 2.5))
  }

  it should "profile only the requested columns, keeping their order" in {
    val df = Seq((1, "x")).toDF("a", "b")
    Profile.profile(df, Seq("b")).collect().map(_.getString(0)).toList shouldBe List("b")
  }

  it should "handle column names needing quoting (spaces, quotes, backticks)" in {
    val df = Seq((1, "x", 2.0)).toDF("a col", "it's", "a`b")
    val prof = Profile.profile(df).collect().map(r => r.getString(0) -> r).toMap
    prof.keySet shouldBe Set("a col", "it's", "a`b")
    prof("a col").getLong(3) shouldBe 1L // distinct
    prof("it's").getString(6) shouldBe "x"
    prof("a`b").getDouble(4) shouldBe 2.0
  }

  it should "scan the input once (single aggregate over one scan)" in {
    val df = Seq((1, "x"), (2, "y")).toDF("a", "b")
    val plan = Profile.profile(df).queryExecution.optimizedPlan.toString()
    // multi-distinct goes through a single Expand over one relation, not a
    // self-join of per-column scans
    plan.split("LocalRelation|LogicalRDD").length - 1 should be <= 1
  }

  it should "support approximate distinct counts for interactive profiling" in {
    val df = (1 to 1000).map(i => (i, s"v$i")).toDF("a", "b")
    val prof = Profile.profile(df, exact = false).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL with the default 5% rsd: allow a few sigma around 1000
    prof("a").toDouble shouldBe 1000.0 +- 150.0
    prof("b").toDouble shouldBe 1000.0 +- 150.0
  }
}
