package graft.operators

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** SCD2 laws: collapse of unchanged observations, half-open interval
  * chaining, exactly one current row per key, point-in-time reconstruction
  * of every original observation, and tie-break determinism. */
class Scd2Spec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  behavior of "buildScd2"

  it should "collapse unchanged observations and chain half-open intervals" in {
    val obs = Seq(
      ("u1", 1L, "bronze"), ("u1", 2L, "bronze"), ("u1", 3L, "gold"),
      ("u1", 5L, "gold"), ("u1", 7L, "silver"),
      ("u2", 2L, "gold")).toDF("id", "ts", "tier")

    val dim = Scd2.buildScd2(obs, Seq("id"), Seq("tier"), "ts")
      .orderBy("id", "effective_from")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))

    dim shouldBe Array(
      ("u1", "bronze", 1L, 3L, false),
      ("u1", "gold", 3L, 7L, false),
      ("u1", "silver", 7L, -1L, true),
      ("u2", "gold", 2L, -1L, true))
  }

  it should "treat NULL attributes null-safely (NULL -> NULL is not a change)" in {
    val obs = Seq(("u1", 1L, null), ("u1", 2L, null), ("u1", 3L, "a"), ("u1", 4L, null))
      .toDF("id", "ts", "tier")
    val dim = Scd2.buildScd2(obs, Seq("id"), Seq("tier"), "ts")
      .orderBy("effective_from").collect()
    dim.map(_.getLong(2)) shouldBe Array(1L, 3L, 4L)
    dim.map(r => Option(r.getString(1))) shouldBe Array(None, Some("a"), None)
  }

  it should "reconstruct every original observation via point-in-time lookup (random histories)" in {
    val rnd = new scala.util.Random(42)
    val obs = (1 to 400).map { i =>
      (s"u${rnd.nextInt(12)}", rnd.nextInt(1000).toLong * 10 + i % 10, // unique ts per (key,i) mix
        Seq("a", "b", "c")(rnd.nextInt(3)))
    }.distinct
    val df = obs.toDF("id", "ts", "tier")
      .groupBy("id", "ts").agg(first("tier").as("tier")) // one observation per (key, ts)

    val dim = Scd2.buildScd2(df, Seq("id"), Seq("tier"), "ts")

    // law: exactly one current row per key, and intervals chain gaplessly
    val perKey = dim.groupBy("id").agg(
      sum(col("is_current").cast("long")).as("currents"),
      count(lit(1)).as("n")).collect()
    perKey.foreach(r => r.getLong(1) shouldBe 1L)

    // law: looking up each original observation's ts returns its attrs
    val looked = Scd2.asOfLookup(df.withColumnRenamed("tier", "observed"), dim, Seq("id"), "ts")
    looked.count() shouldBe df.count() // left join matched exactly once each
    looked.filter(!(col("observed") <=> col("tier"))).count() shouldBe 0
  }

  it should "resolve dotted column names and refuse colliding fact/dim output columns" in {
    val obs = Seq(("u1", 1L, "a"), ("u1", 5L, "b")).toDF("id", "ts", "tier")
    val dim = Scd2.buildScd2(obs, Seq("id"), Seq("tier"), "ts")
    // a fact column whose NAME contains a dot must resolve as one part —
    // unquoted interpolation would read it as a nested field and fail
    val dotted = obs.select(col("id"), col("ts"), col("tier").as("my.note"))
    val looked = Scd2.asOfLookup(dotted, dim, Seq("id"), "ts")
    looked.count() shouldBe 2
    looked.columns should contain("my.note")
    // a fact column named like the dimension's interval columns would
    // silently duplicate output names — refused loudly instead
    val colliding = obs.withColumn("effective_from", lit(0L))
    val err = intercept[IllegalArgumentException] {
      Scd2.asOfLookup(colliding, dim, Seq("id"), "ts")
    }
    err.getMessage should include("effective_from")
    // case-INSENSITIVE like Spark's resolver: a case-differing collision is
    // just as ambiguous downstream
    val caseColliding = obs.withColumn("Effective_From", lit(0L))
    an[IllegalArgumentException] should be thrownBy
      Scd2.asOfLookup(caseColliding, dim, Seq("id"), "ts")
  }

  behavior of "advanceScd2State"

  private def asTuples(dim: org.apache.spark.sql.DataFrame) =
    dim.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
      if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).sortBy(t => (t._1, t._3))

  it should "equal buildScd2 over any ordered delivery split, with and without draining" in {
    val rnd = new scala.util.Random(7)
    val obs = (1 to 300).map { i =>
      (s"u${rnd.nextInt(10)}", rnd.nextInt(500).toLong, Seq("a", "b", "c")(rnd.nextInt(3)))
    }
    val df = obs.toDF("id", "ts", "tier")
      .groupBy("id", "ts").agg(first("tier").as("tier")) // one observation per (key, ts)
    val batch = asTuples(Scd2.buildScd2(df, Seq("id"), Seq("tier"), "ts"))

    for (nDeliveries <- Seq(1, 2, 4)) {
      val cuts = (1 until nDeliveries).map(k => 500L * k / nDeliveries)
      val bounds = (Seq(Long.MinValue) ++ cuts ++ Seq(Long.MaxValue)).sliding(2).toSeq
      // plain advance chain
      var st = Scd2.emptyScd2State(df, Seq("id"), Seq("tier"), "ts")
      bounds.foreach { case Seq(lo, hi) =>
        st = Scd2.advanceScd2State(st,
          df.filter(col("ts") >= lo && col("ts") < hi), Seq("id"), Seq("tier"), "ts")
      }
      asTuples(Scd2.scd2FromState(st, Seq("id"), Seq("tier"))) shouldBe batch

      // drained chain: closed slices accumulate, tail keeps advancing
      var tail = Scd2.emptyScd2State(df, Seq("id"), Seq("tier"), "ts")
      var closedAll = Seq.empty[org.apache.spark.sql.DataFrame]
      bounds.foreach { case Seq(lo, hi) =>
        val adv = Scd2.advanceScd2State(tail,
          df.filter(col("ts") >= lo && col("ts") < hi), Seq("id"), Seq("tier"), "ts")
        val (closed, kept) = Scd2.compactScd2State(adv, Seq("id"), Seq("tier"))
        closedAll = closedAll :+ closed; tail = kept
      }
      // drained closed rows are final EXCEPT the then-open row's effective_to,
      // which a later delivery may close — rebuild marks it; union the
      // drained slices with the final tail and compare
      val drained = (closedAll :+ Scd2.scd2FromState(tail, Seq("id"), Seq("tier")))
        .reduce(_ union _)
      asTuples(drained) shouldBe batch
    }
  }

  it should "fold a NULL key into one chain across deliveries, like buildScd2's window grouping" in {
    // buildScd2's partitionBy puts every null-key observation in ONE group;
    // a null-unsafe state join would instead append an independent null-key
    // state row per delivery and the equivalence below would fail
    val all = Seq((null: String, 1L, "a"), (null: String, 3L, "b"),
      ("u1", 2L, "x"), (null: String, 5L, "b")).toDF("id", "ts", "tier")
    val batch = Scd2.buildScd2(all, Seq("id"), Seq("tier"), "ts")
      .collect().map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1.getOrElse(""), t._3))

    var st = Scd2.emptyScd2State(all, Seq("id"), Seq("tier"), "ts")
    for ((lo, hi) <- Seq((Long.MinValue, 3L), (3L, Long.MaxValue)))
      st = Scd2.advanceScd2State(st,
        all.filter(col("ts") >= lo && col("ts") < hi), Seq("id"), Seq("tier"), "ts")
    val inc = Scd2.scd2FromState(st, Seq("id"), Seq("tier"))
      .collect().map(r => (Option(r.getString(0)), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1.getOrElse(""), t._3))

    inc shouldBe batch
    inc.count(_._1.isEmpty) shouldBe 2 // a@1, b@3 — ONE null chain, not per-delivery copies
  }

  it should "skip out-of-order observations below the watermark, never corrupting the chain" in {
    val d1 = Seq(("u1", 1L, "a"), ("u1", 5L, "a")).toDF("id", "ts", "tier")
    val late = Seq(("u1", 3L, "b")).toDF("id", "ts", "tier") // would split [1,∞) if applied
    val st = Scd2.advanceScd2State(
      Scd2.advanceScd2State(Scd2.emptyScd2State(d1, Seq("id"), Seq("tier"), "ts"),
        d1, Seq("id"), Seq("tier"), "ts"),
      late, Seq("id"), Seq("tier"), "ts")
    // == buildScd2 with the late row dropped: the unchanged t=5 observation
    // moved the watermark past it (the dimension alone couldn't know that)
    asTuples(Scd2.scd2FromState(st, Seq("id"), Seq("tier"))) shouldBe
      asTuples(Scd2.buildScd2(d1, Seq("id"), Seq("tier"), "ts"))
  }

  it should "be deterministic under same-timestamp ties when a tie-break is given" in {
    val obs = Seq(("u1", 1L, 1L, "a"), ("u1", 5L, 3L, "b"), ("u1", 5L, 2L, "c"))
      .toDF("id", "ts", "seq", "tier")
    val dim = Scd2.buildScd2(obs, Seq("id"), Seq("tier"), "ts", tieBreak = Seq("seq"))
      .collect().map(r => (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    // tie order at ts=5 is seq=2 (c) then seq=3 (b): c gets the empty
    // [5, 5) interval, b is the open current row
    dim should contain theSameElementsAs Seq(
      ("a", 1L, 5L, false), ("c", 5L, 5L, false), ("b", 5L, -1L, true))
  }
}
