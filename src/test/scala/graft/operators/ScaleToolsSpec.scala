package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class ScaleToolsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  "filterInValues" should "match isin exactly and keep the plan O(1) past the inline cap" in {
    val df = spark.range(5000).select(concat(lit("tok"), ($"id" % 500)).as("t"), $"id")
    val small = (0 until 10).map(i => s"tok$i")
    val large = (0 until 400).map(i => s"tok$i") ++ (0 until 50000).map(i => s"zz$i")

    // identical-results law, both regimes
    ScaleTools.filterInValues(df, "t", small).select("id").as[Long].collect().sorted shouldBe
      df.filter($"t".isin(small: _*)).select("id").as[Long].collect().sorted
    ScaleTools.filterInValues(df, "t", large).select("id").as[Long].collect().sorted shouldBe
      df.filter($"t".isin(large.take(500): _*)).select("id").as[Long].collect().sorted
    ScaleTools.filterInValues(df, "t", Nil).count() shouldBe 0

    // plan shapes: small inlines (no join), large broadcasts a semi-join
    val smallPlan = ScaleTools.filterInValues(df, "t", small)
      .queryExecution.executedPlan.toString
    smallPlan should not include "Join"
    val largePlan = ScaleTools.filterInValues(df, "t", large)
      .queryExecution.executedPlan.toString
    largePlan should include("BroadcastHashJoin")
    largePlan should include("LeftSemi")

    // planning smoke at vocab scale: a 100k-value filter must ANALYZE and
    // OPTIMIZE in milliseconds (an inline In of 100k literals is a plan the
    // optimizer walks on every rule pass)
    val vocab100k = (0 until 100000).map(i => s"v$i")
    val t0 = System.nanoTime()
    ScaleTools.filterInValues(df, "t", vocab100k).queryExecution.optimizedPlan
    val planS = (System.nanoTime() - t0) / 1e9
    planS should be < 2.0
  }

  "saltedJoin" should "produce exactly the plain-join result under heavy skew" in {
    // 10k rows of one hot key + a tail, joined to a small dim
    val left = spark.range(10000).select(
      when($"id" < 9000, lit(1L)).otherwise($"id" % 50).as("k"), $"id".as("payload"))
    val right = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (49L, "z")).toDF("rk", "name")

    val expected = left.join(right, $"k" === $"rk")
      .groupBy("rk", "name").count().as[(Long, String, Long)].collect().toSet
    val salted = ScaleTools.saltedJoin(left, right, "k", "rk", salts = 8)
      .groupBy("rk", "name").count().as[(Long, String, Long)].collect().toSet
    salted shouldBe expected
  }

  "writeBucketed" should "eliminate the shuffle for joins on the bucket key" in {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val lineitem = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    ScaleTools.writeBucketed(orders, "b_orders", "o_orderkey", buckets = 4)
    ScaleTools.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", buckets = 4)

    // unbucketed baseline: the same join needs hash-partition exchanges
    val plain = lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
      .groupBy("o_orderpriority").count()
    ScaleTools.hasShuffle(plain) shouldBe true

    val bucketed = spark.table("b_lineitem")
      .join(spark.table("b_orders"), Seq("o_orderkey"))
      .select("o_orderkey", "o_orderpriority", "l_quantity")
    ScaleTools.hasShuffle(bucketed) shouldBe false

    // and results agree with the plain join
    bucketed.count() shouldBe
      lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey")).count()
  }

  "repartitionForSize" should "size partition counts from byte estimates" in {
    val df = spark.range(100).toDF("id")
    ScaleTools.repartitionForSize(df, 1024L * 1024 * 1024).rdd.getNumPartitions shouldBe 8
    ScaleTools.repartitionForSize(df, 1024L).rdd.getNumPartitions shouldBe 1
  }

  "hashSample" should "be deterministic, key-stable, and near the target fraction" in {
    val df = spark.range(20000).select($"id".as("k"), ($"id" * 7).as("payload"))
    val s1 = ScaleTools.hashSample(df, Seq("k"), 0.1).select("k").as[Long].collect().toSet
    val s2 = ScaleTools.hashSample(df, Seq("k"), 0.1).select("k").as[Long].collect().toSet
    s1 shouldBe s2 // reproducible
    s1.size.toDouble shouldBe (2000.0 +- 300.0)
    // key-stability => join-consistency: sampling another table by the same
    // key keeps exactly the matching rows
    val other = spark.range(20000).select($"id".as("k"))
    val s3 = ScaleTools.hashSample(other, Seq("k"), 0.1).select("k").as[Long].collect().toSet
    s3 shouldBe s1
    // different seed draws a different sample
    val s4 = ScaleTools.hashSample(df, Seq("k"), 0.1, seed = 1).select("k").as[Long].collect().toSet
    s4 should not be s1
    // edge fractions
    ScaleTools.hashSample(df, Seq("k"), 0.0).count() shouldBe 0
    ScaleTools.hashSample(df, Seq("k"), 1.0).count() shouldBe 20000
    // below the sampling resolution: loud error, not a silent empty sample
    an[IllegalArgumentException] should be thrownBy
      ScaleTools.hashSample(df, Seq("k"), 1e-12)
  }

  "zorderBy" should "bound BOTH dimensions per partition where a linear sort bounds one" in {
    // a 200x200 uniform grid
    val grid = spark.range(40000).select(
      ($"id" % 200).cast("double").as("x"), ($"id" / 200).cast("double").as("y"))
    val files = 16

    def boxes(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg(min($"y").as("ylo"), max($"y").as("yhi"))
        .select("ylo", "yhi").as[(Double, Double)].collect()

    val zordered = ScaleTools.zorderBy(grid, Seq("x", "y"), numFiles = files)
    val linear = grid.repartitionByRange(files, $"x").sortWithinPartitions($"x")

    // The point of z-order is pruning on the NON-leading dimension: a linear
    // x-layout leaves every partition spanning the full y range (min/max
    // stats on y prune nothing), while z-curve segments cover compact y
    // slices. Measure exactly that: partitions whose y-range overlaps a thin
    // y band must drop well below "all of them".
    val band = (20.0, 30.0)
    def overlapping(bs: Array[(Double, Double)]) =
      bs.count { case (lo, hi) => hi >= band._1 && lo <= band._2 }
    val zBoxes = boxes(zordered); val lBoxes = boxes(linear)
    overlapping(lBoxes) shouldBe lBoxes.length // linear: no y pruning at all
    assert(overlapping(zBoxes) <= zBoxes.length / 2,
      s"z-order: ${overlapping(zBoxes)}/${zBoxes.length} partitions overlap a 5% y band")
    // and the mean y-extent per partition shrinks accordingly
    val zDy = zBoxes.map { case (lo, hi) => hi - lo }.sum / zBoxes.length
    val lDy = lBoxes.map { case (lo, hi) => hi - lo }.sum / lBoxes.length
    assert(zDy < lDy / 2.0, s"z-order mean y-extent $zDy not < half of linear $lDy")

    // clustering must not change the data (exact long sums: order-independent)
    zordered.agg(sum($"x".cast("long")), sum($"y".cast("long"))).head() shouldBe
      grid.agg(sum($"x".cast("long")), sum($"y".cast("long"))).head()
    zordered.count() shouldBe 40000
  }

  it should "pass empty and all-null inputs through unchanged" in {
    val empty = spark.range(0).select($"id".cast("double").as("x"), $"id".cast("double").as("y"))
    ScaleTools.zorderBy(empty, Seq("x", "y"), numFiles = 4).count() shouldBe 0
    val allNull = spark.range(10).select(
      lit(null).cast("double").as("x"), $"id".cast("double").as("y"))
    ScaleTools.zorderBy(allNull, Seq("x", "y"), numFiles = 4).count() shouldBe 10
  }

  "bloomPrefilteredJoin" should "equal the plain join for STRING keys too" in {
    val large = spark.range(5000).select(
      concat(lit("key"), ($"id" % 100)).as("k"), $"id".as("payload"))
    val small = spark.range(5).select(
      concat(lit("key"), ($"id" * 11)).as("sk"), $"id".as("dim"))
    val expected = large.join(small, $"k" === $"sk")
      .select("k", "payload", "dim").as[(String, Long, Long)].collect().toSet
    val got = ScaleTools.bloomPrefilteredJoin(large, small, "k", "sk", expectedItems = 100)
      .select("k", "payload", "dim").as[(String, Long, Long)].collect().toSet
    got shouldBe expected
    expected should not be empty
  }

  it should "reject unsupported key types loudly instead of silently mis-hashing" in {
    val large = spark.range(10).select(($"id" * 1.5).as("k"))
    val small = spark.range(3).select(($"id" * 1.5).as("sk"))
    an[IllegalArgumentException] should be thrownBy
      ScaleTools.bloomPrefilteredJoin(large, small, "k", "sk")
  }

  it should "reject mixed key type families (the filter would hash a different domain)" in {
    // string dim key vs long fact key: the bloom filter inserts UTF-8 bytes
    // while the probe hashes longs — nearly every row would silently vanish
    val large = spark.range(10).select($"id".as("k"))
    val small = spark.range(3).select($"id".cast("string").as("sk"))
    an[IllegalArgumentException] should be thrownBy
      ScaleTools.bloomPrefilteredJoin(large, small, "k", "sk")
    an[IllegalArgumentException] should be thrownBy
      ScaleTools.bloomPrefilteredJoin(small.withColumnRenamed("sk", "k"),
        large.withColumnRenamed("k", "sk"), "k", "sk")
  }

  it should "equal the plain join and prune the large side before shuffle" in {
    val large = spark.range(50000).select(($"id" % 1000).as("k"), $"id".as("payload"))
    val small = spark.range(20).select(($"id" * 37).as("sk"), concat(lit("n"), $"id").as("name"))

    val expected = large.join(small, $"k" === $"sk")
      .select("k", "payload", "name").as[(Long, Long, String)].collect().toSet
    val got = ScaleTools.bloomPrefilteredJoin(large, small, "k", "sk", expectedItems = 100)
      .select("k", "payload", "name").as[(Long, Long, String)].collect().toSet
    got shouldBe expected

    // the prefilter really drops non-candidate rows: with 20 keys over a
    // 1000-value domain at 1% fpp, the surviving fraction must be far below 1
    val filter = small.stat.bloomFilter("sk", 100, 0.01)
    val surviving = (0L until 1000L).count(filter.mightContainLong)
    assert(surviving < 100, s"bloom filter admits $surviving of 1000 candidate keys")
  }

  "heavyHitters" should "find exactly the keys at or above the share threshold, with exact counts" in {
    // 3 hot keys (30%, 20%, 10%) + a 1000-key tail sharing the rest
    val rows = Seq.fill(300)("hot_a") ++ Seq.fill(200)("hot_b") ++ Seq.fill(100)("hot_c") ++
      (0 until 400).map(i => s"tail_${i % 397}")
    val df = rows.toDF("k")
    val got = ScaleTools.heavyHitters(df, "k", minShare = 0.05)
      .as[(String, Long, Boolean)].collect().sortBy(-_._2)
    got.map(t => (t._1, t._2)) shouldBe Array(("hot_a", 300L), ("hot_b", 200L), ("hot_c", 100L))
    got.map(_._3) shouldBe Array(true, true, true) // CMS estimate >= exact, always
    // exactness law vs the full groupBy at several thresholds
    for (share <- Seq(0.02, 0.1, 0.25)) {
      val exact = df.groupBy("k").count()
        .filter($"count" >= math.ceil(rows.size * share))
        .as[(String, Long)].collect().toSet
      ScaleTools.heavyHitters(df, "k", share)
        .select("k", "n").as[(String, Long)].collect().toSet shouldBe exact
    }
  }

  it should "ignore null keys and handle a threshold nothing reaches" in {
    val df = (Seq.fill(50)(Some("x")) ++ Seq.fill(10)(None) ++
      (0 until 40).map(i => Some(s"t$i"))).toDF("k")
    // nulls don't count toward any key; x = 50 of 100 total rows
    val hh = ScaleTools.heavyHitters(df, "k", minShare = 0.4)
      .as[(String, Long, Boolean)].collect()
    hh.map(t => (t._1, t._2)) shouldBe Array(("x", 50L))
    ScaleTools.heavyHitters(df, "k", minShare = 0.9).count() shouldBe 0L
    // ALL-null input: totalCount 0 makes the threshold 0, and without the
    // isNotNull guard the null group would pass the prefilter and emit
    val allNull = Seq.fill(20)(None: Option[String]).toDF("k")
    ScaleTools.heavyHitters(allNull, "k", minShare = 0.1).count() shouldBe 0L
  }
}
