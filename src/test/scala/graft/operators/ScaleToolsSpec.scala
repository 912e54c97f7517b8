package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class ScaleToolsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

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
}
