package graft.queries

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Boundary semantics of the union+window as-of join used by q_asof_join:
  * inclusive match at equal timestamps (>= as-of), NULL when no prior right
  * row exists, and latest-wins across multiple candidates. */
class AsOfJoinSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def asof(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) = {
    // (id, user, ts) — ts as epoch seconds for readability
    val l = left.toDF("event_id", "user_id", "ts")
    val r = right.toDF("ref_event_id", "user_id", "ts")
      .groupBy("user_id", "ts").agg(max("ref_event_id").as("ref_event_id"))
    val tagged = r.select(col("user_id"), col("ts"),
        lit(null).cast("long").as("event_id"), col("ref_event_id"), lit(0).as("tag"))
      .unionByName(l.select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast("long").as("ref_event_id"), lit(1).as("tag")))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.withColumn("ref", last(col("ref_event_id"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select("event_id", "ref")
      .as[(Long, Option[Long])].collect().toMap
  }

  it should "match inclusively at equal timestamps (>= semantics)" in {
    asof(left = Seq((1L, 7L, 100L)), right = Seq((50L, 7L, 100L))) shouldBe
      Map(1L -> Some(50L))
  }

  it should "return NULL when no right row is at or before the left row" in {
    asof(left = Seq((1L, 7L, 100L)), right = Seq((50L, 7L, 101L))) shouldBe
      Map(1L -> None)
  }

  it should "pick the LATEST prior right row, per user" in {
    asof(
      left = Seq((1L, 7L, 100L), (2L, 7L, 300L), (3L, 8L, 300L)),
      right = Seq((50L, 7L, 90L), (51L, 7L, 200L), (60L, 8L, 10L))) shouldBe
      Map(1L -> Some(50L), 2L -> Some(51L), 3L -> Some(60L))
  }

  it should "break right-side ties at the same ts deterministically (max id)" in {
    asof(left = Seq((1L, 7L, 100L)), right = Seq((50L, 7L, 100L), (51L, 7L, 100L))) shouldBe
      Map(1L -> Some(51L))
  }
}
