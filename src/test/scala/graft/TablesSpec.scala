package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Pins BOTH events-timestamp layouts the driver's generator has produced.
  *
  * The testdata regenerated mid-round-7 writes `ts` as TIMESTAMP(MICROS)
  * (read as TIMESTAMP_NTZ), where every earlier round saw TIMESTAMP(NANOS)
  * read as long under `nanosAsLong`. `Tables.events` dispatches on the read
  * dtype — and since the checked-in testdata now only exercises the NTZ
  * branch, the long→timestamp branch would be dead code in the suite without
  * this spec (the same silent-drift trap the round-6 NIO split created for
  * the file store's Hadoop branch).
  */
class TablesSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark

  // one event at 2024-03-01T12:00:00.000001500Z expressed in both layouts:
  // nanos-long keeps the 1500ns fraction; micros truncates to 1µs
  private val NanosTs = 1709294400000001500L
  private val MicrosTs = NanosTs / 1000

  private def writeFixture(dir: java.nio.file.Path, tsField: StructField,
      tsValue: Any): String = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("event_id", LongType), tsField,
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val row = org.apache.spark.sql.Row(1L, tsValue, 7L, "click", 1.5, "{}")
    spark.createDataFrame(List(row).asJava, schema)
      .write.mode("overwrite").parquet(dir.resolve("events.parquet").toString)
    dir.toString
  }

  "Tables.events" should "normalize the legacy nanos-as-long layout with integer truncation" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-nanos-")
    val sf = writeFixture(dir, StructField("ts", LongType), NanosTs)
    val df = Tables.events(spark, sf)
    df.schema("ts").dataType shouldBe TimestampType
    val got = df.select(unix_micros(col("ts"))).head.getLong(0)
    got shouldBe MicrosTs // div-truncated, never double-rounded
  }

  it should "pass the micros TIMESTAMP_NTZ layout through as the same session-UTC instant" in {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-ntz-")
    val sf = writeFixture(dir, StructField("ts", TimestampNTZType),
      java.time.LocalDateTime.ofEpochSecond(
        MicrosTs / 1000000, (MicrosTs % 1000000).toInt * 1000, java.time.ZoneOffset.UTC))
    val df = Tables.events(spark, sf)
    df.schema("ts").dataType shouldBe TimestampType
    df.select(unix_micros(col("ts"))).head.getLong(0) shouldBe MicrosTs
  }

  it should "produce identical rows from both layouts" in {
    val nanosDir = java.nio.file.Files.createTempDirectory("graft-events-n2-")
    val ntzDir = java.nio.file.Files.createTempDirectory("graft-events-m2-")
    val a = Tables.events(spark,
      writeFixture(nanosDir, StructField("ts", LongType), NanosTs)).collect()
    val b = Tables.events(spark,
      writeFixture(ntzDir, StructField("ts", TimestampNTZType),
        java.time.LocalDateTime.ofEpochSecond(
          MicrosTs / 1000000, (MicrosTs % 1000000).toInt * 1000,
          java.time.ZoneOffset.UTC))).collect()
    a should contain theSameElementsAs b
  }
}
