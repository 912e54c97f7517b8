package graft.operators

import graft.TestSpark
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class MultimodalSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  val media = Seq(
    MediaRecord(1L, "image", "hello world".getBytes("UTF-8"), "s1"),
    MediaRecord(2L, "video", Array.tabulate[Byte](100)(_.toByte), "s1"),
    MediaRecord(3L, "audio", Array.empty[Byte], "s2")
  ).toDS()

  "extractFeatures" should "produce deterministic stub features" in {
    val f = Multimodal.extractFeatures(media).collect().map(m => m.media_id -> m).toMap
    f(1L).n_bytes shouldBe 11
    f(1L).width shouldBe 11
    f(1L).height shouldBe 11
    f(1L).n_frames shouldBe 1
    f(1L).brightness shouldBe "hello world".getBytes("UTF-8").map(_ & 0xff).sum.toDouble / 11 +- 1e-9
    f(2L).n_frames shouldBe 1 + 100 % 30
    f(3L).n_bytes shouldBe 0
    f(3L).brightness shouldBe 0.0
  }

  "sampleFrames" should "emit one row per sampled frame for videos only" in {
    val frames = Multimodal.sampleFrames(media, everyNth = 3).collect()
    frames.map(_.getAs[Long]("media_id")).distinct shouldBe Array(2L)
    val expected = (0 until (1 + 100 % 30) by 3).size
    frames.length shouldBe expected
    frames.foreach(r => r.getAs[Array[Byte]]("frame_bytes").length should be <= 16)
  }

  "fromDocuments" should "derive deterministic kinds and payloads from testdata" in {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val ds = Multimodal.fromDocuments(spark, docs)
    val rows = ds.collect()
    rows.length shouldBe docs.count()
    rows.foreach { r =>
      r.kind shouldBe Seq("image", "audio", "video")((r.media_id % 3).toInt)
      r.bytes should not be empty
    }
  }
}
