package graft.functions

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** All vector expressions share FloatVectorDot's null semantics: any null
  * element yields NULL (round-2 hardening — Normalize/Quantize previously
  * read nulls as garbage from the unsafe array). */
class VectorNullSemanticsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark

  private def dfWithNullElement = {
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("v", ArrayType(FloatType, containsNull = true), nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1, Seq[java.lang.Float](1.0f, null, 3.0f)),
        Row(2, Seq[java.lang.Float](3.0f, 4.0f)),
        Row(3, null)),
      schema)
  }

  "l2Normalize" should "return NULL on any null element, values otherwise" in {
    val out = dfWithNullElement
      .select(col("id"), VectorExpressions.l2Normalize(col("v")).as("n"))
      .orderBy("id").collect()
    out(0).isNullAt(1) shouldBe true
    out(1).getSeq[Float](1) shouldBe Seq(0.6f, 0.8f)
    out(2).isNullAt(1) shouldBe true
  }

  "quantizeInt8" should "return NULL on any null element, values otherwise" in {
    val out = dfWithNullElement
      .select(col("id"), VectorExpressions.quantizeInt8(col("v")).as("q"))
      .orderBy("id").collect()
    out(0).isNullAt(1) shouldBe true
    val struct = out(1).getStruct(1)
    struct.getDouble(0) shouldBe (4.0 / 127.0) +- 1e-12
    struct.getSeq[Byte](1) shouldBe Seq(95.toByte, 127.toByte)
    out(2).isNullAt(1) shouldBe true
  }

  "floatVectorDot" should "keep returning NULL on null elements (regression guard)" in {
    val out = dfWithNullElement
      .select(col("id"), VectorExpressions.dotNative(col("v"), col("v")).as("d"))
      .orderBy("id").collect()
    out(0).isNullAt(1) shouldBe true
    out(1).getDouble(1) shouldBe 25.0
    out(2).isNullAt(1) shouldBe true
  }
}
