package graft.operators

import graft.TestSpark
import org.scalacheck.Gen
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * Property coverage for [[ScaleTools.heavyHitters]]: the exactness claim
 * ("equals the full groupBy + HAVING") must hold for ARBITRARY key
 * distributions and thresholds, not just the hand-built hot/tail fixture —
 * the sketch's no-false-negative guarantee is probabilistic machinery and
 * the exact HAVING is what turns it into a deterministic operator, so the
 * law to hammer is the composition, across skews, null fractions, and
 * thresholds including edge values nothing reaches.
 */
class HeavyHittersPropSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sampled[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  // a skewed corpus: nHot hot keys with geometric-ish weights over a
  // uniform tail, plus a null fraction (invisible to every count)
  private val genCase: Gen[(Int, Int, Int, Int, Double)] = for {
    nHot <- Gen.choose(0, 5)
    hotWeight <- Gen.choose(20, 200)
    tailKeys <- Gen.choose(1, 300)
    tailRows <- Gen.choose(0, 400)
    share <- Gen.oneOf(0.01, 0.03, 0.08, 0.2, 0.95)
  } yield (nHot, hotWeight, tailKeys, tailRows, share)

  "heavyHitters" should "equal the full groupBy for arbitrary skews, null fractions, and thresholds" in {
    val cases = sampled(Gen.listOfN(8, genCase), seed = 7L)
    cases.zipWithIndex.foreach { case ((nHot, hotWeight, tailKeys, tailRows, share), i) =>
      val rnd = new scala.util.Random(100 + i)
      val rows: Seq[Option[String]] =
        (0 until nHot).flatMap(h => Seq.fill(hotWeight / (h + 1))(Some(s"hot$h"))) ++
          (0 until tailRows).map(_ => Some(s"t${rnd.nextInt(tailKeys)}")) ++
          Seq.fill(rnd.nextInt(30))(None)
      val df = rnd.shuffle(rows).toDF("k")

      val got = ScaleTools.heavyHitters(df, "k", share)
        .select("k", "n").as[(String, Long)].collect().toSet
      val nonNull = rows.count(_.isDefined)
      val threshold = math.ceil(nonNull * share).toLong
      val expected = rows.flatten.groupBy(identity)
        .collect { case (k, g) if g.size >= threshold && threshold > 0 => (k, g.size.toLong) }
        .toSet
      withClue(s"case $i (nHot=$nHot hotWeight=$hotWeight tailKeys=$tailKeys " +
          s"tailRows=$tailRows share=$share threshold=$threshold): ") {
        got shouldBe expected
        // the soundness flag holds on every reported row
        ScaleTools.heavyHitters(df, "k", share)
          .filter(!org.apache.spark.sql.functions.col("cms_sound")).count() shouldBe 0L
      }
    }
  }

  it should "be exact over INTEGRAL keys (long and int), hashing the widened long domain" in {
    // same skews as the string arm, keys mapped to numbers — the sketch agg
    // widens integral values to long, and the probe must hash the SAME
    // domain (a string-formatted probe would silently return zero for every
    // key and report nothing)
    val cases = sampled(Gen.listOfN(6, genCase), seed = 21L)
    cases.zipWithIndex.foreach { case ((nHot, hotWeight, tailKeys, tailRows, share), i) =>
      val rnd = new scala.util.Random(300 + i)
      val rows: Seq[Option[Long]] =
        (0 until nHot).flatMap(h => Seq.fill(hotWeight / (h + 1))(Some(1000000L + h))) ++
          (0 until tailRows).map(_ => Some(rnd.nextInt(tailKeys).toLong)) ++
          Seq.fill(rnd.nextInt(30))(None)
      val nonNull = rows.count(_.isDefined)
      val threshold = math.ceil(nonNull * share).toLong
      val expected = rows.flatten.groupBy(identity)
        .collect { case (k, g) if g.size >= threshold && threshold > 0 => (k, g.size.toLong) }
        .toSet
      withClue(s"long case $i (share=$share threshold=$threshold): ") {
        val dfL = rnd.shuffle(rows).toDF("k")
        ScaleTools.heavyHitters(dfL, "k", share)
          .select("k", "n").as[(Long, Long)].collect().toSet shouldBe expected
      }
      withClue(s"int case $i (share=$share threshold=$threshold): ") {
        // the int column exercises the widening path end to end; key values
        // here all fit in Int
        val dfI = rnd.shuffle(rows).map(_.map(_.toInt)).toDF("k")
        ScaleTools.heavyHitters(dfI, "k", share)
          .select("k", "n").as[(Int, Long)].collect().toSet shouldBe
          expected.map { case (k, n) => (k.toInt, n) }
      }
    }
  }

  it should "still reject non-integral, non-string key types" in {
    import org.apache.spark.sql.functions._
    val df = Seq(1.0, 2.0).toDF("k")
    an[IllegalArgumentException] should be thrownBy
      ScaleTools.heavyHitters(df, "k", 0.5)
    val dfd = spark.range(3).select(current_date().as("k"))
    an[IllegalArgumentException] should be thrownBy
      ScaleTools.heavyHitters(dfd, "k", 0.5)
  }
}
