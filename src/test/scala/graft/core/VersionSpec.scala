package graft.core

import java.time.Instant
import java.util.UUID
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class VersionSpec extends AnyFlatSpec with Matchers {

  val genVersion: Gen[Version] = for {
    epochSec <- Gen.choose(0L, 4102444800L) // 1970..2100
    nanos <- Gen.choose(0L, 999999999L)
    hi <- Gen.long
    lo <- Gen.long
  } yield Version(Instant.ofEpochSecond(epochSec, nanos), new UUID(hi, lo))

  "Version label" should "match the reference golden format" in {
    val v = Version(
      Instant.parse("2018-11-02T23:59:12.987654321Z"),
      UUID.fromString("4920d06f-2233-4b4a-9521-8e730eee89c5"))
    v.label shouldBe "20181102-235912.987654321-4920d06f-2233-4b4a-9521-8e730eee89c5"
  }

  it should "round-trip through parse" in {
    val vs = Gen.listOfN(300, genVersion)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("gen failed"))
    vs.filterNot(_ == Version.Unversioned).foreach { v =>
      Version.parse(v.label) shouldBe Right(v)
    }
  }

  "Version.Unversioned" should "have an empty label and round-trip" in {
    Version.Unversioned.label shouldBe ""
    Version.parse("") shouldBe Right(Version.Unversioned)
  }

  "Version.parse" should "reject garbage" in {
    List("foo", "20181102-235912-xyz", "20181102-4920d06f-2233-4b4a-9521-8e730eee89c5")
      .foreach(s => Version.parse(s).isLeft shouldBe true)
  }

  "Version.generate" should "produce strictly increasing timestamps" in {
    val vs = (1 to 1000).map(_ => Version.generate())
    vs.sliding(2).foreach { case Seq(a, b) => assert(a.timestamp.isBefore(b.timestamp)) }
    vs.map(_.uuid).distinct.size shouldBe 1000
  }

  it should "generate labels that sort in generation order" in {
    val vs = (1 to 100).map(_ => Version.generate())
    vs.map(_.label).sorted shouldBe vs.map(_.label)
  }
}
