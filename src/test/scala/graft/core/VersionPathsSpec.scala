package graft.core

import java.net.URI
import java.time.Instant
import java.util.UUID
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class VersionPathsSpec extends AnyFlatSpec with Matchers {

  val v: Version = Version(
    Instant.parse("2019-03-13T23:59:00.123456789Z"),
    UUID.fromString("4920d06f-2233-4b4a-9521-8e730eee89c5"))

  "pathFor" should "append a _version dir" in {
    VersionPaths.pathFor(new URI("file:/t/date=2019-03-13"), v) shouldBe
      new URI(s"file:/t/date=2019-03-13/_version=${v.label}/")
  }

  it should "map Unversioned to the base path itself" in {
    val base = new URI("file:/t/date=2019-03-13")
    VersionPaths.pathFor(base, Version.Unversioned) shouldBe base
  }

  "parseVersion" should "recover the version from a location" in {
    VersionPaths.parseVersion(new URI(s"file:/t/date=2019-03-13/_version=${v.label}")) shouldBe v
    VersionPaths.parseVersion(new URI(s"file:/t/date=2019-03-13/_version=${v.label}/")) shouldBe v
  }

  it should "yield Unversioned for plain paths" in {
    VersionPaths.parseVersion(new URI("file:/t/date=2019-03-13")) shouldBe Version.Unversioned
  }

  "versionedToBasePath" should "strip the version element" in {
    VersionPaths.versionedToBasePath(new URI(s"file:/t/date=2019-03-13/_version=${v.label}")) shouldBe
      new URI("file:/t/date=2019-03-13/")
  }

  it should "leave unversioned paths alone" in {
    val base = new URI("file:/t/date=2019-03-13")
    VersionPaths.versionedToBasePath(base) shouldBe base
  }

  "path round-trip" should "hold" in {
    val base = new URI("file:/tables/t1/date=2019-01-01/")
    val versioned = VersionPaths.pathFor(base, v)
    VersionPaths.parseVersion(versioned) shouldBe v
    VersionPaths.versionedToBasePath(versioned) shouldBe base
  }

  "resolveVersionedPartitionPaths" should "build full partition paths" in {
    val root = new URI("file:/tables/t1")
    val p = Partition("date", "2019-01-01")
    VersionPaths.resolveVersionedPartitionPaths(Map(p -> v), root) shouldBe
      Map(p -> new URI(s"file:/tables/t1/date=2019-01-01/_version=${v.label}/"))
  }
}
