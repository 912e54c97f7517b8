package graft.operators

import graft.TestSpark
import org.scalacheck.Gen
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/**
 * Property coverage of the chunking and span-coverage invariants over
 * arbitrary document lengths and window geometries — the boundary
 * arithmetic in both operators is exactly where off-by-ones hide, and the
 * example specs only pin a handful of hand-checked shapes.
 *
 * Cases are generated driver-side, batched into ONE DataFrame per law, and
 * run through the real operators in a single Spark job — property coverage
 * without per-case job overhead.
 */
class CorpusPropSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genCase: Gen[(Int, Int, Int)] = for {
    n <- Gen.choose(0, 120)
    max <- Gen.choose(1, 24)
    overlap <- Gen.choose(0, max - 1)
  } yield (n, max, overlap)

  /** Seeded sample — a failing generated case must reproduce run to run. */
  private def sampled[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed)).get

  "chunkDocuments" should "satisfy coverage, overlap-agreement, and progress laws for arbitrary geometries" in {
    // fixed seed batch: one (maxTokens, overlap) group per Spark call, so
    // group cases by geometry and run each group as one DataFrame
    val cases = sampled(Gen.listOfN(120, genCase), seed = 42L).distinct
    cases.groupBy { case (_, max, ov) => (max, ov) }.foreach { case ((max, ov), group) =>
      val docs = group.zipWithIndex.map { case ((n, _, _), i) =>
        (i.toLong, (0 until n).map(t => s"w$t").mkString(" "))
      }
      val byDoc = CorpusTools.chunkDocuments(docs.toDF("doc_id", "text"), "doc_id", "text", max, ov)
        .as[(Long, Int, Int, Int, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      group.zipWithIndex.foreach { case ((n, _, _), i) =>
        val chunks = byDoc.getOrElse(i.toLong, Array.empty)
        withClue(s"n=$n max=$max overlap=$ov: ") {
          if (n == 0) chunks shouldBe empty
          else {
            // 1. every token position covered exactly by the declared spans
            chunks.flatMap(c => c._3 until (c._3 + c._4)).toSet shouldBe (0 until n).toSet
            // 2. chunk ids dense from 0, starts strictly increasing by step
            chunks.map(_._2).toSeq shouldBe chunks.indices
            chunks.map(_._3).toSeq shouldBe chunks.indices.map(_ * (max - ov))
            // 3. every chunk adds at least one new token (no redundant tail)
            chunks.sliding(2).foreach {
              case Array(a, b) => (b._3 + b._4) should be > (a._3 + a._4)
              case _ =>
            }
            // 4. texts are the exact token slices
            chunks.foreach { c =>
              c._5 shouldBe (c._3 until (c._3 + c._4)).map(t => s"w$t").mkString(" ")
            }
          }
        }
      }
    }
  }

  "duplicatedSpans" should "match a brute-force coverage model on random corpora" in {
    // small alphabet forces cross-doc window collisions; the model recomputes
    // coverage from first principles
    val genDoc = for {
      len <- Gen.choose(0, 30)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
    } yield toks
    val n = 3
    val corpus = sampled(Gen.listOfN(14, genDoc), seed = 7L).zipWithIndex
      .map { case (toks, i) => (i.toLong, toks) }

    // model: window multiset across docs, a position is covered iff any
    // window containing it occurs in >= 2 distinct docs
    val winDocs = corpus.flatMap { case (id, toks) =>
      toks.sliding(n).filter(_.size == n).map(w => (w.mkString(" "), id))
    }.distinct.groupBy(_._1).view.mapValues(_.size).toMap
    val expected = corpus.map { case (id, toks) =>
      val hitPos = toks.sliding(n).zipWithIndex
        .filter { case (w, _) => w.size == n && winDocs(w.mkString(" ")) >= 2 }
        .map(_._2).toList
      val coveredTokens = hitPos.flatMap(p => p until (p + n)).toSet.size
      id -> ((toks.size, hitPos.size.toLong, coveredTokens.toLong))
    }.toMap

    val df = corpus.map { case (id, toks) => (id, toks.mkString(" ")) }.toDF("doc_id", "text")
    val got = CorpusTools.duplicatedSpans(df, "doc_id", "text", n)
      .as[(Long, Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    got.keySet shouldBe expected.keySet
    expected.foreach { case (id, (nt, dw, dt)) =>
      withClue(s"doc $id (${corpus.toMap.apply(id).mkString(" ")}): ") {
        // empty docs tokenize to one empty token (the shared convention)
        val adjusted = if (nt == 0) 1 else nt
        got(id) shouldBe ((adjusted, dw, dt))
      }
    }
  }

  "sampleN" should "match a brute-force md5-order model on random corpora" in {
    import java.security.MessageDigest
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val ids = sampled(Gen.listOfN(120, Gen.choose(0L, 5000L)), seed = 29L).distinct
    val n = 25
    val seed = "prop-sample"
    val expected = ids.sortBy(id => (md5hex(s"$seed:$id"), id)).take(n).toSet
    val got = CorpusTools.sampleN(
        ids.map(Tuple1(_)).toDF("doc_id"), "doc_id", n, seed)
      .as[Long].collect().toSet
    got shouldBe expected
  }

  "capPerGroup" should "match a brute-force md5-order model on random corpora" in {
    import java.security.MessageDigest
    val genRow = for {
      id <- Gen.choose(0L, 500L)
      grp <- Gen.oneOf("g0", "g1", "g2", "g3", "g4")
    } yield (id, grp)
    val rows = sampled(Gen.listOfN(160, genRow), seed = 13L)
      .distinctBy(_._1) // unique ids (the operator's id column is a key)
    val cap = 4
    val seed = "prop-cap"

    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val expected = rows.groupBy(_._2).flatMap { case (_, grpRows) =>
      grpRows.sortBy { case (id, _) => (md5hex(s"$seed:$id"), id) }.take(cap)
    }.toSet

    val got = CorpusTools.capPerGroup(
        rows.toDF("doc_id", "grp"), "grp", "doc_id", cap, seed)
      .select("doc_id", "grp").as[(Long, String)].collect().toSet
    got shouldBe expected
  }
}
