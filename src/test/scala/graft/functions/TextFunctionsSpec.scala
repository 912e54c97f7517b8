package graft.functions

import graft.TestSpark
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

class TextFunctionsSpec extends AnyFlatSpec with Matchers {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).head().getAs[T]("r")

  "tokens/tokenCount" should "split on whitespace runs, case-insensitively" in {
    one[Seq[String]](tokens($"t"), "The  Quick\tbrown fox ") shouldBe Seq("the", "quick", "brown", "fox")
    one[Int](tokenCount($"t"), "a b  c") shouldBe 3
  }

  "bpeishTokenCount" should "count word pieces, digit runs and punctuation" in {
    // 'hello' -> hell+o (2), ',' (1), 'world' -> worl+d (2), '42' (1)
    one[Int](bpeishTokenCount($"t"), "hello, world 42") shouldBe 6
  }

  "shingles" should "produce sliding word n-grams" in {
    one[Seq[String]](shingles($"t", 3), "a b c d") shouldBe Seq("a b c", "b c d")
    one[Seq[String]](shingles($"t", 3), "a b") shouldBe Seq("a b")
  }

  "langId" should "pick the language with most stopword hits" in {
    one[String](langId($"t"), "the cat sat on the mat and it was good") shouldBe "en"
    one[String](langId($"t"), "el gato que se sienta en la alfombra") shouldBe "es"
    one[String](langId($"t"), "der hund und die katze mit dem ball") shouldBe "de"
    one[String](langId($"t"), "le chien et les chats dans une maison") shouldBe "fr"
    one[String](langId($"t"), "xyzzy plugh quux") shouldBe "und"
  }

  "punctCount" should "count sentence punctuation" in {
    one[Int](punctCount($"t"), "a, b. c! d? e; f:") shouldBe 6
  }

  "qualityScore" should "rank clean prose above punctuation soup" in {
    val clean = "the quick brown fox jumps over the lazy dog and it was good to see"
    val soup = "!!! ??? ,,, ;;; x !!!"
    val qc = one[Double](qualityScore($"t"), clean)
    val qs = one[Double](qualityScore($"t"), soup)
    qc should be > qs
    qc should (be >= 0.0 and be <= 1.0)
    qs should (be >= 0.0 and be <= 1.0)
  }

  "textStats (fused)" should "equal the composed formulations field-for-field" in {
    import org.apache.spark.sql.functions.col
    // adversarial edges: empty, whitespace-only, leading tab (Spark trim
    // strips SPACES only; Java split keeps a leading empty token), trailing
    // whitespace, unicode, NBSP (non-space under Java \s), punctuation soup
    val edges = Seq(
      "", " ", "\t", "\tleading tab", "trailing tab\t", "\tboth\t",
      "a  b\tc\nd", "trailing space  ",
      "the of and to in is a that for it", "el la de que y en un",
      "der die und das zu den", "le la les de des et un",
      "über naïve café   nbsp", "!!!...;;;:::", "one",
      "  spaces all around  ", "mixed THE Of AnD tokens")
    val df = edges.toDF("t")
    val fused = df.select(textStats(col("t")).as("st"))
      .select(col("st.n_tokens"), col("st.sw_en"), col("st.sw_es"), col("st.sw_de"),
        col("st.sw_fr"), col("st.n_punct"), col("st.n_nonspace"), col("st.n_chars"))
      .collect().map(_.toSeq)
    val composed = df.select(
        tokenCount(col("t")),
        stopwordCount(col("t"), StopwordsEn), stopwordCount(col("t"), StopwordsEs),
        stopwordCount(col("t"), StopwordsDe), stopwordCount(col("t"), StopwordsFr),
        punctCount(col("t")),
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.regexp_replace(
            org.apache.spark.sql.functions.trim(col("t")), "\\s+", "")),
        org.apache.spark.sql.functions.length(col("t")))
      .collect().map(_.toSeq)
    fused.zip(composed).zip(edges).foreach { case ((f, c), t) =>
      withClue(s"text='$t': ") { f shouldBe c }
    }
    // and the derived columns agree on real documents
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val both = docs.select(textStats(col("text")).as("st"), col("text"))
      .select(
        langIdFromStats(col("st")).as("lp_f"), langId(col("text")).as("lp_c"),
        qualityScoreFromStats(col("st")).as("q_f"), qualityScore(col("text")).as("q_c"),
        meanWordLengthFromStats(col("st")).as("m_f"), meanWordLength(col("text")).as("m_c"))
    both.filter(col("lp_f") =!= col("lp_c")).count() shouldBe 0
    both.filter(col("q_f") =!= col("q_c")).count() shouldBe 0
    both.filter(col("m_f") =!= col("m_c")).count() shouldBe 0
  }

  it should "equal the composed formulations on generated adversarial strings" in {
    import org.apache.spark.sql.functions.col
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // characters chosen to stress every boundary: all Java \s chars, NBSP
    // (non-space under \s), stopwords, ASCII upper/lower, punctuation,
    // digits, unicode letters, astral plane (surrogate pairs)
    val atom = Gen.oneOf(
      Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r", "\u00A0"),
      Gen.oneOf(TextFunctions.StopwordsEn ++ TextFunctions.StopwordsEs ++
        TextFunctions.StopwordsDe ++ TextFunctions.StopwordsFr),
      Gen.oneOf("THE", "Der", "lE", "Une"),
      Gen.oneOf(".", "!", "?", ",", ";", ":", "..."),
      Gen.oneOf("word", "x", "überlang", "naïve", "😀", "a1b2", "    "))
    val genText = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, atom).map(_.mkString))
    val texts = Gen.listOfN(400, genText).apply(Gen.Parameters.default, Seed(7L)).get
    val df = texts.toDF("t")
    val fused = df.select(textStats(col("t")).as("st"))
      .select(col("st.n_tokens"), col("st.sw_en"), col("st.sw_es"), col("st.sw_de"),
        col("st.sw_fr"), col("st.n_punct"), col("st.n_nonspace"), col("st.n_chars"))
      .collect().map(_.toSeq)
    val composed = df.select(
        tokenCount(col("t")),
        stopwordCount(col("t"), StopwordsEn), stopwordCount(col("t"), StopwordsEs),
        stopwordCount(col("t"), StopwordsDe), stopwordCount(col("t"), StopwordsFr),
        punctCount(col("t")),
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.regexp_replace(
            org.apache.spark.sql.functions.trim(col("t")), "\\s+", "")),
        org.apache.spark.sql.functions.length(col("t")))
      .collect().map(_.toSeq)
    fused.zip(composed).zip(texts).foreach { case ((f, c), t) =>
      withClue(s"text=${t.map(ch => f"\\u${ch.toInt}%04x").mkString}: ") { f shouldBe c }
    }
  }

  "cleanText" should "strip tags with token boundaries and collapse whitespace" in {
    one[String](cleanText($"t"),
      "<html><body><p class=\"x\">hello<br>world</p>\n\n  <div>bye</div></body></html>") shouldBe
      "hello world bye"
    // attributes with '>' inside quotes are NOT handled (tag-level regex, by
    // contract); plain text passes through untouched modulo whitespace
    one[String](cleanText($"t"), "  no   markup\there ") shouldBe "no markup here"
    one[String](stripHtml($"t"), "a<br/>b") shouldBe "a b"
    one[String](collapseWhitespace($"t"), " a \n\n b\t c ") shouldBe "a b c"
  }

  "fingerprints" should "be stable and shingle-min robust to word appends" in {
    val t = "the quick brown fox jumps over the lazy dog"
    one[String](docFingerprint($"t"), t) shouldBe one[String](docFingerprint($"t"), t + " ")
    // appending one word can only add shingles -> min can only stay or decrease;
    // for this fixture it stays identical
    val a = one[String](minShingleFingerprint($"t"), t)
    val b = one[String](minShingleFingerprint($"t"), t + " end")
    assert(b <= a)
  }

  "urlHost" should "extract the lower-cased authority host" in {
    one[String](urlHost($"t"), "https://WWW.Example.COM/path?q=1") shouldBe "www.example.com"
    one[String](urlHost($"t"), "http://user:pw@site.org:8080/x") shouldBe "site.org"
    one[String](urlHost($"t"), "ftp://files.example.net") shouldBe "files.example.net"
    // schemeless / relative: loud empty, not a guess
    one[String](urlHost($"t"), "www.example.com/path") shouldBe ""
    one[String](urlHost($"t"), "not a url") shouldBe ""
  }

  "registeredDomain" should "apply the ccSLD heuristic" in {
    one[String](registeredDomain($"t"), "www.sub.example.com") shouldBe "example.com"
    one[String](registeredDomain($"t"), "news.bbc.co.uk") shouldBe "bbc.co.uk"
    one[String](registeredDomain($"t"), "a.b.gov.au") shouldBe "b.gov.au"
    // 'com' under a >2-letter TLD is NOT a ccSLD: last two labels win
    one[String](registeredDomain($"t"), "x.com.example") shouldBe "com.example"
    one[String](registeredDomain($"t"), "Example.COM") shouldBe "example.com"
    one[String](registeredDomain($"t"), "localhost") shouldBe "localhost"
  }

  it should "have the documented boundary: core ccSLDs group right, PSL-only suffixes over-merge" in {
    // table-driven contract for the CcSecondLevels approximation: column 3
    // is what a FULL Public Suffix List would produce — where they differ,
    // the divergence is the documented over-merge, not an accident. At
    // per-domain-cap time an over-merged registry shares ONE cap bucket.
    val table = Seq(
      // host                 heuristic (tested)      full-PSL (for the reader)
      ("example.co.uk",       "example.co.uk",        "example.co.uk"),  // core ccSLD: right
      ("www.example.com.au",  "example.com.au",       "example.com.au"), // core ccSLD: right
      ("www.gov.uk",          "www.gov.uk",           "www.gov.uk"),     // gov core: right
      ("shop.example.co.jp",  "example.co.jp",        "example.co.jp"),  // co.jp core: right
      ("user.github.io",      "github.io",            "user.github.io"), // private registry: over-merged
      ("blog.blogspot.com",   "blogspot.com",         "blog.blogspot.com"), // private registry: over-merged
      ("x.ne.jp",             "ne.jp",                "x.ne.jp"),        // ccSLD outside the core: over-merged
      ("y.or.kr",             "or.kr",                "y.or.kr"))        // ccSLD outside the core: over-merged
    table.foreach { case (host, expected, _) =>
      withClue(s"host $host: ") {
        one[String](registeredDomain($"t"), host) shouldBe expected
      }
    }
    // the over-merge direction is always COARSER, never finer: the heuristic
    // result is a suffix of what the PSL would return, so a per-domain cap
    // under-represents, it never double-counts
    table.foreach { case (host, heuristic, psl) =>
      psl should endWith(heuristic)
    }
  }

  "urlDomain" should "compose host extraction and domain grouping" in {
    one[String](urlDomain($"t"), "https://u@News.BBC.co.uk:443/story") shouldBe "bbc.co.uk"
    one[String](urlDomain($"t"), "nonsense") shouldBe ""
  }
}
