package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("v")).collect().head.getAs[T]("v")

  test("tokenCount: empty and all-space are 0; runs counted") {
    assert(one[Int](TextFunctions.tokenCount($"t"), "") == 0)
    assert(one[Int](TextFunctions.tokenCount($"t"), "   ") == 0)
    assert(one[Int](TextFunctions.tokenCount($"t"), " a  bb\tccc\n") == 3)
  }

  test("subwordCount splits letter/digit/punct runs") {
    assert(one[Int](TextFunctions.subwordCount($"t"), "ab12 cd!") == 4)
  }

  test("langId: marker voting + CJK detection + und") {
    assert(one[String](TextFunctions.langId($"t"),
      "the cat sat on the mat and it was good") == "en")
    assert(one[String](TextFunctions.langId($"t"),
      "le chat est dans la maison pour dormir") == "fr")
    assert(one[String](TextFunctions.langId($"t"), "你好世界") == "zh")
    assert(one[String](TextFunctions.langId($"t"), "xyzzy plugh") == "und")
  }

  test("fingerprint invariant to case and whitespace jitter") {
    val df = Seq("Hello  World", "hello world", "HELLO\tWORLD ").toDF("t")
      .select(TextFunctions.fingerprintMd5($"t").as("fp"),
        TextFunctions.fingerprint64($"t").as("fp64"))
    assert(df.select("fp").distinct().count() == 1)
    assert(df.select("fp64").distinct().count() == 1)
  }

  test("qualityScore in [0,1]; prose beats punctuation soup") {
    val q = (s: String) => one[Double](TextFunctions.qualityScore($"t"), s)
    val prose = q("the quick brown fox jumps over the lazy dog and it was good for all of them")
    val soup = q("!!! ??? ,,, ;;; ... ((( )))")
    assert(prose > soup)
    assert(prose >= 0.0 && prose <= 1.0 && soup >= 0.0 && soup <= 1.0)
  }

  test("redactPii: urls, emails, phones replaced; idempotent; count matches") {
    def red(s: String): (String, Int) = {
      val r = Seq(s).toDF("t").select(
        TextFunctions.redactPii(col("t")).as("r"),
        TextFunctions.piiCount(col("t")).as("n"))
        .collect().head
      (r.getString(0), r.getInt(1))
    }
    assert(red("mail me at jo.doe+x@ex-ample.co.uk today") ==
      (("mail me at <EMAIL> today", 1)))
    assert(red("see https://ex.com/a?b=c#d and http://y.io") ==
      (("see <URL> and <URL>", 2)))
    assert(red("call +44 (0)20 7946 0958 now") == (("call <PHONE> now", 1)))
    assert(red("a@b.com via https://a.b/c?mail=x@y.org tel 0123-456-7890") ==
      (("<EMAIL> via <URL> tel <PHONE>", 3)))
    assert(red("no pii here at all") == (("no pii here at all", 0)))
    // idempotent: tokens match none of the patterns
    val once = red("x@y.com and https://q.r and 01234567890")._1
    assert(red(once)._1 == once)
  }

  test("C4 heuristic signals: hand-checked keep decisions") {
    def sig(s: String): (Int, Boolean, Boolean, Boolean, Boolean) = {
      val r = Seq(s).toDF("t").select(
        TextFunctions.sentenceCount(col("t")).as("ns"),
        TextFunctions.hasLoremIpsum(col("t")).as("lo"),
        TextFunctions.hasCurlyBrace(col("t")).as("br"),
        TextFunctions.endsWithTerminalPunct(col("t")).as("tp"),
        TextFunctions.c4Keep(col("t")).as("k")).collect().head
      (r.getInt(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4))
    }
    assert(sig("A real sentence with enough words here.") ==
      ((1, false, false, true, true)))
    assert(sig("Lorem Ipsum dolor sit amet consectetur.") ==
      ((1, true, false, true, false)))      // placeholder text
    assert(sig("function f() { return 1; } extra words here.") ==
      ((1, false, true, true, false)))      // leaked code
    assert(sig("too short.") == ((1, false, false, true, false))) // < 5 tokens
    assert(sig("no terminal punctuation but plenty of words in this line") ==
      ((0, false, false, false, false)))
    assert(sig("") == ((0, false, false, false, false))) // empty-safe
  }

  test("htmlToText: block removal order, tag strip, entity order, collapse") {
    def ext(html: String): String =
      one[String](TextFunctions.htmlToText($"t"), html)
    // markup inside the script string dies WITH the script — if tag
    // stripping ran first, 'alert(1)' would leak into the text
    assert(ext("<p>keep</p><script>document.write(\"<b>alert(1)</b>\")</script><p>this</p>")
      == "keep this")
    assert(ext("<style media=\"x\">p { color: red }</style>prose") == "prose")
    // &amp; unescapes LAST: '&amp;lt;' means the literal text '&lt;'
    assert(ext("a &amp;lt; b") == "a &lt; b")
    assert(ext("x &lt;tag&gt; &quot;q&quot; &amp; y") == "x <tag> \"q\" & y")
    // unknown entities pass through; whitespace collapses; trim applies
    assert(ext("  <div>\n\ta &copy; b\n</div> ") == "a &copy; b")
    // multi-line script body (the (?s) flag is load-bearing)
    assert(ext("<script>\nvar a=1;\nvar b=2;\n</script>ok") == "ok")
    // escape∘extract is identity on plain text
    val tricky = "5 < 6 & \"7\" > 4"
    assert(one[String](TextFunctions.htmlToText(
      concat(lit("<p>"), TextFunctions.htmlEscape($"t"), lit("</p>"))), tricky)
      == tricky)
  }
}
