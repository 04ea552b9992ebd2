package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** T45 kernel ≡ regex-chain differential spec: the single-scan-per-
  * rule kernel (HashKernels.htmlText) must reproduce the historical
  * `regexp_replace` chain (TextOps.htmlTextRegex — the shape the
  * DuckDB oracle mirrors) BYTE-IDENTICALLY, on the planted fixture
  * pages of both registered faces AND on an adversarial battery of
  * malformed markup chosen to hit every rule's backtracking edges.
  */
class HtmlKernelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def diff(html: Seq[String]): Unit = {
    import spark.implicits._
    val rows = html.toDF("html")
      .select(col("html"),
        TextOps.htmlTextOf(col("html")).as("kernel"),
        TextOps.htmlTextRegex(col("html")).as("chain"))
      .collect()
    val bad = rows.filter(r => r.getString(1) != r.getString(2))
    assert(bad.isEmpty, bad.take(3).map(r =>
      s"html=<<${r.getString(0)}>>\nkernel=<<${r.getString(1)}>>" +
        s"\nchain=<<${r.getString(2)}>>").mkString("\n---\n"))
  }

  test("kernel == chain on both planted fixture faces (sf0.001)") {
    val docs = graft.Tables.documents(spark, sf)
    val planted = TextOps.plantHtml(docs)
      .select(col("html")).collect().map(_.getString(0)).toSeq
    val web = TextOps.plantWebPage(docs)
      .select(col("html")).collect().map(_.getString(0)).toSeq
    diff(planted)
    diff(web)
  }

  test("kernel == chain on the adversarial markup battery") {
    diff(Seq(
      // unclosed script: rule 1 fails, rule 5 eats only the start tag
      "before<script>var a = 1 < 2;",
      "before<script>x</SCRIPT>after",
      "<ScRiPt a=b>x\n\ny</sCrIpT>tail",
      // <script with no '>' at all
      "a<script no-gt",
      // script prefix without boundary STILL starts a match (regex
      // has no \b after 'script')
      "<scripts>gone</script>kept",
      // closing tag with a space does NOT terminate (literal </script>)
      "a<script>x</script >y</script>z",
      // style inside script content dies with the script
      "a<script><style>s{}</style></script>b<style>c{}</style>d",
      // script-close inside a comment: script pass runs FIRST
      "a<!-- <script> -->b<script>c</script>d",
      "a<script><!-- </script>b -->c",
      // comment edges
      "x<!---->y", "x<!--->y", "x<!--a<!--b-->c-->d", "pre<!--unclosed",
      // block-tag boundary cases
      "<p>a</p>", "<br/>", "<BR>", "<h1>t</h1>", "<h6>u</h6>",
      "<h7>keep</h7>", "<h1x>keep</h1x>", "<ulx>keep</ulx>",
      "<td>cell</td>", "<tr><td>c</td></tr>",
      "<div\nclass='x'>multi</div>",
      // malformed attribute quote: [^>]* swallows '<' up to next '>'
      "<p>keep</p><div class=\"oops</body></html>",
      "<p>keep</p><em class=\"oops</body></html>",
      // '<' with no '>' after: rule 5 leaves the tail verbatim
      "a<b then <em>c</em> and < d",
      "trail<",
      // entity torture: sequential-pass semantics
      "&amp;lt; stays &lt; goes",
      "&amp;amp; double",
      "&&nbsp;amp; join-after-replace must NOT decode",
      "&am&nbsp;p; ditto",
      "&nbsp;&lt;&gt;&quot;&#39;&amp;",
      "&NBSP; case sensitive entities stay",
      // whitespace: \f and  are outside rules 7/8 but trim
      "a \f\n b", " lead", "tail \f ", " \t\r\n mixed \n\t ",
      "one\n\n\ntwo \n \n three",
      // unicode: long-s must NOT case-fold into 'script' (ASCII ci)
      "<ſcript>keep</ſcript>",
      // java \b is UNICODE-word: é continues the tag name (<divé is
      // NOT a block tag), € does not (<div€> IS one) — the shrunk
      // ScalaCheck counterexample that caught the ASCII-\b kernel bug
      "<divé<DIV>", "<divé>x</div>", "<div€>y", "<h1é>z", "<p中>w",
      "café <p>中文</p> 😀<div>emoji</div>",
      // empty / no-markup
      "", "   ", "plain text", "  padded  "))
  }

  test("kernel matches the hand-pinned expectations (regression)") {
    import spark.implicits._
    val cases = Seq(
      ("<html><head><style>a{x}</style></head><body>" +
        "<h1>Title</h1><p>one two</p><script>var a = 1 < 2;</script>" +
        "<p>three</p></body></html>", "Title\none two\nthree"),
      ("<p>a &lt;tag&gt; &quot;q&#39; &amp;amp; b&nbsp;c</p>",
        "a <tag> \"q' &amp; b c"),
      ("<p>keep</p><div class=\"oops</body></html>", "keep"),
      ("<p>a   b</p>\n\n\n<p>c\t d</p>", "a b\nc d"),
      ("  plain text  ", "plain text"))
    val got = cases.map(_._1).toDF("html")
      .select(TextOps.htmlTextOf(col("html")))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2))
  }
}
