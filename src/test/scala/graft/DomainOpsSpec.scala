package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DomainOps
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.StreamUrlDoc

/** T39–T41 URL/domain curation + X23/X24 streaming faces: kernel
  * pinning, fixture non-vacuity, the ranked-window ≡ bounded-heap
  * equivalence, and stream ≡ batch under one blocklist.
  */
class DomainOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private val sf = "/root/testdata/sf0.001"

  private def ts(min: Int) = new Timestamp(3600_000L * 10 + min * 60_000L)

  test("host + registered-domain kernels: hand-pinned cases") {
    import spark.implicits._
    val cases = Seq(
      ("https://cdn.news.example.com/p/1?x=1", "cdn.news.example.com",
        "example.com"),
      // schemes and hosts are case-insensitive: a blocklisted domain
      // must not sail through in mixed case
      ("HTTPS://Tracker.ADSITE.BIZ/x", "tracker.adsite.biz",
        "adsite.biz"),
      ("https://mirror.badcontent.co.uk/p/2", "mirror.badcontent.co.uk",
        "badcontent.co.uk"), // two-label public suffix → three labels
      ("https://example.org/", "example.org", "example.org"),
      ("http://localhost/p", "localhost", "localhost"), // dotless: self
      ("https://a.b.site7.net/deep/path#frag", "a.b.site7.net",
        "site7.net"),
      ("not a url", "", "")) // no scheme://host → empty host/domain
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), DomainOps.urlHost(col("url")).as("h"))
      .select(col("url"), col("h"),
        DomainOps.registeredDomain(col("h")).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == cases)
    // and the gate itself blocks the mixed-case variant
    val gated = DomainOps.domainGate(
      Seq((1L, "HTTPS://Tracker.ADSITE.BIZ/x")).toDF("doc_id", "url"),
      DomainOps.DefaultBlockedDomains.toDF("domain")).collect()
    assert(gated.length == 1 && gated(0).getAs[Boolean]("blocked_domain")
      && !gated(0).getAs[Boolean]("keep"))
  }

  test("domain_filter: every planted rule fires on real rows") {
    val rows = DomainOps.domainFilterQuery(spark, sf).collect()
    assert(rows.length == 500)
    def count(p: org.apache.spark.sql.Row => Boolean) = rows.count(p)
    // both blocklisted domains hit (incl. the co.uk suffix case)
    assert(count(_.getAs[String]("domain") == "adsite.biz") > 0)
    assert(count(_.getAs[String]("domain") == "badcontent.co.uk") > 0)
    assert(rows.filter(_.getAs[String]("domain") == "badcontent.co.uk")
      .forall(_.getAs[Boolean]("blocked_domain")))
    // keyword rule fires independently of the blocklist
    assert(count(r => r.getAs[Boolean]("blocked_word") &&
      !r.getAs[Boolean]("blocked_domain")) > 0)
    // subdomain variants collapse to one registered domain
    assert(rows.filter(_.getAs[String]("host").endsWith("example.com"))
      .forall(_.getAs[String]("domain") == "example.com"))
    // and the gate keeps the majority
    assert(count(_.getAs[Boolean]("keep")) > 250)
    // keep is exactly the conjunction
    assert(rows.forall(r => r.getAs[Boolean]("keep") ==
      (!r.getAs[Boolean]("blocked_domain") &&
        !r.getAs[Boolean]("blocked_word"))))
  }

  test("domainCap window rank ≡ domainCapApply bounded heap (kept set + ranks)") {
    val ranked = DomainOps.domainCapQuery(spark, sf).collect()
      .filter(_.getAs[Boolean]("keep"))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("domain"),
        r.getAs[Int]("domain_rank"))).toSet
    val heap = DomainOps.domainCapApplyQuery(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("domain"),
        r.getAs[Int]("domain_rank"))).toSet
    assert(ranked == heap)
    assert(heap.nonEmpty)
  }

  test("domain cap: per-domain kept counts = min(cap, group size); drops exist") {
    val rows = DomainOps.domainCapQuery(spark, sf).collect()
    val byDom = rows.groupBy(_.getAs[String]("domain"))
    byDom.foreach { case (dom, rs) =>
      val kept = rs.count(_.getAs[Boolean]("keep"))
      assert(kept == math.min(25, rs.length), s"domain $dom")
    }
    // the fixture skew makes the cap bite (example.com ≈ 150 docs)
    assert(rows.exists(r => !r.getAs[Boolean]("keep")))
  }

  test("domainCapRebalance: verdict table is exactly the two-policy cross") {
    val rows = DomainOps.domainCapRebalanceQuery(spark, sf).collect()
    assert(rows.length == 500)
    val byV = rows.groupBy(_.getAs[String]("verdict")).view
      .mapValues(_.length).toMap
    // arrival order ≠ md5 order, so both reconcile verdicts fire
    assert(byV.getOrElse("evict", 0) > 0 && byV.getOrElse("admit", 0) > 0)
    assert(byV.getOrElse("evict", 0) == byV.getOrElse("admit", 0),
      "evict and admit counts must balance (same cap both policies)")
    rows.foreach { r =>
      val keep = r.getAs[Int]("domain_rank") <= 25
      val adm = r.getAs[Boolean]("was_admitted")
      val want = (adm, keep) match {
        case (true, true) => "keep"
        case (true, false) => "evict"
        case (false, true) => "admit"
        case _ => "out"
      }
      assert(r.getAs[String]("verdict") == want)
    }
  }

  test("X24 admission fed to domainCapRebalance reconciles the stream against batch") {
    import spark.implicits._
    // two domains, cap 2; arrival (doc_id) order disagrees with the
    // md5 order on purpose — the rebalance must evict the late-rank
    // admit and admit the early-rank refusal
    val docs = Seq(
      (1L, "https://a.com/1", "t one"), (2L, "https://a.com/2", "t two"),
      (3L, "https://a.com/3", "t three"), (4L, "https://a.com/4", "t four"),
      (5L, "https://b.net/5", "t five"), (6L, "https://b.net/6", "t six"))
      .toDF("doc_id", "url", "text")
    val in = MemoryStream[StreamUrlDoc]
    val q = StreamingOps.streamingDomainCap(in.toDS(), cap = 2)
      .writeStream.format("memory").queryName("rebalance_adm")
      .outputMode("append").start()
    val admitted =
      try {
        // one batch per doc pins arrival order = doc_id order
        docs.collect().sortBy(_.getAs[Long]("doc_id")).foreach { r =>
          in.addData(StreamUrlDoc(r.getAs[Long]("doc_id"), ts(0),
            r.getAs[String]("url")))
          q.processAllAvailable()
        }
        spark.table("rebalance_adm").collect()
          .filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id"))
      } finally q.stop()
    assert(admitted.toSet == Set(1L, 2L, 5L, 6L)) // first 2 per domain
    val reb = DomainOps.domainCapRebalance(docs,
        admitted.toSeq.toDF("doc_id"), cap = 2).collect()
    // the stream's admission is exactly was_admitted
    assert(reb.filter(_.getAs[Boolean]("was_admitted"))
      .map(_.getAs[Long]("doc_id")).toSet == admitted.toSet)
    // per-domain verdict accounting: kept set size == cap, evict ==
    // admit, and verdicts follow the cross
    val aCom = reb.filter(_.getAs[String]("domain") == "a.com")
    assert(aCom.count(r => Set("keep", "admit")
      .contains(r.getAs[String]("verdict"))) == 2)
    assert(aCom.count(_.getAs[String]("verdict") == "evict") ==
      aCom.count(_.getAs[String]("verdict") == "admit"))
  }

  test("X24 within-batch admission is replay-stable: pinned to " +
      "(ts, doc_id), independent of enqueue order") {
    import spark.implicits._
    // ONE micro-batch, one domain, cap 2; ts order deliberately
    // disagrees with doc_id order. Feeding the batch in two opposite
    // enqueue orders changes the group iterator's raw order — the
    // (ts, doc_id) pin must admit the SAME two docs both times.
    val docs = Seq(
      StreamUrlDoc(10, ts(4), "https://a.com/10"),
      StreamUrlDoc(11, ts(0), "https://a.com/11"),
      StreamUrlDoc(12, ts(3), "https://a.com/12"),
      StreamUrlDoc(13, ts(1), "https://a.com/13"),
      StreamUrlDoc(14, ts(2), "https://a.com/14"))
    def admitted(order: Seq[StreamUrlDoc], name: String): Set[Long] = {
      val in = MemoryStream[StreamUrlDoc]
      val q = StreamingOps.streamingDomainCap(in.toDS(), cap = 2)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        in.addData(order: _*)
        q.processAllAvailable()
        spark.table(name).collect()
          .filter(_.getAs[Boolean]("keep"))
          .map(_.getAs[Long]("doc_id")).toSet
      } finally q.stop()
    }
    val fwd = admitted(docs, "cap_pin_fwd")
    val rev = admitted(docs.reverse, "cap_pin_rev")
    assert(fwd == Set(11L, 13L), s"got $fwd") // smallest (ts, doc_id)
    assert(rev == fwd, s"replay drift: $rev vs $fwd")
  }

  test("X23 streaming URL gate ≡ batch gate under one blocklist") {
    import spark.implicits._
    val urls = DomainOps.domainFilterQuery(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("url")))
      .take(60)
    val blocklist = DomainOps.DefaultBlockedDomains.toDF("domain")
    val in = MemoryStream[StreamUrlDoc]
    val q = StreamingOps.streamingDomainGate(in.toDS(), blocklist)
      .writeStream.format("memory").queryName("domain_gate_out")
      .outputMode("append").start()
    try {
      in.addData(urls.map { case (id, u) => StreamUrlDoc(id, ts(0), u) })
      q.processAllAvailable()
      val got = spark.table("domain_gate_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("host"),
          r.getAs[String]("domain"), r.getAs[Boolean]("blocked_domain"),
          r.getAs[Boolean]("blocked_word"), r.getAs[Boolean]("keep")))
        .toSet
      val want = DomainOps
        .domainGate(urls.toSeq.toDF("doc_id", "url"), blocklist)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("host"),
          r.getAs[String]("domain"), r.getAs[Boolean]("blocked_domain"),
          r.getAs[Boolean]("blocked_word"), r.getAs[Boolean]("keep")))
        .toSet
      assert(got == want)
      assert(got.exists(!_._6) && got.exists(_._6))
    } finally q.stop()
  }

  test("X24 streaming per-domain cap admits exactly cap per domain, across batches") {
    import spark.implicits._
    val in = MemoryStream[StreamUrlDoc]
    val q = StreamingOps.streamingDomainCap(in.toDS(), cap = 2)
      .writeStream.format("memory").queryName("domain_cap_out")
      .outputMode("append").start()
    try {
      // batch 1: a.com ×2 (fills its quota exactly), b.net ×1.
      // Within-batch order across the two a.com docs is not pinned,
      // but both land inside the cap either way.
      in.addData(
        StreamUrlDoc(1, ts(0), "https://x.a.com/1"),
        StreamUrlDoc(2, ts(1), "https://y.a.com/2"),
        StreamUrlDoc(3, ts(2), "https://b.net/3"))
      q.processAllAvailable()
      // batch 2: a.com is over quota; b.net admits one more
      in.addData(
        StreamUrlDoc(4, ts(3), "https://a.com/4"),
        StreamUrlDoc(5, ts(4), "https://b.net/5"))
      q.processAllAvailable()
      // batch 3: b.net over quota too — refusals never reset
      in.addData(StreamUrlDoc(6, ts(5), "https://b.net/6"))
      q.processAllAvailable()
      val got = spark.table("domain_cap_out").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("domain"),
          r.getAs[Long]("domain_rank"), r.getAs[Boolean]("keep")))
        .sortBy(_._1)
      assert(got.map(g => g._1 -> g._4).toSeq ==
        Seq(1L -> true, 2L -> true, 3L -> true, 4L -> false,
          5L -> true, 6L -> false))
      // ranks are the cumulative arrival index per domain
      assert(got.filter(_._2 == "a.com").map(_._3).toSet == Set(1L, 2L, 3L))
      assert(got.find(_._1 == 4L).get._3 == 3L)
      assert(got.filter(_._2 == "b.net").map(_._3).toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
