package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** T39–T41 — URL/DOMAIN-LEVEL CURATION: the first stage of the
  * published web-corpus pipelines (RefinedWeb §3.1's URL filtering;
  * the per-host document caps of the C4/Dolma lineage), which runs
  * BEFORE any text is read — a malformed or blocklisted URL kills a
  * page for free, and a per-domain cap stops one crawler-friendly
  * host from dominating the corpus.
  *
  * Three faces:
  *  - a registered-domain kernel (host capture + a public-suffix-
  *    aware last-labels rule) as pure codegen'd projections;
  *  - a blocklist + URL-keyword gate ([[domainGate]]) — broadcast
  *    semi-join against the domain blocklist, keyword scan over the
  *    URL string; works unchanged on a streaming frame (stateless
  *    projections + one stream-static broadcast join);
  *  - per-domain caps in deterministic hash order, in BOTH §2.5
  *    dual shapes (the T35 convention): the full ranked table
  *    ([[domainCapQuery]], per-domain sort) and the bounded-heap
  *    kept-set ([[domainCapApplyQuery]], TopKBy — at most cap
  *    entries per domain per partition reach the shuffle, the
  *    100 TB shape when only the kept set is needed).
  *
  * The sf corpora carry no URL column, so the registered faces PLANT
  * a deterministic doc_id-derived URL (the pii_scrub precedent):
  * skewed across hosts, subdomain variants of one registered domain,
  * two blocklisted domains, a two-label public suffix (co.uk) and a
  * keyword-flagged query string — every rule fires on real rows. The
  * oracle SQL plants the identical URL.
  */
object DomainOps {

  /** Host capture from `scheme://host[/path]` — group 1. Anything
    * before the first `/`, `?` or `#` after the scheme; ports and
    * userinfo stay in the host (blocklists match on the registered
    * domain below, which strips neither — real pipelines normalize
    * upstream).
    */
  private[graft] val UrlHostRe = "^[a-z][a-z0-9+.-]*://([^/?#]+)"

  /** Registered-domain capture over a host: last two labels, or last
    * three when the public suffix itself has two labels. The
    * alternation is a mini public-suffix set; production generates
    * the same alternation from the full PSL data file (it is a
    * regular language — the kernel shape does not change).
    */
  private[graft] val RegDomainRe =
    "([^.]+\\.(?:co\\.uk|org\\.uk|com\\.au|co\\.jp)|[^.]+\\.[^.]+)$"

  /** Host of a URL ('' when the URL has no scheme://host shape).
    * Extracted from the LOWERCASED url: schemes and hosts are
    * case-insensitive (RFC 3986 §6.2.2.1), and a case-sensitive
    * blocklist would otherwise be bypassable by
    * 'HTTPS://Tracker.ADSITE.BIZ' — the keyword rule already
    * lowercases, so the gate is case-insensitive end to end.
    */
  def urlHost(url: Column): Column =
    regexp_extract(lower(url), UrlHostRe, 1)

  /** Registered domain of a host; a host with no dot (localhost, an
    * IP label) falls back to itself.
    */
  def registeredDomain(host: Column): Column = {
    val d = regexp_extract(host, RegDomainRe, 1)
    when(d === lit(""), host).otherwise(d)
  }

  /** Default registered blocklist + URL keywords for the registered
    * faces (two domains the planted fixture hits, incl. the co.uk
    * suffix case; keywords fire via the planted query string).
    */
  val DefaultBlockedDomains: Seq[String] =
    Seq("adsite.biz", "badcontent.co.uk")
  val DefaultBadUrlWords: Seq[String] = Seq("casino", "xxx")

  /** Deterministic per-domain selection key (the T8 md5-order
    * convention): first 13 hex digits of md5(text) as a long. 52
    * bits — exact in a double, so the SAME key drives the window
    * rank and the TopKBy heap (whose ord is a double); doc_id breaks
    * the (astronomically unlikely) prefix ties everywhere.
    */
  def selectionKey(text: Column): Column =
    conv(substring(md5(text), 1, 13), 16, 10).cast("long")

  /** The URL gate over any frame with a `url` column — batch or
    * streaming (stateless projections + one broadcast join; no
    * watermark interaction). `blocklist` is a `(domain)` frame of
    * REGISTERED domains: broadcast here (a real blocklist is a few
    * million short strings — tens of MB), left-joined for the flag;
    * swap the broadcast for a plain left join if a blocklist ever
    * outgrows the driver. Keyword rule: any of `badUrlWords` as a
    * substring of the lowercased URL (RefinedWeb scores URL words;
    * the hard-match form keeps the gate oracle-checkable).
    */
  def domainGate(docs: DataFrame, blocklist: DataFrame,
      badUrlWords: Seq[String] = DefaultBadUrlWords): DataFrame = {
    require(badUrlWords.forall(w =>
        w.nonEmpty && w == w.toLowerCase && !w.exists(_.isWhitespace)),
      "badUrlWords must be non-empty lowercase, whitespace-free")
    val marked = blocklist
      .select(col("domain"), lit(true).as("blocked_domain"))
    val badWord: Column = badUrlWords
      .map(w => contains(lower(col("url")), lit(w)))
      .reduceOption(_ || _).getOrElse(lit(false))
    docs.withColumn("host", urlHost(col("url")))
      .withColumn("domain", registeredDomain(col("host")))
      .join(broadcast(marked), Seq("domain"), "left")
      .withColumn("blocked_domain",
        coalesce(col("blocked_domain"), lit(false)))
      .withColumn("blocked_word", badWord)
      .withColumn("keep", !col("blocked_domain") && !col("blocked_word"))
  }

  /** Per-domain cap, full ranked table: rank in (selectionKey,
    * doc_id) order within each registered domain, keep = rank ≤ cap.
    * The window is PARTITIONED by domain (never unpartitioned), so
    * the sort is per-domain; the largest domain bounds one task —
    * when only the kept set is needed at scale, use
    * [[domainCapApply]] (bounded heap, no full sort).
    */
  def domainCap(docs: DataFrame, cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    val w = Window.partitionBy(col("domain"))
      .orderBy(col("sel_key"), col("doc_id"))
    docs.withColumn("domain", registeredDomain(urlHost(col("url"))))
      .withColumn("sel_key", selectionKey(col("text")))
      .withColumn("domain_rank", row_number().over(w))
      .withColumn("keep", col("domain_rank") <= cap)
  }

  /** Per-domain cap, kept set only: a TopKBy bounded heap per domain
    * (ord = −selectionKey, tie doc_id asc — the heap's native
    * ordering), map-side combined, so at most cap entries per domain
    * per partition reach the shuffle. Same selection as
    * [[domainCap]]'s keep=true rows by construction (one key
    * definition), spec'd equal in DomainOpsSpec.
    */
  def domainCapApply(docs: DataFrame, cap: Int): DataFrame = {
    require(cap >= 1 && cap <= (1 << 20), s"cap out of range: $cap")
    docs.withColumn("domain", registeredDomain(urlHost(col("url"))))
      .withColumn("sel_key", selectionKey(col("text")))
      .groupBy(col("domain"))
      .agg(graft.functions.AggFunctions.topk_by(
        -col("sel_key").cast("double"), col("doc_id"), cap).as("top"))
      .select(col("domain"), posexplode(col("top")))
      .select(col("col.id").as("doc_id"), col("domain"),
        (col("pos") + 1).cast("int").as("domain_rank"))
  }

  // ---- registered faces (planted URL fixture) ----

  /** The planted URL frame: 10 residue classes over skewed hosts
    * (three subdomain variants of example.com, two of example.org,
    * two blocklisted hosts incl. a co.uk suffix) plus a long tail of
    * site<N>.net, and a keyword-flagged query string on doc_id % 7
    * == 3. Mirrored literally in the oracle CTE.
    */
  private[graft] def plantedUrlDocs(spark: SparkSession,
      sfDir: String): DataFrame =
    plantUrl(documents(spark, sfDir))

  /** Plant the deterministic URL column on ANY (doc_id, text) frame —
    * shared by the standalone domain fixtures and the P6 release
    * recipe (whose text carries its own plantings).
    */
  private[graft] def plantUrl(docs: DataFrame): DataFrame = {
    val m = col("doc_id") % 10
    val host = when(m.isin(0, 1), lit("news.example.com"))
      .when(m === 2, lit("cdn.news.example.com"))
      .when(m === 3, lit("blog.example.org"))
      .when(m === 4, lit("static.blog.example.org"))
      .when(m === 5, lit("tracker.adsite.biz"))
      .when(m === 6, lit("mirror.badcontent.co.uk"))
      .otherwise(concat(lit("site"),
        (col("doc_id") % 23).cast("string"), lit(".net")))
    docs.select(col("doc_id"), col("text"),
      concat(lit("https://"), host, lit("/p/"),
        col("doc_id").cast("string"),
        when(col("doc_id") % 7 === 3, lit("?ref=casino-bonus"))
          .otherwise(lit(""))).as("url"))
  }

  private[graft] def defaultBlocklist(spark: SparkSession): DataFrame = {
    import spark.implicits._
    DefaultBlockedDomains.toDF("domain")
  }

  /** Registered `domain_filter` (hash-checked): the URL gate over the
    * planted fixture — host, registered domain, both block flags,
    * keep.
    */
  def domainFilterQuery(spark: SparkSession, sfDir: String): DataFrame =
    domainGate(plantedUrlDocs(spark, sfDir), defaultBlocklist(spark))
      .select(col("doc_id"), col("url"), col("host"), col("domain"),
        col("blocked_domain"), col("blocked_word"), col("keep"))
      .orderBy(col("doc_id"))

  /** Registered `domain_cap` (hash-checked): the full ranked table at
    * cap=25 — non-degenerate at sf0.01 (example.com holds ~150 of
    * 500 docs, so most of it drops; the site<N>.net tail all keeps).
    */
  def domainCapQuery(spark: SparkSession, sfDir: String,
      cap: Int = 25): DataFrame =
    domainCap(plantedUrlDocs(spark, sfDir), cap)
      .select(col("doc_id"), col("domain"), col("domain_rank"),
        col("keep"))
      .orderBy(col("doc_id"))

  /** Registered `domain_cap_apply` (hash-checked): the bounded-heap
    * kept set under the same key — the scale shape's own oracle row.
    */
  def domainCapApplyQuery(spark: SparkSession, sfDir: String,
      cap: Int = 25): DataFrame =
    domainCapApply(plantedUrlDocs(spark, sfDir), cap)
      .orderBy(col("doc_id"))

  /** T42 — CAP REBALANCE: the batch reconciliation of the X24 online
    * admission policy. A stream admits first-seen-wins (it cannot
    * sort by the batch key without holding the corpus); the periodic
    * batch pass re-ranks every document under the DETERMINISTIC
    * [[selectionKey]] order and reconciles: an admitted doc that
    * ranks past the cap is `evict`, an unadmitted doc that ranks
    * inside it is `admit`, the rest `keep`/`out`. This mirrors the
    * incremental-dedup family's ingest/batch split (P3 screens
    * online, D14's index rebuilds offline).
    *
    * `admitted` is an id-only `(doc_id)` frame — the reconcile join
    * moves 8-byte ids, never text or URLs. One partitioned window
    * (the T40 audit shape) + one left join; the output is the full
    * audit table, so the per-domain sort is inherent to the ask.
    */
  def domainCapRebalance(docs: DataFrame, admitted: DataFrame,
      cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1: $cap")
    domainCap(docs, cap)
      .join(admitted.select(col("doc_id"), lit(true).as("was_admitted")),
        Seq("doc_id"), "left")
      .withColumn("was_admitted",
        coalesce(col("was_admitted"), lit(false)))
      .withColumn("verdict",
        when(col("was_admitted") && col("keep"), lit("keep"))
          .when(col("was_admitted") && !col("keep"), lit("evict"))
          .when(!col("was_admitted") && col("keep"), lit("admit"))
          .otherwise(lit("out")))
  }

  /** Registered `domain_cap_rebalance` (hash-checked): the recipe
    * over the planted fixture with the prior admission being the X24
    * arrival policy under doc_id arrival order (rank by doc_id ≤
    * cap per domain — the deterministic stand-in for "first seen",
    * stated identically in the oracle). Arrival order ≠ md5 order,
    * so both `evict` and `admit` verdicts fire on real rows.
    */
  def domainCapRebalanceQuery(spark: SparkSession, sfDir: String,
      cap: Int = 25): DataFrame = {
    val docs = plantedUrlDocs(spark, sfDir)
    val wArr = Window.partitionBy(col("domain")).orderBy(col("doc_id"))
    val admitted = docs
      .withColumn("domain", registeredDomain(urlHost(col("url"))))
      .withColumn("arr_rank", row_number().over(wArr))
      .filter(col("arr_rank") <= cap)
      .select(col("doc_id"))
    domainCapRebalance(docs, admitted, cap)
      .select(col("doc_id"), col("domain"), col("domain_rank"),
        col("was_admitted"), col("verdict"))
      .orderBy(col("doc_id"))
  }
}
