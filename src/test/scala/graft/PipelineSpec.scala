package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Clusters, CorpusOps, Dedup, Pipeline, TextOps}

/** P1 pipeline_full: the composed recipe must equal the stagewise
  * application of the standalone stage operators (the
  * dedup_chain_shared precedent — sharing derivations is a plan
  * optimization, never a semantics change), and its output must
  * satisfy every stage's invariant at once.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def collectOut(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("pipeline_web equals pipeline_release — the raw-page round trip") {
    // the key lemma first: extraction EXACTLY recovers the planted
    // fixture text from its line-per-<p> page, doc for doc
    val (docs, _) = Pipeline.releaseFixture(spark, sf)
    val drift = TextOps.plantWebPage(docs)
      .select(col("doc_id"),
        TextOps.htmlTextOf(col("html")).as("x"))
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .filter(col("x") =!= col("text")).count()
    assert(drift == 0, s"$drift docs drift through the round trip")
    // the raw pages genuinely carry markup the extraction must strip
    val h = TextOps.plantWebPage(docs).select("html").head.getString(0)
    assert(h.contains("<script>") && h.contains("<style") &&
      h.contains("</p><p>") && h.contains("<!--"))
    // therefore the six-stage web pipeline must equal the release
    // pipeline row for row (both are doc_id-ordered)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getLong(3), r.getLong(4))).toSeq
    val rel = rows(Pipeline.pipelineReleaseQuery(spark, sf))
    val web = rows(Pipeline.pipelineWebQuery(spark, sf))
    assert(web.nonEmpty)
    assert(web == rel)
  }

  test("pipelineRelease equals the stagewise chain and every stage bites") {
    import spark.implicits._
    import graft.operators.DomainOps
    val page = Pipeline.SignalsDupPage.mkString("\n")
    val docs = DomainOps.plantUrl(TextOps.c4PlantedDocs(spark, sf)
      .select(col("doc_id"),
        when(col("doc_id") % 50 === 7, lit(page))
          .otherwise(col("text")).as("text")))
    val blocklist = DomainOps.DefaultBlockedDomains.toDF("domain")

    // stage 1 reference: the standalone URL gate
    val gated = DomainOps.domainGate(docs, blocklist)
      .filter(col("keep"))
      .select(col("doc_id"), col("text"), col("domain"))
    val gatedRows = gated.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(gatedRows.length < 500, "URL gate must bite")
    assert(!gatedRows.exists(_._1 == 157L),
      "doc 157 carries the casino query string")

    // stage 2 reference: the standalone signals gate
    val sigIds = TextOps.qualitySignalsOf(gated,
        stopWords = Seq("the", "a"), badWords = Seq("badword"))
      .filter(col("keep_gopher") === 1 && col("keep_rep") === 1 &&
        col("keep_c4") === 1 && col("keep_model") === 1)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(sigIds.size < gatedRows.length, "signals gate must bite")

    // stages 3-5 reference in the driver: fp dedup (min id), cap=3
    // per domain in (selKey, id) order, shard offsets at 1024 over
    // the seeded md5 shuffle
    val surv = gatedRows.filter(t => sigIds(t._1))
    val withFp = surv.map { case (id, t, dom) =>
      (id, dom, t, md5hex(t.trim.replaceAll("\\s+", " "))) }
    val keepIds = withFp.groupBy(_._4).values.map(_.map(_._1).min).toSet
    val sv = withFp.filter(t => keepIds(t._1))
    assert(sv.length < surv.length, "exact dedup must bite")
    val dupIds = (0L until 500L).filter(_ % 50 == 7)
    assert(sv.exists(_._1 == 7L))
    assert(dupIds.filter(i => i != 7L && i != 157L)
      .forall(i => !sv.exists(_._1 == i)),
      "all non-min duplicate pages must dedup away")
    assert(sv.groupBy(_._2).values.exists(_.size > 3),
      "some domain must exceed the cap")
    def selKey(t: String): Long =
      java.lang.Long.parseLong(md5hex(t).substring(0, 13), 16)
    val capped = sv.groupBy(_._2).values.flatMap(g =>
      g.sortBy(t => (selKey(t._3), t._1)).take(3)).toSeq
    assert(capped.size < sv.length)
    val order = capped.sortBy(t => (md5hex(s"7:${t._1}"), t._1))
    var off = 0L
    val expected = order.map { case (id, dom, text, fp) =>
      val n = text.trim.split("\\s+").length.toLong
      val sh = off / 1024L; off += n
      (id, dom, fp, n, sh)
    }.sortBy(_._1)

    val got = Pipeline.pipelineReleaseQuery(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(got.map(_._5).distinct.size >= 2, "at least two shards")
  }

  test("pipeline_release_carve: verdict per released doc, all three " +
      "roles non-vacuous, coherent with the standalone carve") {
    import graft.operators.DomainOps
    val (docs, blocklist) = Pipeline.releaseFixture(spark, sf)
    val released = Pipeline.releasedText(docs, blocklist,
      Seq("the", "a"), Seq("badword"), DomainOps.DefaultBadUrlWords,
      cap = 3, seed = 7L)
    val relIds = released.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val got = Pipeline.pipelineReleaseCarveQuery(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // exactly one verdict per RELEASED doc — the carve never sees a
    // doc a curation stage dropped
    assert(got.map(_._1).toSet == relIds)
    val roles = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(roles.getOrElse("eval", 0) > 0, "no eval doc — vacuous")
    assert(roles.getOrElse("contaminated", 0) > 0,
      "no contaminated doc — the post-release plant never reached " +
        "the holdout; adjust the fixture")
    assert(roles.getOrElse("train", 0) > 0, "no train doc — vacuous")
    // the leak is the PLANT: contaminated docs are exactly the
    // planted (even) train docs, and a planted doc sits in eval
    assert(got.filter(_._2 == "contaminated").forall(_._1 % 2 == 0))
    assert(got.exists(g => g._2 == "eval" && g._1 % 2 == 0))
    // coherence: the composed face IS releasedText + plant +
    // standalone D20 at 1/3
    val phrase = (0 until 13).map(i => s"hv$i").mkString(" ")
    val planted = released.select(col("doc_id"),
      when(col("doc_id") % 2 === 0,
        concat(col("text"), lit(" " + phrase)))
        .otherwise(col("text")).as("text"))
    val standalone = graft.operators.Dedup
      .holdoutCarve(planted, seed = "7", evalNum = 1, evalDen = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.sortBy(_._1).toSeq == standalone.sortBy(_._1).toSeq)
  }

  test("pipelineSignals equals the stagewise gate + exact dedup; dup pages drop") {
    val page = Pipeline.SignalsDupPage.mkString("\n")
    val docs = TextOps.c4PlantedDocs(spark, sf).select(col("doc_id"),
      when(col("doc_id") % 50 === 7, lit(page))
        .otherwise(col("text")).as("text"))
    // stagewise reference: core signals gate, then min-id-per-text
    // dedup in the driver
    val gated = TextOps.qualitySignalsOf(docs,
        stopWords = Seq("the", "a"), badWords = Seq("badword"),
        carry = Seq("text")).collect()
      .filter(r => Seq("keep_gopher", "keep_rep", "keep_c4",
        "keep_model").forall(c => r.getAs[Int](c) == 1))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    assert(gated.nonEmpty)
    val canon = gated.map { case (id, t) =>
      (id, t.trim.replaceAll("\\s+", " "))
    }
    val expected = canon.groupBy(_._2).values.map(_.map(_._1).min).toSet
    val got = Pipeline.pipelineSignalsQuery(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == expected)
    // the planted duplicate pages all pass every gate, and the dedup
    // stage keeps exactly the lowest id of the ten copies
    val dupIds = (0L until 500L).filter(_ % 50 == 7)
    assert(dupIds.forall(id => canon.exists(_._1 == id)),
      "a planted duplicate page failed a gate")
    assert(got.contains(dupIds.min) && dupIds.tail.forall(!got.contains(_)))
    // the gate itself is non-vacuous: some docs fail it
    assert(gated.length < docs.count())
  }

  test("pipelineC4 equals the stagewise C4 clean + span scrub chain") {
    val fixture = TextOps.c4PlantedDocsWith(spark, sf,
      when(col("doc_id") % 4 === 2, lit(
        "\nshared span alpha beta gamma one." +
          "\nshared span delta epsilon zeta two!" +
          "\nshared span eta theta iota three?")).otherwise(lit("")))
    val composed = collectOut(Pipeline.pipelineC4(fixture,
      badWords = Seq("badword")))
    val stagewise = collectOut(CorpusOps.sentenceSpanScrub(
      TextOps.c4Apply(fixture, badWords = Seq("badword"))
        .select(col("doc_id"), col("clean_text").as("text"))))
    assert(composed == stagewise && composed.nonEmpty)
    // sharing the cleaned corpus is a plan optimization, never a
    // semantics change (the P1 share-on/off contract)
    val unshared = collectOut(Pipeline.pipelineC4(fixture,
      badWords = Seq("badword"), share = false))
    assert(unshared == composed)
    // the span stage must have real work: some page lost sentences
    assert(composed.exists(_._4 > 0),
      "no page was span-scrubbed - the fixture is vacuous")
    // every emitted doc passed the page gate
    val keptPages = TextOps.qualityC4Docs(fixture,
        badWords = Seq("badword"))
      .filter(col("keep") === 1).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(composed.map(_._1).subsetOf(keptPages))
  }

  test("pipelineIngestVerified equals its stagewise decomposition") {
    import graft.operators.IncrementalDedup
    val inc = IncrementalDedup.newDocs(spark, sf)
    val old = IncrementalDedup.oldDocs(spark, sf)
    val index = IncrementalDedup.buildIndex(old)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet

    val got = ids(Pipeline.pipelineIngestVerified(inc, index, old,
      stopWords = Seq("the", "a")))
    // stagewise: standalone screens + gate, no shared checkpoints
    val exactDup = ids(IncrementalDedup
      .screenExactDocs(inc, index).filter(col("is_dup") === 1))
    val cand = IncrementalDedup.screenNearDocs(inc, index, minEst = 0.3)
    // verifyNearPairs checkpoints the candidate frame internally
    val nearDup = ids(IncrementalDedup
      .verifyNearPairs(cand, inc, old, 0.5))
    val lowQ = ids(graft.operators.TextOps
      .qualityGopherDocs(inc, Seq("the", "a"))
      .filter(col("keep") === 0))
    val expected = ids(inc) -- exactDup -- nearDup -- lowQ
    assert(got == expected && got.nonEmpty)
    // share=false is the same pipeline, recomputed
    assert(ids(Pipeline.pipelineIngestVerified(inc, index, old,
      stopWords = Seq("the", "a"), share = false)) == got)
    // the verified near stage is doing real work at sf
    assert(nearDup.nonEmpty)
  }

  test("pipelineFull equals the stagewise chain of standalone operators") {
    val planted = Pipeline.plantedDocs(spark, sf)
    val full = collectOut(Pipeline.pipelineFull(planted))

    // stagewise: each stage invoked standalone, no shared checkpoints
    val kept = planted
      .filter(TextOps.modelQualityScore(col("text")) >= lit(0.5))
    val cleaned = kept.select(col("doc_id"), col("source"))
      .join(CorpusOps.lineDedup(kept).select(col("doc_id"),
        col("clean_text")), Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        col("clean_text").as("text"),
        length(col("clean_text")).cast("long").as("n_chars"))
    val clusters = Clusters.clusterPairs(
      Dedup.jaccardPairsDocs(cleaned).select(col("doc_a"), col("doc_b")))
    val deduped = Clusters.dedupApplyBestKeepAll(cleaned, clusters)
    val flagged = Dedup.screenDocs(deduped)
      .select(col("doc_id")).distinct()
    val screened = deduped.join(flagged, Seq("doc_id"), "left_anti")
    val picked = CorpusOps.mixSourcesDocs(screened).select(col("doc_id"))
    val mixed = screened.join(picked, Seq("doc_id"), "left_semi")
    val expected = collectOut(
      CorpusOps.packSequencesDocs(mixed)
        .join(mixed.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("bin")))

    assert(full == expected)
    assert(full.nonEmpty, "pipeline produced an empty corpus")

    // ...and the share=false path (no checkpoints) is the same set:
    // materialization barriers must not change semantics
    val unshared = collectOut(
      Pipeline.pipelineFull(planted, share = false))
    assert(unshared == full)
  }

  test("pipelineScrub equals its stagewise chain; length gate holds") {
    val planted = Pipeline.plantedDocs(spark, sf)
    val full = collectOut(Pipeline.pipelineScrub(planted))
    assert(full.nonEmpty, "scrub pipeline produced an empty corpus")

    // stagewise with the standalone operators, no shared checkpoints
    val kept = planted
      .filter(TextOps.modelQualityScore(col("text")) >= lit(0.5))
    val cleaned = kept.select(col("doc_id"), col("source"))
      .join(CorpusOps.lineDedup(kept).select(col("doc_id"),
        col("clean_text")), Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        col("clean_text").as("text"))
    val scrubbed = cleaned.select(col("doc_id"), col("source"))
      .join(CorpusOps.substringScrub(cleaned)
        .filter(col("n_kept") >= 8)
        .select(col("doc_id"), col("clean_text")), Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        col("clean_text").as("text"))
    val flagged = Dedup.screenDocs(scrubbed)
      .select(col("doc_id")).distinct()
    val screened = scrubbed.join(flagged, Seq("doc_id"), "left_anti")
    val picked = CorpusOps.mixSourcesDocs(screened).select(col("doc_id"))
    val mixed = screened.join(picked, Seq("doc_id"), "left_semi")
    val expected = collectOut(
      CorpusOps.packSequencesDocs(mixed)
        .join(mixed.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("bin")))
    assert(full == expected)

    // length gate: every selected doc still has >= 8 tokens AFTER the
    // scrub (its packed n_tokens is the scrubbed count)
    assert(full.forall(_._3 >= 8L),
      s"sub-gate doc reached packing: ${full.filter(_._3 < 8L).take(3)}")

    // share=false path identical
    assert(collectOut(Pipeline.pipelineScrub(planted, share = false))
      == full)
  }

  test("pipelineFull output satisfies every stage invariant at once") {
    val planted = Pipeline.plantedDocs(spark, sf)
    val out = Pipeline.pipelineFull(planted).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ids = out.map(_._1).toSet
    assert(ids.size == out.length, "duplicate doc_ids in output")

    // stage 1: every selected doc passed the quality gate
    val qualityIds = planted
      .filter(TextOps.modelQualityScore(col("text")) >= lit(0.5))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(qualityIds), "a doc skipped the quality gate")

    // stage 3: no near-dup cluster (over the cleaned text) keeps two
    // members
    val kept = planted
      .filter(TextOps.modelQualityScore(col("text")) >= lit(0.5))
    val cleaned = kept.select(col("doc_id"), col("source"))
      .join(CorpusOps.lineDedup(kept).select(col("doc_id"),
        col("clean_text")), Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        col("clean_text").as("text"),
        length(col("clean_text")).cast("long").as("n_chars"))
    val clusters = Clusters.clusterPairs(
      Dedup.jaccardPairsDocs(cleaned).select(col("doc_a"), col("doc_b")))
    val clusterOf = clusters
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perCluster = ids.toSeq.flatMap(id => clusterOf.get(id))
      .groupBy(identity).view.mapValues(_.size)
    assert(perCluster.values.forall(_ == 1),
      s"cluster kept two members: ${perCluster.filter(_._2 > 1)}")

    // stage 4: no selected doc is screen-flagged (flags computed over
    // the post-dedup corpus, exactly as the pipeline screens it)
    val deduped = Clusters.dedupApplyBestKeepAll(cleaned, clusters)
    val flaggedIds = Dedup.screenDocs(deduped)
      .select(col("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids.intersect(flaggedIds).isEmpty,
      s"screen-flagged docs survived: ${ids.intersect(flaggedIds).take(5)}")

    // stage 6: bins follow the sequential offset packer exactly —
    // the single-threaded greedy reference over the selected docs in
    // doc_id order
    var cum = 0L
    out.sortBy(_._1).foreach { case (id, _, n, bin) =>
      assert(bin == cum / 2048L, s"doc $id bin $bin != ${cum / 2048L}")
      cum += n
    }
  }

  test("pipelineIngest equals the stagewise chain of standalone screens + gate") {
    import graft.operators.{IncrementalDedup, Pipeline, TextOps}
    val sf = "/root/testdata/sf0.001"
    val inc = IncrementalDedup.newDocs(spark, sf)
    val index = IncrementalDedup.buildIndex(
      IncrementalDedup.oldDocs(spark, sf))
    val stops = Seq("the", "a")

    val incIds = inc.select("doc_id").collect().map(_.getLong(0)).toSet
    val exactDup = IncrementalDedup.screenExactDocs(inc, index)
      .filter(org.apache.spark.sql.functions.col("is_dup") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val nearDup = IncrementalDedup.screenNearDocs(inc, index)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val qualityFail = TextOps.qualityGopherDocs(inc, stops)
      .filter(org.apache.spark.sql.functions.col("keep") === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = incIds -- exactDup -- nearDup -- qualityFail
    assert(nearDup.nonEmpty, "near stage vacuous on the sf corpus")
    assert(qualityFail.nonEmpty, "quality stage vacuous on the sf corpus")
    assert(expected.nonEmpty, "everything dropped — degenerate recipe")

    val got = Pipeline.pipelineIngestQuery(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == expected,
      s"composed-only=${got -- expected} stagewise-only=${expected -- got}")
    // shared-derivation off must not change the answer
    val unshared = Pipeline.pipelineIngest(inc, index,
        stopWords = stops, share = false)
      .collect().map(_.getLong(0)).toSet
    assert(unshared == expected)
  }

  test("ingest recipes drop null-text docs deliberately") {
    import graft.operators.{IncrementalDedup, Pipeline}
    val inc0 = IncrementalDedup.newDocs(spark, sf)
    val old = IncrementalDedup.oldDocs(spark, sf)
    val index = IncrementalDedup.buildIndex(old)
    val stops = Seq("the", "a")
    val keptIds = Pipeline.pipelineIngest(inc0, index, stopWords = stops)
      .collect().map(_.getLong(0)).toSet
    assert(keptIds.nonEmpty)
    // null the text of a doc the recipe otherwise KEEPS: its gopher
    // stats and keep go null (nullSafeEval), and the keep===1 inner
    // join DROPS it — where the pre-r17 keep===0 anti-join shape
    // retained it with null n_words. The r17 ADVICE finding, resolved
    // as deliberate semantics rather than a row-identity claim: a
    // document with no text cannot satisfy a word-count gate, and the
    // screens judge each inc doc independently, so no other verdict
    // moves.
    val victim = keptIds.min
    val inc = inc0.withColumn("text",
      when(col("doc_id") === victim, lit(null: String))
        .otherwise(col("text")))
    val got = Pipeline.pipelineIngest(inc, index, stopWords = stops)
      .collect().map(_.getLong(0)).toSet
    assert(got == keptIds - victim,
      s"extra=${got -- (keptIds - victim)} " +
        s"missing=${(keptIds - victim) -- got}")
    val gotVerified = Pipeline
      .pipelineIngestVerified(inc, index, old, stopWords = stops)
      .collect().map(_.getLong(0)).toSet
    assert(!gotVerified.contains(victim))
  }

  test("every composed recipe survives a null-text doc and drops it") {
    // a 100 TB crawl corpus HAS null records; a recipe that crashes
    // the whole job on one (the pre-r18 buildIndex did, via the
    // typed screen kernels) is a scale defect, not an edge case.
    // Contract: null text = the doc does not exist — no crash, no
    // null-keyed output row.
    import graft.operators.{DomainOps, Pipeline}
    import org.apache.spark.sql.DataFrame
    val docs = graft.Tables.documents(spark, sf)
    val victim = 11L // doc_id kept by several recipes at sf0.001
    def nulled(d: DataFrame) = d.withColumn("text",
      when(col("doc_id") === victim, lit(null: String))
        .otherwise(col("text")))
    val blocklist = {
      import spark.implicits._
      DomainOps.DefaultBlockedDomains.toDF("domain")
    }
    val recipes: Seq[(String, DataFrame)] = Seq(
      "full" -> Pipeline.pipelineFull(nulled(docs)),
      "scrub" -> Pipeline.pipelineScrub(nulled(docs)),
      "c4" -> Pipeline.pipelineC4(nulled(docs)),
      "signals" -> Pipeline.pipelineSignals(nulled(docs),
        stopWords = Seq("the", "a"), badWords = Seq("badword")),
      "release" -> Pipeline.pipelineRelease(
        DomainOps.plantUrl(nulled(docs)), blocklist,
        stopWords = Seq("the", "a"), badWords = Seq("badword")))
    recipes.foreach { case (name, df) =>
      val out = df.collect() // must not throw
      assert(!out.exists(r => !r.isNullAt(0) && r.getLong(0) == victim),
        s"$name emitted the null-text doc")
    }
  }
}
