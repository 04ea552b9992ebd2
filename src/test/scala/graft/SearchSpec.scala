package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Search

/** T14 BM25 against a bit-exact in-driver reference (same JVM libm,
  * same fixed-order contribution sum — any drift in the distributed
  * formula shows as a strict inequality, not a tolerance miss).
  */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private val query = Search.defaultQuery
  private val k1 = 1.2
  private val b = 0.75

  private def docs: Array[(Long, Array[String])] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.split("\\s+")))

  test("bm25Search scores match the reference bit-exactly, top-k ordered") {
    val ds = docs
    val n = ds.length.toLong
    val avgdl = ds.map(_._2.length.toDouble).sum / n
    val dfs = query.map(t => ds.count(_._2.contains(t)).toLong)
    val idf = dfs.map(df => math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
    val expected = ds.flatMap { case (id, tk) =>
      val dl = tk.length.toDouble
      var s = 0.0
      var i = 0
      while (i < query.size) {
        val tf = tk.count(_ == query(i)).toDouble
        s += idf(i) * (tf * (k1 + 1.0) /
          (tf + k1 * (1.0 - b + b * dl / avgdl)))
        i += 1
      }
      if (s > 0.0) Some((id, s)) else None
    }.sortBy { case (id, s) => (-s, id) }.take(50)

    val got = Search.bm25Search(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty && got.length <= 50)
    // descending with doc_id tie-break
    got.sliding(2).foreach { case Array((ia, sa), (ib, sbb)) =>
      assert(sa > sbb || (sa == sbb && ia < ib))
    }
  }

  test("bm25DocStats agrees with the search side's tf inputs") {
    val stats = Search.bm25DocStats(spark, sf).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val expected = docs.flatMap { case (id, tk) =>
      val tfs = query.map(t => tk.count(_ == t).toLong)
      if (tfs.exists(_ > 0))
        Some(id -> ((tk.length.toLong, tfs(0), tfs(1), tfs(2))))
      else None
    }.toMap
    assert(stats == expected)
    assert(stats.nonEmpty, "query terms absent from corpus?")
  }

  test("lmDocStats matches an exact in-driver count-table computation") {
    val ds = docs
    val cnt = scala.collection.mutable.Map[String, Long]()
    ds.foreach(_._2.foreach(w => cnt(w) = cnt.getOrElse(w, 0L) + 1L))
    val expected = ds.map { case (id, tk) =>
      id -> ((tk.length.toLong, tk.map(cnt).sum, tk.map(cnt).min))
    }.toMap
    val got = graft.operators.Search.lmDocStats(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(got.values.map(_._3).toSet.size > 1,
      "min_cnt constant across corpus — vacuous fixture")
  }

  test("lmPerplexity is bit-exact vs the in-driver smoothed-LM reference") {
    import graft.functions.CentroidKernels.dec12Scaled
    val ds = docs
    val cnt = scala.collection.mutable.Map[String, Long]()
    ds.foreach(_._2.foreach(w => cnt(w) = cnt.getOrElse(w, 0L) + 1L))
    val vocab = cnt.size.toLong
    val total = cnt.values.sum
    val lnTV = math.log(total.toDouble + vocab.toDouble + 1.0)
    val expected = ds.map { case (id, tk) =>
      val s = tk.map(w => dec12Scaled(math.log(cnt(w).toDouble + 1.0))).sum
      // the distributed expression's exact op order:
      // exp(lnTV - s/1e12/n) — any drift is a strict != miss
      id -> ((tk.length.toLong,
        math.exp(lnTV - s.toDouble / 1e12 / tk.length.toDouble)))
    }.toMap
    val got = graft.operators.Search.lmPerplexity(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
    // sanity: perplexities are positive, finite, and spread
    val ppls = got.values.map(_._2)
    assert(ppls.forall(p => p > 0.0 && java.lang.Double.isFinite(p)))
    assert(ppls.max > ppls.min, "flat ppl across corpus — vacuous")
  }

  private def feats(tk: Array[String]): Seq[String] =
    tk.toSeq ++ (0 until tk.length - 1).map(i => tk(i) + " " + tk(i + 1))

  private def dsirModels: (Array[(Long, Array[String])],
      Map[String, Long], Map[String, Long]) = {
    val ds = docs
    val cq = scala.collection.mutable.Map[String, Long]()
    val ct = scala.collection.mutable.Map[String, Long]()
    ds.foreach { case (id, tk) =>
      feats(tk).foreach { g =>
        cq(g) = cq.getOrElse(g, 0L) + 1L
        if (id % 7 == 0) ct(g) = ct.getOrElse(g, 0L) + 1L
      }
    }
    (ds, cq.toMap, ct.toMap)
  }

  test("dsirDocStats matches an exact in-driver two-model count table") {
    val (ds, cq, ct) = dsirModels
    val expected = ds.map { case (id, tk) =>
      val fs = feats(tk)
      id -> ((fs.length.toLong, fs.map(cq).sum,
        fs.map(g => ct.getOrElse(g, 0L)).sum))
    }.toMap
    val got = Search.dsirDocStats(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(got.values.exists(_._3 > 0L), "target counts all zero — vacuous")
    // bigrams are real features: n_feats = 2·n_tokens − 1 per doc
    ds.foreach { case (id, tk) =>
      assert(got(id)._1 == 2L * tk.length - 1, s"doc $id feature count")
    }
  }

  test("dsirWeights is bit-exact vs the in-driver importance-ratio reference") {
    import graft.functions.CentroidKernels.dec12Scaled
    val (ds, cq, ct) = dsirModels
    val vocab = cq.size.toLong
    val tq = cq.values.sum
    val tt = ct.values.sum
    val shift = math.log(tq.toDouble + vocab.toDouble) -
      math.log(tt.toDouble + vocab.toDouble)
    val expected = ds.map { case (id, tk) =>
      val fs = feats(tk)
      // the distributed pipeline's exact op order: per-feature
      // dec12-scaled ln-ratio, integer sum, then s/1e12 + n·shift —
      // any drift is a strict != miss
      val s = fs.map(g => dec12Scaled(
        math.log(ct.getOrElse(g, 0L).toDouble + 1.0) -
          math.log(cq(g).toDouble + 1.0))).sum
      id -> ((fs.length.toLong,
        s.toDouble / 1e12 + fs.length.toDouble * shift))
    }.toMap
    val got = Search.dsirWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
    // the weight means something: target-subset docs (the model's own
    // training data) must average a higher importance weight than the
    // rest of the corpus
    val (tgt, rest) = got.toSeq.partition(_._1 % 7 == 0)
    val tgtMean = tgt.map(_._2._2).sum / tgt.size
    val restMean = rest.map(_._2._2).sum / rest.size
    assert(tgtMean > restMean,
      s"target mean $tgtMean <= rest mean $restMean — weight is noise")
  }

  test("dsirModel guards its frontier collect with a loud maxVocab budget") {
    val e = intercept[IllegalArgumentException] {
      Search.dsirModel(spark, sf, maxVocab = 10)
    }
    assert(e.getMessage.contains("maxVocab"), e.getMessage)
    // and the minCount floor genuinely shrinks the frontier: floored
    // models keep fewer features than the full vocabulary
    val full = Search.dsirModel(spark, sf)
    val floored = Search.dsirModel(spark, sf, minCount = 3)
    assert(floored.keys.length < full.keys.length)
    assert(floored.vocab == full.vocab && floored.tq == full.tq,
      "smoothing scalars must stay corpus-global under flooring")
  }

  test("dsirSelect takes docs in weight order to the token budget (offset rule)") {
    val budget = 20000L
    // reference ranking from the batch weights (bit-exact per the
    // test above) + whitespace token counts, greedy offset packing
    val weights = Search.dsirWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val toks = docs.map { case (id, tk) => id -> tk.length.toLong }.toMap
    var cum = 0L
    val expected = weights.toSeq
      .sortBy { case (id, w) => (-w, id) }
      .flatMap { case (id, w) =>
        val start = cum; cum += toks(id)
        if (start < budget) Some((id, toks(id), w)) else None
      }.toSet
    val got = Search.dsirSelect(spark, sf, budget).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected)
    // non-vacuous: a real subset, and it prefers high-weight docs
    assert(got.nonEmpty && got.size < weights.size)
    val selMean = got.toSeq.map(_._3).sum / got.size
    val allMean = weights.values.sum / weights.size
    assert(selMean > allMean,
      s"selected mean $selMean <= corpus mean $allMean")
  }

  test("dsirSelectFromWeights reproduces dsirSelect from a shared weight pass") {
    val w = Search.dsirWeights(spark, sf).localCheckpoint(true)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val shared = Search.dsirSelectFromWeights(docs, w, 20000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val standalone = Search.dsirSelect(spark, sf, 20000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(shared == standalone)
  }

  test("dsirSelectSampled: seed-reproducible, τ=0 recovers dsirSelect, tilt holds") {
    // τ = 0: the noise term vanishes and the sampled ranking IS the
    // deterministic one, doc_id tie-breaks included — exact set match
    val det = Search.dsirSelect(spark, sf, 20000L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val tau0 = Search.dsirSelectSampled(spark, sf, 20000L, tau = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tau0 == det)

    // fixed seed: two independent runs produce the identical sample
    // (the backfill-reproducibility contract)
    val a = Search.dsirSelectSampled(spark, sf, 20000L, tau = 1.0,
      seed = 42L).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSet
    val b = Search.dsirSelectSampled(spark, sf, 20000L, tau = 1.0,
      seed = 42L).collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toSet
    assert(a == b)

    // different seeds genuinely resample (τ at the weight spread's
    // scale: the noise must move the frontier on this corpus)
    val c = Search.dsirSelectSampled(spark, sf, 20000L, tau = 1.0,
      seed = 43L).collect().map(_.getLong(0)).toSet
    assert(a.map(_._1) != c, "seed change did not move the sample")

    // the sample is a perturbation of the SAME ranking: selected docs
    // still average a higher weight than the corpus
    val weights = Search.dsirWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val selMean = a.toSeq.map(p => weights(p._1)).sum / a.size
    val allMean = weights.values.sum / weights.size
    assert(selMean > allMean,
      s"sampled mean $selMean <= corpus mean $allMean — tilt lost")
  }

  test("gumbelOf is a pure function of (seed, id) with sane variates") {
    val g1 = Search.gumbelOf(42L, 7L)
    val g2 = Search.gumbelOf(42L, 7L)
    assert(g1 == g2)
    assert(Search.gumbelOf(43L, 7L) != g1)
    val vs = (0L until 10000L).map(Search.gumbelOf(42L, _))
    assert(vs.forall(java.lang.Double.isFinite))
    // standard Gumbel: mean ≈ γ ≈ 0.5772, a loose sanity band
    val mean = vs.sum / vs.size
    assert(mean > 0.45 && mean < 0.7, s"gumbel mean $mean off")
  }
}
