package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusOps, Search}
import graft.functions.CentroidKernels.dec12Scaled

/** T26 interpolated-bigram LM against a bit-exact in-driver reference
  * (same JVM libm, same dec12 integer aggregation — any drift in the
  * distributed formula shows as a strict inequality, not a tolerance
  * miss), plus the order-sensitivity property that motivates the
  * order-2 model over the unigram one.
  */
class Lm2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"
  private val lam = 0.75

  private def docs: Array[(Long, Array[String])] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), CorpusOps.duckTokens(r.getString(1))))

  private def models: (Array[(Long, Array[String])],
      Map[String, Long], Map[String, Long]) = {
    val ds = docs
    val u = scala.collection.mutable.Map[String, Long]()
    val b2 = scala.collection.mutable.Map[String, Long]()
    ds.foreach { case (_, tk) =>
      tk.foreach(w => u(w) = u.getOrElse(w, 0L) + 1L)
      (0 until tk.length - 1).foreach { j =>
        val b = tk(j) + " " + tk(j + 1)
        b2(b) = b2.getOrElse(b, 0L) + 1L
      }
    }
    (ds, u.toMap, b2.toMap)
  }

  test("lm2DocStats matches an exact in-driver bigram count table") {
    val (ds, u, b2) = models
    val expected = ds.flatMap { case (id, tk) =>
      if (tk.length < 2) None
      else {
        val c2s = (0 until tk.length - 1)
          .map(j => b2(tk(j) + " " + tk(j + 1)))
        val ctx = (0 until tk.length - 1).map(j => u(tk(j)))
        Some(id -> ((c2s.length.toLong, c2s.sum, ctx.sum, c2s.min)))
      }
    }.toMap
    val got = Search.lm2DocStats(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "no multi-token docs — vacuous")
    // positional bigrams, not distinct: n_bigrams = n_tokens − 1
    ds.filter(_._2.length >= 2).foreach { case (id, tk) =>
      assert(got(id)._1 == tk.length.toLong - 1, s"doc $id bigram count")
    }
  }

  /** The exact op order of the distributed expression — shared by the
    * bit-exactness test and the order-sensitivity property. Unseen
    * bigrams (c2 = 0) only arise for OUT-of-corpus text; corpus docs
    * always hit the inner-joined model.
    */
  private def ppl2Of(tk: Array[String], u: Map[String, Long],
      b2: Map[String, Long], vocab: Long, total: Long): Double = {
    val s = (0 until tk.length - 1).map { j =>
      val c2 = b2.getOrElse(tk(j) + " " + tk(j + 1), 0L)
      dec12Scaled(math.log(
        lam * (c2.toDouble + 1.0) /
          (u(tk(j)).toDouble + vocab.toDouble) +
        (1.0 - lam) * (u(tk(j + 1)).toDouble + 1.0) /
          (total.toDouble + vocab.toDouble)))
    }.sum
    math.exp(-(s.toDouble / 1e12) / (tk.length - 1).toDouble)
  }

  test("lm2Perplexity is bit-exact vs the in-driver interpolated reference") {
    val (ds, u, b2) = models
    val vocab = u.size.toLong
    val total = u.values.sum
    val expected = ds.filter(_._2.length >= 2).map { case (id, tk) =>
      id -> ((tk.length.toLong - 1, ppl2Of(tk, u, b2, vocab, total)))
    }.toMap
    val got = Search.lm2Perplexity(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == expected)
    val ppls = got.values.map(_._2)
    assert(ppls.forall(p => p > 0.0 && java.lang.Double.isFinite(p)))
    assert(ppls.max > ppls.min, "flat ppl2 across corpus — vacuous")
  }

  test("pplSelect keeps exactly the middle band of the reference ranking") {
    val (ds, u, b2) = models
    val vocab = u.size.toLong
    val total = u.values.sum
    val ranked = ds.filter(_._2.length >= 2)
      .map { case (id, tk) => (ppl2Of(tk, u, b2, vocab, total), id) }
      .sorted
    val n = ranked.length
    def band(nBands: Int, keep: Int): Set[Long] =
      ranked.zipWithIndex.collect {
        case ((_, id), r) if r.toLong * nBands / n == keep => id
      }.toSet
    val got = Search.pplSelect(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == band(3, 1))
    // band populations balance to within one doc, and the three
    // bands partition the scored corpus
    val sizes = (0 until 3).map(k =>
      Search.pplSelect(spark, sf, 3, k).count())
    assert(sizes.sum == n.toLong)
    assert(sizes.max - sizes.min <= 1,
      s"band populations unbalanced: $sizes")
  }

  test("pplSelectByLang bands each language independently against the reference") {
    val (ds, u, b2) = models
    val vocab = u.size.toLong
    val total = u.values.sum
    val langOf = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val scored = ds.filter(_._2.length >= 2)
      .map { case (id, tk) => (id, ppl2Of(tk, u, b2, vocab, total)) }
    def bandsFor(lang: String, nBands: Int, keep: Int): Set[Long] = {
      val ranked = scored.filter(s => langOf(s._1) == lang)
        .map { case (id, p) => (p, id) }.sorted
      val n = ranked.length
      ranked.zipWithIndex.collect {
        case ((_, id), r) if r.toLong * nBands / n == keep => id
      }.toSet
    }
    val got = Search.pplSelectByLang(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).groupBy(_._2)
      .map { case (l, rows) => l -> rows.map(_._1).toSet }
    val langs = scored.map(s => langOf(s._1)).distinct
    assert(got.keySet == langs.toSet,
      s"languages missing from the selection: ${got.keySet} vs ${langs.toSet}")
    langs.foreach { l =>
      assert(got(l) == bandsFor(l, 3, 1), s"band mismatch for $l")
    }
    // per-language populations balance to within one doc; the three
    // bands partition each language's scored docs
    langs.foreach { l =>
      val nScored = scored.count(s => langOf(s._1) == l).toLong
      val sizes = (0 until 3).map(k =>
        Search.pplSelectByLang(spark, sf, 3, k).collect()
          .count(_.getString(1) == l).toLong)
      assert(sizes.sum == nScored, s"bands do not partition $l")
      assert(sizes.max - sizes.min <= 1,
        s"band populations unbalanced for $l: $sizes")
    }
    // the per-language cut genuinely differs from the global one —
    // the reason T32c exists
    val global = Search.pplSelect(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got.values.flatten.toSet != global,
      "per-language middle band equals the global one — vacuous split")
  }

  test("the bigram model is order-sensitive where the unigram model is blind") {
    // the sf corpora are iid word salad (order carries no signal
    // there by construction), so the property is shown on a PLANTED
    // structured corpus: docs cycle through a fixed 8-word sequence,
    // concentrating all transition mass on 8 bigrams. The formula
    // under test is ppl2Of — pinned bit-exact to the operator above.
    val cycle = Array("alpha", "beta", "gamma", "delta",
      "eps", "zeta", "eta", "theta")
    val ds = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(64)(j => cycle((i + j) % 8)))
    }.toArray
    val u = scala.collection.mutable.Map[String, Long]()
    val b2 = scala.collection.mutable.Map[String, Long]()
    ds.foreach { case (_, tk) =>
      tk.foreach(w => u(w) = u.getOrElse(w, 0L) + 1L)
      (0 until tk.length - 1).foreach { j =>
        val b = tk(j) + " " + tk(j + 1)
        b2(b) = b2.getOrElse(b, 0L) + 1L
      }
    }
    val vocab = u.size.toLong
    val total = u.values.sum
    // a unigram LM cannot tell a doc from its permutation; the bigram
    // model must — scrambling moves mass off the 8 seen transitions
    val rng = new scala.util.Random(42)
    ds.foreach { case (_, tk) =>
      val scrambled = rng.shuffle(tk.toSeq).toArray
      val nat = ppl2Of(tk, u.toMap, b2.toMap, vocab, total)
      val scr = ppl2Of(scrambled, u.toMap, b2.toMap, vocab, total)
      assert(scr > nat * 1.5,
        s"scrambling did not separate: natural $nat vs scrambled $scr")
    }
  }
}
