package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query + oracle registry for text analysis and dedup (SURVEY §2.3,
  * §2.5). The DuckDB SQL mirrors TextFunctions exactly — tokenizer
  * regex, stopword lists, shingle construction — keep in sync.
  */
object TextRegistry {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "text_tokens" -> (TextOps.textTokens _),
    "text_quality" -> (TextOps.textQuality _),
    "text_langid" -> (TextOps.textLangId _),
    "text_fingerprint" -> (TextOps.textFingerprint _),
    "text_shingles" -> (TextOps.textShingles _),
    "wordcount" -> (TextOps.wordcount _),
    "pipeline_clean" -> (TextOps.pipelineClean _),
    "text_normalize" -> (TextOps.textNormalize _),
    "sample_stratified" -> ((s, d) => TextOps.sampleStratified(s, d)),
    "dedup_exact" -> (Dedup.dedupExact _),
    "dedup_jaccard_pairs" -> ((s, d) => Dedup.jaccardPairs(s, d)),
    // rows-only: sketch internals (hash family) are engine-specific;
    // MinHashSpec verifies estimates against exact jaccard instead.
    "dedup_minhash_pairs" -> ((s, d) => MinHashDedup.minhashPairs(s, d)),
    // rows-only: cross-block jaccard (no source-block assumption);
    // recall vs the blocked verifier is spec'd in TextDedupSpec
    "dedup_jaccard_lsh" -> ((s, d) => Dedup.jaccardPairsLsh(s, d)),
    "dedup_simhash" -> ((s, d) => MinHashDedup.simhashPairs(s, d)),
    "contamination_screen" -> ((s, d) => Dedup.screenAgainstReference(s, d)),
    "dedup_clusters" -> ((s, d) => Clusters.nearDupClusters(s, d)),
    // rows-only: LSH pairs (its input) have no SQL oracle; the
    // cluster/union-find equivalence is spec'd on the real pair list
    "dedup_clusters_lsh" -> ((s, d) => Clusters.nearDupClustersLsh(s, d)),
    "text_novelty" -> (CorpusOps.textNovelty _),
    "pack_sequences" -> ((s, d) => CorpusOps.packSequences(s, d)),
    // T44/T44b: token-balanced export shards over the seeded md5
    // shuffle + the per-shard manifest (both hash-checked)
    "export_shards" -> ((s, d) => CorpusOps.exportShards(s, d)),
    "shard_manifest" -> ((s, d) => CorpusOps.shardManifest(s, d)),
    "text_repetition" -> (TextOps.textRepetition _),
    "mix_sources" -> ((s, d) => CorpusOps.mixSources(s, d)),
    // rows-only: seeded Gumbel-perturbed per-source order — float
    // keys like dsir_select_sampled; CorpusOpsSpec pins the full
    // in-driver reference selection, the τ=0 recovery of
    // mix_sources, seed reproducibility and seed sensitivity
    "mix_sources_sampled" -> ((s, d) => CorpusOps.mixSourcesSampled(s, d)),
    "bm25_doc_stats" -> ((s, d) => Search.bm25DocStats(s, d)),
    // rows-only: ln differs from DuckDB's by 1 ulp on ~0.5% of idf
    // inputs; scores are pinned bit-exactly by SearchSpec instead,
    // and the integer retrieval core is oracle-checked above
    "bm25_search" -> ((s, d) => Search.bm25Search(s, d)),
    "pii_scrub" -> (TextOps.piiScrub _),
    // T45 stage-zero HTML→text extraction over the planted page
    // (hash-checked: the same pattern strings drive both engines)
    "html_extract" -> (TextOps.htmlExtract _),
    "quality_classify" -> (TextOps.qualityClassify _),
    "dedup_apply" -> ((s, d) => Clusters.dedupApply(s, d)),
    "dedup_winnow" -> ((s, d) => MinHashDedup.winnowPairs(s, d)),
    "dedup_substring" -> ((s, d) => Dedup.substringPairs(s, d)),
    "text_rolling_fp" -> (MinHashDedup.rollingFingerprints _),
    "screen_apply" -> ((s, d) => Dedup.screenApply(s, d)),
    "corpus_stats" -> (CorpusOps.corpusStats _),
    "source_overlap" -> (CorpusOps.sourceOverlapQuery _),
    // rows-only: a fixed-size KMV hash sketch has no ANSI-SQL oracle;
    // CorpusOpsSpec pins sketch == exact when k covers the union and
    // a bounded-error case where the sketch saturates
    "source_overlap_sketch" -> ((s, d) => CorpusOps.sourceOverlapSketch(s, d)),
    "top_ngrams" -> ((s, d) => CorpusOps.topNgrams(s, d)),
    "boilerplate_share" -> ((s, d) => CorpusOps.boilerplateShare(s, d)),
    "line_dedup" -> (CorpusOps.lineDedupQuery _),
    "domain_line_dedup" -> (CorpusOps.domainLineDedupQuery _),
    "corpus_diversity" -> ((s, d) => CorpusOps.corpusDiversity(s, d)),
    "paragraph_dedup" -> (CorpusOps.paragraphDedupQuery _),
    "corpus_diff" -> (CorpusOps.corpusDiffQuery _),
    // rows-only: a zlib length is engine-specific; determinism,
    // ordering and keep-band behavior are spec'd in QualityOpsSpec
    "compression_ratio" -> (TextOps.compressionRatioQuery _),
    // rows-only (z_bytes); every keep column is spec'd equal to its
    // standalone hash-checked query on the same fixture
    "quality_signals" -> (TextOps.qualitySignalsQuery _),
    // T38 minus the zlib column: the one-scan table's own hash row —
    // four keep gates + score + keep_core oracle-checked in ONE
    // statement (the composed CTEs of the standalone oracles)
    "quality_signals_core" -> (TextOps.qualitySignalsCoreQuery _),
    // T43: the two ablation faces over the signals core — the gate
    // combination matrix and the model-threshold survival curve
    "signals_ablation" -> (TextOps.signalsAblationQuery _),
    "model_threshold_sweep" -> (TextOps.modelThresholdSweep _),
    // P5: signals gate + exact dedup, one scan (hash-checked)
    "pipeline_signals" -> (Pipeline.pipelineSignalsQuery _),
    // P6: the full modern release — URL gate + signals gate + exact
    // dedup + per-domain cap + export shards (hash-checked)
    "pipeline_release" -> (Pipeline.pipelineReleaseQuery _),
    "pipeline_release_carve" ->
      (Pipeline.pipelineReleaseCarveQuery _),
    // P7 the web release: P6 from RAW pages (T45 extraction in
    // front); spec'd EQUAL to pipeline_release via the exact
    // line-per-<p> round trip
    "pipeline_web" -> (Pipeline.pipelineWebQuery _),
    "dedup_apply_best" -> ((s, d) => Clusters.dedupApplyBest(s, d)),
    // rows-only: exact counts on an MG-mined candidate set — the
    // frontier under summary-dependent ties has no SQL oracle; the
    // top-k == exact-top-k guarantee is spec'd vs topNgrams
    "top_ngrams_approx" -> ((s, d) => CorpusOps.topNgramsApprox(s, d)),
    "screen_ngram_overlap" -> (Dedup.screenNgramOverlapQuery _),
    "screen_ngram_bloom" -> (Dedup.screenNgramBloomQuery _),
    "holdout_carve" -> (Dedup.holdoutCarveQuery _),
    "holdout_carve_bloom" -> (Dedup.holdoutCarveBloomQuery _),
    "contamination_report" -> (Dedup.contaminationReportQuery _),
    "contamination_report_join" ->
      (Dedup.contaminationReportJoinQuery _),
    // D19: released-corpus fingerprint Bloom screen (hash-checked —
    // deterministically the exact fp semi-join at registered size)
    "dedup_exact_bloom" -> ((s, d) => Dedup.dedupExactBloomQuery(s, d)),
    "lm_doc_stats" -> (Search.lmDocStats _),
    // rows-only: JVM ln/exp differ from DuckDB by 1 ulp on a tail of
    // inputs (the bm25_search precedent); SearchSpec pins ppl
    // bit-exactly, and the integer core is lm_doc_stats above
    "lm_perplexity" -> (Search.lmPerplexity _),
    "lm2_doc_stats" -> (Search.lm2DocStats _),
    // rows-only: same JVM-ln/exp 1-ulp reasoning as lm_perplexity;
    // Lm2Spec pins ppl2 bit-exactly against an in-driver reference
    // and the integer core is lm2_doc_stats above
    "lm2_perplexity" -> ((s, d) => Search.lm2Perplexity(s, d)),
    "nb_doc_stats" -> (Classify.nbDocStats _),
    // rows-only: the score is the scaled float (JVM-ln 1-ulp drift,
    // and a 1-ulp drift can flip a near-tied cross-engine argmax);
    // NbSpec pins scores AND predictions bit-exactly plus
    // planted-class recovery; integer core is nb_doc_stats above
    "nb_classify" -> (Classify.nbClassify _),
    // rows-only: float-ordered ranking over the lm2 score (the
    // dsir_select precedent); Lm2Spec pins the selected set against
    // the in-driver reference ranking and the band balance
    "ppl_select" -> ((s, d) => Search.pplSelect(s, d)),
    // T32c rows-only for the same reason; Lm2Spec pins the
    // per-language selected sets and the ≤1-doc per-language balance
    "ppl_select_lang" -> ((s, d) => Search.pplSelectByLang(s, d)),
    // T46 tokenizer fertility by language (hash-checked: integer
    // sums + one stated IEEE division per ratio)
    "token_fertility" -> (TextOps.tokenFertility _),
    // small windows (32/8) so the sf corpora actually multi-chunk;
    // the API default is 2048/256
    "chunk_docs" -> ((s, d) =>
      CorpusOps.chunkDocs(s, d, chunkTokens = 32, overlap = 8)),
    // step=10 so the sf corpora produce a real curve (the API
    // default is 50)
    "vocab_growth" -> ((s, d) => CorpusOps.vocabGrowth(s, d, step = 10L)),
    "dsir_doc_stats" -> ((s, d) => Search.dsirDocStats(s, d)),
    // rows-only: same JVM-ln 1-ulp reasoning as lm_perplexity;
    // SearchSpec pins the log-weights bit-exactly and the integer
    // core is dsir_doc_stats above
    "dsir_weights" -> ((s, d) => Search.dsirWeights(s, d)),
    // rows-only: selection ranks by the float weight; SearchSpec pins
    // the selected set exactly vs the in-driver reference ranking
    "dsir_select" -> ((s, d) => Search.dsirSelect(s, d)),
    // rows-only: seeded Gumbel-top-k sampled selection — float-keyed
    // ranking like dsir_select; SearchSpec pins seed reproducibility
    // and the τ=0 recovery of the deterministic selection
    "dsir_select_sampled" -> ((s, d) => Search.dsirSelectSampled(s, d)),
    // hash-checked END TO END: the six-stage recipe's oracle composes
    // the quality/line-dedup/closure/keeper/screen/mix/pack CTEs over
    // the line-rebuilt clean text (int/string output only);
    // PipelineSpec additionally pins stagewise set-equality and the
    // share-on/off equivalence
    "pipeline_full" -> (Pipeline.pipelineFullQuery _),
    // hash-checked end to end like pipeline_full — the Lee et al.
    // span-removal recipe: scrub CTEs replace the closure/keeper
    // stages, plus the post-scrub minimum-length gate
    "pipeline_scrub" -> (Pipeline.pipelineScrubQuery _),
    "substring_scrub" -> (CorpusOps.substringScrubQuery _),
    // rows-only: an iterative frequency mine has no ANSI-SQL
    // statement; BpeSpec pins determinism + a hand-computed mine
    "bpe_train" -> (Bpe.bpeTrainQuery _),
    // rows-only: bins derive from the mined subword counts; the
    // sequential-packer reference is pinned in BpeSpec
    "pack_sequences_bpe" -> ((s, d) => Bpe.packSequencesBpe(s, d)),
    // the sf vocabulary contains only 'the' of Gopher's 8 English
    // stop words, so the registered query swaps in a corpus-fitting
    // 2-word list to keep the stop rule (and the keep decision)
    // non-degenerate — the chunk_docs corpus-adaptation precedent;
    // the API default is the published list
    "quality_gopher" -> ((s, d) =>
      TextOps.qualityGopher(s, d, stopWords = Seq("the", "a"))),
    // hash-checked incl. the keep bit over a planted multi-line
    // fixture (the sf corpus has no newlines/punctuation/braces)
    "quality_c4" -> (TextOps.qualityC4Query _),
    // the APPLY form: cleaned kept-line text, failing pages dropped —
    // hash-checked end to end (strings + ints)
    "c4_apply" -> (TextOps.c4ApplyQuery _),
    // the paper's literal dedup unit: three-sentence spans, first
    // occurrence kept — hash-checked (byte-exact unit rebuild)
    "sentence_span_scrub" -> (CorpusOps.sentenceSpanScrubQuery _),
    // same output contract, the never-collects shuffle shape — its
    // own hash row under the same oracle statement
    "sentence_span_scrub_join" ->
      (CorpusOps.sentenceSpanScrubJoinQuery _),
    // the released C4 pipeline composed end to end: page clean +
    // span dedup — hash-checked through both stages' CTEs
    "pipeline_c4" -> (Pipeline.pipelineC4Query _),
    "dedup_index_build" -> (IncrementalDedup.indexBuildQuery _),
    "dedup_incremental_exact" -> (IncrementalDedup.incrementalExact _),
    // rows-only: signature-estimated jaccard (engine-specific hash
    // family, the dedup_minhash_pairs reasoning); spec'd equivalent
    // to minhashPairs restricted to increment×index pairs
    "dedup_incremental" -> ((s, d) => IncrementalDedup.incrementalNear(s, d)),
    // rows-only: candidates are estimate-banded (engine-specific
    // sketch), but every emitted jaccard is EXACT — spec'd equal to
    // minhashPairs' verified pairs restricted to straddling pairs
    "dedup_incremental_verified" ->
      ((s, d) => IncrementalDedup.incrementalNearVerified(s, d)),
    // rows-only: the near-screen stage has no SQL oracle (see
    // dedup_incremental); PipelineSpec pins stagewise set-equality
    // against the standalone screens + gate and share-on/off equality
    "pipeline_ingest" -> (Pipeline.pipelineIngestQuery _),
    // rows-only like pipeline_ingest; the near stage drops on the
    // EXACT verified jaccard (the D17 tail) — PipelineSpec pins the
    // stagewise decomposition and the est-vs-verified divergence
    "pipeline_ingest_verified" ->
      (Pipeline.pipelineIngestVerifiedQuery _),
    "gopher_repetition" -> (TextOps.gopherRepetition _),
    // T39–T41 URL/domain curation over the planted URL fixture —
    // all three hash-checked (strings, flags, integer ranks)
    "domain_filter" -> (DomainOps.domainFilterQuery _),
    "domain_cap" -> ((s, d) => DomainOps.domainCapQuery(s, d)),
    "domain_cap_apply" -> ((s, d) => DomainOps.domainCapApplyQuery(s, d)),
    // T42: the X24 online admission reconciled against the batch
    // md5-rank policy — full audit table, hash-checked
    "domain_cap_rebalance" ->
      ((s, d) => DomainOps.domainCapRebalanceQuery(s, d))
  )

  // Shared SQL fragments (DuckDB): tokens and trigram shingles.
  private val TOKS = "regexp_split_to_array(trim(text), '\\s+')"

  /** The shared CTE prefix of the `quality_c4` / `c4_apply` oracles:
    * the planted multi-line fixture, per-line classification in the
    * kernel's attribution order, per-doc aggregates (`a`) and page
    * flags (`p`). Tails select the stats row (quality_c4) or the
    * cleaned kept-line rebuild (c4_apply).
    */
  private val c4OracleCte: String = c4OracleCteWith("")

  /** The one oracle behind BOTH T35 shapes (`sentence_span_scrub`
    * and `sentence_span_scrub_join`) — identical output contract.
    */
  private def sentenceScrubOracle: String =
    s"""WITH d AS (SELECT doc_id, CASE WHEN doc_id % 9 = 2
       |  THEN text || '. shr zero. shr one! shr two?'
       |  ELSE text END AS text FROM documents)""".stripMargin +
      sentenceScrubSql("d")

  /** The sentence-span scrub CTE chain (T35), reading `(doc_id,
    * text)` from CTE `src`: sentence units via
    * `regexp_extract_all('[^.!?]*[.!?]+|[^.!?]+')` (units keep their
    * bytes — concatenation reproduces the text), 3-unit windows
    * keyed injectively (length-prefixed join — the gopher_repetition
    * convention), min-owner over distinct (doc, window), coverage
    * NOT-EXISTS, byte-exact rebuild via `string_agg(s, '')`.
    * Starts with "," — appended to an open WITH chain.
    */
  private def sentenceScrubSql(src: String): String =
    s""",
       |t2 AS (SELECT doc_id,
       |  regexp_extract_all(text, '[^.!?]*[.!?]+|[^.!?]+') AS su
       | FROM $src),
       |wi2 AS (SELECT doc_id, su,
       |  unnest(range(1, greatest(len(su) - 1, 1))) AS i FROM t2),
       |w2 AS (SELECT doc_id, i,
       |  list_aggregate(list_transform(su[i:i+2],
       |    s -> length(s)::VARCHAR || ':' || s),
       |    'string_agg', chr(0)) AS win FROM wi2),
       |own2 AS (SELECT win, min(doc_id) AS owner FROM (
       |  SELECT DISTINCT doc_id, win FROM w2) GROUP BY win),
       |bad2 AS (SELECT w2.doc_id, w2.i FROM w2 JOIN own2 USING (win)
       |  WHERE own2.owner < w2.doc_id),
       |sen AS (SELECT doc_id, unnest(su) AS s,
       |  generate_subscripts(su, 1) AS j FROM t2),
       |kepts AS (SELECT sen.doc_id, sen.j, sen.s FROM sen
       |  WHERE NOT EXISTS (SELECT 1 FROM bad2
       |    WHERE bad2.doc_id = sen.doc_id
       |      AND bad2.i <= sen.j AND sen.j <= bad2.i + 2)),
       |res AS (SELECT doc_id,
       |  string_agg(s, '' ORDER BY j) AS clean_text,
       |  count(*)::BIGINT AS n_kept FROM kepts GROUP BY doc_id),
       |tot AS (SELECT doc_id, len(su)::BIGINT AS n_units FROM t2)
       |SELECT tot.doc_id, coalesce(res.clean_text, '') AS clean_text,
       |  coalesce(res.n_kept, 0)::BIGINT AS n_kept,
       |  (tot.n_units - coalesce(res.n_kept, 0))::BIGINT AS n_dropped
       |FROM tot LEFT JOIN res ON tot.doc_id = res.doc_id
       |ORDER BY tot.doc_id""".stripMargin

  /** [[c4OracleCte]] with an extra SQL fragment appended to the
    * planted text (after the closing good line) — the
    * `pipeline_c4` planting hook, mirroring
    * TextOps.c4PlantedDocsWith.
    */
  // plain concatenation — NO outer stripMargin: c4PlantExpr has
  // already stripped its own margins (and the caller's `extra`
  // margins, spliced pre-strip); a second pass would eat the first
  // '|' of any '||' continuation line
  private def c4OracleCteWith(extra: String): String =
    "WITH t AS (SELECT doc_id,\n  " + c4PlantExpr(extra) +
      " AS text\n FROM documents)" + c4ChainFromT

  /** The planted-text SQL EXPRESSION alone (mirrors
    * TextOps.c4PlantedDocsWith) — exposed so a caller can wrap it
    * (e.g. pipeline_signals' duplicate-page CASE) without forking
    * the plant.
    */
  private def c4PlantExpr(extra: String): String =
    s"""text || '.' ||
      |  chr(10) || 'short line.' ||
      |  chr(10) || 'this line lacks terminal punctuation' ||
      |  chr(10) || 'this one trails off into an ellipsis...' ||
      |  CASE WHEN doc_id % 3 = 0
      |    THEN chr(10) || 'this javascript line has six words.'
      |    ELSE '' END ||
      |  CASE WHEN doc_id % 4 = 1
      |    THEN chr(10) || 'we accept the privacy policy today.'
      |    ELSE '' END ||
      |  CASE WHEN doc_id % 5 = 2
      |    THEN chr(10) || 'lorem ipsum dolor sit amet now.'
      |    ELSE '' END ||
      |  CASE WHEN doc_id % 6 = 3
      |    THEN chr(10) || 'curly { brace appears on this page.'
      |    ELSE '' END ||
      |  CASE WHEN doc_id % 7 = 4
      |    THEN chr(10) || 'badword one appears right here now.'
      |    ELSE '' END ||
      |  CASE WHEN doc_id % 2 = 0
      |    THEN chr(10) || 'he said "a quoted line ends well."'
      |    ELSE '' END ||
      |  chr(10) || 'another good line with five words!'$extra""".stripMargin

  /** The C4 line/page statistics chain reading CTE `t(doc_id, text)`
    * — the l/c/d/a/p tail shared by every c4-family oracle. Starts
    * with "," (appended to an open WITH chain).
    */
  // lazy: c4OracleCte (an earlier val) forces this during object init
  private lazy val c4ChainFromT: String =
    s""",
      |l AS (SELECT doc_id,
      |  unnest(string_split(text, chr(10))) AS line,
      |  generate_subscripts(string_split(text, chr(10)), 1) AS ord
      | FROM t),
      |c AS (SELECT doc_id, line, ord, rtrim(line, ' ') AS rl,
      |  lower(line) AS ll,
      |  len(regexp_split_to_array(trim(line), '\\s+')) AS words
      | FROM l),
      |d AS (SELECT doc_id, line, ord,
      |  CASE WHEN NOT (right(rl, 1) IN ('.', '?', '!', '"'))
      |         OR right(rl, 3) = '...' THEN 'noterm'
      |       WHEN words < 5 THEN 'short'
      |       WHEN contains(ll, 'javascript') THEN 'js'
      |       WHEN contains(ll, 'terms of use')
      |         OR contains(ll, 'privacy policy')
      |         OR contains(ll, 'cookie policy')
      |         OR contains(ll, 'uses cookies')
      |         OR contains(ll, 'use of cookies')
      |         OR contains(ll, 'use cookies') THEN 'policy'
      |       ELSE 'kept' END AS cls
      | FROM c),
      |a AS (SELECT doc_id,
      |  count(*)::BIGINT AS n_lines,
      |  (count(*) FILTER (WHERE cls = 'kept'))::BIGINT AS n_kept_lines,
      |  COALESCE(SUM(CASE WHEN cls = 'kept' THEN
      |    length(line) - length(replace(replace(replace(
      |      line, '.', ''), '!', ''), '?', '')) END), 0)::BIGINT
      |    AS n_sentences,
      |  COALESCE(SUM(CASE WHEN cls = 'kept' THEN length(line) END),
      |    0)::BIGINT AS kept_chars,
      |  (count(*) FILTER (WHERE cls = 'noterm'))::BIGINT
      |    AS n_noterm_lines,
      |  (count(*) FILTER (WHERE cls = 'short'))::BIGINT
      |    AS n_short_lines,
      |  (count(*) FILTER (WHERE cls = 'js'))::BIGINT AS n_js_lines,
      |  (count(*) FILTER (WHERE cls = 'policy'))::BIGINT
      |    AS n_policy_lines
      | FROM d GROUP BY doc_id),
      |p AS (SELECT doc_id,
      |  contains(lower(text), 'lorem ipsum')::BIGINT AS has_lorem,
      |  contains(text, '{')::BIGINT AS has_brace,
      |  (len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
      |     w -> lower(w) = 'badword')) > 0)::BIGINT AS has_badword
      | FROM t)""".stripMargin

  // Generated per-n CTE blocks for the gopher_repetition oracle:
  // grams via zipped unnests over the position range, counts, then
  // top mass (n ≤ 4) or covered-position dup mass (n ≥ 5).
  private def grBlock(n: Int, tl: String = "tl"): String = {
    val base = s"""g$n AS (
      |  SELECT doc_id,
      |    unnest(range(1, greatest(len(toks)-$n+2, 1))) AS i,
      |    unnest(list_transform(range(1, greatest(len(toks)-$n+2, 1)),
      |      i -> list_aggregate(list_transform(list_slice(toks, i, i+$n-1),
      |             w -> length(w)::VARCHAR || ':' || w),
      |             'string_agg', chr(0)))) AS gram,
      |    unnest(list_transform(range(1, greatest(len(toks)-$n+2, 1)),
      |      i -> list_sum(list_slice(lens, i, i+$n-1))))::BIGINT AS gchars
      |  FROM $tl),
      |c$n AS (SELECT doc_id, gram, count(*) AS cnt, max(gchars) AS gch
      |  FROM g$n GROUP BY doc_id, gram)""".stripMargin
    if (n <= 4) base + s""",
      |top$n AS (SELECT doc_id, max(cnt*gch) AS mass FROM c$n
      |  GROUP BY doc_id)""".stripMargin
    else base + s""",
      |cov$n AS (SELECT DISTINCT g.doc_id, g.i + x.p AS p
      |  FROM g$n g JOIN c$n c ON g.doc_id = c.doc_id AND g.gram = c.gram
      |  CROSS JOIN (SELECT unnest(range(0, $n)) AS p) x
      |  WHERE c.cnt >= 2),
      |dup$n AS (SELECT cov$n.doc_id, SUM($tl.lens[cov$n.p])::BIGINT AS dmass
      |  FROM cov$n JOIN $tl ON cov$n.doc_id = $tl.doc_id
      |  GROUP BY cov$n.doc_id)""".stripMargin
  }

  // thresholds (num, den) aligned with TextOps.gopherRepetitionDocs
  private val repThresholds = Seq("top2" -> ((1, 5)), "top3" -> ((9, 50)),
    "top4" -> ((4, 25)), "dup5" -> ((3, 20)), "dup6" -> ((7, 50)),
    "dup7" -> ((13, 100)), "dup8" -> ((3, 25)), "dup9" -> ((11, 100)),
    "dup10" -> ((1, 10)))

  /** The T31 keep decision over a mass table `q` — shared by the
    * standalone statement and the quality_signals_core composition.
    */
  private def repKeepSql(q: String): String =
    s"""CASE WHEN ${repThresholds.map { case (c, (num, den)) =>
      s"$q.$c * $den <= $q.word_chars * $num" }.mkString("\n  AND ")}
       | THEN 1 ELSE 0 END""".stripMargin

  /** The T31 CTE chain over an arbitrary `(doc_id, text)` CTE `src`,
    * ending in `$m(doc_id, word_chars, top2..4, dup5..10)`. Gram CTE
    * names (g2..c10/top/cov/dup) are fixed — compose at most once per
    * statement. Starts with the token CTEs; caller supplies WITH/",".
    */
  private def repCtes(src: String, tl: String, m: String): String = {
    val blocks = (2 to 10).map(n => grBlock(n, tl)).mkString(",\n")
    val masses = (2 to 4).map(n =>
      s"COALESCE(top$n.mass, 0) AS top$n") ++ (5 to 10).map(n =>
      s"COALESCE(dup$n.dmass, 0) AS dup$n")
    val joins = (2 to 4).map(n =>
      s"LEFT JOIN top$n ON $tl.doc_id = top$n.doc_id") ++ (5 to 10).map(n =>
      s"LEFT JOIN dup$n ON $tl.doc_id = dup$n.doc_id")
    s"""${tl}0 AS (SELECT doc_id, $TOKS AS toks FROM $src),
       |$tl AS (SELECT doc_id, toks,
       |  list_transform(toks, w -> length(w)) AS lens FROM ${tl}0),
       |$blocks,
       |$m AS (SELECT $tl.doc_id,
       |  COALESCE(list_sum($tl.lens), 0)::BIGINT AS word_chars,
       |  ${masses.mkString(",\n  ")}
       | FROM $tl ${joins.mkString(" ")})""".stripMargin
  }

  /** The T30 statistics CTEs over an arbitrary `(doc_id, text)` CTE
    * `src`, ending in `$m` with the ten gopher_stats columns; `$t` is
    * the intermediate token/line split. Stop list is the registered
    * corpus-fitted pair ('the', 'a') — the quality_gopher and
    * quality_signals queries share it.
    */
  private def gopherCtes(src: String, t: String, m: String): String =
    s"""$t AS (SELECT doc_id, text, $TOKS AS toks,
       |  string_split(text, chr(10)) AS lines FROM $src),
       |$m AS (SELECT doc_id,
       |  len(toks) AS n_words,
       |  list_sum(list_transform(toks, w -> length(w)))::BIGINT
       |    AS word_chars,
       |  len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
       |    AS n_alpha_words,
       |  len(lines) AS n_lines,
       |  len(list_distinct(lines)) AS n_distinct_lines,
       |  len(list_filter(lines, l -> rtrim(l) LIKE '%...'))
       |    AS n_ellipsis_lines,
       |  (length(text) - length(replace(text, '#', ''))
       |    + len(string_split(text, '...')) - 1) AS n_symbols,
       |  (list_contains(list_transform(toks, w -> lower(w)), 'the')::BIGINT
       |   + list_contains(list_transform(toks, w -> lower(w)), 'a')::BIGINT)
       |    AS stop_hits,
       |  COALESCE(list_sum(list_transform(lines, l -> length(l))), 0)::BIGINT
       |    AS line_chars,
       |  COALESCE(list_sum(list_transform(
       |    list_filter(lines, l ->
       |      len(list_filter(lines, x -> x = l)) >= 2),
       |    l -> length(l))), 0)::BIGINT AS dup_line_chars
       | FROM $t)""".stripMargin

  /** The T30 keep decision over a statistics table `q` — qualified so
    * it composes beside the c4 aggregates (whose `a` also carries an
    * n_lines column).
    */
  private def gopherKeepSql(q: String): String =
    s"""CASE WHEN $q.n_words >= 50 AND $q.n_words <= 100000
       |  AND $q.n_words * 3 <= $q.word_chars
       |  AND $q.word_chars <= $q.n_words * 10
       |  AND $q.n_symbols * 10 <= $q.n_words
       |  AND $q.n_ellipsis_lines * 10 <= $q.n_lines * 3
       |  AND $q.n_alpha_words * 5 >= $q.n_words * 4
       |  AND $q.stop_hits >= 2
       |  AND ($q.n_lines - $q.n_distinct_lines) * 10 <= $q.n_lines * 3
       |  AND $q.dup_line_chars * 5 <= $q.line_chars
       | THEN 1 ELSE 0 END""".stripMargin

  private def gopherRepetitionSql: String =
    s"""WITH ${repCtes("documents", "tl", "m")}
       |SELECT doc_id, word_chars, top2, top3, top4,
       | dup5, dup6, dup7, dup8, dup9, dup10,
       | ${repKeepSql("m")} AS keep_rep
       |FROM m ORDER BY doc_id""".stripMargin
  private val SH =
    s"""list_distinct(list_transform(range(1, greatest(len($TOKS)-1, 1)),
       | i -> concat_ws(' ', ($TOKS)[i], ($TOKS)[i+1], ($TOKS)[i+2])))""".stripMargin

  // shared recursive-CTE prefix: near-dup pair edges (same SQL as
  // dedup_jaccard_pairs) closed transitively; `reach(src, dst)` holds
  // every (member, reachable-member) of each component
  private val CLUSTER_CTE =
    s"""WITH RECURSIVE t AS (SELECT doc_id, source, $SH AS sh FROM documents),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |      FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
       |      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
       |        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
       |        >= 0.02),
       |und AS (SELECT doc_a AS a, doc_b AS b FROM p
       |        UNION SELECT doc_b, doc_a FROM p),
       |reach(src, dst) AS (
       |  SELECT a, a FROM und
       |  UNION
       |  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
       |)""".stripMargin

  // T15 model-score CTE chain (qs(doc_id, q_score)) — shared by
  // quality_classify and dedup_apply_best; q-prefixed names so it
  // composes with CLUSTER_CTE (whose `t` is the shingle table)
  private lazy val QSCORE_CTES = qscoreCtes("documents")

  private def qscoreCtes(src: String): String =
    s"""qt AS (SELECT doc_id, text, $TOKS AS tk FROM $src),
       |qm AS (SELECT doc_id, len(tk)::BIGINT AS n,
       |  length(text) AS n_chars,
       |  len(list_filter(tk, x -> x IN $EN))::BIGINT AS sw,
       |  length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS pc,
       |  len(list_distinct(list_transform(range(1, greatest(len(tk), 1)),
       |    i -> concat_ws(' ', tk[i], tk[i+1]))))::BIGINT AS d2
       | FROM qt),
       |qtop AS (SELECT doc_id, max(c)::BIGINT AS top_c FROM (
       |  SELECT doc_id, w, count(*) AS c FROM
       |    (SELECT doc_id, unnest(tk) AS w FROM qt) GROUP BY doc_id, w)
       |  GROUP BY doc_id),
       |qs AS (SELECT qm.doc_id,
       |   least(n::DOUBLE, 400.0) / 400.0 * 0.35
       | + least(sw::DOUBLE / n::DOUBLE * 4.0, 1.0) * 0.25
       | + (1.0 - least(pc::DOUBLE / n_chars::DOUBLE * 5.0, 1.0)) * 0.15
       | + (1.0 - top_c::DOUBLE / n::DOUBLE) * 0.15
       | + (1.0 - CASE WHEN n <= 1 THEN 0.0
       |     ELSE (n - 1 - d2)::DOUBLE / (n - 1) END) * 0.10 AS q_score
       | FROM qm JOIN qtop USING (doc_id))""".stripMargin

  /** The T38 core signals as a composable CTE `core(doc_id, q_score,
    * n_bytes, keep_gopher, keep_rep, keep_c4, keep_model, keep_core)`
    * — the c4 planted fixture's CTEs (t/a/p) + the T30/T31/T15 chains
    * re-targeted at the planted text, ONE definition shared by the
    * quality_signals_core statement and the T43 ablation.
    */
  private lazy val signalsCoreCtes: String =
    signalsCoreChainFrom(c4OracleCte)

  /** The core-signals chain over an arbitrary open WITH prefix that
    * defines `t(doc_id, text)` and the c4 chain (l/c/d/a/p) — ONE
    * definition shared by quality_signals_core, the T43 ablation and
    * the P5 release recipe (whose `t` wraps the plant in a
    * duplicate-page CASE).
    */
  private def signalsCoreChainFrom(c4Prefix: String): String =
    c4Prefix + "," +
      gopherCtes("t", "gt", "gm") + "," +
      repCtes("t", "rtl", "rm") + "," +
      qscoreCtes("t") +
      s""",
         |core AS (SELECT t.doc_id, qs.q_score,
         | strlen(t.text)::BIGINT AS n_bytes,
         | ${gopherKeepSql("gm")} AS keep_gopher,
         | ${repKeepSql("rm")} AS keep_rep,
         | CASE WHEN p.has_lorem = 0 AND p.has_brace = 0
         |   AND p.has_badword = 0 AND a.n_sentences >= 3
         |   THEN 1 ELSE 0 END AS keep_c4,
         | CASE WHEN qs.q_score >= 0.5 THEN 1 ELSE 0 END
         |   AS keep_model,
         | CASE WHEN keep_gopher = 1 AND keep_rep = 1
         |   AND keep_c4 = 1 AND keep_model = 1
         |   THEN 1 ELSE 0 END AS keep_core
         |FROM t JOIN a USING (doc_id) JOIN p USING (doc_id)
         | JOIN gm USING (doc_id) JOIN rm USING (doc_id)
         | JOIN qs USING (doc_id))""".stripMargin

  /** The D13 planted-fixture overlap statement — shared verbatim by
    * `screen_ngram_overlap` and the D18 Bloom screen (whose output is
    * deterministically identical at the registered filter size).
    */
  private val SCREEN_NGRAM_SQL: String =
    s"""WITH d AS (SELECT doc_id, CASE WHEN doc_id % 11 = 3
       |  THEN text || ' ev0 ev1 ev2 ev3 ev4 ev5 ev6 ev7 ev8 ev9 ev10 ev11 ev12'
       |  ELSE text END AS text FROM documents),
       |t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
       |  FROM d),
       |g AS (SELECT doc_id, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(tk) - 11, 1)),
       |    i -> array_to_string(list_slice(tk, i, i + 12), ' ')))) AS gm
       |  FROM t WHERE len(tk) >= 13),
       |r AS (SELECT DISTINCT gm FROM g WHERE doc_id % 7 = 0)
       |SELECT g.doc_id, count(*)::BIGINT AS n_overlap
       |FROM g JOIN r USING (gm)
       |WHERE g.doc_id % 7 <> 0
       |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin

  /** The D20/D21 shared prefix: planted phrase, seeded md5 split,
    * per-doc distinct 13-gram expansion — ONE definition for the
    * carve statements and the contamination report.
    */
  private val HOLDOUT_SPLIT_CTES: String =
    s"""WITH d AS (SELECT doc_id, CASE WHEN doc_id % 5 = 3
       |  THEN text || ' hv0 hv1 hv2 hv3 hv4 hv5 hv6 hv7 hv8 hv9 hv10 hv11 hv12'
       |  ELSE text END AS text FROM documents),
       |e AS (SELECT doc_id, text,
       |  ('0x' || substr(md5('7:' || doc_id::VARCHAR), 1, 13))::BIGINT
       |    * 10 < 4503599627370496 AS is_eval FROM d),
       |t AS (SELECT doc_id, is_eval,
       |  regexp_split_to_array(trim(text), '\\s+') AS tk FROM e),
       |g AS (SELECT doc_id, is_eval, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(tk) - 11, 1)),
       |    i -> array_to_string(list_slice(tk, i, i + 12), ' ')))) AS gm
       |  FROM t WHERE len(tk) >= 13)""".stripMargin

  /** The D20 carve chain over an arbitrary `src(doc_id, text)` CTE
    * at an arbitrary eval fraction (h-prefixed CTE names so it
    * appends to any open WITH chain) — the P8 release+carve
    * composition's tail. Same statements as [[HOLDOUT_CARVE_SQL]]
    * modulo source and fraction: split = first 13 hex of
    * md5('7:' || doc_id), eval ⟺ key·den < num·2^52.
    */
  private def holdoutCarveTail(src: String, num: Long,
      den: Long): String =
    s""",
       |he AS (SELECT doc_id, text,
       |  ('0x' || substr(md5('7:' || doc_id::VARCHAR), 1, 13))::BIGINT
       |    * $den < ${num * 4503599627370496L} AS is_eval FROM $src),
       |ht AS (SELECT doc_id, is_eval,
       |  regexp_split_to_array(trim(text), '\\s+') AS tk FROM he),
       |hg AS (SELECT doc_id, is_eval, unnest(list_distinct(list_transform(
       |    range(1, greatest(len(tk) - 11, 1)),
       |    i -> array_to_string(list_slice(tk, i, i + 12), ' ')))) AS gm
       |  FROM ht WHERE len(tk) >= 13),
       |hr AS (SELECT DISTINCT gm FROM hg WHERE is_eval),
       |hh AS (SELECT hg.doc_id, count(*)::BIGINT AS n_overlap
       |  FROM hg JOIN hr USING (gm)
       |  WHERE NOT hg.is_eval GROUP BY hg.doc_id)
       |SELECT he.doc_id,
       |  CASE WHEN he.is_eval THEN 'eval'
       |       WHEN hh.n_overlap IS NOT NULL THEN 'contaminated'
       |       ELSE 'train' END AS role,
       |  coalesce(hh.n_overlap, 0)::BIGINT AS n_overlap
       |FROM he LEFT JOIN hh USING (doc_id) ORDER BY doc_id""".stripMargin

  /** The D21 report statement — shared verbatim by
    * `contamination_report` (broadcast shape) and
    * `contamination_report_join` (the never-collects shuffle shape,
    * identical output by construction).
    */
  private val CONTAMINATION_REPORT_SQL: String =
    s"""$HOLDOUT_SPLIT_CTES,
       |pairs AS (SELECT DISTINCT ge.doc_id AS eval_id,
       |  gt.doc_id AS train_id, ge.gm
       |  FROM g ge JOIN g gt ON ge.gm = gt.gm
       |  WHERE ge.is_eval AND NOT gt.is_eval)
       |SELECT eval_id,
       |  count(DISTINCT train_id)::BIGINT AS n_dirty_docs,
       |  count(*)::BIGINT AS n_hits
       |FROM pairs GROUP BY eval_id ORDER BY eval_id""".stripMargin

  /** The D20 carve statement — shared verbatim by `holdout_carve`
    * and the D20b Bloom path (identical at the registered size, the
    * D18 precedent). Split = first 13 hex of md5('7:' || doc_id) as
    * a 52-bit long, eval ⟺ key·10 < 2^52 (~10%); grams are the D13
    * distinct 13-token windows; every doc gets exactly one row.
    */
  private val HOLDOUT_CARVE_SQL: String =
    s"""$HOLDOUT_SPLIT_CTES,
       |r AS (SELECT DISTINCT gm FROM g WHERE is_eval),
       |h AS (SELECT g.doc_id, count(*)::BIGINT AS n_overlap
       |  FROM g JOIN r USING (gm)
       |  WHERE NOT g.is_eval GROUP BY g.doc_id)
       |SELECT e.doc_id,
       |  CASE WHEN e.is_eval THEN 'eval'
       |       WHEN h.n_overlap IS NOT NULL THEN 'contaminated'
       |       ELSE 'train' END AS role,
       |  coalesce(h.n_overlap, 0)::BIGINT AS n_overlap
       |FROM e LEFT JOIN h USING (doc_id) ORDER BY doc_id""".stripMargin

  private val PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PII_PHONE = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val PII_IP =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private val EN = "('the','a','of','and','to','in','is')"
  private val ENL = "['the','a','of','and','to','in','is']"
  private val DEL = "['der','die','das','und','ist','ein']"
  private val ESL = "['el','la','de','los','y','es','un']"
  private val FRL = "['le','la','les','et','des','est','un']"

  val oracle: Map[String, String] = Map(
    "text_tokens" ->
      s"""SELECT doc_id,
         | len($TOKS) AS n_tokens,
         | len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    // T46 per-language fertility: exact integer sums, each ratio ONE
    // IEEE division (strlen = DuckDB's byte length, = octet_length)
    "token_fertility" ->
      s"""WITH t AS (SELECT lang,
         | len($TOKS) AS nt,
         | len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS nb,
         | strlen(text) AS by, length(text) AS ch FROM documents)
         |SELECT lang, COUNT(*) AS n_docs,
         | SUM(nt)::BIGINT AS n_tokens, SUM(nb)::BIGINT AS n_bpe_tokens,
         | SUM(by)::BIGINT AS n_bytes, SUM(ch)::BIGINT AS n_chars,
         | SUM(by)::DOUBLE / SUM(nb)::DOUBLE AS bytes_per_bpe_token,
         | SUM(ch)::DOUBLE / SUM(nt)::DOUBLE AS chars_per_token
         |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $TOKS AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  len(toks) AS n_tokens,
         |  len(list_filter(toks, t -> t IN $EN)) AS sw_hits,
         |  length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS punct_cnt,
         |  length(text) AS n_chars
         | FROM t)
         |SELECT doc_id, n_tokens, sw_hits, punct_cnt,
         | CAST(CASE WHEN n_tokens >= 20 AND n_tokens <= 1000 THEN 1.0
         |       WHEN n_tokens >= 5 THEN 0.5 ELSE 0.0 END AS DOUBLE) * 0.5
         | + CAST(CASE WHEN sw_hits::DOUBLE / n_tokens >= 0.01
         |          AND sw_hits::DOUBLE / n_tokens <= 0.5
         |     THEN 1.0 ELSE 0.0 END AS DOUBLE) * 0.3
         | + CAST(CASE WHEN punct_cnt::DOUBLE / n_chars <= 0.2
         |     THEN 1.0 ELSE 0.0 END AS DOUBLE) * 0.2 AS quality
         |FROM m ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""WITH t AS (SELECT doc_id, lang, list_distinct($TOKS) AS dt
         | FROM documents),
         |s AS (SELECT doc_id, lang,
         |  len(list_intersect(dt, $ENL)) AS s_en,
         |  len(list_intersect(dt, $DEL)) AS s_de,
         |  len(list_intersect(dt, $ESL)) AS s_es,
         |  len(list_intersect(dt, $FRL)) AS s_fr
         | FROM t)
         |SELECT doc_id, lang AS lang_label,
         | CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
         |      WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
         |      WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
         |      WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
         |      ELSE 'fr' END AS lang_pred
         |FROM s ORDER BY doc_id""".stripMargin,
    "text_normalize" ->
      """WITH n AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(trim(lower(text)),
        |    '[!-/:-@\[-`{-~]', '', 'g'), '\s+', ' ', 'g') AS norm_text
        | FROM documents)
        |SELECT doc_id, length(norm_text) AS norm_len,
        | md5(norm_text) AS norm_fp
        |FROM n ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """SELECT lang, doc_id, rn FROM (
        | SELECT lang, doc_id,
        |  ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5(text), doc_id) AS rn
        | FROM documents)
        |WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,
    "pipeline_clean" ->
      s"""WITH t AS (SELECT doc_id, text, $TOKS AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  len(toks) AS n_tokens,
         |  len(list_filter(toks, t -> t IN $EN)) AS sw_hits,
         |  length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS punct_cnt,
         |  length(text) AS n_chars,
         |  len(list_intersect(list_distinct(toks), $ENL)) AS s_en,
         |  len(list_intersect(list_distinct(toks), $DEL)) AS s_de,
         |  len(list_intersect(list_distinct(toks), $ESL)) AS s_es,
         |  len(list_intersect(list_distinct(toks), $FRL)) AS s_fr,
         |  md5(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS fp
         | FROM t),
         |q AS (SELECT doc_id, n_tokens, fp,
         |  CAST(CASE WHEN n_tokens >= 20 AND n_tokens <= 1000 THEN 1.0
         |        WHEN n_tokens >= 5 THEN 0.5 ELSE 0.0 END AS DOUBLE) * 0.5
         |  + CAST(CASE WHEN sw_hits::DOUBLE / n_tokens >= 0.01
         |           AND sw_hits::DOUBLE / n_tokens <= 0.5
         |      THEN 1.0 ELSE 0.0 END AS DOUBLE) * 0.3
         |  + CAST(CASE WHEN punct_cnt::DOUBLE / n_chars <= 0.2
         |      THEN 1.0 ELSE 0.0 END AS DOUBLE) * 0.2 AS quality,
         |  CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
         |       WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
         |       WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
         |       WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
         |       ELSE 'fr' END AS lang_pred
         | FROM m)
         |SELECT doc_id, n_tokens, quality FROM q
         |WHERE quality >= 0.5 AND lang_pred = 'en'
         |QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fp)
         |ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        | md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_shingles" ->
      s"""SELECT doc_id,
         | CASE WHEN len($TOKS) < 3 THEN 0 ELSE len($TOKS) - 2 END AS n_shingles,
         | CASE WHEN len($TOKS) < 3 THEN 0 ELSE len($SH) END AS n_distinct_shingles
         |FROM documents ORDER BY doc_id""".stripMargin,
    "wordcount" ->
      s"""SELECT word, COUNT(*) AS n FROM (
         | SELECT unnest($TOKS) AS word FROM documents)
         |GROUP BY word ORDER BY n DESC, word""".stripMargin,
    "dedup_exact" ->
      """WITH f AS (SELECT doc_id,
        |  md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp
        | FROM documents)
        |SELECT doc_id, fp,
        | MIN(doc_id) OVER (PARTITION BY fp) AS canonical_id,
        | COUNT(*) OVER (PARTITION BY fp) AS group_size,
        | CASE WHEN doc_id <> MIN(doc_id) OVER (PARTITION BY fp)
        |      THEN 1 ELSE 0 END AS is_dup
        |FROM f ORDER BY doc_id""".stripMargin,
    "gopher_repetition" -> gopherRepetitionSql,
    "quality_gopher" ->
      s"""WITH ${gopherCtes("documents", "t", "m")}
         |SELECT doc_id, n_words, word_chars, n_alpha_words, n_lines,
         | n_distinct_lines, n_ellipsis_lines, n_symbols, stop_hits,
         | line_chars, dup_line_chars,
         | ${gopherKeepSql("m")} AS keep
         |FROM m ORDER BY doc_id""".stripMargin,
    "quality_c4" ->
      (c4OracleCte +
        """
        |SELECT a.doc_id, n_lines, n_kept_lines, n_sentences, kept_chars,
        | n_noterm_lines, n_short_lines, n_js_lines, n_policy_lines,
        | has_lorem, has_brace, has_badword,
        | CASE WHEN has_lorem = 0 AND has_brace = 0 AND has_badword = 0
        |   AND n_sentences >= 3 THEN 1 ELSE 0 END AS keep
        |FROM a JOIN p USING (doc_id) ORDER BY a.doc_id""".stripMargin),
    "c4_apply" ->
      (c4OracleCte +
        """,
        |k AS (SELECT doc_id,
        |  string_agg(line, chr(10) ORDER BY ord) AS clean_text,
        |  count(*)::BIGINT AS n_kept_lines
        | FROM d WHERE cls = 'kept' GROUP BY doc_id)
        |SELECT a.doc_id, k.clean_text, k.n_kept_lines
        |FROM a JOIN p USING (doc_id) JOIN k USING (doc_id)
        |WHERE has_lorem = 0 AND has_brace = 0 AND has_badword = 0
        |  AND n_sentences >= 3
        |ORDER BY a.doc_id""".stripMargin),
    // T38 core: the c4 planted fixture's CTEs (t/a/p) + the T30,
    // T31 and T15 chains RE-TARGETED at the planted text `t` (the
    // same fragment generators as the standalone statements), joined
    // on doc_id; keep_core via lateral alias references
    "quality_signals_core" ->
      (signalsCoreCtes +
        """
          |SELECT doc_id, q_score, n_bytes, keep_gopher, keep_rep,
          | keep_c4, keep_model, keep_core
          |FROM core ORDER BY doc_id""".stripMargin),
    // T43: the gate-combination ablation over the SAME core CTE —
    // per 4-bit combination, document count and byte mass
    "signals_ablation" ->
      (signalsCoreCtes +
        """
          |SELECT keep_gopher, keep_rep, keep_c4, keep_model,
          | COUNT(*)::BIGINT AS n_docs,
          | SUM(n_bytes)::BIGINT AS sum_bytes
          |FROM core
          |GROUP BY keep_gopher, keep_rep, keep_c4, keep_model
          |ORDER BY keep_gopher, keep_rep, keep_c4, keep_model""".stripMargin),
    // P5: the signals-gated release — keep_core survivors of the
    // duplicate-page fixture, exact-deduped to min-id keepers; the
    // page literal builds from Pipeline.SignalsDupPage (one
    // definition, both sides)
    "pipeline_signals" ->
      (signalsCoreChainFrom(
        "WITH t AS (SELECT doc_id,\n  " + releasePlantCaseSql +
          " AS text\n FROM documents)" + c4ChainFromT) +
        """,
          |kept AS (SELECT t.doc_id, t.text FROM t
          |  JOIN core USING (doc_id) WHERE core.keep_core = 1),
          |fp8 AS (SELECT doc_id,
          |  md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp
          | FROM kept),
          |keepers AS (SELECT doc_id, fp,
          |  MIN(doc_id) OVER (PARTITION BY fp) AS canonical FROM fp8)
          |SELECT doc_id, fp FROM keepers
          |WHERE doc_id = canonical ORDER BY doc_id""".stripMargin),
    // P6: the full release — the T39 gate chain (renamed uu/uh/ud,
    // survivors ug) feeds the P5 planted-text t, then the signals
    // chain, then dedup + the T40 cap ranking + the T44 shard window
    "pipeline_release" ->
      (signalsCoreChainFrom(
        releaseUrlGateCtes +
          ",\nt AS (SELECT doc_id,\n  " + releasePlantCaseSql +
          " AS text\n FROM documents JOIN ug USING (doc_id))" +
          c4ChainFromT) + releaseTailSql),
    // P8: release+carve — the P6 chain through the cap rank (rel =
    // released ids WITH text), the hv fixture plant appended to
    // even released ids (AFTER selection, mirroring the Spark
    // query), then the D20 carve chain at 1/3 over the plant
    "pipeline_release_carve" ->
      (signalsCoreChainFrom(
        releaseUrlGateCtes +
          ",\nt AS (SELECT doc_id,\n  " + releasePlantCaseSql +
          " AS text\n FROM documents JOIN ug USING (doc_id))" +
          c4ChainFromT) + releaseCappedCtes +
        s""",
           |rel AS (SELECT doc_id, text FROM rnk WHERE rk <= 3),
           |pd AS (SELECT doc_id, CASE WHEN doc_id % 2 = 0
           |  THEN text || ' hv0 hv1 hv2 hv3 hv4 hv5 hv6 hv7 hv8 hv9 hv10 hv11 hv12'
           |  ELSE text END AS text FROM rel)""".stripMargin +
        holdoutCarveTail("pd", 1, 3)),
    // P7: the web release — the IDENTICAL P6 statement with the
    // planted text wrapped as a raw page and pushed back through the
    // T45 extraction chain first (one wrap + one chain definition);
    // hash-matching this proves extraction composes losslessly
    // through all six stages in both engines
    "pipeline_web" ->
      (signalsCoreChainFrom(
        releaseUrlGateCtes +
          ",\nraw AS (SELECT doc_id,\n  " + webWrapSql(releasePlantCaseSql) +
          " AS html\n FROM documents JOIN ug USING (doc_id))" +
          htmlExtractChain("raw", "xt") +
          ",\nt AS (SELECT doc_id, t AS text FROM xt)" +
          c4ChainFromT) + releaseTailSql),
    // T43: the model-gate threshold sweep — kept docs/bytes at each
    // 5-point threshold; comparisons via the same IEEE pct/100.0
    // division the Spark side performs
    "model_threshold_sweep" ->
      (s"WITH ${qscoreCtes("documents")}," +
        """
          |qb AS (SELECT qs.doc_id, qs.q_score,
          |  strlen(qt.text)::BIGINT AS n_bytes
          | FROM qs JOIN qt USING (doc_id)),
          |grid AS (SELECT (5 * i)::INT AS threshold_pct
          | FROM range(0, 21) g(i))
          |SELECT threshold_pct,
          | SUM(CASE WHEN q_score >= threshold_pct / 100.0
          |   THEN 1 ELSE 0 END)::BIGINT AS n_kept,
          | SUM(CASE WHEN q_score >= threshold_pct / 100.0
          |   THEN n_bytes ELSE 0 END)::BIGINT AS kept_bytes
          |FROM qb CROSS JOIN grid
          |GROUP BY threshold_pct ORDER BY threshold_pct""".stripMargin),
    "sentence_span_scrub" -> sentenceScrubOracle,
    "sentence_span_scrub_join" -> sentenceScrubOracle,
    "pipeline_c4" ->
      // NB: no inner stripMargin — the extra is spliced into the
      // c4OracleCteWith template BEFORE its own stripMargin runs, so
      // these margins are stripped by the outer template exactly once
      (c4OracleCteWith(
        """
          |  || CASE WHEN doc_id % 4 = 2 THEN
          |    chr(10) || 'shared span alpha beta gamma one.' ||
          |    chr(10) || 'shared span delta epsilon zeta two!' ||
          |    chr(10) || 'shared span eta theta iota three?'
          |  ELSE '' END""") +
        """,
        |k AS (SELECT doc_id,
        |  string_agg(line, chr(10) ORDER BY ord) AS clean_text
        | FROM d WHERE cls = 'kept' GROUP BY doc_id),
        |pg AS (SELECT a.doc_id, k.clean_text AS text
        | FROM a JOIN p USING (doc_id) JOIN k USING (doc_id)
        | WHERE has_lorem = 0 AND has_brace = 0 AND has_badword = 0
        |   AND n_sentences >= 3)""".stripMargin +
        sentenceScrubSql("pg")),
    "dedup_index_build" ->
      s"""SELECT doc_id,
         | md5(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS fp,
         | CASE WHEN len($TOKS) < 3 THEN 0 ELSE len($SH) END AS n_sh
         |FROM documents WHERE doc_id % 5 <> 0 ORDER BY doc_id""".stripMargin,
    "dedup_incremental_exact" ->
      """WITH f AS (SELECT doc_id,
        |  md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp
        | FROM documents),
        |refs AS (SELECT fp, MIN(doc_id) AS ref_id FROM f
        | WHERE doc_id % 5 <> 0 GROUP BY fp)
        |SELECT f.doc_id,
        | CASE WHEN r.ref_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
        | r.ref_id
        |FROM f LEFT JOIN refs r USING (fp)
        |WHERE f.doc_id % 5 = 0 ORDER BY f.doc_id""".stripMargin,
    "dedup_jaccard_pairs" ->
      s"""WITH t AS (SELECT doc_id, source, $SH AS sh FROM documents)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         | len(list_intersect(a.sh, b.sh))::DOUBLE
         |   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
         |   AS jaccard
         |FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
         |   / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.02
         |ORDER BY doc_a, doc_b""".stripMargin,
    // corpus-wide shingle document-frequency → per-doc novelty; the
    // Spark side counts df over 64-bit shingle keys (collision odds
    // zero at this scale), the oracle over the shingle strings.
    // ::BIGINT on the sum: DuckDB sum(int) is HUGEINT, which the
    // driver's pandas canonicalization renders as float64 ("18.0" vs
    // Spark's "18") — hash-mismatch on identical values (round 7).
    "text_novelty" ->
      s"""WITH t AS (SELECT doc_id, $SH AS sh FROM documents),
         |e AS (SELECT doc_id, unnest(sh) AS s FROM t),
         |d AS (SELECT s, count(*) AS df FROM e GROUP BY s)
         |SELECT e.doc_id, count(*) AS n_shingles,
         | sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique,
         | sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*)
         |   AS novelty
         |FROM e JOIN d USING (s)
         |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin,
    // offset packing over the global token prefix-sum; the window SQL
    // states the semantics the distributed prefix-sum must reproduce.
    // ::BIGINT for the same HUGEINT-vs-int64 hash reason as above.
    "pack_sequences" ->
      s"""SELECT doc_id, n_tokens,
         | ((sum(n_tokens) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |  - n_tokens) // 2048)::BIGINT AS bin
         |FROM (SELECT doc_id, len($TOKS)::BIGINT AS n_tokens
         |      FROM documents)
         |ORDER BY doc_id""".stripMargin,
    // T44: the pack_sequences offset rule over the seeded md5
    // shuffle order (h = md5('7:' || doc_id), the seeded T8
    // convention); // floor-div equals Spark's `div` on the
    // non-negative prefix sums
    "export_shards" ->
      s"""WITH c AS (SELECT doc_id, len($TOKS)::BIGINT AS n_tokens,
         |  md5(concat('7:', doc_id)) AS h FROM documents),
         |s AS (SELECT doc_id, n_tokens,
         |  sum(n_tokens) OVER (ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         | FROM c)
         |SELECT doc_id, n_tokens,
         | ((cum - n_tokens) // 32768)::BIGINT AS shard_id
         |FROM s ORDER BY doc_id""".stripMargin,
    // T44b: the per-shard rollup; min_by/max_by over h are
    // deterministic because h is injective on doc_id in practice
    // (distinct md5 preimages) — same tie surface both engines
    "shard_manifest" ->
      s"""WITH c AS (SELECT doc_id, len($TOKS)::BIGINT AS n_tokens,
         |  md5(concat('7:', doc_id)) AS h FROM documents),
         |s AS (SELECT doc_id, n_tokens, h,
         |  sum(n_tokens) OVER (ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         | FROM c),
         |a AS (SELECT doc_id, n_tokens, h,
         |  ((cum - n_tokens) // 32768)::BIGINT AS shard_id FROM s)
         |SELECT shard_id, count(*)::BIGINT AS n_docs,
         | sum(n_tokens)::BIGINT AS shard_tokens,
         | min_by(doc_id, h) AS first_doc,
         | max_by(doc_id, h) AS last_doc
         |FROM a GROUP BY shard_id ORDER BY shard_id""".stripMargin,
    // transitive closure of the dedup_jaccard_pairs edges via a
    // recursive CTE; cluster_id = min reachable doc_id — must equal
    // the large-star/small-star fixpoint exactly
    "dedup_clusters" ->
      s"""$CLUSTER_CTE
         |SELECT src AS doc_id, min(dst) AS cluster_id
         |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,
    // the deduplicated corpus: drop every clustered doc except its
    // component-minimum representative (same CTE as dedup_clusters)
    "dedup_apply" ->
      s"""$CLUSTER_CTE,
         |c AS (SELECT src AS doc_id, min(dst) AS cluster_id
         |      FROM reach GROUP BY src)
         |SELECT d.doc_id, d.source, d.n_chars
         |FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
         |WHERE c.cluster_id IS NULL OR c.cluster_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    // within-doc repetition: top-token share + duplicate-bigram share
    // over the same whitespace tokens as TOKS
    "text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS tk FROM documents),
         |g AS (SELECT doc_id, len(tk)::BIGINT AS n,
         |        list_transform(range(1, greatest(len(tk), 1)),
         |          i -> concat_ws(' ', tk[i], tk[i+1])) AS g2 FROM t),
         |tok AS (SELECT doc_id, unnest(tk) AS w FROM t),
         |cnt AS (SELECT doc_id, w, count(*) AS c FROM tok
         |        GROUP BY doc_id, w),
         |top AS (SELECT doc_id, max(c) AS top_c FROM cnt GROUP BY doc_id)
         |SELECT g.doc_id, g.n AS n_tokens,
         | top.top_c::DOUBLE / g.n AS top_token_frac,
         | CASE WHEN g.n <= 1 THEN 0.0
         |      ELSE (g.n - 1 - len(list_distinct(g2)))::DOUBLE / (g.n - 1)
         | END AS dup_2gram_frac
         |FROM g JOIN top USING (doc_id) ORDER BY doc_id""".stripMargin,
    // BM25 integer retrieval core: dl + per-query-term tf for every
    // matching doc (floats stay out — the scored top-k is rows-only)
    "bm25_doc_stats" ->
      s"""WITH t AS (SELECT doc_id, len($TOKS)::BIGINT AS dl,
         |  len(list_filter($TOKS, x -> x = 'table'))::BIGINT AS tf0,
         |  len(list_filter($TOKS, x -> x = 'scan'))::BIGINT AS tf1,
         |  len(list_filter($TOKS, x -> x = 'window'))::BIGINT AS tf2
         |  FROM documents)
         |SELECT doc_id, dl, tf0, tf1, tf2 FROM t
         |WHERE tf0 > 0 OR tf1 > 0 OR tf2 > 0
         |ORDER BY doc_id""".stripMargin,
    // cross-source distinct-fingerprint overlap matrix over planted
    // doc_id-derived shared passages (the raw corpus has no
    // cross-source exact dups — an all-zero matrix verifies nothing);
    // all-integer output, full matrix incl. zero pairs
    "source_overlap" ->
      """WITH p AS (SELECT source,
        |  CASE WHEN doc_id % 3 = 0
        |    THEN concat('shared passage ', (doc_id % 16)::VARCHAR)
        |    ELSE text END AS text FROM documents),
        |f AS (SELECT DISTINCT source, md5(text) AS fp FROM p),
        |s AS (SELECT source, count(*)::BIGINT AS n FROM f GROUP BY source),
        |i AS (SELECT a.source AS src_a, b.source AS src_b,
        |        count(*)::BIGINT AS n_common
        |      FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT sa.source AS src_a, sb.source AS src_b, sa.n AS n_a,
        |       sb.n AS n_b, coalesce(i.n_common, 0)::BIGINT AS n_common
        |FROM s sa JOIN s sb ON sa.source < sb.source
        |LEFT JOIN i ON i.src_a = sa.source AND i.src_b = sb.source
        |ORDER BY src_a, src_b""".stripMargin,
    // temperature-rebalanced source mixing: per-source targets are
    // integer (floor(sqrt) weights, integer division) so no float
    // summation order can drift a boundary doc; docs taken in md5
    // order until the target, crossing doc included (offset rule)
    "mix_sources" ->
      s"""WITH d AS (SELECT doc_id, source, len($TOKS)::BIGINT AS n,
         |             md5(text) AS h FROM documents),
         |s AS (SELECT source, floor(sqrt(sum(n)::DOUBLE))::BIGINT AS w
         |      FROM d GROUP BY source),
         |ww AS (SELECT source, (20000 * w) // (SELECT sum(w) FROM s)
         |         AS target FROM s),
         |c AS (SELECT d.doc_id, d.source, d.n,
         |        sum(d.n) OVER (PARTITION BY d.source
         |          ORDER BY d.h, d.doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |          AS cum,
         |        ww.target
         |      FROM d JOIN ww USING (source))
         |SELECT doc_id, source, n AS n_tokens FROM c
         |WHERE cum - n < target ORDER BY doc_id""".stripMargin,
    // PII scrub over deterministically planted doc_id-derived PII;
    // regexes restricted to Java-regex/RE2-identical constructs
    "pii_scrub" ->
      s"""WITH p AS (SELECT doc_id, concat(text,
         |  CASE WHEN doc_id % 3 = 0
         |    THEN concat(' mail u', doc_id::VARCHAR, '@ex.com')
         |    ELSE '' END,
         |  CASE WHEN doc_id % 4 = 0 THEN ' ip 10.0.0.1' ELSE '' END,
         |  CASE WHEN doc_id % 5 = 0 THEN ' tel 555-123-4567' ELSE '' END
         |  ) AS text FROM documents)
         |SELECT doc_id,
         | len(regexp_extract_all(text, '$PII_EMAIL'))::INT AS n_emails,
         | len(regexp_extract_all(text, '$PII_PHONE'))::INT AS n_phones,
         | len(regexp_extract_all(text, '$PII_IP'))::INT AS n_ips,
         | md5(regexp_replace(regexp_replace(regexp_replace(text,
         |   '$PII_EMAIL', '<EMAIL>', 'g'),
         |   '$PII_PHONE', '<PHONE>', 'g'),
         |   '$PII_IP', '<IP>', 'g')) AS scrub_fp
         |FROM p ORDER BY doc_id""".stripMargin,
    // T45 HTML→text extraction over the planted page: the identical
    // pattern strings (inline (?is) flags, non-greedy spans, ASCII
    // \b — the java-regex/RE2-shared subset), DuckDB's 'g' flag
    // standing in for Spark's replace-all default
    "html_extract" ->
      ("""WITH d AS (SELECT doc_id,
        |  '<html><!-- gen -->' || chr(10) || '<head><title>Doc ' ||
        |  doc_id::VARCHAR ||
        |  '</title><style media="all">body { color: #000; }</style></head><body><h1>Doc ' ||
        |  doc_id::VARCHAR || '</h1>' ||
        |  CASE WHEN doc_id % 3 = 0 THEN '<script type="text/javascript">var x = 1 < 2 && y > 0;</script>' ELSE '' END ||
        |  CASE WHEN doc_id % 2 = 0 THEN '<ul><li>alpha</li><li>beta</li></ul>' ELSE '' END ||
        |  '<p>' || text ||
        |  CASE WHEN doc_id % 5 = 0 THEN ' Fish &amp; Chips &lt;b&gt;bold&#39;s&quot; end&nbsp;here' ELSE '' END ||
        |  '</p>' ||
        |  CASE WHEN doc_id % 7 = 3 THEN '<div class="unterminated' ELSE '' END ||
        |  '</body></html>' AS html FROM documents)""".stripMargin +
      htmlExtractChain("d", "e") +
      """
        |SELECT doc_id, t AS page_text,
        |  (length(t) - length(replace(t, chr(10), '')) + 1)::BIGINT
        |    AS n_lines
        |FROM e ORDER BY doc_id""".stripMargin),
    // exact substring pairs: 8-token verbatim windows, distinct per
    // doc, df-capped [2, 100] exactly like the Spark bucket filter
    "dedup_substring" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS tk FROM documents),
         |w AS (SELECT doc_id, list_distinct(list_transform(
         |    range(1, greatest(len(tk)-6, 1)),
         |    i -> array_to_string(tk[i:i+7], ' '))) AS ws FROM t),
         |u AS (SELECT doc_id, unnest(ws) AS win FROM w),
         |d AS (SELECT win, count(*) AS df FROM u GROUP BY win),
         |uf AS (SELECT u.doc_id, u.win FROM u JOIN d USING (win)
         |       WHERE d.df BETWEEN 2 AND 100),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    count(*)::BIGINT AS n_shared
         |  FROM uf a JOIN uf b ON a.win = b.win AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, n_shared FROM p
         |WHERE n_shared >= 1 ORDER BY doc_a, doc_b""".stripMargin,
    // linear quality model — rational arithmetic only, term order
    // mirrors TextOps.qualityClassify exactly (left-assoc sums)
    "quality_classify" ->
      s"""WITH $QSCORE_CTES
         |SELECT doc_id, q_score, q_score >= 0.5 AS keep
         |FROM qs ORDER BY doc_id""".stripMargin,
    // scored dedup apply: same transitive closure as dedup_apply, but
    // the keeper per cluster is the argmax of the T15 model score
    // (ties toward the smaller doc_id) — score arithmetic identical
    // to quality_classify, so the keeper decision is bit-exact
    "dedup_apply_best" ->
      s"""$CLUSTER_CTE,
         |$QSCORE_CTES,
         |c AS (SELECT src AS doc_id, min(dst) AS cluster_id
         |      FROM reach GROUP BY src),
         |k AS (SELECT doc_id FROM (
         |  SELECT c.doc_id, row_number() OVER (
         |    PARTITION BY c.cluster_id
         |    ORDER BY qs.q_score DESC, c.doc_id) AS rn
         |  FROM c JOIN qs ON c.doc_id = qs.doc_id) WHERE rn = 1)
         |SELECT d.doc_id, d.source, d.n_chars
         |FROM documents d LEFT JOIN c ON d.doc_id = c.doc_id
         |WHERE c.doc_id IS NULL OR d.doc_id IN (SELECT doc_id FROM k)
         |ORDER BY d.doc_id""".stripMargin,
    "contamination_screen" ->
      s"""WITH t AS (SELECT doc_id, $SH AS sh FROM documents),
         |tt AS (SELECT doc_id, sh FROM t WHERE len(sh) > 0),
         |r AS (SELECT doc_id AS ref_id, sh AS rsh FROM tt
         |      WHERE doc_id % 7 = 0)
         |SELECT tt.doc_id, r.ref_id,
         | len(list_intersect(tt.sh, r.rsh))::DOUBLE
         |   / (len(tt.sh) + len(r.rsh) - len(list_intersect(tt.sh, r.rsh)))
         |   AS jaccard
         |FROM tt JOIN r ON tt.doc_id != r.ref_id
         |WHERE len(list_intersect(tt.sh, r.rsh))::DOUBLE
         |   / (len(tt.sh) + len(r.rsh) - len(list_intersect(tt.sh, r.rsh)))
         |   >= 0.05
         |ORDER BY doc_id, ref_id""".stripMargin,
    // decontaminated corpus: documents minus the DISTINCT doc side of
    // the contamination_screen pair list (reference members stay)
    "screen_apply" ->
      s"""WITH t AS (SELECT doc_id, $SH AS sh FROM documents),
         |tt AS (SELECT doc_id, sh FROM t WHERE len(sh) > 0),
         |r AS (SELECT doc_id AS ref_id, sh AS rsh FROM tt
         |      WHERE doc_id % 7 = 0),
         |flagged AS (SELECT DISTINCT tt.doc_id
         |  FROM tt JOIN r ON tt.doc_id != r.ref_id
         |  WHERE len(list_intersect(tt.sh, r.rsh))::DOUBLE
         |     / (len(tt.sh) + len(r.rsh) - len(list_intersect(tt.sh, r.rsh)))
         |     >= 0.05)
         |SELECT d.doc_id, d.source, d.n_chars FROM documents d
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM flagged)
         |ORDER BY d.doc_id""".stripMargin,
    // corpus-wide trigram counts, top-k by (count desc, ngram asc) —
    // the total order is unique per gram so the k-frontier is
    // deterministic and hash-exact
    "top_ngrams" ->
      s"""WITH t AS (SELECT $TOKS AS toks FROM documents),
         |g AS (SELECT unnest(list_transform(
         |    range(1, greatest(len(toks) - 1, 1)),
         |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS ngram
         |  FROM t)
         |SELECT ngram, count(*)::BIGINT AS n FROM g
         |GROUP BY ngram ORDER BY n DESC, ngram LIMIT 100""".stripMargin,
    // per-doc boilerplate trigram counts vs the mined top-100 —
    // integer-exact; docs without a trigram are absent on both sides
    // (the GROUP BY contract)
    "boilerplate_share" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
         |g AS (SELECT doc_id, unnest(list_transform(
         |    range(1, greatest(len(toks) - 1, 1)),
         |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS ngram
         |  FROM t),
         |top AS (SELECT ngram FROM (
         |  SELECT ngram, count(*) AS n FROM g GROUP BY ngram
         |  ORDER BY n DESC, ngram LIMIT 100))
         |SELECT doc_id, count(*)::BIGINT AS n_grams,
         | sum(CASE WHEN ngram IN (SELECT ngram FROM top)
         |     THEN 1 ELSE 0 END)::BIGINT AS boiler_hits
         |FROM g GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // per-source data card: integer-exact counts/sums, decimal-exact
    // quality mean (the Tables.davg contract), English share via the
    // same distinct-token stopword argmax as text_langid
    "corpus_stats" ->
      s"""WITH t AS (SELECT doc_id, source, text, $TOKS AS toks,
         |  list_distinct($TOKS) AS dt FROM documents),
         |m AS (SELECT source,
         |  len(toks)::BIGINT AS toks_n,
         |  length(text)::BIGINT AS chars_n,
         |  md5(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS fp,
         |  CAST(CASE WHEN len(toks) >= 20 AND len(toks) <= 1000 THEN 1.0
         |        WHEN len(toks) >= 5 THEN 0.5 ELSE 0.0 END AS DOUBLE) * 0.5
         |  + CAST(CASE WHEN len(list_filter(toks, x -> x IN $EN))::DOUBLE / len(toks) >= 0.01
         |           AND len(list_filter(toks, x -> x IN $EN))::DOUBLE / len(toks) <= 0.5
         |      THEN 1.0 ELSE 0.0 END AS DOUBLE) * 0.3
         |  + CAST(CASE WHEN (length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')))::DOUBLE
         |           / length(text) <= 0.2
         |      THEN 1.0 ELSE 0.0 END AS DOUBLE) * 0.2 AS q,
         |  CASE WHEN greatest(len(list_intersect(dt, $ENL)),
         |         len(list_intersect(dt, $DEL)),
         |         len(list_intersect(dt, $ESL)),
         |         len(list_intersect(dt, $FRL))) > 0
         |        AND len(list_intersect(dt, $ENL))
         |          = greatest(len(list_intersect(dt, $ENL)),
         |              len(list_intersect(dt, $DEL)),
         |              len(list_intersect(dt, $ESL)),
         |              len(list_intersect(dt, $FRL)))
         |    THEN 1 ELSE 0 END AS is_en
         | FROM t)
         |SELECT source, count(*) AS n_docs,
         | sum(toks_n)::BIGINT AS n_tokens,
         | sum(chars_n)::BIGINT AS n_chars, count(DISTINCT fp) AS n_unique,
         | CAST(ROUND(SUM(CAST(q AS DECIMAL(18,4))), 2) AS DOUBLE)
         |   / count(q) AS avg_quality,
         | sum(is_en)::BIGINT AS n_en
         |FROM m GROUP BY source ORDER BY source""".stripMargin,
    // verbatim 13-gram overlap vs the reference subset, over the SAME
    // planted text the Spark query builds; counts are distinct-gram
    // hits per flagged non-ref doc — integer-exact
    "screen_ngram_overlap" -> SCREEN_NGRAM_SQL,
    // D18: the Bloom screen at the registered parameters is
    // deterministically identical to the exact screen on this fixture
    // (one-sided error + ~1e-9 FP per gram at 2^23 bits / ~13k ref
    // grams), so the SAME statement hash-checks it; the undersized-
    // filter superset behavior is spec'd in TextDedupSpec
    "screen_ngram_bloom" -> SCREEN_NGRAM_SQL,
    // D20/D20b: seeded md5-prefix holdout + verbatim 13-gram
    // decontamination of train against it, one row per doc; the
    // Bloom path is deterministically identical at the registered
    // size (the D18 precedent), so one statement checks both
    "holdout_carve" -> HOLDOUT_CARVE_SQL,
    "holdout_carve_bloom" -> HOLDOUT_CARVE_SQL,
    // D21: the holdout-side aggregation over the same split + gram
    // chain — per leaking eval doc, distinct dirty train docs and
    // (train, gram) hit volume; the D21b join shape is
    // output-identical by construction, so ONE statement checks both
    // (the sentence_span_scrub_join precedent)
    "contamination_report" -> CONTAMINATION_REPORT_SQL,
    "contamination_report_join" -> CONTAMINATION_REPORT_SQL,
    // D19: the planted exact duplicates (probe doc_id ≡ 4 mod 11
    // takes the text of its previous multiple of 7 — always in the
    // ref carve) flagged by canonical-fp membership; the bloom is
    // deterministically this semi-join at the registered size
    "dedup_exact_bloom" ->
      s"""WITH b AS (SELECT doc_id AS bid, text AS btext
         |  FROM documents),
         |p AS (SELECT d.doc_id,
         |  CASE WHEN d.doc_id % 11 = 4 THEN b.btext
         |       ELSE d.text END AS text
         | FROM documents d LEFT JOIN b
         |   ON b.bid = (d.doc_id // 7) * 7
         | WHERE d.doc_id % 7 <> 0),
         |r AS (SELECT DISTINCT
         |  md5(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS fp
         | FROM documents WHERE doc_id % 7 = 0)
         |SELECT p.doc_id,
         |  md5(regexp_replace(trim(p.text), '\\s+', ' ', 'g')) AS fp
         |FROM p
         |WHERE md5(regexp_replace(trim(p.text), '\\s+', ' ', 'g'))
         |  IN (SELECT fp FROM r)
         |ORDER BY p.doc_id""".stripMargin,
    // DSIR evidence: integer-exact per-doc sums of corpus and
    // target-subset counts over the unigram+bigram feature stream —
    // the oracle-checked core of dsir_weights. Bigram windows via
    // range(1, greatest(len, 1)) (i, i+1 pairs; empty for
    // single-token docs), concat_ws matching the engine's single
    // 0x20 join byte-for-byte.
    "dsir_doc_stats" ->
      s"""WITH t AS (SELECT doc_id, $TOKS AS toks FROM documents),
         |f AS (SELECT doc_id, unnest(toks) AS g FROM t
         |  UNION ALL
         |  SELECT doc_id, unnest(list_transform(
         |    range(1, greatest(len(toks), 1)),
         |    i -> concat_ws(' ', toks[i], toks[i+1]))) AS g FROM t),
         |cnt AS (SELECT g, count(*)::BIGINT AS cq,
         |  sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)::BIGINT AS ct
         |  FROM f GROUP BY g)
         |SELECT f.doc_id, count(*)::BIGINT AS n_feats,
         | sum(cnt.cq)::BIGINT AS sum_cq, sum(cnt.ct)::BIGINT AS sum_ct
         |FROM f JOIN cnt USING (g)
         |GROUP BY f.doc_id ORDER BY doc_id""".stripMargin,
    // unigram-LM evidence: integer-exact count-table join — the
    // oracle-checked core of lm_perplexity
    "lm_doc_stats" ->
      s"""WITH tok AS (SELECT doc_id, unnest($TOKS) AS w FROM documents),
         |cnt AS (SELECT w, count(*)::BIGINT AS c FROM tok GROUP BY w)
         |SELECT tok.doc_id, count(*)::BIGINT AS n_tokens,
         | sum(c.c)::BIGINT AS sum_cnt, min(c.c)::BIGINT AS min_cnt
         |FROM tok JOIN cnt c USING (w)
         |GROUP BY tok.doc_id ORDER BY doc_id""".stripMargin,
    // bigram-LM evidence: integer-exact positional-bigram counts plus
    // the context-token (conditional-denominator) counts — the
    // oracle-checked core of lm2_perplexity. Bigram strings join on a
    // single 0x20, exactly the bytes the Spark kernel hashes;
    // split_part recovers the context token because tokens contain no
    // whitespace by construction.
    "lm2_doc_stats" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS tk FROM documents),
         |tok AS (SELECT doc_id, unnest(tk) AS w FROM d),
         |u AS (SELECT w, count(*)::BIGINT AS c1 FROM tok GROUP BY w),
         |bs AS (SELECT doc_id,
         |  unnest(list_transform(range(1, greatest(len(tk), 1)),
         |    i -> concat_ws(' ', tk[i], tk[i+1]))) AS b FROM d),
         |b2 AS (SELECT b, count(*)::BIGINT AS c2 FROM bs GROUP BY b),
         |m AS (SELECT b2.b, b2.c2, u.c1 AS c1p
         |  FROM b2 JOIN u ON u.w = split_part(b2.b, ' ', 1))
         |SELECT bs.doc_id, count(*)::BIGINT AS n_bigrams,
         | sum(m.c2)::BIGINT AS sum_c2, sum(m.c1p)::BIGINT AS sum_ctx,
         | min(m.c2)::BIGINT AS min_c2
         |FROM bs JOIN m USING (b)
         |GROUP BY bs.doc_id ORDER BY doc_id""".stripMargin,
    // NB evidence: per-(doc, class) matched-token occurrences and
    // class-conditional count sums, zero-filled over the full
    // doc × class cross — the oracle-checked core of nb_classify
    "nb_doc_stats" ->
      s"""WITH tok AS (SELECT doc_id, lang, unnest($TOKS) AS w
         |  FROM documents),
         |cls AS (SELECT lang, w, count(*)::BIGINT AS c FROM tok
         |  GROUP BY lang, w),
         |m AS (SELECT t.doc_id, c.lang AS clang,
         |  count(*)::BIGINT AS n, sum(c.c)::BIGINT AS s
         |  FROM tok t JOIN cls c USING (w) GROUP BY t.doc_id, c.lang)
         |SELECT d.doc_id, l.lang,
         | coalesce(m.n, 0)::BIGINT AS n_matched,
         | coalesce(m.s, 0)::BIGINT AS sum_c
         |FROM documents d
         |CROSS JOIN (SELECT DISTINCT lang FROM documents) l
         |LEFT JOIN m ON m.doc_id = d.doc_id AND m.clang = l.lang
         |ORDER BY d.doc_id, l.lang""".stripMargin,
    // token-window chunking, byte-identical text: list_slice is
    // 1-based inclusive and clamps at the list end, exactly the
    // Spark kernel's slice(s, min(s+chunk, n)); chunk text re-joins
    // tokens on single spaces on both engines
    "chunk_docs" ->
      s"""WITH d AS (SELECT doc_id, $TOKS AS tk FROM documents),
         |n AS (SELECT doc_id, tk, len(tk) AS nt FROM d),
         |c AS (SELECT doc_id, tk,
         |  unnest(range(0, CASE WHEN nt <= 32 THEN 1
         |    ELSE (nt - 32 + 23) // 24 + 1 END)) AS chunk_id FROM n)
         |SELECT doc_id, chunk_id::BIGINT AS chunk_id,
         | array_to_string(list_slice(tk, chunk_id*24 + 1,
         |   chunk_id*24 + 32), ' ') AS text,
         | len(list_slice(tk, chunk_id*24 + 1,
         |   chunk_id*24 + 32))::BIGINT AS n_tokens
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    // Heaps-law growth curve: first sighting = min(doc_id) per word,
    // bucketed by step-10 doc prefixes; running sums are window sums
    // here and GlobalOrder prefix-sums in the engine
    "vocab_growth" ->
      s"""WITH tok AS (SELECT doc_id, unnest($TOKS) AS w FROM documents),
         |tb AS (SELECT doc_id // 10 AS b, count(*)::BIGINT AS toks
         |  FROM tok GROUP BY 1),
         |f AS (SELECT w, min(doc_id) AS fd FROM tok GROUP BY w),
         |nb AS (SELECT fd // 10 AS b, count(*)::BIGINT AS nw
         |  FROM f GROUP BY 1)
         |SELECT (tb.b + 1) * 10 AS docs_seen,
         | sum(tb.toks) OVER (ORDER BY tb.b)::BIGINT AS tokens_seen,
         | coalesce(nb.nw, 0)::BIGINT AS new_words,
         | sum(coalesce(nb.nw, 0)) OVER (ORDER BY tb.b)::BIGINT AS vocab
         |FROM tb LEFT JOIN nb ON nb.b = tb.b
         |ORDER BY docs_seen""".stripMargin,
    // the FULL six-stage recipe, end to end, over the same planted
    // multi-line text the Spark query builds: T15 quality gate (the
    // quality_classify CTEs) → T19 line dedup (the line_dedup CTEs,
    // df over the quality-kept corpus) → D4 pairs + recursive closure
    // + D12 scored keeper, ALL over the line-rebuilt clean text (a
    // second QSCORE chain scores the cleaned text, exactly like the
    // engine) → D7/D11 screen → T13 integer-target mixing → T10
    // offset packing. Output is all ints/strings — hash-exact.
    "pipeline_full" ->
      s"""WITH RECURSIVE d0 AS (SELECT doc_id, source,
         |  'hdr ' || source || chr(10) || text || chr(10) ||
         |  'ref ' || (doc_id // 2)::VARCHAR || chr(10) ||
         |  'ftr ' || lang AS text FROM documents),
         |q1t AS (SELECT doc_id, text, $TOKS AS tk FROM d0),
         |q1m AS (SELECT doc_id, len(tk)::BIGINT AS n,
         |  length(text) AS n_chars,
         |  len(list_filter(tk, x -> x IN $EN))::BIGINT AS sw,
         |  length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS pc,
         |  len(list_distinct(list_transform(range(1, greatest(len(tk), 1)),
         |    i -> concat_ws(' ', tk[i], tk[i+1]))))::BIGINT AS d2
         | FROM q1t),
         |q1top AS (SELECT doc_id, max(c)::BIGINT AS top_c FROM (
         |  SELECT doc_id, w, count(*) AS c FROM
         |    (SELECT doc_id, unnest(tk) AS w FROM q1t) GROUP BY doc_id, w)
         |  GROUP BY doc_id),
         |q1s AS (SELECT q1m.doc_id,
         |   least(n::DOUBLE, 400.0) / 400.0 * 0.35
         | + least(sw::DOUBLE / n::DOUBLE * 4.0, 1.0) * 0.25
         | + (1.0 - least(pc::DOUBLE / n_chars::DOUBLE * 5.0, 1.0)) * 0.15
         | + (1.0 - top_c::DOUBLE / n::DOUBLE) * 0.15
         | + (1.0 - CASE WHEN n <= 1 THEN 0.0
         |     ELSE (n - 1 - d2)::DOUBLE / (n - 1) END) * 0.10 AS q_score
         | FROM q1m JOIN q1top USING (doc_id)),
         |keep1 AS (SELECT doc_id FROM q1s WHERE q_score >= 0.5),
         |l AS (SELECT d0.doc_id,
         |  unnest(string_split(text, chr(10))) AS line,
         |  generate_subscripts(string_split(text, chr(10)), 1) AS ord
         |  FROM d0 JOIN keep1 USING (doc_id)),
         |ldf AS (SELECT line, count(DISTINCT doc_id) AS df
         |  FROM l GROUP BY line),
         |lkept AS (SELECT l.doc_id,
         |  string_agg(l.line, chr(10) ORDER BY l.ord) AS clean_text
         |  FROM l JOIN ldf USING (line) WHERE ldf.df < 3
         |  GROUP BY l.doc_id),
         |c0 AS (SELECT keep1.doc_id, d0.source,
         |  coalesce(lkept.clean_text, '') AS text
         |  FROM keep1 JOIN d0 USING (doc_id)
         |  LEFT JOIN lkept ON keep1.doc_id = lkept.doc_id),
         |t AS (SELECT doc_id, source, $SH AS sh FROM c0),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM t a JOIN t b
         |  ON a.source = b.source AND a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
         |    / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
         |    >= 0.02),
         |und AS (SELECT doc_a AS a, doc_b AS b FROM p
         |  UNION SELECT doc_b, doc_a FROM p),
         |reach(src, dst) AS (SELECT a, a FROM und
         |  UNION SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a),
         |c AS (SELECT src AS doc_id, min(dst) AS cluster_id
         |  FROM reach GROUP BY src),
         |q2t AS (SELECT c0.doc_id, c0.text, $TOKS AS tk FROM c0
         |  JOIN c ON c0.doc_id = c.doc_id),
         |q2m AS (SELECT doc_id, len(tk)::BIGINT AS n,
         |  length(text) AS n_chars,
         |  len(list_filter(tk, x -> x IN $EN))::BIGINT AS sw,
         |  length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS pc,
         |  len(list_distinct(list_transform(range(1, greatest(len(tk), 1)),
         |    i -> concat_ws(' ', tk[i], tk[i+1]))))::BIGINT AS d2
         | FROM q2t),
         |q2top AS (SELECT doc_id, max(c)::BIGINT AS top_c FROM (
         |  SELECT doc_id, w, count(*) AS c FROM
         |    (SELECT doc_id, unnest(tk) AS w FROM q2t) GROUP BY doc_id, w)
         |  GROUP BY doc_id),
         |q2s AS (SELECT q2m.doc_id,
         |   least(n::DOUBLE, 400.0) / 400.0 * 0.35
         | + least(sw::DOUBLE / n::DOUBLE * 4.0, 1.0) * 0.25
         | + (1.0 - least(pc::DOUBLE / n_chars::DOUBLE * 5.0, 1.0)) * 0.15
         | + (1.0 - top_c::DOUBLE / n::DOUBLE) * 0.15
         | + (1.0 - CASE WHEN n <= 1 THEN 0.0
         |     ELSE (n - 1 - d2)::DOUBLE / (n - 1) END) * 0.10 AS q_score
         | FROM q2m JOIN q2top USING (doc_id)),
         |k AS (SELECT doc_id FROM (
         |  SELECT c.doc_id, row_number() OVER (
         |    PARTITION BY c.cluster_id
         |    ORDER BY q2s.q_score DESC, c.doc_id) AS rn
         |  FROM c JOIN q2s ON c.doc_id = q2s.doc_id) WHERE rn = 1),
         |surv2 AS (SELECT doc_id FROM c0 WHERE doc_id NOT IN (
         |  SELECT doc_id FROM c WHERE doc_id NOT IN
         |    (SELECT doc_id FROM k))),
         |tt AS (SELECT t.doc_id, t.sh FROM t JOIN surv2 USING (doc_id)
         |  WHERE len(sh) > 0),
         |rf AS (SELECT doc_id AS ref_id, sh AS rsh FROM tt
         |  WHERE doc_id % 7 = 0),
         |flagged AS (SELECT DISTINCT tt.doc_id FROM tt
         |  JOIN rf ON tt.doc_id != rf.ref_id
         |  WHERE len(list_intersect(tt.sh, rf.rsh))::DOUBLE
         |    / (len(tt.sh) + len(rf.rsh) - len(list_intersect(tt.sh, rf.rsh)))
         |    >= 0.05),
         |surv3 AS (SELECT doc_id FROM surv2 WHERE doc_id NOT IN
         |  (SELECT doc_id FROM flagged)),
         |md AS (SELECT c0.doc_id, c0.source, len($TOKS)::BIGINT AS n,
         |  md5(c0.text) AS h FROM c0 JOIN surv3 USING (doc_id)),
         |ms AS (SELECT source, floor(sqrt(sum(n)::DOUBLE))::BIGINT AS w
         |  FROM md GROUP BY source),
         |mw AS (SELECT source, (20000 * w) // (SELECT sum(w) FROM ms)
         |  AS target FROM ms),
         |mc AS (SELECT md.doc_id, md.source, md.n,
         |  sum(md.n) OVER (PARTITION BY md.source
         |    ORDER BY md.h, md.doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  mw.target FROM md JOIN mw USING (source)),
         |picked AS (SELECT doc_id, source, n FROM mc
         |  WHERE cum - n < target)
         |SELECT doc_id, source, n AS n_tokens,
         | ((sum(n) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n)
         |   // 2048)::BIGINT AS bin
         |FROM picked ORDER BY doc_id""".stripMargin,
    // the SPAN-LEVEL recipe end to end: same prefix as pipeline_full
    // (quality gate + line dedup), then the substring-scrub CTEs over
    // the cleaned text, the n_kept >= 8 length gate, and the shared
    // screen/mix/pack tail — all-int/string output, hash-exact
    "pipeline_scrub" ->
      s"""WITH d0 AS (SELECT doc_id, source,
         |  'hdr ' || source || chr(10) || text || chr(10) ||
         |  'ref ' || (doc_id // 2)::VARCHAR || chr(10) ||
         |  'ftr ' || lang AS text FROM documents),
         |q1t AS (SELECT doc_id, text, $TOKS AS tk FROM d0),
         |q1m AS (SELECT doc_id, len(tk)::BIGINT AS n,
         |  length(text) AS n_chars,
         |  len(list_filter(tk, x -> x IN $EN))::BIGINT AS sw,
         |  length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS pc,
         |  len(list_distinct(list_transform(range(1, greatest(len(tk), 1)),
         |    i -> concat_ws(' ', tk[i], tk[i+1]))))::BIGINT AS d2
         | FROM q1t),
         |q1top AS (SELECT doc_id, max(c)::BIGINT AS top_c FROM (
         |  SELECT doc_id, w, count(*) AS c FROM
         |    (SELECT doc_id, unnest(tk) AS w FROM q1t) GROUP BY doc_id, w)
         |  GROUP BY doc_id),
         |q1s AS (SELECT q1m.doc_id,
         |   least(n::DOUBLE, 400.0) / 400.0 * 0.35
         | + least(sw::DOUBLE / n::DOUBLE * 4.0, 1.0) * 0.25
         | + (1.0 - least(pc::DOUBLE / n_chars::DOUBLE * 5.0, 1.0)) * 0.15
         | + (1.0 - top_c::DOUBLE / n::DOUBLE) * 0.15
         | + (1.0 - CASE WHEN n <= 1 THEN 0.0
         |     ELSE (n - 1 - d2)::DOUBLE / (n - 1) END) * 0.10 AS q_score
         | FROM q1m JOIN q1top USING (doc_id)),
         |keep1 AS (SELECT doc_id FROM q1s WHERE q_score >= 0.5),
         |l AS (SELECT d0.doc_id,
         |  unnest(string_split(text, chr(10))) AS line,
         |  generate_subscripts(string_split(text, chr(10)), 1) AS ord
         |  FROM d0 JOIN keep1 USING (doc_id)),
         |ldf AS (SELECT line, count(DISTINCT doc_id) AS df
         |  FROM l GROUP BY line),
         |lkept AS (SELECT l.doc_id,
         |  string_agg(l.line, chr(10) ORDER BY l.ord) AS clean_text
         |  FROM l JOIN ldf USING (line) WHERE ldf.df < 3
         |  GROUP BY l.doc_id),
         |c0 AS (SELECT keep1.doc_id, d0.source,
         |  coalesce(lkept.clean_text, '') AS text
         |  FROM keep1 JOIN d0 USING (doc_id)
         |  LEFT JOIN lkept ON keep1.doc_id = lkept.doc_id),
         |st AS (SELECT doc_id, $TOKS AS tk FROM c0),
         |wi AS (SELECT doc_id, tk,
         |  unnest(range(1, greatest(len(tk) - 6, 1))) AS i FROM st),
         |w2 AS (SELECT doc_id, i,
         |  array_to_string(tk[i:i+7], ' ') AS win FROM wi),
         |own AS (SELECT win, min(doc_id) AS owner FROM (
         |  SELECT DISTINCT doc_id, win FROM w2) GROUP BY win),
         |bad AS (SELECT w2.doc_id, w2.i FROM w2 JOIN own USING (win)
         |  WHERE own.owner < w2.doc_id),
         |tok AS (SELECT doc_id, unnest(tk) AS tok,
         |  generate_subscripts(tk, 1) AS j FROM st),
         |keptt AS (SELECT tok.doc_id, tok.j, tok.tok FROM tok
         |  WHERE NOT EXISTS (SELECT 1 FROM bad
         |    WHERE bad.doc_id = tok.doc_id
         |      AND bad.i <= tok.j AND tok.j <= bad.i + 7)),
         |scr AS (SELECT doc_id,
         |  string_agg(tok, ' ' ORDER BY j) AS text,
         |  count(*)::BIGINT AS n_kept FROM keptt GROUP BY doc_id),
         |s0 AS (SELECT c0.doc_id, c0.source, scr.text
         |  FROM c0 JOIN scr USING (doc_id) WHERE scr.n_kept >= 8),
         |t2 AS (SELECT doc_id, $SH AS sh FROM s0),
         |tt2 AS (SELECT doc_id, sh FROM t2 WHERE len(sh) > 0),
         |rf2 AS (SELECT doc_id AS ref_id, sh AS rsh FROM tt2
         |  WHERE doc_id % 7 = 0),
         |flag2 AS (SELECT DISTINCT tt2.doc_id FROM tt2
         |  JOIN rf2 ON tt2.doc_id != rf2.ref_id
         |  WHERE len(list_intersect(tt2.sh, rf2.rsh))::DOUBLE
         |    / (len(tt2.sh) + len(rf2.rsh) - len(list_intersect(tt2.sh, rf2.rsh)))
         |    >= 0.05),
         |md AS (SELECT s0.doc_id, s0.source, len($TOKS)::BIGINT AS n,
         |  md5(s0.text) AS h FROM s0
         |  WHERE s0.doc_id NOT IN (SELECT doc_id FROM flag2)),
         |ms AS (SELECT source, floor(sqrt(sum(n)::DOUBLE))::BIGINT AS w
         |  FROM md GROUP BY source),
         |mw AS (SELECT source, (20000 * w) // (SELECT sum(w) FROM ms)
         |  AS target FROM ms),
         |mc AS (SELECT md.doc_id, md.source, md.n,
         |  sum(md.n) OVER (PARTITION BY md.source
         |    ORDER BY md.h, md.doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  mw.target FROM md JOIN mw USING (source)),
         |picked AS (SELECT doc_id, source, n FROM mc
         |  WHERE cum - n < target)
         |SELECT doc_id, source, n AS n_tokens,
         | ((sum(n) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n)
         |   // 2048)::BIGINT AS bin
         |FROM picked ORDER BY doc_id""".stripMargin,
    // span-level substring scrub over the SAME planted shared-passage
    // text the Spark query builds: a token is cut iff some verbatim
    // 8-token window covering it also occurs in a lower-id doc;
    // survivors rejoin with single spaces. The engine matches windows
    // by FNV-64 of the space-joined window (collision odds ≈ d²/2⁶⁵ —
    // zero at oracle scale), the oracle by the window string itself.
    "substring_scrub" ->
      s"""WITH d AS (SELECT doc_id, CASE WHEN doc_id % 13 = 5
         |  THEN text || ' sp0 sp1 sp2 sp3 sp4 sp5 sp6 sp7 sp8 sp9'
         |  ELSE text END AS text FROM documents),
         |t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS tk
         |  FROM d),
         |wi AS (SELECT doc_id, tk,
         |  unnest(range(1, greatest(len(tk) - 6, 1))) AS i FROM t),
         |w AS (SELECT doc_id, i,
         |  array_to_string(tk[i:i+7], ' ') AS win FROM wi),
         |own AS (SELECT win, min(doc_id) AS owner FROM (
         |  SELECT DISTINCT doc_id, win FROM w) GROUP BY win),
         |bad AS (SELECT w.doc_id, w.i FROM w JOIN own USING (win)
         |  WHERE own.owner < w.doc_id),
         |tok AS (SELECT doc_id, unnest(tk) AS tok,
         |  generate_subscripts(tk, 1) AS j FROM t),
         |keptt AS (SELECT tok.doc_id, tok.j, tok.tok FROM tok
         |  WHERE NOT EXISTS (SELECT 1 FROM bad
         |    WHERE bad.doc_id = tok.doc_id
         |      AND bad.i <= tok.j AND tok.j <= bad.i + 7)),
         |res AS (SELECT doc_id,
         |  string_agg(tok, ' ' ORDER BY j) AS clean_text,
         |  count(*)::BIGINT AS n_kept FROM keptt GROUP BY doc_id),
         |tot AS (SELECT doc_id, len(tk)::BIGINT AS n_tok FROM t)
         |SELECT tot.doc_id, coalesce(res.clean_text, '') AS clean_text,
         |  coalesce(res.n_kept, 0)::BIGINT AS n_kept,
         |  (tot.n_tok - coalesce(res.n_kept, 0))::BIGINT AS n_dropped
         |FROM tot LEFT JOIN res ON tot.doc_id = res.doc_id
         |ORDER BY tot.doc_id""".stripMargin,
    // line-level dedup over the SAME planted multi-line text the
    // Spark query builds: a line in >= 3 distinct docs is dropped
    // everywhere; survivors rejoin in original order. string_split
    // keeps empties exactly like the engine's limit=-1 split; docs
    // with zero survivors keep an empty clean_text (LEFT JOIN +
    // coalesce), matching the engine's corpus-membership contract.
    "corpus_diff" ->
      """WITH f AS (SELECT doc_id,
        |  md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS fp,
        |  text FROM documents),
        |v1 AS (SELECT doc_id, fp AS fp_old FROM f
        |  WHERE doc_id % 17 <> 3),
        |v2 AS (SELECT doc_id,
        |  CASE WHEN doc_id % 7 = 1
        |    THEN md5(regexp_replace(trim(text || ' v2edit'),
        |      '\s+', ' ', 'g'))
        |    ELSE fp END AS fp_new
        |  FROM f WHERE doc_id % 13 <> 5)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v1.doc_id IS NULL THEN 'added'
        |       WHEN v2.doc_id IS NULL THEN 'removed'
        |       WHEN fp_old <> fp_new THEN 'modified'
        |       ELSE 'unchanged' END AS verdict,
        |  fp_old, fp_new
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        |ORDER BY doc_id""".stripMargin,
    "paragraph_dedup" ->
      s"""WITH d AS (SELECT doc_id,
         |  'hdr ' || source || chr(10) || chr(10) ||
         |  text || chr(10) || 'inner ' || lang || chr(10) || chr(10) ||
         |  'ref ' || (doc_id // 2)::VARCHAR || chr(10) || chr(10) ||
         |  'ftr ' || lang AS t FROM documents),
         |l AS (SELECT doc_id,
         |  unnest(string_split(t, chr(10) || chr(10))) AS par,
         |  generate_subscripts(string_split(t, chr(10) || chr(10)), 1)
         |    AS ord
         |  FROM d),
         |df AS (SELECT par, count(DISTINCT doc_id) AS df
         |  FROM l GROUP BY par),
         |kept AS (SELECT l.doc_id,
         |  string_agg(l.par, chr(10) || chr(10) ORDER BY l.ord)
         |    AS clean_text,
         |  count(*)::BIGINT AS n_kept
         |  FROM l JOIN df ON l.par = df.par
         |  WHERE df.df < 3 GROUP BY l.doc_id),
         |tot AS (SELECT doc_id, count(*)::BIGINT AS n_paras
         |  FROM l GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(k.clean_text, '') AS clean_text,
         |  coalesce(k.n_kept, 0)::BIGINT AS n_kept,
         |  (tot.n_paras - coalesce(k.n_kept, 0))::BIGINT AS n_dropped
         |FROM d JOIN tot USING (doc_id)
         |LEFT JOIN kept k ON d.doc_id = k.doc_id
         |ORDER BY doc_id""".stripMargin,
    "line_dedup" ->
      s"""WITH d AS (SELECT doc_id,
         |  'hdr ' || source || chr(10) || text || chr(10) ||
         |  'ref ' || (doc_id // 2)::VARCHAR || chr(10) ||
         |  'ftr ' || lang AS t FROM documents),
         |l AS (SELECT doc_id,
         |  unnest(string_split(t, chr(10))) AS line,
         |  generate_subscripts(string_split(t, chr(10)), 1) AS ord
         |  FROM d),
         |df AS (SELECT line, count(DISTINCT doc_id) AS df
         |  FROM l GROUP BY line),
         |kept AS (SELECT l.doc_id,
         |  string_agg(l.line, chr(10) ORDER BY l.ord) AS clean_text,
         |  count(*)::BIGINT AS n_kept
         |  FROM l JOIN df ON l.line = df.line
         |  WHERE df.df < 3 GROUP BY l.doc_id),
         |tot AS (SELECT doc_id, count(*)::BIGINT AS n_lines
         |  FROM l GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(k.clean_text, '') AS clean_text,
         |  coalesce(k.n_kept, 0)::BIGINT AS n_kept,
         |  (tot.n_lines - coalesce(k.n_kept, 0))::BIGINT AS n_dropped
         |FROM d JOIN tot USING (doc_id)
         |LEFT JOIN kept k ON d.doc_id = k.doc_id
         |ORDER BY doc_id""".stripMargin,
    // T48 distinct-n diversity: exact occurrence/type counts per n,
    // ratio = one IEEE division (gram identity = the D13 chain)
    "corpus_diversity" ->
      s"""WITH t AS (SELECT doc_id,
         |  regexp_split_to_array(trim(text), '\\s+') AS tk
         |  FROM documents),
         |nn AS (SELECT unnest([1, 2, 3]) AS n),
         |tot AS (SELECT nn.n,
         |  sum(greatest(len(t.tk) - nn.n + 1, 0))::BIGINT AS n_grams
         |  FROM t, nn GROUP BY nn.n),
         |g AS (SELECT nn.n, unnest(list_distinct(list_transform(
         |    range(1, greatest(len(t.tk) - nn.n + 2, 1)),
         |    i -> array_to_string(list_slice(t.tk, i, i + nn.n - 1),
         |      ' ')))) AS gm
         |  FROM t, nn WHERE len(t.tk) >= nn.n),
         |d AS (SELECT n, count(DISTINCT gm)::BIGINT AS n_distinct_grams
         |  FROM g GROUP BY n)
         |SELECT tot.n, tot.n_grams, d.n_distinct_grams,
         |  d.n_distinct_grams::DOUBLE / tot.n_grams::DOUBLE
         |    AS distinct_ratio
         |FROM tot JOIN d USING (n) ORDER BY n""".stripMargin,
    // T47 per-domain boilerplate: the planted-URL chain supplies the
    // registered domain; df counts distinct docs per (domain, line)
    "domain_line_dedup" ->
      s"""$domainUrlCte,
         |p AS (SELECT doc_id, domain,
         |  'nav ' || domain || chr(10) || text || chr(10) ||
         |  'promo ' || (doc_id % 97)::VARCHAR || chr(10) ||
         |  'ftr ' || domain AS t FROM d),
         |l AS (SELECT doc_id, domain,
         |  unnest(string_split(t, chr(10))) AS line,
         |  generate_subscripts(string_split(t, chr(10)), 1) AS ord
         |  FROM p),
         |df AS (SELECT domain, line, count(DISTINCT doc_id) AS df
         |  FROM l GROUP BY domain, line),
         |kept AS (SELECT l.doc_id,
         |  string_agg(l.line, chr(10) ORDER BY l.ord) AS clean_text,
         |  count(*)::BIGINT AS n_kept
         |  FROM l JOIN df ON l.domain = df.domain AND l.line = df.line
         |  WHERE df.df < 3 GROUP BY l.doc_id),
         |tot AS (SELECT doc_id, count(*)::BIGINT AS n_lines
         |  FROM l GROUP BY doc_id)
         |SELECT p.doc_id, p.domain,
         |  coalesce(k.clean_text, '') AS clean_text,
         |  coalesce(k.n_kept, 0)::BIGINT AS n_kept,
         |  (tot.n_lines - coalesce(k.n_kept, 0))::BIGINT AS n_dropped
         |FROM p JOIN tot USING (doc_id)
         |LEFT JOIN kept k ON p.doc_id = k.doc_id
         |ORDER BY doc_id""".stripMargin,
    // T39 URL gate: the planted-URL CTE (mirrors
    // DomainOps.plantedUrlDocs literally), host/registered-domain
    // regexes shared with the Scala kernel via the same constants
    "domain_filter" ->
      s"""$domainUrlCte
         |SELECT doc_id, url, host, domain,
         |  domain IN ($domainBlockSql) AS blocked_domain,
         |  (${domainBadWordSql("url")}) AS blocked_word,
         |  NOT (domain IN ($domainBlockSql)
         |       OR (${domainBadWordSql("url")})) AS keep
         |FROM d ORDER BY doc_id""".stripMargin,
    // T40 per-domain cap: rank in (52-bit md5-prefix, doc_id) order
    // within the registered domain — the T8 md5-order convention with
    // an integer key both engines hold exactly
    "domain_cap" ->
      s"""$domainUrlCte,
         |k AS (SELECT doc_id, domain,
         |  ('0x' || substr(md5(text), 1, 13))::BIGINT AS sk FROM d),
         |r AS (SELECT doc_id, domain, row_number() OVER (
         |    PARTITION BY domain ORDER BY sk, doc_id) AS rk FROM k)
         |SELECT doc_id, domain, rk::INT AS domain_rank,
         |  rk <= 25 AS keep FROM r ORDER BY doc_id""".stripMargin,
    // T41 the bounded-heap kept set: identical selection, kept rows
    // only (the scale shape's own oracle row)
    "domain_cap_apply" ->
      s"""$domainUrlCte,
         |k AS (SELECT doc_id, domain,
         |  ('0x' || substr(md5(text), 1, 13))::BIGINT AS sk FROM d),
         |r AS (SELECT doc_id, domain, row_number() OVER (
         |    PARTITION BY domain ORDER BY sk, doc_id) AS rk FROM k)
         |SELECT doc_id, domain, rk::INT AS domain_rank
         |FROM r WHERE rk <= 25 ORDER BY doc_id""".stripMargin,
    // T42: arrival rank (doc_id order — the X24 first-seen proxy)
    // vs the md5-rank batch policy, reconciled
    "domain_cap_rebalance" ->
      s"""$domainUrlCte,
         |k AS (SELECT doc_id, domain,
         |  ('0x' || substr(md5(text), 1, 13))::BIGINT AS sk FROM d),
         |r AS (SELECT doc_id, domain,
         |  row_number() OVER (
         |    PARTITION BY domain ORDER BY sk, doc_id) AS rk,
         |  row_number() OVER (
         |    PARTITION BY domain ORDER BY doc_id) AS arr FROM k)
         |SELECT doc_id, domain, rk::INT AS domain_rank,
         |  arr <= 25 AS was_admitted,
         |  CASE WHEN arr <= 25 AND rk <= 25 THEN 'keep'
         |       WHEN arr <= 25 THEN 'evict'
         |       WHEN rk <= 25 THEN 'admit'
         |       ELSE 'out' END AS verdict
         |FROM r ORDER BY doc_id""".stripMargin
  )

  private def domainBlockSql: String =
    DomainOps.DefaultBlockedDomains.map(d => s"'$d'").mkString(", ")

  private def domainBadWordSql(urlCol: String): String =
    DomainOps.DefaultBadUrlWords
      .map(w => s"contains(lower($urlCol), '$w')").mkString(" OR ")

  /** The planted-URL fixture + host/domain extraction shared by the
    * three domain oracles: CTE `d` ends with (doc_id, text, url,
    * host, domain). Regex literals ARE the Scala kernel constants.
    */
  private def domainUrlCte: String = domainUrlCteNamed("u", "h", "d")

  /** The same chain with caller-chosen CTE names — the P6 release
    * oracle renames to uu/uh/ud because the signals chain it
    * composes with owns t/l/c/d/a/p.
    */
  private def domainUrlCteNamed(u: String, h: String,
      d: String): String =
    s"""WITH $u AS (SELECT doc_id, text,
       |  'https://' ||
       |  CASE WHEN doc_id % 10 IN (0, 1) THEN 'news.example.com'
       |       WHEN doc_id % 10 = 2 THEN 'cdn.news.example.com'
       |       WHEN doc_id % 10 = 3 THEN 'blog.example.org'
       |       WHEN doc_id % 10 = 4 THEN 'static.blog.example.org'
       |       WHEN doc_id % 10 = 5 THEN 'tracker.adsite.biz'
       |       WHEN doc_id % 10 = 6 THEN 'mirror.badcontent.co.uk'
       |       ELSE 'site' || (doc_id % 23)::VARCHAR || '.net' END ||
       |  '/p/' || doc_id::VARCHAR ||
       |  CASE WHEN doc_id % 7 = 3 THEN '?ref=casino-bonus'
       |       ELSE '' END AS url FROM documents),
       |$h AS (SELECT doc_id, text, url,
       |  regexp_extract(lower(url), '${DomainOps.UrlHostRe}', 1) AS host
       |  FROM $u),
       |$d AS (SELECT doc_id, text, url, host,
       |  CASE WHEN regexp_extract(host,
       |      '${DomainOps.RegDomainRe}', 1) = '' THEN host
       |    ELSE regexp_extract(host, '${DomainOps.RegDomainRe}', 1)
       |    END AS domain FROM $h)""".stripMargin

  /** The P6 URL-gate prefix: the renamed T39 chain plus
    * `ug(doc_id, domain)` — the gate's survivors with their
    * registered domain. Open WITH prefix for the release oracle.
    */
  private def releaseUrlGateCtes: String =
    domainUrlCteNamed("uu", "uh", "ud") +
      s""",
         |ug AS (SELECT doc_id, domain FROM ud
         |  WHERE NOT (domain IN ($domainBlockSql)
         |             OR (${domainBadWordSql("url")})))""".stripMargin

  /** The P6/P7/P8 release-core CTEs over `t`/`core`/`ug`: keep_core
    * survivors → fp dedup → per-domain cap rank (`rnk`, text still
    * attached). ONE definition for the two release statements' tail
    * AND the release+carve composition.
    */
  private def releaseCappedCtes: String =
    s""",
      |kept AS (SELECT t.doc_id, t.text, ug.domain FROM t
      |  JOIN core USING (doc_id) JOIN ug USING (doc_id)
      |  WHERE core.keep_core = 1),
      |fp8 AS (SELECT doc_id, domain, text,
      |  md5(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS fp
      | FROM kept),
      |sv AS (SELECT doc_id, domain, text, fp FROM (
      |  SELECT doc_id, domain, text, fp,
      |    MIN(doc_id) OVER (PARTITION BY fp) AS canonical
      |  FROM fp8) WHERE doc_id = canonical),
      |rnk AS (SELECT doc_id, domain, fp, text,
      |  row_number() OVER (PARTITION BY domain
      |    ORDER BY ('0x' || substr(md5(text), 1, 13))::BIGINT,
      |      doc_id) AS rk FROM sv)""".stripMargin

  /** The P6/P7 release tail: [[releaseCappedCtes]] + the
    * export-shard window and final projection.
    */
  private def releaseTailSql: String =
    releaseCappedCtes + s""",
      |ct AS (SELECT doc_id, domain, fp,
      |  len($TOKS)::BIGINT AS n_tokens,
      |  md5(concat('7:', doc_id)) AS h FROM rnk WHERE rk <= 3),
      |ss AS (SELECT doc_id, domain, fp, n_tokens,
      |  sum(n_tokens) OVER (ORDER BY h, doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS cum FROM ct)
      |SELECT doc_id, domain, fp, n_tokens,
      | ((cum - n_tokens) // 1024)::BIGINT AS shard_id
      |FROM ss ORDER BY doc_id""".stripMargin

  /** The P7 raw-page wrap of a text EXPRESSION (mirrors
    * TextOps.plantWebPage — one structure, both engines): every text
    * line becomes a `<p>` block under head/style/comment/script
    * noise, so the T45 extraction recovers the text exactly.
    */
  private def webWrapSql(textExpr: String): String =
    "'<html><!-- crawl fixture --><head><title></title>" +
      "<style media=\"all\">body { margin: 0; }</style></head>" +
      "<body><script>var t = 1 < 2 && true;</script><p>' ||\n" +
      "  replace(" + textExpr + ", chr(10), '</p><p>') ||\n" +
      "  '</p></body></html>'"

  /** The P5/P6/P7 planted-text CASE (the SignalsDupPage duplicate
    * pages over the c4 plant) — ONE definition for every
    * release-family oracle.
    */
  private def releasePlantCaseSql: String =
    "CASE WHEN doc_id % 50 = 7\n" +
      "  THEN " + Pipeline.SignalsDupPage.map(l => s"'$l'")
        .mkString(" || chr(10) || ") + "\n" +
      "  ELSE " + c4PlantExpr("") + " END"

  /** The T45 extraction CTE chain over `$from(doc_id, html)` →
    * `$out(doc_id, t)` — the SAME pattern strings the Spark
    * htmlTextOf Column applies, shared by the html_extract oracle
    * and the P7 web-release oracle. Starts with "," (appended to an
    * open WITH chain).
    */
  private def htmlExtractChain(from: String, out: String): String =
    (s""",
       |${out}1 AS (SELECT doc_id, regexp_replace(html,
       |  '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t FROM $from),
       |${out}2 AS (SELECT doc_id, regexp_replace(t,
       |  '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t FROM ${out}1),
       |${out}3 AS (SELECT doc_id, regexp_replace(t,
       |  '(?s)<!--.*?-->', ' ', 'g') AS t FROM ${out}2),
       |${out}4 AS (SELECT doc_id, regexp_replace(t,
       |  '(?i)</?(?:p|br|li|ul|ol|div|h[1-6]|tr|table|blockquote)\\b[^>]*>',
       |  chr(10), 'g') AS t FROM ${out}3),
       |${out}5 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g')
       |  AS t FROM ${out}4),
       |${out}6 AS (SELECT doc_id, replace(replace(replace(replace(replace(
       |  replace(t, '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
       |  '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS t FROM ${out}5),
       |${out}7 AS (SELECT doc_id, regexp_replace(t, '[ \\t\\r]+', ' ', 'g')
       |  AS t FROM ${out}6),
       |${out}8 AS (SELECT doc_id, regexp_replace(t, ' ?\\n[ \\n]*', chr(10),
       |  'g') AS t FROM ${out}7),
       |$out AS (SELECT doc_id, regexp_replace(t, '^\\s+|\\s+""").stripMargin +
      s"""$$', '', 'g')
         |  AS t FROM ${out}8)""".stripMargin
}
