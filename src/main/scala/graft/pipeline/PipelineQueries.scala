package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SparkEntry entries + DuckDB oracles for the LLM-data-pipeline
  * operators (dedup, similarity search, text analysis, multimodal).
  * Oracles recompute md5-based signatures/hashes identically in SQL.
  */
object PipelineQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> ((s, dir) => Dedup.exact(s, dir)),
    "dedup_norm" -> ((s, dir) => Dedup.normalized(s, dir)),
    // per-canonical-URL dedup: map-side normalize + one hash window;
    // the oracle states the expected canonical strings directly from
    // the generator arithmetic, so the normalizer must hit them
    // character-exact
    "dedup_url" -> ((s, dir) => Urls.dedupByUrl(s, dir)),
    // registered-domain doc counts / dup rates / link degrees
    "domain_stats" -> ((s, dir) => Urls.domainStats(s, dir)),
    // link-authority prior: PageRank power iteration over the domain
    // outlink graph (ordered per-target folds for hash-exactness)
    "link_pagerank" -> ((s, dir) => Urls.domainPageRank(s, dir)),
    // fine-grained authority: PageRank over the canonical-URL page
    // graph (|pages| nodes; uncrawled link targets dangle)
    "link_pagerank_pages" -> ((s, dir) => Urls.pagePageRank(s, dir)),
    // the convergence stop on the page graph (slower mixing than the
    // 16-domain rollup: ~7-11 iterations at these SFs)
    "link_pagerank_pages_converged" ->
      ((s, dir) => Urls.pagePageRankConverged(s, dir)),
    // HITS hubs & authorities over the domain graph (L1-normalized
    // half-steps, ordered folds; oracle unrolls the iterations)
    "link_hits" -> ((s, dir) => Urls.domainHits(s, dir)),
    // HITS at the grain link-farm detection runs at: the page graph
    "link_hits_pages" -> ((s, dir) => Urls.pageHits(s, dir)),
    // L1-delta convergence stop instead of a fixed iteration count
    // (one extra bounded agg per iteration); oracle replays the same
    // stop rule over unrolled iterations
    "link_pagerank_converged" -> ((s, dir) => Urls.domainPageRankConverged(s, dir)),
    // personalized (seeded-trust / TrustRank-style) teleport vector,
    // same convergence stop
    "link_pagerank_personalized" -> ((s, dir) => Urls.domainPageRankPersonalized(s, dir)),
    // TrustRank seeding on the graph it actually runs on in
    // production: the PAGE graph, seeds = canonical URLs
    "link_pagerank_pages_personalized" ->
      ((s, dir) => Urls.pagePageRankPersonalized(s, dir)),
    // crawl→curation composition: WARC fixture bytes → record parse →
    // target-URI + HTML href extraction → canonicalize → URL dedup /
    // domain stats. Oracles are dedup_url's / domain_stats' verbatim —
    // the WARC round trip must land on the same answers with no
    // synthetic bridge.
    "warc_url_dedup" -> ((s, dir) => Urls.warcUrlDedup(s, dir)),
    "warc_domain_stats" -> ((s, dir) => Urls.warcDomainStats(s, dir)),
    "dedup_minhash" -> ((s, dir) => Dedup.minhashLsh(s, dir)),
    "dedup_ngram" -> ((s, dir) => Dedup.ngramJaccard(s, dir)),
    // exact duplicated-substring spans (Lee et al. 2022): per-doc
    // maximal merged spans of 8-token windows occurring >1x corpus-wide
    "dedup_substring" -> ((s, dir) => Dedup.substringSpans(s, dir)),
    // the transform: cleaned corpus with duplicated spans removed,
    // surviving content fingerprinted per doc
    "dedup_substring_keep" -> ((s, dir) => Dedup.stripDuplicatedSpans(s, dir)),
    // MOSS-style pairs over winnowing-selected fingerprints
    "dedup_winnow" -> ((s, dir) => Dedup.winnowPairs(s, dir)),
    // pair graph → connected components → canonical per cluster (the
    // keep-one step after any near-dup pair generator)
    "dedup_clusters" -> ((s, dir) => Dedup.clusters(s, dir)),
    // the surviving corpus: cluster minima + singletons
    "dedup_keep" -> ((s, dir) =>
      Dedup.dropClusteredDuplicates(
          s.read.parquet(s"$dir/documents.parquet"),
          Dedup.clusters(s, dir), "doc_id")
        .select("doc_id").orderBy("doc_id")),
    // bounded-memory approximate membership: the Bloom bitset is a
    // (word, bits) DataFrame, probes are an equi-join on word — the
    // uncapped-scale alternative to the capped stream dictionaries
    "dedup_bloom" -> ((s, dir) => Dedup.bloomMembership(s, dir)),
    "dedup_simhash" -> ((s, dir) => Dedup.simhash(s, dir)),
    "simhash_pairs" -> ((s, dir) => Dedup.simhashPairs(s, dir)),
    "dedup_embedding" -> ((s, dir) => Dedup.embeddingPairs(s, dir)),
    "dedup_embedding_lsh" -> ((s, dir) => Dedup.embeddingPairsLsh(s, dir)),
    "ann_bruteforce" -> ((s, dir) => Similarity.bruteForce(s, dir)),
    "ann_lsh" -> ((s, dir) => Similarity.lshTopK(s, dir)),
    // multi-probe LSH: Hamming-1 neighbor buckets probed query-side
    "ann_lsh_multiprobe" -> ((s, dir) => Similarity.lshMultiProbeTopK(s, dir)),
    // oracle generated at runtime from the fitted centroids (see
    // ivfOracle below); KMeans quality itself is covered by IvfSpec
    "ann_ivf" -> ((s, dir) => Similarity.ivfTopK(s, dir, recordAs = Some("ann_ivf"))),
    // index-quality measurement: recall@k of the IVF probe against the
    // exact brute-force top-k over the same queries — a live
    // cross-check of the two pipelines, and the monitoring op every
    // vector deployment runs (recorded-run oracle replays BOTH legs)
    "ann_recall" -> ((s, dir) =>
      Similarity.ivfRecall(s, dir, recordAs = Some("ann_recall"))),
    // vector search from pure SQL: the IVF probe through the fused
    // graft_ann table function (recorded-run oracle, ann_ivf pattern)
    "ann_sql" -> ((s, dir) =>
      s.sql("SELECT qid, rank, vec_id, cos " +
        s"FROM graft_ann('$dir', 5, 10) ORDER BY qid, rank")),
    // the TABLE form: the query side is a USER view (here a vec_id
    // prefix of the corpus, which is what lets the recorded-run
    // oracle rebuild the same query set); probe-cell selection runs
    // distributed, no self-exclusion (opaque qids)
    "ann_sql_table" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      s.read.parquet(s"$dir/embeddings.parquet")
        .where(col("vec_id") < 8)
        .select(col("vec_id").as("qid"),
          col("embedding").cast("array<double>").as("qvec"))
        .createOrReplaceTempView("graft_ann_queries")
      Similarity.recordIvfRun(s, dir, "ann_sql_table",
        nQueries = 8, k = 10, nProbe = 4, excludeSelf = false)
      s.sql("SELECT qid, rank, vec_id, cos " +
        s"FROM graft_ann('$dir', 'graft_ann_queries', 'qid', 'qvec', 10) " +
        "ORDER BY qid, rank")
    }),
    // IVF-PQ: coarse probe + product-quantized asymmetric distance +
    // exact re-rank of the ADC shortlist; oracle generated from the
    // recorded centroids AND codebooks (ann_ivf pattern)
    "ann_ivfpq" -> ((s, dir) =>
      Similarity.ivfPqTopK(s, dir, recordAs = Some("ann_ivfpq"))),
    // vector-index persist/reload (the ANN analog of search_reloaded):
    // probe from PARQUET-persisted centroids/codebooks/codes — must
    // equal the in-session index, which the shared oracle pins
    "ann_ivfpq_reloaded" -> ((s, dir) => {
      val store = "/tmp/graft_fixtures/pq_index_" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      pqStoreWritten.synchronized {
        if (!pqStoreWritten.contains(store)) {
          Similarity.savePqIndex(s, dir, store)
          pqStoreWritten += store
        }
      }
      Similarity.loadedIvfPqTopK(s, dir, store,
        recordAs = Some("ann_ivfpq_reloaded"))
    }),
    // the persisted store probed from PURE SQL (the serving path):
    // the fused graft_ann_store TVF runs the same loadedIvfPqTopK
    // plan, so this must equal ann_ivfpq_reloaded row-for-row
    "ann_store_sql" -> ((s, dir) => {
      val store = "/tmp/graft_fixtures/pq_index_" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      pqStoreWritten.synchronized {
        if (!pqStoreWritten.contains(store)) {
          Similarity.savePqIndex(s, dir, store)
          pqStoreWritten += store
        }
      }
      // the exec records nothing (any graft_ann_store call would
      // clobber a constant tag) — THIS entry knows its parameters,
      // so it records them explicitly from the same frozen store
      Similarity.recordPqStoreRun(s, store, "ann_store_sql",
        nQueries = 5, k = 10)
      s.sql("SELECT qid, rank, vec_id, cos " +
        s"FROM graft_ann_store('$dir', '$store', 5, 10) ORDER BY qid, rank")
    }),
    // encode-only incremental ingest: the store starts with 90% of
    // the corpus, the last tenth is APPENDED against the frozen
    // centroids/codebooks (no refit, existing codes untouched) — the
    // probe over the appended store must equal the all-at-once
    // index's, which the shared recorded-run oracle pins
    "ann_ivfpq_appended" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val store = "/tmp/graft_fixtures/pq_index_app_" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      pqStoreWritten.synchronized {
        if (!pqStoreWritten.contains(store)) {
          Similarity.savePqIndex(s, dir, store,
            codesFilter = Some(col("vec_id") % 10 =!= 9))
          Similarity.appendToPqIndex(s, dir, store, col("vec_id") % 10 === 9)
          pqStoreWritten += store
        }
      }
      Similarity.loadedIvfPqTopK(s, dir, store,
        recordAs = Some("ann_ivfpq_appended"))
    }),
    // the STREAMING ingest face of the persisted store: the store
    // seeds with 80% of the corpus, the last fifth ARRIVES as a
    // four-micro-batch file stream, each batch foreachBatch-appended
    // encode-only (frozen artifacts re-read per batch, recoverPqStore
    // first) — the probe over the final store must equal the
    // all-at-once index's, which the shared recorded-run oracle pins.
    // Deterministic and invocation-count-proof WITHOUT retraining
    // (VERDICT r13): the 80% SEED store — k-means train included —
    // is built once per corpus content signature and frozen (the
    // Warc fixture discipline); every invocation copies the seed to
    // a fresh working store and replays the same stream onto it, so
    // the entry times streaming ingest + probe, not the retrain.
    "stream_ann_store" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val sig = graft.sources.CorpusRegistry.signature(s"$dir/embeddings.parquet")
      val tag = dir.replaceAll("[^A-Za-z0-9.]", "_")
      val seed = s"/tmp/graft_fixtures/pq_stream_seed_${tag}_$sig"
      val seedOk = new java.io.File(seed, "_GRAFT_SEED_OK")
      pqStoreWritten.synchronized {
        if (!seedOk.exists()) {
          Similarity.savePqIndex(s, dir, seed,
            codesFilter = Some(col("vec_id") % 5 =!= 4))
          seedOk.createNewFile()
        }
      }
      val store = s"/tmp/graft_fixtures/pq_stream_$tag"
      workingStoreFromSeed(seed, store)
      Similarity.streamIngestPqIndex(s, dir, store, col("vec_id") % 5 === 4,
        stagingCache = Some(s"/tmp/graft_fixtures/pq_stream_src_${tag}_$sig"))
      Similarity.loadedIvfPqTopK(s, dir, store,
        recordAs = Some("stream_ann_store"))
    }),
    // store maintenance, deletion half: every 7th vector is REMOVED
    // from the persisted store (codes rewrite; centroids/codebooks
    // frozen, surviving codes untouched) — the probe must equal a
    // store saved without the slice, which the recorded-run oracle
    // pins by excluding the removed ids from the candidate set
    "ann_ivfpq_removed" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      val store = "/tmp/graft_fixtures/pq_index_rm_" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      pqStoreWritten.synchronized {
        if (!pqStoreWritten.contains(store)) {
          Similarity.savePqIndex(s, dir, store)
          Similarity.removeFromPqIndex(s, store, col("vec_id") % 7 === 3)
          pqStoreWritten += store
        }
      }
      Similarity.loadedIvfPqTopK(s, dir, store,
        recordAs = Some("ann_ivfpq_removed"))
    }),
    // SemDeDup: within-cell cosine dedup on the SAME fitted quantizer
    "dedup_semantic" -> ((s, dir) =>
      Similarity.semDedup(s, dir, recordAs = Some("dedup_semantic"))),
    // int8 codes pinned per vector by an md5 digest + L1 (arrays
    // themselves stay out of the compare; scalars hash stably)
    "emb_quantize" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      Similarity.quantizeInt8(s, dir)
        .select(col("vec_id"), col("scale_r"),
          md5(concat_ws(",", col("q").cast("array<string>"))).as("q_md5"),
          aggregate(col("q"), lit(0L), (acc, x) => acc + abs(x)).as("q_l1"),
          col("max_abs_err"))
        .orderBy("vec_id")
    }),
    "ann_quantized" -> ((s, dir) => Similarity.quantizedTopK(s, dir)),
    // filtered vector search: label constraint as the join key
    "ann_filtered" -> ((s, dir) => Similarity.filteredTopK(s, dir)),
    "decontaminate" -> ((s, dir) => Curation.decontaminate(s, dir)),
    // fuzzy doc-level complement of the exact n-gram decontaminate
    "decontaminate_fuzzy" -> ((s, dir) => Dedup.crossDecontaminate(s, dir)),
    "sample_stratified" -> ((s, dir) => Curation.stratifiedSample(s, dir)),
    // leakage-aware train/val/test assignment: hash the source group
    "split_assign" -> ((s, dir) => Curation.splitAssign(s, dir)),
    // sliding context-window chunking for long documents
    "chunk_documents" -> ((s, dir) => Curation.chunkDocuments(s, dir)),
    // end-to-end manifest: dedup keep + quality gates + split labels
    "curate_manifest" -> ((s, dir) => Curation.curateManifest(s, dir)),
    // quality-proportional deterministic importance selection
    "select_importance" -> ((s, dir) => Curation.selectImportance(s, dir)),
    "pack_sequences" -> ((s, dir) => Curation.packSequences(s, dir)),
    "vocab_coverage" -> ((s, dir) => Curation.vocabCoverage(s, dir)),
    "keywords_tfidf" -> ((s, dir) => Curation.keywordsTfidf(s, dir)),
    "source_overlap" -> ((s, dir) => Curation.sourceOverlap(s, dir)),
    "unigram_logprob" -> ((s, dir) => Curation.unigramLogprob(s, dir)),
    // context-aware LM quality score: add-one-smoothed bigram model
    "bigram_logprob" -> ((s, dir) => Curation.bigramLogprob(s, dir)),
    // in-engine trained logistic quality/language classifier; oracle
    // generated from the recorded fitted weights (ann_ivf pattern)
    "quality_classifier" -> ((s, dir) =>
      Curation.qualityClassifier(s, dir, recordAs = Some("quality_classifier"))),
    "ccnet_buckets" -> ((s, dir) => Curation.ccnetBuckets(s, dir)),
    "mix_weights" -> ((s, dir) => Curation.mixWeights(s, dir)),
    // temperature-scaled (n^α) sampling weights — the tunable
    // interpolation between mix_weights' natural share and uniform
    "mix_temperature" -> ((s, dir) => Curation.domainMixture(s, dir)),
    "pii_scrub" -> ((s, dir) => Curation.piiScrub(s, dir)),
    // the PII patterns firing for real through the cross-engine gate
    // (deterministically enriched text; nonzero, id-varying counts)
    "pii_scrub_live" -> ((s, dir) => Curation.piiScrubLive(s, dir)),
    "lang_id" -> ((s, dir) => TextAnalysis.langId(s, dir)),
    "lang_id_ngram" -> ((s, dir) => TextAnalysis.langIdNgram(s, dir)),
    "quality_score" -> ((s, dir) => TextAnalysis.qualityScore(s, dir)),
    "repetition_signals" -> ((s, dir) => TextAnalysis.repetitionSignals(s, dir)),
    "token_stats" -> ((s, dir) => TextAnalysis.tokenStats(s, dir)),
    // BPE merge-mining counting step: top adjacent pairs corpus-wide
    "token_pairs" -> ((s, dir) => TextAnalysis.tokenPairStats(s, dir)),
    // trained-tokenizer application: broadcast segmentation dictionary
    "bpe_encode" -> ((s, dir) => Bpe.encode(s, dir, recordAs = Some("bpe_encode"))),
    // decode(encode(x)) == analyze(x): distributed tokenizer inversion
    "bpe_roundtrip" -> ((s, dir) => Bpe.decodeRoundtrip(s, dir)),
    "distinct_hll" -> ((s, dir) => TextAnalysis.distinctTokensHll(s, dir)),
    // Count-Min frequency sketch: every corpus term + absent probes
    // estimated from d*w counters; one-sided error hash-visible
    "cms_counts" -> ((s, dir) => TextAnalysis.cmsTermCounts(s, dir)),
    // frequent-items sketch heavy hitters (bounded merge state)
    "topk_terms_sketch" -> ((s, dir) => TextAnalysis.topTermsSketch(s, dir)),
    "select_budget" -> ((s, dir) => Curation.selectBudget(s, dir)),
    "fingerprints" -> ((s, dir) => TextAnalysis.fingerprints(s, dir)),
    "fingerprint_winnow" -> ((s, dir) => TextAnalysis.winnowing(s, dir)),
    "multimodal_meta" -> ((s, dir) => Multimodal.decodeMeta(s, dir)),
    "multimodal_decode_png" -> ((s, dir) => Multimodal.decodePngMeta(s, dir)),
    "multimodal_frames" -> ((s, dir) => Multimodal.frameSample(s, dir)),
    "multimodal_features" -> ((s, dir) => {
      import org.apache.spark.sql.functions._
      Multimodal.featureExtract(s, dir)
        .select(col("doc_id"), posexplode(col("features")).as(Seq("dim", "value")))
        .select(col("doc_id"), col("dim").cast("long").as("dim"),
          round(col("value"), 6).as("value"))
        .orderBy("doc_id", "dim")
    }),
    "multimodal_resize" -> ((s, dir) => Multimodal.resizeMeta(s, dir)))

  // ---------------- oracle SQL ----------------

  private[graft] val toksCte =
    """WITH toks AS (
      |  SELECT doc_id, text, lang,
      |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tokens
      |  FROM documents
      |)""".stripMargin

  /** Non-distinct variant of [[shingleSql]] — repetition signals need
    * gram multiplicity. */
  private def ngramAllSql(n: Int): String = {
    val parts = (0 until n).map {
      case 0 => "tokens[i]"
      case o => s"tokens[i + $o]"
    }.mkString(" || ' ' || ")
    s"list_transform(range(1, len(tokens) - ${n - 2}), i -> $parts)"
  }

  private def shingleSql(n: Int): String = {
    val parts = (0 until n).map {
      case 0 => "tokens[i]"
      case o => s"tokens[i + $o]"
    }.mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, len(tokens) - ${n - 2}), i -> $parts))"
  }

  private[graft] val simhashBitsCte: String = {
    // 64-bit fingerprint from two 32-bit md5-prefix halves, mirroring
    // Dedup.simhash. Bit 63's weight is long-min, which DuckDB cannot
    // parse as a single literal (the unary minus overflows first) —
    // spelled (-(2^63-1) - 1) instead.
    def bitExpr(j: Int) = if (j < 32) s"(hv_lo >> $j) & 1" else s"(hv_hi >> ${j - 32}) & 1"
    def weight(j: Int) = if (j == 63) "(-9223372036854775807 - 1)" else (1L << j).toString
    val bitSums = (0 until 64)
      .map(j => s"sum(CASE WHEN ${bitExpr(j)} = 1 THEN tf ELSE -tf END) AS bs_$j")
      .mkString(",\n    ")
    val assemble = (0 until 64)
      .map(j => s"(CASE WHEN bs_$j > 0 THEN ${weight(j)} ELSE 0 END)")
      .mkString(" + ")
    s"""posts AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(tokens) AS term FROM toks) GROUP BY 1, 2
       |), hv AS (
       |  SELECT doc_id, tf,
       |    ('0x' || substr(md5(term), 1, 8))::BIGINT AS hv_hi,
       |    ('0x' || substr(md5(term), 9, 8))::BIGINT AS hv_lo
       |  FROM posts
       |), bits AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM hv GROUP BY doc_id
       |), sims AS (
       |  SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM bits
       |)""".stripMargin
  }

  private def jaccardTail(threshold: Double): String =
    s"""j AS (
       |  SELECT x, y,
       |    len(list_intersect(sa.ss, sb.ss))::DOUBLE / len(list_distinct(sa.ss || sb.ss)) AS jaccard
       |  FROM cand JOIN sh sa ON sa.doc_id = cand.x JOIN sh sb ON sb.doc_id = cand.y
       |)
       |SELECT x AS doc_a, y AS doc_b, round_even((jaccard) * 1e4, 0) / 1e4 AS jaccard FROM j
       |WHERE jaccard >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  private val embCte =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
      |)""".stripMargin

  private def annLshPlanesValues: String = {
    val planes = Similarity.hyperplanes(8, 64)
    planes.zipWithIndex.map { case (p, i) =>
      s"($i, [${p.mkString(", ")}]::DOUBLE[])"
    }.mkString(",\n    ")
  }

  /** The embeddings + hyperplane-bucket CTE chain (e, planes, bk, eb)
    * WITHOUT the leading WITH — composable into larger oracles
    * (stream_ingest_e2e) whose WITH is opened by another prefix. */
  private[graft] def embLshCtes: String =
    s"""${embCte.stripPrefix("WITH ")},
       |planes(i, p) AS (VALUES
       |    $annLshPlanesValues
       |), bk AS (
       |  SELECT e.vec_id,
       |    CAST(sum(CASE WHEN list_sum(list_transform(range(1, 65), j -> e.v[j] * pl.p[j])) >= 0
       |      THEN (1::BIGINT << pl.i) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM e, planes pl GROUP BY e.vec_id
       |), eb AS (
       |  SELECT e.vec_id, e.v, bk.bucket FROM e JOIN bk USING (vec_id)
       |)""".stripMargin

  /** DuckDB replica of [[Dedup.bloomMembership]] (m=2^14, k=3): build
    * the (word, bits) bitset with the identical integer/md5
    * arithmetic, probe the same even-member / odd-perturbed frame.
    * Also the oracle of the STREAMING form ([[Dedup.bloomVsCorpus]]),
    * which produces the same rows through k stateless stream-static
    * joins — shared like [[annVsCorpusOracleSql]]. */
  private[graft] val bloomMembershipOracleSql: String =
    """WITH docs AS (SELECT doc_id, md5(text) AS fp FROM documents),
      |mpos AS (
      |  SELECT ('0x' || substr(md5(fp || '#' || i), 1, 8))::BIGINT % 16384 AS pos
      |  FROM docs, range(3) t(i)
      |),
      |bitset AS (
      |  SELECT pos >> 5 AS word, bit_or(1::BIGINT << CAST(pos & 31 AS INT)) AS bits
      |  FROM mpos GROUP BY 1
      |),
      |probes AS (
      |  SELECT doc_id, doc_id % 2 = 0 AS is_member,
      |    CASE WHEN doc_id % 2 = 0 THEN fp ELSE md5(fp || '!absent') END AS probe_fp
      |  FROM docs
      |),
      |ppos AS (
      |  SELECT doc_id, is_member,
      |    ('0x' || substr(md5(probe_fp || '#' || i), 1, 8))::BIGINT % 16384 AS pos
      |  FROM probes, range(3) t(i)
      |)
      |SELECT p.doc_id, p.is_member,
      |  bool_and((coalesce(b.bits, 0) & (1::BIGINT << CAST(p.pos & 31 AS INT))) <> 0) AS in_bloom
      |FROM ppos p LEFT JOIN bitset b ON b.word = p.pos >> 5
      |GROUP BY 1, 2
      |ORDER BY doc_id""".stripMargin

  /** DuckDB replica of the ingest-time streaming ANN probe
    * ([[graft.streaming.EventStreams.annVsCorpusStream]]): every
    * vector replayed as the arriving side against the LSH-bucketed
    * corpus — same hyperplanes, same bucket join, thresholded cosine.
    * Shared with StreamQueries' oracle map like `minhashCtePrefix`. */
  private[graft] def annVsCorpusOracleSql(minCos: Double): String =
    s"""$embCte,
       |planes(i, p) AS (VALUES
       |    $annLshPlanesValues
       |), bk AS (
       |  SELECT e.vec_id,
       |    CAST(sum(CASE WHEN list_sum(list_transform(range(1, 65), j -> e.v[j] * pl.p[j])) >= 0
       |      THEN (1::BIGINT << pl.i) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM e, planes pl GROUP BY e.vec_id
       |), eb AS (
       |  SELECT e.vec_id, e.v, bk.bucket FROM e JOIN bk USING (vec_id)
       |), pairs AS (
       |  SELECT a.vec_id, b.vec_id AS corpus_id, a.bucket,
       |    list_cosine_similarity(a.v, b.v) AS cos
       |  FROM eb a JOIN eb b USING (bucket) WHERE b.vec_id <> a.vec_id
       |)
       |SELECT vec_id, corpus_id, bucket, round(cos, 4) AS cos
       |FROM pairs WHERE cos >= $minCos
       |ORDER BY vec_id, corpus_id""".stripMargin

  private[graft] val langProfileSql: Seq[(String, String)] = TextAnalysis.LangProfiles.map {
    case (l, ws) =>
      l -> s"len(list_filter(tokens, x -> list_contains([${ws.map(w => s"'$w'").mkString(", ")}], x))) AS s_$l"
  }

  /** DuckDB replica of [[Similarity.ivfTopK]]'s probe path, generated
    * AFTER the query ran (Verify dumps oracleSql last): the fitted
    * centroids are inlined as literals, then assignment (first-min
    * cell by `|c|^2 - 2 v.c`), probe-cell top-nProbe, and exact
    * cosine rerank are recomputed in SQL. Verifies everything
    * downstream of the KMeans fit. */
  private def ivfOracle: Map[String, String] =
    Seq("ann_ivf", "ann_sql", "ann_sql_table").flatMap(ivfOracleFor).toMap ++
      ivfRecallOracle

  /** DuckDB replica of [[Similarity.ivfRecall]]: BOTH legs — the
    * exact brute-force top-k and the IVF probe (from the recorded
    * centroids, [[ivfOracleFor]]'s pipeline) — joined on
    * (qid, vec_id) and folded to per-query hit counts. */
  private def ivfRecallOracle: Map[String, String] =
    Similarity.recordedIvfRun("ann_recall") match {
      case None => Map.empty
      case Some(run) =>
        val values = run.centroids.zipWithIndex.map { case (c, i) =>
          val cc = c.foldLeft(0.0)((acc, x) => acc + x * x)
          s"($i, [${c.mkString(", ")}]::DOUBLE[], $cc)"
        }.mkString(",\n    ")
        Map("ann_recall" ->
          s"""$embCte,
             |cents(i, c, cc) AS (VALUES
             |    $values
             |), sc AS (
             |  SELECT e.vec_id, cents.i,
             |    cents.cc - 2 * list_sum(list_transform(range(1, ${run.dim + 1}), j -> e.v[j] * cents.c[j])) AS d
             |  FROM e, cents
             |), cells AS (
             |  SELECT vec_id, i AS cell FROM (
             |    SELECT vec_id, i, row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn FROM sc)
             |  WHERE rn = 1
             |), probes AS (
             |  SELECT vec_id AS qid, i AS cell FROM (
             |    SELECT vec_id, i, row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn
             |    FROM sc WHERE vec_id < ${run.nQueries})
             |  WHERE rn <= ${run.nProbe}
             |), iv AS (
             |  SELECT p.qid, c.vec_id, list_cosine_similarity(ev.v, eq.v) AS cos
             |  FROM probes p JOIN cells c ON c.cell = p.cell AND c.vec_id <> p.qid
             |  JOIN e ev ON ev.vec_id = c.vec_id
             |  JOIN e eq ON eq.vec_id = p.qid
             |), ivr AS (
             |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM iv
             |), ivf AS (SELECT qid, vec_id FROM ivr WHERE rank <= ${run.k}),
             |bfs AS (
             |  SELECT q.vec_id AS qid, e2.vec_id, list_cosine_similarity(e2.v, q.v) AS cos
             |  FROM e q, e e2 WHERE q.vec_id < ${run.nQueries} AND e2.vec_id <> q.vec_id
             |), bfr AS (
             |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM bfs
             |), bf AS (SELECT qid, vec_id FROM bfr WHERE rank <= ${run.k})
             |SELECT b.qid, count(i.vec_id)::BIGINT AS n_hit,
             |  round_even((count(i.vec_id) / ${run.k}.0) * 1e4, 0) / 1e4 AS recall
             |FROM bf b LEFT JOIN ivf i ON i.qid = b.qid AND i.vec_id = b.vec_id
             |GROUP BY 1
             |ORDER BY b.qid""".stripMargin)
    }

  private def ivfOracleFor(tag: String): Option[(String, String)] =
    Similarity.recordedIvfRun(tag) match {
      case None => None
      case Some(run) =>
        val values = run.centroids.zipWithIndex.map { case (c, i) =>
          val cc = c.foldLeft(0.0)((acc, x) => acc + x * x)
          s"($i, [${c.mkString(", ")}]::DOUBLE[], $cc)"
        }.mkString(",\n    ")
        Some(tag ->
          s"""$embCte,
             |cents(i, c, cc) AS (VALUES
             |    $values
             |), sc AS (
             |  SELECT e.vec_id, cents.i,
             |    cents.cc - 2 * list_sum(list_transform(range(1, ${run.dim + 1}), j -> e.v[j] * cents.c[j])) AS d
             |  FROM e, cents
             |), cells AS (
             |  SELECT vec_id, i AS cell FROM (
             |    SELECT vec_id, i, row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn FROM sc)
             |  WHERE rn = 1
             |), probes AS (
             |  SELECT vec_id AS qid, i AS cell FROM (
             |    SELECT vec_id, i, row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn
             |    FROM sc WHERE vec_id < ${run.nQueries})
             |  WHERE rn <= ${run.nProbe}
             |), s AS (
             |  SELECT p.qid, c.vec_id, list_cosine_similarity(ev.v, eq.v) AS cos
             |  FROM probes p JOIN cells c ON c.cell = p.cell${
               if (run.excludeSelf) " AND c.vec_id <> p.qid" else ""}
             |  JOIN e ev ON ev.vec_id = c.vec_id
             |  JOIN e eq ON eq.vec_id = p.qid
             |), r AS (
             |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM s
             |)
             |SELECT qid, rank, vec_id, round(cos, 4) AS cos FROM r WHERE rank <= ${run.k}
             |ORDER BY qid, rank""".stripMargin)
    }

  /** DuckDB replica of [[Similarity.ivfPqTopK]] from the recorded
    * coarse centroids + PQ codebooks: assignment and probes as in
    * [[ivfOracle]], then residual PQ encoding (first-min argmin per
    * subspace), the per-(query, cell) ADC lookup table, the ordered
    * `rr + sum_m lut[m*ks + code_m]` fold (list_transform over an
    * ordered range — the same index-order accumulation as the Spark
    * expression, so the doubles are bit-identical), the ADC top-
    * `rerank` shortlist, and the exact-cosine re-rank. Verifies
    * everything downstream of the two KMeans fits. */
  /** Write-once guard for the persisted PQ index fixture. */
  private val pqStoreWritten = scala.collection.mutable.Set.empty[String]

  /** Local recursive dir copy (fixture seeding: PQ seed store →
    * fresh working store). Deletes the target first so every
    * invocation starts from the identical frozen seed. */
  private def rmTree(p: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    // NOFOLLOW walk: a working store may hold symlinks to the shared
    // seed's frozen children — delete the links, never their targets
    if (Files.exists(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.delete(f))
    }
  }

  private def copyDirTree(src: String, dst: String): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val s0 = Paths.get(src)
    val d0 = Paths.get(dst)
    rmTree(d0)
    Files.walk(s0).forEach { p =>
      val t = d0.resolve(s0.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Working-store setup for the streaming-ingest entry (r14 verdict
    * #7): only the MUTABLE children (`codes`, `meta`) are copied from
    * the frozen seed; `centroids`/`codebooks` — which an encode-only
    * ingest never touches — are SYMLINKED to the seed's, read-only.
    * The per-invocation setup cost is then one small codes copy
    * instead of the full store tree, and the shared frozen children
    * keep their mtimes, so [[graft.pipeline.Similarity]]'s
    * signature-guarded artifact cache hits across invocations. */
  private def workingStoreFromSeed(seed: String, dst: String): Unit = {
    import java.nio.file.{Files, Paths}
    val s0 = Paths.get(seed)
    val d0 = Paths.get(dst)
    rmTree(d0)
    Files.createDirectories(d0)
    Seq("codes", "meta").foreach { child =>
      if (Files.exists(s0.resolve(child)))
        copyDirTree(s0.resolve(child).toString, d0.resolve(child).toString)
    }
    Seq("centroids", "codebooks").foreach { child =>
      if (Files.exists(s0.resolve(child)))
        Files.createSymbolicLink(d0.resolve(child),
          s0.resolve(child).toAbsolutePath)
    }
  }

  private def ivfPqOracle: Map[String, String] =
    Seq("ann_ivfpq", "ann_ivfpq_reloaded", "ann_ivfpq_appended",
      "ann_ivfpq_removed", "ann_store_sql", "stream_ann_store")
      .flatMap(ivfPqOracleFor).toMap

  /** Per-tag candidate-set restriction: a store that REMOVED a slice
    * must not surface it — the oracle replays the removal as a
    * candidate filter (codes rows are gone; raw vectors remain and
    * still serve as queries). */
  private val ivfPqCandFilter: Map[String, String] =
    Map("ann_ivfpq_removed" -> " AND cl.vec_id % 7 <> 3")

  private def ivfPqOracleFor(tag: String): Option[(String, String)] =
    Similarity.recordedIvfPqRun(tag) match {
      case None => None
      case Some(run) =>
        val sub = run.dim / run.m
        val centValues = run.centroids.zipWithIndex.map { case (c, i) =>
          val cc = c.foldLeft(0.0)((acc, x) => acc + x * x)
          s"($i, [${c.mkString(", ")}]::DOUBLE[], $cc)"
        }.mkString(",\n    ")
        val cbValues = (for {
          mm <- run.codebooks.indices
          j <- run.codebooks(mm).indices
        } yield {
          val c = run.codebooks(mm)(j)
          val cc = c.foldLeft(0.0)((acc, x) => acc + x * x)
          s"($mm, $j, [${c.mkString(", ")}]::DOUBLE[], $cc)"
        }).mkString(",\n    ")
        Some(tag ->
          s"""$embCte,
             |cents(i, c, cc) AS (VALUES
             |    $centValues
             |), cb(m, j, c, cc) AS (VALUES
             |    $cbValues
             |), sc AS (
             |  SELECT e.vec_id, cents.i,
             |    cents.cc - 2 * list_sum(list_transform(range(1, ${run.dim + 1}), jj -> e.v[jj] * cents.c[jj])) AS d
             |  FROM e, cents
             |), cells AS (
             |  SELECT vec_id, i AS cell FROM (
             |    SELECT vec_id, i, row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn FROM sc)
             |  WHERE rn = 1
             |), probes AS (
             |  SELECT vec_id AS qid, i AS cell FROM (
             |    SELECT vec_id, i, row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn
             |    FROM sc WHERE vec_id < ${run.nQueries})
             |  WHERE rn <= ${run.nProbe}
             |), res AS (
             |  SELECT e.vec_id, cl.cell,
             |    list_transform(range(1, ${run.dim + 1}), jj -> e.v[jj] - cents.c[jj]) AS r
             |  FROM e JOIN cells cl USING (vec_id) JOIN cents ON cents.i = cl.cell
             |), cs AS (
             |  SELECT res.vec_id, cb.m, cb.j,
             |    cb.cc - 2 * list_sum(list_transform(range(1, ${sub + 1}), jj -> res.r[cb.m * $sub + jj] * cb.c[jj])) AS d
             |  FROM res, cb
             |), codesarr AS (
             |  SELECT vec_id, list(j ORDER BY m) AS carr FROM (
             |    SELECT vec_id, m, j, row_number() OVER (PARTITION BY vec_id, m ORDER BY d, j) AS rn FROM cs)
             |  WHERE rn = 1 GROUP BY vec_id
             |), qres AS (
             |  SELECT p.qid, p.cell,
             |    list_transform(range(1, ${run.dim + 1}), jj -> eq.v[jj] - cents.c[jj]) AS r
             |  FROM probes p JOIN e eq ON eq.vec_id = p.qid JOIN cents ON cents.i = p.cell
             |), qrr AS (
             |  SELECT qid, cell, list_sum(list_transform(r, x -> x * x)) AS rr FROM qres
             |), lutarr AS (
             |  SELECT q.qid, q.cell, list(
             |    cb.cc - 2 * list_sum(list_transform(range(1, ${sub + 1}), jj -> q.r[cb.m * $sub + jj] * cb.c[jj]))
             |    ORDER BY cb.m, cb.j) AS larr
             |  FROM qres q, cb GROUP BY q.qid, q.cell
             |), adist AS (
             |  SELECT p.qid, cl.vec_id,
             |    qrr.rr + list_sum(list_transform(range(0, ${run.m}),
             |      mm -> la.larr[mm * ${run.ks} + ca.carr[mm + 1] + 1])) AS ad
             |  FROM probes p
             |  JOIN cells cl ON cl.cell = p.cell AND cl.vec_id <> p.qid${ivfPqCandFilter.getOrElse(tag, "")}
             |  JOIN qrr ON qrr.qid = p.qid AND qrr.cell = p.cell
             |  JOIN lutarr la ON la.qid = p.qid AND la.cell = p.cell
             |  JOIN codesarr ca ON ca.vec_id = cl.vec_id
             |), short AS (
             |  SELECT qid, vec_id FROM (
             |    SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY ad, vec_id) AS rn FROM adist)
             |  WHERE rn <= ${run.rerank}
             |), sx AS (
             |  SELECT s.qid, s.vec_id, list_cosine_similarity(ev.v, eq.v) AS cos
             |  FROM short s JOIN e ev ON ev.vec_id = s.vec_id JOIN e eq ON eq.vec_id = s.qid
             |), r AS (
             |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM sx
             |)
             |SELECT qid, rank, vec_id, round(cos, 4) AS cos FROM r WHERE rank <= ${run.k}
             |ORDER BY qid, rank""".stripMargin)
    }

  /** DuckDB replica of [[Bpe.encode]]'s distributed application from
    * the recorded segmentation dictionary (inlined as VALUES): word
    * explode in position order, dictionary join, per-doc ordered
    * reassembly — verifies everything downstream of the driver-side
    * merge loop (which BpeSpec pins to the published golden
    * example). */
  private def bpeEncodeOracle: Map[String, String] =
    Bpe.recordedEncodeRun("bpe_encode") match {
      case None => Map.empty
      case Some(seg) =>
        val values = seg.map { case (w, p, n) => s"('$w', '$p', ${n}::BIGINT)" }
          .mkString(",\n    ")
        Map("bpe_encode" ->
          s"""$toksCte,
             |seg(word, pieces, n_pieces) AS (VALUES
             |    $values
             |), ex AS (
             |  SELECT doc_id,
             |    unnest(list_transform(range(1, len(tokens) + 1),
             |      i -> struct_pack(pos := i, word := tokens[i])), recursive := true)
             |  FROM toks
             |), j AS (
             |  SELECT ex.doc_id, ex.pos, seg.pieces, seg.n_pieces
             |  FROM ex JOIN seg USING (word)
             |)
             |SELECT doc_id, CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
             |  md5(string_agg(pieces, ' ' ORDER BY pos)) AS pieces_md5
             |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    }

  /** DuckDB replica of [[Similarity.semDedup]] from the recorded
    * centroids: assignment (first-min cell), then an EXISTS over
    * same-cell smaller-id near-duplicates at the recorded
    * threshold. */
  private def semDedupOracle: Map[String, String] =
    Similarity.recordedSemRun("dedup_semantic") match {
      case None => Map.empty
      case Some(run) =>
        val values = run.centroids.zipWithIndex.map { case (c, i) =>
          val cc = c.foldLeft(0.0)((acc, x) => acc + x * x)
          s"($i, [${c.mkString(", ")}]::DOUBLE[], $cc)"
        }.mkString(",\n    ")
        Map("dedup_semantic" ->
          s"""$embCte,
             |cents(i, c, cc) AS (VALUES
             |    $values
             |), sc AS (
             |  SELECT e.vec_id, cents.i,
             |    cents.cc - 2 * list_sum(list_transform(range(1, ${run.dim + 1}), j -> e.v[j] * cents.c[j])) AS d
             |  FROM e, cents
             |), cells AS (
             |  SELECT vec_id, i AS cell FROM (
             |    SELECT vec_id, i, row_number() OVER (PARTITION BY vec_id ORDER BY d, i) AS rn FROM sc)
             |  WHERE rn = 1
             |)
             |SELECT c.vec_id, c.cell::BIGINT AS cell,
             |  EXISTS (
             |    SELECT 1 FROM cells c2
             |    JOIN e e2 ON e2.vec_id = c2.vec_id
             |    JOIN e e1 ON e1.vec_id = c.vec_id
             |    WHERE c2.cell = c.cell AND c2.vec_id < c.vec_id
             |      AND list_cosine_similarity(e2.v, e1.v) >= ${run.threshold}
             |  ) AS dropped
             |FROM cells c ORDER BY c.vec_id""".stripMargin)
    }

  /** The classifier oracle scores every doc with the RECORDED fitted
    * weights (features + label recomputed independently in SQL; the
    * scoring association mirrors the Column reduceLeft exactly). */
  private def lrOracle: Map[String, String] =
    Curation.recordedLrRun("quality_classifier") match {
      case None => Map.empty
      case Some(run) =>
        val Seq(b0, b1, b2, b3) = run.beta.toList
        Map("quality_classifier" ->
          s"""$toksCte,
             |f AS (
             |  SELECT doc_id,
             |    CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
             |    round_even((len(list_distinct(tokens))::DOUBLE / greatest(len(tokens), 1)) * 1e4, 0) / 1e4 AS f1,
             |    round_even((len(list_filter(tokens, x -> list_contains(['the','and','of','to','in','is','that','it','was','for'], x)))::DOUBLE
             |      / greatest(len(tokens), 1)) * 1e4, 0) / 1e4 AS f2,
             |    round_even((coalesce(list_sum(list_transform(tokens, x -> length(x))), 0)::DOUBLE
             |      / greatest(len(tokens), 1)) * 1e4, 0) / 1e4 AS f3
             |  FROM toks
             |)
             |SELECT doc_id, CAST(y AS BIGINT) AS label,
             |  round_even((1.0 / (1.0 + exp(-($b0 + f1 * ($b1) + f2 * ($b2) + f3 * ($b3))))) * 1e4, 0) / 1e4 AS score
             |FROM f ORDER BY doc_id""".stripMargin)
    }

  /** Static oracles + the runtime-generated IVF and classifier
    * oracles. Must be read AFTER the queries have run (Verify's dump
    * order) for ann_ivf / quality_classifier to be included. */
  def oracles: Map[String, String] =
    staticOracles ++ ivfOracle ++ ivfPqOracle ++ semDedupOracle ++
      bpeEncodeOracle ++ lrOracle ++ Map(
        "link_pagerank_converged" ->
          pagerankConvergedSql(1e-6, 8, 0.85, None),
        "link_pagerank_personalized" ->
          pagerankConvergedSql(1e-6, 8, 0.85, Some(Seq("ex0.com", "ex1.com"))),
        // page graph mixes slower (3908 nodes at sf0.1 converge at
        // iteration 11) — maxIter 12 bounds the unroll
        "link_pagerank_pages_converged" ->
          pagerankConvergedSql(1e-6, 12, 0.85, None,
            rawEdges = pageRawEdgesSql, outName = "url"),
        "link_pagerank_pages_personalized" ->
          pagerankConvergedSql(1e-6, 12, 0.85,
            Some(Seq("http://www.ex0.com/p/0", "http://www.ex1.com/p/1?id=1")),
            rawEdges = pageRawEdgesSql, outName = "url"),
        // the WARC round trip must reproduce the synthetic-bridge
        // answers exactly — same oracles, by construction
        "warc_url_dedup" -> staticOracles("dedup_url"),
        "warc_domain_stats" -> staticOracles("domain_stats"),
        "link_hits" -> hitsSql(3),
        "link_hits_pages" ->
          hitsSql(3, rawEdges = pageRawEdgesSql, outName = "url"))

  /** Unrolled HITS oracle: per iteration an authority half-step
    * (fold over in-edges in src order, missing nodes 0, L1-normalize
    * by the dom-ordered total) then the hub half-step with the ends
    * swapped — exactly [[Urls.domainHits]]'s arithmetic. */
  private def hitsSql(iterations: Int,
      rawEdges: String = domainRawEdgesSql,
      outName: String = "dom"): String = {
    val head =
      s"""u AS (SELECT doc_id, doc_id // 2 AS pg FROM documents),
         |raw_edges AS ($rawEdges),
         |e AS MATERIALIZED (SELECT src, dst, count(*) AS cnt FROM raw_edges GROUP BY 1, 2),
         |doms AS MATERIALIZED (SELECT src AS dom FROM e UNION SELECT dst FROM e),
         |n AS (SELECT count(*) AS nd FROM doms),
         |h0 AS MATERIALIZED (SELECT dom, 1.0 / nd AS v FROM doms, n)""".stripMargin
    def half(out: String, in: String, prev: String, name: String): String =
      s"""${name}r AS (SELECT dom, list_sum(list(bs ORDER BY bk)) AS v FROM (
         |  SELECT e.$out AS dom, substr(md5(e.$in), 1, 2) AS bk,
         |    list_sum(list(e.cnt * $prev.v ORDER BY e.$in)) AS bs
         |  FROM e JOIN $prev ON $prev.dom = e.$in GROUP BY 1, 2) ${name}rz GROUP BY dom),
         |${name}f AS MATERIALIZED (SELECT doms.dom, coalesce(${name}r.v, 0.0) AS v
         |  FROM doms LEFT JOIN ${name}r USING (dom)),
         |${name}t AS (SELECT list_sum(list(s ORDER BY bk)) AS t FROM (
         |  SELECT substr(md5(dom), 1, 2) AS bk, list_sum(list(v ORDER BY dom)) AS s
         |  FROM ${name}f GROUP BY 1) ${name}z),
         |$name AS MATERIALIZED (SELECT dom, v / (SELECT t FROM ${name}t) AS v FROM ${name}f)""".stripMargin
    val iters = (1 to iterations).flatMap { k =>
      Seq(half("dst", "src", s"h${k - 1}", s"a$k"),
        half("src", "dst", s"a$k", s"h$k"))
    }
    (Seq(head) ++ iters).mkString("WITH ", ",\n", "") +
      s"""
         |SELECT h$iterations.dom AS $outName,
         |  round(h$iterations.v * 1e6, 0) / 1e6 AS hub,
         |  round(a$iterations.v * 1e6, 0) / 1e6 AS authority
         |FROM h$iterations JOIN a$iterations USING (dom) ORDER BY $outName""".stripMargin
  }

  /** Unrolled convergence-stopped PageRank oracle: maxIter iteration
    * blocks (contribution fold in src order, rank rebuild over the
    * full node set, L1 delta folded in dom order — each step the
    * exact arithmetic [[Urls.pageRankUntil]] executes), then the
    * FIRST iteration whose delta dropped below tol is selected as the
    * answer, replaying the engine's stop rule. MATERIALIZED CTEs:
    * DuckDB inlines multi-referenced CTEs by default, which is
    * exponential over a chained unroll. */
  /** The generator-arithmetic edge tables (rely on the `u` CTE). */
  private def domainRawEdgesSql: String =
    """
      |  SELECT 'ex' || (pg % 16) || '.com' AS src,
      |    'ex' || ((((doc_id*7+3) % 1024) * ((doc_id*7+3) % 1024)) % 16) || '.com' AS dst FROM u
      |  UNION ALL
      |  SELECT 'ex' || (pg % 16) || '.com',
      |    'ex' || (((doc_id*13+5) % 1024) % 16) || '.com' FROM u""".stripMargin

  private def pageRawEdgesSql: String =
    """
      |  SELECT
      |    'http://www.ex' || (pg % 16) || '.com/p/' || pg ||
      |      (CASE WHEN pg % 2 = 1 THEN '?id=' || pg ELSE '' END) AS src,
      |    'http://www.ex' || ((((doc_id*7+3) % 1024) * ((doc_id*7+3) % 1024)) % 16) ||
      |      '.com/p/' || ((doc_id*7+3) % 1024) AS dst
      |  FROM u
      |  UNION ALL
      |  SELECT
      |    'http://www.ex' || (pg % 16) || '.com/p/' || pg ||
      |      (CASE WHEN pg % 2 = 1 THEN '?id=' || pg ELSE '' END),
      |    'http://www.ex' || (((doc_id*13+5) % 1024) % 16) ||
      |      '.com/p/' || ((doc_id*13+5) % 1024)
      |  FROM u""".stripMargin

  private def pagerankConvergedSql(tol: Double, maxIter: Int,
      damping: Double, seeds: Option[Seq[String]],
      rawEdges: String = domainRawEdgesSql,
      outName: String = "dom"): String = {
    val (r0, base) = seeds match {
      case Some(ss) =>
        val inList = ss.map(s => s"'$s'").mkString(", ")
        val p = 1.0 / ss.size
        (s"SELECT dom, (CASE WHEN dom IN ($inList) THEN $p ELSE 0.0 END) AS rank FROM doms",
          s"(1.0 - $damping) * (CASE WHEN doms.dom IN ($inList) THEN $p ELSE 0.0 END)")
      case None =>
        ("SELECT dom, 1.0 / nd AS rank FROM doms, n",
          s"(SELECT (1.0 - $damping) / nd FROM n)")
    }
    val head =
      s"""u AS (SELECT doc_id, doc_id // 2 AS pg FROM documents),
         |raw_edges AS ($rawEdges),
         |edges AS (SELECT src, dst, count(*) AS cnt FROM raw_edges GROUP BY 1, 2),
         |outdeg AS (SELECT src, sum(cnt) AS out FROM edges GROUP BY 1),
         |e AS MATERIALIZED (SELECT edges.src, dst, cnt::DOUBLE / out AS w FROM edges JOIN outdeg USING (src)),
         |doms AS MATERIALIZED (SELECT src AS dom FROM e UNION SELECT dst FROM e),
         |n AS (SELECT count(*) AS nd FROM doms),
         |r0 AS MATERIALIZED ($r0)""".stripMargin
    val iters = (1 to maxIter).map { k =>
      s"""c$k AS (SELECT dom, list_sum(list(bs ORDER BY bk)) AS m FROM (
         |  SELECT e.dst AS dom, substr(md5(e.src), 1, 2) AS bk,
         |    list_sum(list(r${k - 1}.rank * e.w ORDER BY e.src)) AS bs
         |  FROM e JOIN r${k - 1} ON r${k - 1}.dom = e.src GROUP BY 1, 2) zc$k GROUP BY dom),
         |r$k AS MATERIALIZED (SELECT doms.dom, $base + $damping * coalesce(c$k.m, 0.0) AS rank
         |  FROM doms LEFT JOIN c$k USING (dom)),
         |d$k AS (SELECT list_sum(list(s ORDER BY bk)) AS d FROM (
         |  SELECT substr(md5(dom), 1, 2) AS bk,
         |    list_sum(list(abs(x.rank - y.rank) ORDER BY dom)) AS s
         |  FROM r$k x JOIN r${k - 1} y USING (dom) GROUP BY 1) z$k)""".stripMargin
    }
    val deltas = (1 to maxIter)
      .map(k => s"SELECT $k AS k, (SELECT d FROM d$k) AS delta")
      .mkString(" UNION ALL ")
    val tail =
      s"""deltas AS MATERIALIZED ($deltas),
         |pick AS (SELECT min(k) AS it FROM deltas WHERE delta < $tol),
         |fin AS MATERIALIZED (SELECT CAST(coalesce((SELECT it FROM pick), $maxIter) AS INTEGER) AS it)""".stripMargin
    val body = (1 to maxIter)
      .map(k => s"SELECT * FROM r$k WHERE (SELECT it FROM fin) = $k")
      .mkString(" UNION ALL ")
    (Seq(head) ++ iters ++ Seq(tail)).mkString("WITH ", ",\n", "") +
      s"""
         |SELECT dom AS $outName, round(rank * 1e6, 0) / 1e6 AS rank, (SELECT it FROM fin) AS n_iters
         |FROM ($body) fr ORDER BY $outName""".stripMargin
  }

  /** MinHash+LSH near-dup pairs (mirror of [[Dedup.minhashLsh]]) —
    * shared by the `dedup_minhash` oracle and, as a nested CTE, by
    * the `dedup_clusters` connected-components oracle. */
  /** Shared MinHash CTE prefix (toks → sh → sigs → bands), mirroring
    * Dedup's signature construction exactly. */
  private[graft] def minhashCtePrefix: String = {
    val p = Dedup.MinhashP
    val sigDefs = (0 until 16)
      .map(i => s"list_min(list_transform(hs, h -> (${Dedup.MinhashA(i)} * h + ${Dedup.MinhashB(i)}) % $p)) AS sig_$i")
      .mkString(",\n    ")
    val bandSelects = (0 until 4).map { b =>
      val cat = (0 until 4).map(r => s"sig_${b * 4 + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS bh FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""$toksCte,
       |sh AS (
       |  SELECT doc_id, ${shingleSql(3)} AS ss FROM toks WHERE len(tokens) >= 3
       |), sigs AS (
       |  SELECT doc_id, ss,
       |    $sigDefs
       |  FROM (SELECT doc_id, ss,
       |          list_transform(ss, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT % $p) AS hs
       |        FROM sh)
       |  WHERE len(ss) > 0
       |), bands AS (
       |  $bandSelects
       |)""".stripMargin
  }

  private def minhashPairsSql: String =
    s"""$minhashCtePrefix, cand AS (
       |  SELECT a.doc_id AS x, b.doc_id AS y
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |),
       |${jaccardTail(0.6)}""".stripMargin

  /** Recursive connected-components CTE chain over the MinHash pair
    * graph — shared by `dedup_clusters` and `dedup_keep`. */
  private def clusterCtes: String =
    s"""WITH RECURSIVE pairs AS (
       |  $minhashPairsSql
       |), edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION
       |  SELECT doc_b AS src, doc_a AS dst FROM pairs
       |), reach(id, r) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
       |)""".stripMargin

  /** Mirror of Curation.md5Bucket: deterministic [0, mod) bucket from
    * the md5 of the id's decimal string. */
  private def md5BucketSql(idExpr: String, mod: Int): String =
    s"(('0x' || substr(md5($idExpr::VARCHAR), 1, 8))::BIGINT % $mod)"

  /** Shared int8-quantization CTEs (mirror of Similarity.quantizeInt8):
    * scale = max|x|/127, codes = half-even(v/scale). */
  private val quantCte =
    """WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |), s AS (
      |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e
      |), qq AS (
      |  SELECT vec_id, v, scale,
      |    CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
      |         ELSE list_transform(v, x -> CAST(round_even(x / scale, 0) AS INTEGER))
      |    END AS q
      |  FROM s
      |)""".stripMargin

  private val staticOracles: Map[String, String] = Map(
    "emb_quantize" ->
      s"""$quantCte
         |SELECT vec_id,
         |  round_even((scale) * 1e6, 0) / 1e6 AS scale_r,
         |  md5(array_to_string(q, ',')) AS q_md5,
         |  coalesce(list_sum(list_transform(q, x -> abs(x))), 0)::BIGINT AS q_l1,
         |  round_even((list_max(list_transform(range(1, len(v) + 1),
         |    i -> abs(v[i] - q[i] * scale)))) * 1e6, 0) / 1e6 AS max_abs_err
         |FROM qq
         |ORDER BY vec_id""".stripMargin,

    "ann_quantized" ->
      s"""$quantCte, qn AS (
         |  SELECT vec_id, q,
         |    sqrt(list_sum(list_transform(q, x -> (x * x)::DOUBLE))) AS nrm
         |  FROM qq
         |  WHERE list_sum(list_transform(q, x -> (x * x)::DOUBLE)) > 0
         |), scored AS (
         |  SELECT b.vec_id AS qid, a.vec_id,
         |    list_sum(list_transform(range(1, len(a.q) + 1),
         |      i -> (a.q[i] * b.q[i])::DOUBLE)) / (a.nrm * b.nrm) AS cos
         |  FROM qn a, qn b
         |  WHERE b.vec_id < 5 AND a.vec_id <> b.vec_id
         |)
         |SELECT qid, rank, vec_id, round_even((cos) * 1e4, 0) / 1e4 AS cos
         |FROM (SELECT qid, vec_id, cos,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
         |      FROM scored) r
         |WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin,

    // grams compare as 60-bit md5-prefix hashes, mirroring
    // Curation.decontaminate's broadcast-dictionary representation;
    // list_distinct matches ShingleHashes' distinct-by-hash gram sets
    "decontaminate" ->
      s"""$toksCte,
         |sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(
         |      CASE WHEN len(tokens) >= 5 THEN ${shingleSql(5)} ELSE [] END,
         |      s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS ss
         |  FROM toks
         |), eval_grams AS (
         |  SELECT DISTINCT unnest(ss) AS g FROM sh WHERE doc_id % 20 = 0
         |), train AS (
         |  SELECT doc_id, ss FROM sh WHERE doc_id % 20 <> 0
         |), hits AS (
         |  SELECT t.doc_id, count(*) AS n_hit
         |  FROM (SELECT doc_id, unnest(ss) AS g FROM train) t
         |  JOIN eval_grams e USING (g)
         |  GROUP BY 1
         |)
         |SELECT t.doc_id, len(t.ss) AS n_grams, coalesce(h.n_hit, 0) AS n_hit,
         |  round_even((coalesce(h.n_hit, 0)::DOUBLE / greatest(len(t.ss), 1)) * 1e4, 0) / 1e4 AS contam_frac
         |FROM train t LEFT JOIN hits h USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // score is an exact decimal (tf * CAST(ln(N/df) AS DECIMAL(18,6)))
    // in both engines so rank ties resolve identically — see
    // Curation.keywordsTfidf
    "keywords_tfidf" ->
      s"""$toksCte,
         |tok AS (SELECT doc_id, unnest(tokens) AS term FROM toks),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df
         |       FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY 1),
         |scored AS (
         |  SELECT doc_id, term,
         |    CAST(tf AS DECIMAL(12,0)) *
         |      CAST(ln(CAST((SELECT count(*) FROM documents) AS DOUBLE) / df)
         |        AS DECIMAL(18,6)) AS score
         |  FROM tf JOIN df USING (term)
         |)
         |SELECT doc_id, rank, term, round_even((CAST(score AS DOUBLE)) * 1e4, 0) / 1e4 AS score
         |FROM (SELECT doc_id, term, score,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
         |      FROM scored) r
         |WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin,

    // gram hashes mirror ShingleHashes' 60-bit md5 prefixes; distinct
    // (gram, source) before the self-join, as in Curation.sourceOverlap
    "source_overlap" ->
      s"""$toksCte,
         |gs AS (
         |  SELECT DISTINCT source,
         |    unnest(list_transform(
         |      CASE WHEN len(tokens) >= 5 THEN ${shingleSql(5)} ELSE [] END,
         |      s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS g
         |  FROM (SELECT source, tokens FROM toks JOIN documents USING (doc_id))
         |)
         |SELECT a.source AS source_a, b.source AS source_b,
         |  count(*) AS n_shared_grams
         |FROM gs a JOIN gs b ON a.g = b.g AND a.source < b.source
         |GROUP BY 1, 2
         |ORDER BY 1, 2""".stripMargin,

    // per-token logprobs sum as DECIMAL(18,8) (order-independent);
    // see Curation.unigramLogprob
    "unigram_logprob" ->
      s"""$toksCte,
         |tok AS (SELECT doc_id, unnest(tokens) AS term FROM toks),
         |freq AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
         |lp AS (
         |  SELECT term,
         |    CAST(-ln(CAST(cnt AS DOUBLE) /
         |      CAST((SELECT sum(cnt) FROM freq) AS DOUBLE)) AS DECIMAL(18,8)) AS lp
         |  FROM freq
         |)
         |SELECT t.doc_id, count(*) AS n_tokens,
         |  round_even((CAST(sum(l.lp) AS DOUBLE) / count(*)) * 1e4, 0) / 1e4 AS mean_neg_logprob
         |FROM tok t JOIN lp l USING (term)
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,

    // add-one bigram LM: first token under the unigram MLE, the rest
    // under (c(prev,cur)+1)/(c(prev)+V); DECIMAL(18,8) per-token sums
    "bigram_logprob" ->
      s"""$toksCte,
         |tok AS (SELECT doc_id, unnest(tokens) AS term FROM toks),
         |freq AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
         |vstats AS (SELECT count(*) AS v, sum(cnt) AS total FROM freq),
         |bi AS (
         |  SELECT doc_id, unnest(list_transform(range(1, len(tokens)),
         |    i -> struct_pack(prev := tokens[i], cur := tokens[i + 1])),
         |    recursive := true)
         |  FROM toks WHERE len(tokens) >= 2
         |),
         |bfreq AS (SELECT prev, cur, count(*) AS bcnt FROM bi GROUP BY 1, 2),
         |blp AS (
         |  SELECT b.prev, b.cur,
         |    CAST(-ln(CAST(b.bcnt + 1 AS DOUBLE) /
         |      CAST(f.cnt + (SELECT v FROM vstats) AS DOUBLE)) AS DECIMAL(18,8)) AS lp
         |  FROM bfreq b JOIN freq f ON f.term = b.prev
         |),
         |firstlp AS (
         |  SELECT ft.doc_id,
         |    CAST(-ln(CAST(f.cnt AS DOUBLE) /
         |      CAST((SELECT total FROM vstats) AS DOUBLE)) AS DECIMAL(18,8)) AS lp
         |  FROM (SELECT doc_id, tokens[1] AS term FROM toks WHERE len(tokens) >= 1) ft
         |  JOIN freq f USING (term)
         |),
         |alllp AS (SELECT * FROM firstlp UNION ALL
         |          SELECT bi.doc_id, blp.lp FROM bi JOIN blp USING (prev, cur))
         |SELECT doc_id, count(*) AS n_tokens,
         |  round_even((CAST(sum(lp) AS DOUBLE) / count(*)) * 1e4, 0) / 1e4
         |    AS mean_neg_logprob_bigram
         |FROM alllp GROUP BY 1 ORDER BY 1""".stripMargin,

    // per-lang tercile thresholds fitted on the md5-bucket sample,
    // rounded to the shared 1e-4 half-even grid before the <=
    // comparisons; see Curation.ccnetBuckets. quantile_cont matches
    // Spark percentile (linear interpolation at p*(n-1)).
    "ccnet_buckets" ->
      s"""$toksCte,
         |tok AS (SELECT doc_id, unnest(tokens) AS term FROM toks),
         |freq AS (SELECT term, count(*) AS cnt FROM tok GROUP BY 1),
         |lp AS (
         |  SELECT term,
         |    CAST(-ln(CAST(cnt AS DOUBLE) /
         |      CAST((SELECT sum(cnt) FROM freq) AS DOUBLE)) AS DECIMAL(18,8)) AS lp
         |  FROM freq
         |),
         |sc AS (
         |  SELECT t.doc_id,
         |    round_even((CAST(sum(l.lp) AS DOUBLE) / count(*)) * 1e4, 0) / 1e4 AS s
         |  FROM tok t JOIN lp l USING (term)
         |  GROUP BY 1
         |),
         |sl AS (SELECT sc.doc_id, d.lang, sc.s FROM sc JOIN documents d USING (doc_id)),
         |thr AS (
         |  SELECT lang,
         |    round_even(quantile_cont(s, ${1.0 / 3}) * 1e4, 0) / 1e4 AS t1,
         |    round_even(quantile_cont(s, ${2.0 / 3}) * 1e4, 0) / 1e4 AS t2
         |  FROM sl WHERE ${md5BucketSql("doc_id", 100)} < 20
         |  GROUP BY 1
         |)
         |SELECT sl.doc_id, sl.lang, sl.s AS mean_neg_logprob,
         |  CASE WHEN sl.s <= t.t1 THEN 'head'
         |       WHEN sl.s <= t.t2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM sl JOIN thr t USING (lang)
         |ORDER BY sl.doc_id""".stripMargin,

    // per-source token shares + downsample-to-uniform-target rates;
    // see Curation.mixWeights
    "mix_weights" ->
      s"""$toksCte,
         |ps AS (
         |  SELECT d.source, count(*) AS n_docs, sum(len(t.tokens))::BIGINT AS n_tokens
         |  FROM toks t JOIN documents d USING (doc_id)
         |  GROUP BY 1
         |), tot AS (SELECT sum(n_tokens) AS total, count(*) AS n_sources FROM ps)
         |SELECT source, n_docs, n_tokens,
         |  round_even((CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE)) * 1e6, 0) / 1e6 AS natural_share,
         |  round_even(least(1.0,
         |    (CAST(total AS DOUBLE) / CAST(n_sources AS DOUBLE)) / CAST(n_tokens AS DOUBLE)) * 1e6, 0) / 1e6 AS rate
         |FROM ps, tot
         |ORDER BY source""".stripMargin,

    // the α-power normalizer is a float sum: replicate the two-level
    // md5-bucketed ordered fold (Urls.orderedGlobalSum) term-for-term,
    // and spell n^α as exp(α·ln n) exactly like the Spark side (libm
    // pow is not correctly-rounded; exp/ln parity is already proven
    // by the logprob/classifier oracles)
    "mix_temperature" ->
      s"""$toksCte,
         |ps AS (
         |  SELECT d.source, count(*) AS n_docs, sum(len(t.tokens))::BIGINT AS n_tokens
         |  FROM toks t JOIN documents d USING (doc_id)
         |  GROUP BY 1
         |), w AS (
         |  SELECT *, exp(0.7 * ln(CAST(n_tokens AS DOUBLE))) AS raw_w FROM ps
         |), dz AS (
         |  SELECT substr(md5(source), 1, 2) AS bk,
         |    list_sum(list(raw_w ORDER BY source)) AS s
         |  FROM w GROUP BY 1
         |), dn AS (SELECT list_sum(list(s ORDER BY bk)) AS d FROM dz),
         |tot AS (SELECT sum(n_tokens) AS total FROM ps)
         |SELECT source, n_docs, n_tokens,
         |  round_even(raw_w / (SELECT d FROM dn) * 1e6, 0) / 1e6 AS weight,
         |  round_even(raw_w / (SELECT d FROM dn) * (SELECT total FROM tot)
         |    / n_tokens * 1e4, 0) / 1e4 AS epochs_at_budget
         |FROM w
         |ORDER BY source""".stripMargin,

    // pii_scrub with the patterns firing: the enrichment is pure
    // doc_id arithmetic rebuilt here with `||`, then the exact
    // pii_scrub projection over it
    "pii_scrub_live" -> {
      val enriched = "text || ' contact user' || doc_id || '@mail' || " +
        "(doc_id % 7) || '.example.com' || " +
        "CASE WHEN doc_id % 2 = 0 THEN ' cc admin' || doc_id || '@corp.example.org' ELSE '' END || " +
        "CASE WHEN doc_id % 5 <> 0 THEN ' or call +1-555-' || " +
        "lpad(CAST((doc_id * 37) % 10000 AS VARCHAR), 4, '0') ELSE '' END || " +
        "' from 10.' || (doc_id % 256) || '.' || ((doc_id * 3) % 256) || '.' || (doc_id % 254 + 1)"
      val redacted = Curation.PiiPatterns.foldLeft("etext") { case (e, (_, re, tok)) =>
        s"regexp_replace($e, '$re', '$tok', 'g')"
      }
      val counts = Curation.PiiPatterns
        .map { case (name, re, _) =>
          s"len(regexp_extract_all(etext, '$re'))::BIGINT AS n_$name"
        }
        .mkString(",\n         |  ")
      s"""WITH enriched AS (SELECT doc_id, $enriched AS etext FROM documents)
         |SELECT doc_id,
         |  $counts,
         |  md5($redacted) AS fp_redacted,
         |  length($redacted)::BIGINT AS n_chars_redacted
         |FROM enriched
         |ORDER BY doc_id""".stripMargin
    },

    // patterns come from the same Curation.PiiPatterns table the
    // Spark side folds over (counts on the raw text, replacements in
    // declaration order; DuckDB needs the 'g' flag for global replace)
    "pii_scrub" -> {
      val redacted = Curation.PiiPatterns.foldLeft("text") { case (e, (_, re, tok)) =>
        s"regexp_replace($e, '$re', '$tok', 'g')"
      }
      val counts = Curation.PiiPatterns
        .map { case (name, re, _) =>
          s"len(regexp_extract_all(text, '$re'))::BIGINT AS n_$name"
        }
        .mkString(",\n         |  ")
      s"""SELECT doc_id,
         |  $counts,
         |  md5($redacted) AS fp_redacted,
         |  length($redacted)::BIGINT AS n_chars_redacted
         |FROM documents
         |ORDER BY doc_id""".stripMargin
    },

    "sample_stratified" -> {
      val rateCase = Curation.SampleRates
        .map { case (l, r) => s"WHEN lang = '$l' THEN $r" }
        .mkString("CASE ", " ", " ELSE 100 END")
      s"""SELECT doc_id, lang, ${md5BucketSql("doc_id", 100)} AS bucket
         |FROM documents
         |WHERE ${md5BucketSql("doc_id", 100)} < $rateCase
         |ORDER BY doc_id""".stripMargin
    },

    "split_assign" -> {
      val caseChain = Curation.SplitBounds
        .map { case (name, bound) =>
          s"WHEN ${md5BucketSql("source", 100)} < $bound THEN '$name'"
        }
        .mkString("CASE ", " ", " ELSE 'test' END")
      s"""SELECT doc_id, source, $caseChain AS split
         |FROM documents
         |ORDER BY doc_id""".stripMargin
    },

    "chunk_documents" ->
      s"""$toksCte
         |SELECT doc_id, CAST(start / 24 AS BIGINT) AS chunk_idx,
         |  CAST(len(tokens[start + 1 : least(start + 32, len(tokens))]) AS BIGINT) AS n_tokens,
         |  array_to_string(tokens[start + 1 : least(start + 32, len(tokens))], ' ') AS chunk_text
         |FROM (
         |  SELECT doc_id, tokens,
         |    unnest(range(0, greatest(len(tokens), 1), 24)) AS start
         |  FROM toks
         |)
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    "bpe_roundtrip" ->
      s"""$toksCte
         |SELECT doc_id, array_to_string(tokens, ' ') AS decoded
         |FROM toks WHERE len(tokens) > 0
         |ORDER BY doc_id""".stripMargin,

    "select_importance" -> {
      val enList = TextAnalysis.LangProfiles.toMap.apply("en")
        .map(w => s"'$w'").mkString(", ")
      s"""$toksCte
         |SELECT doc_id,
         |  round_even((least(n_tokens / 100.0, 1.0) * (1 - stop_ratio) * ttr) * 1e4, 0) / 1e4 AS quality,
         |  bucket
         |FROM (
         |  SELECT doc_id,
         |    len(tokens)::BIGINT AS n_tokens,
         |    round_even((len(list_distinct(tokens))::DOUBLE / greatest(len(tokens), 1)) * 1e4, 0) / 1e4 AS ttr,
         |    round_even((len(list_filter(tokens, x -> list_contains([$enList], x)))::DOUBLE
         |      / greatest(len(tokens), 1)) * 1e4, 0) / 1e4 AS stop_ratio,
         |    ${md5BucketSql("doc_id", 10000)} AS bucket
         |  FROM toks
         |)
         |WHERE bucket < round_even((least(n_tokens / 100.0, 1.0) * (1 - stop_ratio) * ttr) * 1e4, 0) / 1e4 * 10000
         |ORDER BY doc_id""".stripMargin
    },

    "curate_manifest" -> {
      val langs = TextAnalysis.LangProfiles.map(_._1)
      val scores = langProfileSql.map(_._2).mkString(",\n    ")
      val caseChain = langs.init.map { l =>
        val conds = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString("\n    ")
      val splitCase = Curation.SplitBounds
        .map { case (name, bound) =>
          s"WHEN ${md5BucketSql("source", 100)} < $bound THEN '$name'"
        }
        .mkString("CASE ", " ", " ELSE 'test' END")
      val enList = TextAnalysis.LangProfiles.toMap.apply("en")
        .map(w => s"'$w'").mkString(", ")
      s"""WITH base AS (
         |  SELECT doc_id, text, source,
         |    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS tokens,
         |    min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
         |  FROM documents
         |)
         |SELECT doc_id,
         |  CASE
         |    $caseChain
         |    ELSE '${langs.last}' END AS pred_lang,
         |  split, n_tokens,
         |  round_even((least(n_tokens / 100.0, 1.0) * (1 - stop_ratio) * ttr) * 1e4, 0) / 1e4 AS quality
         |FROM (
         |  SELECT doc_id,
         |    $scores,
         |    $splitCase AS split,
         |    len(tokens)::BIGINT AS n_tokens,
         |    round_even((len(list_distinct(tokens))::DOUBLE / greatest(len(tokens), 1)) * 1e4, 0) / 1e4 AS ttr,
         |    round_even((len(list_filter(tokens, x -> list_contains([$enList], x)))::DOUBLE
         |      / greatest(len(tokens), 1)) * 1e4, 0) / 1e4 AS stop_ratio
         |  FROM base WHERE doc_id = canonical_id
         |)
         |WHERE n_tokens >= 16
         |  AND round_even((least(n_tokens / 100.0, 1.0) * (1 - stop_ratio) * ttr) * 1e4, 0) / 1e4 >= 0.05
         |ORDER BY doc_id""".stripMargin
    },

    "pack_sequences" ->
      s"""$toksCte
         |SELECT doc_id, lang, shard, n_tokens, start_offset,
         |  CAST(floor(start_offset / 256) AS BIGINT) AS start_pack,
         |  CAST(floor((start_offset + greatest(n_tokens, 1) - 1) / 256) AS BIGINT) AS end_pack
         |FROM (
         |  SELECT doc_id, lang, shard, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      - n_tokens AS start_offset
         |  FROM (
         |    SELECT doc_id, lang, ${md5BucketSql("doc_id", 4)} AS shard,
         |      len(tokens)::BIGINT AS n_tokens
         |    FROM toks
         |  )
         |)
         |ORDER BY doc_id""".stripMargin,

    "vocab_coverage" ->
      s"""$toksCte,
         |vocab AS (
         |  SELECT term FROM (
         |    SELECT term, count(*) AS df
         |    FROM (SELECT doc_id, unnest(list_distinct(tokens)) AS term FROM toks)
         |    GROUP BY term
         |  )
         |  ORDER BY df DESC, term
         |  LIMIT 20
         |), v AS (SELECT list(term) AS vlist FROM vocab)
         |SELECT doc_id, len(tokens)::BIGINT AS n_tokens,
         |  (len(tokens) - len(list_filter(tokens, x -> list_contains(v.vlist, x))))::BIGINT AS n_oov,
         |  round_even(((len(tokens) - len(list_filter(tokens, x -> list_contains(v.vlist, x))))::DOUBLE
         |    / greatest(len(tokens), 1)) * 1e4, 0) / 1e4 AS oov_frac
         |FROM toks, v
         |ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """SELECT doc_id,
        |  min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
        |  count(*) OVER (PARTITION BY md5(text)) AS group_size
        |FROM documents ORDER BY doc_id""".stripMargin,

    "dedup_norm" ->
      s"""$toksCte
         |SELECT doc_id,
         |  min(doc_id) OVER (PARTITION BY h) AS canonical_id,
         |  count(*) OVER (PARTITION BY h) AS group_size
         |FROM (SELECT doc_id, md5(array_to_string(list_sort(list_distinct(tokens)), ' ')) AS h FROM toks)
         |ORDER BY doc_id""".stripMargin,

    // the oracle states the expected CANONICAL url from the
    // generator arithmetic (clean form of page d/2) — the engine's
    // regexp normalizer must reproduce it character-exact for both
    // the clean and the dirty variant
    "dedup_url" ->
      """WITH u AS (SELECT doc_id, doc_id // 2 AS pg FROM documents),
        |c AS (SELECT doc_id,
        |  'http://www.ex' || (pg % 16) || '.com/p/' || pg ||
        |    (CASE WHEN pg % 2 = 1 THEN '?id=' || pg ELSE '' END) AS canonical
        |  FROM u)
        |SELECT doc_id, canonical,
        |  min(doc_id) OVER (PARTITION BY canonical) AS canonical_id,
        |  count(*) OVER (PARTITION BY canonical) AS group_size
        |FROM c ORDER BY doc_id""".stripMargin,

    // 3 power iterations unrolled; per-target contributions folded in
    // src order (list ORDER BY src -> list_sum), mirroring the
    // engine's sort_array + ordered aggregate exactly
    // page-level PageRank: same 3-iteration unroll and ordered folds
    // as link_pagerank, nodes = canonical page URLs from the
    // generator arithmetic (clean form; dirty outlink variants
    // normalize to the same strings), targets without crawled pages
    // dangle. MATERIALIZED: the chained rank CTEs are multi-
    // referenced, which DuckDB would otherwise inline exponentially.
    "link_pagerank_pages" ->
      """WITH u AS (SELECT doc_id, doc_id // 2 AS pg FROM documents),
        |raw_edges AS (
        |  SELECT
        |    'http://www.ex' || (pg % 16) || '.com/p/' || pg ||
        |      (CASE WHEN pg % 2 = 1 THEN '?id=' || pg ELSE '' END) AS src,
        |    'http://www.ex' || ((((doc_id*7+3) % 1024) * ((doc_id*7+3) % 1024)) % 16) ||
        |      '.com/p/' || ((doc_id*7+3) % 1024) AS dst
        |  FROM u
        |  UNION ALL
        |  SELECT
        |    'http://www.ex' || (pg % 16) || '.com/p/' || pg ||
        |      (CASE WHEN pg % 2 = 1 THEN '?id=' || pg ELSE '' END),
        |    'http://www.ex' || (((doc_id*13+5) % 1024) % 16) ||
        |      '.com/p/' || ((doc_id*13+5) % 1024)
        |  FROM u),
        |edges AS (SELECT src, dst, count(*) AS cnt FROM raw_edges GROUP BY 1, 2),
        |outdeg AS (SELECT src, sum(cnt) AS out FROM edges GROUP BY 1),
        |e AS MATERIALIZED (SELECT edges.src, dst, cnt::DOUBLE / out AS w FROM edges JOIN outdeg USING (src)),
        |doms AS MATERIALIZED (SELECT src AS dom FROM e UNION SELECT dst FROM e),
        |n AS (SELECT count(*) AS nd FROM doms),
        |r0 AS MATERIALIZED (SELECT dom, 1.0 / nd AS rank FROM doms, n),
        |c1 AS (SELECT dom, list_sum(list(bs ORDER BY bk)) AS m FROM (
        |  SELECT e.dst AS dom, substr(md5(e.src), 1, 2) AS bk,
        |    list_sum(list(r0.rank * e.w ORDER BY e.src)) AS bs
        |  FROM e JOIN r0 ON r0.dom = e.src GROUP BY 1, 2) zc1 GROUP BY dom),
        |r1 AS MATERIALIZED (SELECT doms.dom,
        |  (SELECT (1.0 - 0.85) / nd FROM n) + 0.85 * coalesce(c1.m, 0.0) AS rank
        |  FROM doms LEFT JOIN c1 USING (dom)),
        |c2 AS (SELECT dom, list_sum(list(bs ORDER BY bk)) AS m FROM (
        |  SELECT e.dst AS dom, substr(md5(e.src), 1, 2) AS bk,
        |    list_sum(list(r1.rank * e.w ORDER BY e.src)) AS bs
        |  FROM e JOIN r1 ON r1.dom = e.src GROUP BY 1, 2) zc2 GROUP BY dom),
        |r2 AS MATERIALIZED (SELECT doms.dom,
        |  (SELECT (1.0 - 0.85) / nd FROM n) + 0.85 * coalesce(c2.m, 0.0) AS rank
        |  FROM doms LEFT JOIN c2 USING (dom)),
        |c3 AS (SELECT dom, list_sum(list(bs ORDER BY bk)) AS m FROM (
        |  SELECT e.dst AS dom, substr(md5(e.src), 1, 2) AS bk,
        |    list_sum(list(r2.rank * e.w ORDER BY e.src)) AS bs
        |  FROM e JOIN r2 ON r2.dom = e.src GROUP BY 1, 2) zc3 GROUP BY dom),
        |r3 AS (SELECT doms.dom,
        |  (SELECT (1.0 - 0.85) / nd FROM n) + 0.85 * coalesce(c3.m, 0.0) AS rank
        |  FROM doms LEFT JOIN c3 USING (dom))
        |SELECT dom AS url, round(rank * 1e6, 0) / 1e6 AS rank FROM r3 ORDER BY url""".stripMargin,

    "link_pagerank" ->
      """WITH u AS (SELECT doc_id, doc_id // 2 AS pg FROM documents),
        |raw_edges AS (
        |  SELECT 'ex' || (pg % 16) || '.com' AS src,
        |    'ex' || ((((doc_id*7+3) % 1024) * ((doc_id*7+3) % 1024)) % 16) || '.com' AS dst FROM u
        |  UNION ALL
        |  SELECT 'ex' || (pg % 16) || '.com',
        |    'ex' || (((doc_id*13+5) % 1024) % 16) || '.com' FROM u),
        |edges AS (SELECT src, dst, count(*) AS cnt FROM raw_edges GROUP BY 1, 2),
        |outdeg AS (SELECT src, sum(cnt) AS out FROM edges GROUP BY 1),
        |e AS (SELECT edges.src, dst, cnt::DOUBLE / out AS w FROM edges JOIN outdeg USING (src)),
        |doms AS (SELECT src AS dom FROM e UNION SELECT dst FROM e),
        |n AS (SELECT count(*) AS nd FROM doms),
        |r0 AS (SELECT dom, 1.0 / nd AS rank FROM doms, n),
        |c1 AS (SELECT dom, list_sum(list(bs ORDER BY bk)) AS m FROM (
        |  SELECT e.dst AS dom, substr(md5(e.src), 1, 2) AS bk,
        |    list_sum(list(r0.rank * e.w ORDER BY e.src)) AS bs
        |  FROM e JOIN r0 ON r0.dom = e.src GROUP BY 1, 2) zc1 GROUP BY dom),
        |r1 AS (SELECT doms.dom,
        |  (SELECT (1.0 - 0.85) / nd FROM n) + 0.85 * coalesce(c1.m, 0.0) AS rank
        |  FROM doms LEFT JOIN c1 USING (dom)),
        |c2 AS (SELECT dom, list_sum(list(bs ORDER BY bk)) AS m FROM (
        |  SELECT e.dst AS dom, substr(md5(e.src), 1, 2) AS bk,
        |    list_sum(list(r1.rank * e.w ORDER BY e.src)) AS bs
        |  FROM e JOIN r1 ON r1.dom = e.src GROUP BY 1, 2) zc2 GROUP BY dom),
        |r2 AS (SELECT doms.dom,
        |  (SELECT (1.0 - 0.85) / nd FROM n) + 0.85 * coalesce(c2.m, 0.0) AS rank
        |  FROM doms LEFT JOIN c2 USING (dom)),
        |c3 AS (SELECT dom, list_sum(list(bs ORDER BY bk)) AS m FROM (
        |  SELECT e.dst AS dom, substr(md5(e.src), 1, 2) AS bk,
        |    list_sum(list(r2.rank * e.w ORDER BY e.src)) AS bs
        |  FROM e JOIN r2 ON r2.dom = e.src GROUP BY 1, 2) zc3 GROUP BY dom),
        |r3 AS (SELECT doms.dom,
        |  (SELECT (1.0 - 0.85) / nd FROM n) + 0.85 * coalesce(c3.m, 0.0) AS rank
        |  FROM doms LEFT JOIN c3 USING (dom))
        |SELECT dom, round(rank * 1e6, 0) / 1e6 AS rank FROM r3 ORDER BY dom""".stripMargin,

    "domain_stats" ->
      """WITH u AS (SELECT doc_id, doc_id // 2 AS pg FROM documents),
        |pages AS (SELECT doc_id, 'ex' || (pg % 16) || '.com' AS dom,
        |  'http://www.ex' || (pg % 16) || '.com/p/' || pg ||
        |    (CASE WHEN pg % 2 = 1 THEN '?id=' || pg ELSE '' END) AS cu FROM u),
        |docagg AS (SELECT dom, count(*) AS n_docs, count(DISTINCT cu) AS n_pages
        |  FROM pages GROUP BY dom),
        |edges AS (
        |  SELECT dom AS src_dom,
        |    'ex' || ((((doc_id*7+3) % 1024) * ((doc_id*7+3) % 1024)) % 16) || '.com' AS dst_dom FROM pages
        |  UNION ALL
        |  SELECT dom, 'ex' || (((doc_id*13+5) % 1024) % 16) || '.com' FROM pages
        |),
        |outagg AS (SELECT src_dom AS dom, count(*) AS out_degree FROM edges GROUP BY 1),
        |inagg AS (SELECT dst_dom AS dom, count(*) AS in_degree FROM edges GROUP BY 1)
        |SELECT d.dom, d.n_docs, d.n_pages,
        |  round((1 - n_pages::DOUBLE / n_docs) * 1e4, 0) / 1e4 AS dup_rate,
        |  coalesce(o.out_degree, 0) AS out_degree, coalesce(i.in_degree, 0) AS in_degree
        |FROM docagg d LEFT JOIN outagg o USING (dom) LEFT JOIN inagg i USING (dom)
        |ORDER BY d.dom""".stripMargin,

    "dedup_minhash" -> minhashPairsSql,

    // TRAIN x EVAL band-bucket candidates, verified 3-shingle Jaccard,
    // grouped per contaminated train doc; see Dedup.crossDecontaminate
    "decontaminate_fuzzy" ->
      s"""$minhashCtePrefix, cand AS (
         |  SELECT a.doc_id AS train_id, b.doc_id AS eval_id
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
         |  WHERE a.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
         |  GROUP BY 1, 2
         |), j AS (
         |  SELECT train_id, eval_id,
         |    len(list_intersect(sa.ss, sb.ss))::DOUBLE /
         |      len(list_distinct(sa.ss || sb.ss)) AS jaccard
         |  FROM cand
         |  JOIN sh sa ON sa.doc_id = cand.train_id
         |  JOIN sh sb ON sb.doc_id = cand.eval_id
         |)
         |SELECT train_id, count(*)::BIGINT AS n_eval_matches,
         |  round_even(max(jaccard) * 1e4, 0) / 1e4 AS max_jaccard,
         |  min(eval_id) AS first_eval_id
         |FROM j WHERE jaccard >= 0.5
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,

    // connected components over the minhash pair graph by recursive
    // reachability: a doc's canonical is the min id it can reach
    // through bidirectional dup edges — exactly the fixpoint
    // Dedup.resolveClusters' label propagation converges to
    "dedup_clusters" ->
      s"""$clusterCtes
         |SELECT id AS doc_id, min(r) AS canonical FROM reach
         |GROUP BY id ORDER BY doc_id""".stripMargin,

    // keep-one-per-cluster: drop every doc whose cluster canonical is
    // a different doc (mirrors Dedup.dropClusteredDuplicates)
    "dedup_keep" ->
      s"""$clusterCtes,
         |clusters AS (
         |  SELECT id, min(r) AS canonical FROM reach GROUP BY id
         |)
         |SELECT doc_id FROM documents
         |WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> canonical)
         |ORDER BY doc_id""".stripMargin,

    // hot-shingle cap mirrored from Dedup.ngramJaccard: shingles with
    // df > 100 are dropped before candidate generation. Shingle sets
    // are 60-bit md5-prefix hashes (distinct-by-hash), mirroring the
    // native ShingleHashes pass.
    "dedup_ngram" ->
      s"""$toksCte,
         |sh AS (
         |  SELECT doc_id,
         |    list_distinct(list_transform(${shingleSql(5)},
         |      s -> ('0x' || substr(md5(s), 1, 15))::BIGINT)) AS ss
         |  FROM toks WHERE len(tokens) >= 5
         |), inv0 AS (
         |  SELECT doc_id, unnest(ss) AS s FROM sh
         |), cool AS (
         |  SELECT s FROM inv0 GROUP BY s HAVING count(*) <= 100
         |), inv AS (
         |  SELECT inv0.doc_id, inv0.s FROM inv0 JOIN cool USING (s)
         |), cand AS (
         |  SELECT a.doc_id AS x, b.doc_id AS y
         |  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |),
         |${jaccardTail(0.3)}""".stripMargin,

    // exact duplicated-substring spans: positional 8-gram 60-bit
    // hashes, windows occurring >1x corpus-wide, interval-islands
    // merge per doc (same window SQL both engines execute)
    "dedup_substring" -> {
      val k = 8
      val parts = (0 until k).map {
        case 0 => "tokens[i]"
        case o => s"tokens[i + $o]"
      }.mkString(" || ' ' || ")
      s"""$toksCte,
         |base AS (SELECT doc_id, tokens, len(tokens) AS n_tokens FROM toks),
         |grams AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, n_tokens - ${k - 2}),
         |      i -> struct_pack(pos := i - 1,
         |                       h := ('0x' || substr(md5($parts), 1, 15))::BIGINT)),
         |      recursive := true)
         |  FROM base WHERE n_tokens >= $k
         |),
         |dup AS (SELECT h FROM grams GROUP BY h HAVING count(*) > 1),
         |flagged AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (h)),
         |isl AS (
         |  SELECT doc_id, pos,
         |    max(pos + $k) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM flagged),
         |isl2 AS (
         |  SELECT doc_id, pos,
         |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
         |  FROM isl),
         |spans AS (
         |  SELECT doc_id, span, min(pos) AS s, max(pos + $k) AS e
         |  FROM isl2 GROUP BY doc_id, span),
         |perdoc AS (
         |  SELECT doc_id, count(*) AS n_dup_spans, sum(e - s) AS dup_tokens
         |  FROM spans GROUP BY doc_id)
         |SELECT b.doc_id, b.n_tokens::BIGINT AS n_tokens,
         |  CAST(coalesce(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
         |  CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  CASE WHEN b.n_tokens = 0 THEN 0.0
         |       ELSE round(CAST(coalesce(p.dup_tokens, 0) AS DOUBLE) / b.n_tokens, 4)
         |  END AS dup_frac
         |FROM base b LEFT JOIN perdoc p USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    // the strip transform: same islands CTE, flagged positions
    // anti-joined out, survivors re-joined in position order and
    // fingerprinted (DuckDB lambda index is 1-based, hence i - 1)
    "dedup_substring_keep" -> {
      val k = 8
      val parts = (0 until k).map {
        case 0 => "tokens[i]"
        case o => s"tokens[i + $o]"
      }.mkString(" || ' ' || ")
      s"""$toksCte,
         |base AS (SELECT doc_id, tokens, len(tokens) AS n_tokens FROM toks),
         |grams AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, n_tokens - ${k - 2}),
         |      i -> struct_pack(pos := i - 1,
         |                       h := ('0x' || substr(md5($parts), 1, 15))::BIGINT)),
         |      recursive := true)
         |  FROM base WHERE n_tokens >= $k
         |),
         |dup AS (SELECT h FROM grams GROUP BY h HAVING count(*) > 1),
         |flagged AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (h)),
         |isl AS (
         |  SELECT doc_id, pos,
         |    max(pos + $k) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
         |  FROM flagged),
         |isl2 AS (
         |  SELECT doc_id, pos,
         |    sum(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY doc_id ORDER BY pos
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span
         |  FROM isl),
         |spans AS (
         |  SELECT doc_id, span, min(pos) AS s, max(pos + $k) AS e
         |  FROM isl2 GROUP BY doc_id, span),
         |flagpos AS (SELECT DISTINCT doc_id, unnest(range(s, e)) AS p FROM spans),
         |toki AS (
         |  SELECT doc_id,
         |    unnest(list_transform(tokens, (x, i) -> struct_pack(p := i - 1, tok := x)),
         |      recursive := true)
         |  FROM base
         |),
         |kept AS (
         |  SELECT toki.doc_id, toki.tok, toki.p
         |  FROM toki ANTI JOIN flagpos
         |    ON toki.doc_id = flagpos.doc_id AND toki.p = flagpos.p
         |)
         |SELECT b.doc_id, b.n_tokens::BIGINT AS n_tokens,
         |  CAST(coalesce(kc.n_kept, 0) AS BIGINT) AS n_kept,
         |  coalesce(kc.cleaned_md5, md5('')) AS cleaned_md5
         |FROM base b LEFT JOIN (
         |  SELECT doc_id, count(*) AS n_kept,
         |    md5(string_agg(tok, ' ' ORDER BY p)) AS cleaned_md5
         |  FROM kept GROUP BY doc_id
         |) kc USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    // Gopher-style repetition: line dup fraction (one scan), top-
    // 2-gram and dup-5-gram character coverage (unnest + grouped
    // counts, mirroring TextAnalysis.repetitionSignals' shuffles)
    "repetition_signals" ->
      s"""$toksCte,
         |base AS (
         |  SELECT doc_id, length(text)::DOUBLE AS n_chars,
         |    len(string_split(text, chr(10)))::BIGINT AS n_lines,
         |    round_even(((len(string_split(text, chr(10))) -
         |           len(list_distinct(string_split(text, chr(10)))))::DOUBLE /
         |          len(string_split(text, chr(10)))) * 1e4, 0) / 1e4 AS dup_line_frac
         |  FROM documents
         |), c2 AS (
         |  SELECT doc_id, g, count(*) AS c
         |  FROM (SELECT doc_id, unnest(${ngramAllSql(2)}) AS g FROM toks)
         |  GROUP BY 1, 2
         |), top2 AS (
         |  SELECT doc_id, (c * length(g))::DOUBLE AS top2_chars,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY c DESC, length(g) DESC, g DESC) AS rn
         |  FROM c2
         |), c5 AS (
         |  SELECT doc_id, g, count(*) AS c
         |  FROM (SELECT doc_id, unnest(${ngramAllSql(5)}) AS g FROM toks)
         |  GROUP BY 1, 2
         |), dup5 AS (
         |  SELECT doc_id,
         |    sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END)::DOUBLE AS dup5_chars
         |  FROM c5 GROUP BY doc_id
         |)
         |SELECT b.doc_id, b.n_lines, b.dup_line_frac,
         |  round_even((coalesce(t.top2_chars, 0) / b.n_chars) * 1e4, 0) / 1e4 AS top_2gram_frac,
         |  round_even((coalesce(d.dup5_chars, 0) / b.n_chars) * 1e4, 0) / 1e4 AS dup_5gram_frac
         |FROM base b
         |LEFT JOIN (SELECT doc_id, top2_chars FROM top2 WHERE rn = 1) t USING (doc_id)
         |LEFT JOIN dup5 d USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // pure integer/md5 arithmetic end-to-end (positions, 32-bit
    // words, bit_or, bool_and) — both engines replay the filter
    // bit-exactly, false positives included
    "dedup_bloom" -> bloomMembershipOracleSql,

    "dedup_simhash" ->
      s"""$toksCte,
         |$simhashBitsCte
         |SELECT doc_id, simhash FROM sims ORDER BY doc_id""".stripMargin,

    "simhash_pairs" -> {
      val byteMatch = (0 until 4)
        .map(b => s"((a.simhash >> ${b * 16}) & 65535) = ((b.simhash >> ${b * 16}) & 65535)")
        .mkString(" OR ")
      s"""$toksCte,
         |$simhashBitsCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  bit_count(xor(a.simhash, b.simhash)) AS hamming
         |FROM sims a JOIN sims b ON a.doc_id < b.doc_id AND ($byteMatch)
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "dedup_embedding" ->
      s"""$embCte
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  round(list_cosine_similarity(a.v, b.v), 4) AS cos
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(a.v, b.v) >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    "dedup_embedding_lsh" ->
      s"""$embCte,
         |planes(i, p) AS (VALUES
         |    $annLshPlanesValues
         |), bk AS (
         |  SELECT e.vec_id,
         |    CAST(sum(CASE WHEN list_sum(list_transform(range(1, 65), j -> e.v[j] * pl.p[j])) >= 0
         |      THEN (1::BIGINT << pl.i) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM e, planes pl GROUP BY e.vec_id
         |), eb AS (
         |  SELECT e.vec_id, e.v, bk.bucket FROM e JOIN bk USING (vec_id)
         |)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  round(list_cosine_similarity(a.v, b.v), 4) AS cos
         |FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE list_cosine_similarity(a.v, b.v) >= 0.4
         |ORDER BY vec_a, vec_b""".stripMargin,

    "ann_bruteforce" ->
      s"""$embCte,
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         |s AS (
         |  SELECT q.qid, e.vec_id, list_cosine_similarity(e.v, q.qv) AS cos
         |  FROM e, q WHERE e.vec_id <> q.qid
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM s
         |)
         |SELECT qid, rank, vec_id, round(cos, 4) AS cos FROM r WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin,

    "ann_filtered" ->
      s"""$embCte,
         |q AS (SELECT vec_id AS qid, v AS qv, label FROM e WHERE vec_id < 5),
         |s AS (
         |  SELECT q.qid, e.vec_id, list_cosine_similarity(e.v, q.qv) AS cos
         |  FROM e JOIN q USING (label) WHERE e.vec_id <> q.qid
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM s
         |)
         |SELECT qid, rank, vec_id, round(cos, 4) AS cos FROM r WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin,

    "ann_lsh" ->
      s"""$embCte,
         |planes(i, p) AS (VALUES
         |    $annLshPlanesValues
         |), bk AS (
         |  SELECT e.vec_id,
         |    CAST(sum(CASE WHEN list_sum(list_transform(range(1, 65), j -> e.v[j] * pl.p[j])) >= 0
         |      THEN (1::BIGINT << pl.i) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM e, planes pl GROUP BY e.vec_id
         |), eb AS (
         |  SELECT e.vec_id, e.v, bk.bucket FROM e JOIN bk USING (vec_id)
         |), q AS (
         |  SELECT vec_id AS qid, v AS qv, bucket FROM eb WHERE vec_id < 5
         |), s AS (
         |  SELECT q.qid, eb.vec_id, list_cosine_similarity(eb.v, q.qv) AS cos
         |  FROM eb JOIN q USING (bucket) WHERE eb.vec_id <> q.qid
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM s
         |)
         |SELECT qid, rank, vec_id, round(cos, 4) AS cos FROM r WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,

    // multi-probe: candidates are Hamming-distance <= 1 bucket pairs
    "ann_lsh_multiprobe" ->
      s"""$embCte,
         |planes(i, p) AS (VALUES
         |    $annLshPlanesValues
         |), bk AS (
         |  SELECT e.vec_id,
         |    CAST(sum(CASE WHEN list_sum(list_transform(range(1, 65), j -> e.v[j] * pl.p[j])) >= 0
         |      THEN (1::BIGINT << pl.i) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM e, planes pl GROUP BY e.vec_id
         |), eb AS (
         |  SELECT e.vec_id, e.v, bk.bucket FROM e JOIN bk USING (vec_id)
         |), q AS (
         |  SELECT vec_id AS qid, v AS qv, bucket FROM eb WHERE vec_id < 5
         |), s AS (
         |  SELECT q.qid, eb.vec_id, list_cosine_similarity(eb.v, q.qv) AS cos
         |  FROM eb, q
         |  WHERE eb.vec_id <> q.qid AND bit_count(xor(eb.bucket, q.bucket)) <= 1
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank FROM s
         |)
         |SELECT qid, rank, vec_id, round(cos, 4) AS cos FROM r WHERE rank <= 5
         |ORDER BY qid, rank""".stripMargin,

    "lang_id" -> {
      val scores = langProfileSql.map(_._2).mkString(",\n    ")
      val langs = TextAnalysis.LangProfiles.map(_._1)
      val caseChain = langs.init.map { l =>
        val conds = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString("\n    ")
      s"""$toksCte
         |SELECT doc_id, actual_lang,
         |  CASE
         |    $caseChain
         |    ELSE '${langs.last}' END AS pred_lang,
         |  ${langs.map(l => s"s_$l").mkString(", ")}
         |FROM (
         |  SELECT doc_id, lang AS actual_lang,
         |    $scores
         |  FROM toks
         |)
         |ORDER BY doc_id""".stripMargin
    },

    "lang_id_ngram" -> {
      val langs = TextAnalysis.TrigramProfiles.map(_._1)
      def esc(g: String) = g.replace("'", "''")
      val scores = TextAnalysis.TrigramProfiles.map { case (l, gs) =>
        gs.map(g => s"(length(lower(text)) - length(replace(lower(text), '${esc(g)}', ''))) / 3")
          .mkString("CAST(", " + ", s" AS BIGINT) AS s_$l")
      }.mkString(",\n    ")
      val caseChain = langs.init.map { l =>
        val conds = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString("\n    ")
      s"""SELECT doc_id, actual_lang,
         |  CASE
         |    $caseChain
         |    ELSE '${langs.last}' END AS pred_lang,
         |  ${langs.map(l => s"s_$l").mkString(", ")}
         |FROM (
         |  SELECT doc_id, lang AS actual_lang,
         |    $scores
         |  FROM documents
         |)
         |ORDER BY doc_id""".stripMargin
    },

    "quality_score" ->
      s"""$toksCte
         |SELECT doc_id, n_tokens, n_distinct, avg_token_len, ttr, stop_ratio,
         |  round_even((least(n_tokens / 100.0, 1.0) * (1 - stop_ratio) * ttr) * 1e4, 0) / 1e4 AS quality
         |FROM (
         |  SELECT doc_id, len(tokens) AS n_tokens, len(list_distinct(tokens)) AS n_distinct,
         |    round_even((coalesce(list_sum(list_transform(tokens, x -> length(x))), 0)::DOUBLE
         |      / greatest(len(tokens), 1)) * 1e4, 0) / 1e4 AS avg_token_len,
         |    round_even((len(list_distinct(tokens))::DOUBLE / greatest(len(tokens), 1)) * 1e4, 0) / 1e4 AS ttr,
         |    round_even((len(list_filter(tokens, x -> list_contains(['the','and','of','to','in','is','that','it','was','for'], x)))::DOUBLE
         |      / greatest(len(tokens), 1)) * 1e4, 0) / 1e4 AS stop_ratio
         |  FROM toks
         |)
         |ORDER BY doc_id""".stripMargin,

    "token_stats" ->
      """SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x <> '')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_ish_tokens,
        |  length(text) AS n_chars_utf8
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Count-Min sketch replayed cell-exactly: same md5 cells, same
    // integer counters, same min fold — one-sided error included
    "cms_counts" ->
      s"""$toksCte,
         |terms AS (SELECT unnest(tokens) AS term FROM toks),
         |truth AS (SELECT term, count(*) AS cf FROM terms GROUP BY 1),
         |tcell AS (
         |  SELECT i AS r, ('0x' || substr(md5(term || '@' || i), 1, 8))::BIGINT % 1024 AS idx
         |  FROM terms, range(3) t(i)
         |),
         |sketch AS (SELECT r, idx, count(*) AS cnt FROM tcell GROUP BY 1, 2),
         |probes AS (
         |  SELECT term, cf FROM truth
         |  UNION ALL
         |  SELECT 'absent_probe_' || i AS term, 0 AS cf FROM range(5) t(i)
         |),
         |pcell AS (
         |  SELECT term, cf, i AS r,
         |    ('0x' || substr(md5(term || '@' || i), 1, 8))::BIGINT % 1024 AS idx
         |  FROM probes, range(3) t2(i)
         |)
         |SELECT p.term, p.cf::BIGINT AS cf,
         |  min(coalesce(s.cnt, 0))::BIGINT AS est,
         |  min(coalesce(s.cnt, 0)) = p.cf AS exact
         |FROM pcell p LEFT JOIN sketch s ON s.r = p.r AND s.idx = p.idx
         |GROUP BY p.term, p.cf
         |ORDER BY p.term""".stripMargin,

    // BPE pair-mining count: non-distinct adjacent 2-grams, total +
    // doc-frequency counts, deterministic (n_occ desc, pair) top-30
    "token_pairs" ->
      s"""$toksCte,
         |pairs AS (
         |  SELECT doc_id, unnest(${ngramAllSql(2)}) AS pair
         |  FROM toks WHERE len(tokens) >= 2
         |)
         |SELECT pair, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
         |FROM pairs GROUP BY pair
         |ORDER BY n_occ DESC, pair LIMIT 30""".stripMargin,

    // the NAIVE greedy-prefix formulation (per-lang global sort) — the
    // Spark side's histogram-threshold plan must reproduce it exactly
    "select_budget" -> {
      val stops = TextAnalysis.LangProfiles.toMap.apply("en")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""$toksCte, q AS (
         |  SELECT doc_id, lang, len(tokens) AS n_tokens,
         |    round_even((least(len(tokens) / 100.0, 1.0) * (1 - stop_ratio) * ttr) * 1e4, 0) / 1e4 AS quality
         |  FROM (
         |    SELECT doc_id, lang, tokens,
         |      round_even((len(list_distinct(tokens))::DOUBLE / greatest(len(tokens), 1)) * 1e4, 0) / 1e4 AS ttr,
         |      round_even((len(list_filter(tokens, x -> list_contains($stops, x)))::DOUBLE
         |        / greatest(len(tokens), 1)) * 1e4, 0) / 1e4 AS stop_ratio
         |    FROM toks
         |  )
         |), ranked AS (
         |  SELECT lang, doc_id, n_tokens, quality,
         |    CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM q
         |)
         |SELECT lang, doc_id, n_tokens, quality, cum_tokens
         |FROM ranked WHERE cum_tokens <= 500
         |ORDER BY lang, doc_id""".stripMargin
    },

    // the accuracy contract (q26 convention): the sketch estimate must
    // sit within 5% (~3 sigma at lgK=12) of the exact distinct count
    "distinct_hll" ->
      s"""$toksCte
         |SELECT lang, count(DISTINCT term) AS n_exact, TRUE AS hll_ok
         |FROM (SELECT lang, unnest(tokens) AS term FROM toks)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    // the sketch is exact below tracked capacity (31 items << 64)
    // and the entry re-ranks its cut deterministically, so the
    // oracle is the plain exact top-5 per language
    "topk_terms_sketch" ->
      s"""$toksCte,
         |tc AS (
         |  SELECT lang, term, count(*) AS n
         |  FROM (SELECT lang, unnest(tokens) AS term FROM toks)
         |  GROUP BY lang, term
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rank
         |  FROM tc
         |)
         |SELECT lang, rank::BIGINT AS rank, term, n FROM r WHERE rank <= 5
         |ORDER BY lang, rank""".stripMargin,

    "fingerprints" ->
      s"""$toksCte
         |SELECT doc_id, md5(text) AS fp_full,
         |  coalesce(
         |    list_min(list_transform(CASE WHEN len(tokens) >= 5 THEN ${shingleSql(5)} ELSE [] END, s -> md5(s))),
         |    md5(text)) AS fp_min_shingle,
         |  md5(array_to_string(list_sort(list_distinct(tokens)), ' ')) AS fp_bow
         |FROM toks ORDER BY doc_id""".stripMargin,

    "fingerprint_winnow" ->
      s"""$toksCte,
         |sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(tokens) >= 5
         |      THEN list_transform(range(1, len(tokens) - 3),
         |             i -> tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2] || ' ' || tokens[i + 3] || ' ' || tokens[i + 4])
         |      ELSE [] END AS ss
         |  FROM toks
         |), hv AS (
         |  SELECT doc_id, list_transform(ss, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs FROM sh
         |), mins AS (
         |  SELECT doc_id,
         |    CASE WHEN len(hs) >= 4
         |      THEN list_transform(range(1, len(hs) - 2), i -> list_min(hs[i:i+3]))
         |      ELSE hs END AS m
         |  FROM hv
         |), sel AS (
         |  SELECT doc_id, list_sort(list_distinct(m)) AS sel FROM mins
         |)
         |SELECT doc_id, len(sel) AS n_selected,
         |  md5(array_to_string(list_transform(sel, h -> h::VARCHAR), ',')) AS fp_winnow
         |FROM sel ORDER BY doc_id""".stripMargin,

    // MOSS pairs: same sel CTE as fingerprint_winnow, candidates via
    // the capped selected-hash inverted index, Jaccard over sel sets
    "dedup_winnow" ->
      s"""$toksCte,
         |sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(tokens) >= 5
         |      THEN list_transform(range(1, len(tokens) - 3),
         |             i -> tokens[i] || ' ' || tokens[i + 1] || ' ' || tokens[i + 2] || ' ' || tokens[i + 3] || ' ' || tokens[i + 4])
         |      ELSE [] END AS ss
         |  FROM toks
         |), hv AS (
         |  SELECT doc_id, list_transform(ss, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs FROM sh
         |), mins AS (
         |  SELECT doc_id,
         |    CASE WHEN len(hs) >= 4
         |      THEN list_transform(range(1, len(hs) - 2), i -> list_min(hs[i:i+3]))
         |      ELSE hs END AS m
         |  FROM hv
         |), sel AS (
         |  SELECT doc_id, list_sort(list_distinct(m)) AS sel FROM mins WHERE len(m) > 0
         |), inv0 AS (
         |  SELECT doc_id, unnest(sel) AS h FROM sel
         |), cool AS (
         |  SELECT h FROM inv0 GROUP BY h HAVING count(*) <= 100
         |), inv AS (
         |  SELECT inv0.doc_id, inv0.h FROM inv0 JOIN cool USING (h)
         |), cand AS (
         |  SELECT a.doc_id AS x, b.doc_id AS y
         |  FROM inv a JOIN inv b ON a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), j AS (
         |  SELECT cand.x, cand.y,
         |    len(list_intersect(sa.sel, sb.sel)) AS n_shared,
         |    len(list_intersect(sa.sel, sb.sel))::DOUBLE
         |      / len(list_distinct(sa.sel || sb.sel)) AS wj
         |  FROM cand JOIN sel sa ON sa.doc_id = cand.x
         |            JOIN sel sb ON sb.doc_id = cand.y
         |)
         |SELECT x AS doc_a, y AS doc_b, n_shared::BIGINT AS n_shared,
         |  round_even(wj * 1e4, 0) / 1e4 AS winnow_jaccard
         |FROM j WHERE wj >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    "multimodal_frames" ->
      """WITH meta AS (
        |  SELECT doc_id, CAST(strlen(text) % 30 + 1 AS BIGINT) AS n_frames FROM documents
        |), stepped AS (
        |  SELECT doc_id, n_frames,
        |    greatest(CAST(ceil(n_frames / 4) AS BIGINT), 1) AS step
        |  FROM meta
        |)
        |SELECT doc_id, frame_idx, md5(doc_id || ':' || frame_idx) AS frame_hash
        |FROM (SELECT doc_id, unnest(range(0, n_frames, step)) AS frame_idx FROM stepped)
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "multimodal_features" ->
      """SELECT doc_id, j AS dim,
        |  round((strlen(text) - strlen(replace(text, chr(CAST(97 + j AS INTEGER)), '')))::DOUBLE
        |    / greatest(strlen(text), 1), 6) AS value
        |FROM documents, range(0, 16) t(j)
        |ORDER BY doc_id, dim""".stripMargin,

    "multimodal_resize" ->
      """WITH meta AS (
        |  SELECT doc_id, (strlen(text) % 640)::BIGINT AS width,
        |    ((strlen(text) * 7) % 480)::BIGINT AS height
        |  FROM documents
        |), scaled AS (
        |  SELECT *, CASE WHEN width > 0 AND height > 0
        |    THEN least(224.0 / width, 224.0 / height, 1.0) ELSE 0.0 END AS scale
        |  FROM meta
        |)
        |SELECT doc_id, width, height,
        |  CAST(floor(width * scale) AS BIGINT) AS out_w,
        |  CAST(floor(height * scale) AS BIGINT) AS out_h
        |FROM scaled ORDER BY doc_id""".stripMargin,

    // text payloads are codec-less → the stub path, format 'raw'
    "multimodal_meta" ->
      """SELECT doc_id,
        |  strlen(text)::BIGINT AS n_bytes,
        |  (strlen(text) % 640)::BIGINT AS width,
        |  ((strlen(text) * 7) % 480)::BIGINT AS height,
        |  (strlen(text) % 30 + 1)::BIGINT AS n_frames,
        |  'raw' AS format
        |FROM documents ORDER BY doc_id""".stripMargin,

    // REAL decode: the Spark side round-trips synthetic PNG bytes
    // through javax.imageio; the oracle predicts the dimensions from
    // the same arithmetic the synthesizer used — a hash match proves
    // the decoder recovered them from actual image headers
    "multimodal_decode_png" ->
      """SELECT doc_id,
        |  (n_chars % 64 + 1)::BIGINT AS width,
        |  (doc_id % 48 + 1)::BIGINT AS height,
        |  'png' AS format
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
