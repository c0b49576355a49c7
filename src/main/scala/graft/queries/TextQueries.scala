package graft.queries

import graft.Tables._
import graft.functions.{TextFunctions => TF}
import graft.operators.{Clustering, Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis / dedup / similarity query catalog (the north-star
  * LLM-data-pipeline operators, SURVEY.md §7.4) over `documents` and
  * `embeddings`.
  *
  * Every SQL-expressible operator has a lockstep DuckDB oracle; the
  * approximate dedup operators (minhash-LSH, simhash) verify candidates
  * with exact Jaccard, so their contract — equality with the exact pair
  * set at the 0.8 threshold — is oracle-checkable too. The LSH ANN variant
  * is approximate by design and has no equality oracle (covered by recall
  * tests in ScalaTest).
  */
object TextQueries {

  type Q = (SparkSession, String) => DataFrame

  private val jaccardThreshold = 0.8

  def queries: Map[String, Q] = Map(
    "t1_token_stats" -> t1,
    "t2_quality_score" -> t2,
    "t3_lang_guess" -> t3,
    "t4_fingerprint" -> t4,
    "t5_bpe_tokens" -> t5,
    "t6_rolling_fingerprint" -> t6,
    "t7_split_assign" -> t7,
    "t8_rare_tokens" -> t8,
    "t9_lang_quota" -> t9,
    "t10_redact_pii" -> t10,
    "t11_repetition" -> t11,
    "t12_vocab_encode" -> t12,
    "t13_token_chunks" -> t13,
    "t14_pack_sequences" -> t14,
    "t15_global_shuffle" -> t15,
    "d1_dedup_exact" -> d1,
    "d6_decontaminate" -> d6,
    "d2_dedup_jaccard" -> d2,
    "d3_dedup_minhash_lsh" -> d3,
    "d4_dedup_simhash" -> d4,
    "d7_dedup_simhash128" -> d7,
    "d5_dedup_embedding" -> d5,
    "d8_dedup_semantic" -> d8,
    "d9_dedup_groups" -> d9,
    "d10_segment_dedup" -> d10,
    "d11_bloom_decontaminate" -> d11,
    "d12_ngram_decontaminate" -> d12,
    "d13_dup_spans" -> ((spark, dir) =>
      Dedup.duplicateSpanCoverage(t(spark, dir, "documents"))),
    "d19_span_removal" -> ((spark, dir) =>
      Dedup.duplicateSpanRemoval(t(spark, dir, "documents"))),
    "d20_minhash_sweep" -> ((spark, dir) =>
      Dedup.minHashBandSweep(t(spark, dir, "documents"))),
    "d14_embedding_decontaminate" -> d14,
    // directional shingle containment (|A∩B| / |A|) — the quote/subset
    // duplicates symmetric Jaccard can't see; exact inverted-index
    // self-join, one int division, full SQL replay
    "d16_containment" -> ((spark, dir) =>
      Dedup.containmentPairs(t(spark, dir, "documents"), 0.8)),
    "d17_soft_dedup" -> d17,
    "d18_incremental_dedup" -> d18,
    "d15_edit_distance" -> ((spark, dir) =>
      Dedup.editDistancePairs(t(spark, dir, "documents"), maxDist = 16)),
    "t31_repetition_filters" -> t31,
    "t16_epoch_mix" -> t16,
    "t17_bpe_tokenize" -> t17,
    "t23_bpe_small" -> t23,
    "t18_source_mix" -> t18,
    "t19_bigram_mass" -> t19,
    "t20_hashed_features" -> t20,
    "t21_bm25" -> t21,
    "t22_novelty" -> t22,
    "t24_pmi_collocations" -> t24,
    "t25_stratified_sample" -> t25,
    "t26_rouge_overlap" -> t26,
    "t27_quality_classifier" -> t27,
    "t28_gopher_filters" -> t28,
    "t29_bigram_surprisal" -> t29,
    "t30_overlap_chunks" -> t30,
    "t32_ccnet_buckets" -> t32,
    "t33_dsir_select" -> t33,
    "t34_kneser_ney" -> t34,
    "t36_lm_perplexity_filter" -> t36,
    "t37_mixture_interleave" -> t37,
    "t38_url_dedup" -> t38,
    "t39_pii_redact" -> t39,
    "t40_dataset_card" -> t40,
    "s1_ann_cosine" -> s1,
    // Gonzalez k-center greedy seeding over the quantized embeddings —
    // the deterministic k-means++ stand-in; integer-exact distances
    // make the whole selection sequence replay in SQL (s13OracleSql)
    "s13_farthest_init" -> ((spark, dir) =>
      Clustering.farthestPointInit(t(spark, dir, "embeddings"), k = 6)),
    "s14_ann_recall" -> s14,
    "s15_ann_ivfpq" -> s15,
    "s16_lsh_sweep" -> s16,
    "s17_ann_mips" -> s17,
    "s18_hard_negatives" -> s18,
    "s2_ann_lsh" -> s2,
    "s3_ann_ivf" -> s3,
    "s4_ann_multiprobe" -> s4,
    "s5_ann_sq" -> s5,
    "s6_ann_pq" -> s6,
    "s7_kmeans" -> s7,
    "s8_knn_classify" -> s8,
    "s9_cluster_purity" -> s9,
    "s10_mmr_select" -> s10,
    "s11_range_search" -> s11,
    "s12_nn_join" -> s12,
    "p1_prep_pipeline" -> p1,
    "p2_prep_pipeline_v2" -> p2,
    "p3_dedup_keeper" -> p3,
    "p4_leakage_split" -> p4,
    "p5_fuzzy_verify" -> p5,
    "p6_gopher_pipeline" -> p6,
    "p7_span_clean_pipeline" -> p7
  )

  /** Dedup with a keeper POLICY (p3): near-dup groups (d3 pairs → d9
    * components) resolved to the member a real pipeline keeps — the
    * LONGEST document (C4's policy), tie-broken to the lowest doc_id.
    * The argmax is one aggregation via min(struct(-len, id)) — no
    * per-group window, no second shuffle. Composition pinned end-to-end
    * by extending d9's recursive-CTE oracle with the keeper selection. */
  private def p3: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val comps = Dedup.duplicateComponents(Dedup.minHashLshPairs(docs, jaccardThreshold))
    // tokenize AFTER the join: comps holds only duplicate-group members
    // (a small fraction of the corpus), and a projection stays above the
    // join in Catalyst — so only members get tokenized, instead of a
    // full-corpus length pass joined down to the few rows that matter
    comps.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select(col("comp"), col("doc_id"),
        size(TF.tokens(lower(col("text")))).cast(LongType).as("n_toks"))
      .groupBy(col("comp"))
      .agg(count(lit(1)).as("n_members"),
        max(col("n_toks")).as("max_toks"),
        min(struct((-col("n_toks")).as("neg"), col("doc_id").as("id")))
          .getField("id").as("keeper_id"))
      .select(col("comp"), col("keeper_id"), col("n_members"), col("max_toks"))
  }

  /** Leakage-safe train/val/test split (p4): a near-dup pair straddling
    * train and test silently leaks training data into eval, so the
    * split must be decided per near-dup GROUP, not per document. Every
    * doc resolves to a representative — its d9 component min if it is
    * in a duplicate group, itself otherwise — and inherits the t7
    * hash-split of the REPRESENTATIVE's text, co-assigning whole groups
    * by construction. Output: (doc_id, rep_id, split).
    *
    * Scale: the components table holds only duplicate-group members (a
    * sliver of the corpus) and broadcasts into the left join; the split
    * lookup joins docs-sized tables once on rep_id. Composes d9 + t7,
    * both individually oracle-proven; the oracle replays the exact
    * composition. */
  private def p4: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val comps = Dedup.duplicateComponents(
        Dedup.minHashLshPairs(docs, jaccardThreshold))
      .select(col("doc_id"), col("comp"))
    val withRep = docs.select(col("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("rep_id"))
    val bucket = substring(TF.fingerprint(col("text")), 1, 2)
    val repSplit = docs.select(col("doc_id").as("rep_id"),
      when(bucket < "e6", "train").when(bucket < "f3", "val")
        .otherwise("test").as("split"))
    withRep.join(repSplit, "rep_id")
      .select(col("doc_id"), col("rep_id"), col("split"))
  }

  /** Fuzzy dedup at the 100 TB shape (p5): the composition d15's
    * Scaladoc names as the production path — MinHash-LSH (d3) as the
    * candidate GENERATOR, exact thresholded Levenshtein as the VERIFY
    * stage via `editDistancePairs(candidates = ...)`. No length-band
    * join anywhere: the only pair source is the banded LSH bucketing,
    * so the quadratic-within-band risk of d15's generator is gone and
    * the kernel runs once per LSH candidate. Output: each near-dup
    * pair with its exact edit distance — the integer a pipeline
    * thresholds when token-set similarity alone is too blunt.
    * Oracle: d3's exact-jaccard pair replay (LSH = exact at 0.8,
    * spec-pinned) joined back to texts with DuckDB's levenshtein. */
  private def p5: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val cands = Dedup.minHashLshPairs(docs, jaccardThreshold)
      .select(col("a_id"), col("b_id"))
    Dedup.editDistancePairs(docs, maxDist = 64, candidates = Some(cands))
  }

  /** The Gopher-era curation pipeline end-to-end (p6): rule-based
    * quality filtering (t28's reasons bitmask) → exact dedup keeper
    * (lowest doc_id per canonical fingerprint, payload carried through
    * one min(struct)) → deterministic stratified sampling (t25's hash
    * thresholds) with Horvitz–Thompson weights. The composition is the
    * load-bearing claim: each stage reshapes what the next stage sees,
    * and the oracle replays all three in one SQL chain, so a drift in
    * any stage's SELECTION (not just its scores) breaks the hash.
    *
    * Scale: filter is a scan-bound projection, keeper one
    * shuffle-on-fingerprint with map-side min, sampling a broadcast
    * rate dim + hash threshold — no window functions, no driver
    * state. */
  private def p6: Q = (spark, dir) => {
    import graft.operators.Sampling
    val rates = (0 until 20).map { i =>
      s"src$i" -> (if (i < 5) 5000 else if (i < 10) 2500 else 1000)
    }.toMap
    val kept = t28(spark, dir).filter(col("keep"))
      .select(col("doc_id"), col("n_words"))
    val enriched = t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), TF.fingerprint(col("text")).as("fp"))
      .join(kept, "doc_id")
    val keepers = enriched
      .groupBy(col("fp"))
      .agg(min(struct(col("doc_id"), col("source"), col("n_words"))).as("m"))
      .select(col("m.doc_id").as("doc_id"), col("m.source").as("source"),
        col("m.n_words").as("n_words"))
    Sampling.stratified(keepers, col("source"), col("doc_id"), rates,
        defaultBp = 1000)
      .select(col("doc_id"), col("source"), col("n_words"), col("weight"))
  }

  /** The ExactSubstr prep chain composed end-to-end (p7): d19's
    * duplicate-span REMOVAL rewrites the corpus, docs that lost more
    * than half their tokens to boilerplate are dropped, exact dedup
    * runs on the CLEANED fingerprints (documents that become identical
    * only after span removal collapse here — the pass a raw-text d1
    * cannot see; the planted exact dups all clean to md5('') and
    * collapse to one keeper), and the survivors sample stratified by
    * source with Horvitz–Thompson weights. Every stage is an operator
    * proven individually (d19, d1's keeper shape, t25); this query
    * pins their COMPOSITION against one SQL oracle.
    *
    * Scale: d19's span pipeline + one doc-sized keeper agg + the
    * zero-shuffle hash-threshold sample — nothing new beyond the
    * operators' own shapes. */
  private def p7: Q = (spark, dir) => {
    import graft.operators.{Dedup, Sampling}
    val rates = (0 until 20).map { i =>
      s"src$i" -> (if (i < 5) 8000 else if (i < 10) 4000 else 2000)
    }.toMap
    val cleaned = Dedup.duplicateSpanRemoval(t(spark, dir, "documents"))
    val meta = t(spark, dir, "documents").select(col("doc_id"), col("source"))
    val kept = cleaned.filter(col("n_kept") * 2 >= col("n_tokens"))
      .join(meta, "doc_id")
    val keepers = kept.groupBy(col("clean_fp"))
      .agg(min(struct(col("doc_id"), col("source"), col("n_kept"))).as("m"))
      .select(col("m.doc_id").as("doc_id"), col("m.source").as("source"),
        col("m.n_kept").as("n_kept"))
    Sampling.stratified(keepers, col("source"), col("doc_id"), rates,
        defaultBp = 2000)
      .select(col("doc_id"), col("source"), col("n_kept"), col("weight"))
  }

  /** The composed data-prep pipeline a training run actually executes:
    * quality filter → exact dedup (keep the lowest doc_id per canonical
    * fingerprint) → deterministic split assignment → per-split counts.
    * Each stage is an operator proven individually (t2, d1, t7); this
    * query pins their COMPOSITION end-to-end against one SQL oracle. */
  private def p1: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val toks = TF.tokens(lower(col("text")))
    val nTokens = size(toks).cast(DoubleType)
    val uniqRatio = size(array_distinct(toks)).cast(DoubleType) / nTokens
    val stopRatio = TF.markerCount(toks, Seq("the", "a", "of", "and", "is"))
      .cast(DoubleType) / nTokens
    val avgTokLen = length(regexp_replace(col("text"), " ", ""))
      .cast(DoubleType) / nTokens
    val quality = uniqRatio * 0.5 + stopRatio * 0.3 +
      least(avgTokLen / 10.0, lit(1.0)) * 0.2
    val fp = TF.fingerprint(col("text"))
    val scored = d.select(col("doc_id"), fp.as("fp"), quality.as("q"))
      .filter(col("q") >= 0.5)
    val kept = scored.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
    val bucket = substring(col("fp"), 1, 2)
    kept.select(col("doc_id"),
        when(bucket < "e6", "train").when(bucket < "f3", "val")
          .otherwise("test").as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** The MODERN composed prep pipeline (this round's stages end-to-end):
    * n-gram decontamination (d12) → epoch-based language upsampling
    * (t16) → concat-and-chunk sequence packing (t14) over the
    * epoch-expanded stream, reduced to per-bucket totals. Every stage is
    * proven individually; this pins their COMPOSITION — survivors,
    * epoch expansion, token accounting, and the packed-sequence count
    * per output stream — against one SQL oracle. Integer-exact
    * throughout (counts and ceil-divisions only). */
  private def p2: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    // stage 1: drop docs sharing any 8-token shingle with the benchmark.
    // The benchmark side shingles only the 5% benchmark docs — filtering
    // AFTER a typed flatMap would shingle the whole corpus first, since
    // Catalyst can't push a Column predicate through the object mapper.
    val sh = Dedup.docShingles(d, n = 8)
    val bsh = Dedup.docShingles(d.filter(col("doc_id") % 20 === 0), n = 8)
      .select(col("shingle").as("bs")).distinct()
    val contaminated = sh
      .join(bsh, col("shingle") === col("bs"), "left_semi")
      .select(col("doc_id")).distinct()
    // Project the per-doc payload (tokens + fingerprint) BEFORE the
    // anti-join and persist the narrow survivor table: it feeds both the
    // epoch table and the mixed stream, and without the persist each
    // branch — including the maxN action below — would re-run the whole
    // shingle decontamination (the expensive subtree) from scratch.
    // CachePool bounds the pinned copies to one across bench reps.
    val survivors = CachePool.persistLatest("t16.survivors",
      d.select(col("doc_id"), col("lang"),
          size(TF.tokens(lower(col("text")))).cast(LongType).as("n_tokens"),
          TF.fingerprint(col("text")).as("fp"))
        .join(contaminated.withColumnRenamed("doc_id", "cid"),
          col("doc_id") === col("cid"), "left_anti"))
    // stage 2: epoch upsampling of low-resource languages (over survivors)
    val counts = survivors.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val maxN = counts.agg(max(col("n_lang"))).head().getLong(0)
    val epochs = counts.select(col("lang"),
      least(lit(4L), floor((lit(maxN) + col("n_lang") - 1) / col("n_lang")))
        .cast(LongType).as("n_epochs"))
    val mixed = survivors
      .join(broadcast(epochs), "lang")
      .select(col("doc_id"), col("fp"), col("n_tokens"),
        explode(sequence(lit(1L), col("n_epochs"))).as("epoch"))
    // stage 3: pack the mixed stream into 256-token sequences per bucket
    val budget = 256
    mixed.withColumn("bucket", substring(col("fp"), 1, 1))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_entries"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (floor((sum(col("n_tokens")) - 1) / budget) + 1)
          .cast(LongType).as("n_sequences"))
  }

  /** PII scrubbing: the fixture corpus carries no PII, so each doc is
    * deterministically salted with an email and an IPv4 literal INSIDE
    * the query (both engines build the identical string), then redacted
    * and counted — the oracle hash proves the scrub itself, not just
    * the plumbing. */
  private def t10: Q = (spark, dir) => {
    val salted = t(spark, dir, "documents").select(col("doc_id"),
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com from 10.0."), col("doc_id") % 256, lit(".7"))
        .as("text"))
    salted.select(col("doc_id"),
      TF.redactPii(col("text")).as("redacted"),
      TF.piiCount(col("text")).as("n_redactions"))
  }

  /** Repetition quality signal (the Gopher/RefinedWeb family of rules):
    * fraction of a document's word bigrams taken by its most frequent
    * bigram — high values mark boilerplate/spam for filtering. ONE
    * zero-shuffle typed pass per doc (bigram counts in a local map)
    * instead of an explode + two-level groupBy, so cost is a scan at
    * any corpus size. Exact integer counts + one IEEE division keep the
    * DuckDB hash match. */
  private def t11: Q = (spark, dir) => {
    import spark.implicits._
    t(spark, dir, "documents")
      .select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val w = text.trim.toLowerCase.split("\\s+")
        if (w.length < 2) None
        else {
          val counts = new java.util.HashMap[String, Long]()
          var top = 0L
          var i = 0
          while (i < w.length - 1) {
            val n = counts.merge(w(i) + " " + w(i + 1), 1L, _ + _)
            if (n > top) top = n
            i += 1
          }
          val total = (w.length - 1).toLong
          Some((id, total, top, top.toDouble / total))
        }
      }
      .toDF("doc_id", "n_bigrams", "top_n", "top_fraction")
  }

  /** Tokenizer-vocabulary induction + encode — the id-ification step of
    * a training pipeline: the top-V tokens by corpus frequency become
    * ids 0..V-1 (rank order: count desc, token asc — total, so the
    * boundary is deterministic), then every document is re-encoded as
    * its token-id sequence in ONE broadcast-dictionary pass (OOV → -1).
    *
    * Scale shape: the corpus shuffles once to build the frequency
    * table; TopK.perKey prunes it to V rows before the global rank
    * window (no full-vocabulary single-reducer sort); the V-row
    * dictionary broadcasts and the encode pass is zero-shuffle. The
    * emitted `ids_checksum` = Σ (pos+1)·(id+2) pins the exact id
    * SEQUENCE (values and order) with integer math the oracle
    * reproduces — arrays themselves would defeat the row-sorted hash
    * compare. */
  private def t12: Q = (spark, dir) => {
    val spark2 = spark
    import spark2.implicits._
    val vocabSize = 1000
    val docs = t(spark, dir, "documents")
      .select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
    val freq = docs
      .flatMap { case (_, text) =>
        text.trim.toLowerCase.split("\\s+").iterator
      }
      .toDF("tok")
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val vocab = graft.operators.TopK.perKey(freq, Seq.empty,
        Seq(col("cnt").desc, col("tok")), vocabSize)
      .select(col("tok"), (col("rank") - 1).cast("long").as("id"))
      .as[(String, Long)]
      .collect().toMap // V rows — the broadcast dictionary
    val bc = spark.sparkContext.broadcast(vocab)
    docs.map { case (id, text) =>
      val m = bc.value
      val w = text.trim.toLowerCase.split("\\s+")
      var nOov = 0L; var checksum = 0L
      var i = 0
      while (i < w.length) {
        val tid = m.getOrElse(w(i), -1L)
        if (tid == -1L) nOov += 1
        checksum += (i + 1).toLong * (tid + 2)
        i += 1
      }
      (id, w.length.toLong, nOov, checksum)
    }.toDF("doc_id", "n_tokens", "n_oov", "ids_checksum")
  }

  /** Context-window chunking: each document explodes into fixed-size
    * token windows (the sequence-packing precursor — map a corpus onto
    * training rows of bounded length). Pure codegen projection +
    * generator, zero shuffle at any corpus size. */
  /** Overlapping sliding-window chunking (t30): the RAG/embedding-index
    * chunker — windows of 64 tokens at stride 48, so consecutive chunks
    * share 16 tokens of context (t13 is the non-overlapping packing
    * grid; retrieval pipelines overlap so no answer span straddles a
    * boundary unseen). Every chunk row carries CONTENT bindings — the
    * first/middle/last tokens and the exact character length of the
    * reassembled chunk — so the oracle pins window placement and
    * membership, not just counts. nChunks = 1 + ceil((n-64)/48) in
    * pure integer arithmetic; the final window is allowed short (the
    * standard tail rule).
    *
    * Scale: chunks derive per-row from the token array (explode of a
    * sequence; no self-join, no window function) — the chunk table is
    * the only output-sized thing. */
  private def t30: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val base = d
      .select(col("doc_id"), TF.tokens(lower(col("text"))).as("a"))
      .withColumn("n", size(col("a")).cast(LongType))
      .withColumn("nc", expr(
        "CASE WHEN n <= 64 THEN CAST(1 AS BIGINT) " +
          "ELSE (n - 64 + 47) DIV 48 + 1 END"))
    base
      .select(col("doc_id"), col("a"), col("n"),
        explode(sequence(lit(0L), col("nc") - 1)).as("chunk_idx"))
      .withColumn("chunk_start", col("chunk_idx") * 48L)
      .withColumn("chunk_len", least(lit(64L), col("n") - col("chunk_start")))
      .withColumn("chunk", slice(col("a"),
        (col("chunk_start") + 1).cast("int"), col("chunk_len").cast("int")))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
        col("chunk_len"),
        element_at(col("chunk"), 1).as("first_tok"),
        element_at(col("chunk"),
          expr("CAST((chunk_len + 1) DIV 2 AS INT)")).as("mid_tok"),
        element_at(col("chunk"), col("chunk_len").cast("int")).as("last_tok"),
        length(concat_ws(" ", col("chunk"))).cast(LongType).as("n_chars"))
  }

  private def t13: Q = (spark, dir) => {
    val window = 64
    val d = t(spark, dir, "documents")
    val n = size(TF.tokens(lower(col("text"))))
    d.select(col("doc_id"), n.cast("long").as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L),
          floor((col("n_tokens") + (window - 1)) / window) - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("n_tokens"), col("chunk_idx"),
        (col("chunk_idx") * window).as("chunk_start"),
        least(lit(window.toLong),
          col("n_tokens") - col("chunk_idx") * window).as("chunk_len"))
  }

  private def t1: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    d.select(col("doc_id"),
      size(TF.tokens(col("text"))).as("n_tokens"),
      length(col("text")).as("len_chars"))
  }

  private def t2: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val toks = TF.tokens(lower(col("text")))
    val nTokens = size(toks).cast(DoubleType)
    val uniqRatio = size(array_distinct(toks)).cast(DoubleType) / nTokens
    val stopRatio = TF.markerCount(toks, Seq("the", "a", "of", "and", "is"))
      .cast(DoubleType) / nTokens
    val avgTokLen = length(regexp_replace(col("text"), " ", ""))
      .cast(DoubleType) / nTokens
    d.select(col("doc_id"),
      size(toks).as("n_tokens"),
      uniqRatio.as("uniq_ratio"),
      stopRatio.as("stop_ratio"),
      avgTokLen.as("avg_token_len"),
      (uniqRatio * 0.5 + stopRatio * 0.3 +
        least(avgTokLen / 10.0, lit(1.0)) * 0.2).as("quality"))
  }

  private def t3: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val guess = TF.langGuess(TF.tokens(lower(col("text"))))
    d.select(col("doc_id"), guess.as("lang_guess"),
      (guess === col("lang")).as("is_match"))
  }

  private def t4: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    d.select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
  }

  /** BPE-ish subword counting: alpha runs, digit runs, and single
    * punctuation marks as units — the regex pre-tokenization step of a
    * byte-pair tokenizer (counts approximate LLM token budgets). */
  private def t5: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val units = regexp_extract_all(lower(col("text")),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))
    d.select(col("doc_id"),
      size(units).as("n_units"),
      size(array_distinct(units)).as("n_uniq_units"),
      // subword length proxy: total unit chars / units (single division)
      (aggregate(transform(units, u => length(u)), lit(0),
        (acc, x) => acc + x).cast(DoubleType) /
        size(units).cast(DoubleType)).as("avg_unit_len"))
  }

  /** Native codegen'd rolling-hash fingerprint (RollingHash Expression).
    * Oracle-checked exactly: the per-byte recurrence h = (h*B + byte)
    * mod 2^31-1 stays under 2^52, so DuckDB replays it verbatim in a
    * recursive CTE over hex(encode(...)) byte pairs; value correctness
    * additionally pinned by RollingHashSpec (interpreted == codegen). */
  private def t6: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    d.select(col("doc_id"),
      graft.functions.RollingHash.rolling_hash(
        TF.normText(col("text"))).as("rfp"))
  }

  /** Deterministic train/val/test assignment by content hash — the
    * reproducible way to split at 100 TB: no RNG state, stable across
    * retries and re-runs, and duplicate documents land in the same
    * split (hash of content, not of position). ~90/5/5 via the first
    * two hex digits of the canonical-text md5. */
  private def t7: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    // lowercase two-digit hex compares lexicographically == numerically,
    // so the bucket boundaries are plain string comparisons ('e6' = 230,
    // 'f3' = 243 of 256 → ~90/5/5), identical in any engine
    val bucket = substring(TF.fingerprint(col("text")), 1, 2)
    d.select(col("doc_id"),
      when(bucket < "e6", "train").when(bucket < "f3", "val")
        .otherwise("test").as("split"))
  }

  /** Corpus-statistics scoring: every token joined against the global
    * frequency table (built once, broadcast back) — the shape of
    * LM-likelihood / rare-token quality filters at 100 TB: the corpus
    * aggregate is tiny relative to the data and broadcasts, the data
    * itself never shuffles twice. Integer-only outputs (frequency mass,
    * rare-token count) keep the oracle exact — a log-prob variant would
    * hinge on cross-engine libm bit-parity. */
  private def t8: Q = (spark, dir) => {
    val spark2 = spark
    import spark2.implicits._
    val toks = t(spark, dir, "documents")
      .select(col("doc_id").cast("long"), col("text").cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        text.trim.toLowerCase.split("\\s+").iterator.map(w => (id, w))
      }
      .toDF("doc_id", "tok")
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    // no broadcast hint: the unigram vocabulary is Zipf-bounded so AQE
    // broadcasts it at any realistic scale — but the hint buys nothing
    // AQE wouldn't do, and a 10^8-row vocabulary must be allowed to
    // degrade to a shuffle join (the t34 idiom).
    toks.join(freq, "tok")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("cnt")).as("freq_mass"),
        sum(when(col("cnt") < 1000, 1L).otherwise(0L)).as("n_rare"))
  }

  /** Balanced per-language quota sample: the N docs with the smallest
    * content hash per language — deterministic "random" sampling without
    * RNG state (stable across retries, content-addressed), the
    * rebalancing step of a multilingual training mix. Distributed via
    * TopK.perKey: per-partition streaming prune, tiny final window. */
  private def t9: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), TF.fingerprint(col("text")).as("fp"))
    graft.operators.TopK.perKey(d, Seq("lang"),
        Seq(col("fp"), col("doc_id")), k = 50)
      .select(col("lang"), col("rank"), col("doc_id"))
  }

  private def d1: Q = (spark, dir) =>
    Dedup.exactDuplicates(t(spark, dir, "documents"))

  /** Benchmark decontamination: drop training documents whose canonical
    * fingerprint appears in a held-out set (stand-in: doc_id % 20 == 0)
    * — the cross-corpus exact-match filter every training pipeline runs
    * before a data release. Anti-join on the fingerprint: broadcast-able
    * when the benchmark corpus is small. */
  private def d6: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val fp = TF.fingerprint(col("text"))
    val benchmark = d.filter(col("doc_id") % 20 === 0).select(fp.as("bfp"))
    d.select(col("doc_id"), fp.as("fp"))
      .join(benchmark, col("fp") === col("bfp"), "left_anti")
      .select(col("doc_id"), col("fp"))
  }

  private def d2: Q = (spark, dir) =>
    Dedup.jaccardPairs(t(spark, dir, "documents"), jaccardThreshold)

  private def d3: Q = (spark, dir) =>
    Dedup.minHashLshPairs(t(spark, dir, "documents"), jaccardThreshold)

  /** Explicit opt-in to wide routing above 20k docs: at sf0.01/sf0.1
    * (oracle scales) the corpus stays under the limit, so the
    * pigeonhole-complete nibble banding runs and the DuckDB oracle
    * matches exactly; at stress scale the catalog accepts the
    * approximate byte-band candidate class for the 16× smaller
    * in-bucket quadratic (recall of that route is pinned by
    * DedupSimilaritySpec's 25k-doc wide-vs-narrow spec). Library
    * callers who do not pass the limit keep completeness at any size. */
  private def d4: Q = (spark, dir) =>
    Dedup.simHashPairs(t(spark, dir, "documents"), maxHamming = 15,
      threshold = jaccardThreshold, autoWideDocLimit = 20000L)

  /** Widened 128-bit sketch, 16 byte-bands (1/256 selectivity) — the
    * scale path for corpora where 4-bit bands over-collide; maxHamming
    * scales ~2× with the doubled sketch width. */
  private def d7: Q = (spark, dir) =>
    Dedup.simHashPairs128(t(spark, dir, "documents"), maxHamming = 31,
      threshold = jaccardThreshold)

  /** Embedding-cosine near-dup pairs. The synthetic embeddings are
    * near-orthogonal random vectors (max pairwise cosine ≈ 0.6 at sf0.1),
    * so the demo threshold is 0.4; real text embeddings cluster and a
    * production threshold sits near 0.9. Exact baseline is oracle-checked;
    * the LSH scale path is spec-checked for recall (DedupSimilaritySpec). */
  private def d5: Q = (spark, dir) =>
    Dedup.embeddingCosinePairs(t(spark, dir, "embeddings"), 0.4)

  /** Semantic decontamination (d14): the embedding-space pass of the
    * decontamination family — d6 catches verbatim eval leakage, d12
    * catches shared shingles, d11 probes a Bloom of eval fingerprints;
    * this one catches PARAPHRASED leakage by cosine proximity to a
    * benchmark embedding. Eval side = the deterministic vec_id % 53
    * slice (a stand-in for a held-out benchmark table); corpus = the
    * rest; anything within cosine 0.3 of any eval vector is dropped.
    * Zero-shuffle single scan — see [[Dedup.embeddingDecontaminate]]. */
  private def d14: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Dedup.embeddingDecontaminate(
      e.filter(col("vec_id") % 53 =!= 0),
      e.filter(col("vec_id") % 53 === 0),
      threshold = 0.3)
  }

  /** Near-dup pairs → per-document components: the keep/drop decision.
    * Pairs come from the LSH path (oracle-equal to the exact pair set),
    * components from distributed min-label propagation; the DuckDB
    * oracle closes the same edge set with a recursive CTE — the hash
    * match proves the distributed propagation reaches the exact
    * transitive closure. */
  private def d9: Q = (spark, dir) =>
    Dedup.duplicateComponents(
      Dedup.minHashLshPairs(t(spark, dir, "documents"), jaccardThreshold))

  /** Soft dedup (d17): keep EVERY document but downweight duplicates
    * by 1/|cluster| — the RefinedWeb-style alternative to hard removal
    * (total sampling mass per duplicate cluster stays 1.0, so no
    * content is lost while repeated text stops dominating the mix).
    * Clusters are d9's minhash-LSH connected components; singletons
    * get weight 1.0. The weight is one small-int reciprocal, IEEE-
    * identical across engines.
    *
    * Scale: d9's component cost plus one groupBy(comp) and a
    * comp-keyed join — both on label-sized tables, not the corpus
    * text. */
  private def d17: Q = (spark, dir) => {
    val comp = Dedup.duplicateComponents(
        Dedup.minHashLshPairs(t(spark, dir, "documents"), jaccardThreshold))
      .select(col("doc_id"), col("comp"))
    val all = t(spark, dir, "documents").select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
    val sizes = all.groupBy(col("comp")).agg(count(lit(1)).as("n_members"))
    all.join(sizes, "comp")
      .select(col("doc_id"), col("comp"), col("n_members"),
        (lit(1.0) / col("n_members").cast(DoubleType)).as("weight"))
  }

  /** Incremental dedup against a base corpus (d18): the shape a DAILY
    * crawl pipeline actually runs at 100 TB — the accumulated corpus is
    * never re-deduped; only the incoming batch (here doc_id % 10 >= 8,
    * 20%) is checked against the base (80%). Two stages, both
    * incoming-sized: an exact-fingerprint equi-join (md5 — the d1
    * fingerprint), and MinHash-LSH band buckets joined CROSS-SIDE ONLY
    * (incoming bands ⋈ base bands — no base×base candidate is ever
    * generated, which is the property that makes the daily run
    * O(incoming), not O(corpus)) followed by d3's exact shingle
    * verify. At production scale the base band table is a maintained
    * materialization (computed once per doc at ingest); here both
    * sides come from the same zero-shuffle banding map. Per incoming
    * doc: status 2 = exact dup of base, 1 = near dup (Jaccard >=
    * 0.8), 0 = genuinely new, plus the matched base doc (min id,
    * exact match preferred) and the count of near-dup base partners.
    * Oracle: exhaustive exact cross-pair Jaccard in SQL — the banding
    * recall gate d2/d3 established, restricted to cross pairs. */
  private def d18: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
    val base = docs.filter(col("doc_id") % 10 < 8)
    val inc = docs.filter(col("doc_id") % 10 >= 8)
    val exact = inc.select(col("doc_id"), md5(col("text")).as("fp"))
      .join(base.select(md5(col("text")).as("fp"),
        col("doc_id").as("bid")), "fp")
      .groupBy(col("doc_id")).agg(min(col("bid")).as("exact_base"))
    val ib = Dedup.minHashBandsFromDocs(inc)
      .select(col("doc_id").as("a_id"), col("band_idx"), col("band_hash"))
    val bb = Dedup.minHashBandsFromDocs(base)
      .select(col("doc_id").as("b_id"), col("band_idx"), col("band_hash"))
    val cand = ib.join(bb, Seq("band_idx", "band_hash"))
      .select(col("a_id"), col("b_id")).distinct()
    val near = Dedup
      .verifyCandidates(cand, Dedup.docShingleHashes(docs), jaccardThreshold)
      .groupBy(col("a_id"))
      .agg(min(col("b_id")).as("near_base"), count(lit(1)).as("n_near"))
      .withColumnRenamed("a_id", "doc_id")
    inc.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(near, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_base").isNotNull, 2)
          .when(col("near_base").isNotNull, 1).otherwise(0).as("status"),
        coalesce(col("exact_base"), col("near_base")).as("match_id"),
        coalesce(col("n_near"), lit(0L)).as("n_near_base"))
  }

  /** In-document repetition filters (t31): the REPETITION half of the
    * published Gopher/MassiveText quality battery (t28 covers the
    * length/symbol/stopword half) — excessive within-document
    * repetition is the single strongest gibberish signal a pretraining
    * pipeline filters on. Adapted to this corpus' single-line
    * whitespace tokens: per doc, the character coverage of the single
    * most frequent word n-gram for n = 2, 3, 4 (cnt × gram length,
    * most-frequent-then-lexicographic tie-break) and the total
    * coverage of DUPLICATED 5-grams (all occurrences of grams with
    * cnt >= 2; overlaps counted per occurrence — deterministic and
    * integer-exact, a documented divergence from character-merged
    * coverage). Thresholds are the published ones (0.20/0.18/0.16
    * top-n-gram, 0.15 dup-n-gram) as cross-multiplied integer
    * comparisons into a reasons bitmask — no float anywhere.
    *
    * Scale: every statistic is PER-DOCUMENT, so the whole battery is
    * one zero-shuffle typed pass (the simHashesFromDocs pattern —
    * per-doc hash maps over the token stream, nothing leaves the map
    * side but one row per doc). The first cut of this query shuffled
    * a corpus-sized (doc, n, gram) count table instead — 13.9s at
    * sf0.1 vs ~0.3s for this form, a 40x lesson in keeping per-row
    * semantics out of the exchange. */
  private def t31: Q = (spark, dir) => {
    val spark2 = spark
    import spark2.implicits._
    t(spark, dir, "documents").select(col("doc_id"), col("text"))
      .as[(Long, String)].map { case (id, text) =>
        val den = text.length.toLong
        val ws = text.trim.toLowerCase.split("\\s+")
        def counts(n: Int): java.util.HashMap[String, Long] = {
          val m = new java.util.HashMap[String, Long]()
          var i = 0
          while (i + n <= ws.length) {
            val sb = new StringBuilder(ws(i))
            var j = 1
            while (j < n) { sb.append(' ').append(ws(i + j)); j += 1 }
            m.merge(sb.toString, 1L, (a, b) => a + b)
            i += 1
          }
          m
        }
        // cnt x gram length of the single most frequent n-gram,
        // (cnt DESC, gram ASC) tie-break — same total order as the
        // oracle's row_number
        def topCov(n: Int): Long = {
          val m = counts(n)
          var bestG: String = null
          var bestC = 0L
          m.forEach { (g, c) =>
            if (c > bestC || (c == bestC && (bestG == null || g < bestG))) {
              bestC = c; bestG = g
            }
          }
          if (bestG == null) 0L else bestC * bestG.length
        }
        def dup5Cov: Long = {
          var s = 0L
          counts(5).forEach { (g, c) => if (c > 1) s += c * g.length }
          s
        }
        val top2 = topCov(2); val top3 = topCov(3); val top4 = topCov(4)
        val d5 = dup5Cov
        val reasons = (if (top2 * 100 > den * 20) 1 else 0) +
          (if (top3 * 100 > den * 18) 2 else 0) +
          (if (top4 * 100 > den * 16) 4 else 0) +
          (if (d5 * 100 > den * 15) 8 else 0)
        (id, den, top2, top3, top4, d5, reasons, reasons == 0)
      }.toDF("doc_id", "n_chars", "top2_cov", "top3_cov", "top4_cov",
        "dup5_cov", "reasons", "keep")
  }

  /** SemDeDup-shaped cluster-then-dedup: 8 deterministic seed centroids
    * (lowest vec_ids) keep the assignment SQL-reproducible, so the
    * within-cluster pair set is oracle-checked EXACTLY — the operator's
    * approximation (dropped cross-cluster pairs) is part of its defined
    * semantics, not an excuse to skip the hash check. */
  private def d8: Q = (spark, dir) =>
    Dedup.semanticPairs(t(spark, dir, "embeddings"), 0.4, nClusters = 8)

  /** GPT-style sequence packing (concat-and-chunk): documents are laid
    * out in a deterministic order inside hash-bucketed streams, token
    * offsets accumulate per stream, and each doc maps to the fixed
    * 256-token training sequences it lands in (`seq_first`..`seq_last`).
    *
    * Scale shape: packing inherently needs a total order per OUTPUT
    * STREAM, not per corpus — the cumulative-sum window partitions by
    * bucket (16 streams here; one per output shard at cluster scale), so
    * no single-reducer global sort exists. One shuffle on the bucket. */
  private def t14: Q = (spark, dir) => {
    val budget = 256
    val d = t(spark, dir, "documents")
    val base = d.select(col("doc_id"),
      size(TF.tokens(lower(col("text")))).cast(LongType).as("n_tokens"),
      TF.fingerprint(col("text")).as("fp"))
      .withColumn("bucket", substring(col("fp"), 1, 1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("fp"), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    base
      .withColumn("seq_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col("doc_id"), col("bucket"), col("n_tokens"), col("seq_offset"),
        floor(col("seq_offset") / budget).cast(LongType).as("seq_first"),
        floor((col("seq_offset") + col("n_tokens") - 1) / budget)
          .cast(LongType).as("seq_last"))
  }

  /** Deterministic global corpus shuffle (the training-order reorder):
    * every doc gets its exact 0-based position in the corpus ordered by
    * content fingerprint — a reproducible pseudo-random permutation
    * (retry- and re-run-stable, no RNG state).
    *
    * Scale shape — distributed enumerate, NOT a global sort: the fp's
    * first hex byte is its bucket AND its order prefix, so global rank =
    * bucket offset + rank within bucket. Per-bucket counts (256 rows)
    * broadcast back as prefix-sum offsets; ranks come from windows
    * partitioned per bucket. A naive `row_number() OVER (ORDER BY fp)`
    * funnels the corpus into ONE reducer — this never does (plan-shape
    * asserted). */
  private def t15: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val base = d.select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
      .withColumn("bucket", substring(col("fp"), 1, 2))
    val offsets = base.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("bucket"), col("offset"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("fp"), col("doc_id"))
    base
      .withColumn("r", row_number().over(w).cast(LongType))
      .join(broadcast(offsets), "bucket")
      .select(col("doc_id"), col("fp"),
        (col("offset") + col("r") - 1).as("shuffle_pos"))
  }

  /** C4-style duplicate-segment removal over the whole corpus (d10):
    * 8-token segments appearing in >= 2 distinct docs vanish everywhere;
    * output pins counts AND the reassembled surviving text per doc. */
  private def d10: Q = (spark, dir) =>
    Dedup.segmentDedup(t(spark, dir, "documents"), segTokens = 8, minDocs = 2)

  /** Bloom-filter decontamination — d6's zero-shuffle scale path: the
    * benchmark fingerprints aggregate into ONE mergeable Bloom binary
    * (driver-held artifact, like IVF centroids), which broadcasts inside
    * the filter literal; the corpus pass is a codegen'd scan-side probe.
    * Approximate (bounded false-positive removals, never false
    * negatives) yet fully deterministic: the fingerprint is fnv64 (a
    * LongType — half the shuffle width of md5 hex, and xxhash64 of a
    * long is the short fixed path), so build-side bit positions and
    * every probe replay exactly in the SQL oracle. Containment/FPR/
    * merge contracts additionally asserted in DedupSimilaritySpec. */
  private def d11: Q = (spark, dir) => {
    import graft.functions.Bloom._
    val d = t(spark, dir, "documents")
    val fp = graft.functions.Fnv64.fnv64(TF.normText(col("text")))
    val blob = d.filter(col("doc_id") % 20 === 0)
      .agg(bloom_build(fp, expectedItems = 4096, fpp = 1e-4).as("bf"))
      .head().getAs[Array[Byte]](0)
    d.select(col("doc_id"), fp.as("fp"))
      .filter(!bloom_might_contain(lit(blob), col("fp")))
  }

  /** N-gram decontamination (the GPT-3/PaLM contract): a document is
    * contaminated if it shares ANY 8-token shingle with the held-out
    * benchmark — catching partial/embedded leakage that the doc-level
    * fingerprint anti-join (d6) misses. Exact and oracle-checked.
    *
    * Scale shape: the corpus shingle stream semi-joins the (much
    * smaller) benchmark shingle set on the shingle key — one shuffle of
    * the corpus shingles, benchmark side broadcast-able; the surviving
    * doc set anti-joins back on doc_id. At 100 TB the benchmark side
    * compiles into a Bloom filter exactly as d11 does for fingerprints
    * (same scan-side probe, shingle-level), trading bounded
    * over-removal for the shuffle. */
  private def d12: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val sh = Dedup.docShingles(d, n = 8)
    val bsh = sh.filter(col("doc_id") % 20 === 0)
      .select(col("shingle").as("bs")).distinct()
    val contaminated = sh
      .join(bsh, col("shingle") === col("bs"), "left_semi")
      .select(col("doc_id")).distinct()
    d.select(col("doc_id"))
      .join(contaminated.withColumnRenamed("doc_id", "cid"),
        col("doc_id") === col("cid"), "left_anti")
      .select(col("doc_id"))
  }

  /** Epoch-based language upsampling — the integer-exact training-mix
    * repetition pass: low-resource languages repeat for more epochs
    * (ceil(max_lang_count / lang_count), capped at 4) so the mix
    * flattens without fractional sampling. Output is one row per
    * (doc, epoch) — the materialized mix a trainer consumes.
    *
    * Scale shape: the per-lang count table is tiny and broadcasts; the
    * repetition is a zero-shuffle generator (explode over a sequence)
    * on top of it — one aggregation shuffle total, any corpus size. */
  private def t16: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val maxN = counts.agg(max(col("n_lang"))).head().getLong(0)
    val epochs = counts.select(col("lang"),
      least(lit(4L), floor((lit(maxN) + col("n_lang") - 1) / col("n_lang")))
        .cast(LongType).as("n_epochs"))
    d.select(col("doc_id"), col("lang"))
      .join(broadcast(epochs), "lang")
      .select(col("doc_id"), col("lang"), col("n_epochs"),
        explode(sequence(lit(1L), col("n_epochs"))).as("epoch"))
  }

  /** Real BPE tokenization (t17): merges trained on the deterministic
    * lowest-100 doc sample (bounded driver artifact, the production
    * shape — GPT-2's vocabulary trained on a corpus subset), corpus
    * encoded in one zero-shuffle broadcast pass. Round 19 closed the
    * long-standing no_oracle: the t23 oracle generator unrolls to ANY
    * merge count, and bpeOracleSql(200) replays all 200 training
    * rounds + the recursive-CTE encode in DuckDB in ~34s at sf0.01 AND
    * sf0.1 (training cost is dominated by the fixed 100-doc sample, so
    * the unroll doesn't grow with corpus scale) — full equality oracle,
    * same as t23. */
  /** BPE at a bounded merge count (t23): the identical train + encode
    * pipeline as t17 — same sample, same greedy tie-break, same
    * rank-loop encode, same checksum — at 8 merges instead of 200,
    * which brings the whole algorithm inside SQL reach: the 8 training
    * rounds unroll as CTE layers (pair-count → arg-best → greedy
    * left-to-right rewrite via run-parity windows) and the encode loop
    * replays as a recursive CTE picking the lowest-rank leftmost pair
    * per step, exactly [[graft.functions.Bpe.encodeWord]]'s semantics.
    * A green hash here pins train AND encode end-to-end; t17 keeps the
    * realistic 200-merge config with its checksum/spec coverage — the
    * same isolate-the-replayable-regime precedent as k5/k3. */
  private def t23: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val merges = graft.functions.Bpe.trainMerges(d, numMerges = 8,
      sampleDocs = 100)
    graft.functions.Bpe.encode(d, merges)
  }

  private def t17: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val merges = graft.functions.Bpe.trainMerges(d, numMerges = 200,
      sampleDocs = 100)
    graft.functions.Bpe.encode(d, merges)
  }

  private def s1: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Similarity.bruteForceKnn(e, e.filter(col("vec_id") < 8), k = 4)
  }

  private def s2: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Similarity.lshKnn(e, e.filter(col("vec_id") < 8), k = 4, bits = 4)
  }

  /** ANN recall@k evaluation (s14): the eval harness every ANN
    * deployment runs before trusting an index — per query, how many of
    * the EXACT top-k (s1's brute force) the LSH index (s2) returned.
    * Both operands are the catalog's own operators, and the oracle
    * composes their two already-graded SQL replays verbatim, so this
    * row certifies the evaluation JOIN itself, not a re-derivation.
    * Per-query k, hit count and recall; recall is one small-int
    * division, engine-exact.
    *
    * Scale: both sides are query-bounded (32 rows per query max); the
    * join and aggregate never touch the corpus — the expensive parts
    * are the operands, already measured on their own rows. */
  private def s14: Q = (spark, dir) => {
    val exact = s1(spark, dir).select(col("query_id"), col("neighbor_id"))
    val approx = s2(spark, dir).select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("k"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("k"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast(DoubleType) / col("k"))
          .as("recall"))
  }

  /** Cosine radius search (s11): all neighbors within sim ≥ 0.25 —
    * the complete-neighborhood variant of s1 (same broadcast-query ×
    * corpus-scan shape, no rank window at all). */
  private def s11: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Similarity.rangeSearch(e, e.filter(col("vec_id") < 8), tau = 0.25)
  }

  /** Hyperplane-LSH parameter sweep (s16): per signature width
    * {4, 8, 12}, precision/recall of single-probe bucket candidates
    * against s11's exact cosine >= 0.25 neighborhood of the same
    * 8-query set — the bits dial every LSH operator here exposes,
    * measured instead of guessed. One lshSignatures pass serves all
    * widths (a width-b signature is the low b bits of the widest). */
  private def s16: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Similarity.lshParameterSweep(e, e.filter(col("vec_id") < 8),
      tau = 0.25, bitsList = Seq(4, 8, 12))
  }

  /** MIPS top-k (s17): max-inner-product retrieval over unnormalized
    * embeddings via the norm-augmentation reduction — see
    * [[graft.operators.Similarity.mipsKnn]]. Emits both the raw inner
    * product and the augmented cosine a cosine index would rank by;
    * the oracle replays the augmentation (max corpus norm, appended
    * √(M²−‖x‖²) slot) and both doubles exactly. */
  private def s17: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Similarity.mipsKnn(e, e.filter(col("vec_id") < 8), k = 4)
  }

  /** Hard-negative mining (s18): per query, the top-4 most-cosine-
    * similar corpus vectors of a DIFFERENT label — the contrastive-
    * training negative selection (DPR-style), s1's scan shape with the
    * label predicate pushed into the candidate join. See
    * [[graft.operators.Similarity.hardNegatives]]. */
  private def s18: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Similarity.hardNegatives(e, e.filter(col("vec_id") < 8), k = 4)
  }

  /** LSH nearest-neighbor JOIN (s12): both sides corpus-sized — each
    * odd vec_id joined to its top-4 nearest EVEN vec_ids through the
    * shared 8-bit hyperplane bucket space; a shuffle join on the
    * signature, no broadcast side at all. See [[Similarity.nnJoin]]. */
  private def s12: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Similarity.nnJoin(e.filter(col("vec_id") % 2 === 1),
      e.filter(col("vec_id") % 2 === 0), k = 4, bits = 8)
  }

  private def s3: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Similarity.ivfKnn(e, e.filter(col("vec_id") < 8), k = 4)
  }

  /** Multi-probe LSH ANN: same bucket granularity as s2 but each query
    * additionally probes the `probes` lowest-margin bit flips.
    * Approximate by design yet fully deterministic (splitmix64 planes),
    * so the bucketing + probe order replay exactly in the SQL oracle;
    * recall-vs-s2 additionally asserted in spec. */
  private def s4: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Similarity.multiProbeLshKnn(e, e.filter(col("vec_id") < 8), k = 4,
      bits = 8, probes = 4)
  }

  /** Scalar-quantized ANN: int8 codes scanned approximately, exact
    * rerank on the rerank·k survivors. Approximate by design yet fully
    * deterministic (normalize → maxAbs scale → Math.round → double
    * dots, every fold ascending-index), so the whole pipeline —
    * quantization included — replays exactly in the SQL oracle; recall
    * + bit-exact-rerank additionally asserted in DedupSimilaritySpec. */
  private def s5: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Similarity.sqKnn(e, e.filter(col("vec_id") < 8), k = 4, rerank = 4)
  }

  /** Product-quantized ANN: m-byte codes (32× smaller than float64)
    * scanned by ADC table lookups, exact rerank of rerank·k survivors.
    * Approximate by design yet fully deterministic (seed codebooks from
    * the lowest-16 ids, one Lloyd sweep with integer-quantized means,
    * ascending-index L2 folds, total tie-breaks), so training, ADC scan
    * and rerank all replay exactly in the SQL oracle;
    * full-cover-equals-brute-force and recall contracts in
    * DedupSimilaritySpec. */
  private def s6: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Similarity.pqKnn(e, e.filter(col("vec_id") < 8), k = 4,
      m = 8, nCodes = 16, rerank = 8)
  }

  /** IVF + PQ composite ANN (s15): the FAISS IVFPQ layout — s3's cell
    * routing OVER s6's m-byte codes, the genuine 100 TB serving shape
    * (a query scans only its probed cells' codes: nProbe/nCells of the
    * corpus at 32× fewer bytes, then an exact rerank of rerank·k ids).
    * Approximate by design yet fully deterministic — routing, codebook
    * training, ADC scan and rerank all replay exactly in the SQL
    * oracle; full-cover-equals-brute-force and planted-duplicate
    * contracts in DedupSimilaritySpec. */
  private def s15: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Similarity.ivfPqKnn(e, e.filter(col("vec_id") < 8), k = 4,
      nCells = 16, nProbe = 4, m = 8, nCodes = 16, rerank = 8)
  }

  /** BM25 retrieval scoring (t21): the classic Robertson/Spärck-Jones
    * ranking, engine-exact. The query is the corpus's own top-3
    * non-stopword terms by document frequency (deterministic:
    * df DESC, term ASC) — the "what does this corpus rank highly for
    * its dominant topics" probe. The one non-rational piece of textbook
    * BM25 is ln() in the IDF, whose last-ulp rounding differs across
    * libm implementations, so the IDF is re-expressed in its exact
    * rational form (N − df + ½)/(df + ½) — same precedent as t19's
    * KenLM re-expression. Every remaining operation is a fixed-order
    * IEEE expression over exact integer operands (tf, df, dl, N,
    * avgdl = T/N), written token-for-token identically in both engines,
    * and the ≤3 per-term contributions fold in EXPLICIT rank order
    * (c1 + c2 + c3), never through an order-free SUM — double addition
    * is not associative, so a 3-term SUM would already be
    * nondeterministic.
    *
    * Scale: tf and df are map-side-combined shuffles on the token; the
    * 3-row query table and the 1-row corpus stats broadcast; the final
    * top-10 is a sort of per-doc scores. The query-term selection
    * collects 3 rows — queries are small by nature. */
  private def t21: Q = (spark, dir) => {
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), explode(TF.tokens(lower(col("text")))).as("tok"))
    // One tokenize+shuffle pass: dl, the corpus stats, df, and the scoring
    // join all derive from the per-(doc,tok) counts, which are ~an order of
    // magnitude smaller than the raw token stream. Persisted because the
    // plan reads tf four times (query-term selection, tf join, dl, stats);
    // without the cache each branch re-tokenizes the whole corpus. Same
    // integer operands as before: df = #docs containing tok = row count in
    // tf; dl = token count per doc = SUM(tf) — the BM25 doubles and their
    // fold order are untouched, so the oracle still matches bit-for-bit.
    // CachePool bounds the pinned copies to one across bench reps.
    val tf = CachePool.persistLatest("t21.tf",
      toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("nd"), sum(col("dl")).as("tt"))
      .select(col("nd"), (col("tt").cast(DoubleType) / col("nd")).as("avgdl"))
    val dfTab = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val stop = Seq("the", "a", "of", "and", "is", "to", "in")
    // Query-term selection stays IN the plan: a row_number over the
    // 3-row TopK output (same (df DESC, tok) order and tie-break as
    // the limit, so ranks are identical to the former collect-side
    // zipWithIndex) — one job per invocation instead of two; the
    // collect variant paid a full extra pass over tf plus a driver
    // round-trip every bench rep.
    val qdf = dfTab.filter(!col("tok").isin(stop: _*))
      .orderBy(col("df").desc, col("tok")).limit(3)
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("df").desc, col("tok"))))
    val contrib = tf.join(broadcast(qdf), "tok").join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("r"),
        (((col("nd") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))).as("c"))
    contrib.groupBy(col("doc_id"))
      .agg((coalesce(max(when(col("r") === 1, col("c"))), lit(0.0)) +
        coalesce(max(when(col("r") === 2, col("c"))), lit(0.0)) +
        coalesce(max(when(col("r") === 3, col("c"))), lit(0.0))).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(10)
  }

  /** Per-document n-gram novelty (t22): what fraction of a document's
    * distinct 3-gram shingles appear in NO earlier document (doc_id
    * order = corpus order) — the per-doc "marginal contribution"
    * metric behind greedy dedup-aware data selection: a doc whose
    * shingles are all claimed by earlier docs is pure repetition (the
    * d2/d3 pair view tells you WHO duplicates; this scores HOW MUCH of
    * each doc is new). Integer-exact counts; the ratio is one exact
    * int/int double division.
    *
    * Scale: reuses the d2 inverted index (one shuffle on the shingle);
    * first-claimant is a min aggregate, not a window; joining the
    * index back is shingle-keyed — frequent-shingle skew is the same
    * risk d2 documents, with the same mitigation path (LSH banding). */
  private def t22: Q = (spark, dir) => {
    // d2's dictionary-encoded index (fnv64 longs, the documented ~1e-9
    // collision class), not the string shingles: 8-byte keys through
    // the shuffle, and the repartition pins ONE exchange that both the
    // first-claimant aggregation and the claim join reuse — the typed
    // shingle pass runs once per query instead of twice. Counts are
    // DISTINCT-shingle counts either way, so rows are unchanged.
    val sh = Dedup.docShingleHashes(t(spark, dir, "documents"))
      .repartition(col("s"))
    val first = sh.groupBy(col("s")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, "s")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        (col("n_novel").cast(DoubleType) / col("n_shingles")).as("novelty"))
  }

  /** Spherical k-means cluster assignment (s7): the SemDeDup topology —
    * 3 Lloyd rounds over integer-quantized embeddings, seeded by the
    * first k vectors. Fully oracle-checked (assignment AND both centroid
    * updates replay exactly in DuckDB: integer sums are order-free, the
    * cosine folds share the ascending-index order). See
    * [[graft.operators.Clustering]] for the exactness argument. */
  private def s7: Q = (spark, dir) =>
    Clustering.kmeansAssign(t(spark, dir, "embeddings"), k = 8, iters = 3)

  /** k-NN label-vote classification (s8): the embedding-space eval for
    * "does this representation separate the classes" — each of the first
    * 64 vectors is classified by the majority label of its 8 exact
    * cosine neighbors. Fully oracle-checked: the neighbor set replays
    * s1's proven-portable cosine fold, the vote is integer counting. */
  private def s8: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Similarity.knnClassify(e, e.filter(col("vec_id") < 64), k = 8)
  }

  /** MMR diverse top-k (s10): each query's 4 picks from its 8-candidate
    * exact pool, balancing relevance against redundancy (λ = 0.5) — the
    * diverse-retrieval / eval-set-construction primitive. Greedy steps
    * replay exactly in the oracle's unrolled CTEs (the s7 precedent). */
  private def s10: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Similarity.mmrSelect(e, e.filter(col("vec_id") < 8),
      poolK = 8, k = 4, lam = 0.5)
  }

  /** Cluster purity vs ground-truth labels (s9): composes s7's bit-exact
    * k-means assignment with the label column — the curation readout for
    * "did clustering recover the domains". Purity is an exact small-int
    * division, identical in both engines. */
  private def s9: Q = (spark, dir) => {
    val e = t(spark, dir, "embeddings")
    Clustering.clusterPurity(Clustering.kmeansAssign(e, k = 8, iters = 3), e)
  }

  /** DuckDB replay of the d9 connected-components pipeline (WITH ... comp
    * = (doc_id, component-min) over the exact-jaccard 0.8 pair graph);
    * shared by the d9 and p4 oracles. */
  private val componentsCte =
    """WITH RECURSIVE words AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
      |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s FROM words),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS aid, b.doc_id AS bid, count(*) AS n
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |p AS (SELECT aid, bid FROM inter
      |      JOIN sizes s1 ON aid = s1.doc_id JOIN sizes s2 ON bid = s2.doc_id
      |      WHERE CAST(n AS DOUBLE) / (s1.sz + s2.sz - n) >= 0.8),
      |edges AS (SELECT aid AS src, bid AS dst FROM p
      |          UNION SELECT bid, aid FROM p),
      |reach(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
      |comp AS (SELECT src AS doc_id,
      |           least(src, MIN(dst)) AS comp
      |         FROM reach GROUP BY src)""".stripMargin

  /** DuckDB replay of t28's Gopher rule battery as a reusable CTE chain
    * (yields `z` = (doc_id, n, n_lines, reasons)); shared by the t28
    * and p6 oracles. */
  private val gopherCtes =
    """x AS (SELECT doc_id, text,
      |    regexp_split_to_array(lower(trim(text)), '\s+') AS w,
      |    string_split(text, chr(10)) AS ln FROM documents),
      |y AS (SELECT doc_id,
      |    CAST(len(w) AS BIGINT) AS n,
      |    CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS chars,
      |    CAST(length(text) - length(translate(text, '#', '')) AS BIGINT) AS hashes,
      |    CAST((length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))) // 3 AS BIGINT) AS ells,
      |    CAST(len(ln) AS BIGINT) AS n_lines,
      |    CAST(len(list_filter(ln, l -> starts_with(ltrim(l), '-')
      |      OR starts_with(ltrim(l), '*'))) AS BIGINT) AS bullet,
      |    CAST(len(list_filter(ln, l -> ends_with(rtrim(l), '...'))) AS BIGINT) AS ell_end,
      |    CAST(len(list_filter(w, t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS alpha,
      |    CAST(len(list_filter(['the','a','of','and','is'],
      |      s -> list_contains(w, s))) AS BIGINT) AS stop_hits
      |  FROM x),
      |z AS (SELECT doc_id, n, n_lines,
      |    CAST((CASE WHEN n < 50 OR n > 100000 THEN 1 ELSE 0 END)
      |     + (CASE WHEN 3*n > chars OR chars > 10*n THEN 2 ELSE 0 END)
      |     + (CASE WHEN 10*(hashes + ells) > n THEN 4 ELSE 0 END)
      |     + (CASE WHEN 10*bullet > 9*n_lines THEN 8 ELSE 0 END)
      |     + (CASE WHEN 10*ell_end > 3*n_lines THEN 16 ELSE 0 END)
      |     + (CASE WHEN 10*alpha < 8*n THEN 32 ELSE 0 END)
      |     + (CASE WHEN stop_hits < 2 THEN 64 ELSE 0 END) AS BIGINT) AS reasons
      |  FROM y)""".stripMargin

  /** DuckDB replay of s13's farthest-point selection: the same
    * integer-quantized vectors as the kmeans oracle, squared-Euclidean
    * distances as EXACT integer sums, each round's pick unrolled as
    * `ORDER BY md DESC, vec_id LIMIT 1` over the carried min-distance
    * column — the selection sequence the engine produces, value for
    * value. */
  private def s13OracleSql: String = {
    val k = 6
    def dist(a: String, b: String): String =
      s"CAST(list_sum(list_transform(range(1, len($a)+1), i -> ($a[i]-$b[i])*($a[i]-$b[i]))) AS BIGINT)"
    val head =
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1024)) AS v
         |  FROM embeddings),
         |c1 AS (SELECT vec_id, v, CAST(0 AS BIGINT) AS md FROM e
         |       WHERE vec_id = (SELECT min(vec_id) FROM e)),
         |m1 AS (SELECT e.vec_id, e.v, ${dist("e.v", "c.v")} AS md
         |       FROM e CROSS JOIN c1 c)""".stripMargin
    val rounds = (2 to k).map { r =>
      val pick =
        s"c$r AS (SELECT vec_id, v, md FROM m${r - 1} ORDER BY md DESC, vec_id LIMIT 1)"
      val update = if (r == k) None else Some(
        s"""m$r AS (SELECT m.vec_id, m.v, LEAST(m.md, ${dist("m.v", "c.v")}) AS md
           |       FROM m${r - 1} m CROSS JOIN c$r c)""".stripMargin)
      (pick +: update.toSeq).mkString(",\n")
    }
    val selects = (1 to k)
      .map(r => s"SELECT $r AS step, vec_id, md AS radius FROM c$r")
      .mkString("\nUNION ALL ")
    (head +: rounds).mkString(",\n") + "\n" + selects
  }

  /** DuckDB replay of s7's full k-means iteration (WITH ... a3 =
    * final (vec_id, cid) assignment); shared by the s7 and s9 oracles. */
  private val kmeansCte =
    """WITH e AS (SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1024)) AS v
      |  FROM embeddings),
      |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |a1 AS (SELECT vec_id, v, cid FROM (
        |  SELECT e.vec_id, e.v, c0.cid, row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_dot_product(e.v, c0.cv) /
        |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c0.cv, c0.cv))) DESC,
        |      c0.cid) AS rn
        |  FROM e CROSS JOIN c0) x WHERE rn = 1),
        |s1 AS (SELECT cid, list(sv ORDER BY i) AS cv FROM (
        |  SELECT cid, i, SUM(v[i]) AS sv FROM a1, range(1, 65) t(i) GROUP BY cid, i) y
        |  GROUP BY cid),
        |c1 AS (SELECT c0.cid, COALESCE(s1.cv, c0.cv) AS cv FROM c0 LEFT JOIN s1 USING (cid)),
        |a2 AS (SELECT vec_id, v, cid FROM (
        |  SELECT e.vec_id, e.v, c1.cid, row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_dot_product(e.v, c1.cv) /
        |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c1.cv, c1.cv))) DESC,
        |      c1.cid) AS rn
        |  FROM e CROSS JOIN c1) x WHERE rn = 1),
        |s2 AS (SELECT cid, list(sv ORDER BY i) AS cv FROM (
        |  SELECT cid, i, SUM(v[i]) AS sv FROM a2, range(1, 65) t(i) GROUP BY cid, i) y
        |  GROUP BY cid),
        |c2 AS (SELECT c1.cid, COALESCE(s2.cv, c1.cv) AS cv FROM c1 LEFT JOIN s2 USING (cid)),
        |a3 AS (SELECT vec_id, cid FROM (
        |  SELECT e.vec_id, c2.cid, row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_dot_product(e.v, c2.cv) /
        |      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c2.cv, c2.cv))) DESC,
        |      c2.cid) AS rn
        |  FROM e CROSS JOIN c2) x WHERE rn = 1)""".stripMargin

  // DuckDB CTE fragments shared by the jaccard-contract oracles.
  private val shingleCte =
    """WITH words AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
      |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s FROM words),
      |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      |pairs AS (SELECT a.doc_id AS aid, b.doc_id AS bid, count(*) AS inter
      |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT aid AS a_id, bid AS b_id,
      |       CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS jac
      |FROM pairs JOIN sizes s1 ON aid = s1.doc_id JOIN sizes s2 ON bid = s2.doc_id
      |WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.8""".stripMargin

  /** Shared CTE fragment: the splitmix64 hyperplane family
    * (Dedup.hyperplaneComponent) replayed exactly in SQL. 64-bit
    * wrap-around arithmetic runs in HUGEINT mod 2^64 (checked BIGINT
    * would overflow); multiplies split the left operand at 2^32 so no
    * intermediate exceeds 2^97; xors split both operands into 32-bit
    * halves for BIGINT xor(). Emits per-plane component lists hv
    * (ordered by dimension — list_dot_product ≡ the engine's ascending
    * fold) plus the raw per-(i,j) grid for probe logic. */
  import OracleSql.{u64signed, u64shr}

  private def splitmixHyperplanes(bits: Int): String =
    s"""ij AS (SELECT i, j FROM range(0, 64) t(i), range(0, $bits) u(j)),
       |sm AS (
       | SELECT i, j,
       |  CAST(i * 65537 + j AS HUGEINT) + 11400714819323198485 AS x0,
       |  CAST(xor(CAST(x0 // 4294967296 AS BIGINT), CAST((x0 // 1073741824) // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296
       |    + CAST(xor(CAST(x0 % 4294967296 AS BIGINT), CAST((x0 // 1073741824) % 4294967296 AS BIGINT)) AS HUGEINT) AS x1,
       |  (((x1 // 4294967296) * 13787848793156543929 % 4294967296) * 4294967296
       |    + (x1 % 4294967296) * 13787848793156543929) % 18446744073709551616 AS m1,
       |  CAST(xor(CAST(m1 // 4294967296 AS BIGINT), CAST((m1 // 134217728) // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296
       |    + CAST(xor(CAST(m1 % 4294967296 AS BIGINT), CAST((m1 // 134217728) % 4294967296 AS BIGINT)) AS HUGEINT) AS x2,
       |  (((x2 // 4294967296) * 10723151780598845931 % 4294967296) * 4294967296
       |    + (x2 % 4294967296) * 10723151780598845931) % 18446744073709551616 AS m2,
       |  CAST(xor(CAST(m2 // 4294967296 AS BIGINT), CAST((m2 // 2147483648) // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296
       |    + CAST(xor(CAST(m2 % 4294967296 AS BIGINT), CAST((m2 // 2147483648) % 4294967296 AS BIGINT)) AS HUGEINT) AS x3,
       |  CAST(CAST(CASE WHEN x3 >= 9223372036854775808 THEN x3 - 18446744073709551616 ELSE x3 END AS BIGINT) AS DOUBLE)
       |    / 9223372036854775808e0 AS hd
       | FROM ij),
       |hp AS (SELECT j, list(hd ORDER BY i) AS hv FROM sm GROUP BY j),
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)""".stripMargin

  /** Shared cosine-top-k tail over candidate (qid, vec_id, v) rows —
    * the s1-proven formulation (list_dot_product + rank window). */
  private val cosineTopkTail =
    """scored AS (
      | SELECT cand.qid AS query_id, cand.vec_id AS neighbor_id,
      |  list_dot_product(e.v, cand.v) /
      |    (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cand.v, cand.v))) AS sim,
      |  row_number() OVER (PARTITION BY cand.qid ORDER BY
      |    list_dot_product(e.v, cand.v) /
      |    (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cand.v, cand.v))) DESC,
      |    cand.vec_id) AS rn
      | FROM cand JOIN e ON e.vec_id = cand.qid)
      |SELECT query_id, neighbor_id, rn AS rank, sim FROM scored WHERE rn <= 4""".stripMargin

  private val langCase =
    """CASE
      | WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
      | WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
      | WHEN s_es > 0 AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
      | WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr'
      | WHEN s_zh > 0 THEN 'zh'
      | ELSE 'und' END""".stripMargin

  /** Corpus data card (t18): per-(source, lang) stratum — doc count,
    * char/token mass, and the EXACT lower median of document length
    * (rank ⌈n/2⌉ by (n_chars, doc_id)). The report a pipeline publishes
    * with every training-data release.
    *
    * Scale: one shuffle on the stratum key; the rank window and the
    * final aggregate share that clustering, so Catalyst reuses the
    * exchange. No driver-side state — the median comes from a rank
    * filter, not a collect/percentile pass. */
  private def t18: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = t(spark, dir, "documents")
      .select(col("source"), col("lang"), col("doc_id"), col("n_chars"),
        size(TF.tokens(lower(col("text")))).cast(LongType).as("n_toks"))
    val strat = Window.partitionBy(col("source"), col("lang"))
    val ranked = d
      .withColumn("rn", row_number().over(strat.orderBy(col("n_chars"), col("doc_id"))))
      .withColumn("cnt", count(lit(1)).over(strat))
    ranked.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("tot_chars"),
        sum(col("n_toks")).as("tok_mass"),
        max(when(col("rn") === expr("(cnt + 1) DIV 2"), col("n_chars")))
          .as("med_chars"))
  }

  /** Bigram LM mass (t19): the 2-gram generalization of t8's
    * corpus-frequency scoring — corpus-wide bigram counts, then each
    * document scored by total/unique bigram frequency mass. Integer-exact
    * (the KenLM-style float perplexity is deliberately re-expressed as
    * exact count mass so the oracle hash-matches across engines).
    *
    * Scale: bigrams are derived per-row with zip_with over the token
    * array (no posexplode self-join); the frequency table is a map-side
    * partial + final hash agg. NO broadcast hint on the join back:
    * bigram TYPE counts grow near-linearly with corpus mass in the
    * tail (unlike Zipf-bounded unigrams), so the plan must degrade to
    * a shuffle join on the bigram key by itself at 100 TB — AQE still
    * picks the broadcast at bench scale (plan-shape asserted). */
  private def t19: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), TF.tokens(lower(col("text"))).as("a"))
    val bigrams = docs
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("a"), lit(1), size(col("a")) - 1),
          slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
          (x, y) => concat(x, lit(" "), y))).as("bigram"))
    val freq = bigrams.groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
    // no broadcast hint: bigram TYPE counts are not Zipf-bounded the
    // way unigrams are — the tail grows near-linearly with corpus mass.
    // AQE still broadcasts at bench scale; at 100 TB this joins on the
    // bigram-key shuffle (the t34 idiom).
    bigrams.join(freq, "bigram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("cnt")).as("bigram_mass"),
        sum(when(col("cnt") === 1L, 1L).otherwise(0L)).as("n_unique_bigrams"))
  }

  /** PMI collocations (t24): the classic phrase-mining signal — rank
    * adjacent token pairs by pointwise mutual information, i.e. how
    * much more often the pair co-occurs than its unigram frequencies
    * predict. PMI = ln(c_xy·N / (c_x·c_y)); ln is monotone, so the
    * score is emitted as the exact LIFT ratio c_xy·N/(c_x·c_y) instead
    * — integer multiplies both sides (exact in BIGINT), ONE IEEE
    * division, identical in both engines, no transcendental anywhere
    * (the k6/t19 exact-rational precedent). Pairs below `minCount` are
    * noise (PMI's known low-frequency pathology) and are dropped; the
    * top `topK` by (lift desc, pair asc — a total order, so the cut
    * line is deterministic) are returned.
    *
    * Scale: bigrams derive per-row with zip_with (no posexplode
    * self-join); unigram and bigram counts are map-side-combined hash
    * aggs; the Zipf-bounded unigram table joins back onto the
    * minCount-pruned bigram table with NO forced hint — AQE broadcasts
    * it at bench scale, and a 10^8-row vocabulary degrades to a
    * shuffle join instead of an OOM (the t34 idiom); the top-k is a
    * TakeOrdered — no global sort. */
  private def t24: Q = (spark, dir) => {
    val minCount = 5L
    val topK = 100
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), TF.tokens(lower(col("text"))).as("a"))
    val toks = docs.select(explode(col("a")).as("tok"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    // corpus token total: derived from the (Zipf-bounded) unigram table,
    // not a second corpus pass; one driver-held long
    val nTok = uni.agg(sum(col("c"))).head().getLong(0)
    val pairs = docs
      .select(explode(zip_with(
        slice(col("a"), lit(1), size(col("a")) - 1),
        slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
    // no broadcast hints: the unigram table is Zipf-bounded so AQE
    // broadcasts it at bench scale anyway, and the logical plan must
    // survive a 10^8-row vocabulary (the t34 idiom)
    pairs
      .join(uni.select(col("tok").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c").as("c2")), "w2")
      .select(col("w1"), col("w2"), col("pair_count"),
        ((col("pair_count") * lit(nTok)).cast(DoubleType) /
          (col("c1") * col("c2")).cast(DoubleType)).as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Deterministic stratified sampling (t25): the source-mixing step —
    * down-sample the bulk strata, keep curated strata dense — via
    * [[graft.operators.Sampling.stratified]]'s hash-threshold rule
    * (xxhash64(doc_id) mod 10^4 < rate_bp). Reproducible by
    * construction: no RNG, no partition-layout sensitivity, nested
    * rates give nested samples. Horvitz–Thompson weight rides along.
    * The oracle replays the exact xxhash64 chain (the k3/t25 layered
    * projections) and the same CASE rate table. */
  private def t25: Q = (spark, dir) => {
    import graft.operators.Sampling
    val rates = (0 until 20).map { i =>
      s"src$i" -> (if (i < 5) 5000 else if (i < 10) 2500 else 1000)
    }.toMap
    Sampling.stratified(
        t(spark, dir, "documents").select(col("doc_id"), col("source")),
        col("source"), col("doc_id"), rates, defaultBp = 1000)
      .select(col("doc_id"), col("source"), col("weight"))
  }

  /** ROUGE-N overlap scoring (t26): clipped n-gram precision / recall
    * / F1 for n = 1, 2 per (candidate, reference) document pair — the
    * standard summarization/eval-harness metric (Lin 2004, "ROUGE: A
    * Package for Automatic Evaluation of Summaries"), run as a corpus
    * pipeline op. Pairing here is positional (even doc = candidate,
    * next odd doc = reference, pair_id = doc_id div 2) — a stand-in
    * for the (generation, reference) keying a real eval harness
    * supplies. "Clipped" = multiset intersection: each n-gram counts
    * min(candidate occurrences, reference occurrences), ROUGE's
    * anti-gaming rule against repetition.
    *
    * Determinism: all counts are integers end-to-end; P/R are ONE
    * integer→double division each, F1 = 2·p·r/(p+r) in fixed operand
    * order, zero-overlap pairs pinned to 0 (not 0/0 = NaN, where the
    * engines' NaN sort semantics diverge) — so full equality replay.
    *
    * Scale shape (100 TB): one shuffle per n on (pair_id, gram) with
    * map-side combine, then a pair_id rollup; grams derive per-row
    * (zip_with, no posexplode self-join); no windows, no broadcast,
    * no driver state — cost is O(total tokens) through two hash aggs.
    * (A single typed gram pass with an order tag and one union'd
    * aggregation was measured and DECLINED in r19: flat-to-worse —
    * the duplicate tokenize is cheaper than the merged (pair_id, n,
    * gram) aggregation, which loses per-order map-side combine
    * density.) */
  private def t26: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
      .select(floor(col("doc_id") / 2).cast(LongType).as("pair_id"),
        (col("doc_id") % 2).cast(LongType).as("side"),
        TF.tokens(lower(col("text"))).as("a"))
    def stats(grams: DataFrame, pfx: String): DataFrame =
      grams.groupBy(col("pair_id"), col("g"))
        .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("c0"),
          sum(when(col("side") === 1, 1L).otherwise(0L)).as("c1"))
        .groupBy(col("pair_id"))
        .agg(sum(least(col("c0"), col("c1"))).as(s"${pfx}_overlap"),
          sum(col("c0")).as(s"${pfx}_cand"),
          sum(col("c1")).as(s"${pfx}_ref"))
    val uni = stats(docs.select(col("pair_id"), col("side"),
      explode(col("a")).as("g")), "r1")
    val bi = stats(docs.select(col("pair_id"), col("side"),
      explode(zip_with(
        slice(col("a"), lit(1), size(col("a")) - 1),
        slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
        (x, y) => concat(x, lit(" "), y))).as("g")), "r2")
    def prf(j: DataFrame, pfx: String): DataFrame = {
      val o = col(s"${pfx}_overlap")
      val p = when(col(s"${pfx}_cand") > 0,
        o.cast(DoubleType) / col(s"${pfx}_cand").cast(DoubleType))
        .otherwise(0.0).as(s"${pfx}_p")
      val r = when(col(s"${pfx}_ref") > 0,
        o.cast(DoubleType) / col(s"${pfx}_ref").cast(DoubleType))
        .otherwise(0.0).as(s"${pfx}_r")
      j.withColumns(Map(s"${pfx}_p" -> p, s"${pfx}_r" -> r))
        .withColumn(s"${pfx}_f1",
          when(o > 0, (lit(2.0) * col(s"${pfx}_p") * col(s"${pfx}_r")) /
            (col(s"${pfx}_p") + col(s"${pfx}_r"))).otherwise(0.0))
    }
    val joined = uni.join(bi, Seq("pair_id"), "left_outer")
      .select(col("pair_id"), col("r1_overlap"), col("r1_cand"), col("r1_ref"),
        coalesce(col("r2_overlap"), lit(0L)).as("r2_overlap"),
        coalesce(col("r2_cand"), lit(0L)).as("r2_cand"),
        coalesce(col("r2_ref"), lit(0L)).as("r2_ref"))
    prf(prf(joined, "r1"), "r2")
      .select(col("pair_id"),
        col("r1_overlap"), col("r1_p"), col("r1_r"), col("r1_f1"),
        col("r2_overlap"), col("r2_p"), col("r2_r"), col("r2_f1"))
  }

  /** Feature hashing (t20): the VW/fastText featurizer — each token is
    * hashed into one of 128 buckets (first 4 hex chars of md5, mod) and
    * each document becomes its sparse (bucket, count) vector. md5 is
    * identical across engines, so the whole vectorization is
    * oracle-checked exactly — no "approximately the same features".
    *
    * Scale: explode + one map-side-combined shuffle on (doc_id, bucket);
    * no vocabulary state anywhere (that's the point of the hashing
    * trick — the feature space is fixed before any data is seen). */
  /** Quantized linear quality classifier (t27): fastText-style model
    * INFERENCE as a pipeline op — the hashing-trick bag-of-words
    * features of t20 scored against a fixed weight vector, emitting
    * the logit, a length-normalized score, and the keep/drop decision.
    * The weights are integer-quantized (the int8/int16 inference trick
    * production scorers ship), so the logit is an exact BIGINT dot
    * product — no float accumulation order anywhere — and `score` is
    * ONE integer→double division; full equality oracle. Weights here
    * derive deterministically from md5 (a stand-in for shipped trained
    * weights — inference mechanics, not training, are the operator).
    *
    * Scale shape (100 TB): the 128-row weight table broadcasts; cost
    * is the tokenize scan plus two hash aggs on (doc_id, bucket) /
    * doc_id with map-side combine — the same profile as t20. */
  private def t27: Q = (spark, dir) => {
    val nb = 128
    val feats = t(spark, dir, "documents")
      .select(col("doc_id"), explode(TF.tokens(lower(col("text")))).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 4), 16, 10).cast(IntegerType) % nb)
          .as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("n"))
    val weights = spark.range(nb.toLong)
      .select(col("id").cast(IntegerType).as("bucket"),
        ((conv(substring(md5(concat(lit("w"), col("id").cast(StringType))),
            1, 4), 16, 10).cast(IntegerType) % 1024) - 512)
          .cast(LongType).as("w"))
    feats.join(broadcast(weights), "bucket")
      .groupBy(col("doc_id"))
      .agg(sum(col("n") * col("w")).as("logit"),
        sum(col("n")).as("n_tokens"))
      .select(col("doc_id"), col("logit"),
        (col("logit").cast(DoubleType) / col("n_tokens").cast(DoubleType))
          .as("score"),
        (col("logit") >= 0).as("keep"))
  }

  /** Gopher-rule quality filter (t28): the published document-level
    * filter battery of the Gopher/MassiveText pipeline (word count,
    * mean word length, symbol-to-word ratio, bullet/ellipsis line
    * ratios, alphabetic-word ratio, stopword requirement), each rule a
    * bit in a `reasons` mask so downstream can both hard-filter
    * (`keep`) and audit WHY documents fell out — the shape every
    * production pretraining filter uses. All thresholds are evaluated
    * as cross-multiplied INTEGER comparisons (3·n > chars, not
    * chars/n < 3), so the oracle replays them exactly with no float
    * division anywhere.
    *
    * Scale: one zero-shuffle codegen'd projection pass — no UDF, no
    * explode; at 100 TB this filter is scan-bound, which is the
    * point. */
  private def t28: Q = (spark, dir) => {
    val d = t(spark, dir, "documents")
    val toks = TF.tokens(lower(col("text")))
    val n = size(toks).cast(LongType)
    val chars = length(regexp_replace(col("text"), "\\s+", "")).cast(LongType)
    val hashes = (length(col("text")) -
      length(translate(col("text"), "#", ""))).cast(LongType)
    val ells = ((length(col("text")) -
      length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3).cast(LongType)
    val lines = split(col("text"), "\n")
    val nLines = size(lines).cast(LongType)
    val bullet = size(filter(lines, l =>
      startswith(ltrim(l), lit("-")) || startswith(ltrim(l), lit("*"))))
      .cast(LongType)
    val ellEnd = size(filter(lines, l => endswith(rtrim(l), lit("..."))))
      .cast(LongType)
    val alpha = size(filter(toks, t => t.rlike("[a-z]"))).cast(LongType)
    // Gopher's "must contain >= 2 stopwords" rule, parameterized to
    // this corpus's English function words (the t2/t3 marker set) —
    // the rule is language-specific by design, so a deployment swaps
    // the list, not the rule
    val stopHits = Seq("the", "a", "of", "and", "is")
      .map(s => when(array_contains(toks, s), 1L).otherwise(0L))
      .reduce(_ + _)
    val reasons =
      when(n < 50L || n > 100000L, 1L).otherwise(0L) +
      when(lit(3L) * n > chars || chars > lit(10L) * n, 2L).otherwise(0L) +
      when(lit(10L) * (hashes + ells) > n, 4L).otherwise(0L) +
      when(lit(10L) * bullet > lit(9L) * nLines, 8L).otherwise(0L) +
      when(lit(10L) * ellEnd > lit(3L) * nLines, 16L).otherwise(0L) +
      when(lit(10L) * alpha < lit(8L) * n, 32L).otherwise(0L) +
      when(stopHits < 2L, 64L).otherwise(0L)
    d.select(col("doc_id"), n.as("n_words"), nLines.as("n_lines"),
      reasons.as("reasons"), (reasons === 0L).as("keep"))
  }

  /** Bigram-LM surprisal in WHOLE BITS (t29): the language-model
    * quality signal (documents whose token transitions the corpus LM
    * finds improbable are noise/garbled/foreign) without a float
    * anywhere — per bigram occurrence, surprisal ≈ -log2 P(y|x) =
    * log2 c(x·) - log2 c(xy), floored to whole bits via
    * floor(log2 n) = len(bin(n)) - 1, an identity both engines
    * evaluate on the binary-string length, so the score is
    * integer-exact end-to-end (the t24 no-transcendental principle
    * applied to LM scoring). Per doc: bigram count, total surprisal
    * bits, and the rarest transition's bits (max) — the "one
    * impossible continuation" outlier detector.
    *
    * Scale: grams derive per-row (zip_with, no self-join); the
    * bigram-count join is a plain shuffle join ON PURPOSE — the
    * bigram table grows with the corpus and must never be broadcast —
    * while the prefix table is vocab-sized (Zipf-bounded) and
    * broadcasts. */
  private def t29: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), TF.tokens(lower(col("text"))).as("a"))
    // measured and DECLINED (this round): pinning one shared bigram
    // exchange (repartition(b)) to run the explode once made t29
    // FLAT-to-worse — the duplicate explodes are cheaper than pushing
    // full (doc_id, p, b) rows through an un-partial-aggregated
    // exchange, because the count shuffles are map-side-combined to
    // near-vocab size while the explode is codegen'd
    val grams = docs.select(col("doc_id"),
        explode(zip_with(
          slice(col("a"), lit(1), size(col("a")) - 1),
          slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
          (x, y) => struct(x.as("p"), concat(x, lit(" "), y).as("b"))))
          .as("g"))
      .select(col("doc_id"), col("g.p").as("p"), col("g.b").as("b"))
    val cb = grams.groupBy(col("b")).agg(count(lit(1)).as("cb"))
    val cp = grams.groupBy(col("p")).agg(count(lit(1)).as("cp"))
    val bits = (length(bin(col("cp"))) - 1) - (length(bin(col("cb"))) - 1)
    grams.join(cb, "b").join(broadcast(cp), "p")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(bits).cast(LongType).as("surprisal_bits"),
        max(bits).cast(LongType).as("max_bits"))
  }

  /** CCNet-style perplexity-bucket sampling (t32): the published CCNet
    * pipeline scores every document with a language-model perplexity,
    * splits the corpus into head/middle/tail terciles, and keeps the
    * buckets at different rates (head is cleanest). Composed here from
    * three already-oracled primitives, every step deterministic: the
    * per-doc LM score is t29's INTEGER bigram surprisal (whole bits,
    * no float LM), the tercile assignment is ntile(3) over
    * (mean bits, doc_id) — mean bits is one int/int double division,
    * bit-identical across engines — and the keep decision is t25's
    * RNG-free xxhash64 threshold at head 100% / middle 50% / tail 10%.
    * Every doc stays in the output with its bucket and kept flag, so
    * the oracle pins assignment AND sampling, not just survivors.
    *
    * Scale: the corpus-sized work is t29's bigram count shuffle; the
    * exact tercile is [[graft.operators.GlobalRank.withNtile]] —
    * range-bucket on (mean bits, doc_id), per-bucket rank, broadcast
    * prefix offsets — so no single-partition sort exists anywhere in
    * the plan (plan-shape asserted). k5's KLL cutoffs remain the
    * documented approximate alternative when even exact ranks are
    * overkill. */
  private def t32: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), TF.tokens(lower(col("text"))).as("a"))
    val grams = docs.select(col("doc_id"),
        explode(zip_with(
          slice(col("a"), lit(1), size(col("a")) - 1),
          slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
          (x, y) => struct(x.as("p"), concat(x, lit(" "), y).as("b"))))
          .as("g"))
      .select(col("doc_id"), col("g.p").as("p"), col("g.b").as("b"))
    val cb = grams.groupBy(col("b")).agg(count(lit(1)).as("cb"))
    val cp = grams.groupBy(col("p")).agg(count(lit(1)).as("cp"))
    val bits = (length(bin(col("cp"))) - 1) - (length(bin(col("cb"))) - 1)
    val stats = grams.join(cb, "b").join(broadcast(cp), "p")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(bits).cast(LongType).as("surprisal_bits"))
    val ranked = graft.operators.GlobalRank.withNtile(stats, "bucket", 3,
      Seq((col("surprisal_bits").cast(DoubleType) / col("n_bigrams")).asc,
        col("doc_id").asc))
    val bp = when(col("bucket") === 1, 10000)
      .when(col("bucket") === 2, 5000).otherwise(1000)
    ranked.select(col("doc_id"), col("n_bigrams"), col("surprisal_bits"),
      col("bucket"),
      (pmod(xxhash64(col("doc_id")), lit(10000)) < bp).as("kept"))
  }

  /** Kneser–Ney smoothed bigram LM estimation (t34): the LM-training
    * artifact behind CCNet-style perplexity filtering (KenLM's default
    * smoothing), exact. Interpolated KN with discount D = 3/4 kept as
    * a RATIONAL:
    *   P(w2|w1) = max(c12 − D, 0)/c1 + D·Nfwd(w1)/c1 · Nback(w2)/Nb
    * scaled by 4·c1·Nb into integer (num, den):
    *   num = max(4·c12 − 3, 0)·Nb + 3·Nfwd(w1)·Nback(w2)
    *   den = 4·c1·Nb
    * where c1 = Σ_w c(w1,w), Nfwd/Nback are the distinct-continuation
    * counts, Nb = distinct bigram types. qbits = bits(num) − bits(den)
    * is the whole-bit quantized log-prob (the t29 idiom — the feature
    * a scorer consumes). KnSpec proves Σ_{w2∈V} P(w2|w1) = 1 exactly
    * in rationals on an enumerable corpus, so the smoothing identity
    * is pinned independently of the oracle.
    *
    * Scale: ONE corpus-sized bigram-count shuffle; c1/Nfwd re-aggregate
    * from the count table (no second corpus pass), Nback is a table of
    * distinct second words, Nb broadcasts as a 1-row stats join. */
  private def t34: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
      .select(TF.tokens(lower(col("text"))).as("a"))
    val grams = docs.select(
      explode(zip_with(
        slice(col("a"), lit(1), size(col("a")) - 1),
        slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
        (x, y) => struct(x.as("w1"), y.as("w2")))).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
    val c12 = grams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val left = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("nfwd"))
    val back = c12.groupBy(col("w2")).agg(count(lit(1)).as("nback"))
    val nb = c12.agg(count(lit(1)).as("nb"))
    def bits(c: org.apache.spark.sql.Column) = length(bin(c))
    val num = greatest(lit(4) * col("c12") - 3, lit(0L)) * col("nb") +
      lit(3L) * col("nfwd") * col("nback")
    val den = lit(4L) * col("c1") * col("nb")
    // left/back are vocab-sized (one row per distinct w1/w2): no
    // broadcast hint — AQE broadcasts them at bench scale but the plan
    // must survive a corpus-scale vocabulary (10^8 rows), where these
    // join on the shuffle. Only the 1-row nb stats frame is forced.
    c12.join(left, Seq("w1"))
      .join(back, Seq("w2"))
      .crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c12"),
        num.cast(LongType).as("num"), den.cast(LongType).as("den"),
        (bits(num) - bits(den)).cast(IntegerType).as("qbits"))
  }

  /** CCNet's LM perplexity filter, end-to-end (t36): score every
    * document against the t34 Kneser-Ney bigram LM and bucket by mean
    * per-bigram quantized log-probability — the head/middle/tail
    * split CCNet actually gates on (Wenzek et al. 2020 use a KenLM
    * 5-gram; the same KN smoothing at bigram order keeps the chain
    * integer-exact). A doc's score is the SUM of its bigrams' qbits
    * (t34's whole-bit log2 P quantization); ordering by mean qbits
    * DESC puts low-perplexity docs first, exact ntile(3) assigns
    * head(1)/middle(2)/tail(3), and CCNet keeps head+middle. The LM is
    * trained on the SAME corpus being filtered, like CCNet's
    * per-snapshot models — every bigram is in-vocabulary by
    * construction, so no backoff-to-unigram path is exercised (that
    * remains t34's documented boundary). Docs under 2 tokens have no
    * bigrams and drop out of the report, exactly as in the oracle.
    *
    * Scale: the corpus-sized work is the ONE bigram shuffle shared
    * with t34 (count + derived tables re-aggregate from it) plus the
    * doc-bigram-to-LM join, which shuffles on the bigram key — the
    * same key distribution as the count, no new skew class. The exact
    * tercile is GlobalRank.withNtile over the per-DOC stat table —
    * range-bucketed distributed rank, no single-partition sort (the
    * t32 note); k5's KLL cutoffs remain the approximate fallback. */
  private def t36: Q = (spark, dir) => {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), TF.tokens(lower(col("text"))).as("a"))
    val grams = docs.select(col("doc_id"),
        explode(zip_with(
          slice(col("a"), lit(1), size(col("a")) - 1),
          slice(col("a"), lit(2), greatest(size(col("a")) - 1, lit(0))),
          (x, y) => struct(x.as("w1"), y.as("w2")))).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
    val c12 = grams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
    val left = c12.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("nfwd"))
    val back = c12.groupBy(col("w2")).agg(count(lit(1)).as("nback"))
    val nb = c12.agg(count(lit(1)).as("nb"))
    def bits(c: org.apache.spark.sql.Column) = length(bin(c))
    val num = greatest(lit(4) * col("c12") - 3, lit(0L)) * col("nb") +
      lit(3L) * col("nfwd") * col("nback")
    val den = lit(4L) * col("c1") * col("nb")
    // vocab-sized LM tables join on the shuffle (the t34 AQE note)
    val lm = c12.join(left, Seq("w1")).join(back, Seq("w2"))
      .crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"),
        (bits(num) - bits(den)).cast(LongType).as("qbits"))
    val scored = grams.join(lm, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("qbits")).as("sum_qbits"))
    val ranked = graft.operators.GlobalRank.withNtile(scored, "tercile", 3,
      Seq((col("sum_qbits").cast(DoubleType) / col("n_bigrams")).desc,
        col("doc_id").asc))
    ranked.select(col("doc_id"), col("n_bigrams"), col("sum_qbits"),
      col("tercile"), (col("tercile") <= 2).as("keep"))
  }

  /** Deterministic weighted mixture interleave (t37): the data-MIXING
    * scheduler every multi-source training run needs — given
    * per-source integer weights, assign every document its exact
    * position in the smooth weighted round-robin (Bresenham) order:
    * the r-th doc of a weight-w source lands at virtual slot
    * floor((2r+1)·W / 2w) (W = Σ weights), so sources interleave
    * proportionally at EVERY prefix of the stream (a ratio-w_i prefix
    * property no per-epoch shuffle gives), and (slot, source, r) is a
    * total order → mix_pos. Deterministic, integer-exact, resumable
    * from any position — the properties a 100 TB training-order
    * manifest needs. Complements t16 (epoch upsampling decides HOW
    * MANY copies) and t15 (global shuffle WITHIN a source): t37
    * decides the cross-source ORDER.
    *
    * Scale: per-source ranks partition by source (parallel); the one
    * global ordering is GlobalRank.withGlobalRank — slots range-bucket,
    * per-bucket row_number, broadcast prefix offsets — t15's enumerate
    * pattern with sampled range boundaries, no single-partition sort. */
  private def t37: Q = (spark, dir) => {
    val W = org.apache.spark.sql.expressions.Window
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        (lit(1) + substring(col("source"), 4, 10).cast(IntegerType) % 3)
          .as("w"))
    val wsum = docs.select(col("source"), col("w")).distinct()
      .agg(sum(col("w")).cast(LongType).as("wtot"))
    val ranked = docs.withColumn("r",
      (row_number().over(W.partitionBy(col("source")).orderBy(col("doc_id")))
        - 1).cast(LongType))
    val slotted = ranked.crossJoin(broadcast(wsum))
      .withColumn("slot", expr("CAST((2*r + 1) * wtot div (2*w) AS BIGINT)"))
    graft.operators.GlobalRank
      .withGlobalRank(slotted, "mix_pos1",
        Seq(col("slot").asc, col("source").asc, col("r").asc))
      .withColumn("mix_pos", (col("mix_pos1") - 1).cast(LongType))
      .select(col("doc_id"), col("source"), col("w"), col("r"), col("slot"),
        col("mix_pos"))
  }

  /** DSIR-shaped importance selection (t33): Data Selection via
    * Importance Resampling (Xie et al. 2023) reduced to deterministic
    * integer primitives. Documents featurize as hashed n-gram buckets
    * (t20's md5 bucket hash: 128 unigram + 128 bigram buckets), the
    * target distribution is the English subset, each bucket's
    * importance weight is the whole-bit log ratio
    * bits(target_count + 1) - bits(corpus_count + 1) (t29's
    * integer-bits idiom — a coarse log2(p_target/p_raw)), a document
    * scores the sum of its feature-occurrence weights, and the kept
    * quartile is exact ntile(4) over (mean weight DESC, doc_id) —
    * one int/int double division, bit-identical across engines (the
    * t32 pattern). Every doc stays in the output with its quartile
    * and selected flag, so the oracle pins scoring AND selection.
    *
    * Scale: the corpus-sized work is ONE typed pass (tokenize + md5 +
    * per-doc bucket counts folded in a 256-slot array, the
    * simHashesFromDocs pattern) whose tiny (doc_id, is_en, b, cnt)
    * output is repartitioned on doc_id so BOTH consumers — the 256-row
    * weight aggregation and the per-doc rescore — reuse the same
    * exchange (one corpus scan total; the previous explode/union form
    * re-tokenized and re-hashed the corpus three times, measured
    * 1.85s -> 1.15s at sf0.1 fresh-JVM steady state, rows identical).
    * The weight table BROADCASTS back onto the per-doc bucket counts
    * (already partitioned by doc_id, so the rescore is exchange-free);
    * the exact quartile is GlobalRank.withNtile over the per-DOC stat
    * table — range-bucketed distributed rank, no single-partition sort
    * (the t32 note). The mapper replays the md5-bucket featurization
    * bit-for-bit: first two digest bytes == conv(substring(md5, 1, 4),
    * 16, 10), and the per-occurrence counts fold into cnt instead of
    * exploding. */
  private def t33: Q = (spark, dir) => {
    import spark.implicits._
    val perDoc = t(spark, dir, "documents")
      .select(col("doc_id").cast(LongType), col("lang").cast(StringType),
        col("text").cast(StringType))
      .as[(Long, String, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, lang, text) =>
          val t = text.trim.toLowerCase.split("\\s+")
          val cnt = new Array[Long](256)
          def bucket(g: String, off: Int): Unit = {
            md.reset()
            val d = md.digest(g.getBytes("UTF-8"))
            val v = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
            cnt(v % 128 + off) += 1
          }
          var i = 0
          while (i < t.length) {
            bucket(t(i), 0)
            if (i + 1 < t.length) bucket(t(i) + " " + t(i + 1), 128)
            i += 1
          }
          val isEn = lang == "en"
          (0 until 256).iterator.filter(cnt(_) > 0)
            .map(b => (id, isEn, b, cnt(b)))
        }
      }
      .toDF("doc_id", "is_en", "b", "cnt")
      .repartition(col("doc_id"))
    val wts = perDoc.groupBy(col("b"))
      .agg(sum(col("cnt")).as("cr"),
        sum(when(col("is_en"), col("cnt")).otherwise(0L)).as("ct"))
      .select(col("b"),
        (length(bin(col("ct") + 1)) -
          length(bin(col("cr") + 1))).cast(LongType).as("wt"))
    val scored = perDoc.join(broadcast(wts), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_feats"),
        sum(col("cnt") * col("wt")).as("sum_w"))
    val ranked = graft.operators.GlobalRank.withNtile(scored, "quartile", 4,
      Seq((col("sum_w").cast(DoubleType) / col("n_feats")).desc,
        col("doc_id").asc))
    ranked.select(col("doc_id"), col("n_feats"), col("sum_w"),
      col("quartile"), (col("quartile") === 1).as("selected"))
  }

  /** URL canonicalization + URL-level dedup (t38): the crawl
    * pipeline's FIRST dedup pass — before any content fingerprint is
    * worth computing, the frontier collapses URL aliases of the same
    * resource. Six deterministic alias classes per doc_id (scheme/host
    * case, the scheme default port, query-param order, utm_ tracking
    * params, fragments) normalize through
    * [[graft.functions.TextFunctions.canonicalUrl]] — drop fragment,
    * lowercase scheme+host, strip :80/:443, drop tracking params, sort
    * the rest — and groups of six ids collapse onto one canonical key.
    * Output per doc: the canonical URL, its alias-group size and the
    * group representative (min doc_id) — exactly the (key, count,
    * keeper) triple the fetch scheduler consumes.
    *
    * Scale: canonicalization is a zero-shuffle codegen'd string map;
    * the dedup is ONE groupBy on the canonical key (map-side combined)
    * with the group table joined back on the same key — AQE broadcasts
    * it at bench scale, shuffles it at 10^10 URLs; no window over the
    * corpus. */
  private def t38: Q = (spark, dir) => {
    val k = expr("CAST(doc_id div 6 AS BIGINT)").cast(StringType)
    val v = pmod(col("doc_id"), lit(6))
    val url = when(v === 0, concat(lit("https://example"), k,
        lit(".com/p/"), k, lit("?a=1&b=2")))
      .when(v === 1, concat(lit("HTTPS://EXAMPLE"), k,
        lit(".COM/p/"), k, lit("?a=1&b=2")))
      .when(v === 2, concat(lit("https://example"), k,
        lit(".com:443/p/"), k, lit("?a=1&b=2")))
      .when(v === 3, concat(lit("https://example"), k,
        lit(".com/p/"), k, lit("?b=2&a=1")))
      // the utm_ value carries a SECOND '?': RFC keeps it inside the
      // query, so the param still starts with utm_ and is dropped —
      // the class collapses with its group. A last-'?' split would
      // instead surface a bogus "w" param and break the collapse;
      // this alias pins first-'?' semantics against the oracle forever.
      .when(v === 4, concat(lit("https://example"), k,
        lit(".com/p/"), k, lit("?utm_source=t?w&a=1&b=2")))
      .otherwise(concat(lit("https://example"), k,
        lit(".com/p/"), k, lit("?a=1&b=2#section")))
    val canon = t(spark, dir, "documents")
      .select(col("doc_id"), TF.canonicalUrl(url).as("canon"))
    val groups = canon.groupBy(col("canon"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("rep_id"))
    canon.join(groups, "canon")
      .select(col("doc_id"), col("canon"), col("n_dups"), col("rep_id"))
  }

  /** Multi-class PII redaction CHAIN (t39): extends t10's single-pass
    * email/IP scrub with the ordered multi-pattern pipeline production
    * scrubbers actually run — emails, then phone-shaped numbers, then
    * long digit runs, each counted and replaced with a typed
    * placeholder, where ORDER matters (the id pattern must not see the
    * phone's digit groups: n_longid is counted on the already
    * email/phone-redacted text, which the oracle replays stage by
    * stage). Deterministic PII is PLANTED onto the real doc text
    * (doc_id mod 3 → an email, mod 5 → a 415-XXX-YYYY phone, mod 7 →
    * a 9-digit id, the t10/t38 salted-fixture pattern), so every
    * pattern class has known positives while the regexes still sweep
    * the full real text for accidental matches. The three patterns use
    * only the regex intersection Java and RE2 agree on (character
    * classes + bounded repetition; no lookaround, no \b), and the
    * replacement chain is order-pinned (email → phone → id, global
    * left-to-right non-overlapping in both engines), so counts,
    * redacted length and the redacted-text md5 all hash-match.
    *
    * Scale: a zero-shuffle codegen'd string map over the corpus —
    * regexp_count/regexp_replace are native expressions, no UDF; per
    * the measured family policy (SCALE.md r18 note 4) the text-payload
    * scan is NOT pre-spread (the exchange would move the whole corpus
    * to save a map that AQE already parallelizes on a multi-file
    * corpus). */
  /** Dataset card (t40): the per-source summary every published
    * training corpus ships (dataset cards, Dolma/RedPajama-style
    * composition tables) — document and token volume, language
    * composition (distinct count + modal language), and the exact-
    * duplicate rate, all from the catalog's own kernels (t1 tokens,
    * t4 canonical fingerprint) so the card is consistent with the
    * queries it summarizes. Integer-exact throughout: sums are over
    * ints, the dup rate is one small-int division — no float folds.
    *
    * Scale: one corpus pass computes (tokens, chars, fingerprint) per
    * doc; then two map-side-combined aggregates — per source, and per
    * (source, lang) for the modal language, whose window runs over
    * |sources|×|langs| POST-aggregate rows (a few dozen), partitioned
    * by source. The distinct-fingerprint count shuffles hashes, the
    * classic count-distinct — at 100 TB swap in the k3 HLL sketch for
    * a one-pass approximate card; this row keeps the exact semantics
    * the oracle can replay. */
  private def t40: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val d = t(spark, dir, "documents")
    val base = d.select(col("source"), col("lang"),
      size(TF.tokens(col("text"))).as("nt"),
      length(col("text")).as("nc"),
      TF.fingerprint(col("text")).as("fp"))
    val per = base.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("nt")).as("n_tokens"),
      sum(col("nc")).as("n_chars"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("fp")).as("n_fp"))
    val lc = base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("cnt").desc, col("lang"))
    val top = lc.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"),
        col("cnt").as("top_lang_docs"))
    per.join(top, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_chars"), col("n_langs"), col("top_lang"),
        col("top_lang_docs"),
        (col("n_docs") - col("n_fp")).as("n_exact_dups"),
        ((col("n_docs") - col("n_fp")).cast(DoubleType) / col("n_docs"))
          .as("dup_rate"))
  }

  private def t39: Q = (spark, dir) => {
    val id = col("doc_id")
    val pii = concat(col("text"),
      when(pmod(id, lit(3)) === 0, concat(lit(" contact user"),
        id.cast(StringType), lit("@mail.example.com now")))
        .otherwise(lit("")),
      when(pmod(id, lit(5)) === 0, concat(lit(" call 415-"),
        lpad(pmod(id, lit(1000)).cast(StringType), 3, "0"), lit("-"),
        lpad(pmod(id * 7, lit(10000)).cast(StringType), 4, "0")))
        .otherwise(lit("")),
      when(pmod(id, lit(7)) === 0, concat(lit(" ref "),
        lpad(pmod(id * 31, lit(1000000000L)).cast(StringType), 9, "0")))
        .otherwise(lit("")))
    val reEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
    val rePhone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val reId = "[0-9]{9}[0-9]*"
    t(spark, dir, "documents")
      .select(id, pii.as("txt"))
      .select(id,
        expr(s"regexp_count(txt, '$reEmail')").as("n_email"),
        expr(s"regexp_count(txt, '$rePhone')").as("n_phone"),
        regexp_replace(regexp_replace(col("txt"), reEmail, "[EMAIL]"),
          rePhone, "[PHONE]").as("r2"))
      .select(id, col("n_email"), col("n_phone"),
        expr(s"regexp_count(r2, '$reId')").as("n_longid"),
        regexp_replace(col("r2"), reId, "[ID]").as("red"))
      .select(id, col("n_email"), col("n_phone"), col("n_longid"),
        length(col("red")).as("red_len"), md5(col("red")).as("red_md5"))
  }

  private def t20: Q = (spark, dir) => {
    val nb = 128
    t(spark, dir, "documents")
      .select(col("doc_id"), explode(TF.tokens(lower(col("text")))).as("tok"))
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 4), 16, 10).cast(IntegerType) % nb)
          .as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Exact replay of d11's Bloom pipeline: fnv64 fingerprints (per-byte
    * recursive CTE, mod-2^64 multiply via the HUGEINT split idiom),
    * Spark's xxhash64-of-long (seed 42, validated bit-for-bit against
    * the builtin), the murmur-fmix64 second hash, and the 13
    * Kirsch–Mitzenmacher bit positions per value (k = 13, modulus 78528
    * — BloomOps sizes m = 78521 for n = 4096, fpp = 1e-4, but alloc
    * rounds the bit array up to whole bytes and add/mightContain mod by
    * the LIVE bit count (len-4)*8 = 78528). Instead of
    * materializing the filter, the bench side's position SET stands in
    * for the bit array: a probe "might contain" iff all 13 of its
    * positions are present — bit-identical semantics. */
  private def d11OracleSql: String = {
    val norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    s"""WITH RECURSIVE ${OracleSql.fnv64Ctes(Seq("doc_id"), norm, "documents")},
       |xx AS MATERIALIZED (${
         OracleSql.xxHashLongLayers("SELECT doc_id, fpu FROM fp", withFmix = true)}),
       |pos AS MATERIALIZED (SELECT doc_id,
       |  ((${u64signed("(h1u + i * h2u) % 18446744073709551616")}) % 78528 + 78528) % 78528 AS p
       |  FROM xx, range(0, 13) t(i)),
       |bench AS (SELECT DISTINCT p FROM pos WHERE doc_id % 20 = 0),
       |hits AS (SELECT pos.doc_id, min(CASE WHEN bench.p IS NULL THEN 0 ELSE 1 END) AS allhit
       |         FROM pos LEFT JOIN bench ON pos.p = bench.p GROUP BY pos.doc_id)
       |SELECT fp.doc_id, ${u64signed("fpu")} AS fp
       |FROM fp JOIN hits ON fp.doc_id = hits.doc_id WHERE allhit = 0""".stripMargin
  }

  /** Exact replay of t23 (8-merge BPE, train + encode).
    *
    * Training: 8 unrolled rounds over the doc_id<100 sample's word
    * counts. Each round: adjacent-pair counts weighted by word count;
    * best pair by (count DESC, a, b); greedy left-to-right rewrite.
    * The rewrite's non-overlap rule ("a merged token never re-matches
    * in the same pass" — joined=a||b can't equal a since b is
    * non-empty) reduces to run-parity: consecutive match positions
    * only occur when a=b, and the engine takes every other one from
    * each run's start (islands via i − row_number, then (i − min i)
    * % 2 = 0).
    *
    * Encode: a recursive CTE replaying encodeWord exactly — each step
    * merges the pair with the lowest (rank, position) among the 8
    * trained merges (ks packs rank*100+pos; NULL where no match;
    * list_min + list_position pick the winner) until no ranked pair
    * remains; final state per word = max_by(syms, step). Checksum =
    * Σ n·(fnv64(sub) mod 2^16) over doc-ordered subword positions,
    * fnv64 via the shared recursive-CTE replay. MATERIALIZED on every
    * multiply-referenced CTE — each round reads v{k-1} three times and
    * DuckDB CTEs are views, so the unmaterialized chain re-evaluates
    * 3^8 times. */
  private def t23OracleSql: String = bpeOracleSql(8)

  private def bpeOracleSql(numMerges: Int): String = {
    def roundCtes(k: Int): String = {
      val p = k - 1
      s"""q$k AS MATERIALIZED (SELECT word, c, syms, unnest(range(1, len(syms))) AS i FROM v$p),
         |pc$k AS (SELECT syms[i] AS a, syms[i+1] AS b, SUM(c) AS cnt FROM q$k GROUP BY 1, 2),
         |b$k AS MATERIALIZED (SELECT a, b FROM pc$k ORDER BY cnt DESC, a, b LIMIT 1),
         |mt$k AS (SELECT q.word, q.i FROM q$k q, b$k b WHERE q.syms[q.i] = b.a AND q.syms[q.i+1] = b.b),
         |r$k AS (SELECT word, i, i - row_number() OVER (PARTITION BY word ORDER BY i) AS g FROM mt$k),
         |tk$k AS (SELECT word, i FROM (SELECT word, i, min(i) OVER (PARTITION BY word, g) AS i0 FROM r$k) WHERE (i - i0) % 2 = 0),
         |ps$k AS (SELECT word, c, syms, unnest(range(1, len(syms) + 1)) AS j FROM v$p),
         |v$k AS MATERIALIZED (
         |  SELECT p.word, min(p.c) AS c,
         |         list(CASE WHEN t.i IS NOT NULL THEN b.a || b.b ELSE p.syms[p.j] END ORDER BY p.j) AS syms
         |  FROM ps$k p
         |  CROSS JOIN b$k b
         |  LEFT JOIN tk$k t ON t.word = p.word AND t.i = p.j
         |  LEFT JOIN tk$k t2 ON t2.word = p.word AND t2.i = p.j - 1
         |  WHERE t2.i IS NULL
         |  GROUP BY p.word)""".stripMargin
    }
    val rounds = (1 to numMerges).map(roundCtes).mkString(",\n")
    val mgUnion = (1 to numMerges)
      .map(k => s"SELECT a, b, $k AS r FROM b$k").mkString(" UNION ALL ")
    val initSyms =
      "list_append(list_transform(range(1, length(word) + 1), i -> word[i]), '</w>')"
    s"""WITH RECURSIVE
       |docs0 AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents),
       |wflat AS (SELECT unnest(w) AS word FROM docs0 WHERE doc_id < 100),
       |wcnt AS (SELECT word, count(*) AS c FROM wflat GROUP BY 1),
       |v0 AS MATERIALIZED (SELECT word, CAST(c AS BIGINT) AS c, $initSyms AS syms FROM wcnt),
       |$rounds,
       |mg AS ($mgUnion),
       |mgl AS MATERIALIZED (SELECT list(struct_pack(a:=a, b:=b, r:=r)) AS ms FROM mg),
       |dwf AS (SELECT unnest(w) AS word FROM docs0),
       |dw AS (SELECT DISTINCT word FROM dwf),
       |e0 AS (SELECT word, $initSyms AS syms FROM dw),
       |enc AS (
       |  SELECT word, syms, 0 AS step FROM e0
       |  UNION ALL
       |  SELECT word, syms[1:bi-1] || [syms[bi] || syms[bi+1]] || syms[bi+2:] AS syms, step + 1 AS step
       |  FROM (
       |    SELECT word, syms, step,
       |      list_position(ks, list_min(list_filter(ks, x -> x IS NOT NULL))) AS bi
       |    FROM (
       |      SELECT e.word, e.syms, e.step,
       |        list_transform(range(1, len(e.syms)),
       |          i -> list_min(list_transform(
       |                 list_filter(ms, m -> m.a = e.syms[i] AND m.b = e.syms[i+1]),
       |                 m -> m.r)) * 100 + i) AS ks
       |      FROM enc e CROSS JOIN mgl)
       |  ) WHERE bi IS NOT NULL),
       |fin AS MATERIALIZED (SELECT word, max_by(syms, step) AS syms FROM enc GROUP BY word),
       |wpos AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS wi, w FROM docs0),
       |wsub AS (SELECT p.doc_id, p.wi, f.syms FROM wpos p JOIN fin f ON f.word = p.w[p.wi]),
       |sub1 AS (SELECT doc_id, wi, unnest(range(1, len(syms) + 1)) AS si, syms FROM wsub),
       |flat AS MATERIALIZED (SELECT doc_id, wi, si, syms[si] AS sub FROM sub1),
       |orded AS (SELECT doc_id, sub, row_number() OVER (PARTITION BY doc_id ORDER BY wi, si) AS n FROM flat),
       |ds AS (SELECT DISTINCT sub FROM flat),
       |${OracleSql.fnv64Ctes(Seq("sub"), "sub", "ds")}
       |SELECT o.doc_id,
       |  count(*) AS n_subwords,
       |  count(DISTINCT o.sub) AS n_distinct_subwords,
       |  CAST(SUM(o.n * (f.fpu % 65536)) AS BIGINT) AS subword_checksum
       |FROM orded o JOIN fp f ON f.sub = o.sub
       |GROUP BY o.doc_id""".stripMargin
  }

  /** Exact replay of d13 (duplicate-span coverage): stride-1 8-token
    * windows → fnv64 (recursive CTE over DISTINCT window strings) →
    * duplicate = hash in >= 2 distinct docs → per-doc window/dup
    * counts and distinct covered positions. Integer-exact. */
  private def d13OracleSql: String = {
    val win8 = "w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]"
    s"""WITH RECURSIVE
       |words AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents),
       |wins AS (SELECT doc_id, unnest(range(1, len(w) - 6)) AS i, w FROM words),
       |swin AS (SELECT doc_id, i - 1 AS idx, $win8 AS s FROM wins),
       |dsh AS (SELECT DISTINCT s FROM swin),
       |${OracleSql.fnv64Ctes(Seq("s"), "s", "dsh")},
       |sp AS MATERIALIZED (SELECT swin.doc_id, swin.idx, fp.fpu AS wh
       |                    FROM swin JOIN fp ON fp.s = swin.s),
       |dup AS (SELECT wh FROM (SELECT wh, count(DISTINCT doc_id) AS nd
       |                        FROM sp GROUP BY 1) WHERE nd >= 2),
       |fl AS MATERIALIZED (SELECT sp.doc_id, sp.idx FROM sp JOIN dup USING (wh)),
       |cov AS (SELECT doc_id, count(DISTINCT pos) AS n_covered FROM (
       |          SELECT doc_id, unnest(range(idx, idx + 8)) AS pos FROM fl)
       |        GROUP BY 1),
       |ws AS (SELECT doc_id, count(*) AS n_windows FROM sp GROUP BY 1),
       |dps AS (SELECT doc_id, count(*) AS n_dup FROM fl GROUP BY 1),
       |nt AS (SELECT doc_id, len(w) AS n_tokens FROM words)
       |SELECT nt.doc_id,
       |  COALESCE(ws.n_windows, 0) AS n_windows,
       |  COALESCE(dps.n_dup, 0) AS n_dup_windows,
       |  COALESCE(cov.n_covered, 0) AS n_covered_tokens,
       |  nt.n_tokens
       |FROM nt
       |LEFT JOIN ws ON ws.doc_id = nt.doc_id
       |LEFT JOIN dps ON dps.doc_id = nt.doc_id
       |LEFT JOIN cov ON cov.doc_id = nt.doc_id""".stripMargin
  }

  /** d20: FROM-FIRST-PRINCIPLES replay of the whole MinHash banding
    * chain — fnv64 shingle bases (recursive CTE), all 128 splitmix64
    * permutation mins (signed-compare, as the engine's Long min), the
    * per-band splitmix fold at each (bands, rowsPerBand) config, the
    * bucket self-join candidates, and the exact-Jaccard truth (d2's
    * CTEs). Strictly stronger than d3's recall-gate oracle: the
    * banding itself is checked value-for-value, not just the verified
    * survivors. Mins dedup is irrelevant to MIN, so the SQL runs over
    * distinct shingles without replaying the mapper's seen-set
    * optimization. */
  private def d20OracleSql: String = {
    import OracleSql.{splitmixLayers, u64signed, u64xor}
    // per-config band-hash fold: bh_0 = fnv offset, bh_{j+1} =
    // splitmix64(bh_j XOR m_j); each fold step is its own subquery so
    // every u64 helper argument stays a plain column reference
    def bandFold(rpb: Int): String = {
      def keep(from: Int): String =
        (from until rpb).map(j => s"m$j").map(c => s", $c").mkString
      var cur = s"SELECT doc_id, band${keep(1)}, " +
        s"${u64xor("14695981039346656037", "m0")} AS mxin FROM piv"
      for (j <- 1 until rpb) {
        cur = s"SELECT doc_id, band${keep(j + 1)}, " +
          s"${u64xor("mxout", s"m$j")} AS mxin FROM (${splitmixLayers(cur)}) q$j"
      }
      splitmixLayers(cur)
    }
    def cfg(bands: Int, rpb: Int): String = {
      val pivCols = (0 until rpb).map(j =>
        s"MAX(CASE WHEN i % $rpb = $j THEN mnu END) AS m$j").mkString(", ")
      s"""(WITH piv AS (SELECT doc_id, i // $rpb AS band, $pivCols
         |   FROM minsu GROUP BY doc_id, i // $rpb),
         | bh AS (SELECT doc_id, band, mxout FROM (${bandFold(rpb)}) fq),
         | cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |          FROM bh a JOIN bh b ON a.band = b.band
         |            AND a.mxout = b.mxout AND a.doc_id < b.doc_id),
         | stc AS (SELECT COUNT(*) AS n_candidates,
         |          COALESCE(SUM(CASE WHEN t.a_id IS NULL THEN 0 ELSE 1 END), 0) AS n_hit
         |         FROM cand LEFT JOIN truthp t
         |           ON t.a_id = cand.a_id AND t.b_id = cand.b_id)
         | SELECT $bands AS bands, $rpb AS rows_per_band,
         |   CAST(stc.n_candidates AS BIGINT) AS n_candidates, tn.n_true,
         |   CAST(stc.n_hit AS BIGINT) AS n_hit,
         |   CAST(CASE WHEN stc.n_candidates = 0 THEN 0
         |        ELSE (stc.n_hit * 10000) // stc.n_candidates END AS BIGINT)
         |     AS precision_bp,
         |   CAST(CASE WHEN tn.n_true = 0 THEN 0
         |        ELSE (stc.n_hit * 10000) // tn.n_true END AS BIGINT)
         |     AS recall_bp
         | FROM stc CROSS JOIN tn)""".stripMargin
    }
    val perms = splitmixLayers(
      "SELECT doc_id, i, (fpu + i) % 18446744073709551616 AS mxin " +
        "FROM db, range(0, 128) t(i)")
    s"""WITH RECURSIVE
       |words AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents),
       |shs AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
       |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s FROM words),
       |dsh AS (SELECT DISTINCT s FROM shs),
       |${OracleSql.fnv64Ctes(Seq("s"), "s", "dsh")},
       |db AS MATERIALIZED (SELECT shs.doc_id, fp.fpu FROM shs JOIN fp ON fp.s = shs.s),
       |sm AS MATERIALIZED (SELECT doc_id, i, MIN(${u64signed("mxout")}) AS mn
       |      FROM ($perms) pq GROUP BY doc_id, i),
       |minsu AS MATERIALIZED (SELECT doc_id, i,
       |      CAST(mn AS HUGEINT)
       |        + CASE WHEN mn < 0 THEN 18446744073709551616 ELSE 0 END AS mnu
       |      FROM sm),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM shs GROUP BY doc_id),
       |prs AS (SELECT a.doc_id AS aid, b.doc_id AS bid, count(*) AS inter
       |        FROM shs a JOIN shs b ON a.s = b.s AND a.doc_id < b.doc_id
       |        GROUP BY 1, 2),
       |truthp AS MATERIALIZED (SELECT aid AS a_id, bid AS b_id
       |        FROM prs JOIN sizes s1 ON aid = s1.doc_id
       |                 JOIN sizes s2 ON bid = s2.doc_id
       |        WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.8),
       |tn AS (SELECT COUNT(*) AS n_true FROM truthp)
       |SELECT * FROM ${cfg(64, 2)}
       |UNION ALL SELECT * FROM ${cfg(32, 4)}
       |UNION ALL SELECT * FROM ${cfg(16, 8)}""".stripMargin
  }

  /** d19: d13's span-fingerprint CTEs, then the covered positions are
    * anti-joined out of the position-indexed token list and each doc's
    * survivors re-aggregate in order (string_agg ORDER BY pos) under
    * the same md5 the Spark side computes; all-removed docs pin to
    * md5(''). */
  /** The d19 span-removal CTE chain through a `cleaned` CTE
    * (doc_id, n_tokens, n_removed, n_kept, clean_fp) — shared by the
    * d19 oracle and p7's composed-pipeline oracle. */
  private def d19Ctes: String = {
    val win8 = "w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]||' '||w[i+5]||' '||w[i+6]||' '||w[i+7]"
    s"""words AS MATERIALIZED (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS w FROM documents),
       |wins AS (SELECT doc_id, unnest(range(1, len(w) - 6)) AS i, w FROM words),
       |swin AS (SELECT doc_id, i - 1 AS idx, $win8 AS s FROM wins),
       |dsh AS (SELECT DISTINCT s FROM swin),
       |${OracleSql.fnv64Ctes(Seq("s"), "s", "dsh")},
       |sp AS MATERIALIZED (SELECT swin.doc_id, swin.idx, fp.fpu AS wh
       |                    FROM swin JOIN fp ON fp.s = swin.s),
       |dup AS (SELECT wh FROM (SELECT wh, count(DISTINCT doc_id) AS nd
       |                        FROM sp GROUP BY 1) WHERE nd >= 2),
       |fl AS MATERIALIZED (SELECT sp.doc_id, sp.idx FROM sp JOIN dup USING (wh)),
       |cov AS MATERIALIZED (SELECT DISTINCT doc_id, pos FROM (
       |         SELECT doc_id, unnest(range(idx, idx + 8)) AS pos FROM fl)),
       |toks AS (SELECT doc_id, unnest(range(0, len(w))) AS pos, w FROM words),
       |keptt AS (SELECT t.doc_id, t.pos, t.w[t.pos + 1] AS tok
       |          FROM toks t LEFT JOIN cov c
       |            ON c.doc_id = t.doc_id AND c.pos = t.pos
       |          WHERE c.doc_id IS NULL),
       |agg AS (SELECT doc_id, COUNT(*) AS n_kept,
       |         md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_fp
       |        FROM keptt GROUP BY doc_id),
       |covn AS (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id),
       |cleaned AS (SELECT words.doc_id,
       |  CAST(len(words.w) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(covn.n_removed, 0) AS BIGINT) AS n_removed,
       |  CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
       |  COALESCE(agg.clean_fp, md5('')) AS clean_fp
       | FROM words
       | LEFT JOIN agg ON agg.doc_id = words.doc_id
       | LEFT JOIN covn ON covn.doc_id = words.doc_id)""".stripMargin
  }

  private def d19OracleSql: String =
    s"""WITH RECURSIVE
       |$d19Ctes
       |SELECT doc_id, n_tokens, n_removed, n_kept, clean_fp
       |FROM cleaned""".stripMargin

  def oracles: Map[String, String] = {
    // s14 composes the s1 (exact) and s2 (LSH) replays verbatim: the
    // recall join runs over the SAME SQL the two operators are already
    // graded on, so the eval row can't drift from its operands
    val s14 = (exactSql: String, approxSql: String) =>
      s"""WITH exact AS ($exactSql),
         |approx AS (SELECT * FROM ($approxSql) t),
         |hits AS (SELECT e.query_id, count(*) AS n_hit
         |         FROM exact e JOIN approx a
         |           ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
         |         GROUP BY 1),
         |ks AS (SELECT query_id, count(*) AS k FROM exact GROUP BY 1)
         |SELECT ks.query_id, k, COALESCE(n_hit, 0) AS n_hit,
         |  CAST(COALESCE(n_hit, 0) AS DOUBLE) / k AS recall
         |FROM ks LEFT JOIN hits USING (query_id)""".stripMargin
    baseOracles + ("s14_ann_recall" ->
      s14(baseOracles("s1_ann_cosine"), baseOracles("s2_ann_lsh")))
  }

  private lazy val baseOracles: Map[String, String] = Map(
    "d11_bloom_decontaminate" -> d11OracleSql,
    "t23_bpe_small" -> t23OracleSql,
    "t17_bpe_tokenize" -> bpeOracleSql(200),
    "d13_dup_spans" -> d13OracleSql,
    "d19_span_removal" -> d19OracleSql,
    "d20_minhash_sweep" -> d20OracleSql,
    // p7: d19's cleaned CTE chain -> survival filter -> keeper on the
    // CLEAN fingerprint -> t25's xxhash64 threshold chain
    "p7_span_clean_pipeline" -> {
      val bucket = s"((${OracleSql.u64signed("h1u")} % 10000) + 10000) % 10000"
      s"""WITH RECURSIVE
         |$d19Ctes,
         |keptd AS MATERIALIZED (SELECT c.doc_id, d.source, c.n_kept, c.clean_fp
         |        FROM cleaned c JOIN documents d USING (doc_id)
         |        WHERE 2 * c.n_kept >= c.n_tokens),
         |kp AS MATERIALIZED (SELECT doc_id, source, n_kept FROM (
         |        SELECT keptd.*, row_number() OVER (PARTITION BY clean_fp ORDER BY doc_id) AS rn
         |        FROM keptd) q WHERE rn = 1),
         |xx AS MATERIALIZED (${OracleSql.xxHashLongLayers(
               "SELECT doc_id, source, n_kept, CAST(doc_id AS HUGEINT) AS fpu FROM kp")}),
         |r AS (SELECT doc_id, source, n_kept, $bucket AS bucket,
         |        CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 8000
         |             WHEN source IN ('src5','src6','src7','src8','src9') THEN 4000
         |             ELSE 2000 END AS bp
         |      FROM xx)
         |SELECT doc_id, source, n_kept,
         |  CAST(10000.0 AS DOUBLE) / CAST(bp AS DOUBLE) AS weight
         |FROM r WHERE bucket < bp""".stripMargin
    },
    // Exact replay of the RollingHash Expression: mod 2^31-1 keeps every
    // intermediate below 2^52 (plain BIGINT), bytes come from the proven
    // hex(encode(..)) idiom (m8), iteration from a recursive CTE (d9/p3).
    "t6_rolling_fingerprint" ->
      """WITH RECURSIVE b AS (
        |  SELECT doc_id,
        |    hex(encode(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS hx,
        |    octet_length(encode(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n
        |  FROM documents),
        |it AS (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS h, 0 AS i, hx, n FROM b
        |  UNION ALL
        |  SELECT doc_id,
        |    (h * 1000003 + ('0x' || substring(hx, 2*i+1, 2))::INTEGER) % 2147483647,
        |    i + 1, hx, n
        |  FROM it WHERE i < n)
        |SELECT doc_id, h AS rfp FROM it WHERE i = n""".stripMargin,
    // Shingles built t19-style (list_zip + slicing, proven green on the
    // driver for ALL docs) with a plain row-level DISTINCT instead of
    // list_distinct/list_transform/range — the r7 driver red isolated to
    // a DuckDB-version drift somewhere in the original construct set, and
    // every remaining ingredient here (list_zip: t19; LEFT JOIN+COALESCE:
    // q28/t21; MIN/COUNT group-bys: everywhere) is proven portable.
    "t22_novelty" ->
      """WITH words AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
        |tg AS (SELECT doc_id, p[1] || ' ' || p[2] || ' ' || p[3] AS s
        |  FROM (SELECT doc_id,
        |          unnest(list_zip(w[1:len(w)-2], w[2:len(w)-1], w[3:])) AS p
        |        FROM words WHERE len(w) >= 3)),
        |sh AS (SELECT DISTINCT doc_id, s FROM tg),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
        |fst AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s),
        |nov AS (SELECT first_doc AS doc_id, COUNT(*) AS n_novel
        |        FROM fst GROUP BY first_doc)
        |SELECT sizes.doc_id, sizes.n_shingles,
        |  COALESCE(nov.n_novel, CAST(0 AS BIGINT)) AS n_novel,
        |  CAST(COALESCE(nov.n_novel, 0) AS DOUBLE) / sizes.n_shingles AS novelty
        |FROM sizes LEFT JOIN nov ON sizes.doc_id = nov.doc_id""".stripMargin,
    "t21_bm25" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT COUNT(*) AS nd,
        |    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        |dftab AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
        |q AS (SELECT tok, df, r FROM (
        |  SELECT tok, df, row_number() OVER (ORDER BY df DESC, tok) AS r
        |  FROM dftab
        |  WHERE tok NOT IN ('the','a','of','and','is','to','in')) x
        |  WHERE r <= 3),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
        |contrib AS (SELECT tf.doc_id, q.r,
        |    -- e0 literals force DOUBLE: a bare 0.5 is DECIMAL in DuckDB
        |    -- and decimal intermediates round differently than IEEE
        |    ((stats.nd - q.df + 0.5e0) / (q.df + 0.5e0)) * (tf.tf * 2.2e0) /
        |      (tf.tf + 1.2e0 * (0.25e0 + 0.75e0 * dl.dl / stats.avgdl)) AS c
        |  FROM tf JOIN q USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats)
        |SELECT doc_id,
        |  COALESCE(MAX(CASE WHEN r = 1 THEN c END), 0) +
        |  COALESCE(MAX(CASE WHEN r = 2 THEN c END), 0) +
        |  COALESCE(MAX(CASE WHEN r = 3 THEN c END), 0) AS score
        |FROM contrib GROUP BY doc_id
        |ORDER BY score DESC, doc_id LIMIT 10""".stripMargin,
    "s7_kmeans" -> (kmeansCte + "\nSELECT vec_id, cid AS cluster FROM a3"),
    "s13_farthest_init" -> s13OracleSql,
    "s10_mmr_select" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
        |scored AS (SELECT q.qid, e.vec_id AS nid, e.v AS nv,
        |    list_dot_product(q.qv, e.v) /
        |      (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS rel,
        |    row_number() OVER (PARTITION BY q.qid ORDER BY
        |      list_dot_product(q.qv, e.v) /
        |      (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) DESC,
        |      e.vec_id) AS rn
        |  FROM e JOIN q ON e.vec_id <> q.qid),
        |pool AS (SELECT qid, nid, nv, rel FROM scored WHERE rn <= 8),
        |p1 AS (SELECT qid, nid, nv, rel FROM (
        |    SELECT qid, nid, nv, rel,
        |      row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS r
        |    FROM pool) x WHERE r = 1),
        |c2 AS (SELECT p.qid, p.nid, p.nv, p.rel,
        |    0.5 * p.rel - 0.5 * (list_dot_product(p.nv, s1.nv) / (sqrt(list_dot_product(p.nv, p.nv)) * sqrt(list_dot_product(s1.nv, s1.nv)))) AS score
        |  FROM pool p JOIN p1 s1 ON p.qid = s1.qid AND p.nid <> s1.nid),
        |p2 AS (SELECT qid, nid, nv, score FROM (
        |    SELECT qid, nid, nv, score,
        |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS r
        |    FROM c2) x WHERE r = 1),
        |c3 AS (SELECT p.qid, p.nid, p.nv, p.rel,
        |    0.5 * p.rel - 0.5 * greatest(list_dot_product(p.nv, s1.nv) / (sqrt(list_dot_product(p.nv, p.nv)) * sqrt(list_dot_product(s1.nv, s1.nv))), list_dot_product(p.nv, s2.nv) / (sqrt(list_dot_product(p.nv, p.nv)) * sqrt(list_dot_product(s2.nv, s2.nv)))) AS score
        |  FROM pool p JOIN p1 s1 ON p.qid = s1.qid JOIN p2 s2 ON p.qid = s2.qid
        |  WHERE p.nid <> s1.nid AND p.nid <> s2.nid),
        |p3 AS (SELECT qid, nid, nv, score FROM (
        |    SELECT qid, nid, nv, score,
        |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS r
        |    FROM c3) x WHERE r = 1),
        |c4 AS (SELECT p.qid, p.nid, p.rel,
        |    0.5 * p.rel - 0.5 * greatest(list_dot_product(p.nv, s1.nv) / (sqrt(list_dot_product(p.nv, p.nv)) * sqrt(list_dot_product(s1.nv, s1.nv))), list_dot_product(p.nv, s2.nv) / (sqrt(list_dot_product(p.nv, p.nv)) * sqrt(list_dot_product(s2.nv, s2.nv))), list_dot_product(p.nv, s3.nv) / (sqrt(list_dot_product(p.nv, p.nv)) * sqrt(list_dot_product(s3.nv, s3.nv)))) AS score
        |  FROM pool p JOIN p1 s1 ON p.qid = s1.qid JOIN p2 s2 ON p.qid = s2.qid
        |  JOIN p3 s3 ON p.qid = s3.qid
        |  WHERE p.nid <> s1.nid AND p.nid <> s2.nid AND p.nid <> s3.nid),
        |p4 AS (SELECT qid, nid, score FROM (
        |    SELECT qid, nid, score,
        |      row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS r
        |    FROM c4) x WHERE r = 1)
        |SELECT qid AS query_id, 1 AS pick, nid AS neighbor_id, rel AS score FROM p1
        |UNION ALL SELECT qid, 2, nid, score FROM p2
        |UNION ALL SELECT qid, 3, nid, score FROM p3
        |UNION ALL SELECT qid, 4, nid, score FROM p4""".stripMargin,
    "s8_knn_classify" ->
      """WITH knn AS (
        | SELECT query_id, neighbor_id FROM (
        |  SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
        |   row_number() OVER (PARTITION BY q.qid ORDER BY
        |     list_dot_product(q.qv, e.v) /
        |     (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) DESC,
        |     e.vec_id) AS rn
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) e
        |  JOIN (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |        FROM embeddings WHERE vec_id < 64) q ON e.vec_id <> q.qid) x
        | WHERE rn <= 8),
        |votes AS (SELECT k.query_id, l.label AS nlabel, COUNT(*) AS nv
        |          FROM knn k JOIN embeddings l ON k.neighbor_id = l.vec_id
        |          GROUP BY 1, 2),
        |pred AS (SELECT query_id, nlabel, nv,
        |    row_number() OVER (PARTITION BY query_id ORDER BY nv DESC, nlabel) AS rn
        |  FROM votes)
        |SELECT p.query_id, q.label AS true_label, p.nlabel AS pred_label,
        |  p.nv AS n_votes
        |FROM pred p JOIN embeddings q ON p.query_id = q.vec_id
        |WHERE p.rn = 1""".stripMargin,
    "s9_cluster_purity" -> (kmeansCte + """,
        |j AS (SELECT a3.cid AS cluster, l.label
        |      FROM a3 JOIN embeddings l USING (vec_id)),
        |g AS (SELECT cluster, label, COUNT(*) AS n FROM j GROUP BY 1, 2),
        |p AS (SELECT cluster, label, n,
        |    row_number() OVER (PARTITION BY cluster ORDER BY n DESC, label) AS rn,
        |    SUM(n) OVER (PARTITION BY cluster) AS n_members FROM g)
        |SELECT cluster, CAST(n_members AS BIGINT) AS n_members,
        |  label AS top_label, CAST(n AS BIGINT) AS n_top,
        |  CAST(n AS DOUBLE) / n_members AS purity
        |FROM p WHERE rn = 1""".stripMargin),
    // t28: every rule replayed as the same cross-multiplied integer
    // comparison; '#' counted via translate, '...' via global regex
    // removal, lines split on literal \n (both engines keep trailing
    // empties), bullets/ellipsis-ends on space-trimmed line edges
    "t28_gopher_filters" ->
      (s"WITH $gopherCtes\n" +
        """SELECT doc_id, n AS n_words, n_lines, reasons, reasons = 0 AS keep
          |FROM z""".stripMargin),
    // t30: windows replayed from the token array with the same integer
    // stride arithmetic; list_slice is 1-based inclusive like Spark's
    // slice; lateral range(0, nc) expands per-doc chunk counts
    "t30_overlap_chunks" ->
      """WITH x AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS a FROM documents),
        |y AS (SELECT doc_id, a, CAST(len(a) AS BIGINT) AS n,
        |    CASE WHEN len(a) <= 64 THEN CAST(1 AS BIGINT)
        |         ELSE (len(a) - 64 + 47) // 48 + 1 END AS nc
        |  FROM x),
        |c AS (SELECT doc_id, a, n, t.ci AS chunk_idx, t.ci * 48 AS cs,
        |    least(64, n - t.ci * 48) AS cl
        |  FROM y CROSS JOIN UNNEST(range(0, nc)) t(ci))
        |SELECT doc_id, chunk_idx, CAST(cs AS BIGINT) AS chunk_start,
        |  CAST(cl AS BIGINT) AS chunk_len,
        |  a[cs + 1] AS first_tok,
        |  a[cs + (cl + 1) // 2] AS mid_tok,
        |  a[cs + cl] AS last_tok,
        |  CAST(length(array_to_string(list_slice(a, cs + 1, cs + cl), ' '))
        |    AS BIGINT) AS n_chars
        |FROM c""".stripMargin,
    // t29: floor(log2 n) = length(bin(n)) - 1 on both engines — the
    // whole computation stays in integers
    "t29_bigram_surprisal" ->
      """WITH docs AS (SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS a FROM documents),
        |bg AS (SELECT doc_id, a[i] AS p, a[i] || ' ' || a[i+1] AS b
        |       FROM docs CROSS JOIN UNNEST(range(1, len(a))) t(i)),
        |cb AS (SELECT b, COUNT(*) AS cb FROM bg GROUP BY b),
        |cp AS (SELECT p, COUNT(*) AS cp FROM bg GROUP BY p)
        |SELECT bg.doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM((length(bin(cp.cp)) - 1) - (length(bin(cb.cb)) - 1)) AS BIGINT)
        |    AS surprisal_bits,
        |  CAST(MAX((length(bin(cp.cp)) - 1) - (length(bin(cb.cb)) - 1)) AS BIGINT)
        |    AS max_bits
        |FROM bg JOIN cb USING (b) JOIN cp USING (p)
        |GROUP BY bg.doc_id""".stripMargin,
    // t32: t29's integer surprisal replay → ntile(3) over the same
    // (mean-bits double, doc_id) total order → t25's xxhash64
    // threshold at the per-bucket rates
    "t32_ccnet_buckets" -> {
      val hb = s"((${OracleSql.u64signed("h1u")} % 10000) + 10000) % 10000"
      s"""WITH docs AS (SELECT doc_id,
         |    regexp_split_to_array(lower(trim(text)), '\\s+') AS a FROM documents),
         |bg AS (SELECT doc_id, a[i] AS p, a[i] || ' ' || a[i+1] AS b
         |       FROM docs CROSS JOIN UNNEST(range(1, len(a))) t(i)),
         |cbt AS (SELECT b, COUNT(*) AS cb FROM bg GROUP BY b),
         |cpt AS (SELECT p, COUNT(*) AS cp FROM bg GROUP BY p),
         |st AS (SELECT bg.doc_id, COUNT(*) AS n_bigrams,
         |        CAST(SUM((length(bin(cpt.cp)) - 1) - (length(bin(cbt.cb)) - 1)) AS BIGINT)
         |          AS surprisal_bits
         |       FROM bg JOIN cbt USING (b) JOIN cpt USING (p) GROUP BY bg.doc_id),
         |rk AS (SELECT doc_id, n_bigrams, surprisal_bits,
         |        ntile(3) OVER (ORDER BY CAST(surprisal_bits AS DOUBLE) / n_bigrams, doc_id)
         |          AS bucket
         |       FROM st),
         |xx AS (${OracleSql.xxHashLongLayers(
               "SELECT doc_id, n_bigrams, surprisal_bits, bucket, CAST(doc_id AS HUGEINT) AS fpu FROM rk")})
         |SELECT doc_id, n_bigrams, surprisal_bits, bucket,
         | $hb < (CASE bucket WHEN 1 THEN 10000 WHEN 2 THEN 5000 ELSE 1000 END) AS kept
         |FROM xx""".stripMargin
    },
    // t34: the same count-table derivations and the same scaled
    // rational, replayed verbatim
    "t34_kneser_ney" ->
      """WITH docs AS (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS a
        |             FROM documents),
        |bg AS (SELECT a[i] AS w1, a[i+1] AS w2
        |       FROM docs CROSS JOIN UNNEST(range(1, len(a))) t(i)),
        |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
        |lft AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS nfwd FROM c12 GROUP BY 1),
        |bck AS (SELECT w2, COUNT(*) AS nback FROM c12 GROUP BY 1),
        |nbt AS (SELECT COUNT(*) AS nb FROM c12)
        |SELECT c12.w1, c12.w2, c12.c12,
        | CAST(GREATEST(4*c12.c12 - 3, 0) * nb + 3 * nfwd * nback AS BIGINT) AS num,
        | CAST(4 * c1 * nb AS BIGINT) AS den,
        | CAST(length(bin(GREATEST(4*c12.c12 - 3, 0) * nb + 3 * nfwd * nback))
        |    - length(bin(4 * c1 * nb)) AS INTEGER) AS qbits
        |FROM c12 JOIN lft USING (w1) JOIN bck USING (w2) CROSS JOIN nbt""".stripMargin,
    // t37: the Bresenham slot formula and both window orders replayed
    // verbatim; weight = 1 + (numeric source suffix % 3)
    // t38: the fixture aliases and the canonicalizer replayed step by
    // step with DuckDB lateral column references (split_part /
    // list_filter / list_sort mirror substring_index / filter /
    // array_sort), then the group stats as windows over the canonical
    // key.
    // t40: the card replayed from the t1/t4 oracle kernels — token
    // split, canonical-md5 fingerprint, per-source aggregates, modal
    // language by (cnt DESC, lang) row_number; SUM(INTEGER) widens to
    // HUGEINT in DuckDB, hence the BIGINT casts
    "t40_dataset_card" ->
      """WITH b AS (SELECT source, lang,
        |    len(regexp_split_to_array(trim(text), '\s+')) AS nt,
        |    length(text) AS nc,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |per AS (SELECT source, count(*) AS n_docs,
        |    CAST(sum(nt) AS BIGINT) AS n_tokens,
        |    CAST(sum(nc) AS BIGINT) AS n_chars,
        |    count(DISTINCT lang) AS n_langs,
        |    count(DISTINCT fp) AS n_fp
        |  FROM b GROUP BY 1),
        |lc AS (SELECT source, lang, count(*) AS cnt FROM b GROUP BY 1, 2),
        |top AS (SELECT source, lang AS top_lang, cnt AS top_lang_docs
        |  FROM (SELECT *, row_number() OVER (PARTITION BY source
        |          ORDER BY cnt DESC, lang) AS rn FROM lc) x
        |  WHERE rn = 1)
        |SELECT per.source, n_docs, n_tokens, n_chars, n_langs,
        |  top_lang, top_lang_docs, n_docs - n_fp AS n_exact_dups,
        |  CAST(n_docs - n_fp AS DOUBLE) / n_docs AS dup_rate
        |FROM per JOIN top ON per.source = top.source""".stripMargin,
    // t39: the planted-PII construction and the email → phone → id
    // redaction chain replayed verbatim; DuckDB's regexp_replace needs
    // the explicit 'g' flag (Spark's is global by default) and counts
    // come from len(regexp_extract_all). Patterns are in the Java∩RE2
    // dialect intersection, so both engines find the same matches.
    "t39_pii_redact" ->
      """WITH p AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@mail.example.com now' ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0 THEN ' call 415-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0 THEN ' ref ' || lpad(CAST((doc_id * 31) % 1000000000 AS VARCHAR), 9, '0') ELSE '' END
        |  AS txt FROM documents),
        |r1 AS (SELECT doc_id,
        |  len(regexp_extract_all(txt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS n_email,
        |  len(regexp_extract_all(txt, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS n_phone,
        |  regexp_replace(regexp_replace(txt,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '[EMAIL]', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}', '[PHONE]', 'g') AS r2
        |  FROM p),
        |r2 AS (SELECT doc_id, n_email, n_phone,
        |  len(regexp_extract_all(r2, '[0-9]{9}[0-9]*')) AS n_longid,
        |  regexp_replace(r2, '[0-9]{9}[0-9]*', '[ID]', 'g') AS red
        |  FROM r1)
        |SELECT doc_id, CAST(n_email AS INTEGER) AS n_email,
        |  CAST(n_phone AS INTEGER) AS n_phone,
        |  CAST(n_longid AS INTEGER) AS n_longid,
        |  CAST(length(red) AS INTEGER) AS red_len, md5(red) AS red_md5
        |FROM r2""".stripMargin,
    "t38_url_dedup" ->
      """WITH u AS (SELECT doc_id, doc_id // 6 AS k, doc_id % 6 AS v
        |  FROM documents),
        |r AS (SELECT doc_id,
        |  CASE v
        |   WHEN 0 THEN 'https://example' || k || '.com/p/' || k || '?a=1&b=2'
        |   WHEN 1 THEN 'HTTPS://EXAMPLE' || k || '.COM/p/' || k || '?a=1&b=2'
        |   WHEN 2 THEN 'https://example' || k || '.com:443/p/' || k || '?a=1&b=2'
        |   WHEN 3 THEN 'https://example' || k || '.com/p/' || k || '?b=2&a=1'
        |   WHEN 4 THEN 'https://example' || k || '.com/p/' || k || '?utm_source=t?w&a=1&b=2'
        |   ELSE 'https://example' || k || '.com/p/' || k || '?a=1&b=2#section'
        |  END AS url FROM u),
        |c AS (SELECT doc_id,
        |  split_part(url, '#', 1) AS nofrag,
        |  split_part(nofrag, '?', 1) AS base,
        |  CASE WHEN contains(nofrag, '?') THEN substring(nofrag, length(base) + 2)
        |       ELSE '' END AS query,
        |  lower(split_part(base, '://', 1)) AS scheme,
        |  split_part(base, '://', 2) AS rest,
        |  split_part(rest, '/', 1) AS hostport,
        |  substring(rest, length(hostport) + 1) AS path,
        |  CASE WHEN scheme = 'https' THEN regexp_replace(lower(hostport), ':443$', '')
        |       WHEN scheme = 'http' THEN regexp_replace(lower(hostport), ':80$', '')
        |       ELSE lower(hostport) END AS host,
        |  list_sort(list_filter(string_split(query, '&'), x ->
        |    x <> '' AND NOT starts_with(x, 'utm_') AND
        |    NOT starts_with(x, 'fbclid') AND NOT starts_with(x, 'gclid')))
        |    AS kept,
        |  scheme || '://' || host || path ||
        |    CASE WHEN len(kept) > 0 THEN '?' || array_to_string(kept, '&')
        |         ELSE '' END AS canon
        | FROM r)
        |SELECT doc_id, canon,
        | COUNT(*) OVER (PARTITION BY canon) AS n_dups,
        | MIN(doc_id) OVER (PARTITION BY canon) AS rep_id
        |FROM c""".stripMargin,
    "t37_mixture_interleave" ->
      """WITH w AS (SELECT source,
        |    1 + CAST(substr(source, 4) AS INTEGER) % 3 AS w
        |  FROM (SELECT DISTINCT source FROM documents)),
        |wt AS (SELECT CAST(SUM(w) AS BIGINT) AS wtot FROM w),
        |r AS (SELECT d.doc_id, d.source, w.w,
        |    CAST(row_number() OVER (PARTITION BY d.source ORDER BY d.doc_id)
        |      - 1 AS BIGINT) AS r
        |  FROM documents d JOIN w USING (source)),
        |s AS (SELECT doc_id, source, w, r,
        |    CAST(((2*r + 1) * wtot) // (2*w) AS BIGINT) AS slot
        |  FROM r CROSS JOIN wt)
        |SELECT doc_id, source, w, r, slot,
        | CAST(row_number() OVER (ORDER BY slot, source, r) - 1 AS BIGINT)
        |   AS mix_pos
        |FROM s""".stripMargin,
    // t36: the t34 LM replay extended per-doc — bigrams keep their
    // doc_id, the qbits table joins back on (w1, w2), and the tercile
    // uses the same (mean DESC, doc_id) total order as t33's ntile
    "t36_lm_perplexity_filter" ->
      """WITH docs AS (SELECT doc_id,
        |        regexp_split_to_array(lower(trim(text)), '\s+') AS a
        |      FROM documents),
        |bg AS (SELECT doc_id, a[i] AS w1, a[i+1] AS w2
        |       FROM docs CROSS JOIN UNNEST(range(1, len(a))) t(i)),
        |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
        |lft AS (SELECT w1, SUM(c12) AS c1, COUNT(*) AS nfwd FROM c12 GROUP BY 1),
        |bck AS (SELECT w2, COUNT(*) AS nback FROM c12 GROUP BY 1),
        |nbt AS (SELECT COUNT(*) AS nb FROM c12),
        |lm AS (SELECT c12.w1, c12.w2,
        |        length(bin(GREATEST(4*c12.c12 - 3, 0) * nb + 3 * nfwd * nback))
        |          - length(bin(4 * c1 * nb)) AS qbits
        |       FROM c12 JOIN lft USING (w1) JOIN bck USING (w2) CROSS JOIN nbt),
        |sc AS (SELECT doc_id, COUNT(*) AS n_bigrams,
        |        CAST(SUM(qbits) AS BIGINT) AS sum_qbits
        |       FROM bg JOIN lm USING (w1, w2) GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, sum_qbits,
        | ntile(3) OVER (ORDER BY CAST(sum_qbits AS DOUBLE) / n_bigrams DESC,
        |                doc_id) AS tercile,
        | ntile(3) OVER (ORDER BY CAST(sum_qbits AS DOUBLE) / n_bigrams DESC,
        |                doc_id) <= 2 AS keep
        |FROM sc""".stripMargin,
    // t33: same hashed-bucket featurization (t20's md5 idiom), same
    // integer-bits weights, same (mean DESC, doc_id) ntile total order
    "t33_dsir_select" ->
      """WITH docs AS (SELECT doc_id, lang,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS a FROM documents),
        |uni AS (SELECT doc_id, lang, unnest(a) AS g, 0 AS off FROM docs),
        |big AS (SELECT doc_id, lang, a[i] || ' ' || a[i+1] AS g, 128 AS off
        |        FROM docs CROSS JOIN UNNEST(range(1, len(a))) t(i)),
        |feats AS (SELECT doc_id, lang,
        |           (('0x' || substring(md5(g), 1, 4))::INTEGER % 128) + off AS b
        |          FROM (SELECT * FROM uni UNION ALL SELECT * FROM big)),
        |raw AS (SELECT b, COUNT(*) AS cr FROM feats GROUP BY b),
        |tgt AS (SELECT b, COUNT(*) AS ct FROM feats WHERE lang = 'en' GROUP BY b),
        |wts AS (SELECT raw.b,
        |         CAST(length(bin(COALESCE(ct, 0) + 1)) - length(bin(cr + 1)) AS BIGINT) AS wt
        |        FROM raw LEFT JOIN tgt USING (b)),
        |sc AS (SELECT doc_id, COUNT(*) AS n_feats, CAST(SUM(wt) AS BIGINT) AS sum_w
        |       FROM feats JOIN wts USING (b) GROUP BY doc_id)
        |SELECT doc_id, n_feats, sum_w,
        | ntile(4) OVER (ORDER BY CAST(sum_w AS DOUBLE) / n_feats DESC, doc_id)
        |   AS quartile,
        | ntile(4) OVER (ORDER BY CAST(sum_w AS DOUBLE) / n_feats DESC, doc_id) = 1
        |   AS selected
        |FROM sc""".stripMargin,
    // p6: the full filter → keeper → sample chain in one statement —
    // gopherCtes selects, md5-fingerprint keeper picks, the t25 hash
    // thresholds sample the keepers (xxhash64 layers over doc_id)
    "p6_gopher_pipeline" -> {
      val bucket = s"((${OracleSql.u64signed("h1u")} % 10000) + 10000) % 10000"
      s"""WITH $gopherCtes,
         |kept AS MATERIALIZED (SELECT doc_id, n AS n_words FROM z WHERE reasons = 0),
         |fpd AS MATERIALIZED (SELECT d.doc_id, d.source, kept.n_words,
         |          md5(regexp_replace(lower(trim(d.text)), '\\s+', ' ', 'g')) AS fp
         |        FROM documents d JOIN kept ON d.doc_id = kept.doc_id),
         |kp AS MATERIALIZED (SELECT doc_id, source, n_words FROM (
         |        SELECT fpd.*, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
         |        FROM fpd) q WHERE rn = 1),
         |xx AS MATERIALIZED (${OracleSql.xxHashLongLayers(
             "SELECT doc_id, source, n_words, CAST(doc_id AS HUGEINT) AS fpu FROM kp")}),
         |r AS (SELECT doc_id, source, n_words, $bucket AS bucket,
         |        CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 5000
         |             WHEN source IN ('src5','src6','src7','src8','src9') THEN 2500
         |             ELSE 1000 END AS bp
         |      FROM xx)
         |SELECT doc_id, source, n_words,
         |  CAST(10000.0 AS DOUBLE) / CAST(bp AS DOUBLE) AS weight
         |FROM r WHERE bucket < bp""".stripMargin
    },
    "t27_quality_classifier" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        |  FROM documents),
        |f AS (SELECT doc_id,
        |    (('0x' || substring(md5(tok), 1, 4))::INTEGER % 128) AS bucket,
        |    COUNT(*) AS n
        |  FROM toks GROUP BY doc_id, bucket),
        |w AS (SELECT i::INTEGER AS bucket,
        |    CAST((('0x' || substring(md5('w' || i::VARCHAR), 1, 4))::INTEGER
        |          % 1024) - 512 AS BIGINT) AS w
        |  FROM range(0, 128) t(i)),
        |s AS (SELECT doc_id, CAST(SUM(n * w) AS BIGINT) AS logit,
        |    CAST(SUM(n) AS BIGINT) AS n_tokens
        |  FROM f JOIN w USING (bucket) GROUP BY doc_id)
        |SELECT doc_id, logit,
        |  CAST(logit AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS score,
        |  logit >= 0 AS keep
        |FROM s""".stripMargin,
    "t20_hashed_features" ->
      """WITH toks AS (SELECT doc_id,
        |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        |  FROM documents)
        |SELECT doc_id,
        | (('0x' || substring(md5(tok), 1, 4))::INTEGER % 128) AS bucket,
        | COUNT(*) AS n
        |FROM toks GROUP BY doc_id, bucket""".stripMargin,
    "t18_source_mix" ->
      """WITH d AS (SELECT source, lang, doc_id, n_chars,
        |   CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_toks
        | FROM documents),
        |r AS (SELECT *,
        |   ROW_NUMBER() OVER (PARTITION BY source, lang ORDER BY n_chars, doc_id) AS rn,
        |   COUNT(*) OVER (PARTITION BY source, lang) AS cnt
        | FROM d)
        |SELECT source, lang, COUNT(*) AS n_docs,
        | CAST(SUM(n_chars) AS BIGINT) AS tot_chars,
        | CAST(SUM(n_toks) AS BIGINT) AS tok_mass,
        | CAST(MAX(CASE WHEN rn = (cnt + 1) // 2 THEN n_chars END) AS BIGINT) AS med_chars
        |FROM r GROUP BY source, lang""".stripMargin,
    "t19_bigram_mass" ->
      """WITH d AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS a
        |           FROM documents),
        |bg AS (SELECT doc_id, p[1] || ' ' || p[2] AS bigram
        |       FROM (SELECT doc_id, unnest(list_zip(a[1:len(a)-1], a[2:])) AS p FROM d)),
        |freq AS (SELECT bigram, COUNT(*) AS cnt FROM bg GROUP BY bigram)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        | CAST(SUM(cnt) AS BIGINT) AS bigram_mass,
        | CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique_bigrams
        |FROM bg JOIN freq USING (bigram)
        |GROUP BY doc_id""".stripMargin,
    "t1_token_stats" ->
      """SELECT doc_id,
        | len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        | length(text) AS len_chars
        |FROM documents""".stripMargin,
    "t2_quality_score" ->
      """SELECT doc_id, n_tokens,
        | uniq_ratio, stop_ratio, avg_token_len,
        | uniq_ratio * 0.5 + stop_ratio * 0.3 +
        |   least(avg_token_len / 10.0, 1.0) * 0.2 AS quality
        |FROM (
        | SELECT doc_id, len(w) AS n_tokens,
        |  CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS uniq_ratio,
        |  CAST(len(list_filter(w, t -> t IN ('the','a','of','and','is'))) AS DOUBLE)
        |    / CAST(len(w) AS DOUBLE) AS stop_ratio,
        |  CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
        |    / CAST(len(w) AS DOUBLE) AS avg_token_len
        | FROM (SELECT doc_id, text,
        |         regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |       FROM documents) x) y""".stripMargin,
    "t3_lang_guess" ->
      s"""SELECT doc_id, $langCase AS lang_guess,
        | ($langCase = lang) AS is_match
        |FROM (
        | SELECT doc_id, lang,
        |  len(list_filter(w, t -> t IN ('the','a','of','and','is'))) AS s_en,
        |  len(list_filter(w, t -> t IN ('der','die','das','und','ist'))) AS s_de,
        |  len(list_filter(w, t -> t IN ('el','los','las','y','que'))) AS s_es,
        |  len(list_filter(w, t -> t IN ('le','les','et','est','une'))) AS s_fr,
        |  len(list_filter(w, t -> t IN ('的','是','在','了','和'))) AS s_zh
        | FROM (SELECT doc_id, lang,
        |         regexp_split_to_array(lower(trim(text)), '\\s+') AS w
        |       FROM documents) x) y""".stripMargin,
    "t4_fingerprint" ->
      """SELECT doc_id,
        | md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,
    "t5_bpe_tokens" ->
      """SELECT doc_id,
        | len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_units,
        | len(list_distinct(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS n_uniq_units,
        | CAST(list_sum(list_transform(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'), u -> length(u))) AS DOUBLE)
        |   / CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS DOUBLE) AS avg_unit_len
        |FROM documents""".stripMargin,
    // t6_rolling_fingerprint: custom native expression — rows-only check.
    "t7_split_assign" ->
      """SELECT doc_id,
        | CASE WHEN substring(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 2) < 'e6' THEN 'train'
        |      WHEN substring(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 2) < 'f3' THEN 'val'
        |      ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "t8_rare_tokens" ->
      """WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
        |              FROM documents),
        |freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        | CAST(SUM(cnt) AS BIGINT) AS freq_mass,
        | CAST(SUM(CASE WHEN cnt < 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        |FROM toks JOIN freq USING (tok)
        |GROUP BY doc_id""".stripMargin,
    "t9_lang_quota" ->
      """SELECT lang, rn AS rank, doc_id FROM (
        | SELECT lang, doc_id,
        |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), doc_id) AS rn
        | FROM documents) x
        |WHERE rn <= 50""".stripMargin,
    "t10_redact_pii" ->
      """WITH salted AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@example.com from 10.0.'
        |    || (doc_id % 256) || '.7' AS text
        | FROM documents)
        |SELECT doc_id,
        | regexp_replace(regexp_replace(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS redacted,
        | CAST(len(regexp_extract_all(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) +
        |  len(regexp_extract_all(text,
        |   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_redactions
        |FROM salted""".stripMargin,
    "t11_repetition" ->
      """WITH words AS (SELECT doc_id,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
        |bg AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg
        | FROM words WHERE len(w) >= 2),
        |counts AS (SELECT doc_id, bg, COUNT(*) AS n FROM bg GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
        | CAST(MAX(n) AS BIGINT) AS top_n,
        | CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS top_fraction
        |FROM counts GROUP BY doc_id""".stripMargin,
    "t12_vocab_encode" ->
      """WITH words AS (SELECT doc_id,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
        |toks AS (SELECT doc_id, unnest(w) AS tok FROM words),
        |freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
        |vocab AS (SELECT tok, rn - 1 AS id FROM (
        |   SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS rn
        |   FROM freq) x WHERE rn <= 1000),
        |pos AS (SELECT doc_id, unnest(range(1, len(w) + 1)) AS i, w FROM words),
        |enc AS (SELECT p.doc_id, p.i, COALESCE(v.id, -1) AS tid
        |        FROM (SELECT doc_id, i, w[i] AS tok FROM pos) p
        |        LEFT JOIN vocab v USING (tok))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        | CAST(SUM(CASE WHEN tid = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        | CAST(SUM(i * (tid + 2)) AS BIGINT) AS ids_checksum
        |FROM enc GROUP BY doc_id""".stripMargin,
    "t13_token_chunks" ->
      """WITH words AS (SELECT doc_id,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
        |n AS (SELECT doc_id, len(w) AS n_tokens FROM words),
        |c AS (SELECT doc_id, n_tokens,
        |  unnest(range(0, CAST(ceil(n_tokens / 64.0) AS BIGINT))) AS chunk_idx
        | FROM n)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(chunk_idx AS BIGINT) AS chunk_idx,
        | CAST(chunk_idx * 64 AS BIGINT) AS chunk_start,
        | CAST(least(64, n_tokens - chunk_idx * 64) AS BIGINT) AS chunk_len
        |FROM c""".stripMargin,
    "t14_pack_sequences" ->
      """WITH d AS (SELECT doc_id,
        |  len(regexp_split_to_array(lower(trim(text)), '\s+')) AS n_tokens,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        | FROM documents),
        |c AS (SELECT doc_id, substring(fp, 1, 1) AS bucket, fp, n_tokens,
        |  SUM(n_tokens) OVER (PARTITION BY substring(fp, 1, 1)
        |    ORDER BY fp, doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS o
        | FROM d)
        |SELECT doc_id, bucket, CAST(n_tokens AS BIGINT) AS n_tokens,
        | CAST(o AS BIGINT) AS seq_offset,
        | CAST(floor(o / 256.0) AS BIGINT) AS seq_first,
        | CAST(floor((o + n_tokens - 1) / 256.0) AS BIGINT) AS seq_last
        |FROM c""".stripMargin,
    "p2_prep_pipeline_v2" ->
      """WITH words AS (SELECT doc_id,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(w) - 6),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
        |      || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6]
        |      || ' ' || w[i+7]))) AS s
        | FROM words WHERE len(w) >= 8),
        |bsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
        |cont AS (SELECT DISTINCT doc_id FROM sh
        |         WHERE s IN (SELECT s FROM bsh)),
        |surv AS (SELECT d.doc_id, d.lang,
        |    len(regexp_split_to_array(lower(trim(d.text)), '\s+')) AS n_tokens,
        |    md5(regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents d
        |  WHERE d.doc_id NOT IN (SELECT doc_id FROM cont)),
        |c AS (SELECT lang, COUNT(*) AS n_lang FROM surv GROUP BY lang),
        |m AS (SELECT MAX(n_lang) AS maxn FROM c),
        |e AS (SELECT lang, least(4, (maxn + n_lang - 1) // n_lang) AS n_epochs
        |      FROM c, m),
        |mixed AS (SELECT s.doc_id, s.fp, s.n_tokens,
        |    unnest(range(1, e.n_epochs + 1)) AS epoch
        |  FROM surv s JOIN e USING (lang))
        |SELECT substring(fp, 1, 1) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n_entries,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(floor((SUM(n_tokens) - 1) / 256.0) + 1 AS BIGINT) AS n_sequences
        |FROM mixed GROUP BY 1""".stripMargin,
    "d12_ngram_decontaminate" ->
      """WITH words AS (SELECT doc_id,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(w) - 6),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
        |      || ' ' || w[i+4] || ' ' || w[i+5] || ' ' || w[i+6]
        |      || ' ' || w[i+7]))) AS s
        | FROM words WHERE len(w) >= 8),
        |bsh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
        |cont AS (SELECT DISTINCT doc_id FROM sh
        |         WHERE s IN (SELECT s FROM bsh))
        |SELECT doc_id FROM documents
        |WHERE doc_id NOT IN (SELECT doc_id FROM cont)""".stripMargin,
    "t16_epoch_mix" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
        |m AS (SELECT MAX(n_lang) AS maxn FROM c),
        |e AS (SELECT lang, least(4, (maxn + n_lang - 1) // n_lang) AS n_epochs
        |      FROM c, m)
        |SELECT d.doc_id, d.lang, CAST(e.n_epochs AS BIGINT) AS n_epochs,
        |       CAST(unnest(range(1, e.n_epochs + 1)) AS BIGINT) AS epoch
        |FROM documents d JOIN e USING (lang)""".stripMargin,
    "t15_global_shuffle" ->
      """WITH d AS (SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        | FROM documents)
        |SELECT doc_id, fp,
        | CAST(row_number() OVER (ORDER BY fp, doc_id) - 1 AS BIGINT)
        |   AS shuffle_pos
        |FROM d""".stripMargin,
    "d10_segment_dedup" ->
      """WITH words AS (SELECT doc_id,
        |  regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
        |idx AS (SELECT doc_id, w,
        |  unnest(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT))) AS seg_idx
        | FROM words),
        |segs AS (SELECT doc_id, seg_idx,
        |  array_to_string(w[seg_idx*8 + 1 : seg_idx*8 + 8], ' ') AS seg
        | FROM idx),
        |dup AS (SELECT seg FROM segs GROUP BY seg
        |        HAVING COUNT(DISTINCT doc_id) >= 2),
        |flagged AS (SELECT s.doc_id, s.seg_idx, s.seg,
        |  d.seg IS NOT NULL AS removed
        | FROM segs s LEFT JOIN dup d ON s.seg = d.seg)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
        | CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        | md5(coalesce(string_agg(CASE WHEN NOT removed THEN seg END, ' '
        |   ORDER BY seg_idx), '')) AS clean_fp
        |FROM flagged GROUP BY doc_id""".stripMargin,
    "d6_decontaminate" ->
      """SELECT doc_id,
        | md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents
        |WHERE md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) NOT IN
        | (SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |  FROM documents WHERE doc_id % 20 = 0)""".stripMargin,
    "d1_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        | min(doc_id) AS keep_id, count(*) AS n_docs
        |FROM documents GROUP BY 1""".stripMargin,
    "p1_prep_pipeline" ->
      """WITH scored AS (
        | SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) * 0.5 +
        |  CAST(len(list_filter(w, t -> t IN ('the','a','of','and','is'))) AS DOUBLE)
        |    / CAST(len(w) AS DOUBLE) * 0.3 +
        |  least(CAST(length(regexp_replace(text, ' ', '', 'g')) AS DOUBLE)
        |    / CAST(len(w) AS DOUBLE) / 10.0, 1.0) * 0.2 AS q
        | FROM (SELECT doc_id, text,
        |         regexp_split_to_array(lower(trim(text)), '\s+') AS w
        |       FROM documents) x),
        |kept AS (SELECT fp, min(doc_id) AS doc_id FROM scored
        |         WHERE q >= 0.5 GROUP BY fp)
        |SELECT CASE WHEN substring(fp, 1, 2) < 'e6' THEN 'train'
        |            WHEN substring(fp, 1, 2) < 'f3' THEN 'val'
        |            ELSE 'test' END AS split,
        |       COUNT(*) AS n_docs
        |FROM kept GROUP BY 1""".stripMargin,
    "d2_dedup_jaccard" -> shingleCte,
    "d3_dedup_minhash_lsh" -> shingleCte,
    // d18: exhaustive exact replay of the incremental check — md5
    // equi-join for the exact stage, full cross-pair shingle Jaccard
    // for the near stage (the banding recall gate d2/d3 established,
    // restricted to incoming x base pairs)
    "d18_incremental_dedup" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8),
        |inc AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8),
        |ex AS (SELECT i.doc_id, min(b.doc_id) AS exact_base
        |       FROM inc i JOIN base b ON md5(i.text) = md5(b.text) GROUP BY 1),
        |words AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s FROM words),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS aid, b.doc_id AS bid, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.s = b.s
        |          WHERE a.doc_id % 10 >= 8 AND b.doc_id % 10 < 8 GROUP BY 1, 2),
        |near AS (SELECT aid, min(bid) AS near_base, count(*) AS n_near
        |         FROM pairs JOIN sizes s1 ON aid = s1.doc_id JOIN sizes s2 ON bid = s2.doc_id
        |         WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.8 GROUP BY 1)
        |SELECT i.doc_id,
        | CASE WHEN ex.exact_base IS NOT NULL THEN 2
        |      WHEN near.near_base IS NOT NULL THEN 1 ELSE 0 END AS status,
        | COALESCE(ex.exact_base, near.near_base) AS match_id,
        | CAST(COALESCE(near.n_near, 0) AS BIGINT) AS n_near_base
        |FROM inc i LEFT JOIN ex ON i.doc_id = ex.doc_id
        |LEFT JOIN near ON i.doc_id = near.aid""".stripMargin,
    // t31: every n-gram coverage recomputed — counts per (doc, n,
    // gram), top-1 by (cnt DESC, gram ASC), duplicated-5-gram sum,
    // thresholds as the same cross-multiplied integer comparisons
    "t31_repetition_filters" ->
      """WITH w AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |        regexp_split_to_array(lower(trim(text)), '\s+') AS ws FROM documents),
        |g AS (SELECT doc_id, n,
        |        array_to_string(list_slice(ws, CAST(i AS INTEGER), CAST(i + n - 1 AS INTEGER)), ' ') AS gram
        |      FROM w CROSS JOIN (VALUES (2), (3), (4), (5)) v(n)
        |      CROSS JOIN range(1, 2001) t(i) WHERE i <= len(ws) - n + 1),
        |c AS (SELECT doc_id, n, gram, count(*) AS cnt FROM g GROUP BY 1, 2, 3),
        |tops AS (SELECT doc_id, n, CAST(cnt * length(gram) AS BIGINT) AS cov,
        |         row_number() OVER (PARTITION BY doc_id, n ORDER BY cnt DESC, gram ASC) AS rn FROM c),
        |d5 AS (SELECT doc_id,
        |        CAST(COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt * length(gram) END), 0) AS BIGINT) AS dup5_cov
        |       FROM c WHERE n = 5 GROUP BY doc_id),
        |f AS (SELECT w.doc_id, w.n_chars,
        |        CAST(COALESCE(t2.cov, 0) AS BIGINT) AS top2_cov,
        |        CAST(COALESCE(t3.cov, 0) AS BIGINT) AS top3_cov,
        |        CAST(COALESCE(t4.cov, 0) AS BIGINT) AS top4_cov,
        |        CAST(COALESCE(d5.dup5_cov, 0) AS BIGINT) AS dup5_cov
        |      FROM w
        |      LEFT JOIN (SELECT doc_id, cov FROM tops WHERE n = 2 AND rn = 1) t2 ON w.doc_id = t2.doc_id
        |      LEFT JOIN (SELECT doc_id, cov FROM tops WHERE n = 3 AND rn = 1) t3 ON w.doc_id = t3.doc_id
        |      LEFT JOIN (SELECT doc_id, cov FROM tops WHERE n = 4 AND rn = 1) t4 ON w.doc_id = t4.doc_id
        |      LEFT JOIN d5 ON w.doc_id = d5.doc_id)
        |SELECT doc_id, n_chars, top2_cov, top3_cov, top4_cov, dup5_cov,
        | (CASE WHEN top2_cov * 100 > n_chars * 20 THEN 1 ELSE 0 END +
        |  CASE WHEN top3_cov * 100 > n_chars * 18 THEN 2 ELSE 0 END +
        |  CASE WHEN top4_cov * 100 > n_chars * 16 THEN 4 ELSE 0 END +
        |  CASE WHEN dup5_cov * 100 > n_chars * 15 THEN 8 ELSE 0 END) AS reasons,
        | (CASE WHEN top2_cov * 100 > n_chars * 20 THEN 1 ELSE 0 END +
        |  CASE WHEN top3_cov * 100 > n_chars * 18 THEN 2 ELSE 0 END +
        |  CASE WHEN top4_cov * 100 > n_chars * 16 THEN 4 ELSE 0 END +
        |  CASE WHEN dup5_cov * 100 > n_chars * 15 THEN 8 ELSE 0 END) = 0 AS keep
        |FROM f""".stripMargin,
    "d16_containment" ->
      """WITH words AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s FROM words),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |pairs AS (SELECT a.doc_id AS aid, b.doc_id AS bid, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id <> b.doc_id
        |          GROUP BY 1, 2)
        |SELECT aid AS a_id, bid AS b_id,
        |       CAST(inter AS DOUBLE) / s1.sz AS containment
        |FROM pairs JOIN sizes s1 ON aid = s1.doc_id
        |WHERE CAST(inter AS DOUBLE) / s1.sz >= 0.8""".stripMargin,
    "p5_fuzzy_verify" ->
      (s"WITH cand AS ($shingleCte)\n" +
        """SELECT a_id, b_id, lev FROM (
          |  SELECT c.a_id, c.b_id,
          |         CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev
          |  FROM cand c
          |  JOIN documents da ON c.a_id = da.doc_id
          |  JOIN documents db ON c.b_id = db.doc_id)
          |WHERE lev <= 64""".stripMargin),
    "p3_dedup_keeper" ->
      """WITH RECURSIVE words AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w)-1),
        |        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s FROM words),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS aid, b.doc_id AS bid, count(*) AS n
        |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2),
        |p AS (SELECT aid, bid FROM inter
        |      JOIN sizes s1 ON aid = s1.doc_id JOIN sizes s2 ON bid = s2.doc_id
        |      WHERE CAST(n AS DOUBLE) / (s1.sz + s2.sz - n) >= 0.8),
        |edges AS (SELECT aid AS src, bid AS dst FROM p
        |          UNION SELECT bid, aid FROM p),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |comp AS (SELECT src AS doc_id,
        |           least(src, MIN(dst)) AS comp
        |         FROM reach GROUP BY src),
        |lens AS (SELECT doc_id,
        |           CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_toks
        |         FROM documents),
        |m AS (SELECT c.comp, c.doc_id, l.n_toks
        |      FROM comp c JOIN lens l ON c.doc_id = l.doc_id),
        |sel AS (SELECT comp, doc_id, n_toks,
        |          ROW_NUMBER() OVER (PARTITION BY comp ORDER BY n_toks DESC, doc_id) AS rn
        |        FROM m)
        |SELECT CAST(m.comp AS BIGINT) AS comp,
        | CAST(MAX(s.doc_id) AS BIGINT) AS keeper_id,
        | COUNT(*) AS n_members,
        | CAST(MAX(m.n_toks) AS BIGINT) AS max_toks
        |FROM m JOIN sel s ON m.comp = s.comp AND s.rn = 1
        |GROUP BY m.comp""".stripMargin,
    "d9_dedup_groups" -> (componentsCte +
      """
        |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(comp AS BIGINT) AS comp,
        |       doc_id = comp AS is_keeper
        |FROM comp""".stripMargin),
    "d17_soft_dedup" -> (componentsCte + """,
        |rep AS (SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS comp
        |        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
        |sz AS (SELECT comp, count(*) AS n_members FROM rep GROUP BY comp)
        |SELECT CAST(r.doc_id AS BIGINT) AS doc_id, CAST(r.comp AS BIGINT) AS comp,
        |  CAST(n_members AS BIGINT) AS n_members,
        |  CAST(1.0 AS DOUBLE) / CAST(n_members AS DOUBLE) AS weight
        |FROM rep r JOIN sz USING (comp)""".stripMargin),
    "p4_leakage_split" -> (componentsCte + """,
        |rep AS (SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS rep_id
        |        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
        |rsplit AS (SELECT doc_id AS rep_id,
        |   CASE WHEN substring(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 2) < 'e6' THEN 'train'
        |        WHEN substring(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 2) < 'f3' THEN 'val'
        |        ELSE 'test' END AS split
        |   FROM documents)
        |SELECT CAST(r.doc_id AS BIGINT) AS doc_id, CAST(r.rep_id AS BIGINT) AS rep_id,
        |       s.split
        |FROM rep r JOIN rsplit s ON r.rep_id = s.rep_id""".stripMargin),
    "d4_dedup_simhash" -> shingleCte,
    "d7_dedup_simhash128" -> shingleCte,
    "d5_dedup_embedding" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        | list_dot_product(a.v, b.v) /
        |   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v) /
        |   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4""".stripMargin,
    "d14_embedding_decontaminate" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ev AS (SELECT v AS w FROM e WHERE vec_id % 53 = 0),
        |scored AS (SELECT c.vec_id,
        |   max(list_dot_product(c.v, ev.w) /
        |     (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(ev.w, ev.w)))) AS max_sim
        | FROM e c CROSS JOIN ev WHERE c.vec_id % 53 <> 0 GROUP BY c.vec_id)
        |SELECT vec_id, max_sim FROM scored WHERE max_sim < 0.3""".stripMargin,
    "d15_edit_distance" ->
      """WITH cand AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |                     a.text AS ta, b.text AS tb
        |              FROM documents a JOIN documents b
        |                ON a.doc_id < b.doc_id
        |               AND abs(length(a.text) - length(b.text)) <= 16)
        |SELECT a_id, b_id, lev FROM (
        |  SELECT a_id, b_id, CAST(levenshtein(ta, tb) AS BIGINT) AS lev
        |  FROM cand)
        |WHERE lev <= 16""".stripMargin,
    "t26_rouge_overlap" ->
      """WITH d AS (SELECT doc_id // 2 AS pair_id, doc_id % 2 AS side,
        |                  regexp_split_to_array(lower(trim(text)), '\s+') AS a
        |           FROM documents),
        |u AS (SELECT pair_id, side, unnest(a) AS g FROM d),
        |b AS (SELECT pair_id, side, p[1] || ' ' || p[2] AS g
        |      FROM (SELECT pair_id, side,
        |              unnest(list_zip(a[1:len(a)-1], a[2:])) AS p FROM d)),
        |uc AS (SELECT pair_id, g,
        |         SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS c0,
        |         SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1
        |       FROM u GROUP BY 1, 2),
        |us AS (SELECT pair_id,
        |         CAST(SUM(least(c0, c1)) AS BIGINT) AS r1_overlap,
        |         CAST(SUM(c0) AS BIGINT) AS tc1,
        |         CAST(SUM(c1) AS BIGINT) AS tr1
        |       FROM uc GROUP BY 1),
        |bc AS (SELECT pair_id, g,
        |         SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS c0,
        |         SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1
        |       FROM b GROUP BY 1, 2),
        |bs AS (SELECT pair_id,
        |         CAST(SUM(least(c0, c1)) AS BIGINT) AS r2_overlap,
        |         CAST(SUM(c0) AS BIGINT) AS tc2,
        |         CAST(SUM(c1) AS BIGINT) AS tr2
        |       FROM bc GROUP BY 1),
        |j AS (SELECT us.pair_id, r1_overlap, tc1, tr1,
        |        COALESCE(r2_overlap, 0) AS r2_overlap,
        |        COALESCE(tc2, 0) AS tc2, COALESCE(tr2, 0) AS tr2
        |      FROM us LEFT JOIN bs ON us.pair_id = bs.pair_id),
        |pr AS (SELECT pair_id, r1_overlap, r2_overlap,
        |  CASE WHEN tc1 > 0 THEN CAST(r1_overlap AS DOUBLE) / CAST(tc1 AS DOUBLE)
        |       ELSE 0e0 END AS r1_p,
        |  CASE WHEN tr1 > 0 THEN CAST(r1_overlap AS DOUBLE) / CAST(tr1 AS DOUBLE)
        |       ELSE 0e0 END AS r1_r,
        |  CASE WHEN tc2 > 0 THEN CAST(r2_overlap AS DOUBLE) / CAST(tc2 AS DOUBLE)
        |       ELSE 0e0 END AS r2_p,
        |  CASE WHEN tr2 > 0 THEN CAST(r2_overlap AS DOUBLE) / CAST(tr2 AS DOUBLE)
        |       ELSE 0e0 END AS r2_r
        |  FROM j)
        |SELECT pair_id, r1_overlap, r1_p, r1_r,
        |  CASE WHEN r1_overlap > 0
        |       THEN (2e0 * r1_p * r1_r) / (r1_p + r1_r) ELSE 0e0 END AS r1_f1,
        |  r2_overlap, r2_p, r2_r,
        |  CASE WHEN r2_overlap > 0
        |       THEN (2e0 * r2_p * r2_r) / (r2_p + r2_r) ELSE 0e0 END AS r2_f1
        |FROM pr""".stripMargin,
    "d8_dedup_semantic" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
        |scored AS (SELECT e.vec_id, e.v, c.cid,
        |   list_dot_product(e.v, c.cv) /
        |     (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) AS cs
        | FROM e CROSS JOIN c),
        |assigned AS (SELECT vec_id, v, cid FROM (
        |   SELECT vec_id, v, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        |   FROM scored) x WHERE rn = 1)
        |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        | list_dot_product(a.v, b.v) /
        |   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS sim
        |FROM assigned a JOIN assigned b
        |  ON a.cid = b.cid AND a.vec_id < b.vec_id
        |WHERE list_dot_product(a.v, b.v) /
        |   (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4""".stripMargin,
    // t24: unigram/bigram counts in plain SQL; lift = c_xy*N/(c_x*c_y)
    // with integer multiplies and ONE double division (identical IEEE op
    // order to the Spark side); the top-100 cut is deterministic under
    // the (lift DESC, w1, w2) total order.
    "t24_pmi_collocations" ->
      """WITH d AS (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS a
        |           FROM documents),
        |tok AS (SELECT unnest(a) AS tok FROM d),
        |uni AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
        |n AS (SELECT CAST(SUM(c) AS BIGINT) AS nt FROM uni),
        |bg AS (SELECT p[1] AS w1, p[2] AS w2
        |       FROM (SELECT unnest(list_zip(a[1:len(a)-1], a[2:])) AS p FROM d)),
        |pc AS (SELECT w1, w2, COUNT(*) AS pair_count FROM bg
        |       GROUP BY 1, 2 HAVING COUNT(*) >= 5)
        |SELECT w1, w2, pair_count,
        | CAST(pair_count * nt AS DOUBLE) / CAST(u1.c * u2.c AS DOUBLE) AS lift
        |FROM pc CROSS JOIN n
        |JOIN uni u1 ON u1.tok = pc.w1
        |JOIN uni u2 ON u2.tok = pc.w2
        |ORDER BY lift DESC, w1, w2 LIMIT 100""".stripMargin,
    // t25: exact xxhash64(doc_id) replay (layered projections), unsigned
    // h1u folded back to Spark's SIGNED long before the pmod — then the
    // same CASE rate table, threshold filter, and 1/rate weight.
    "t25_stratified_sample" -> {
      val bucket = s"((${OracleSql.u64signed("h1u")} % 10000) + 10000) % 10000"
      s"""WITH xx AS (${OracleSql.xxHashLongLayers(
             "SELECT doc_id, source, CAST(doc_id AS HUGEINT) AS fpu FROM documents")}),
         |r AS (SELECT doc_id, source, $bucket AS bucket,
         |        CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 5000
         |             WHEN source IN ('src5','src6','src7','src8','src9') THEN 2500
         |             ELSE 1000 END AS bp
         |      FROM xx)
         |SELECT doc_id, source,
         |  CAST(10000.0 AS DOUBLE) / CAST(bp AS DOUBLE) AS weight
         |FROM r WHERE bucket < bp""".stripMargin
    },
    // s11: the s1 cosine replay without the rank window; the ≥ tau
    // comparison is on bit-identical doubles, so the match set is exact.
    // s17: the norm-augmentation replayed exactly — m2 is the max of
    // the SAME ascending-fold dots the engine computes, the appended
    // slot is sqrt(m2 - dot), the query side appends 0e0, and the
    // ranking key is the augmented cosine over the augmented lists
    // (identical float ops both engines).
    "s17_ann_mips" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |m AS (SELECT max(list_dot_product(v, v)) AS m2 FROM e),
        |a AS (SELECT vec_id, v,
        |    list_append(v, sqrt(m.m2 - list_dot_product(v, v))) AS av
        |  FROM e, m),
        |q AS (SELECT vec_id AS qid, v AS qv, list_append(v, 0e0) AS aqv
        |  FROM e WHERE vec_id < 8),
        |x AS (SELECT q.qid AS query_id, a.vec_id AS neighbor_id,
        |   list_dot_product(q.qv, a.v) AS ip,
        |   list_dot_product(q.aqv, a.av) /
        |     (sqrt(list_dot_product(q.aqv, q.aqv)) * sqrt(list_dot_product(a.av, a.av))) AS aug_sim,
        |   row_number() OVER (PARTITION BY q.qid ORDER BY
        |     list_dot_product(q.aqv, a.av) /
        |       (sqrt(list_dot_product(q.aqv, q.aqv)) * sqrt(list_dot_product(a.av, a.av))) DESC,
        |     a.vec_id) AS rn
        | FROM a JOIN q ON a.vec_id <> q.qid)
        |SELECT query_id, neighbor_id, rn AS rank, ip, aug_sim
        |FROM x WHERE rn <= 4""".stripMargin,
    // s18: the s1 replay with the label-mismatch predicate in the
    // candidate join — same bit-identical cosine, rank over
    // (sim DESC, neighbor_id)
    "s18_hard_negatives" ->
      """SELECT query_id, query_label, neighbor_id, neighbor_label,
        |  rn AS rank, sim FROM (
        | SELECT q.qid AS query_id, q.ql AS query_label,
        |  e.vec_id AS neighbor_id, e.label AS neighbor_label,
        |  list_dot_product(q.qv, e.v) /
        |    (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS sim,
        |  row_number() OVER (PARTITION BY q.qid ORDER BY
        |    list_dot_product(q.qv, e.v) /
        |    (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) DESC,
        |    e.vec_id) AS rn
        | FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |       FROM embeddings) e
        | JOIN (SELECT vec_id AS qid, label AS ql,
        |         CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id < 8) q
        |   ON e.vec_id <> q.qid AND e.label <> q.ql) x
        |WHERE rn <= 4""".stripMargin,
    // s16: s2's signature replay at 12 bits (a width-b bucket is the
    // low b bits), s11's exact-radius truth, per-config counts with
    // integer basis-point precision/recall; configs with zero
    // candidates still emit their row
    "s16_lsh_sweep" ->
      (s"WITH ${splitmixHyperplanes(12)},\n" +
      """pj AS (SELECT e.vec_id, hp.j, list_dot_product(e.v, hp.hv) AS proj
        |       FROM e CROSS JOIN hp),
        |sig AS (SELECT vec_id, CAST(SUM(CASE WHEN proj >= 0e0
        |          THEN 1::BIGINT << j ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
        |        FROM pj GROUP BY vec_id),
        |truth AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
        |          FROM e c JOIN (SELECT vec_id, v FROM e WHERE vec_id < 8) q
        |            ON c.vec_id <> q.vec_id
        |          WHERE list_dot_product(q.v, c.v) /
        |            (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) >= 0.25),
        |tn AS (SELECT COUNT(*) AS n_true FROM truth),
        |cfg AS (SELECT unnest([4, 8, 12]) AS bits),
        |cand AS (SELECT cfg.bits, q.vec_id AS query_id, c.vec_id AS neighbor_id
        |         FROM cfg CROSS JOIN (SELECT vec_id, bucket FROM sig WHERE vec_id < 8) q
        |         JOIN sig c ON (c.bucket % (1::BIGINT << cfg.bits)) = (q.bucket % (1::BIGINT << cfg.bits))
        |              AND c.vec_id <> q.vec_id),
        |stc AS (SELECT bits, COUNT(*) AS n_candidates,
        |         SUM(CASE WHEN t.query_id IS NULL THEN 0 ELSE 1 END) AS n_hit
        |        FROM cand LEFT JOIN truth t ON t.query_id = cand.query_id
        |          AND t.neighbor_id = cand.neighbor_id
        |        GROUP BY bits),
        |st AS (SELECT cfg.bits, COALESCE(stc.n_candidates, 0) AS n_candidates,
        |         COALESCE(stc.n_hit, 0) AS n_hit
        |       FROM cfg LEFT JOIN stc USING (bits))
        |SELECT st.bits, CAST(st.n_candidates AS BIGINT) AS n_candidates,
        |  tn.n_true, CAST(st.n_hit AS BIGINT) AS n_hit,
        |  CAST(CASE WHEN st.n_candidates = 0 THEN 0
        |       ELSE (st.n_hit * 10000) // st.n_candidates END AS BIGINT) AS precision_bp,
        |  CAST(CASE WHEN tn.n_true = 0 THEN 0
        |       ELSE (st.n_hit * 10000) // tn.n_true END AS BIGINT) AS recall_bp
        |FROM st CROSS JOIN tn""".stripMargin),
    "s11_range_search" ->
      """SELECT query_id, neighbor_id, sim FROM (
        | SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
        |  list_dot_product(q.qv, e.v) /
        |    (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS sim
        | FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) e
        | JOIN (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id < 8) q ON e.vec_id <> q.qid) x
        |WHERE sim >= 0.25""".stripMargin,
    "s1_ann_cosine" ->
      """SELECT query_id, neighbor_id, rn AS rank, sim FROM (
        | SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
        |  list_dot_product(q.qv, e.v) /
        |    (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS sim,
        |  row_number() OVER (PARTITION BY q.qid ORDER BY
        |    list_dot_product(q.qv, e.v) /
        |    (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) DESC,
        |    e.vec_id) AS rn
        | FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) e
        | JOIN (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        |       FROM embeddings WHERE vec_id < 8) q ON e.vec_id <> q.qid) x
        |WHERE rn <= 4""".stripMargin,
    // s2/s3/s4/s5 are approximate-by-design ANN, but their randomness is
    // deterministic (splitmix64 planes / first-16 centroids / int8
    // quantization), so the whole pipeline — bucketing and quantization
    // included — replays exactly in SQL.
    // s5: normalize (list_dot_product ≡ the engine's ascending fold),
    // scale = maxAbs/127, codes via floor(x+0.5) (≡ Math.round incl.
    // negative halves — NOT DuckDB round(), which is half-away), approx
    // scan = dot(query·codes)·scale, top rerank·k by (approx DESC, id),
    // exact cosine rerank — byte codes widen to exact doubles.
    "s5_ann_sq" ->
      ("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |nv AS (SELECT vec_id, v,
        |    CASE WHEN sqrt(list_dot_product(v, v)) = 0e0 THEN v
        |         ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v))) END AS u
        |  FROM e),
        |sc AS (SELECT vec_id, u,
        |    CASE WHEN list_aggregate(list_transform(u, x -> abs(x)), 'max') = 0e0 THEN 1.0e0
        |         ELSE list_aggregate(list_transform(u, x -> abs(x)), 'max') / 127.0e0 END AS scl
        |  FROM nv),
        |codes AS (SELECT vec_id, scl,
        |    list_transform(u, x -> floor(x / scl + 0.5e0)) AS cs
        |  FROM sc),
        |ap AS (SELECT q.vec_id AS qid, c.vec_id,
        |    list_dot_product(q.u, c.cs) * c.scl AS approx
        |  FROM (SELECT vec_id, u FROM sc WHERE vec_id < 8) q
        |  JOIN codes c ON c.vec_id <> q.vec_id),
        |cand AS (SELECT x.qid, x.vec_id, e.v FROM (
        |    SELECT qid, vec_id,
        |      row_number() OVER (PARTITION BY qid ORDER BY approx DESC, vec_id) AS rn
        |    FROM ap) x JOIN e ON e.vec_id = x.vec_id WHERE x.rn <= 16),
        |""".stripMargin + cosineTopkTail),
    // s6: PQ replay — seed codebooks (lowest-16 ids' subvectors), one
    // Lloyd sweep with INTEGER-quantized means (round-half-away ×1024,
    // order-free sums — the engine quantizes identically), assignment
    // by L2 via list_dot_product of the diff list (≡ the engine's
    // ascending d += x² fold, first-min tie-break = ORDER BY d, cid),
    // ADC tables as subvector dots, approx score folded j=0..7 in
    // explicit left-assoc order (8-term SUM would be order-free), top
    // rerank·k=32 by (approx DESC, id), exact cosine rerank.
    // s15: the s6 PQ replay gated by the s3 IVF replay — identical
    // codebook/ADC CTEs, plus icell/iprobe (raw-vector dots against the
    // normalized lowest-16 centroids, first-max tie-break) restricting
    // the ap scan to candidates whose cell the query probed.
    "s15_ann_ivfpq" -> {
      val diff = "list_transform(range(1, 9), i -> n2.u[bk.j*8 + i] - bk.cv[i])"
      def assign(books: String) =
        s"""(SELECT vec_id, j, cid FROM (
           |  SELECT vec_id, j, cid,
           |    row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
           |  FROM (SELECT n2.vec_id, bk.j, bk.cid,
           |          list_dot_product($diff, $diff) AS d
           |        FROM nv n2 CROSS JOIN $books bk) y) x WHERE rn = 1)""".stripMargin
      val adcFold = (0 until 8).map(j => s"MAX(CASE WHEN t.j = $j THEN tv END)")
        .mkString(" + ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |nv AS (SELECT vec_id, v,
         |    CASE WHEN sqrt(list_dot_product(v, v)) = 0e0 THEN v
         |         ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v))) END AS u
         |  FROM e),
         |ivfc AS (SELECT row_number() OVER (ORDER BY vec_id) AS cid,
         |    list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv
         |  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
         |icell AS (SELECT vec_id, cell FROM (
         |  SELECT e.vec_id, ivfc.cid AS cell, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY list_dot_product(e.v, ivfc.cv) DESC, ivfc.cid) AS rn
         |  FROM e CROSS JOIN ivfc) x WHERE rn = 1),
         |iprobe AS (SELECT qid, cell FROM (
         |  SELECT e.vec_id AS qid, ivfc.cid AS cell, row_number() OVER (PARTITION BY e.vec_id
         |    ORDER BY list_dot_product(e.v, ivfc.cv) DESC, ivfc.cid) AS rn
         |  FROM e CROSS JOIN ivfc WHERE e.vec_id < 8) x WHERE rn <= 4),
         |c0 AS (SELECT t.j, s.cid, s.u[t.j*8 + 1 : t.j*8 + 8] AS cv
         |       FROM (SELECT row_number() OVER (ORDER BY vec_id) AS cid, u
         |             FROM nv WHERE vec_id < 16) s CROSS JOIN range(0, 8) t(j)),
         |a0 AS ${assign("c0")},
         |m1 AS (SELECT a0.j, a0.cid, t.i,
         |         SUM(CAST(round(nv.u[a0.j*8 + t.i] * 1024e0) AS BIGINT)) AS qs,
         |         COUNT(*) AS n
         |       FROM a0 JOIN nv USING (vec_id) CROSS JOIN range(1, 9) t(i)
         |       GROUP BY 1, 2, 3),
         |b1c AS (SELECT j, cid,
         |          list(CAST(qs AS DOUBLE) / CAST(n * 1024 AS BIGINT) ORDER BY i) AS cv
         |        FROM m1 GROUP BY j, cid),
         |b1 AS (SELECT c0.j, c0.cid, COALESCE(b1c.cv, c0.cv) AS cv
         |       FROM c0 LEFT JOIN b1c ON b1c.j = c0.j AND b1c.cid = c0.cid),
         |a1 AS ${assign("b1")},
         |tbl AS (SELECT q.vec_id AS qid, b1.j, b1.cid,
         |          list_dot_product(q.u[b1.j*8 + 1 : b1.j*8 + 8], b1.cv) AS tv
         |        FROM (SELECT vec_id, u FROM nv WHERE vec_id < 8) q CROSS JOIN b1),
         |ap AS (SELECT t.qid, a1.vec_id, $adcFold AS approx
         |       FROM a1 JOIN tbl t ON t.j = a1.j AND t.cid = a1.cid
         |         AND t.qid <> a1.vec_id
         |         JOIN icell ON icell.vec_id = a1.vec_id
         |         JOIN iprobe ON iprobe.cell = icell.cell AND iprobe.qid = t.qid
         |       GROUP BY t.qid, a1.vec_id),
         |cand AS (SELECT x.qid, x.vec_id, e.v FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid ORDER BY approx DESC, vec_id) AS rn
         |    FROM ap) x JOIN e ON e.vec_id = x.vec_id WHERE x.rn <= 32),
         |""".stripMargin + cosineTopkTail
    },
    "s6_ann_pq" -> {
      val diff = "list_transform(range(1, 9), i -> n2.u[bk.j*8 + i] - bk.cv[i])"
      def assign(books: String) =
        s"""(SELECT vec_id, j, cid FROM (
           |  SELECT vec_id, j, cid,
           |    row_number() OVER (PARTITION BY vec_id, j ORDER BY d, cid) AS rn
           |  FROM (SELECT n2.vec_id, bk.j, bk.cid,
           |          list_dot_product($diff, $diff) AS d
           |        FROM nv n2 CROSS JOIN $books bk) y) x WHERE rn = 1)""".stripMargin
      val adcFold = (0 until 8).map(j => s"MAX(CASE WHEN t.j = $j THEN tv END)")
        .mkString(" + ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |nv AS (SELECT vec_id, v,
         |    CASE WHEN sqrt(list_dot_product(v, v)) = 0e0 THEN v
         |         ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v))) END AS u
         |  FROM e),
         |c0 AS (SELECT t.j, s.cid, s.u[t.j*8 + 1 : t.j*8 + 8] AS cv
         |       FROM (SELECT row_number() OVER (ORDER BY vec_id) AS cid, u
         |             FROM nv WHERE vec_id < 16) s CROSS JOIN range(0, 8) t(j)),
         |a0 AS ${assign("c0")},
         |m1 AS (SELECT a0.j, a0.cid, t.i,
         |         SUM(CAST(round(nv.u[a0.j*8 + t.i] * 1024e0) AS BIGINT)) AS qs,
         |         COUNT(*) AS n
         |       FROM a0 JOIN nv USING (vec_id) CROSS JOIN range(1, 9) t(i)
         |       GROUP BY 1, 2, 3),
         |b1c AS (SELECT j, cid,
         |          list(CAST(qs AS DOUBLE) / CAST(n * 1024 AS BIGINT) ORDER BY i) AS cv
         |        FROM m1 GROUP BY j, cid),
         |b1 AS (SELECT c0.j, c0.cid, COALESCE(b1c.cv, c0.cv) AS cv
         |       FROM c0 LEFT JOIN b1c ON b1c.j = c0.j AND b1c.cid = c0.cid),
         |a1 AS ${assign("b1")},
         |tbl AS (SELECT q.vec_id AS qid, b1.j, b1.cid,
         |          list_dot_product(q.u[b1.j*8 + 1 : b1.j*8 + 8], b1.cv) AS tv
         |        FROM (SELECT vec_id, u FROM nv WHERE vec_id < 8) q CROSS JOIN b1),
         |ap AS (SELECT t.qid, a1.vec_id, $adcFold AS approx
         |       FROM a1 JOIN tbl t ON t.j = a1.j AND t.cid = a1.cid
         |         AND t.qid <> a1.vec_id
         |       GROUP BY t.qid, a1.vec_id),
         |cand AS (SELECT x.qid, x.vec_id, e.v FROM (
         |    SELECT qid, vec_id,
         |      row_number() OVER (PARTITION BY qid ORDER BY approx DESC, vec_id) AS rn
         |    FROM ap) x JOIN e ON e.vec_id = x.vec_id WHERE x.rn <= 32),
         |""".stripMargin + cosineTopkTail
    },
    "s2_ann_lsh" ->
      (s"WITH ${splitmixHyperplanes(4)},\n" +
      """pj AS (SELECT e.vec_id, hp.j, list_dot_product(e.v, hp.hv) AS proj
        |       FROM e CROSS JOIN hp),
        |sig AS (SELECT vec_id, CAST(SUM(CASE WHEN proj >= 0e0
        |          THEN 1::BIGINT << j ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
        |        FROM pj GROUP BY vec_id),
        |c AS (SELECT e.vec_id, e.v, sig.bucket FROM e JOIN sig USING (vec_id)),
        |cand AS (SELECT q.vec_id AS qid, c.vec_id, c.v FROM c
        |         JOIN (SELECT vec_id, bucket FROM sig WHERE vec_id < 8) q
        |           ON c.bucket = q.bucket AND c.vec_id <> q.vec_id),
        |""".stripMargin + cosineTopkTail),
    "s12_nn_join" ->
      (s"WITH ${splitmixHyperplanes(8)},\n" +
      """pj AS (SELECT e.vec_id, hp.j, list_dot_product(e.v, hp.hv) AS proj
        |       FROM e CROSS JOIN hp),
        |sig AS (SELECT vec_id, CAST(SUM(CASE WHEN proj >= 0e0
        |          THEN 1::BIGINT << j ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
        |        FROM pj GROUP BY vec_id),
        |cand AS (SELECT q.vec_id AS qid, c.vec_id, c.v
        |         FROM (SELECT e.vec_id, e.v, sig.bucket FROM e JOIN sig USING (vec_id)
        |               WHERE e.vec_id % 2 = 0) c
        |         JOIN (SELECT vec_id, bucket FROM sig WHERE vec_id % 2 = 1) q
        |           ON c.bucket = q.bucket),
        |""".stripMargin + cosineTopkTail),
    "s4_ann_multiprobe" ->
      (s"WITH ${splitmixHyperplanes(8)},\n" +
      """pj AS (SELECT e.vec_id, hp.j, list_dot_product(e.v, hp.hv) AS proj
        |       FROM e CROSS JOIN hp),
        |sig AS (SELECT vec_id, CAST(SUM(CASE WHEN proj >= 0e0
        |          THEN 1::BIGINT << j ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
        |        FROM pj GROUP BY vec_id),
        |flips AS (SELECT qid, xor(bucket, 1::BIGINT << j) AS bucket FROM (
        |  SELECT pj.vec_id AS qid, pj.j, sig.bucket,
        |    row_number() OVER (PARTITION BY pj.vec_id ORDER BY abs(pj.proj), pj.j) AS rn
        |  FROM pj JOIN sig USING (vec_id) WHERE pj.vec_id < 8) x WHERE rn <= 4),
        |qprobe AS (SELECT vec_id AS qid, bucket FROM sig WHERE vec_id < 8
        |           UNION ALL SELECT qid, bucket FROM flips),
        |c AS (SELECT e.vec_id, e.v, sig.bucket FROM e JOIN sig USING (vec_id)),
        |cand AS (SELECT DISTINCT q.qid, c.vec_id, c.v FROM c
        |         JOIN qprobe q ON c.bucket = q.bucket AND c.vec_id <> q.qid),
        |""".stripMargin + cosineTopkTail),
    "s3_ann_ivf" ->
      ("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) AS cid,
        |         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv
        |       FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
        |assign AS (SELECT vec_id, cell FROM (
        |  SELECT e.vec_id, c0.cid AS cell, row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_dot_product(e.v, c0.cv) DESC, c0.cid) AS rn
        |  FROM e CROSS JOIN c0) x WHERE rn = 1),
        |probe AS (SELECT qid, cell FROM (
        |  SELECT e.vec_id AS qid, c0.cid AS cell, row_number() OVER (PARTITION BY e.vec_id
        |    ORDER BY list_dot_product(e.v, c0.cv) DESC, c0.cid) AS rn
        |  FROM e CROSS JOIN c0 WHERE e.vec_id < 8) x WHERE rn <= 4),
        |c AS (SELECT e.vec_id, e.v, assign.cell FROM e JOIN assign USING (vec_id)),
        |cand AS (SELECT probe.qid, c.vec_id, c.v FROM c
        |         JOIN probe ON c.cell = probe.cell AND c.vec_id <> probe.qid),
        |""".stripMargin + cosineTopkTail)
  )
}
