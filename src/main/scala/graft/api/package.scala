package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.cdc.{BloomDedup, CdcApply, MatchStrategy}
import graft.operators.{Curation, Dedup, Similarity, TextAnalysis}

/** Ergonomic library surface: `import graft.api._` and every engine
  * operator hangs off the DataFrame — the form a user switching from
  * the reference calls on their OWN tables (the `SparkEntry.queries`
  * entries are these same operators bound to the test corpus).
  *
  * {{{
  * import graft.api._
  * val snap   = changelog.cdcSnapshot(keyCols = Seq("table", "key"))
  * val fresh  = events.suppressSeen(history, "event_id")
  * val pairs  = docs.minhashCandidatePairs("doc_id", "text")
  * val scored = docs.withTextStats("text")
  * val nn     = corpus.cosineTopK("vec_id", "embedding", queries, k = 5)
  * }}}
  */
package object api {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    // --- CDC --------------------------------------------------------

    /** Latest surviving row per key (last-writer-wins, deletes drop) —
      * changelog → queryable snapshot. One keyed shuffle.
      */
    def cdcSnapshot(
        keyCols: Seq[String],
        offsetCol: String = "offset",
        opCol: String = "op"): DataFrame =
      CdcApply.snapshot(df, keyCols, offsetCol, opCol)

    /** Per-op counts and offset ranges — the reference's ingest
      * bookkeeping as a one-line aggregate.
      */
    def cdcOpStats(opCol: String = "op"): DataFrame =
      CdcApply.opStats(df, opCol)

    /** Keep only events whose `db.table` matches the reference's
      * MatchStrategy wildcard patterns (`*` → `.*`).
      */
    def matchingTables(
        qualified: Column,
        databases: Seq[String],
        tables: Seq[String]): DataFrame =
      df.filter(MatchStrategy.matches(qualified, databases, tables))

    /** Drop rows whose key already appears in `history`: bloom-sketch
      * front gate (no false negatives) + exact back-check on the
      * positive subset.
      */
    def suppressSeen(history: DataFrame, keyCol: String): DataFrame =
      BloomDedup.suppressSeen(df, history, keyCol)

    /** Binlog DSv2 rows (`spark.read.format("binlog")`) → typed
      * `Dataset[ChangeEvent]` keyed by `keyPath` in the row image.
      */
    def asChangeEvents(keyPath: String = "$.col_0"): org.apache.spark.sql.Dataset[graft.cdc.ChangeEvent] =
      graft.cdc.Changelog.fromBinlog(df, keyPath)

    /** Coalesce per-source transaction ids into executed-GTID-style
      * intervals (`gno_start`, `gno_end`, `n_txns`) — bounded resume
      * state, like MySQL's `gtid_executed`.
      */
    def gtidIntervals(sourceCol: String, gnoCol: String): DataFrame =
      graft.cdc.GtidSet.intervals(df, sourceCol, gnoCol)

    /** Assemble binlog events (the DSv2 source's schema) into their
      * BEGIN…XID transactions: per-(file, txn_xid) summary rows —
      * the atomic-apply unit a correct sink commits at (see
      * cdc_txn_assemble).
      */
    def assembleTransactions(): DataFrame =
      graft.operators.Cdc.assembleTransactions(df)

    // --- dedup ------------------------------------------------------

    /** One canonical row per distinct text (lowest id wins). */
    def dropExactDuplicates(idCol: String, textCol: String): DataFrame =
      Dedup.dropExactDuplicates(df, idCol, textCol)

    /** MinHash-LSH near-duplicate candidate pairs (doc_a < doc_b).
      * `md5Hash = true` for the cross-engine-deterministic variant.
      */
    def minhashCandidatePairs(
        idCol: String,
        textCol: String,
        k: Int = 12,
        r: Int = 3,
        md5Hash: Boolean = false): DataFrame =
      Dedup.minhashPairs(df, idCol, textCol, k, r, md5Hash)

    /** MinHash-LSH band-signature index rows (doc_id, band, sig) for
      * this document frame — the table a 100 TB pipeline PERSISTS
      * (bucketed by (band, sig)) so daily increments probe it without
      * re-shingling the standing corpus.
      */
    def bandSignatures(
        idCol: String,
        textCol: String,
        k: Int = 12,
        r: Int = 3,
        md5Hash: Boolean = false): DataFrame =
      Dedup.bandSignatures(df, idCol, textCol, k, r, md5Hash)

    /** Probe this increment frame against a persisted band-signature
      * index ([[bandSignatures]] of the standing corpus) WITHOUT
      * re-shingling the corpus: new-vs-index bucket join + exact
      * word-3-gram Jaccard verify. Returns (doc_a, doc_b, jaccard,
      * is_dup) for every near-dup pair touching the increment — the
      * daily incremental-dedup job at 100 TB.
      */
    def incrementalDedupVerdicts(
        index: DataFrame,
        corpusTexts: DataFrame,
        idCol: String,
        textCol: String,
        k: Int = 12,
        r: Int = 3,
        md5Hash: Boolean = false,
        threshold: Double = 0.7): DataFrame =
      Dedup.incrementalDedupVerdicts(index, df, corpusTexts, idCol, textCol,
        k, r, md5Hash, threshold = threshold)

    /** Exact n-gram overlap verify for candidate pairs (doc_a,
      * doc_b): containment both directions + Jaccard per pair. The
      * confirm stage after [[minhashCandidatePairs]] proposes —
      * containment catches sub-document duplication (quotes,
      * boilerplate wrapping) that symmetric Jaccard under-scores.
      */
    def ngramOverlapScores(
        pairs: DataFrame,
        idCol: String,
        textCol: String,
        n: Int = 2): DataFrame =
      Dedup.ngramOverlapScores(df, pairs, idCol, textCol, n)

    // --- text analysis ----------------------------------------------

    /** Append token counts, char count, ratio features, quality score
      * and predicted language for `textCol` — the full per-document
      * feature row a pipeline filters on.
      */
    def withTextStats(textCol: String): DataFrame = {
      val t = col(textCol)
      df.withColumn("n_ws_tokens", TextAnalysis.wsTokenCount(t))
        .withColumn("n_bpe_tokens", TextAnalysis.bpeTokenCount(t))
        .withColumn("n_chars", length(t).cast("long"))
        .withColumn("punct_ratio", TextAnalysis.punctRatio(t))
        .withColumn("digit_ratio", TextAnalysis.digitRatio(t))
        .withColumn("stopword_ratio", TextAnalysis.stopwordRatio(t))
        .withColumn("quality_score", TextAnalysis.qualityScore(t))
        .withColumn("lang_pred", TextAnalysis.langIdOf(t))
    }

    /** Redact emails and phone numbers from `textCol` in place. */
    def scrubPii(textCol: String): DataFrame =
      df.withColumn(textCol, TextAnalysis.scrubPii(col(textCol)))

    /** Append the duplicate word-n-gram fraction (Gopher repetition
      * signal) as `rep_frac` — shuffle-free projection.
      */
    def withRepetitionScore(textCol: String, n: Int = 3): DataFrame =
      df.withColumn("rep_frac", TextAnalysis.repetitionScore(col(textCol), n))

    /** Remove paragraphs recurring in ≥ `minDocs` documents and
      * rebuild `textCol` in paragraph order — the C4-style
      * boilerplate pass.
      */
    def dropBoilerplateParagraphs(
        idCol: String,
        textCol: String,
        minDocs: Int = 2): DataFrame =
      TextAnalysis.dropBoilerplateParagraphs(df, idCol, textCol, minDocs = minDocs)

    /** Per-doc surprisal under the corpus's own add-one bigram LM —
      * the perplexity-style quality filter. Returns (idCol,
      * n_bigrams, nats_sum); filter high = out-of-distribution
      * noise, low = formulaic boilerplate. Pass `vocabSize` when a
      * corpus profile already holds the distinct-head count — it
      * removes the operator's only second corpus pass.
      */
    def crossEntropyScores(
        idCol: String = "doc_id",
        textCol: String = "text",
        vocabSize: Option[Long] = None): DataFrame =
      TextAnalysis.crossentropyOver(df, idCol, textCol, vocabSize)

    /** Per-doc Gopher quality-rule flags (word-count bounds, mean
      * word length, stopword minimum, alphabetic-word ratio) plus an
      * overall `pass` flag — the rule-based filter a pipeline applies
      * before model-based scoring. Map-side only.
      */
    def gopherRuleFlags(idCol: String, textCol: String): DataFrame =
      TextAnalysis.gopherRuleFlags(df, idCol, textCol)

    /** Hashed-linear quality classifier scores (fastText-style bag
      * of unigrams+bigrams): (idCol, n_features, score_sum,
      * score_milli, label). Exact integer arithmetic; swap the hash
      * weight for a broadcast weight table to serve a trained model
      * with the identical map-side plan.
      */
    def qualityClassifyScores(idCol: String, textCol: String): DataFrame =
      Curation.qualityClassifyScores(df, idCol, textCol)

    /** Learn the first `rounds` BPE merge rules from `textCol`
      * (Sennrich et al. 2016): (rnd, lhs, rhs, merged, cnt).
      */
    def bpeMerges(textCol: String = "text", rounds: Int = 6): DataFrame =
      Curation.bpeMerges(df, textCol, rounds)

    /** Apply trained BPE `merges` (training order): per-doc word/
      * token/char totals + chars-per-token — encoding cost is
      * |vocab|, per-doc cost one hash join (see cur_bpe_encode).
      */
    def bpeEncodeStats(
        merges: Seq[(String, String)],
        idCol: String = "doc_id",
        textCol: String = "text"): DataFrame =
      Curation.bpeEncodeStats(df, merges, idCol, textCol)

    /** Overlapping-window document chunking (context-window splitter):
      * (doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_text)
      * with exact tiling arithmetic — see cur_chunk_docs.
      */
    def chunkDocuments(
        idCol: String,
        textCol: String,
        size: Int = 64,
        overlap: Int = 16): DataFrame =
      Curation.chunkDocuments(df, idCol, textCol, size, overlap)

    /** Per-doc fraction of tokens inside a word `n`-gram shared with
      * ≥1 OTHER doc — span-level dedup coverage (partial-boilerplate
      * signal doc-level near-dup misses).
      */
    def dupSpanCoverage(
        idCol: String,
        textCol: String,
        n: Int = 8): DataFrame =
      TextAnalysis.dupSpanCoverage(df, idCol, textCol, n)

    /** Remove every word inside a cross-document duplicated
      * word-`n`-gram and rebuild the doc (single-space canonical
      * form): (id, n_tokens, n_removed, kept_text) — the span-level
      * dedup REWRITE of Lee et al. 2022 (see text_dedup_rewrite).
      */
    def dedupRewriteSpans(
        idCol: String,
        textCol: String,
        n: Int = 8): DataFrame =
      TextAnalysis.dedupRewriteSpans(df, idCol, textCol, n)

    /** Budget-bounded curation: rows in (scoreCol desc, idCol) order
      * until the running `weightCol` sum exceeds `budget` — the
      * global-window cumsum semantics without the global sort.
      */
    def takeByScoreBudget(
        idCol: String,
        weightCol: String,
        scoreCol: String,
        budget: Long): DataFrame =
      TextAnalysis.takeByScoreBudget(df, idCol, weightCol, scoreCol, budget)

    // --- similarity -------------------------------------------------

    /** Brute-force cosine top-k against a broadcast query set. The
      * query frame needs (q_id, q_vec) columns; see
      * Similarity.cosineTopK for fully custom names.
      */
    def cosineTopK(
        idCol: String,
        embCol: String,
        queries: DataFrame,
        k: Int): DataFrame =
      Similarity.cosineTopK(df, idCol, embCol, queries, "q_id", "q_vec", k)

    /** Unit-normalize + int8-grid quantize an embedding column —
      * the 4×-smaller search-time representation whose integer dot
      * products rank ≈ cosine (see sim_quantized).
      */
    def withQuantizedEmbedding(
        embCol: String, outCol: String = "qvec"): DataFrame =
      df.withColumn(outCol, Similarity.quantizeUnit(col(embCol)))

    /** Two-stage retrieval: int8 integer-dot corpus scan keeps a
      * `pool`-sized candidate set per query, exact double cosine
      * reranks the pool only — full-precision cost decoupled from
      * corpus size. `queries` carries (q_id, q_vec) like
      * [[cosineTopK]].
      */
    def quantizedRerankTopK(
        idCol: String,
        embCol: String,
        queries: DataFrame,
        pool: Int,
        k: Int): DataFrame =
      Similarity.quantizedRerankTopK(df, idCol, embCol, queries, "q_id", "q_vec", pool, k)

    /** kNN classification: majority label over each query's k
      * cosine-nearest corpus rows (ties → smaller label) — the
      * embedding-quality eval. `queries` carries (q_id, q_vec) like
      * [[cosineTopK]].
      */
    def knnClassifyTopK(
        idCol: String,
        embCol: String,
        labelCol: String,
        queries: DataFrame,
        k: Int): DataFrame =
      Similarity.knnClassifyTopK(df, idCol, embCol, labelCol, queries, "q_id", "q_vec", k)

    /** MMR-diversified top-`selK` per query from a `poolK` cosine
      * pool (Carbonell & Goldstein 1998): greedy 7·rel − 3·max-sim
      * on the floor-micro grid, exact integer arithmetic throughout
      * (see sim_mmr). Query frame needs (q_id, q_vec) columns.
      */
    def mmrTopK(
        idCol: String,
        embCol: String,
        queries: DataFrame,
        poolK: Int = 20,
        selK: Int = 5): DataFrame =
      Similarity.mmrSelect(df, idCol, embCol, queries, "q_id", "q_vec", poolK, selK)

    /** Embedding-cosine near-duplicate (id_a, id_b, cos_micro) pairs
      * by LSH-signature blocking + exact verify.
      */
    def embeddingDedupPairs(
        idCol: String,
        embCol: String,
        dim: Int,
        threshold: Double): DataFrame =
      Similarity.embeddingDedupPairs(df, idCol, embCol, dim, threshold)

    /** Perceptual near-dup (doc_a, doc_b, hamming) pairs from a
      * 64-bit image-hash column (compute with Multimodal.dHash
      * partition-locally from decoded pixels).
      */
    def perceptualHashPairs(
        idCol: String,
        hashCol: String,
        maxHamming: Int = graft.operators.Multimodal.PhashMaxHamming): DataFrame =
      graft.operators.Multimodal.dHashPairs(df, idCol, hashCol, maxHamming = maxHamming)

    /** Top-k docs per query by Okapi BM25 (k1=1.2, b=0.75) —
      * retrieval-style corpus slicing ("the docs about X"). The
      * query-term filter lands BEFORE the tf aggregate, so only
      * docs×query-terms pairs ever shuffle.
      */
    def bm25TopK(
        queries: Seq[(Int, Seq[String])],
        idCol: String = "doc_id",
        textCol: String = "text",
        topK: Int = graft.operators.Curation.Bm25TopK): DataFrame =
      graft.operators.Curation.bm25TopK(df, idCol, textCol, queries, topK = topK)

    /** Top-K docs by DSIR importance weight (Xie et al. 2023): the
      * log-likelihood ratio of each doc's hashed-bigram profile under
      * the `isTarget` rows vs the whole frame — tilt a raw crawl
      * toward a curated reference distribution without training a
      * classifier. Two corpus passes, a broadcast B-row weight table,
      * zero token-sized shuffles.
      */
    def dsirTopK(
        isTarget: org.apache.spark.sql.Column,
        idCol: String = "doc_id",
        textCol: String = "text",
        topK: Int = graft.operators.Curation.DsirTopK): DataFrame =
      graft.operators.Curation.dsirTopK(df, idCol, textCol, isTarget, topK = topK)

    // --- curation ---------------------------------------------------

    /** τ=1/2-tempered multinomial domain mixture (the GPT-3/LLaMA
      * data-recipe sampler): EXACTLY floor(budget · sqrt(n_d)/Z)
      * docs per domain — small domains up-weighted, nothing
      * discarded by fiat — selected by deterministic hash rank, so
      * the pick is reproducible and stable under corpus growth.
      * Budget = n_total / budgetFrac docs. Returns (domain, id).
      */
    def temperatureMixSelect(
        idCol: String = "doc_id",
        domainCol: String = "source",
        budgetFrac: Long = 10L): DataFrame =
      graft.operators.Curation.temperatureMixSelect(df, idCol, domainCol, budgetFrac)

    /** Deterministic train/val/test assignment keyed on `idCol`:
      * stable under corpus growth (adding docs never reshuffles
      * existing assignments), reproducible across runs and engines.
      */
    def withSplitAssignment(
        idCol: String,
        valFrac: Double = 0.05,
        testFrac: Double = 0.05,
        outCol: String = "split"): DataFrame = {
      val f = functions.DetHash.frac(col(idCol), "split:")
      df.withColumn(outCol,
        when(f < valFrac, "val")
          .when(f < valFrac + testFrac, "test")
          .otherwise("train"))
    }

    /** Keep each row with probability `rateCol` (a per-row/per-group
      * rate column), deterministically keyed on `idCol` — the
      * primitive behind stratified and domain-mix sampling.
      */
    def sampleDeterministic(idCol: String, rateCol: Column): DataFrame =
      df.filter(functions.DetHash.frac(col(idCol), "sample:") < rateCol)

    /** Greedy fixed-budget sequence packing in `idCol` order within
      * (groupCols, shard) cells; adds `seq_id` AND `__shard`
      * (= pmod(hash(idCol), shards) — hash-based so string ids shard
      * too). `__shard` is part of the contract, not an
      * implementation leak: seq_id spaces are independent PER SHARD,
      * so a consumer needs (groupCols, __shard, seq_id) — not seq_id
      * alone — to identify a packed sequence.
      */
    def packSequences(
        idCol: String,
        weightCol: String,
        budget: Long,
        groupCols: Seq[String] = Nil,
        shards: Int = 32): DataFrame = {
      // hash-based shard: `id % shards` is NULL for every row of a
      // non-numeric id column (string % int casts to double → null),
      // which would silently collapse the whole frame into one
      // window partition — the exact global-window failure `shards`
      // exists to prevent. pmod(hash) shards any id type.
      val withShard = df.withColumn("__shard",
        pmod(hash(col(idCol)), lit(shards)).cast("long"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy((groupCols :+ "__shard").map(col): _*).orderBy(idCol)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      withShard.withColumn("__cum", sum(col(weightCol)).over(w))
        .withColumn("seq_id",
          floor((col("__cum") - col(weightCol)) / lit(budget)).cast("long"))
        .drop("__cum")
    }

    /** Connected components over a candidate-pair frame
      * (doc_a, doc_b): returns (v, label) with label = min id of the
      * component — duplicate clusters from pairwise candidates.
      * `maxIter` is a small fixed propagation budget (near-dup
      * graphs converge inside it); past it the call switches to star
      * contraction by default (O(log n) rounds, exact labels at any
      * diameter), or throws with `failOnNonConvergence`.
      */
    def connectedComponents(maxIter: Int = 16,
        failOnNonConvergence: Boolean = false): DataFrame =
      Dedup.connectedComponents(df, maxIter, failOnNonConvergence)

    /** Connected components by alternating large-star/small-star
      * contraction — O(log n) rounds on any graph; reach for it
      * directly when the pair graph is known to have long paths.
      */
    def connectedComponentsStar(maxRounds: Int = 40): DataFrame =
      Dedup.connectedComponentsStar(df, maxRounds)

    /** Flag rows sharing any `n`-gram of `textCol` with `evalSet`'s
      * text — benchmark decontamination. Returns (idCol,
      * n_shared_grams) for contaminated rows only.
      *
      * A handful of column names are reserved by the gram plumbing
      * (the key/position outputs and its internal lanes); an id or
      * text column carrying one would be silently dropped or joined
      * on, so they are rejected here instead.
      */
    def contaminatedBy(
        evalSet: DataFrame, idCol: String, textCol: String,
        n: Int = 8): DataFrame = {
      val reserved = Set("pos", "gh1", "gh2", "__gl", "__gwa", "__gwb", "__gp")
      Seq(idCol, textCol).foreach(c => require(!reserved(c),
        s"column name '$c' is reserved by contaminatedBy's gram " +
          s"plumbing (${reserved.toSeq.sorted.mkString(", ")}); rename it first"))
      Curation.wordGramRows(df, Seq(col(idCol)), textCol, n)
        .join(Curation.wordGramRows(evalSet, Nil, textCol, n)
          .select("gh1", "gh2").distinct(), Seq("gh1", "gh2"))
        .groupBy(idCol)
        .agg(countDistinct(col("gh1"), col("gh2")).as("n_shared_grams"))
    }
  }
}
