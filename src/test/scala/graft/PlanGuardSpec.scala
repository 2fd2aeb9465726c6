package graft

/** Plan-shape regression guard across the ENTIRE query inventory:
  * plans every declared query (no execution) and rejects the shapes
  * that would melt at scale. The allowlist mirrors PLANS.md's scale
  * audit — a new query that sneaks in a cartesian product or an
  * unreviewed nested-loop join fails here, not on the cluster. */
class PlanGuardSpec extends SparkSpecBase {

  // reviewed: single-probe / tiny-build-side nested loops (linear) —
  // q_window_ntile / q_late_data broadcast a 1-row quantile-bounds
  // aggregate, q_ivf_build / q_sim_ivf the 1-row centroid-array scalar
  // (q_dedup_embed now plans the custom DotTopKJoinExec, not a BNLJ).
  // q_pack_chunks broadcasts its 1-row quantile-bounds aggregate,
  // q_unigram_ppl its 1-row unigram-model scalar, q_unigram_open the
  // 1-row model-total aggregate (the token model itself equi-joins),
  // q_knn_join the tiny probe batch (small BY DEFINITION — a query
  // set, not a corpus)
  // q_gapfill crosses the exploded 1-row min/max spine with the
  // broadcast ≤|types|-row distinct-type table — both metadata-scale;
  // q_hourly_delta composes the same densify spine before its lag;
  // q_heavy_hitters crosses the ≤k candidate counts with the
  // broadcast 1-row total-n aggregate
  private val allowedBnlj = Set(
    "q_sim_search", "q_sim_srp", "q_sim_ivf", "q_ivf_build", "q_tfidf",
    "q_window_ntile", "q_late_data", "q_pack_chunks", "q_unigram_ppl",
    "q_unigram_open", "q_knn_join", "q_pipeline_layout", "q_gapfill",
    "q_hourly_delta", "q_heavy_hitters",
    // q_triangle_count crosses three 1-row stat aggregates;
    // q_zipf_slope crosses the 1-row totals with the 1-row fit (and
    // the rank pass broadcasts 1-row quantile bounds);
    // q_forward_fill composes the q_gapfill densify spine;
    // q_collocations crosses the 1-row M/N token-total scalars;
    // q_dedup_sorted's rank pass broadcasts 1-row quantile bounds;
    // q_basket_rules crosses the 1-row basket-total scalar;
    // q_knn_classify shares q_knn_join's tiny-probe-batch cross;
    // q_equidepth crosses the 1-row octile-boundary aggregate
    "q_triangle_count", "q_zipf_slope", "q_forward_fill",
    "q_collocations", "q_dedup_sorted", "q_basket_rules",
    "q_knn_classify", "q_equidepth",
    // round 9: q_welch_ttest self-joins its |types|-row stats table
    // under the a<b inequality; q_kl_source crosses the broadcast
    // ≤|V|-row vocab and the 1-row |V| scalar; q_chisq crosses the
    // metadata-scale row/column totals and the 1-row N; q_gini
    // crosses the 1-row count (and its rank pass broadcasts 1-row
    // quantile bounds); q_rolling / q_autocorr compose the q_gapfill
    // densify spine cross
    "q_welch_ttest", "q_kl_source", "q_chisq", "q_gini",
    "q_rolling", "q_autocorr",
    // round 13: q_rolling_median composes the same q_gapfill densify
    // spine cross as q_rolling
    "q_rolling_median",
    // q_bm25 crosses the 1-row (N, Σlen, df...) stats aggregate
    "q_bm25",
    // round 11: q_kn_bigram crosses the broadcast 1-row bigram-type
    // total (the backoff denominator — the q_gini 1-row-scalar shape);
    // q_keyness crosses the broadcast 1-row grand token total (the
    // corpus-share denominator — same shape)
    "q_kn_bigram", "q_keyness",
    // q_dedup_funnel crosses its three 1-row stage aggregates
    "q_dedup_funnel",
    // round 10: q_boilerplate_grams crosses the vocab-scale gram-df
    // scan with the broadcast 1-row corpus-count aggregate;
    // q_vocab_coverage's rank pass broadcasts globalRankDesc's 1-row
    // quantile bounds (the q_gini/q_zipf_slope pattern)
    "q_boilerplate_grams", "q_vocab_coverage",
    // q_interleave's global pass broadcasts globalRankDesc's 1-row
    // quantile bounds — the same reviewed pattern; q_mixture_weights
    // crosses two 1-row totals (token sum, isqrt sum)
    "q_interleave", "q_mixture_weights",
    // round 13: q_dedup_semantic_inc crosses the broadcast 1-row
    // centroid-array scalar twice (ivfAssign on the batch and corpus
    // sides — the q_sim_ivf/q_ivf_build shape; the model itself is a
    // parquet-backed ≤16-row table)
    "q_dedup_semantic_inc",
    // round 17: q_dedup_semantic_ivf — with the pair-set temp-parquet
    // round trip removed, the same reviewed 1-row centroid-array
    // cross (ivfAssign on the corpus side) now sits inside the
    // declared plan instead of a one-off build job; the build side is
    // a single collect_list row over the ≤16-row parquet model
    "q_dedup_semantic_ivf",
    // round 14: q_hybrid_rrf composes BOTH reviewed crosses — the
    // q_bm25 1-row stats aggregate on the lexical side and the
    // q_sim_search broadcast 1-row probe vector on the dense side
    "q_hybrid_rrf",
    // round 14: q_ks_drift theta-self-joins the ≤|sources|-row
    // distinct-source spine under a < b (the q_welch_ttest shape) —
    // the corpus itself only ever flows through equi-joins;
    // q_token_budget crosses two broadcast 1-row aggregates (corpus
    // total, saturated-residual) against the ≤|sources|-row table —
    // the q_mixture_weights shape
    "q_ks_drift", "q_token_budget",
    // round 15: q_quality_calib crosses the broadcast 1-row totals
    // aggregate (n_test, n_pos, sq_all) against the ≤10-row bin
    // table — the q_mixture_weights shape
    "q_quality_calib",
    // round 16: q_psi_drift theta-self-joins the ≤|sources|-row
    // distinct-source spine under a < b (exactly the q_ks_drift
    // shape it shares its pair-spine construction with); the corpus
    // collapses to ≤ sources × 20 bucket counts map-side FIRST and
    // only ever flows through equi-joins
    "q_psi_drift")
  // (q_ppl_bucket needs no BNLJ exemption: its scored table is
  // temp-parquet-cached, so the declared plan ranks from a file scan
  // and the 1-row model cross lives only inside the one-time build)
  // reviewed: inherently global window semantics over tiny inputs
  // (q_window_ntile and q_late_data are two-pass distributed now and
  // no longer get the exemption)
  // q_hybrid_rrf ranks two ALREADY-CUT top-100 lists (global limit =
  // TakeOrderedAndProject bounded heaps; the windows sort 100 rows)
  // q_quality_auc midrank-prefix-sums the ≤1001-row score-group
  // table and totals the ≤|langs|-row AUC table — both inputs are
  // collapsed by map-side-combinable aggregates BEFORE the window;
  // q_token_budget's water-filling prefix test orders the
  // ≤|sources|-row per-group aggregate — inherently global semantics
  // over a metadata-scale input
  // q_quality_eval rides the same machinery over the ≤10⁶+1-row
  // micro-quantized score table
  // q_pr_curve prefix-sums the ≤10-row score-decile table (the
  // q_quality_auc collapse — the corpus shrinks in a map-side
  // aggregate BEFORE any window)
  private val allowedGlobalWindow = Set("q_topk_global", "q_sim_ivf",
    "q_hybrid_rrf", "q_quality_auc", "q_token_budget", "q_quality_eval",
    "q_pr_curve")

  test("no query plans a cartesian product") {
    for ((name, fn) <- SparkEntry.queries) {
      val plan = fn(spark, sf).queryExecution.sparkPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }

  test("nested-loop joins only where reviewed (tiny build sides)") {
    for ((name, fn) <- SparkEntry.queries) {
      val plan = fn(spark, sf).queryExecution.sparkPlan.toString
      if (plan.contains("BroadcastNestedLoopJoin"))
        assert(allowedBnlj.contains(name), s"unreviewed nested-loop join in $name")
    }
  }

  // reviewed: joins whose RDD-backed side is the metadata-scale state
  // of an iterative loop (lineage truncation is localCheckpoint's ONE
  // sanctioned use — TempTables scaladoc). q_pagerank/q_kcore/
  // q_shortest_path join their per-round rank/degree/frontier state
  // (≤|nodes| rows) against the parquet-backed edge table;
  // q_ivf_build/q_sim_ivf join the ≤k-row checkpointed centroid
  // table; q_pca_power's deflation joins the ≤dim-row component
  // state. Anything ELSE joining an RDD-backed scan is the stats-loss
  // class that cost the dedup family its broadcasts (rounds 7-8).
  // round 14: q_communities joins its per-round ≤|nodes|-row label
  // state against the checkpointed adjacency — the same class
  private val allowedRddJoin = Set(
    "q_pagerank", "q_kcore", "q_shortest_path", "q_communities",
    "q_ivf_build", "q_sim_ivf", "q_pca_power")

  test("no join consumes an RDD-backed scan (stats-loss guard)") {
    // an RDD-backed side (LogicalRDD, e.g. from localCheckpoint)
    // carries at best the ORIGIN plan's estimated stats — never
    // file-size stats — so a downstream join can silently lose its
    // broadcast option (measured: q_jaccard_prefix 2.7-2.9x over its
    // median for two rounds). Shared subtrees consumed by joins must
    // round-trip through TempTables (parquet) instead.
    import org.apache.spark.sql.catalyst.plans.logical.Join
    for ((name, fn) <- SparkEntry.queries) {
      val rddJoinSides = fn(spark, sf).queryExecution.optimizedPlan.collect {
        case j: Join if j.children.exists(
          _.collectLeaves().exists(_.nodeName == "LogicalRDD")) => j
      }
      if (rddJoinSides.nonEmpty)
        assert(allowedRddJoin.contains(name),
          s"$name joins against an RDD-backed scan — materialize the " +
            "shared subtree via TempTables (parquet keeps stats) instead " +
            "of localCheckpoint/persist")
    }
  }

  // round-10 verdict #5: the planned SHUFFLE count of the suite's
  // most expensive queries is part of their performance contract —
  // a refactor that silently adds an exchange (a lost broadcast, an
  // extra aggregate pass, a stats regression) goes red HERE, not on
  // the cluster. Counts are over the PREPARED plan: executedPlan with
  // AQE disabled — NOT sparkPlan, which predates EnsureRequirements
  // and sees only explicit repartitions, missing every
  // planner-inserted exchange (re-pin with the same method or the
  // numbers are meaningless). Broadcast exchanges are excluded — they
  // are the cheap kind; the one-time TempTables builds behind the
  // parquet reads carry their own shuffles and are priced by the
  // bench, not this pin.
  // measured 2026-08-14 at the round-10 HEAD over the PREPARED plan
  // (executedPlan with AQE off — sparkPlan predates EnsureRequirements
  // and would miss every planner-inserted exchange): the declared
  // plans are lean because the heavy shared subtrees (pair graph, CC
  // labels, docGrams, edge table, rank state) are parquet tables
  // whose builds price their own shuffles once, in the bench
  // re-measured 2026-08-14 at the round-11 HEAD (same method) after
  // the one-gram-explode sharing: the original five pins are
  // UNCHANGED by the docGrams refactor — the shared table swaps
  // which leaf the explode reads, not the shuffle structure
  private val exchangeBudget = Map(
    "q_jaccard_prefix" -> 5,
    "q_dedup_ngram" -> 1,
    // re-pinned 5 → 4 in round 12: the shared gram-df table became
    // the skew guard's bucket-size source, deleting the hot-gram
    // count pass (and its exchange) from the containment candidate
    // join — the same cut the pair-graph build took. Back to 5 in
    // round 13 (audited): the handed-sizes path re-aggregates the
    // ABOVE-CAP hot keys to guarantee key uniqueness under int64
    // fingerprint collisions — a metadata-scale exchange over only
    // the >maxBucket rows, bought back many times over by the gram
    // join keys shrinking from ~25-byte strings to longs
    "q_dedup_contain" -> 5,
    "q_triangle_count" -> 8,
    "q_pagerank" -> 3,
    // round-10 verdict #5: pin the shared-artifact consumers too, so
    // the gram-df / pair-graph / tf-idf read paths can't silently
    // grow a shuffle while they're touched
    "q_dedup_ngram_capped" -> 5,
    "q_sim_sparse" -> 0,
    "q_ngram_novelty" -> 2,
    "q_split_leakage" -> 2,
    // round-11 additions: the histogram-first calibration (corpus →
    // per-(group, score) rollup → group repartition for the windows →
    // output sort) and the CC-labels broadcast argmax (label
    // aggregate + output sort; the labels table's own build shuffles
    // are priced once by the bench, not here)
    "q_quality_gate" -> 3,
    "q_dedup_rep_quality" -> 2,
    // round-11, second batch: dup-token accounting (CC labels
    // broadcast against the corpus scan → source aggregate + output
    // sort), BPE pairs (ONE alphabet²-bounded count exchange — the
    // top-k is a TakeOrdered, no sort shuffle), NFC accounting
    // (source aggregate + output sort; the normalize itself is
    // row-local)
    "q_dup_tokens" -> 2,
    "q_bpe_pairs" -> 1,
    "q_unicode_norm" -> 2,
    // round-11, third batch: frame-decode video (map-stage decode +
    // output sort only), Kneser–Ney head (three vocab-scale model
    // aggregates over the materialized bigram-count parquet — the
    // four-corpus-explode shape this pin exists to keep dead; joins
    // broadcast off real file stats), vocab overlap (ONE corpus-scale
    // (source,token) distinct — its three other uses are
    // ReusedExchange, asserted below — + pair rollup + counts agg +
    // output sort)
    "q_media_video" -> 1,
    "q_kn_bigram" -> 3,
    "q_vocab_overlap" -> 4,
    // round-11, fourth batch: shard-loss curve (4-row rollup + output
    // sort over the pair-graph parquet), int8 quantize profile
    // (|labels|-row rollup + output sort — the explode is row-local)
    "q_shard_dedup" -> 2,
    "q_embed_quantize" -> 2,
    // quality-band dup rate: CC labels broadcast against the
    // row-local quality scan → ≤ 11-row band rollup + output sort
    "q_dup_quality" -> 2,
    // conjunctive search (per-doc match aggregate + output sort; the
    // tiny match side broadcasts back to the corpus) and the gram-df
    // merge (base df agg + batch df agg + the vocab-scale full-outer
    // join's co-partition; the 1-row rollup rides the join exchange)
    "q_bool_search" -> 2,
    "q_gramdf_merge" -> 3,
    // keyness: all five exchanges are over the materialized
    // vocab×sources-scale count parquet (three totals rollups, the
    // per-source rank window's partition, the output sort) — the one
    // corpus-scale explode lives in the priced src_tok_counts build
    "q_keyness" -> 5,
    // round-12 additions: BPE encode (per-source rollup + output
    // sort — learning is one priced driver job, the encode chain is
    // row-local) and semantic dedup. Round 17 re-audit of the two
    // semantic twins: the pair-set temp-parquet round trip is GONE
    // (both orientations now come from one generator explode over a
    // single evaluation of the pair kernel), so the pair kernel's own
    // exchanges moved INSIDE the declared plan — 4 → 6 for the exact
    // twin (the all-pairs threshold kernel shuffles nothing — its
    // chunks are planner-built broadcasts — but the doc_id/nb verdict
    // joins and final aggregate now plan against the in-flight pair
    // stream: two join co-partitions, verdict aggregate partials, the
    // output sort). Per action the total exchange count is UNCHANGED
    // — the same shuffles previously ran inside the one-per-call
    // materialize job — and the pair-scale parquet write+read is
    // deleted.
    "q_bpe_encode" -> 2,
    "q_dedup_semantic" -> 6,
    // round-13 additions (round-12 verdict #5): the IVF semantic twin
    // and the REWIRED incremental probe
    // (bipartite prefix join's two explicit-count repartitions, the
    // candidate distinct, one verify co-partition, the output sort;
    // both sorted-gram sides broadcast off the cached parquet stats).
    // Round 17, IVF twin re-audit (4 → 10, same reason as the exact
    // twin — the former semdup_ivf_pairs build job's exchanges now
    // show in the declared plan): the cell-blocked self-join
    // contributes its hot-cell count aggregate (2) and two
    // explicit-count block repartitions, then the verdict joins and
    // aggregate as in the exact twin; per action nothing shuffles
    // more than before and the pair-set write+read is deleted.
    "q_dedup_semantic_ivf" -> 10,
    "q_dedup_incremental" -> 5,
    // round-13 additions: the incremental semantic probe (two
    // explicit-count bipartite-guard repartitions + the per-batch-doc
    // verdict aggregate + the output sort; cell assignment is
    // row-local against the broadcast parquet-backed model) and the
    // perceptual media near-dup (signature set-collapse over the
    // cached sig parquet, the banded blocked self-join's two
    // explicit-count repartitions + candidate distinct, the
    // per-hamming rollups + twin join + output sort)
    "q_dedup_semantic_inc" -> 6,
    // (13 → 9 in the same round: the signature-group table became its
    // own cached artifact instead of a per-branch re-aggregation)
    "q_media_phash" -> 9,
    // round-14 additions: the perceptual AUDIO near-dup (identical
    // plan shape to q_media_phash — set-collapse over the cached sig
    // parquet, banded blocked self-join's two explicit-count
    // repartitions + candidate distinct, per-hamming rollups + twin
    // join + output sort), the span-level shard-loss curve (the
    // (span, shard16) distinct-doc aggregate, the dup-group rollup +
    // its join co-partitions, the per-K per-group max cascade, the
    // 4-row rollup + output sort — all over 128-bit hash keys, span
    // text never shuffles), and the sorted-neighborhood pairs (the
    // materialized snm_sorted parquet prices its own build; the
    // neighbor equi-join broadcasts off file stats, leaving the
    // output sort as the one visible exchange)
    "q_media_audio_fp" -> 9,
    "q_span_shard_loss" -> 7,
    "q_dedup_sorted" -> 1)

  test("q_vocab_overlap reads the corpus once — the distinct subtree is reused") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val plan = SparkEntry.queries("q_vocab_overlap")(spark, sf)
        .queryExecution.executedPlan
      val scans = plan.collect { case s: FileSourceScanExec => s }.size
      assert(scans == 1, s"expected ONE documents scan (ReuseExchange), got $scans")
    } finally spark.conf.set(key, prev)
  }

  test("exchange-count budgets hold for the expensive queries") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val actual = exchangeBudget.keys.map { name =>
        val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
        name -> plan.collect { case e: ShuffleExchangeExec => e }.size
      }.toMap
      assert(actual == exchangeBudget,
        s"shuffle-count drift — re-audit the plan before re-pinning: $actual")
    } finally spark.conf.set(key, prev)
  }

  test("unpartitioned windows only where semantics are inherently global") {
    // structural, not textual: a WindowExec with an empty partitionSpec
    // moves ALL rows to one task (the earlier string heuristic
    // misread order-less partitioned windows — `Window [exprs],
    // [partitionSpec]` — as global)
    import org.apache.spark.sql.execution.window.WindowExec
    for ((name, fn) <- SparkEntry.queries) {
      val hasGlobal = fn(spark, sf).queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }.nonEmpty
      if (hasGlobal)
        assert(allowedGlobalWindow.contains(name), s"unreviewed global window in $name")
    }
  }
}
