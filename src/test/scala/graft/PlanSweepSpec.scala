package graft

/** The §4 scale claims as ENFORCED invariants: every registered query's
  * physical plan is swept and asserted against the anti-patterns that
  * kill 100 TB runs. A refactor that silently turns a broadcast star
  * join into a shuffle join, introduces a cartesian, or lets a
  * multi-distinct aggregate plan an Expand over the fact now fails the
  * suite instead of surfacing rounds later in a bench regression.
  *
  * The allow-lists below are the audited exceptions, each with the
  * reason it is safe at scale; adding a query to one is a reviewed
  * decision, not a default.
  */
class PlanSweepSpec extends SparkSpec {

  /** Queries whose plan legitimately contains BroadcastNestedLoopJoin:
    * every one is a crossJoin against a 1-row scalar aggregate or a
    * broadcast-bounded frame (k centroids / vocabulary df counts), so
    * the "nested loop" is O(rows × 1) — a map, not a quadratic join.
    * (Eda.scala stats/quantile/reconciliation scalars, VectorOps IVF
    * centroid fan-out, TextOps tf-idf df join.) */
  private val bnljBounded = Set(
    "q10_stats_profile", "q12_quantile_buckets", "q13_reconciliation",
    "q30_cosine_topk", "q43_ann_ivf_sampled", "q52_ann_ivf_probe2",
    "q80_ann_ivf_c32_probe4", // same centroid fan-out as q43/q52, 32 rows broadcast
    "q58_tfidf_topk", "q78_kmv_distinct",
    "q86_source_drift", // sources × ≤10-bin grid: both cross sides broadcast-tiny
    "q87_ann_sq8", // 1-row params crossJoin + q30's bounded query-batch fan-out
    "q102_ann_ivfpq", // q80's 32-row centroid fan-out, appearing once per ivfAssign reuse

    "q88_sample_quantiles", // realized-rank scan × broadcast 10-row estimate frame
    "q95_rfm_segments", // 1-row ref-date scalar crossJoin over the per-customer aggregate
    "q106_temperature_mix", // 1-row weight-sum scalar crossJoin onto the per-source counts
    "q107_bpe_train", // one 1-row argmax-pair crossJoin per merge round (5 total)
    "q108_kmeans_clusters", // K-row (8) centroid fan-out inside the cached Lloyd fit's rendered plan
    "q109_sem_dedup", // same: K-row (64) centroid fan-out of the cached doc-vector fit
    "q112_lm_novelty", // 1-row corpus-mean-surprise scalar crossJoin onto the per-doc scores
    "q114_index_drift", // 1-row cutoff/total scalars + the cached fit's K-row centroid fan-out
    "q115_bpe_encode", // q107's trainer chain: one 1-row argmax-pair crossJoin per merge round
    "q116_semantic_decon", // the cached doc-vector fit's K-row (64) centroid fan-out (q109's)
    "q136_decon_multiprobe", // q116's fan-outs + the benchmark-sized eval side × K-row centroid probe expansion
    "q117_hard_negatives", // the cached q108 fit's K-row (8) centroid fan-out
    "q126_cooccurrence_lift", // 1-row doc-count scalar crossJoin onto the vocab-sized pair stats
    "q129_market_basket", // 1-row basket-count scalar crossJoin onto the part-pair stats
    "q131_kmv_set_ops", // sketch algebra: every crossJoin side is a 1-row scalar or ≤K-row minima frame
    "q134_bm25_search", // 1-row corpus-stats (n_docs/avgdl) scalar crossJoin onto the probed postings
    "q139_source_jsd", // the sources² pair grid: a < b over two broadcast-tiny marginal frames
    "q140_bm25_stored", // the same stats scalar crossJoin, read from the stored 1-row stats parquet
    "q141_dsir_weights", // two 1-row total scalars: tt×st and their crossJoin onto the 256-row bucket grid
    "q145_data_budget", // 1-row (total, n_sources) scalar crossJoin onto the sources-sized frame
    "q151_unimax_alloc", // 1-row (n, B) totals + 1-row water-level θ crossJoins onto lang-cardinality rows
    "q156_rrf_fusion", // inherits q134's 1-row corpus-stats scalar crossJoin inside the fused BM25 branch
    "q159_rfm_sketch", // q95's 1-row ref-date scalar + the 1-row broadcast cutpoint-bounds frame
    "q157_ann_recall", // composes q30 + three annIvf branches: the bounded query-batch broadcasts those queries are allowlisted for, times four
    "q164_t_closeness", // 1-row corpus-distribution scalar crossJoin onto the QI-group-space frame
    "q166_langid_trained") // language-inventory crossJoin: dozens of class rows broadcast onto the hashed feature frame (O(rows × classes), the one-vs-rest axis)

  /** Queries whose plan legitimately contains Expand: ROLLUP/CUBE are
    * grouping-sets operators — Expand IS their plan shape, bounded at
    * (#grouping sets) × input, chosen deliberately for those two
    * queries. Nothing else may Expand: a multi-distinct aggregate
    * over the fact would multiply the shuffle by its distinct count
    * (the round-4 prep_gold_marts regression), which is why the marts
    * decompose distinct-counts instead. */
  private val expandOk = Set("q45_rollup_sales", "q53_cube_orders",
    "q100_sliding_windows", // window/slide = 2: a bounded constant replication, chosen deliberately
    "q133_unpivot_measures", // unpivot IS an Expand: ×4 rows, one per melted measure — bounded constant
    "q135_grouping_sets") // GROUPING SETS is the Expand general form: breadth = |sets| = 3, bounded

  /** Queries where a SortMergeJoin is the RIGHT plan: both sides are
    * derived aggregates / range-bucketed frames of comparable, fact-
    * proportional size (dedup cluster propagation, decontamination
    * gram join, range/as-of buckets, per-level series calendar joins,
    * silver dedup ranking, semi/anti over derived sets) — broadcasting
    * either side would ship a fact-sized table. */
  private val smjOk = Set(
    "q41_store_performance", "q47_semi_anti_join", "q54_dedup_clusters",
    "q62_decontamination", "q64_range_join", "q70_forecast_levels",
    "q73_embedding_clusters",
    "q91_decon_two_phase", // exact-verify join on hash-hit grams (broadcast at small SF, SMJ at scale)
    "q105_incremental_dedup", // delta bands vs stored index + shingle verify: derived-vs-derived, delta side bounded
    "q116_semantic_decon", // assignment × documents source-tag join: both sides corpus-proportional, id-keyed
    "q117_hard_negatives", // assignment × embeddings label-tag join + in-cell pair join: corpus-proportional sides
    "q118_mirror_matrix", // verified-pair (q23 LSH band) chain + source tag joins: derived-vs-derived, pair side band-bucket-bounded
    "q124_pagerank", // per-iteration edge-contribution joins: edge list and rank vector are both graph-proportional (neither broadcasts at scale)
    "q99_curation_funnel", // stage chains: doc-id-projection semi/anti joins of comparable derived sets
    "q141_dsir_weights", // raw-doc id projection LEFT JOIN per-doc scores: both corpus-proportional, id-keyed
    "q144_split_assign", // documents × cached cluster artifact: both corpus-proportional, doc-id-keyed
    "q146_training_manifest", // q99 flags ∩ q144 split: id-keyed joins of corpus-proportional per-doc frames
    "q157_ann_recall") // per-config exact-vs-approx LEFT joins: derived batch×k-row frames on (query_id, neighbor_id), both sides comparable and bounded by the query batch

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  private def count(p: String, op: String): Int = op.r.findAllIn(p).size

  test("no query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val n = count(plan(name), "CartesianProduct")
      if (n > 0) Some(s"$name ($n)") else None
    }
    assert(offenders.isEmpty,
      s"CartesianProduct in: ${offenders.mkString(", ")} — a cartesian " +
        "over the fact is quadratic at any scale; bound one side and broadcast it")
  }

  test("BroadcastNestedLoopJoin only against broadcast-bounded frames") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(bnljBounded)
      .flatMap { name =>
        val n = count(plan(name), "BroadcastNestedLoopJoin")
        if (n > 0) Some(s"$name ($n)") else None
      }
    assert(offenders.isEmpty,
      s"unaudited BroadcastNestedLoopJoin in: ${offenders.mkString(", ")}")
  }

  test("no Expand outside the grouping-sets queries") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(expandOk)
      .flatMap { name =>
        val n = count(plan(name), "Expand")
        if (n > 0) Some(s"$name ($n)") else None
      }
    assert(offenders.isEmpty,
      s"Expand in: ${offenders.mkString(", ")} — usually a multi-distinct " +
        "aggregate; decompose the distincts (see GoldMarts) instead of " +
        "multiplying the shuffle")
  }

  test("shuffle joins only where both sides are fact-proportional") {
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(smjOk)
      .flatMap { name =>
        val p = plan(name)
        val n = count(p, "SortMergeJoin") + count(p, "ShuffledHashJoin")
        if (n > 0) Some(s"$name ($n)") else None
      }
    assert(offenders.isEmpty,
      s"shuffle join in: ${offenders.mkString(", ")} — dimension joins " +
        "(nation/region/supplier/part) must broadcast; only derived-vs-" +
        "derived joins of comparable size may shuffle")
  }

  test("star joins broadcast their dimensions") {
    // the flagship marts: every join a BroadcastHashJoin, no shuffle
    // join anywhere in the star
    for (name <- Seq("q01_monthly_sales", "q02_inventory_health",
        "q03_supplier_monthly", "q04_dashboard")) {
      val p = plan(name)
      assert(count(p, "BroadcastHashJoin") > 0, s"$name lost its broadcast joins")
      assert(count(p, "SortMergeJoin") == 0 && count(p, "ShuffledHashJoin") == 0,
        s"$name shuffles a dimension join")
    }
  }

  test("q140 probes the stored postings index, never the corpus") {
    // the production-retrieval claim as a plan assert: the stored-index
    // BM25 path's only file scans are the persisted index tables — a
    // documents scan would mean the tokenize pass leaked back into
    // query time
    val p = plan("q140_bm25_stored")
    assert(!p.contains("documents.parquet"),
      "q140 re-read the corpus: the stored index should replace the tokenize pass")
    assert(p.contains("postings"), "q140 is not reading the persisted postings")
  }

  test("q137 serves from the stored probe sidecar, never rebuilding it") {
    // the df-stoplist + bottom-k probe selection is a prep_text_lsh
    // sidecar (TextOps.sharedContainProbes); at query time the plan
    // must neither re-tokenize the corpus nor re-run the per-doc
    // bottom-k window — both would mean the sidecar leaked back into
    // the timed path (the r11 q137 regression). The LIVE plan only:
    // toString embeds each InMemoryRelation's build plan (where the
    // Window legitimately lives, executed once at prep), so traverse
    // the tree and stop at cache scans.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def liveNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: liveNodes(a.executedPlan)
      case s: InMemoryTableScanExec => Seq(s)
      case other => other +: other.children.flatMap(liveNodes)
    }
    val nodes = liveNodes(SparkEntry.queries("q137_containment")(spark, sf0001)
      .queryExecution.executedPlan)
    val names = nodes.map(_.nodeName)
    assert(!names.exists(_.startsWith("Window")),
      s"q137 rebuilt the bottom-k probe selection at query time: $names")
    assert(!nodes.exists(_.toString.linesIterator.next().contains("documents.parquet")),
      "q137 re-tokenized the corpus: shingles should come from the shared cache")
    assert(names.count(_ == "InMemoryTableScan") >= 2,
      s"q137 should read BOTH the stored probe sidecar and the shingle cache: $names")
  }
}
