package graft.plans

import graft.{PlanCheck, SparkSpec, SparkEntry}

/** The four scale-health flags ([[graft.PlanCheck.flags]]) pinned for
  * the TEN most expensive gates (by the frozen sf0.1 baseline), so a
  * plan regression — a lost scan pushdown, a broadcast degrading to a
  * shuffle join, a codegen break — flips a test instead of only a
  * manually-regenerated PLANS.md row. Two gate classes:
  *
  *   - RELATIONAL chains (t19, d2, x4, m11b): the final plan carries
  *     the whole pipeline — all four flags are meaningful and pinned
  *     true.
  *   - RECALL HARNESSES (e11/e12/e14/e16, b1, m11): the builder
  *     composes eagerly (`.head()` bound checks / MLlib fits), so the
  *     FINAL plan is a summary select — only codegen is meaningful
  *     there (the scan pushdown happens in the inner actions; PLANS.md
  *     documents this since round 6) and the other flags are pinned at
  *     their observed `false` so an unexpected shape change in either
  *     direction is visible.
  *
  * Every audited plan is additionally asserted CartesianProduct-free —
  * the one regression class that is catastrophic at any scale.
  */
class PlanAuditSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // (pushdown, pruning, broadcast, codegen) per gate — the PLANS.md
  // flag table's source of truth
  private val expected: Seq[(String, (Boolean, Boolean, Boolean, Boolean))] = Seq(
    "e16_residual_recall" -> ((false, false, false, true)),
    "m11b_knn_components_learned" -> ((true, true, true, true)),
    "t19_winnowing" -> ((true, true, true, true)),
    "d2_fuzzy_blocked" -> ((true, true, true, true)),
    "x4_decontam_spans" -> ((true, true, true, true)),
    "e14_unsup_recall" -> ((false, false, false, true)),
    "b1_basket_rules" -> ((false, false, false, true)),
    "e12_ivf_pq_recall" -> ((false, false, false, true)),
    "e11_pq_sampled_recall" -> ((false, false, false, true)),
    // Round-17: the mutual-kNN edge set is bounded, so Components takes
    // the driver union-find path and m11's FINAL plan is the vertex
    // parquet scan broadcast-joined with the local label table —
    // pushdown/pruning/broadcast all LIVE again (they were false when
    // the plan ended at the propagation loop's checkpoint blocks).
    "m11_knn_components" -> ((true, true, true, true)),
    // Round-12/13 LM family: t33/t34's final ranked cuts now ride
    // `GlobalRank`'s two-pass shape, so their FINAL plan reads the
    // checkpointed range-sorted run (scan flags live in pass 1, like
    // t37; broadcast = the prefix-offset join). t35's final plan reads
    // the eagerly checkpointed KL table (harness class); t36's sampler
    // inlines the collected budget map as a literal when-chain.
    "t33_lm_perplexity" -> ((false, false, true, true)),
    "t34_dsir_selection" -> ((false, false, true, true)),
    "t35_domain_kl" -> ((false, false, false, true)),
    "t36_kl_mixture" -> ((true, true, false, true)),
    // t37's final plan reads the checkpointed range-sorted run (the
    // scan flags live in pass 1); broadcast = the prefix-offset join.
    "t37_corpus_shards" -> ((false, false, true, true)),
    // Round-13: the suffix-array gates' final plans read checkpointed
    // rank tables (scan flags live in the doubling rounds; broadcast =
    // GlobalRank's offset join); t34b re-derives the fused dual-LM
    // scoring in its final plan (documents scan + broadcast LM joins);
    // t38 = the checkpointed two-pass deal, t37's class.
    "sa1_suffix_array" -> ((false, false, true, true)),
    "sa2_dup_prefix_census" -> ((false, false, true, true)),
    "t34b_dsir_online" -> ((true, true, true, true)),
    "t38_shard_deal_online" -> ((false, false, true, true)),
    // Round-14: sa3 serves the battery-shared LCP memo (LocalRelation —
    // the scans happened in the memoized build); sa4's final plan joins
    // the documents scan (pushdown/pruning live) with the broadcast-
    // joined span segments; sa5's final plan reads checkpointed rank
    // tables like sa2 (broadcast = GlobalRank's offset join).
    "sa3_lcp_adjacent" -> ((false, false, false, true)),
    "sa4_exact_substring_dedup" -> ((true, true, true, true)),
    // (sa5 since round 15 LEFT-joins the slice-id documents scan —
    // the zero-token-doc fix — so its scan flags went live too)
    "sa5_token_dup_census" -> ((true, true, true, true)),
    // Round-15: sa6's final plan joins the slice-id documents scan
    // (pushdown/pruning live) with the memo-served LCP's merged-
    // interval complement (broadcast = GlobalRank's offset join +
    // the interval clip); its pack window partitions by shard.
    "sa6_token_span_dedup" -> ((true, true, true, true)),
    // Round-15 (extension): e21's final plan joins the last
    // checkpointed beam (the hop scans live in the checkpointed
    // iterations) with the brute ground-truth leg — embeddings scan
    // (pushdown/pruning live), broadcast panel, per-qid windows.
    "e21_graph_beam_search" -> ((true, true, true, true)),
    // Round-16: e21b serves from the PREBUILT symmetric edge index
    // (presymmetrized beam walk — no build, no symmetrize shuffle);
    // its final plan is e21's class: checkpointed last beam joined
    // with the brute recall leg over the embeddings scan.
    "e21b_graph_serving" -> ((true, true, true, true)),
    // Round-16: e22 descends the HNSW layer ladder — the final plan is
    // e21's class (checkpointed last beam + brute recall leg over the
    // embeddings scan); the layer builds live in the checkpointed
    // upper-layer edge tables.
    "e22_hnsw_search" -> ((true, true, true, true)),
    // Round-17: e22b serves the rep ladder from the PREBUILT parquet
    // artifact (repmap/reps/layer edges/entries read back as written —
    // nothing rep- or ladder-shaped derived in the query path); final
    // plan is e21b's class: checkpointed last beam + clone expansion +
    // brute recall leg over the embeddings scan.
    "e22b_hnsw_serving" -> ((true, true, true, true)),
    // Round-17: e24 serves the select-neighbors-diversified graph over
    // the DERIVED fan corpus — the corpus is an eagerly checkpointed
    // derivation (not a parquet scan), so like the other recall
    // harnesses the scan flags live inside the checkpointed build and
    // the final plan reads checkpoint blocks (broadcast = the panel
    // joins; codegen live).
    "e24_diverse_graph" -> ((false, false, true, true)),
    // Round-16: e23 mines contrastive triplets — broadcast centroids,
    // foreign-list probes, bucket-sized positive leg; final plan joins
    // the two panel-sized legs over the embeddings scan.
    "e23_hard_negatives" -> ((true, true, true, true)),
    // Round-15 (extension): t40b serves the distilled model — two
    // narrow documents scans (the literal-lookup score fold + the
    // label projection) broadcast-joined on doc_id; training happened
    // driver-coordinated in the memo, so the final plan is pure
    // serving: pushdown/pruning live, zero wide shuffle.
    "t40b_distill_serve" -> ((true, true, true, true)),
    // Round-15 (extension): t41's final plan joins the documents scan
    // (pushdown/pruning live) with the word-type Viterbi segmentation
    // chain (bounded equi-join DP levels; broadcast = the checkpointed
    // vocab-score and word-seg joins).
    "t41_unigram_encode" -> ((true, true, true, true)))

  // Gates whose whole point is avoiding the global-window shape: any
  // `Window` fed by an `Exchange SinglePartition` in their final plan
  // is a regression back onto the single-task sort.
  private val noGlobalWindow =
    Set("t33_lm_perplexity", "t34_dsir_selection", "t37_corpus_shards",
      "sa1_suffix_array", "sa2_dup_prefix_census", "t34b_dsir_online",
      "t38_shard_deal_online", "sa3_lcp_adjacent",
      "sa4_exact_substring_dedup", "sa5_token_dup_census",
      "sa6_token_span_dedup", "t40b_distill_serve",
      "e21_graph_beam_search", "e21b_graph_serving", "e22_hnsw_search",
      "e22b_hnsw_serving", "e24_diverse_graph", "t41_unigram_encode")

  expected.foreach { case (name, (pushdown, pruning, broadcast, codegen)) =>
    test(s"$name keeps its plan flags (and no CartesianProduct)") {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // collect() (not count()) so THIS QueryExecution runs and AQE
      // finalizes the inspected plan
      df.collect()
      val physical = df.queryExecution.executedPlan.toString()
      val got = PlanCheck.flags(physical)
      assert(got("pushdown") == pushdown, s"pushdown: $got")
      assert(got("pruning") == pruning, s"pruning: $got")
      assert(got("broadcast") == broadcast, s"broadcast: $got")
      assert(got("codegen") == codegen, s"codegen: $got")
      assert(!physical.contains("CartesianProduct"),
        s"$name's final plan contains a CartesianProduct")
      if (noGlobalWindow(name))
        assert(!PlanCheck.hasSinglePartitionWindow(physical),
          s"$name's final plan sorts the relation through a single-partition window")
    }
  }
}
