package graft

import java.nio.file.{Files, Paths}

/** Regenerates PLANS.md: the final (post-AQE) physical plans of the
  * headline queries, as evidence of the scale posture (broadcasts,
  * pushdown, single-shuffle shapes) that PlanShapeSpec asserts.
  * Run: sbt "Test/runMain graft.PlanDump" (writes to repo root). */
object PlanDump {
  val Headline: Seq[(String, String)] = Seq(
    "q2_top_parts" -> "broadcast dim join + TakeOrderedAndProject top-k",
    "q5_monthly_snapshot" -> "one hash shuffle shared by aggregation and lifetime window",
    "q18_scan_filter" -> "predicate pushdown + column pruning at the parquet scan",
    "q26_spend_deciles" -> "window-free decile assignment via broadcast percentile bounds",
    "q29_top_products_star" -> "served from the persisted star artifact; one broadcast dim join",
    "d4_minhash_lsh" -> "SERVED from the persisted pairs artifact (pure parquet scan + order) — the candidate graph is a table, not a per-query derivation",
    "pairs_build" -> "the pairs ARTIFACT BUILD (paid once per corpus version): banded LSH over the signatures artifact — candidates only inside band buckets, exact-Jaccard verify on candidates only",
    "s5_ivf_kmeans" -> "k-means IVF: broadcast centroid assignment, probe-2 rerank",
    "t10_decontaminate" -> "broadcast eval-gram semi-join; training corpus never shuffles",
    "s6_pq_adc" -> "PQ-ADC: packed-long argmin hash agg; broadcast distance-table join",
    "t15_vocab_ppl" -> "top-K vocab via TakeOrderedAndProject; bounded broadcast + OOV floor",
    "q44_profile" -> "column-parallel profile: one pruned single-column scan per branch, no Expand",
    "t19_bloom_decontaminate" -> "broadcast packed-bitset bloom probe in front of the exact verify join",
    "q46_concurrency" -> "day-partitioned interval sweep: every window carries a partition spec",
    "t21_dsir_select" -> "SERVED from the persisted dsir_perdoc/dsir_cut model artifacts: pruned scan + broadcast 1-row cut + one rollup",
    "dsir_model_build" -> "the DSIR model ARTIFACT BUILD (paid once per corpus version): one tokenize+bucket pass, B-row bucket model + totals broadcast back over the pool",
    "t30_model_refresh" -> "drift-gated model refresh: t26's drift chain (K-row vocab broadcast, dense |sources|xK grid) + BOTH model generations' selection censuses as narrow artifact scans under broadcast 1-row cuts — no corpus re-tokenize on the census side",
    "q49_pareto" -> "global cumulative as a two-level scan: broadcast sketch boundaries + bucket-partitioned running sum",
    "d18_sketch_overlap" -> "KMV overlap: one O(k)-state sketch pass; |sources|·k bounded tail",
    "s11_recall_matrix" -> "four ANN families union'd into one |Q|·k membership grade",
    "m6_crossmodal_knn" -> "cross-modal kNN: broadcast integer query projections; corpus never moves",
    "e2_selection_mix" -> "served from the persisted docflags artifact: pruned parquet scan + one hash agg",
    "docflags_build" -> "the docflags ARTIFACT BUILD (paid once per corpus version): broadcast DSIR model + cut + rate table over the funnel, labels artifact left-joined",
    "s12_ivf_pq" -> "IVF-PQ: probed-list candidates x broadcast ADC tables; corpus never shuffles",
    "q54_basket_lift" -> "basket-local pair self-join, min-support pruned; no catalog-sized broadcast hint (AQE picks sides)",
    "s13_persisted_index" -> "persisted IVF-PQ: query path reads ONLY the ccid-partitioned index tables",
    "m7_perceptual_lsh" -> "banded LSH over codegen'd positional signatures; capped buckets, L1 verify on candidates only",
    "e4_delta_ingest" -> "incremental ingest: frozen base-trained models broadcast over a delta-only scan",
    "s15_hybrid_rrf" -> "hybrid RRF: 1-row BM25 stats + |Q| query vectors both broadcast; fusion join bounded by query load",
    "e6_leakage_split" -> "cluster-atomic split: doc left-join the persisted labels artifact + row-local hash lottery",
    "t26_source_drift" -> "frozen top-K vocab broadcast; |sources|xK dense model grid; one tokenize pass",
    "d20_dedup_quality" -> "five pair-set families graded in one pair-bounded membership join",
    "d21_lsh_tuning" -> "one MinHash signature table banded three ways; candidates only inside each config's buckets",
    "t27_bpe_merges" -> "BPE training round (the bpe_merges ARTIFACT BUILD's shape, paid once per corpus version; the gate row now serves the 8-row merge table from parquet): corpus-size-independent vocab pair count + 1-row TakeOrdered argmax",
    "e7_training_order" -> "epoch-shuffle census over the bins artifact: row-local hash-range quartiles — no rank, no window, no global sort",
    "m8_scene_segmentation" -> "codegen'd SegmentSums scan; lag/cumsum windows partitioned per media (16 rows each)",
    "s18_index_delete" -> "post-compaction serve: s13's partition-pruned query plan over the shrunken survivor lists",
    "p6_modularity" -> "modularity grading: one degree aggregate + two pair-sized label lookups beyond p3's rounds",
    "t28_bpe_encode" -> "BPE encode: merge fold over the vocab-sized distinct-word table; corpus pays one (source,word) groupBy; the encode join is SIZE-GATED (r16) — broadcast while encodeBytesOf(vocab) fits the threshold (spark.graft.encode.broadcastThreshold, session fallback), shuffle-on-word past it, forms pinned bit-equal",
    "s31_probe_autotune" -> "self-tuned probe serve (r16): per-width rank windows over ONE scored candidate frame (|Q| probed lists at the widest width, each pair tagged with its narrowest reaching width) graded against the persisted exact_q truth; the decision is an 8-row integer census driver-side; the serve re-ranks the same frame at the chosen width",
    "e8_token_budget" -> "water-filling: |sources|-row spec windows + 1-row broadcast cut; corpus-sized work stays inside t28's census",
    "s14_index_health" -> "index health: two full index pipelines graded by one |Q|·k membership join keyed on (query_id, neighbor_id)",
    "s20_knn_graph" -> "kNN graph SERVED from the persisted knng artifact (pure scan + order; r13 — the build is knng_build below, paid once per corpus version)",
    "knng_build" -> "the kNN-graph ARTIFACT BUILD: IVF-blocked candidates at probes=4 (the r13-measured frontier knob, recall@10 0.9492) + two NN-Descent two-hop rounds, codegen'd integer distances, rank window partitioned per vector; Lloyd training fully distributed (LongVecSum one-shuffle re-sums over checkpoint-rooted centroid frames — no LocalTableScan, no driver re-seed)",
    "s24_graph_served" -> "graph-served kNN grading: |Q| rows read from the graph artifact membership-joined against the PERSISTED exact_q truth (r14 — both grading sides are artifact reads; the brute-force pass moved into the once-per-corpus-version truth build)",
    "s25_graph_append" -> "graph append SERVED from the appended artifact (arrival-sized localized-descent integration is its marker-gated builder: frozen-centroid blocking + one descent hop through the base graph + touched-only re-rank)",
    "e19_model_cutover" -> "drift-gated model cutover: the decision is a |sources|-row local relation (t26 chain runs ONCE); the served census is a narrow post-swap frozen-root scan under a broadcast 1-row cut",
    "e9_order_manifest" -> "order manifest SERVED from its persisted artifact (built once beside the bins: shard-partitioned position window, |shards|-row rollup)",
    "e10_artifact_refresh" -> "epoch-append refresh: one scan of the epoch-partitioned bins tree feeds both the per-epoch census and the combined-order checksum; the delta pack itself is marker-gated build work, delta-sized",
    "e11_retention_delete" -> "retention delete: pre-delete epoch scan (removed mass) left-joined with the retained generation's manifest; the repack is marker-gated build work, one docflags scan + per-shard windows",
    "e12_budget_enforce" -> "budget enforcement: |sources|-row water-filling spec + broadcast alloc table over ONE per-source cumulative window on the mixed set",
    "e12_two_level" -> "e12's hot-source escape (q49's pattern, flag-selected): broadcast per-source doc_id decile boundaries + broadcast range offsets; the running sum windows per (source, range) — no single hot window partition, pinned row-equal to the window form",
    "e13_graph_refresh" -> "incremental candidate-graph refresh, DELTA-VERIFY stage (the fold's plan is round-iterated CC over checkpoints): delta slice of the signatures artifact banded against the full band table (base×base buckets untouched), verify scans endpoint-bounded by a semi-join — nothing re-derives the base corpus",
    "s23_deferred_update" -> "deferred-update serve: s13's partition-pruned query plan overlaid with the generation ledger — max-generation per id resolved at read time, no compaction on the serve path",
    "e14_graph_retract" -> "graph retraction SERVED from the persisted offboarded labels artifact (pure scan + order; the incremental pass-through/re-converge is its marker-gated builder — retract_build below)",
    "retract_build" -> "the offboarded-labels ARTIFACT BUILD: untouched clusters' labels pass through from the live labels artifact (scan + broadcast anti-join on the |retired-clusters|-bounded affected set); only the affected subgraph re-converges (the checkpoint-rooted union branch)",
    "e16_offboard_split" -> "the leakage split drawn AFTER offboarding: e6's cluster-atomic shape verbatim — doc left-join the OFFBOARDED labels artifact + row-local hash lottery, retired rows filtered at the scan",
    "s26_graph_delete" -> "graph delete SERVED from the compacted artifact (pure scan + order; the touched-list compaction is graph_compact_build below, paid once per delete batch)",
    "graph_compact_build" -> "the graph-delete COMPACTION BUILD: untouched survivor lists pass through verbatim (broadcast anti-joins on the bounded tombstone set); only touched lists re-rank, over surviving edges ∪ 2-hop replacements ∪ one localized descent hop — candidate volume O(|D|·k²), never a rebuild",
    "s27_graph_health" -> "graph drift health: THREE artifact reads (appended, rebuilt, persisted exact truth) into one |Q|·k·2 membership-grading join — no brute force, no rebuild on the serve path",
    "st15_graph_arrive" -> "streamed graph arrival SERVED: committed wave pairs + arrival ids (ledger scans) folded through the batch append's integration kernel — arrival-sized candidate joins against the persisted base graph",
    "s28_graph_update" -> "graph update SERVED from the graph_updated artifact (pure scan + order; its builder composes the s26 compaction kernel with the s25 integration kernel under the current view — |U|-bounded, never a rebuild)",
    "s29_graph_retrain" -> "drift-gated graph retrain: the decision is a |Q|·k·2 membership grade over three persisted artifacts (driver state = two longs); the serve is a pure post-verb slot scan with the decision as literals — the promotion itself is two renames",
    "s30_index_cutover" -> "drift-gated IVF cutover: the serve is s13's partition-pruned query plan over the post-verb tree with the decision as literals; the decision grade is |Q|·k membership joins over the persisted grading-truth tier (exact_cos/appended_q/retrained_q), the verb itself marker-gated once per corpus version",
    "st16_graph_retract" -> "streamed graph retract SERVED: committed tombstone ids (ledger scans) folded through the s26 compaction kernel in ONE application — touched-list-bounded re-rank, untouched survivor lists verbatim",
    "t31_tokenizer_health" -> "tokenizer fertility health: two (source, word) corpus censuses joined against BOTH persisted vocabulary-sized encoded-word tables (frozen + current generations) — no learn, no fold, no corpus re-tokenize on the serve path",
    "e20_tokenizer_cutover" -> "drift-gated tokenizer cutover: the decision is a |sources|-row local relation (t31's census chain runs ONCE); the served fertility is one delta census against the post-verb frozen encoded table — promotion itself is per-layer renames",
    "st17_index_ingest" -> "streamed IVF ingest SERVED: the partition-pruned query plan with the generation-ledger overlay (max-gen per id over the committed waves) — wave coding never rewrites a list",
    "st18_index_retract" -> "streamed IVF retract SERVED: the partition-pruned query plan with the materialized tombstone set anti-joined broadcast — no compaction on the serve path",
    "st19_pair_retract" -> "streamed pair-graph retract SERVED: e14's incremental retraction kernel over the persisted pairs/labels artifacts — untouched clusters pass through (anti-join on the affected-member set), only the affected subgraph re-converges",
    "d22_update_verify" -> "d22's arrival-verify stage (the fold's own plan is checkpoint-rooted CC): edit-batch bands against the post-edit signature state (survivor artifact rows ∪ the batch), exact-Jaccard verify over the current-view shingle table endpoint-bounded by a semi-join — batch-sized, never a corpus rebuild",
    "st20_wave_flags" -> "st20's per-wave docflags kernel: the wave joined broadcast against the persisted global tables (labels drops, dsir model + 1-row cut, |sources| rates, tiny eval-gram set) — every stage per-doc, nothing corpus-sized recomputed per wave",
    "s32_filtered_search" -> "selectivity-gated filtered search (r16): the broad filter's plan rides the index — probed-list ADC candidates semi-joined to the pushed-predicate matching-id set, ranked AFTER the filter; the narrow filter's plan never touches the index — exact int64 scan of the matching subset × the broadcast query slice; the integer cross-multiply decision picked each",
    "t32_bigram_ppl" -> "interpolated bigram-LM scoring (r16): one corpus bigram groupBy (map-side combined), BOTH model tables K-bounded TakeOrderedAndProject broadcasts, pair-grain broadcast left joins, doc agg + source rollup — t15's bounded-model discipline at the bigram tier",
    "s33_adc_rerank" -> "two-stage serve (r16): stage 1 = s13's partition-pruned probed-list ADC plan cut to the R=30 shortlist; stage 2 = exact int64 re-rank joining the corpus vector table ONLY on shortlist ids — R·|Q|-bounded raw-vector reads, one rank window per stage",
    "q56_star_refresh" -> "star partition refresh (r17): the served census is a pure scan of the month-partitioned post-refresh fact; the refresh itself writes one partition per arriving month via dynamic partition overwrite (re-delivered in-verb — replacement, never append)",
    "q57_fact_retention" -> "star retention delete (r17): touched months from a broadcast victim semi-join; the repack is touched-partitions-only (left_semi on months, left_anti on victims) under dynamic overwrite; the served census is a pure post-erasure scan",
    "st24_fact_loads" -> "streamed star loads (r17): each micro-batch's foreachBatch write rewrites only its touched month partitions; the duplicate delivery replaces the same partition; the served census is a pure scan of the converged fact",
    "e23_split_guard" -> "leakage-safe split (r17): row-local portable-hash split columns over ONE left join against the candidate-pair-bounded labels artifact; the leak grade joins the persisted pairs table on doc_id; census = one union + one hash agg",
    "e22_maintenance_apply" -> "unified maintenance apply (r17): the four model tiers' drift decisions are |Q|·k membership grades / K-row broadcasts over persisted grading artifacts (ONE shared computation with e21), the star tier's is two month-grain censuses; fired tiers re-grade the post-apply tree, quiet tiers serve already-persisted grades — the output is a 5-row local relation",
    "e24_release_pack" -> "split-aware release packing (r17): the split column rides the docflags scan (row-local hash + candidate-pair-bounded labels broadcast); per-split packing is e7's shard-local offset window; census = |splits|·|shards| rows",
    "q58_star_freshness" -> "star freshness gate (r17): two month-grain censuses (source agg + a pure scan of the standing fact) joined at month grain; the gated refresh rewrites fired partitions only; the served dashboard joins the materialized decision to a post-apply census scan",
    "st25_fact_erasure" -> "streamed star erasure (r17): each request micro-batch runs q57's repack kernel — broadcast victim semi-join picks touched months, left_anti repack under dynamic overwrite; the duplicate request's semi-join finds nothing and writes nothing; served census is a pure post-stream scan",
    "m9_media_clusters" -> "media near-dup clusters (r17): persisted media_pairs scan → big-star CC (edge-sized checkpointed rounds) → one hash agg per census leg; the worst-L1 leg joins pairs to labels on the smaller endpoint only",
    "m10_media_append" -> "media delta ingest (r17): the base's banded pipeline + an ARRIVAL-member bucket join (arrival rows × their bucket co-members, never member×member) + an arrival-sized L1 verify — append ≡ rebuild hashed by m7's own oracle",
    "m11_media_retract" -> "media retraction (r17): row-local retired-endpoint filter on the persisted pair scan, then the shared big-star census over survivors — takedown cost ∝ surviving pairs")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create(8)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val sb = new StringBuilder
    sb.append("# PLANS — final physical plans of the headline queries\n\n")
    sb.append("Auto-generated by `sbt \"Test/runMain graft.PlanDump\"` at sf0.001\n")
    sb.append("(plan SHAPES are scale-invariant; sizes are not). The same shapes\n")
    sb.append("are asserted as tests in `PlanShapeSpec`/`PhysicalLayoutSpec`.\n")
    // gate entries that collect a bounded report (to release their own
    // caches) return LocalTableScan plans; dump their pre-collect
    // distributed frame instead
    val planFrame: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "e4_delta_ingest" -> (graft.ext.Pipeline.e4DeltaIngestFrame _),
      "docflags_build" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        graft.ext.Pipeline.docFlagsDerived(s, d, graft.ext.Pipeline.labelsDerived(s, d))),
      "t27_bpe_merges" -> (graft.ext.TextAnalysis.t27Round1Pairs _),
      "d21_lsh_tuning" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        graft.ext.Dedup.d21PlanFrame(s, d)),
      "p6_modularity" -> (graft.ext.Graph.p6PlanFrame _),
      "e12_two_level" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        graft.ext.Pipeline.e12Enforced(s, d, twoLevel = true)),
      "e22_maintenance_apply" -> (graft.ext.Similarity.maintenanceGradeFrame _),
      "pairs_build" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        graft.ext.Dedup.d4PairsFromSignatures(s, d,
          graft.ext.Pipeline.signaturesArtifact(s, d))),
      "e13_graph_refresh" -> (graft.ext.Pipeline.e13NewPairsFrame _),
      "dsir_model_build" -> (graft.ext.TextAnalysis.t21Derived _),
      "knng_build" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        graft.ext.Similarity.s20KnnGraphRounds(s, d,
          graft.ext.Similarity.S20DescentRounds)),
      "retract_build" -> (graft.ext.Pipeline.e14Derived _),
      "graph_compact_build" -> (graft.ext.Similarity.s26CompactBuildFrame _),
      "d22_update_verify" -> (graft.ext.Dedup.d22NewPairsFrame _),
      "st20_wave_flags" -> ((s: org.apache.spark.sql.SparkSession, d: String) =>
        graft.ext.Pipeline.docFlagsForWave(s, d,
          graft.Tables.documents(s, d).filter(graft.ext.Pipeline.e4DeltaPredOn("doc_id")))))
    Headline.foreach { case (name, why) =>
      val df = planFrame.getOrElse(name, SparkEntry.queries(name))(spark, dir)
      df.collect() // let AQE finalize
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head.trim
      sb.append(s"\n## $name — $why\n\n```\n$plan\n```\n")
    }
    // st10's STREAMING physical plan (the gate entry is the batch
    // twin; the state-store join operator and watermark predicates
    // only exist in the streaming form, so it is captured from a live
    // memory-sink run — the shape PlanShapeSpec asserts)
    locally {
      import graft.streaming.EventsStream
      import org.apache.spark.sql.functions.col
      val sd = Files.createTempDirectory("events_stream_plan")
      Files.copy(Paths.get(s"$dir/events.parquet"), sd.resolve("events.parquet"))
      val q = EventsStream.runToMemory(
        EventsStream.attributionOuterStream(
            EventsStream.readEventsStream(spark, sd.toString))
          .select(col("user_id"), col("buy_id"), col("view_id")),
        "st10_plan_dump", mode = "append")
      val baos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(baos, true, "UTF-8")) { q.explain() }
      q.stop()
      sb.append("\n## st10_outer_join (STREAMING form) — StreamingSymmetricHashJoin" +
        " (LeftOuter) with per-side EventTimeWatermark: state bounded by" +
        " watermark + gap, orphans emitted on watermark expiry\n\n```\n" +
        baos.toString("UTF-8").trim + "\n```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), sb.toString)
    println(s"wrote PLANS.md (${Headline.size + 1} plans)")
    spark.stop()
  }
}
