package graft

import org.apache.spark.sql.SparkSession

/** Prints physical-plan evidence for the scale-design claims in SCALE.md:
  * filter/column pushdown into parquet scans, broadcast joins on dims,
  * rank-limit pushdown, partial aggregation. Run:
  * runMain graft.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // plan-node toString truncates metadata (PushedFilters etc.) at 100
      // chars by default, which can hide the very filter an audit asserts
      .config("spark.sql.maxMetadataStringLength", "2000")
      // the SQL-surface queries (time travel, CTAS, TVF) need the
      // injected parser/rules, same as Verify's session
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def auditDf(name: String, df: org.apache.spark.sql.DataFrame)(
        checks: (String, String => Boolean)*): Unit = {
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      checks.foreach { case (what, ok) =>
        println(f"[audit] $name%-22s ${if (ok(plan)) "OK  " else "MISS"} $what")
      }
    }
    def audit(name: String)(checks: (String, String => Boolean)*): Unit =
      auditDf(name, SparkEntry.queries(name)(spark, sf))(checks: _*)
    audit("q1_pricing")(
      "filter pushed to parquet scan" -> (_.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate")),
      "scan pruned to the 6 referenced columns" -> (p =>
        p.contains("FileScan parquet [l_quantity#") && !p.contains("l_orderkey")),
      "map-side partial aggregation" -> (p => p.contains("HashAggregate(keys=[l_returnflag") && "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_star_agg")(
      "all three dims broadcast" -> (p => "BroadcastHashJoin".r.findAllIn(p).length == 3),
      "no sort-merge join" -> (p => !p.contains("SortMergeJoin")))
    audit("q_topk_orders")(
      "rank limit pushed into shuffle (WindowGroupLimit)" -> (_.contains("WindowGroupLimit")))
    audit("q_anti_join_orders")(
      "anti join key-only on build side" -> (p => p.contains("LeftAnti")))
    audit("q_dim_customer")(
      "scan reads only the 3 projected columns" -> (_.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>")))
    audit("q_fact_enrich")(
      "dims broadcast, fact streams" -> (p => "BroadcastHashJoin".r.findAllIn(p).length == 2))
    audit("q_asof_join")(
      "single shuffle (one keyed sort window, no join node)" -> (p =>
        "ShuffleExchange|Exchange hashpartitioning".r.findAllIn(p).length <= 2 &&
          !p.contains("SortMergeJoin")))
    audit("q_sessionize")(
      "windows + final agg reuse one user_id partitioning" -> (p =>
        "hashpartitioning\\(user_id".r.findAllIn(p).length >= 1))
    audit("q_gopher_quality")(
      "pure projection: no shuffle at all" -> (p => !p.contains("Exchange")),
      "single parquet scan" -> (p => "FileScan parquet".r.findAllIn(p).length == 1))
    audit("q_split_assign")(
      "pure projection: no shuffle at all" -> (p => !p.contains("Exchange")))
    audit("q_pack_chunks")(
      "one shard-keyed shuffle only" -> (p =>
        "hashpartitioning\\(shard".r.findAllIn(p).length >= 1 &&
          "Exchange".r.findAllIn(p).length == 1))
    audit("q_bloom_join")(
      "bloom prefilter sits before the join" -> (p =>
        p.contains("bloom_might_contain") &&
          p.indexOf("bloom_might_contain", p.indexOf("Join")) > 0),
      "selective build side broadcast, no sort-merge join" -> (p =>
        p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin")))
    audit("q_decontaminate")(
      "benchmark shingles broadcast; corpus side never exchanges before the join" -> (p =>
        p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin")),
      "pair counts partially aggregated map-side" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_dedup_jaccard")(
      // df-capped direct enumeration: pair expansion happens inside shingle
      // buckets only — no join at all, let alone a quadratic one
      "no cartesian/broadcast-nested-loop pair generation" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")),
      "bucket pairing is aggregation, not a self-join" -> (p =>
        !p.contains("SortMergeJoin") && "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_embed_dup_pairs")(
      // the registered pairs query must be the blocked form: pairing is an
      // equi-join keyed on the IVF cell. (A broadcast NL join DOES appear —
      // the centroid assignment, bounded by nCells — so the discriminator
      // is the cell-keyed pair join, absent entirely from the O(n²) form.)
      "pairing is cell-keyed, not all-pairs" -> (p =>
        !p.contains("CartesianProduct") &&
          ("hashpartitioning\\(cell".r.findAllIn(p).nonEmpty ||
            p.contains("BroadcastHashJoin [cell"))))
    audit("q_embed_dup_pairs_lsh")(
      // the (t, b) key must actually appear in the pair join's partitioning
      // (or BHJ key list) — a regression to joining on t alone would still
      // be an equi-join, so contains("Join") alone proves nothing
      "pairing is (table, bucket)-keyed, never all-pairs" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin") &&
          ("hashpartitioning\\(t#\\d+, b#\\d+L".r.findAllIn(p).nonEmpty ||
            "BroadcastHashJoin \\[t#\\d+, b#\\d+L".r.findAllIn(p).nonEmpty)))
    // the public simhashPairs returns a checkpointed result (its executed
    // plan is just a cached-block scan), so audit the LAZY internal plan —
    // the one that actually contains the candidate join
    auditDf("q_dedup_simhash_pairs",
      graft.operators.Dedup.simhashPairsFrom(
        graft.operators.Dedup.packedSignatures(
          graft.sources.Tables.documents(spark, sf), "doc_id", "text"),
        maxHamming = 3, bands = 4))(
      "banded candidates via equi-join on (band, segment)" -> (p =>
        p.contains("Join") && !p.contains("CartesianProduct") &&
          !p.contains("BroadcastNestedLoopJoin")))
    // the public jaccardPairsAgainst returns a checkpointed result — audit
    // the lazy internal plan, where the join shape is visible
    locally {
      import org.apache.spark.sql.functions.col
      val docs = graft.sources.Tables.documents(spark, sf)
      auditDf("q_dedup_incremental",
        graft.operators.Dedup.pairsAgainstFrom(
          graft.operators.Dedup.shingleHashes(
            docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", 3),
          graft.operators.Dedup.shingleHashes(
            docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", 3),
          threshold = 0.7, maxShingleDf = 64))(
        "batch scored via shingle-keyed joins, never all-pairs" -> (p =>
          !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")),
        "corpus df cap is a semi-join (no corpus row duplication)" -> (p =>
          p.contains("LeftSemi")))
    }
    audit("q_bpe_pretokenize")(
      "pure projection: no shuffle at all" -> (p => !p.contains("Exchange")),
      "single parquet scan, pruned to doc_id+text" -> (p =>
        "FileScan parquet".r.findAllIn(p).length == 1 && !p.contains("lang")))
    audit("q_curate")(
      // the near-dup pair plan is consumed (and checkpointed) inside
      // Dedup.clusters before this plan runs; what remains must be keyed
      // hash joins + a map-side-combined language aggregate
      "no cartesian/broadcast-nested-loop anywhere" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")),
      "per-language totals partially aggregated map-side" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_embed_clusters")(
      "keep-list join is keyed, never all-pairs" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")))
    audit("q_ann_ivf_refined")(
      // probe/top-k windows partition by q_id; a regression of the
      // assignment argmax back to a rank window would show up as a window
      // spec over vec_id — assert that specifically, plus the struct-max
      "assignment argmax is an aggregate, not a rank window" -> (p =>
        !p.contains("windowspecdefinition(vec_id") && p.contains("max(")),
      "centroids broadcast at every iteration" -> (p =>
        "BroadcastNestedLoopJoin|BroadcastExchange".r.findAllIn(p).length >= 3))
    audit("q_ann_filtered")(
      "eligible id set meets candidates as a broadcast semi join" -> (p =>
        p.contains("BroadcastHashJoin") && p.contains("LeftSemi")),
      "both rank cuts stay WindowGroupLimit" -> (p =>
        "WindowGroupLimit".r.findAllIn(p).length >= 2))
    audit("q_ann_pq")(
      "codebooks and ADC lookup tables broadcast" -> (p =>
        "BroadcastExchange".r.findAllIn(p).length >= 2),
      "no all-pairs expansion anywhere" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")),
      "encode argmin is an aggregate, not a rank window" -> (p =>
        !p.contains("windowspecdefinition(vec_id, m") && p.contains("min(")),
      "ADC scores partially aggregated map-side" -> (p =>
        "HashAggregate|ObjectHashAggregate".r.findAllIn(p).length >= 2))
    audit("q_market_share")(
      "every dimension chain broadcast (4 BHJs), facts never broadcast" -> (p =>
        "BroadcastHashJoin".r.findAllIn(p).length >= 4),
      "exactly the one unavoidable big-fact shuffle join (lineitem x orders)" -> (p =>
        "SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length <= 1),
      "part filter pushed to the scan" -> (p =>
        p.contains("PushedFilters: [IsNotNull(p_type), EqualTo(p_type,PROMO)")),
      "share is one pass: a single aggregation, partials map-side" -> (p =>
        p.contains("partial_sum(CASE WHEN") &&
          "HashAggregate\\(keys=".r.findAllIn(p).length == 2))
    audit("q_funnel")(
      "step scans push their event_type filter to parquet" -> (p =>
        p.contains("EqualTo(event_type,click)") &&
          p.contains("EqualTo(event_type,purchase)")),
      "all sequencing work keys on user_id, partially aggregated map-side" -> (p =>
        "hashpartitioning\\(user_id".r.findAllIn(p).nonEmpty &&
          "HashAggregate\\(keys=\\[user_id".r.findAllIn(p).length >= 2 &&
          !p.contains("CartesianProduct")))
    audit("q_cohort_retention")(
      "distinct users collapse map-side before the day-pair shuffle" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 4 &&
          !p.contains("CartesianProduct")))
    audit("q_knn_graph")(
      // the corpus-sized probe side must meet cell membership in a
      // cell-KEYED equi-join (hash-shuffled, or BHJ'd by AQE at this sf —
      // either way keyed on cell); the only nested-loop joins allowed are
      // the nCells-bounded centroid broadcasts
      "probe/candidate pairing is cell-keyed, never all-pairs" -> (p =>
        !p.contains("CartesianProduct") &&
          ("hashpartitioning\\(cell".r.findAllIn(p).nonEmpty ||
            "BroadcastHashJoin \\[cell".r.findAllIn(p).nonEmpty)),
      "both rank cuts push into the shuffle (WindowGroupLimit x2)" -> (p =>
        "WindowGroupLimit".r.findAllIn(p).length >= 2))
    audit("q_lm_perplexity")(
      "doc-bigram multiplicity collapsed map-side before the model join" -> (p =>
        "HashAggregate\\(keys=\\[doc_id#\\d+L?, bg".r.findAllIn(p).length >= 2),
      "per-doc rollup partially aggregated map-side" -> (p =>
        "HashAggregate\\(keys=\\[doc_id#\\d+L?\\]".r.findAllIn(p).length >= 2),
      "the only unkeyed join is the broadcast 1-row vocabulary scalar" -> (p =>
        "BroadcastNestedLoopJoin".r.findAllIn(p).length <= 1 &&
          !p.contains("CartesianProduct")))
    audit("q_big_orders")(
      "per-order totals partially aggregated map-side" -> (p =>
        "HashAggregate\\(keys=\\[l_orderkey".r.findAllIn(p).length >= 2),
      "HAVING cut sits below the join-back (join above its aggregate child)" -> (p => {
        val j = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
          .findFirstMatchIn(p).map(_.start).getOrElse(-1)
        val a = p.indexOf("HashAggregate(keys=[l_orderkey")
        j >= 0 && a > j
      }),
      "no cartesian product" -> (p => !p.contains("CartesianProduct")))
    audit("q_above_avg_cust")(
      "scalar threshold rides a broadcast 1-row side, never a shuffle" -> (p =>
        p.contains("BroadcastNestedLoopJoin")),
      "urgent-order cut is an anti join" -> (p => p.contains("LeftAnti")),
      "priority filter pushed to the orders scan" -> (p =>
        p.contains("EqualTo(o_orderpriority,1-URGENT)")),
      "nation rollup partially aggregated map-side" -> (p =>
        "HashAggregate\\(keys=\\[c_nationkey".r.findAllIn(p).length >= 2))
    audit("q_ann_ivfpq")(
      "probe cut and lookup tables broadcast (never a shuffled corpus join)" -> (p =>
        "BroadcastExchange".r.findAllIn(p).length >= 3),
      "no all-pairs expansion anywhere" -> (p =>
        !p.contains("CartesianProduct")),
      "ADC scores partially aggregated map-side" -> (p =>
        "HashAggregate|ObjectHashAggregate".r.findAllIn(p).length >= 2))
    audit("q_time_window_avg")(
      "window keyed by user_id (never a single global sort group)" -> (p =>
        p.contains("windowspecdefinition(user_id")),
      "range frame, not a running rows frame over the whole table" -> (p =>
        p.toLowerCase.contains("rangeframe")))
    audit("q_unpivot")(
      "row-local Expand, no shuffle at all" -> (p =>
        p.contains("Expand") && !p.contains("Exchange")),
      "single parquet scan of only the 6 referenced columns" -> (p =>
        "FileScan parquet".r.findAllIn(p).length == 1 && !p.contains("l_shipdate")))
    audit("q_exists_subquery")(
      "EXISTS decorrelated to a semi join, NOT EXISTS to an anti join" -> (p =>
        p.contains("LeftSemi") && p.contains("LeftAnti")),
      "no per-row subquery execution (no nested scalar subquery node)" -> (p =>
        !p.contains("Subquery")),
      "orders sides are key-only filtered scans, never a cartesian" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")))
    audit("q_source_cap")(
      // the scaladoc's skew claim: row_number <= K must become a
      // WindowGroupLimit so each map task ships K rows per group, not the
      // group's whole population
      "rank limit pushed into the shuffle (WindowGroupLimit)" -> (p =>
        p.contains("WindowGroupLimit")))
    audit("q_global_shuffle")(
      "one shard-keyed exchange, no global sort" -> (p =>
        "Exchange".r.findAllIn(p).length == 1 && !p.contains("rangepartitioning")))
    audit("q_dedup_spans")(
      "never pairwise: keyed joins + aggregates only" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")),
      "gram stats partially aggregated map-side" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_dedup_spans_min")(
      "span-floor gating stays row-local (no extra exchange vs ungated)" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")))
    audit("q_html_strip")(
      "pure projection: no shuffle at all" -> (p => !p.contains("Exchange")))
    audit("q_quality_score")(
      "classifier scoring is one shuffle-free fold" -> (p =>
        !p.contains("Exchange") && !p.contains("Generate")))
    audit("q_profile")(
      // per-column single-distinct aggregates: each scan pruned to its one
      // column, no Expand row multiplication (the multi-distinct form
      // shipped C+1 copies of every row and measured 9x slower)
      "each column profiled from its own pruned scan" -> (p =>
        "FileScan parquet \\[l_quantity#".r.findAllIn(p).nonEmpty &&
          "FileScan parquet \\[l_tax#".r.findAllIn(p).nonEmpty),
      "no Expand row multiplication" -> (p => !p.contains("Expand")),
      "distinct counts partially aggregated map-side" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_histogram")(
      "bin counts partially aggregated map-side" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 2),
      "totalprice filter pushed to the scan" -> (p =>
        p.contains("PushedFilters: [IsNotNull(o_totalprice)")))
    audit("q_regional_revenue")(
      "supplier/nation/region side collapses to broadcasts" -> (p =>
        "BroadcastHashJoin".r.findAllIn(p).length >= 3),
      // at most: the fixture SF auto-broadcasts customer too, leaving one;
      // at 100 TB it is exactly two (lineitem ⋈ orders, + ⋈ customer)
      "at most the two unavoidable big-fact shuffle joins" -> (p =>
        "SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length <= 2),
      "order-year filter pushed to the orders scan" -> (p =>
        p.contains("GreaterThanOrEqual(o_orderdate")),
      "revenue partially aggregated map-side" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_top_unshipped")(
      "date filters pushed to both fact scans" -> (p =>
        p.contains("GreaterThan(l_shipdate") && p.contains("LessThan(o_orderdate")),
      "customer dim broadcast" -> (p => p.contains("BroadcastHashJoin")),
      "top-10 is TakeOrdered, not a single-partition sort" -> (p =>
        p.contains("TakeOrderedAndProject")))
    audit("q_keyword_search")(
      "term filter applied before the hit aggregation (no full token shuffle)" -> (p =>
        p.contains("LeftSemi")),
      "hit counts partially aggregated map-side" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_ngram_counts")(
      "top-k is TakeOrdered over the gram counts (per-partition heaps)" -> (p =>
        p.contains("TakeOrderedAndProject")),
      "gram counts partially aggregated map-side" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_inverted_index")(
      "one term-keyed aggregation builds the postings" -> (p =>
        "hashpartitioning\\(term".r.findAllIn(p).nonEmpty))
    audit("q_fuzzy_join")(
      "pairing is variant-hash-keyed, never all-pairs" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin") &&
          "hashpartitioning\\(vh#".r.findAllIn(p).nonEmpty))
    audit("q_fuzzy_join_k2")(
      "depth-2 pairing is variant-hash-keyed, never all-pairs" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin") &&
          "hashpartitioning\\(vh#".r.findAllIn(p).nonEmpty))
    audit("q_label_prop")(
      "vote argmax is an aggregate, not a rank window" -> (p =>
        !p.contains("windowspecdefinition") && p.contains("max(")),
      "vote counts partially aggregated map-side" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_ppr")(
      "personalized rank flow stays keyed, no cartesian" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")))
    audit("q_pagerank")(
      "rank flow is keyed equi-joins + aggregates, no cartesian" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")),
      "contribution gather partially aggregated map-side" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_grouping_sets")(
      "one Expand-based aggregation, partials map-side" -> (p =>
        p.contains("Expand") && "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_gap_fill")(
      "fill window is priority-keyed (no global sort)" -> (p =>
        "hashpartitioning\\(prio".r.findAllIn(p).nonEmpty),
      "grid join is keyed, never cartesian" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")))
    audit("q_window_dist")(
      // the one-pass form funneled the whole table through 5 reducers; the
      // two-pass form's table-sized sort is keyed by (priority, bucket) —
      // partitioning cardinality 5 × buckets ≥ shuffle parallelism
      "table-sized ranks keyed by (priority, range-bucket), never priority alone" -> (p =>
        "hashpartitioning\\(o_orderpriority#\\d+, _bkt".r.findAllIn(p).nonEmpty),
      "boundary and offset frames broadcast onto the fact" -> (p =>
        "BroadcastHashJoin".r.findAllIn(p).length >= 2),
      "no sort-merge join, no cartesian" -> (p =>
        !p.contains("SortMergeJoin") && !p.contains("CartesianProduct")))
    audit("q_search_indexed")(
      // matching happens on exploded postings (|terms| rows in-query; a
      // persisted index at scale), with a doc-id-only semi join back out
      "index-served hits return via a semi join" -> (p => p.contains("LeftSemi")),
      "hit counts partially aggregated map-side" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_phrase_search")(
      "row-local n-gram membership: no shuffle, no explode" -> (p =>
        !p.contains("Exchange") && !p.contains("Generate")))
    audit("q_bm25")(
      "df/corpus-stats sides broadcast, no sort-merge join" -> (p =>
        p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin")),
      "top-k is TakeOrdered (per-partition heaps)" -> (p =>
        p.contains("TakeOrderedAndProject")),
      "tf partially aggregated map-side" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_bm25_indexed")(
      "served via posting explode, top-k TakeOrdered" -> (p =>
        p.contains("Generate explode(postings") && p.contains("TakeOrderedAndProject")))
    audit("q_hybrid_search")(
      // the only nested-loop is the broadcast of the single query vector;
      // candidate lists are TakeOrdered-cut before the rank windows
      "no cartesian product anywhere" -> (p => !p.contains("CartesianProduct")),
      "candidate cuts via TakeOrdered" -> (p =>
        p.contains("TakeOrderedAndProject")))
    audit("q_temperature_mix")(
      // only strata-sized aggregates exchange; the corpus takes the rates
      // via broadcast and never shuffles itself
      "rates broadcast onto the corpus, no sort-merge join" -> (p =>
        p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin")),
      "stratum counts partially aggregated map-side" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 2))
    audit("q_order_dist")(
      // aggregate-first: orders collapses to one row per customer BEFORE
      // the outer join, so the join never sees the raw fact
      "per-customer counts partially aggregated map-side" -> (p =>
        "HashAggregate\\(keys=\\[o_custkey".r.findAllIn(p).length >= 2),
      "priority filter pushed to the orders scan" -> (p =>
        p.contains("Not(EqualTo(o_orderpriority,1-URGENT))")),
      "customer scan pruned to the join key only" -> (p =>
        p.contains("ReadSchema: struct<c_custkey:bigint>")),
      "no cartesian product" -> (p => !p.contains("CartesianProduct")))
    audit("q_small_qty_rev")(
      "brand filter pushed to the part scan" -> (p =>
        p.contains("EqualTo(p_brand,Brand#9)")),
      "brand cut broadcast into lineitem before any aggregation" -> (p =>
        "BroadcastHashJoin".r.findAllIn(p).length >= 2),
      "per-part stats partially aggregated map-side" -> (p =>
        "HashAggregate\\(keys=\\[l_partkey".r.findAllIn(p).length >= 2),
      "no sort-merge join, no cartesian" -> (p =>
        !p.contains("SortMergeJoin") && !p.contains("CartesianProduct")))
    audit("q_triangles")(
      "degree counts partially aggregated map-side" -> (p =>
        "HashAggregate\\(keys=\\[node".r.findAllIn(p).length >= 2),
      "wedge join keyed on the apex vertex" -> (p =>
        "hashpartitioning\\(a#".r.findAllIn(p).length >= 1),
      "closure is a semi join, never a third full join" -> (p =>
        p.contains("LeftSemi")),
      "no cartesian product" -> (p => !p.contains("CartesianProduct")))
    audit("q_late_exclusive")(
      "per-(order, supplier) flags partially aggregated map-side" -> (p =>
        "HashAggregate\\(keys=\\[l_orderkey#\\d+L?, l_suppkey".r.findAllIn(p).length >= 2),
      "exclusivity counts ride an orderkey-keyed window, never a global sort" -> (p =>
        p.contains("windowspecdefinition(l_orderkey")),
      "no second lineitem self-join (single fact scan)" -> (p =>
        "FileScan parquet.*l_orderkey".r.findAllIn(p).length <= 1 &&
          !p.contains("CartesianProduct")))
    audit("q_forecast_revenue")(
      "every predicate pushed into the lineitem scan" -> (p =>
        p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity)")),
      "no join, no wide shuffle (1-row aggregate only)" -> (p =>
        !p.contains("Join") && "Exchange".r.findAllIn(p).length <= 1),
      "scan pruned to the 4 predicate/measure columns" -> (p =>
        p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp>")))
    audit("q_nation_profit")(
      "part cut and supplier-nation chain broadcast" -> (p =>
        "BroadcastHashJoin".r.findAllIn(p).length >= 2),
      "single fact-fact shuffle join" -> (p =>
        "SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length <= 1),
      "profit partially aggregated map-side" -> (p =>
        "HashAggregate\\(keys=\\[n_name".r.findAllIn(p).length >= 2))
    audit("q_returned_top")(
      "returnflag and quarter pushed to the scans" -> (p =>
        p.contains("EqualTo(l_returnflag,R)") &&
          p.contains("GreaterThanOrEqual(o_orderdate")),
      "per-customer revenue aggregates BEFORE the dim joins" -> (p =>
        "HashAggregate\\(keys=\\[o_custkey".r.findAllIn(p).length >= 2),
      "rank cut is a TakeOrderedAndProject, never a global sort" -> (p =>
        p.contains("TakeOrderedAndProject")))
    audit("q_priority_count")(
      "EXISTS lowers to one left-semi join" -> (p =>
        p.contains("LeftSemi") && "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
          .findAllIn(p).length == 1),
      "order-date quarter pushed into the orders scan" -> (p =>
        p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate")),
      "priority rollup partially aggregated map-side" -> (p =>
        "HashAggregate\\(keys=\\[o_orderpriority".r.findAllIn(p).length >= 2))
    audit("q_nation_volume")(
      "nation-cut supplier and customer dims broadcast" -> (p =>
        "BroadcastHashJoin".r.findAllIn(p).length >= 2),
      "only the lineitem-orders join shuffles both sides" -> (p =>
        "SortMergeJoin|ShuffledHashJoin".r.findAllIn(p).length <= 1),
      "no cartesian product" -> (p => !p.contains("CartesianProduct")))
    audit("q_urgent_lines")(
      "ship-year pushed into the lineitem scan" -> (p =>
        p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate")),
      "lineitem scan pruned to 2 columns" -> (p =>
        p.contains("ReadSchema: struct<l_orderkey:bigint,l_linestatus:string")),
      "CASE sums partially aggregated map-side" -> (p =>
        "HashAggregate\\(keys=\\[l_linestatus".r.findAllIn(p).length >= 2))
    audit("q_promo_revenue")(
      "part dim broadcasts" -> (p => p.contains("BroadcastHashJoin")),
      "ship-month pushed into the lineitem scan" -> (p =>
        p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate")),
      "single-row result: no shuffle wider than the 1-row final agg" -> (p =>
        !p.contains("SortMergeJoin")))
    audit("q_bfs_hops")(
      "no cartesian anywhere in the hop chain" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")))
    // the registered query's final plan is a checkpoint union (lineage is
    // cut per hop BY DESIGN); the per-hop shape is audited on the actual
    // loop body, which bfsHop exposes
    locally {
      import org.apache.spark.sql.functions.{col, lit}
      val e = spark.range(100).select(col("id").as("src"), ((col("id") + 1) % 100).as("dst"))
      val f = spark.range(3).select(col("id").as("node"), lit(0).as("dist"))
      auditDf("q_bfs_hops(hop)", graft.operators.Graph.bfsHop(f, e, f.select(col("node"))))(
        "per-hop min-distances partially aggregated map-side" -> (p =>
          "HashAggregate\\(keys=\\[node".r.findAllIn(p).length >= 2),
        "visited-set cut is an anti join" -> (p => p.contains("LeftAnti")),
        "frontier meets edges in an equi-join, never a cartesian" -> (p =>
          !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")))
    }
    audit("q_lead_gap")(
      "single user-keyed window pass, one shuffle" -> (p =>
        "hashpartitioning\\(user_id".r.findAllIn(p).length >= 1 &&
          "Exchange".r.findAllIn(p).length <= 1),
      "events scan pruned to the 4 used columns" -> (p =>
        p.contains("ReadSchema: struct<event_id:bigint,ts:timestamp,user_id:bigint,event_type:string>")))
    audit("q_supplier_variety")(
      "part cut broadcasts into lineitem" -> (p => p.contains("BroadcastHashJoin")),
      "distinct suppliers via two-phase aggregate, no driver pair set" -> (p =>
        "HashAggregate".r.findAllIn(p).length >= 3),
      "lineitem scan pruned to the 2 join/agg columns" -> (p =>
        p.contains("ReadSchema: struct<l_partkey:bigint,l_suppkey:bigint>")))
    audit("q_top_supplier_ties")(
      "survivor set and 1-row max broadcast (no fact re-shuffle)" -> (p =>
        "BroadcastHashJoin".r.findAllIn(p).length >= 2),
      "per-supplier peak via map-side partials" -> (p =>
        "HashAggregate\\(keys=\\[l_suppkey".r.findAllIn(p).length >= 2),
      "lineitem scan pruned to the 3 used columns" -> (p =>
        p.contains("ReadSchema: struct<l_suppkey:bigint,l_quantity:") &&
          !p.contains("l_extendedprice")),
      "ship-quarter filter pushed to the scan" -> (p =>
        p.contains("PushedFilters: [IsNotNull(l_shipdate)")))
    audit("q_sql_time_travel")(
      // two small pinned snapshots of the same table: the self-join must
      // broadcast, never shuffle both sides
      "pinned-snapshot self-join broadcasts" -> (p =>
        p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin")),
      "no cartesian product" -> (p => !p.contains("CartesianProduct")))
    audit("q_sql_convert")(
      "order-key filter pushed into the converted table's parquet scan" -> (p =>
        p.contains("LessThanOrEqual(o_orderkey")),
      "no join, no wide shuffle (scan-shaped query)" -> (p =>
        !p.contains("Join")))
    audit("q_wap")(
      "published read is a plain pruned scan (no joins, no exchanges)" -> (p =>
        !p.contains("Join") && !p.contains("Exchange")))
    audit("q_sql_changes")(
      "change derivation never goes cartesian" -> (p =>
        !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin")))
    audit("q_cobucket_agg")(
      "keyed aggregate over the bucketed fact is storage-partitioned" -> (p =>
        p.contains("CoBucketAgg")),
      "zero exchange anywhere" -> (p => !p.contains("Exchange")))
    audit("q_cobucket_join")(
      "co-bucketed fact join plans storage-partitioned" -> (p =>
        p.contains("CoBucketJoin")),
      "no shuffle below the final aggregation (join is exchange-free)" -> (p =>
        !p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin")),
      "exactly the one exchange the 5-group aggregate needs" -> (p =>
        "Exchange".r.findAllIn(p).length <= 2))
    audit("q_cobucket_anti")(
      "co-bucketed ANTI join plans storage-partitioned" -> (p =>
        p.contains("CoBucketJoin")),
      "fully exchange-free (no shuffle, no broadcast, no SMJ)" -> (p =>
        !p.contains("Exchange") && !p.contains("SortMergeJoin") &&
          !p.contains("BroadcastHashJoin")))
    // the v1 relation plan shows pushed SOURCE filters; the hour-DIR
    // pruning they imply is require-gated INSIDE the fixture (opened==2
    // hour dirs) — reaching these checks means that gate held
    audit("q_hour_partition")(
      "ts range predicate pushed into the graft scan" -> (p =>
        p.contains("Scan graft.sources.GraftRelation") &&
          p.contains("GreaterThanOrEqual(ts,") && p.contains("LessThan(ts,")),
      "scan pruned to the 3 projected columns" -> (p =>
        p.contains("ReadSchema: struct<event_id:bigint,ts_hour:string,value:double>")))
    audit("q_sql_clone")(
      "the clone read is a plain graft scan, no extra nodes" -> (p =>
        p.contains("Scan graft.sources.GraftRelation") && !p.contains("Exchange")))
    audit("q_sql_tag")(
      "the tag-pinned read is a plain graft scan (resolution is metadata)" -> (p =>
        p.contains("Scan graft.sources.GraftRelation") &&
          !p.contains("Join") && !p.contains("Exchange")))
    audit("q_identity")(
      // the fixture reads through the Scala face (a direct parquet scan,
      // not a registered relation) — the claim is the same: no join, no
      // shuffle; id allocation cost lives entirely on the write side
      "the identity table reads as a plain scan (allocation is write-side)" -> (p =>
        p.contains("Scan parquet") && !p.contains("Join") &&
          !p.contains("Exchange")))
    audit("q_replace_where")(
      "the post-backfill read is scan-shaped (replace cost was write-side)" -> (p =>
        p.contains("Scan graft.sources.GraftRelation") &&
          !p.contains("Join") && !p.contains("Exchange")))
    audit("q_sql_branch")(
      "the published table reads as a plain graft scan (publish was metadata + moves)" -> (p =>
        p.contains("Scan graft.sources.GraftRelation") &&
          !p.contains("Join") && !p.contains("Exchange")))
    audit("q_sql_merge_mor")(
      // the query itself REQUIREs byte-identity of resident files (write
      // side); the read side must apply the deletion vectors as a
      // broadcast anti-join against the position set — never a shuffle of
      // the corpus
      "merge-on-read read path: DV positions applied as broadcast anti-join" -> (p =>
        p.contains("LeftAnti") && p.contains("BroadcastHashJoin")))
    audit("q_sql_merge_eq")(
      // the write side REQUIREs byte-identity + no position sidecar; the
      // read side applies the key set as an anti-join with the per-file
      // sequence lookup broadcast — never a corpus shuffle
      "equality-delete read path: key anti-join, broadcast sides" -> (p =>
        p.contains("LeftAnti") && p.contains("BroadcastHashJoin")))
    audit("q_sql_update_mor")(
      "merge-on-read read path: DV positions applied as broadcast anti-join" -> (p =>
        p.contains("LeftAnti") && p.contains("BroadcastHashJoin")))
    // per-rel equality-delete routing: one live entry + a post-entry
    // append — only the files sequenced BEFORE the entry may pay the
    // metadata scan + sequence lookup + key anti-join; the fresh files
    // keep the plain graft scan, unioned in beside the at-risk arm
    locally {
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files
        .createTempDirectory("audit_eqroute").toString + "/t"
      graft.sources.ManifestTable.overwrite(spark, dir,
        spark.range(1000).select(col("id"),
          (col("id") % 7).cast("long").as("v")), statsCols = Seq("id"))
      spark.conf.set("spark.graft.dml.mode", "eq")
      try graft.sources.ManifestTable.merge(spark, dir,
        spark.range(1).select(col("id"), lit(99L).as("v")),
        keys = Seq("id"), deleteKeys = Some(spark.range(2, 4).toDF("id")))
      finally spark.conf.unset("spark.graft.dml.mode")
      graft.sources.ManifestTable.append(spark, dir,
        spark.range(2000, 2100).select(col("id"), lit(0L).as("v")))
      auditDf("eqdel_per_rel_route",
        graft.sources.ManifestTable.read(spark, dir))(
        "post-entry files keep a plain arm beside the key anti-join" -> (p =>
          p.contains("Union") && p.contains("LeftAnti")),
        "one key anti-join, entry-scoped — never fleet-wide" -> (p =>
          "LeftAnti".r.findAllIn(p).length == 1))
      // the opt-in CDF compute across the same entry: the key-derived
      // delta is equi-join shaped (broadcast under the DV budget), never
      // an all-pairs expansion
      spark.conf.set("spark.graft.cdf.eqdels", "compute")
      try auditDf("eqdel_cdf_compute",
        graft.sources.ManifestTable.readChanges(spark, dir, 1L, 2L))(
        "key-derived deletes are joins, never cartesian" -> (p =>
          !p.contains("CartesianProduct") &&
            !p.contains("BroadcastNestedLoopJoin")),
        "the key side broadcasts under the DV budget" -> (p =>
          p.contains("BroadcastHashJoin")))
      finally spark.conf.unset("spark.graft.cdf.eqdels")
      // PER-ENTRY-SET routing (r15): a second entry after the append —
      // the mid-append files' arm must join ONLY the new entry's keys
      spark.conf.set("spark.graft.dml.mode", "eq")
      try graft.sources.ManifestTable.merge(spark, dir,
        spark.range(0).select(col("id"), lit(0L).as("v")),
        keys = Seq("id"), deleteKeys = Some(spark.range(2050, 2052).toDF("id")))
      finally spark.conf.unset("spark.graft.dml.mode")
      val Seq(en1, en2) = new java.io.File(dir, "_eqd").listFiles()
        .map(_.getName.takeWhile(_ != '-')).sorted.toSeq
      val esDf = graft.sources.ManifestTable.read(spark, dir)
      esDf.count()
      val esPlan = esDf.queryExecution.executedPlan.toString
      def sidecarScans(prefix: String): Int =
        ("_eqd/" + java.util.regex.Pattern.quote(prefix)).r
          .findAllIn(esPlan).length
      auditDf("eqdel_entry_set", esDf)(
        "two entry-suffix arms, each its own key anti-join" -> (p =>
          "LeftAnti".r.findAllIn(p).length == 2),
        "mid-append files join only the later entry's keys" -> (_ =>
          sidecarScans(en1) == 1 && sidecarScans(en2) == 2))
    }
    audit("q_write_cluster")(
      "the range predicate reaches the clustered scan" -> (p =>
        p.contains("Scan graft.sources.GraftRelation") &&
          p.contains("LessThanOrEqual(user_id")))
    // runtime file skipping on join keys (GraftRuntimeFilterRule): a
    // q_star_agg-shape join over a range-clustered graft fact with a
    // selective dim — the rule collects the dim's keys at plan time and
    // the fact scan opens STRICTLY FEWER files with identical results
    locally {
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files
        .createTempDirectory("audit_rtfilter").toString + "/t"
      graft.sources.ManifestTable.overwrite(spark, dir,
        spark.range(80000).select(col("id").as("order_id"),
          (col("id") % 97).as("amount"))
          .repartitionByRange(8, col("order_id")), statsCols = Seq("order_id"))
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW rt_fact USING graft OPTIONS (path '$dir')")
      spark.range(100, 140).select(col("id").as("k"), lit("hot").as("seg"))
        .createOrReplaceTempView("rt_dim")
      def q = spark.sql("SELECT d.seg, sum(f.amount) AS amt FROM rt_fact f " +
        "JOIN rt_dim d ON f.order_id = d.k GROUP BY d.seg")
      def relOf(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.collectFirst {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
              if lr.relation.isInstanceOf[graft.sources.GraftRelation] =>
            lr.relation.asInstanceOf[graft.sources.GraftRelation]
        }.get
      spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
      val baseDf = q
      val baseline = baseDf.collect().toSeq
      val baseFiles = relOf(baseDf).lastScanFileCount
      spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
      val prunedDf = q
      val seeded = prunedDf.queryExecution.optimizedPlan.exists {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.exists {
            case _: org.apache.spark.sql.catalyst.expressions.In => true
            case _: org.apache.spark.sql.catalyst.expressions.InSet => true
            case _ => false
          }
        case _ => false
      }
      val prunedRows = prunedDf.collect().toSeq
      val prunedFiles = relOf(prunedDf).lastScanFileCount
      spark.conf.unset("spark.graft.runtimeFilter.enabled")
      auditDf("runtime_file_skip", prunedDf)(
        "the dim's collected keys seed the fact scan (IN/InSet)" -> (_ => seeded),
        s"strictly fewer files opened ($prunedFiles of $baseFiles)" -> (_ =>
          baseFiles == 8 && prunedFiles >= 0 && prunedFiles < baseFiles),
        "results identical to the unseeded plan" -> (_ =>
          prunedRows.toSet == baseline.toSet))

      // r16: the SELECT DISTINCT dim-key derivation (grouping-only
      // Aggregate build) seeds too — r15's dead arm, now load-bearing
      def qd = spark.sql("SELECT f.order_id, f.amount FROM rt_fact f JOIN " +
        "(SELECT DISTINCT k FROM rt_dim WHERE k < 120) d ON f.order_id = d.k")
      val dDf = qd
      val dRows = dDf.collect().toSeq
      val dSeeded = dDf.queryExecution.optimizedPlan.exists {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.exists {
            case _: org.apache.spark.sql.catalyst.expressions.In => true
            case _: org.apache.spark.sql.catalyst.expressions.InSet => true
            case _ => false
          }
        case _ => false
      }
      auditDf("runtime_distinct_seed", dDf)(
        "a DISTINCT-derived build side seeds the probe" -> (_ => dSeeded),
        s"fewer files (${relOf(dDf).lastScanFileCount} of 8)" -> (_ =>
          relOf(dDf).lastScanFileCount >= 0 && relOf(dDf).lastScanFileCount < 8),
        "20 clustered keys, 20 rows" -> (_ => dRows.size == 20))

      // r16: one-key builds seed EXACTLY once (OptimizeIn rewrites the
      // 1-element In to EqualTo; the re-fire guard must recognize it or
      // the collect re-runs every fixpoint iteration and predicates stack)
      val oneDf = spark.sql("SELECT f.amount FROM rt_fact f JOIN " +
        "(SELECT 42 AS k) d ON f.order_id = d.k")
      oneDf.collect()
      val memberPreds = oneDf.queryExecution.optimizedPlan.collect {
        case fl: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          fl.condition.collect {
            case org.apache.spark.sql.catalyst.expressions.In(
              x: org.apache.spark.sql.catalyst.expressions.AttributeReference, _)
              if x.name == "order_id" => 1
            case org.apache.spark.sql.catalyst.expressions.InSet(
              x: org.apache.spark.sql.catalyst.expressions.AttributeReference, _)
              if x.name == "order_id" => 1
            case org.apache.spark.sql.catalyst.expressions.EqualTo(
              x: org.apache.spark.sql.catalyst.expressions.AttributeReference,
              _: org.apache.spark.sql.catalyst.expressions.Literal)
              if x.name == "order_id" => 1
          }.sum
      }.sum
      auditDf("runtime_one_key_seed", oneDf)(
        s"exactly one membership predicate on the key (got $memberPreds)" -> (_ =>
          memberPreds == 1))

      // r16: past the IN cap a BLOOM-backed key keeps a membership seed —
      // an UNCLUSTERED probe (all zone ranges overlap) still skips files
      {
        val bdir = java.nio.file.Files
          .createTempDirectory("audit_rtbloom").toString + "/t"
        graft.sources.ManifestTable.overwrite(spark, bdir,
          spark.range(2000).select(col("id"), (col("id") % 97).as("v"))
            .repartition(8, col("id") % 8), bloomCols = Seq("id"))
        spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW rtb_fact USING graft OPTIONS (path '$bdir')")
        spark.range(10000).select((col("id") * 8).as("k"))
          .createOrReplaceTempView("rtb_dim")
        def qb = spark.sql(
          "SELECT f.id, f.v FROM rtb_fact f JOIN rtb_dim d ON f.id = d.k")
        spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
        val bBase = qb.collect().toSeq
        spark.conf.set("spark.graft.runtimeFilter.enabled", "true")
        spark.conf.set("spark.graft.runtimeFilter.maxKeys", "1000")
        val bDf = qb
        val bRows = bDf.collect().toSeq
        val bFiles = relOf(bDf).lastScanFileCount
        spark.conf.unset("spark.graft.runtimeFilter.maxKeys")
        spark.conf.unset("spark.graft.runtimeFilter.enabled")
        auditDf("runtime_bloom_tier", bDf)(
          s"10k keys > maxKeys still membership-prune via Blooms ($bFiles of 8)" -> (_ =>
            bFiles >= 1 && bFiles <= 2),
          "zero false negatives (identical results)" -> (_ =>
            bRows.toSet == bBase.toSet))
      }

      // r17: DSv2 catalog reads land on the DSv1 GraftRelation — the
      // whole pruning surface (here: zone maps) fires for cat.ns.t names
      {
        val wh = java.nio.file.Files
          .createTempDirectory("audit_cat_wh").toString
        spark.conf.set("spark.sql.catalog.gaud", "graft.sources.GraftCatalog")
        spark.conf.set("spark.sql.catalog.gaud.warehouse", wh)
        spark.sql("CREATE NAMESPACE IF NOT EXISTS gaud.ns")
        spark.sql("""CREATE TABLE gaud.ns.clus USING graft
                    |OPTIONS (statscols 'id')
                    |AS SELECT /*+ REPARTITION_BY_RANGE(8, id) */ id, id % 7 AS g
                    |FROM range(8000)""".stripMargin)
        val cDf = spark.sql(
          "SELECT id FROM gaud.ns.clus WHERE id BETWEEN 100 AND 120")
        val cRows = cDf.collect().length
        val cFiles = relOf(cDf).lastScanFileCount
        auditDf("catalog_read_path", cDf)(
          "a catalog-qualified read is a GraftRelation scan" -> (_ =>
            cDf.queryExecution.optimizedPlan.exists {
              case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
                lr.relation.isInstanceOf[graft.sources.GraftRelation]
              case _ => false
            }),
          s"zone maps prune through the catalog name ($cFiles of 8)" -> (_ =>
            cRows == 21 && cFiles >= 1 && cFiles < 8))
      }

      // r17: runtime-filter PRE-JOB tier — a build side OVER the broadcast
      // threshold still file-skips: one bounded aggregation sizes its key
      // space, then membership seeds when NDV admits
      {
        val pfd = java.nio.file.Files
          .createTempDirectory("audit_rtpre").toString + "/t"
        graft.sources.ManifestTable.overwrite(spark, pfd,
          spark.range(80000).select(col("id"), (col("id") % 97).as("v"))
            .repartitionByRange(8, col("id")), statsCols = Seq("id"))
        spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW pre_fact USING graft OPTIONS (path '$pfd')")
        val pdd = java.nio.file.Files
          .createTempDirectory("audit_rtpre_dim").toString + "/t"
        graft.sources.ManifestTable.overwrite(spark, pdd,
          spark.range(200000).select((col("id") % 200 + 1000).as("k"),
            col("id").as("payload")))
        spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW pre_dim USING graft OPTIONS (path '$pdd')")
        def qp = spark.sql(
          "SELECT f.id, f.v FROM pre_fact f JOIN pre_dim d ON f.id = d.k")
        val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
        try {
          spark.conf.set("spark.graft.runtimeFilter.preJob.enabled", "false")
          val pBase = qp.collect().toSeq
          val pBaseFiles = relOf(qp).lastScanFileCount
          spark.conf.set("spark.graft.runtimeFilter.preJob.enabled", "true")
          val pDf = qp
          val pRows = pDf.collect().toSeq
          val pFiles = relOf(pDf).lastScanFileCount
          spark.conf.unset("spark.graft.runtimeFilter.preJob.enabled")
          auditDf("runtime_prejob", pDf)(
            s"an over-threshold 200k-row build still file-skips ($pFiles of $pBaseFiles)" -> (_ =>
              pBaseFiles == 8 && pFiles >= 1 && pFiles <= 2),
            "identical results with the pre-job on and off" -> (_ =>
              pRows.toSet == pBase.toSet))

          // r18: PAST-ALL-CAPS tier — a 40k-distinct-key build (over the
          // 32k membership cap) whose keys live in TWO bands still
          // file-skips via interval refinement, with a compact-Bloom
          // row-level probe and ZERO keys collected
          val odd = java.nio.file.Files
            .createTempDirectory("audit_rtovercap").toString + "/t"
          graft.sources.ManifestTable.overwrite(spark, odd,
            spark.range(200000).select(
              when(col("id") % 40000 < 20000, col("id") % 40000)
                .otherwise(col("id") % 40000 + 40000).as("k"),
              col("id").as("payload")))
          spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW overcap_dim USING graft OPTIONS (path '$odd')")
          def qo = spark.sql(
            "SELECT f.id, f.v FROM pre_fact f JOIN overcap_dim d ON f.id = d.k")
          spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
          val oBase = qo.count()
          val oBaseFiles = relOf(qo).lastScanFileCount
          spark.conf.unset("spark.graft.runtimeFilter.enabled")
          val oDf = qo
          val oRows = oDf.count()
          val oFiles = relOf(oDf).lastScanFileCount
          val oHasBloom = oDf.queryExecution.optimizedPlan.exists {
            case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
              f.condition.exists(_.isInstanceOf[
                org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain])
            case _ => false
          }
          val oHasOr = oDf.queryExecution.optimizedPlan.exists {
            case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
              f.condition.exists {
                case org.apache.spark.sql.catalyst.expressions.Or(_, _) => true
                case _ => false
              }
            case _ => false
          }
          auditDf("runtime_overcap", oDf)(
            s"two key bands past the 32k cap open only their regions ($oFiles of $oBaseFiles)" -> (_ =>
              oBaseFiles == 8 && oFiles >= 1 && oFiles <= 6),
            "the seed is an OR of region ranges plus a compact-Bloom probe" -> (_ =>
              oHasOr && oHasBloom),
            "identical results with the tier on and off" -> (_ =>
              oRows == oBase))
        } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      }

      // r16: generated-column predicate derivation — a raw variant-path
      // range predicate opens a strict subset of a clustered table's files
      {
        val gdir = java.nio.file.Files
          .createTempDirectory("audit_gen").toString + "/t"
        graft.sources.ManifestTable.overwrite(spark, gdir,
          spark.range(4000).select(col("id"),
            org.apache.spark.sql.functions.parse_json(concat(
              lit("{\"score\": "), (col("id") % 100).cast("string"),
              lit("}"))).as("props"))
            .repartitionByRange(8, col("id") % 100),
          statsCols = Seq("score"),
          generated = Map("score" -> "try_variant_get(props, '$.score', 'long')"))
        spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gen_fact USING graft OPTIONS (path '$gdir')")
        def qg = spark.sql("SELECT id FROM gen_fact " +
          "WHERE try_variant_get(props, '$.score', 'long') >= 90")
        spark.conf.set("spark.graft.generatedDerive.enabled", "false")
        val gBaseDf = qg
        val gBase = gBaseDf.collect().toSeq
        val gBaseFiles = relOf(gBaseDf).lastScanFileCount
        spark.conf.set("spark.graft.generatedDerive.enabled", "true")
        val gDf = qg
        val gRows = gDf.collect().toSeq
        val gFiles = relOf(gDf).lastScanFileCount
        spark.conf.unset("spark.graft.generatedDerive.enabled")
        auditDf("generated_derive", gDf)(
          s"variant-path predicate derives onto the stored column ($gFiles of $gBaseFiles files)" -> (_ =>
            gBaseFiles == 8 && gFiles >= 1 && gFiles < gBaseFiles),
          "results identical with and without derivation" -> (_ =>
            gRows.toSet == gBase.toSet))

        // r17: READ-PATH derivation — selecting/aggregating the declared
        // path substitutes the stored scalar: no per-row variant decode
        // in the optimized plan, and the variant column itself prunes
        // out of the scan (the ReadSchema judge check, DSv1-shaped)
        def qs = spark.sql(
          "SELECT id, try_variant_get(props, '$.score', 'long') AS sc " +
            "FROM gen_fact WHERE id < 400")
        spark.conf.set("spark.graft.generatedDerive.enabled", "false")
        val sBase = qs.collect().toSeq
        spark.conf.set("spark.graft.generatedDerive.enabled", "true")
        val sDf = qs
        val sRows = sDf.collect().toSeq
        spark.conf.unset("spark.graft.generatedDerive.enabled")
        val decodes = sDf.queryExecution.optimizedPlan.exists(
          _.expressions.exists(_.exists(
            _.getClass.getName.contains("VariantGet"))))
        // DSv1 pruning shows as REFERENCES: the relation always lists all
        // columns, but when nothing above names `props` the scan's
        // requiredColumns exclude it
        val variantRead = sDf.queryExecution.optimizedPlan.exists {
          case _: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            false
          case p => p.references.exists(_.name == "props")
        }
        auditDf("generated_read_path", sDf)(
          "no variant_get survives in the optimized plan of a declared-path SELECT" -> (_ =>
            !decodes),
          "the variant column pruned out of the scan projection" -> (_ =>
            !variantRead),
          "results identical with and without substitution" -> (_ =>
            sRows.toSet == sBase.toSet))
      }
    }
    spark.stop()
  }
}
