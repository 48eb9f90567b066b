package graft

import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Exhaustive inventory of SinglePartition (un-partitioned) windows across
  * the ENTIRE query registry. A global window moves its whole input to one
  * partition, so every occurrence must be over a provably bounded input —
  * a domain-bounded histogram, a k-row group table — never the fact table.
  * PlanAuditSpec pins a handful of these by name; this spec closes the
  * gap: it plans all registered queries, collects every window with an
  * empty partitionSpec, and demands the query appear in the whitelist
  * below WITH its bounded-input rationale. Both directions are asserted —
  * an unlisted global window fails (re-key it or justify it here), and a
  * stale whitelist entry whose window disappeared also fails (the list
  * stays exact, so the suite log's `WindowExec: No Partition Defined`
  * warning count is fully accounted for by these rationales).
  *
  * Scope note: the audit reads each query's pre-AQE physical plan
  * (`sparkPlan`). A window upstream of a `localCheckpoint` executes while
  * the DataFrame is being BUILT and is lineage-truncated out of the final
  * plan — building every query here (not just planning it) means those
  * subplans still ran under this spec's session, but their shape is pinned
  * by the per-query PlanAuditSpec tests, not this inventory.
  */
class GlobalWindowAuditSpec extends SparkSpec {

  /** query -> why its un-partitioned window input is bounded. */
  private val boundedGlobalWindows: Map[String, String] = Map(
    // ---- rank/inference family: cumulative ranks over DOMAIN-BOUNDED
    // value histograms (one row per centi-unit value cell, <=49k cells
    // for the events value range — never a sort of the fact table)
    "q_mann_whitney" -> "doubled mid-ranks over the centi-value histogram (<=49k cells)",
    "q_kruskal_wallis" -> "global mid-ranks over the centi-value histogram (<=49k cells)",
    "q_wilcoxon_signed_rank" -> "|d| ranks over the per-user difference histogram (user-dimension bound)",
    "q_ks_test" -> "cumulative CDF diff over the centi-value histogram (<=49k cells)",
    // ---- ML-eval family: cumulative windows over the SCORE histogram
    // (one row per distinct quantized score, score-domain bound)
    "q_auc_roc" -> "rank-sum over the quantized score histogram",
    "q_pr_auc" -> "precision/recall steps over the distinct-score spine",
    "q_youden_threshold" -> "TPR/FPR sweep over the distinct-score spine",
    "q_lift_gain" -> "cumulative positives over the score histogram, then a 10-row decile table",
    // ---- sketch/calibration family
    "q_quantile_sketch" -> "cumulative counts over log-bucket sketch cells (fixed bucket count)",
    "q_quantile_normalize" -> "cumulative histogram over distinct n_chars values (value-domain bound)",
    "q_conversion_latency" -> "cumulative counts over log2 latency buckets (<=64 buckets)",
    "q_kaplan_meier" -> "survival product over the distinct-duration table (duration-domain bound)",
    "q_seasonal_decompose" -> "trend/seasonal windows over the month grid (<=#months rows)",
    // ---- small derived group tables (k rows by construction)
    "q_cumulative_users" -> "running sum over the per-month firsts table (<=#months rows)",
    "q_repeat_curve" -> "curve over the orders-per-customer histogram (small multiplicity domain)",
    "q_audience_overlap" -> "rank windows over the segment-pair matrix (<=|segments|^2 rows)",
    "q_id_gaps" -> "lead over per-bucket boundary rows (<=5 keys x bucket grid)",
    "q_largest_remainder" -> "remainder ranking over the k-row allocation table",
    "q_skyline" -> "cumulative min over the per-size group table (size-domain bound)",
    "q_grid_hotspots" -> "neighbor offsets over aggregated grid cells (raster-bounded)",
    "q_pmi_bigrams" -> "top-k rank over the df-capped bigram score table",
    // ---- catalog domain: per-track frame assembly over catalog geometry
    // rows (k-row per-track tables, not a fact table)
    "q_catalog_build" -> "frame indexing over per-track burst rows (catalog-bounded)",
    "q_catalog_frames_meta" -> "frame indexing over per-track burst rows (catalog-bounded)"
  )

  test("every global window in the 301-query registry is whitelisted with a rationale") {
    val found = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
      val globals = df.queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
        case g: WindowGroupLimitExec if g.partitionSpec.isEmpty => g.nodeName
      }
      if (globals.nonEmpty) Some(name) else None
    }.toSet
    val listed = boundedGlobalWindows.keySet
    val unlisted = (found -- listed).toSeq.sorted
    val stale = (listed -- found).toSeq.sorted
    assert(unlisted.isEmpty,
      s"queries plan a SinglePartition window but carry no bounded-input " +
        s"rationale: $unlisted — re-key the window onto a partition column " +
        "or add the query to the whitelist with why its input is bounded")
    assert(stale.isEmpty,
      s"stale whitelist entries (plan no longer has a global window): $stale")
  }
}
