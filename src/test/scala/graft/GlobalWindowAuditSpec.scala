package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.apache.spark.sql.util.QueryExecutionListener

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
  * The audit covers BOTH plan surfaces: (1) each query's final pre-AQE
  * physical plan (`sparkPlan`), and (2) — closing the r12 scope note's
  * blind spot — every subplan that EXECUTES while a query is being built
  * (a window upstream of a `localCheckpoint`/`count`/`isEmpty` inside an
  * iterative helper runs at build time and is lineage-truncated out of the
  * final plan). Build-phase plans are captured with a
  * QueryExecutionListener registered for the duration of the build loop;
  * Dataset actions (checkpoint, count, isEmpty, collect) all route through
  * SQLExecution and fire it, and the forked test JVM runs suites
  * sequentially, so every captured execution belongs to the query being
  * built. Both inventories are two-way-asserted against their whitelists.
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
    "q_bh_fdr" -> "BH rank over the m-row p-value table (m = |event_type| vocabulary)",
    "q_bootstrap_ci" -> "CI order statistics over the <=200-row replicate-mean table",
    // ---- catalog domain: per-track frame assembly over catalog geometry
    // rows (k-row per-track tables, not a fact table)
    "q_catalog_build" -> "frame indexing over per-track burst rows (catalog-bounded)",
    "q_catalog_frames_meta" -> "frame indexing over per-track burst rows (catalog-bounded)",
    "q_hybrid_rrf" -> "per-leg rank over 50-row LIMIT-capped top-k sets (TakeOrdered precedes each window)"
  )

  /** query -> why the global window inside its BUILD-PHASE (checkpointed)
    * subplans is bounded. Separate from the final-plan whitelist: these
    * windows execute during DataFrame construction and never appear in
    * `sparkPlan`. */
  private val boundedBuildPhaseWindows: Map[String, String] = Map.empty

  /** Drain the async listener bus so every capture from the just-built
    * query is attributed before the next build starts. LiveListenerBus
    * .waitUntilEmpty is private[spark] — reflection, with a stability
    * poll as the fallback. */
  private def drainListenerBus(captured: => Int): Unit = {
    val drained =
      try {
        val bus = spark.sparkContext.getClass.getMethod("listenerBus")
          .invoke(spark.sparkContext)
        val m = bus.getClass.getMethods.find(m =>
          m.getName == "waitUntilEmpty" && m.getParameterCount <= 1).get
        if (m.getParameterCount == 0) m.invoke(bus)
        else m.invoke(bus, java.lang.Long.valueOf(30000L))
        true
      } catch { case _: Throwable => false }
    if (!drained) {
      var last = -1
      var stable = 0
      while (stable < 3) { // 3 consecutive 100 ms polls with no new events
        Thread.sleep(100)
        val now = captured
        if (now == last) stable += 1 else { stable = 0; last = now }
      }
    }
  }

  test("every global window in the full query registry is whitelisted with a rationale") {
    val buildPhase = scala.collection.mutable.Map.empty[String, Int]
    @volatile var currentQuery: String = ""
    @volatile var captures = 0
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        val globals = qe.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
          case g: WindowGroupLimitExec if g.partitionSpec.isEmpty => g.nodeName
        }
        if (globals.nonEmpty) buildPhase.synchronized {
          buildPhase(currentQuery) = buildPhase.getOrElse(currentQuery, 0) + globals.size
        }
        captures += 1
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val found =
      try {
        SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
          currentQuery = name
          val df = SparkEntry.queries(name)(spark, sf("sf0.001"))
          val globals = df.queryExecution.sparkPlan.collect {
            case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
            case g: WindowGroupLimitExec if g.partitionSpec.isEmpty => g.nodeName
          }
          drainListenerBus(captures)
          if (globals.nonEmpty) Some(name) else None
        }.toSet
      } finally spark.listenerManager.unregister(listener)

    val listed = boundedGlobalWindows.keySet
    val unlisted = (found -- listed).toSeq.sorted
    val stale = (listed -- found).toSeq.sorted
    assert(unlisted.isEmpty,
      s"queries plan a SinglePartition window but carry no bounded-input " +
        s"rationale: $unlisted — re-key the window onto a partition column " +
        "or add the query to the whitelist with why its input is bounded")
    assert(stale.isEmpty,
      s"stale whitelist entries (plan no longer has a global window): $stale")

    // anti-vacuity: the iterative operators (dedup clusters, graph
    // rounds, BPE merges) fire checkpoint/count actions while being
    // built — if nothing was captured, the listener wiring is broken and
    // the build-phase assertion below would pass for the wrong reason
    assert(captures >= 50,
      s"only $captures build-phase executions captured — the " +
        "QueryExecutionListener is not seeing the iterative builds")
    val foundBuild = buildPhase.synchronized(buildPhase.keySet.toSet)
    val listedBuild = boundedBuildPhaseWindows.keySet
    val unlistedBuild = (foundBuild -- listedBuild).toSeq.sorted
    val staleBuild = (listedBuild -- foundBuild).toSeq.sorted
    assert(unlistedBuild.isEmpty,
      s"queries EXECUTE a SinglePartition window inside a build-phase " +
        s"(checkpointed) subplan without a rationale: $unlistedBuild — " +
        "re-key it or add it to boundedBuildPhaseWindows with why its " +
        "input is bounded")
    assert(staleBuild.isEmpty,
      "stale build-phase whitelist entries (no global window executed " +
        s"during the build anymore): $staleBuild")
  }
}
