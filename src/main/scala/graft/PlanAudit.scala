package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{ElementAt, HigherOrderFunction}
import org.apache.spark.sql.execution.{CollectLimitExec, FileSourceScanExec, FilterExec, GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Physical-plan audit over the whole query surface. Counts parquet scans,
  * join strategies, cartesian products, Filters whose condition embeds a
  * higher-order array function, and unbounded single-partition windows,
  * per query; fails (nonzero exit) on plan regressions. Output is the
  * source of PLANS.md.
  *
  * Tree-based, not string-based: the audit walks the EXECUTED SparkPlan
  * (descending into finalized AQE stages) so that a cached subtree
  * (InMemoryTableScan prints its build plan, inflating any textual "Scan
  * parquet" count) or a renamed operator cannot skew the numbers, and the
  * HOF rule inspects real Catalyst expression nodes instead of matching
  * printed names.
  *
  * The HOF-in-Filter rule exists because PushDownPredicate inlines a
  * projection's array expression into a pushed filter, re-evaluating the
  * whole upstream transform per array element — the trap that produced
  * 22x regressions twice (TextOps round 1, Dedup.winnowFingerprints
  * round 2).  Guard inside the projection with when/otherwise instead.
  *
  * The global-window rule (round-10 ask): a WindowExec with NO partition
  * spec moves its whole input to one partition — fine when that input is
  * aggregate-bounded (a vocabulary rank over Heaps-law-bounded distinct
  * terms, a quantile probe over nBins histogram cells), fatal when a
  * refactor lets corpus-cardinality rows reach it. The gate requires
  * every single-partition WindowExec to sit above a cardinality boundary
  * (an aggregation, a TakeOrderedAndProject — the shape
  * `Vocab.rankVocab`'s limit compiles to — or a global limit) within the
  * same executed plan; anything else is a regression. This is also what
  * adjudicates the bench log's recurring "No Partition Defined" WARN as
  * benign — the warning-emitting windows are exactly the gated ones.
  *
  * EAGER-LOOP COVERAGE (round-10 ask; this was the audit's documented
  * blind spot): operators that execute work DURING query construction —
  * pageRank's checkpointed iterations, connectedComponents' label loop,
  * BPE's merge loop, VersionedTable commits, model fits — never surface
  * that work in the returned frame's plan, which sees only the
  * post-materialization RDD scan. A QueryExecutionListener registered
  * for the audit run now captures EVERY Dataset action's QueryExecution
  * (eager checkpoints, collects, writes; lazy `localCheckpoint(false)`
  * barriers also fire the listener at RDD-build time). Round-11's
  * suspected pre-AQE gap — lazy barriers audited from initial plans —
  * was probed directly in round 12 and REFUTED: localCheckpoint(false)
  * builds its RDD via toRdd, and AdaptiveSparkPlanExec finalizes every
  * query stage inside doExecute, so the captured QueryExecution is
  * already isFinalPlan=true at listener time (PlanAuditSpec pins this
  * with a static-SMJ/AQE-broadcast divergence). The audit of each
  * captured execution is additionally DEFERRED to after the owning
  * query's main plan has executed — belt-and-braces so any event that
  * ever IS captured pre-finalization still gets walked in its final
  * adaptive form. All gates run per captured execution with their own
  * allowance maps, and PLANS.md carries an inner-executions sub-table.
  * The listener bus is drained after each query (GraftBusBridge) so
  * attribution cannot bleed across queries.
  *
  * Usage: sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {

  final case class Counts(
      scans: Int,
      bcastJoins: Int,
      smj: Int,
      cartesian: Int,
      hofFilters: Int,
      bnlj: Int,
      windowGroupLimits: Int,
      unboundedGlobalWindows: Int)

  /** All plan nodes reachable from `p`, descending through AQE wrappers
    * (AdaptiveSparkPlanExec and QueryStageExec are leaf-like nodes hiding
    * their real subplans) but NOT into ReusedExchange (that subtree is
    * counted once at its original site) and not into cached-relation build
    * plans (steady-state I/O is what the audit measures).
    */
  private def walk(p: SparkPlan): Seq[SparkPlan] = {
    val below = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _: ReusedExchangeExec => Nil
      case other => other.children
    }
    p +: below.flatMap(walk)
  }

  /** True when a Filter condition embeds a lambda higher-order function or
    * element_at — per-element re-evaluation of an inlined array expression.
    */
  private def hofFilter(f: FilterExec): Boolean =
    f.condition.exists {
      case _: HigherOrderFunction => true
      case _: ElementAt => true
      case _ => false
    }

  /** A node that bounds downstream cardinality to group/limit space — what
    * a single-partition window must sit above to be scale-legal.
    */
  private def cardinalityBoundary(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => true
    case _: TakeOrderedAndProjectExec => true
    case _: GlobalLimitExec => true
    case _: CollectLimitExec => true
    case _ => false
  }

  /** Like [[walk]], but FOLLOWS ReusedExchange to its original subtree:
    * the boundary search is about what exists on the window's input
    * lineage, not about counting operators once — x97's second global
    * window reads the SAME single-partition exchange through a
    * ReusedExchange, and the aggregate proving its input bounded lives
    * below the original site.
    */
  private def walkThroughReuse(p: SparkPlan): Seq[SparkPlan] = {
    val below = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case other => other.children
    }
    p +: below.flatMap(walkThroughReuse)
  }

  /** Audit an already-executed plan tree. */
  def audit(plan: SparkPlan): Counts = {
    val nodes = walk(plan)
    val unboundedGlobal = nodes.count {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        !walkThroughReuse(w.child).exists(cardinalityBoundary)
      case _ => false
    }
    Counts(
      scans = nodes.count(_.isInstanceOf[FileSourceScanExec]),
      bcastJoins = nodes.count(n =>
        n.isInstanceOf[BroadcastHashJoinExec] || n.isInstanceOf[BroadcastNestedLoopJoinExec]),
      smj = nodes.count(_.isInstanceOf[SortMergeJoinExec]),
      cartesian = nodes.count(_.isInstanceOf[CartesianProductExec]),
      hofFilters = nodes.collect { case f: FilterExec if hofFilter(f) => f }.size,
      bnlj = nodes.count(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      windowGroupLimits = nodes.count(_.isInstanceOf[WindowGroupLimitExec]),
      unboundedGlobalWindows = unboundedGlobal)
  }

  /** Execute the query (finalizing AQE) and audit the executed plan.
    *
    * Executes df's OWN QueryExecution via toRdd — df.count() would spawn a
    * separate QueryExecution (groupBy().count()), leaving this one's
    * AdaptiveSparkPlanExec un-executed so the walk would see only the
    * static pre-execution plan and miss runtime AQE changes (join
    * demotions, runtime exchange reuse). toRdd also fires NO listener
    * event, so the final plan is never double-counted as an inner
    * execution.
    */
  def auditExecuted(df: DataFrame): Counts = {
    df.queryExecution.toRdd.count()
    audit(df.queryExecution.executedPlan)
  }

  /** Sort-merge joins that are CORRECT, not regressions: every other query
    * joins fact-scale data against a BOUNDED side (percentages, model
    * coefficients, probe sets), where broadcast is the only right answer —
    * but x24's inverted-index self-join and shingle-intersection join pair
    * a corpus-scale table with ITSELF. No side is bounded at 100 TB, so a
    * shuffle join is the correct plan and forcing broadcast at fixture
    * scale would audit-pass a plan that cannot run at target scale. Any
    * count above the allowance still fails the gate.
    */
  private val AllowedSmj: Map[String, Int] = Map(
    "x24_jaccard_neardups" -> 2,
    // same documented inverted-index shape through the VersionedTable-
    // backed materialization path (plus the parquet re-read losing the
    // producing plan's partitioning, re-established by the join)
    "x24t_jaccard_table" -> 3,
    // asymmetric batch-vs-corpus variant of the same shape
    "x29_incremental_neardups" -> 2,
    // same shape over the shingle-BUCKETED postings table: the SMJs stay
    // (corpus-scale sides), but the bucketed scan feeds them without a
    // corpus exchange — BucketingSpec pins that plan property
    "x29b_incremental_bucketed" -> 2,
    // prefix-blocking self-join: both sides are the corpus title frame
    // (AQE may demote to broadcast at fixture scale; ceiling of 1)
    "x59_fuzzy_titles" -> 1,
    // the stream-cycle restatement runs the x29 shape on the deduped
    // batch — same corpus×corpus class (AQE may broadcast at fixture
    // scale; the pin is a ceiling)
    "s03_stream_corpus_cycle" -> 2,
    // bucketized interval join: events vs sessions — BOTH corpus-scale
    // (one session row per activity burst), so shuffle join is the
    // correct plan; AQE may still demote to broadcast at fixture scale
    "x55_interval_join" -> 1,
    // retention: events × per-user first-seen — both sides
    // user-cardinality at 100 TB, shuffle join correct (cohort sizes
    // stay a broadcast); funnel: one user-keyed join per later step
    // (step-event slice × per-user conversion table), same class
    "x67_retention_cohorts" -> 1,
    "x68_funnel" -> 2,
    // stream-stream interval join, batch restatement: view slice ×
    // purchase slice — both sides event-corpus-scale at 100 TB, shuffle
    // join correct (AQE may demote to broadcast at fixture scale)
    "s06_stream_join" -> 1,
    "s07_stream_left_join" -> 1,
    // per-doc encode aggregates × per-doc language picks — both sides
    // doc-cardinality at 100 TB, the x67 class
    "x104_oov_by_lang" -> 1,
    // PPJoin: shingle×df join, prefix-postings self-join, and the
    // candidate-docs semi-join feeding the (now candidate-bounded)
    // verify joins — every corpus-scale side is the x24 class; AQE may
    // demote some to broadcast at fixture scale (ceiling)
    "x106_ppjoin_neardups" -> 4,
    // x24's pair shape (2) + the docs × paired-docs membership join —
    // both sides doc-cardinality at 100 TB, the x67 class (ceiling;
    // AQE may broadcast the paired set at fixture scale)
    "x126_neardup_rate" -> 3,
    // the x29 batch-vs-corpus shape over the %10 benchmark split (the
    // corpus side is never bounded; the benchmark postings may
    // broadcast at fixture scale — ceiling)
    "x127_fuzzy_decontam" -> 2)

  /** BroadcastNestedLoopJoins that are INTENTIONAL, pinned at their
    * audited counts. Two legitimate classes only:
    * (a) a crossJoin against a BOUNDED 1-row totals/denominator frame
    *     (mixWeights' normalizer, o36's summary totals, the drift guards)
    *     — a broadcast of one row is scale-independent;
    * (b) the documented exhaustive scoring baselines
    *     (`corpus.crossJoin(broadcast(probes))` in bruteForce/ADC/IVF
    *     assignment) — every (candidate, probe) pair IS the semantics.
    * Anywhere else — or any count ABOVE the pin — a BNLJ means a join
    * condition accidentally became non-equi: Spark demotes a broadcastable
    * non-equi join to BNLJ, not CartesianProduct, so the cartesian gate
    * alone cannot see this class.
    */
  private val AllowedBnlj: Map[String, Int] = Map(
    "f02_forecast_serving" -> 3, "o15_null_validation" -> 1,
    "o22_percentages" -> 1, "o24_fallback_chain" -> 3,
    "o26_move_type_validation" -> 1, "o31_monthly_avg" -> 1,
    "o35_count" -> 1, "o36_forecast_summary" -> 3,
    "o42_forecast_daily" -> 3, "o43_comments" -> 3,
    "x09_topk_cosine" -> 1, "x14_ivf_topk" -> 2,
    // class (b): the cluster profile's corpus × broadcast(centroids)
    // exhaustive assignment argmax (the x14 class)
    "x124_cluster_profile" -> 1,
    // class (b): the purity report replays the SAME assignment argmax
    // against the same committed centroids; everything downstream is
    // |cells|×|labels| bounded
    "x130_cluster_purity" -> 1,
    // class (b): the binary-ANN Hamming scan — packed corpus ×
    // broadcast(packed probes); the packed side being 32× smaller than
    // the float corpus is the operator's point
    "x125_binary_ann" -> 1,
    // class (b) from the committed bit index: stored (vec_id, bits)
    // projection × broadcast(packed probes) — the 32×-reduced scan IS
    // the layout's point; rerank fetches are broadcast equi-joins
    "x125b_binary_ann_indexed" -> 1,
    // class (b): hard-negative mining's exhaustive anchors baseline
    "x73_hard_negatives" -> 1,
    // class (b) twice: x107 evaluates BOTH retrieval paths (exact +
    // int8-dequantized), each the documented corpus × broadcast(probes)
    // exhaustive baseline
    "x107_retrieval_metrics" -> 2,
    "x21_tfidf_topterms" -> 1, "x27_source_mix" -> 1,
    "x30_quantized_topk" -> 1, "x32_mix_weights" -> 1,
    "x36_resampled_corpus" -> 1, "x38_pq_topk" -> 1,
    "x39_unigram_logprob" -> 1, "x41_ivfpq_topk" -> 1,
    "x44_ppl_buckets" -> 1,
    // corpus x broadcast(benchmark-set) exhaustive decontam scoring —
    // class (b), the banned side is bounded by contract
    "x50_semantic_decontam" -> 1,
    // class (a): BM25's one-row (N, avgdl) collection-stats crossJoin —
    // inline aggregate in x62, the ledger-derived stats in x63/x77
    "x62_bm25_topk" -> 1, "x63_bm25_indexed" -> 1,
    "x77_bm25_appended" -> 1,
    // class (a): the z-key's one-row global-bounds crossJoin
    "x64_zorder_layout" -> 1,
    // class (a): the bigram LM's one-row (N, V) stats crossJoin
    "x65_bigram_logprob" -> 1,
    // class (a): PMI's one-row bigram-total crossJoin
    "x85_pmi_collocations" -> 1,
    // class (a): the skew report's one-row totals crossJoin
    "x88_key_skew" -> 1,
    // class (a): the source-pair enumeration — distinct sources
    // crossJoined with themselves under s_a < s_b. The source list is
    // bounded like a dimension (|sources|² pairs is the REPORT'S OWN
    // cardinality); everything corpus-scale folded into registers
    // before this join
    "x111_hll_overlap" -> 1,
    // class (a): the HLL reports' one-row exact-count crossJoin
    "x91_hll_cardinality" -> 1,
    "x92_hll_incremental" -> 1,
    // class (a) variant: the day-spine × register-table RANGE join of
    // x93's window merge — both sides bounded (|days| and days×m sketch
    // cells), the corpus itself folded before the join
    "x93_rolling_distinct" -> 1,
    // class (a) variant: the |probs| × ≤nBins probe cross of the
    // histogram-quantile estimate — both sides bounded cell-space frames
    "x97_hist_quantiles" -> 1,
    // class (a): the quota derivation's one-row weight-total crossJoin
    "x99_token_budget" -> 1,
    // class (a) twice: DSIR's totals frame is itself a 1-row crossJoin
    // of the two distributions' sums, and the log-ratio table crossJoins
    // it — both broadcast-one-row, the mixWeights class; the scoring
    // join and the top-k rejoin are broadcast equi-joins
    "x133_dsir_weights" -> 2,
    "x134_dsir_select" -> 2,
    // class (a) again: the resample stage's mixWeights normalizer — the
    // only BNLJ the composed curation chain's FINAL plan may contain
    // (upstream stages sit behind persist boundaries and are audited via
    // their standalone queries x33/x03/x25/x01/x24/x22)
    "x53_curation_pipeline" -> 1,
    // identical composed chain with the classifier gate (one extra
    // map-only projection — no new join shapes)
    "x57_curation_classified" -> 1)

  /** Queries whose top-k is REQUIRED to compile to WindowGroupLimitExec:
    * every ANN query (and the rank-capped text queries) bounds its
    * per-group candidate ranking with `filter(row_number().over(w) <= k)`,
    * which Spark 4's InferWindowGroupLimit rewrites into a group-limit
    * that keeps ~k rows per partition BEFORE the rank shuffle. Nothing
    * else pins that plan: a refactor that breaks the filter-over-window
    * pattern (renaming the rank column, filtering after a projection the
    * optimizer can't see through) silently reverts to
    * sort-every-candidate-per-probe. Pinned from the executed plans.
    */
  private val RequiredWindowGroupLimit: Set[String] = Set(
    "x09_topk_cosine", "x10_ann_lsh", "x14_ivf_topk", "x21_tfidf_topterms",
    "x30_quantized_topk", "x33_source_cap", "x38_pq_topk", "x41_ivfpq_topk",
    // trending's per-window top-k rank (Ingest.trendingTopK)
    "s04_trending",
    // hard-negative mining's per-anchor rank cap
    "x73_hard_negatives",
    // the A-ES per-group sample boundary (Splits.weightedSample)
    "x83_weighted_sample",
    // binary ANN: both cuts (Hamming pool, cosine rerank) are
    // filter-over-row_number — losing the rewrite re-sorts every
    // corpus row per probe; same for the committed-index layouts
    // (exhaustive and IVF-routed)
    "x125_binary_ann", "x125b_binary_ann_indexed", "x125c_binary_ann_ivf")
  // NOT pinned: x101's vocabulary rank cap. Its window is GLOBAL (no
  // partition key), and for that shape the optimizer fires a strictly
  // better rewrite than WindowGroupLimit: LimitPushDown turns the
  // rank-filter into TakeOrderedAndProject(limit=maxVocab) BELOW the
  // window — per-partition top-V + single merge of V rows, so the
  // single-partition window only ever sees maxVocab rows. The
  // global-window gate pins exactly that: the window must sit above a
  // TakeOrderedAndProject/aggregate boundary, so losing the rewrite
  // (full-vocab single-partition window) goes red here.

  /** The gate itself, factored so the per-stage audit (and its spec) can
    * run the same rules with stage-level allowances.
    */
  def violations(
      name: String,
      c: Counts,
      allowedSmj: Int,
      allowedBnlj: Int,
      requireWgl: Boolean): List[String] = {
    var bad = List.empty[String]
    if (c.cartesian > 0) bad ::= s"$name: cartesian product"
    if (c.bnlj > allowedBnlj)
      bad ::= s"$name: BroadcastNestedLoopJoin above allowance " +
        "(a join condition likely became non-equi — only the documented " +
        "exhaustive ADC/brute-force baselines may BNLJ)"
    if (c.smj > allowedSmj)
      bad ::= s"$name: sort-merge join (expected broadcast at this scale)"
    if (requireWgl && c.windowGroupLimits == 0)
      bad ::= s"$name: top-k lost its WindowGroupLimit " +
        "(filter-over-row_number no longer matches InferWindowGroupLimit; " +
        "the rank shuffle is back to sorting every candidate per probe)"
    if (c.hofFilters > 0)
      bad ::= s"$name: higher-order function inside a Filter condition " +
        "(pushed-down filter re-evaluates an inlined array expression per element — " +
        "guard inside the projection with when/otherwise instead; " +
        "this class caused 22x regressions twice: TextOps r1, winnowFingerprints r2)"
    if (c.unboundedGlobalWindows > 0)
      bad ::= s"$name: single-partition window over a non-aggregated input " +
        "(a global WindowExec must sit above an aggregation/TakeOrdered/limit " +
        "boundary or corpus-cardinality rows land on ONE partition — the " +
        "Vocab.rankVocab / Sketches.histQuantiles contract)"
    bad
  }

  /** Per-stage allowances for the composed curation pipeline's
    * lineage-cut stage audit (Curation.auditStages). near-dup SMJ:
    * corpus-frame joined with its own per-doc aggregates — both sides
    * corpus-scale at 100 TB, same class as the x24 allowance (AQE may
    * still demote to broadcast at fixture scale; the pin is a ceiling).
    * gates carries NO allowance anymore: the repetition signals moved
    * into the cap projection (per-row modal-bigram fold), so the stage
    * is a plain-attribute filter — a join reappearing there is a
    * regression. resample BNLJ 1: the 1-row mixWeights normalizer
    * crossJoin.
    */
  private[graft] val StageAllowedSmj: Map[String, Int] =
    Map("near_dup_pairs" -> 2, "near_dup_retention" -> 1, "decontam" -> 1)
  private[graft] val StageAllowedBnlj: Map[String, Int] = Map("resample" -> 1)
  /** Stages whose per-group top-k must keep its WindowGroupLimit. */
  private[graft] val StageRequiredWgl: Set[String] = Set("cap")

  /** Allowances for INNER executions — the eager/lazy barrier plans the
    * listener captures during query construction. Keyed by query name;
    * the ceiling applies PER captured execution (each barrier generation
    * / commit / collect is gated separately, so one iteration cannot
    * hide a regression inside another's allowance). Values pinned from
    * the executed shapes, with the scale rationale per entry. Lazy-
    * barrier captures carry FINAL adaptive plans (finalization happens
    * inside toRdd — probed round 12; the audit additionally defers its
    * walk to post-query as belt-and-braces), so the ceilings describe
    * the runtime join choice: AQE demotions at fixture scale can only
    * bring counts UNDER a ceiling, never add a shape the gate misses.
    */
  private[graft] val InnerAllowedSmj: Map[String, Int] = Map(
    // the streamed corpus cycle's foreachBatch runs the x29
    // batch-vs-corpus inverted-index shape behind its in-batch
    // localCheckpoint barriers — corpus-scale sides, the same class the
    // main table allows s03 (AQE may demote to broadcast at fixture
    // scale; the pin is a ceiling per captured execution)
    "s03s_stream_corpus_cycle_streamed" -> 2)
  private[graft] val InnerAllowedBnlj: Map[String, Int] = Map(
    // semdedup's materialized cell assignment: ivfAssign's
    // corpus × broadcast(centroids) exhaustive argmax (class (b), the
    // same shape the main table allows for x14/x30/x41) executes behind
    // the assignment barrier — x61 additionally commits it (command)
    "x34_semantic_dedup" -> 1,
    "x61_incremental_semdedup" -> 1,
    // the ppl-bucket scorer materializes unigramLogProb, whose one-row
    // (N, V) stats crossJoin (class (a)) sits inside the barrier
    "x44_ppl_buckets" -> 1,
    // the stage-rebuild pass materializes every curation stage
    // lineage-cut; the resample stage's one-row mixWeights normalizer
    // (class (a)) rides its barrier
    "x53/stages" -> 1,
    // round 16: the serving assembly queries materialize the dense
    // percentages frame once per query (percentagesCheckpointed), so the
    // |move types|-row dense cross (class (b) — the same bounded BNLJ
    // the main table allowed for these queries before the barrier moved
    // it inside) now executes behind that localCheckpoint
    "o12_forecast_no_move_type" -> 1,
    "o24_fallback_chain" -> 1,
    "o36_forecast_summary" -> 1,
    "o42_forecast_daily" -> 1,
    "o43_comments" -> 1,
    "f02_forecast_serving" -> 1,
    // x125c's two bounded class-(b) crosses both execute as INNER
    // plans: the probe→cell routing collect (|probes| × |cells|
    // centroid argmax, the x14 shape) and the index-build commit
    // (ivfAssign's corpus × broadcast(centroids) argmax, the x61
    // command shape); the SERVED plan itself has no cross — the cell
    // equi-join replacing x125b's exhaustive BNLJ is the operator's
    // point
    "x125c_binary_ann_ivf" -> 1)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate(s"local[8]")
    var bad = List.empty[String]

    // ---- inner-execution capture (see class scaladoc): every Dataset
    // action fired during query construction lands here, attributed to
    // the query under audit; the bus drain after each query makes the
    // attribution exact.
    //
    // DEFERRED audit (round-11 verdict ask #2): the listener captures the
    // QueryExecution itself and the walk runs after the owning query's
    // main plan has executed. Probing showed the suspected pre-AQE gap
    // does not actually exist — lazy localCheckpoint(false) finalizes its
    // AQE stages inside toRdd, so events arrive isFinalPlan=true (see the
    // class doc + PlanAuditSpec pin) — but deferring costs nothing and
    // guards any capture that ever does arrive pre-finalization
    // (AdaptiveSparkPlanExec.executedPlan reflects finalized stages on
    // re-read). A barrier the query path never materializes still audits
    // as its initial plan — same coverage as before, never less.
    val pending =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, String, org.apache.spark.sql.execution.QueryExecution)]()
    val inner = scala.collection.mutable.ListBuffer.empty[(String, String, Counts)]
    @volatile var current = "(setup)"
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        pending.add((current, funcName, qe))
      override def onFailure(
          funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    def drain(): Unit = {
      try org.apache.spark.GraftBusBridge.drain(spark.sparkContext)
      catch { case e: Exception => System.err.println(s"[plan-audit] bus drain: $e") }
      // audit the captured executions NOW (post-materialization, final
      // adaptive plans) and release the QE references — holding 160
      // queries' worth of QueryExecutions would pin their plans in memory
      var next = pending.poll()
      while (next != null) {
        val (q, act, qe) = next
        try inner += ((q, act, audit(qe.executedPlan)))
        catch {
          case e: Throwable =>
            System.err.println(s"[plan-audit] inner-audit error on $q/$act: $e")
        }
        next = pending.poll()
      }
    }

    println("| query | parquet scans | broadcast joins | sort-merge joins | cartesian | HOF-in-filter | BNLJ | window group limits | unbounded global windows |")
    println("|---|---|---|---|---|---|---|---|---|")
    def auditRow(name: String, df: DataFrame, smj: Int, bnlj: Int, wgl: Boolean): Unit = {
      val c = auditExecuted(df)
      println(s"| $name | ${c.scans} | ${c.bcastJoins} | ${c.smj} | ${c.cartesian} | ${c.hofFilters} | ${c.bnlj} | ${c.windowGroupLimits} | ${c.unboundedGlobalWindows} |")
      bad :::= violations(name, c, smj, bnlj, wgl)
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      current = name
      auditRow(
        name, fn(spark, dir),
        AllowedSmj.getOrElse(name, 0), AllowedBnlj.getOrElse(name, 0),
        RequiredWindowGroupLimit.contains(name))
      drain()
    }
    // Per-stage audit of the composed curation pipeline: each stage
    // rebuilt lineage-cut (Curation.auditStages) so the stage's own
    // operators are visible — the composed x53/x57 rows above audit only
    // the final plan behind the persist boundaries. Drop every cache the
    // query loop left first: x53/x57's persisted frames share analyzed
    // plans with the stage frames, and the cacheManager would otherwise
    // substitute InMemoryTableScans for the very operators this audit
    // exists to see (stage 1 audited as a bare cache read, hiding its
    // window — caught when the WGL pin fired on a cached plan).
    current = "x53/stages"
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    spark.sharedState.cacheManager.clearCache()
    val docs = graft.sources.Tables.documents(spark, dir)
    graft.operators.Curation
      .auditStages(docs, banned = docs.filter(org.apache.spark.sql.functions.col("doc_id") < 50))
      .foreach { case (stage, df) =>
        current = s"x53/$stage"
        auditRow(
          s"x53/$stage", df,
          StageAllowedSmj.getOrElse(stage, 0), StageAllowedBnlj.getOrElse(stage, 0),
          StageRequiredWgl.contains(stage))
        drain()
      }
    drain()

    // ---- inner-executions sub-table + gates. One row per (query,
    // action-kind) with execution count and PER-EXECUTION MAX of each
    // counter — the loop shapes the main table structurally cannot see.
    val byQuery = inner.toList.groupBy(t => (t._1, t._2)).toSeq.sortBy(q => (q._1._1, q._1._2))
    println()
    println("| inner executions (query / action) | execs | max scans | max bcast | max smj | max cartesian | max HOF | max BNLJ | max unbounded global windows |")
    println("|---|---|---|---|---|---|---|---|---|")
    byQuery.foreach { case ((q, act), execs) =>
      val cs = execs.map(_._3)
      println(s"| $q / $act | ${cs.size} | ${cs.map(_.scans).max} | ${cs.map(_.bcastJoins).max} | " +
        s"${cs.map(_.smj).max} | ${cs.map(_.cartesian).max} | ${cs.map(_.hofFilters).max} | " +
        s"${cs.map(_.bnlj).max} | ${cs.map(_.unboundedGlobalWindows).max} |")
    }
    inner.foreach { case (q, act, c) =>
      val tag = s"$q[inner:$act]"
      if (c.cartesian > 0) bad ::= s"$tag: cartesian product in an internal execution"
      if (c.hofFilters > 0)
        bad ::= s"$tag: higher-order function inside a Filter condition (internal execution)"
      if (c.smj > InnerAllowedSmj.getOrElse(q, 0))
        bad ::= s"$tag: sort-merge join above the inner allowance " +
          s"(${c.smj} > ${InnerAllowedSmj.getOrElse(q, 0)})"
      if (c.bnlj > InnerAllowedBnlj.getOrElse(q, 0))
        bad ::= s"$tag: BroadcastNestedLoopJoin above the inner allowance " +
          s"(${c.bnlj} > ${InnerAllowedBnlj.getOrElse(q, 0)})"
      if (c.unboundedGlobalWindows > 0)
        bad ::= s"$tag: single-partition window over a non-aggregated input (internal execution)"
    }
    spark.stop()
    bad.foreach(b => System.err.println(s"[plan-audit] REGRESSION: $b"))
    if (bad.nonEmpty) sys.exit(1)
  }
}
