package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.Exchange
import graft.operators._

/** Plan-shape assertions for the §4 scale claims: filters/projection
  * reach the parquet scan, small dims broadcast, top-k avoids a global
  * sort, catalog aggregation is partial+final. These are the properties
  * that survive a 1000-executor 100 TB run — asserted, not assumed. */
class PlanSpec extends SparkSpec {

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** The physical plan with a top-level AdaptiveSparkPlanExec unwrapped:
    * `collect`/`collectLeaves` don't traverse INTO the adaptive node (its
    * inner plan is not a child), so tree-shape assertions must run on the
    * inner plan, not the wrapper. */
  private def physical(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  test("filter_pred: predicates are pushed to the parquet scan") {
    val plan = executedPlan(Relational.filterPred(spark, sf))
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("l_returnflag") && plan.contains("l_quantity"))
  }

  test("proj_basic: scan reads only the projected columns") {
    val df = Relational.projBasic(spark, sf)
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val scan = scans.find(_.contains("lineitem")).getOrElse(fail("no scan"))
    assert(scan.contains("ReadSchema"))
    // 11-column table; only the 5 needed columns may be read
    assert(!scan.contains("l_shipdate") && !scan.contains("l_returnflag"),
      scan.takeRight(500))
  }

  test("join_broadcast plans a BroadcastHashJoin, not a shuffle join") {
    val plan = executedPlan(Relational.joinBroadcast(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("join_semi/anti plan as semi/anti hash joins") {
    assert(executedPlan(Relational.joinSemi(spark, sf)).contains("LeftSemi"))
    assert(executedPlan(Relational.joinAnti(spark, sf)).contains("LeftAnti"))
  }

  test("join_theta: rank-count fold — no Join node survives") {
    // the output is a per-nation pair COUNT; enumerating the pairs grows
    // quadratically with scale (13.4× on 10× data before the rewrite).
    // The histogram+window fold computes the same relation join-free.
    val plan = executedPlan(Relational.joinTheta(spark, sf))
    assert(!plan.contains("Join"),
      "pair enumeration crept back into the count query:\n" + plan.take(2000))
    assert(plan.contains("Window"), plan.take(2000))
  }

  test("join_theta_pairs: band theta rides the nation equi-join, no nested loop") {
    val plan = executedPlan(Relational.joinThetaPairs(spark, sf))
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      "band predicate must post-filter an equi-join:\n" + plan.take(2000))
  }

  test("topk plans TakeOrderedAndProject (no global sort of the table)") {
    val plan = executedPlan(Relational.topk(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("agg_basic uses two-phase hash aggregation (partial + final)") {
    val plan = executedPlan(Relational.aggBasic(spark, sf))
    assert(plan.contains("HashAggregate"), plan.take(1500))
    assert("HashAggregate".r.findAllIn(plan).length >= 2)
  }

  test("agg_basic runs inside whole-stage codegen") {
    // AQE finalizes the plan only after execution — run it, then unwrap
    // the adaptive plan and inspect the final stages
    val df = Relational.aggBasic(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    // "*(n)" prefixes are the whole-stage-codegen stage markers in the
    // compact plan string (the long form spells out WholeStageCodegen)
    assert(plan.contains("*(1)"), plan.take(1500))
  }

  test("chunk_find: single scan, no shuffle before the filter") {
    val df = ChunkCatalog.chunkFind(spark, sf)
    // one aggregation shuffle (catalog build) + orderBy exchange at most
    val exchanges = df.queryExecution.executedPlan.collect { case e: Exchange => e }
    assert(exchanges.length <= 2, df.queryExecution.executedPlan.toString.take(2000))
  }

  test("approx distinct bounds: HLL estimates within 5% of exact") {
    Relational.aggApprox(spark, sf).collect().foreach { r =>
      assert(r.getLong(1) > 0, s"exact_parts must be positive: $r")
      assert(r.getBoolean(2), s"HLL++ estimate drifted >5% from exact: $r")
      assert(r.getBoolean(3), s"Datasketches estimate drifted >5% from exact: $r")
    }
  }

  test("win_rank: two-phase — corpus windows sort only the bucket prefix") {
    // the 6-column window and the rank prefix window must (a) share one
    // sort and (b) receive the bucket-PREFIX join output, not the bare
    // corpus: the prefix filter (bp >= min_bp after the broadcast keep
    // join) has to sit BELOW the price sort, otherwise the rewrite has
    // regressed to the 3-task full-partition sort it exists to kill
    val df = Relational.winRank(spark, sf)
    df.collect() // finalize AQE — AdaptiveSparkPlanExec is a leaf until run
    val finalPlan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    // exactly one sort carries the price order key (rank rides the
    // row_number window's sort) — counted on the plan STRING because
    // materialized stages hide behind QueryStageExec leaves
    val priceSorts = finalPlan.linesIterator
      .count(l => l.contains("Sort [") && l.contains("l_extendedprice"))
    assert(priceSorts == 1,
      s"the 6-column and prefix windows must share one sort, got $priceSorts:\n" +
        finalPlan.take(3000))
    // the prefix filter feeds that sort: min_bp (the broadcast keep
    // table's column) must appear in the plan as a join/filter input
    assert(finalPlan.contains("min_bp"),
      s"bucket-prefix filter missing — window sorts the full corpus:\n" +
        finalPlan.take(3000))
  }

  test("llm_dedup_chunk: chunk text crosses exactly 2 exchanges (no keep-join)") {
    // dedup window (key) + doc rollup (doc_id) — chunks assemble
    // MAP-SIDE (r19 chunkify: explode the chunk index, slice the token
    // array); the former words→chunks aggregate paid a 3rd full-text
    // exchange, and the first-aggregate+join-back shape before it a
    // 4th. A regression back to either fails here
    val df = graft.operators.TextOps.queries("llm_dedup_chunk")(spark, sf)
    df.collect()
    val finalPlan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(exchanges <= 2,
      s"expected ≤2 hash exchanges, got $exchanges:\n" + finalPlan.take(3000))
    // and none of them may carry the text twice: the key-partitioned
    // exchange must be the only one downstream of chunk_text's birth
    assert(!finalPlan.contains("SortMergeJoin"),
      "keep-decision must not be a join:\n" + finalPlan.take(3000))
  }

  test("llm_boilerplate: single scan — the repeat vote is a window, not a join-back") {
    // the two-branch form (aggregate boiler keys, broadcast-join back)
    // recomputed the explode+chunk assembly on both branches: two scans,
    // chunk text through the words→chunks exchange twice. A regression
    // back to it fails here
    val df = graft.operators.TextOps.queries("llm_boilerplate")(spark, sf)
    df.collect()
    val finalPlan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    val scans = "Scan parquet".r.findAllIn(finalPlan).length
    assert(scans == 1, s"expected 1 scan, got $scans:\n" + finalPlan.take(3000))
    assert(!finalPlan.contains("BroadcastHashJoin"),
      "repeat vote must be a window, not a join:\n" + finalPlan.take(3000))
  }

  test("ts_interpolate: all four window functions fuse into one Window operator") {
    // the doc comment's claim: pre (running last-observed) and post
    // (first-following) share (partitionBy user_id, orderBy bucket), so
    // Spark fuses all four window functions into ONE Window operator —
    // a second Window operator here means the specs diverged and the
    // grid is being re-sorted between them
    val df = graft.operators.Relational.tsInterpolate(spark, sf)
    df.collect()
    val finalPlan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    val windows = "Window \\[".r.findAllIn(finalPlan).length
    assert(windows == 1,
      s"expected 1 Window operator, got $windows:\n" + finalPlan.take(3000))
  }

  test("win_ewma: all eight lag columns fuse into one Window operator") {
    val df = graft.operators.Relational.winEwma(spark, sf)
    df.collect()
    val finalPlan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    val windows = "Window \\[".r.findAllIn(finalPlan).length
    assert(windows == 1,
      s"expected 1 Window operator, got $windows:\n" + finalPlan.take(3000))
  }

  test("sql_q17: correlated aggregate subqueries decorrelate into joins") {
    val plan = executedPlan(SqlQueries.queries("sql_q17")(spark, sf))
    // the per-part COUNT and SUM subqueries must rewrite to one aggregate
    // each, joined on l_partkey — a Subquery node surviving in the plan
    // would mean per-outer-row re-execution, which is wrong at any scale
    assert(!plan.contains("Subquery"), plan.take(2000))
    assert("HashAggregate".r.findAllIn(plan).length >= 4, plan.take(2000))
  }

  test("sql_q21: aggregate rewrite — one lineitem pass, no self semi/anti joins") {
    val df = SqlQueries.queries("sql_q21")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the r15-adjudicated failure mode was the decorrelated EXISTS /
    // NOT-EXISTS form: semi+anti SELF-joins carrying three full
    // lineitem passes through the shuffle (>48 GiB live at sf100).
    // The rewrite must show neither join type and exactly ONE scan of
    // the fact table — the per-supplier and per-order aggregates then
    // reuse the lineitem⋈orders partitioning on the order key.
    assert(!plan.contains("LeftSemi"), plan.take(2000))
    assert(!plan.contains("LeftAnti"), plan.take(2000))
    val lineitemScans = physical(df).collectLeaves()
      .count(_.toString.contains("lineitem"))
    assert(lineitemScans == 1, s"expected 1 lineitem scan, got $lineitemScans")
  }

  test("sql_q15: uncorrelated scalar subquery evaluates once, not per row") {
    val plan = executedPlan(SqlQueries.queries("sql_q15")(spark, sf))
    // the MAX-over-CTE appears as a one-shot Subquery feeding a filter;
    // more than one occurrence would mean the CTE body was re-planned
    assert("Subquery subquery".r.findAllIn(plan).length <= 2, plan.take(2000))
  }

  test("join_null_anti: both NOT INs plan as hash anti joins, not nested loops") {
    val df = SqlQueries.queries("join_null_anti")(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the null-aware NOT IN must still hash-join (Spark's single-column
    // null-aware anti join); a BroadcastNestedLoopJoin here is the
    // O(n·m) plan that dies at scale
    assert(!plan.contains("NestedLoop"), plan.take(3000))
    assert("LeftAnti".r.findAllIn(plan).length >= 2, plan.take(3000))
  }

  test("llm_fuzzy_join: deletion-key blocking plans as an equi-join, never O(n²)") {
    val df = TextOps.queries("llm_fuzzy_join")(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the whole point of SymSpell blocking is an equi-join on (hashed)
    // deletion keys; a cartesian/nested-loop here means the blocking
    // key was lost and the plan re-became the all-pairs scan that dies
    // at 100 TB.
    assert(!plan.contains("CartesianProduct"), plan.take(3000))
    assert(!plan.contains("NestedLoop"), plan.take(3000))
    // the CANDIDATE join (on the hashed deletion key "kh") must be
    // sort-merge specifically: not broadcast (both sides are the
    // corpus×keys expansion — 3× slower at sf0.1, impossible at
    // 100 TB) and not shuffle-hash (unspillable build map — OOM'd the
    // sf10 smoke run); sort-merge spills. Asserted PER JOIN KEY, not
    // globally: the shape is free to add auxiliary joins on other keys
    // (the r16 id-keyed fetch-back experiment did — measured slower,
    // reverted, see TextOps.fuzzyJoin's Scaladoc) as long as the kh
    // candidate join stays sort-merge. (A join-free grouped-lambda
    // variant measured 54.6 s vs 35.0 at sf10 in r12 — interpreted HOF
    // lambdas lose to the codegen'd join; see TextOps.fuzzyJoin.)
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val exec = physical(df)
    def keyNames(keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Seq[String] =
      keys.flatMap(_.references.map(_.name))
    val smjOnKh = exec.collect {
      case j: SortMergeJoinExec if keyNames(j.leftKeys).contains("kh") => j
    }
    assert(smjOnKh.nonEmpty, plan.take(3000))
    val hashJoinOnKh = exec.collect {
      case j: BroadcastHashJoinExec if keyNames(j.leftKeys).contains("kh") => j
      case j: ShuffledHashJoinExec if keyNames(j.leftKeys).contains("kh") => j
    }
    assert(hashJoinOnKh.isEmpty, plan.take(3000))
  }

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no query-name collisions across operator modules") {
    val modules: Seq[Map[String, Any]] = Seq(
      ChunkCatalog.queries, Relational.queries, ScalarFns.queries,
      Windows.queries, TextOps.queries, VectorOps.queries,
      Multimodal.queries, SqlQueries.queries, GraphOps.queries,
      graft.sources.Formats.queries)
    val total = modules.map(_.size).sum
    // Map ++ silently shadows duplicates — a collision would drop a query
    assert(SparkEntry.queries.size == total,
      s"merged=${SparkEntry.queries.size} sum=$total — duplicate names")
  }

  test("join_lateral: correlated LIMIT decorrelates into one window, no loop join") {
    // the LATERAL subquery's ORDER BY + LIMIT 2 must become a
    // row_number window partitioned on the correlation key joined back
    // to customer — per-outer-row execution or a cartesian fallback
    // would be quadratic at scale
    val df = graft.operators.SqlQueries.queries("join_lateral")(spark, sf)
    df.collect()
    val plan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    assert(plan.contains("Window"), s"expected decorrelated window:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"lateral fell back to a loop join:\n${plan.take(2000)}")
  }

  test("join_range: no forced broadcast hint — the catalog side grows with the corpus") {
    val df = Relational.joinRange(spark, sf)
    // a pinned broadcast() of the orders-derived interval side cannot fit
    // at 100 TB; the logical plan must carry no join hint so AQE decides
    assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "join_range carries a forced join hint")
    df.collect()
    val plan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"range join degenerated:\n${plan.take(2000)}")
  }

  test("join_range_bucketed: the range predicate rides an equi-join, no loop join") {
    val df = Relational.joinRangeBucketed(spark, sf)
    df.collect()
    val plan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"bucketed range join degenerated:\n${plan.take(2000)}")
  }

  test("graph_triangles: wedge closure plans as equi-joins, never a loop join") {
    val df = graft.operators.GraphOps.queries("graph_triangles")(spark, sf)
    df.collect()
    val plan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"triangle join degenerated to a loop:\n${plan.take(2000)}")
  }

  test("rows-only queries are exactly the known oracle-inexpressible set") {
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    // env-local paths only: the six xxhash64-family rows (MinHash
    // permutations, SimHash bits, LSH hyperplane signs, band keys) left
    // this set in r10 when the families moved to md5-derived hashes the
    // DuckDB oracles recompute verbatim; llm_bpe_encode left in r9 via
    // the unrolled trained-merge replay — anything else appearing here
    // means an oracle was accidentally lost
    assert(rowsOnly == Set(
      // binaryFile reader exposes env-local absolute paths/mtimes
      "source_binaryfile"),
      s"unexpected rows-only set: $rowsOnly")
  }

  test("simhash pair queries: fingerprint frame materialized once, not per join side") {
    // the simhash subtree (token explode + 64 bit-vote aggregate) must
    // NOT appear in the pair-join plan at all — both sides read the one
    // localCheckpointed fingerprint frame; before the fix the executed
    // plan grew two identical xxhash64 aggregation subtrees
    for (q <- Seq("llm_simhash_neardup", "llm_simhash_band")) {
      val plan = executedPlan(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("xxhash64") && !plan.contains("md5"),
        s"$q re-evaluates the simhash subtree in the join plan:\n" + plan.take(3000))
      assert(plan.contains("ExistingRDD"),
        s"$q does not read the checkpointed fingerprint frame:\n" + plan.take(3000))
    }
  }

  test("llm_bm25: term filter runs map-side below the tf shuffle; joins broadcast") {
    val plan = executedPlan(TextOps.bm25(spark, sf))
    // df + corpus stats are broadcast, never shuffled joins
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2500))
    assert(!plan.contains("SortMergeJoin"), plan.take(2500))
    // the IN-filter must sit BELOW the (doc,dl,w) exchange — the
    // shuffle carries matched tokens only, never the token stream
    val shuffleIdx = plan.indexOf("Exchange hashpartitioning(doc_id")
    assert(shuffleIdx >= 0, plan.take(2500))
    val below = plan.substring(shuffleIdx)
    assert(below.contains("Filter") && below.contains(" IN "),
      "term filter not below the tf shuffle:\n" + plan.take(3000))
  }

  test("ts_acf / ts_anomaly: all frame aggregates share ONE window operator") {
    for (q <- Seq("ts_acf", "ts_anomaly")) {
      val plan = executedPlan(Relational.queries(q)(spark, sf))
      val windows = "Window \\[".r.findAllIn(plan).length
      assert(windows == 1,
        s"$q: expected 1 Window operator, got $windows:\n" + plan.take(3000))
    }
  }

  test("ts_changepoint: argmax rides the window sort — no rank-over-score pass") {
    val plan = executedPlan(Relational.tsChangepoint(spark, sf))
    val windows = "Window \\[".r.findAllIn(plan).length
    assert(windows == 1,
      s"expected the cumulative+total frames fused into 1 Window, got $windows:\n" +
        plan.take(3000))
    // the per-user winner is min(struct(...)) — planned as a
    // SortAggregate that RIDES the window's (user, ts) sort order: the
    // only Sorts are the window's and the 30-row output orderBy. A
    // regression to rank-over-score would add a third full sort.
    assert(plan.contains("min(struct("), plan.take(3000))
    val sorts = "Sort \\[".r.findAllIn(plan).length
    assert(sorts <= 2,
      s"expected window sort + output sort only, got $sorts:\n" + plan.take(3000))
  }

  test("agg_mannwhitney: histogram form — no corpus-scale window, partial agg first") {
    // the U statistic folds to the (flag, quantity) value histogram:
    // the only corpus-scale operator must be the partial hash aggregate
    // building it (map-side combined), and the rank window runs over
    // the histogram frame — a regression to ranking raw rows would put
    // a Window directly over the scan
    val df = Relational.aggMannWhitney(spark, sf)
    df.collect()
    val finalPlan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    val windows = "Window \\[".r.findAllIn(finalPlan).length
    assert(windows == 1,
      s"the prefix-count window must be the only Window, got $windows:\n" +
        finalPlan.take(3000))
    // map-side combine before any exchange: a partial_count over the
    // histogram keys sits below the first shuffle
    assert(finalPlan.contains("partial_count") || finalPlan.contains("partial_sum"),
      s"histogram aggregate lost its partial phase:\n" + finalPlan.take(3000))
    // both hash exchanges carry histogram keys (flag[, q]) — never a
    // sort of raw rows: no rangepartitioning before the final orderBy
    val hashEx = "Exchange hashpartitioning".r.findAllIn(finalPlan).length
    assert(hashEx <= 2,
      s"expected ≤2 histogram-sized hash exchanges, got $hashEx:\n" +
        finalPlan.take(3000))
  }

  test("llm_curriculum: no unpartitioned Window anywhere in the plan") {
    // the corpus-wide ntile was replaced by histogram boundaries +
    // broadcast value→phase join; only boundary-tie rows pay a window,
    // and that window is PARTITIONED (by diversity). A regression to a
    // global window would put the whole corpus on one partition.
    val df = TextOps.curriculum(spark, sf)
    df.collect()
    val plan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    })
    val unpartitioned = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      s"unpartitioned WindowExec found:\n${unpartitioned.mkString("\n").take(2000)}")
    assert(plan.toString.contains("BroadcastHashJoin"),
      "value→phase map must broadcast:\n" + plan.toString.take(2000))
  }

  test("llm_zipf: vocab is cut by TakeOrderedAndProject before ranking") {
    // rank-then-filter over the full vocabulary would sort 10⁸+ rows on
    // one partition at corpus scale; top-k must run as per-partition
    // heaps (TakeOrderedAndProject), with the rank window over ≤30 rows.
    val plan = executedPlan(TextOps.zipfFit(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("llm_zipf: the unpartitioned rank window consumes ONLY the ≤30-row top-k output") {
    // the size-bound adjudication for the one `Window.orderBy` (no
    // partitionBy) in this path (r19 verdict task 2): "moving all data
    // to a single partition" here moves the TakeOrderedAndProject
    // output — a GLOBAL limit of 30 rows at ANY corpus scale, already
    // a single partition, so the warning is vacuous. This pins the
    // bound structurally: the window's input subtree must BE the
    // global top-k, with its limit ≤ 30. A regression that ranks the
    // full vocabulary (limit lost below the window) fails here.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    val exec = physical(TextOps.zipfFit(spark, sf))
    val unpart = exec.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpart.size == 1, exec.toString.take(3000))
    val topk = unpart.head.child.collectFirst {
      case t: TakeOrderedAndProjectExec => t
    }
    assert(topk.isDefined,
      "rank window no longer consumes the top-k frame:\n" +
        unpart.head.toString.take(3000))
    assert(topk.get.limit <= 30, s"top-k limit grew: ${topk.get.limit}")
  }

  test("profile_ks: the unpartitioned cumulative window runs over the VALUE GRID, not the corpus") {
    // the size-bound adjudication for the running-total window in
    // [[Relational.profileKs]] (r19 verdict task 2): the window input
    // must be the distinct-doc-length grid — an aggregation output
    // bounded by the VALUE DOMAIN (|distinct n_chars| ≤ max doc length,
    // independent of corpus row count) — never raw corpus rows. Pinned
    // structurally: an aggregate sits between the unpartitioned window
    // and any scan. The per-source window stays partitioned.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val exec = physical(Relational.profileKs(spark, sf))
    val unpart = exec.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpart.size == 1, exec.toString.take(3000))
    val aggBelow = unpart.head.child.collectFirst {
      case a: BaseAggregateExec => a
    }
    assert(aggBelow.isDefined,
      "cumulative window lost its histogram aggregate — it would sort " +
        "corpus rows on one partition:\n" + unpart.head.toString.take(3000))
  }

  test("llm_dedup_minhash: the band self-join reuses ONE shuffle of the signature pipeline") {
    // the r19 shuffle_hash hint exists to make both join inputs
    // IDENTICAL Exchange(band, bh) subtrees so the signature stage
    // (shingle explode + md5 + 32-way min aggregate — the dominant
    // cost) runs ONCE and the probe side reads the same shuffle files.
    // The static plan cannot show this (two full subtrees print until
    // stages materialize); the claim is pinned HERE on the executed
    // plan, where AQE's stage cache must have wrapped the second side
    // in a ReusedExchange/reused query stage. If this fails, the hint
    // DOUBLED the signature cost and must be re-measured (r19 verdict
    // task 4).
    val df = TextOps.queries("llm_dedup_minhash")(spark, sf)
    df.collect()
    val finalPlan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
    assert(finalPlan.contains("ReusedExchange"),
      "no reused exchange in the executed band join — the signature " +
        "pipeline ran twice:\n" + finalPlan.take(3000))
    // and the signature aggregate itself must appear on ONE side only:
    // exactly one partial min-aggregate subtree (one PLAN LINE carrying
    // the 32 partial_min columns) feeds the join
    val sigAggs = finalPlan.linesIterator.count(_.contains("partial_min"))
    assert(sigAggs <= 1,
      s"signature aggregate appears on $sigAggs plan lines in the executed plan:\n" +
        finalPlan.take(3000))
  }

  test("every declared oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("all declared queries execute and return rows at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0 && name != "join_anti" && name != "llm_embed_neardup") Some(name -> n) else None
    }
    assert(empty.isEmpty, s"unexpectedly empty: $empty")
  }
}
