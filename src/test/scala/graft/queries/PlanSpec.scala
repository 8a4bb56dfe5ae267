package graft.queries

import graft.SparkSpec

/** Plan-shape assertions: the physical plans the 100 TB design depends
  * on must actually materialize at any scale — broadcast joins for dims,
  * outer-join elimination, filter/column pushdown into the parquet scan,
  * top-k without a global sort.
  */
class PlanSpec extends SparkSpec {

  /** Map-only plan check, id-fan aware: the only hash exchange a
    * map-only census may carry is Tables.docIdsFanned's repartition of
    * the BARE doc ids (8 bytes/row, before any payload is synthesized
    * — the "no payload byte shuffles" claim is about everything after
    * the generator). Any other hash partitioning still fails.
    */
  private def assertNoHashShuffleButIdFan(plan: String, label: String = ""): Unit = {
    val keys = "hashpartitioning\\((\\w+)#".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(keys.forall(_ == "doc_id"),
      s"$label non-id-fan hash exchange on keys $keys:\n$plan")
  }


  private val sf = "/root/testdata/sf0.001"

  private def physical(q: Q): String =
    q.fn(spark, sf).queryExecution.executedPlan.toString

  private def optimized(q: Q): String =
    q.fn(spark, sf).queryExecution.optimizedPlan.toString

  test("q06: null-rejecting filter turns LEFT join into inner (EliminateOuterJoins)") {
    val plan = optimized(CoreQueries.q06)
    assert(plan.contains("Join Inner"), plan)
    assert(!plan.contains("LeftOuter"), plan)
  }

  test("q07/q09: dimension joins broadcast — fact side never shuffles for the join") {
    assert(physical(CoreQueries.q07).contains("BroadcastHashJoin"))
    val p9 = physical(CoreQueries.q09)
    assert(p9.contains("BroadcastHashJoin"), p9)
  }

  test("q04: conjunctive predicate pushed into the parquet scan") {
    val plan = physical(CoreQueries.q04)
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(l_returnflag,R)"), plan)
  }

  test("q02: column pruning reaches the scan (no full-width read)") {
    val plan = physical(CoreQueries.q02)
    // only the 4 referenced columns should be read
    assert(plan.contains("ReadSchema"), plan)
    assert(!plan.contains("l_shipdate"), plan)
  }

  test("q19: top-k is TakeOrderedAndProject, not global sort+limit") {
    assert(physical(CoreQueries.q19).contains("TakeOrderedAndProject"))
  }

  test("q01: aggregation is partial+final hash aggregate with codegen") {
    val df = CoreQueries.q01.fn(spark, sf)
    df.collect() // finalize the AQE plan — codegen spans only show post-execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("partial_sum"), plan) // map-side combine
    assert(plan.contains("*("), plan) // WholeStageCodegen spans render as *(n)
  }

  test("q42: media features stay in whole-stage codegen (no object boundary)") {
    val df = DataQueries.q42.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
    assert(!plan.contains("SerializeFromObject") && !plan.contains("MapPartitions"), plan)
  }

  test("q61: repetition signals are join-free linear aggregation") {
    val df = CorpusQueries.q61.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("Generate explode"), plan)
    assert(!plan.contains("Join"), plan) // no pairwise work anywhere
  }

  test("q64/q251: quota selection group-limit-pushes — the literal cap prunes per map task") {
    for (q <- Seq(CorpusQueries.q64, AnalyticsQueries.q251)) {
      val df = q.fn(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      // without the literal phase-1 cap the rank filter references a
      // JOIN column and each stratum's full row set sorts in one task
      assert(plan.contains("WindowGroupLimit"), s"${q.name}:\n$plan")
    }
  }

  test("q278: the triple generator is the compiled kernel — no higher-order lambda survives") {
    val df = InferQueries.q278.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_triples"), plan)
    // the interpreted-fallback cliff class: no HOF lambda anywhere in
    // the generator's plan (the q61/q62 history)
    assert(!plan.contains("lambdafunction"), plan)
  }

  test("q62/q64: corpus-level sets re-enter the plan as broadcasts, never a shuffled join") {
    for (q <- Seq(CorpusQueries.q62, CorpusQueries.q64)) {
      val df = q.fn(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"${q.name}:\n$plan")
      assert(!plan.contains("SortMergeJoin"), s"${q.name}:\n$plan")
    }
  }

  test("q169: eval side rides broadcasts, candidates equi-join — no cartesian anywhere") {
    val df = DataQueries.q169.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    assert(!plan.contains("SortMergeJoin"), plan) // train side never shuffles for a join
  }

  test("q170: split+audit stage — no unhinted cartesian; the audit row is the one sanctioned single-row broadcast cross") {
    val df = DataQueries.q170.fn(spark, sf) // runs the CC loop eagerly
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // exactly one BNLJ: the broadcast of the single-row leakage audit
    // (count in the final section only — AQE repeats the tree under
    // "== Initial Plan ==", the q135 counting recipe)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert(finalPlan.split("BroadcastNestedLoopJoin").length - 1 == 1, plan)
  }

  test("q171: repeat plan joins only against broadcasts; one per-source window") {
    val df = CorpusQueries.q171.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("Generate explode"), plan) // the real materialization path
  }

  test("q63: shard assignment is one hash shuffle + per-shard sort (no join, no global sort before ranking)") {
    val plan = CorpusQueries.q63.fn(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"), plan) // the one data shuffle
    assert(!plan.contains("Join"), plan)
  }

  test("q366: zstd census is map-only — the walk never shuffles a payload byte") {
    // final orderBy is presentation; everything before it is one
    // mapPartitions pass over the synthesized frames
    val plan = physical(DataQueries.q366)
    assert(!plan.contains("Join"), plan)
    assertNoHashShuffleButIdFan(plan) // + the sort's range partitioning
  }

  test("q367–q370: the codec censuses are map-only — no payload byte shuffles") {
    // Ogg codec ids, Opus TOC, zstd literals, UTF-8 validation: all
    // one mapPartitions pass over per-doc synthesized payloads; the
    // final orderBy is presentation (range partitioning only)
    for (q <- Seq(DataQueries.q367, DataQueries.q369, DataQueries.q370)) {
      val plan = physical(q)
      assert(!plan.contains("Join"), s"${q.name}: $plan")
      assertNoHashShuffleButIdFan(plan, q.name)
    }
    val plan368 = physical(DataQueries.q368)
    assert(!plan368.contains("Join"), plan368)
    assertNoHashShuffleButIdFan(plan368)
  }

  test("q374–q382 censuses are map-only — no payload byte shuffles") {
    // WebP, parquet footer, Avro OCF, tf.Example, zone-map pruning,
    // ORC tail, Snappy framing: one mapPartitions pass over per-doc
    // synthesized payloads; the final orderBy is presentation (range
    // partitioning only)
    for (q <- Seq(DataQueries.q374, FormatQueries.q377, FormatQueries.q378,
        FormatQueries.q379, FormatQueries.q380, FormatQueries.q381, FormatQueries.q382)) {
      val plan = physical(q)
      assert(!plan.contains("Join"), s"${q.name}: $plan")
      assertNoHashShuffleButIdFan(plan, q.name)
    }
  }

  test("q373: budget selection has no WindowExec — the global cumsum is the two-phase carry") {
    // `sum(tok) OVER (ORDER BY score)` would funnel the corpus through
    // ONE task; orderedPrefixSum's per-partition carry must leave no
    // window anywhere in the plan
    val plan = physical(graft.queries.TrainQueries.q373)
    assert(!plan.contains("Window"), plan)
  }

  test("q376: KS ECDFs have no WindowExec — the cumulative comes from the two-phase carry") {
    // `sum(delta) OVER (ORDER BY x)` would funnel every distinct value
    // through one task; the KS cumulative must ride orderedPrefixSum
    val plan = physical(graft.queries.StatQueries.q376)
    assert(!plan.contains("Window"), plan)
  }

  test("q363: sorted-neighborhood has no WindowExec — rank comes from zipWithIndex") {
    // the classic implementation is a global row_number (single-partition
    // window = the anti-pattern); this plan must rank via the RDD path
    // and join adjacents on the rank key
    val plan = physical(DataQueries.q363)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("Join"), plan) // the rank/rank+1 adjacency equi-join
  }

  test("q79: duplicate-span detection is join-free linear aggregation + one window") {
    val df = TrainQueries.q79.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode"), plan)
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan) // no pairwise work anywhere
  }

  test("q80: weighted sample is map-only + TakeOrderedAndProject (no global sort, no shuffle)") {
    val plan = physical(TrainQueries.q80)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), plan) // selection never shuffles the corpus
  }

  test("q81: store lookup is an anti-join, batch keep-first shares its shuffle key") {
    val df = TrainQueries.q81.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
  }

  test("q82: BPE pair counting is partial+final agg with top-k (no global sort)") {
    val df = TrainQueries.q82.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("partial_count"), plan) // map-side combine before the pair shuffle
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q83: PQ encode and search join only against broadcasts — the corpus never shuffle-joins") {
    val df = TrainQueries.q83.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q84: global offsets come from a broadcast of shard bases, not one big window") {
    val df = TrainQueries.q84.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the per-document window is partitioned (by shard); only the
    // shard-count-sized base table sees an unpartitioned window
    assert(plan.contains("Window [") || plan.contains("Window ["), plan)
  }

  test("q85: vocab top-k is TakeOrderedAndProject before the tiny coverage window") {
    val df = TrainQueries.q85.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q128: exact similarity join has no cartesian/nested-loop node (prefix filter, not all-pairs)") {
    val df = ExtQueries.q128.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q136: basket co-occurrence is join-free (bounded array expansion, no fact self-join)") {
    val df = ExtQueries.q136.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("q135: both path leads share one window (one user shuffle, not two)") {
    val df = ExtQueries.q135.fn(spark, sf)
    df.collect()
    // AQE's rendering repeats the tree under "== Initial Plan ==" —
    // count Window nodes in the final section only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val windows = "\\bWindow\\b".r.findAllIn(plan).size
    assert(windows == 1, s"expected 1 Window node, got $windows\n$plan")
  }

  test("q144: target-encoding lookup is a broadcast join (fact side never shuffles)") {
    val df = ExtQueries.q144.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q155: two-phase distinct plans without Expand (the skew-safe rewrite)") {
    val df = ExtQueries.q155.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("Expand"), plan)
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"), plan)
  }

  test("q159: range lookup is a broadcast nested-loop against the bounded dim") {
    val df = ExtQueries.q159.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("global-window audit: partition-less windows only at whitelisted bounded sites") {
    // A Window with an empty partitionSpec funnels the whole relation
    // through ONE task — the classic 100 TB scale-killer. Each
    // whitelisted site below operates on a relation already bounded by
    // construction (a top-k, a per-group rollup of ≤ |groups| rows, a
    // quantile grid, shard bases of n/shardW rows), where one task is
    // the correct plan. Any OTHER query growing a partition-less window
    // fails here — and a whitelisted query that stops needing one also
    // fails, so the list can't go stale.
    import org.apache.spark.sql.catalyst.plans.logical.Window
    // (the round-5 review predicted q142/q160 here too — their optimized
    // plans in fact carry no partition-less window, which this audit
    // proved by failing on the stale entries)
    val whitelist = Set(
      "q18_dense_id",           // reference-parity rank over the 25-row nation dim (scale variant: zipWithIndexOrdered)
      "q84_sequence_pack",      // level-1 prefix sum over n/shardW shard bases
      "q85_vocab_coverage",     // coverage cumsum over the top-200 vocab
      "q106_balanced_shards",   // band-base offsets over the |bands| rollup (the q84 shape for ranking)
      "q118_cumulative_distinct", // growth curve over ≤ |windows| rows
      "q125_ks_test",           // CDF running sums over the ≤1e6-row distinct-value table
      "q130_skyline",           // rank over the skyline candidate set
      "q134_auc",               // ROC rank over the scored eval sample
      "q146_rrf_fusion",        // fused rank over two bounded top-k lists
      "q148_vocab_growth",      // growth curve over ≤ |batches| rows
      "q149_spearman",          // rank offsets over the bounded distinct-value tables
      "q184_token_budget",      // Hamilton apportionment over the ≤ |sources| rollup
      "q204_hybrid_fusion",     // fused rank over two bounded top-200 shortlists (q146's shape)
      "q224_zipf_slope",        // ln(rank) over the bounded top-1000 term shortlist
      "q237_mann_whitney",      // rank offsets over the ≤50-row distinct-quantity grid
      "q242_logrank",           // at-risk cumsum over the ≤720-row duration-hour grid
      "q247_rfm_segments",      // quintile boundaries over the 3 bounded distinct-value grids
      "q259_cumulative_gains",  // decile boundaries + 10-row gains rollup over the scored eval set
      "q260_average_precision", // PR rank over the scored eval sample (q134's shape)
      "q269_disparate_impact",  // reference-group pick over the ≤|segments| rollup
      "q273_woe_iv",            // quintile boundaries over the distinct-balance grid (q125's CDF shape)
      "q277_rank_biased_overlap", // rank over the two bounded top-50 lists (q146's shape)
      "q280_kruskal_wallis",    // rank offsets over the ≤50-row distinct-quantity grid (q237's shape)
      "q289_conformal",         // calibration CDF over the bounded distinct-residual grid (q125's shape)
      "q292_wasserstein",       // two-sample CDF walk over the bounded distinct-value grid (q125's shape)
      "q304_qini_uplift",       // prefix sums over the 10-row decile rollup (q259's shape)
      "q330_mixture_temperature", // α-scaled apportionment over the ≤|langs| rollup (q184's shape)
      "q342_token_ledger")      // apportionment + epoch accounting over the ≤|sources| rollup (q330's shape)
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val bad = plan.collect { case w: Window if w.partitionSpec.isEmpty => w }
        if (bad.nonEmpty) Some(name) else None
    }.toSet
    assert(offenders == whitelist,
      s"unexpected global windows: ${(offenders -- whitelist).toSeq.sorted}; " +
        s"stale whitelist entries: ${(whitelist -- offenders).toSeq.sorted}")
  }

  test("q38/q40: no join keyed only on a block column (the quadratic shape)") {
    // AQE buries join nodes inside leaf QueryStageExec wrappers, so
    // inspect the rendered tree: every equi-join's key list must name
    // something beyond the low-cardinality block columns.
    val joinLine = raw"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)\w*\s+\[([^\]]*)\], \[([^\]]*)\]".r
    val blockCols = Set("source", "label")
    def keyNames(keys: String): Seq[String] =
      keys.split(",").toSeq.map(_.trim.takeWhile(_ != '#').toLowerCase).filter(_.nonEmpty)
    for (q <- Seq(DataQueries.q38, DataQueries.q40)) {
      val df = q.fn(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      val joins = joinLine.findAllMatchIn(plan).toSeq
      assert(joins.nonEmpty, s"${q.name}: expected equi-joins in plan\n$plan")
      joins.foreach { m =>
        val names = keyNames(m.group(2)) ++ keyNames(m.group(3))
        assert(!names.forall(blockCols.contains),
          s"${q.name}: join keyed only on block columns $names — all-pairs shape")
      }
    }
  }

  test("q316/q321: text extraction and PII redaction are map-only scans " +
    "(only the presentation sort exchanges)") {
    for (q <- Seq(CorpusQueries.q316, CorpusQueries.q321)) {
      val df = q.fn(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assertNoHashShuffleButIdFan(plan, q.name)
      assert(!plan.contains("Join"), s"${q.name}:\n$plan")
      assert(plan.contains("*("), s"${q.name} fell out of codegen:\n$plan")
    }
  }

  test("q314/q315/q318/q319/q323/q324/q329: header walkers are single-pass mapPartitions, no joins") {
    for (q <- Seq(DataQueries.q314, DataQueries.q315, DataQueries.q318, DataQueries.q319,
        DataQueries.q323, DataQueries.q324, DataQueries.q329, DataQueries.q332)) {
      val df = q.fn(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Join"), s"${q.name}:\n$plan")
      assertNoHashShuffleButIdFan(plan, q.name)
    }
  }

  test("q325: DSIR selection broadcasts the 64-row lambda table and top-Ks without a global sort") {
    val df = DataQueries.q325.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan) // λ and totals ride broadcasts
    assert(!plan.contains("SortMergeJoin"), plan)    // nothing big joins big
    assert(plan.contains("TakeOrderedAndProject"), plan) // top-20% is a top-K, not a full sort
  }

  test("q333: blocklist scan runs the AC kernel inside codegen, map-only") {
    val df = CorpusQueries.q333.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_multi_match"), plan)
    assert(!plan.contains("Join"), plan)
    assertNoHashShuffleButIdFan(plan) // + the presentation sort's range exchange
    assert(plan.contains("*("), s"q333 fell out of codegen:\n$plan")
  }

  test("q322: CDC chunking runs the compiled kernel inside codegen") {
    val df = CorpusQueries.q322.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_gear_chunks"), plan)
    assert(plan.contains("HashAggregate"), plan) // fingerprint rollup map-side combines
  }

  test("q343: chat audit is map-only and every violation branch fires") {
    val df = CorpusQueries.q343.fn(spark, sf)
    val out = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assertNoHashShuffleButIdFan(plan) // + the presentation sort's range exchange
    assert(out.map(_.getLong(3)).toSet == Set(0L, 1L), "alternation branches")
    assert(out.map(_.getLong(4)).toSet == Set(0L, 1L), "empty-content branches")
    assert(out.forall(r => r.getLong(8) > 0 && r.getLong(8) < 1000000),
      "trained ratio is a proper fraction")
  }

  test("q339: EXIF census is map-only — no join, no aggregation exchange") {
    val df = DataQueries.q339.fn(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assertNoHashShuffleButIdFan(plan) // + the presentation sort's range exchange
  }

  test("q340: BT fit's one distributed job reduces to the bounded pair matrix") {
    // the fit's output side is a driver-built 8-row frame — the plan to pin
    // is the REDUCTION: comparisons → 28 cells through one hash aggregate
    // with a map-side partial (no window, no join, no raw-row shuffle)
    val cellsPlan = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_orderkey % 8 AS a",
        "(o_orderkey % 8 + 1 + (o_orderkey div 8) % 7) % 8 AS b",
        "o_orderkey AS okey")
      .selectExpr("least(a, b) AS lo", "greatest(a, b) AS hi",
        "CASE WHEN (okey div 56) % (a + b + 2) <= greatest(a, b) " +
          "THEN greatest(a, b) ELSE least(a, b) END AS winner")
      .groupBy("lo", "hi")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("nij"))
      .queryExecution.executedPlan.toString
    assert(cellsPlan.contains("HashAggregate"), cellsPlan)
    assert(!cellsPlan.contains("Join"), cellsPlan)
    assert(!cellsPlan.contains("Window"), cellsPlan)
    val df = AnalyticsQueries.q340.fn(spark, sf)
    assert(df.count() == 8)
  }

  // AQE's string dump repeats the plan (Final + Initial) — count
  // exchanges only inside the final physical plan
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q344: pass@k is one map-side-combined aggregate, no join/window") {
    val plan = finalPlan(EventQueries.q344.fn(spark, sf))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    // partial + final HashAggregate pair → exactly one key exchange
    assert(plan.contains("HashAggregate"), plan)
    assert("hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("*("), s"q344 fell out of codegen:\n$plan")
  }

  test("q346: int8 audit broadcasts the 64-row dim scales, no row join") {
    val plan = finalPlan(DataQueries.q346.fn(spark, sf))
    // the per-dim pass re-attaches as a broadcast of ONE bounded row —
    // never a shuffle join against the vector table
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q345: prefix census is two map-side-combined aggregates, no join") {
    val plan = finalPlan(CorpusQueries.q345.fn(spark, sf))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    // (source,pfx) rollup + source rollup → two key exchanges, no more
    assert("hashpartitioning".r.findAllIn(plan).size == 2, plan)
  }

  test("q348: attention-leak fold clusters shards in one exchange") {
    val plan = finalPlan(TrainQueries.q348.fn(spark, sf))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    // collect_list agg: one shard exchange; fold runs inside the agg
    assert("hashpartitioning".r.findAllIn(plan).size == 1, plan)
  }

  test("q350: mojibake census is map-only into one source rollup") {
    val plan = finalPlan(CorpusQueries.q350.fn(spark, sf))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    assert("hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("*("), s"q350 fell out of codegen:\n$plan")
  }

  test("q352: Fleiss kappa is one single-row aggregate — no shuffle by key") {
    val plan = finalPlan(InferQueries.q352.fn(spark, sf))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("hashpartitioning"), plan) // global agg: SinglePartition only
  }

  test("q353: TFRecord census is map-only — no join, no agg exchange") {
    val plan = finalPlan(DataQueries.q353.fn(spark, sf))
    assert(!plan.contains("Join"), plan)
    assertNoHashShuffleButIdFan(plan) // + the presentation sort's range exchange
  }

  test("q357: ES sampling runs on the custom TopKPerKey operator, no window") {
    val plan = finalPlan(CorpusQueries.q357.fn(spark, sf))
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q383/q389: duplicate-run extraction is JOIN-FREE — no self-join, no cartesian") {
    // the suffix-array alternative's whole point: gram buckets expand
    // in-place (aggregate + explode) and runs come from island
    // arithmetic — a join-based formulation would re-execute the gram
    // scan per side and a cartesian would be the quadratic trap
    for (q <- Seq(CorpusQueries.q383, CorpusQueries.q389)) {
      val plan = finalPlan(q.fn(spark, sf))
      assert(!plan.contains("Join"), s"${q.name} grew a join:\n$plan")
      assert(!plan.contains("CartesianProduct"), q.name)
      // the island window partitions by (pair, offset) — never global
      assert(plan.contains("Window"), q.name)
      assert(plan.contains("windowspecdefinition(id_a"),
        s"${q.name} island window lost its partitioning:\n$plan")
    }
  }

  test("q384: winnowing candidate pairs are one aggregation chain, no join") {
    val plan = finalPlan(CorpusQueries.q384.fn(spark, sf))
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // fingerprint sizing window partitions by the fingerprint hash
    assert(plan.contains("windowspecdefinition(h#") ||
      plan.contains("windowspecdefinition(h "), plan)
  }

  test("q391: span removal cuts via ANTI join on (doc, pos) — never a range join") {
    // the cut could naively be a non-equi join (pos BETWEEN start AND
    // end), whose only physical strategy is a broadcast nested loop /
    // cartesian — the quadratic trap. The interval explode keeps it an
    // equi-ANTI join, and the per-doc windows stay partitioned.
    val plan = finalPlan(CorpusQueries.q391.fn(spark, sf))
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("windowspecdefinition(doc_id"),
      s"interval-merge window lost its per-doc partitioning:\n$plan")
  }

  test("q392/q397: Delta-log replay is one (table,path) window + aggregations, no self-join") {
    // log-state reconstruction as a relational fold: latest-wins is a
    // row_number window partitioned by (table, path) — a join-based
    // 'latest per key' would rescan the log per side
    val plan = finalPlan(LakeQueries.q392.fn(spark, sf))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("windowspecdefinition(tbl"),
      s"latest-wins window lost its (table,path) partitioning:\n$plan")
    // census walkers stay map-only up to the aggregations: the only
    // joins are the final per-table assembly of the aggregate legs
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q394: WARC pipeline's one shuffle is the clean-text dedup window") {
    val plan = finalPlan(CorpusQueries.q394.fn(spark, sf))
    assert(!plan.contains("Join"), s"the composition grew a join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("windowspecdefinition(fp"),
      s"keep-first dedup window lost its fingerprint partitioning:\n$plan")
  }

  test("q395/q396: zstd decode census is map-only — no join, no agg exchange") {
    for (q <- Seq(FormatQueries.q395, FormatQueries.q396)) {
      val plan = finalPlan(q.fn(spark, sf))
      assert(!plan.contains("Join"), s"${q.name}:\n$plan")
      assert(!plan.contains("HashAggregate"), s"${q.name} grew an aggregation:\n$plan")
    }
  }
}
