package graft.tools
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def p(name: String) = {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val s = df.queryExecution.executedPlan.toString
      println(s"===== $name")
      println(s.linesIterator.take(40).mkString("\n"))
    }
    p("q03_scan_filter_project"); p("q06_join_dims_broadcast"); p("q16_topk")

    // q55: the benchmark shingle set must ride a broadcast, never a
    // shuffle (it is the canonical tiny-dim side at 100 TB)
    val q55Plan = graft.SparkEntry.queries("q55_decontaminate")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q55Plan.contains("BroadcastHashJoin"),
      "q55: benchmark overlap join is not broadcast")
    println("===== q55 BROADCAST ASSERT OK")
    // q58: sequence packing is ONE hash shuffle (the window on source)
    val q58Plan = graft.SparkEntry.queries("q58_pack_sequences")(spark, dir)
      .queryExecution.executedPlan.toString
    val nHashExchanges = q58Plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(nHashExchanges == 1,
      s"q58: expected exactly 1 hash shuffle, found $nHashExchanges")
    println("===== q58 SINGLE-SHUFFLE ASSERT OK")
    // q61 funnel: the whole stage chain is keyed on user_id; print the
    // hash-exchange count so partitioning reuse is visible evidence
    val q61Plan = graft.SparkEntry.queries("q61_funnel")(spark, dir)
      .queryExecution.executedPlan.toString
    val q61Ex = q61Plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    println(s"===== q61 funnel: $q61Ex hash exchanges " +
      "(stage aggs + joins, all on user_id)")
    // partitioned events layout: date filter must prune at planning time
    val part = java.nio.file.Files.createTempDirectory("events_part").toString
    graft.sources.EventsLayout.writePartitionedByDay(
      graft.Tables.events(spark, dir), part)
    val pruned = graft.sources.EventsLayout.readPartitioned(spark, part)
      .filter(org.apache.spark.sql.functions.col("event_date") === "2024-01-05")
    println("===== events_partitioned_by_day (pruned read)")
    println(pruned.queryExecution.executedPlan.toString.linesIterator
      .take(8).mkString("\n"))

    // DYNAMIC partition pruning: the partition filter is not a literal —
    // it comes from a dim-side predicate at runtime. A calendar dim
    // (one row per date, with a day-of-week attribute) is written to
    // parquet, filtered on dow, and joined to the fact on the PARTITION
    // column; the fact scan must then carry a dynamicpruning expression
    // in PartitionFilters (fed by the reused broadcast of the dim), so
    // only the dim-selected days are ever listed or read. This is the
    // runtime half of the §4 partitioned-layout claim — static pruning
    // above covers literal predicates only.
    import org.apache.spark.sql.functions.{col, dayofweek, to_date}
    val calDir = java.nio.file.Files.createTempDirectory("cal_dim").toString
    graft.Tables.events(spark, dir)
      .select(to_date(col("ts")).as("cal_date")).distinct()
      .withColumn("dow", dayofweek(col("cal_date")))
      .write.mode("overwrite").parquet(calDir)
    val cal = spark.read.parquet(calDir).filter(col("dow") === 3)
    val dpp = graft.sources.EventsLayout.readPartitioned(spark, part)
      .join(cal, col("event_date") === col("cal_date"))
      .groupBy(col("event_type"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val dppPlan = dpp.queryExecution.executedPlan.toString
    println("===== events_dpp_join (dim-filtered join on partition col)")
    println(dppPlan.linesIterator
      .filter(l => l.contains("PartitionFilters") || l.contains("Scan") ||
        l.contains("BroadcastHashJoin"))
      .mkString("\n"))
    assert(dppPlan.contains("dynamicpruning"),
      "expected a dynamicpruning expression in the fact scan's " +
        "PartitionFilters — DPP did not engage")
    println("===== DPP ASSERT OK (dynamicpruningexpression present)")

    // q75: the day grid must ride a broadcast nested-loop (calendar-
    // bounded dim side), and the only hash shuffles are the distinct
    // pre-agg + the final group — never a shuffle of the range join
    val q75Plan = graft.SparkEntry.queries("q75_rolling_distinct_users")(
      spark, dir).queryExecution.executedPlan.toString
    assert(q75Plan.contains("BroadcastNestedLoopJoin"),
      "q75: day-grid range join is not broadcast")
    println("===== q75 GRID BROADCAST ASSERT OK")
    // q80: blocking keys make the fuzzy match an EQUI-join (hash or
    // sort-merge) with levenshtein only in the post-join filter — a
    // cartesian/NLJ here would be the O(n²) record-linkage trap
    val q80Plan = graft.SparkEntry.queries("q80_fuzzy_match")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!q80Plan.contains("CartesianProduct") &&
      !q80Plan.contains("BroadcastNestedLoopJoin"),
      "q80: fuzzy match lost its equi-join blocking keys")
    println("===== q80 BLOCKED EQUI-JOIN ASSERT OK")
    // q81: the mode's top-1 window must run over the DISTINCT-value agg
    // output (one row per (flag, qty)), after partial map-side combine —
    // i.e. exactly two hash shuffles, none of them window-over-raw-rows
    val q81Plan = graft.SparkEntry.queries("q81_grouped_mode")(spark, dir)
      .queryExecution.executedPlan.toString
    val q81Ex = q81Plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(q81Ex <= 2, s"q81: expected <=2 hash shuffles, found $q81Ex")
    println("===== q81 TWO-SHUFFLE ASSERT OK")
    // q88: the quota fill is ONE window over source — a single hash
    // shuffle, no join, no sort beyond the window's
    val q88Plan = graft.SparkEntry.queries("q88_token_budget_mix")(spark, dir)
      .queryExecution.executedPlan.toString
    val q88Ex = q88Plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(q88Ex == 1, s"q88: expected exactly 1 hash shuffle, found $q88Ex")
    println("===== q88 SINGLE-SHUFFLE ASSERT OK")
    // q89: the query set is broadcast — the corpus side must stream with
    // ZERO hash shuffles before the (tiny) top-k window
    val q89Plan = graft.SparkEntry.queries("q89_hard_negatives")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q89Plan.contains("BroadcastNestedLoopJoin"),
      "q89: query set not broadcast")
    assert(!q89Plan.contains("CartesianProduct"),
      "q89: cross join fell back to CartesianProduct")
    println("===== q89 BROADCAST-SCAN ASSERT OK")
    // q90: the per-occurrence surprisal join keys on the bigram — an
    // equi-join, never a nested loop over occurrences; the one-row total
    // rides a broadcast
    val q90Plan = graft.SparkEntry.queries("q90_bigram_surprisal")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!q90Plan.contains("CartesianProduct"),
      "q90: count join-back lost its bigram equi-key")
    println("===== q90 EQUI-JOINBACK ASSERT OK")
    // q91: PII scrub is a pure per-row projection — ZERO exchanges of
    // any kind (the embarrassingly-parallel contract)
    val q91Plan = graft.SparkEntry.queries("q91_pii_scrub")(spark, dir)
      .queryExecution.executedPlan.toString
    val q91Ex = q91Plan.linesIterator.count(_.contains("Exchange"))
    assert(q91Ex == 1, // the documentsParallel round-robin repartition only
      s"q91: expected only the input repartition, found $q91Ex exchanges")
    println("===== q91 PROJECTION-ONLY ASSERT OK")
    // q93: both windows (lag compaction + lead chaining) share ONE
    // user_id hash shuffle — Catalyst must not re-exchange between them
    val q93Plan = graft.SparkEntry.queries("q93_state_intervals")(spark, dir)
      .queryExecution.executedPlan.toString
    val q93Ex = q93Plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(q93Ex == 1, s"q93: expected exactly 1 hash shuffle, found $q93Ex")
    println("===== q93 SINGLE-SHUFFLE ASSERT OK")
    // q96: chunk dedup must never plan a GLOBAL sort — the keep-first
    // window partitions by chunk_text (hash), reassembly by doc_id
    val q96Plan = graft.SparkEntry.queries("q96_chunk_dedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!q96Plan.contains("Exchange rangepartitioning"),
      "q96: a global sort appeared — window lost its hash partitioning")
    println("===== q96 NO-GLOBAL-SORT ASSERT OK")
    // q97: the hot-shingle exclusion must ride a BROADCAST anti-join
    // (the hot set is vocabulary-bounded). Since round 11 the
    // rare-shingle table is session-STAGED (rareShinglesFor), so the
    // registry q97 plan reads the staged artifact and the anti-join
    // lives in the BUILD — audit the unstaged build seam
    // (containmentPairs), then hold the registry plan to the
    // cartesian-free contract
    val q97Build = graft.queries.TextOps.containmentPairs(
      graft.Tables.documentsParallel(spark, dir)
        .filter(org.apache.spark.sql.functions.col("text").isNotNull))
      .queryExecution.executedPlan.toString
    assert(q97Build.contains("BroadcastHashJoin") &&
      q97Build.contains("LeftAnti"),
      "q97: hot-shingle exclusion is not a broadcast anti-join")
    val q97Plan = graft.SparkEntry.queries("q97_shingle_containment")(
      spark, dir).queryExecution.executedPlan.toString
    assert(!q97Plan.contains("CartesianProduct") &&
      !q97Build.contains("CartesianProduct"),
      "q97: containment pair generation lost its shingle equi-key")
    println("===== q97 BROADCAST-ANTI ASSERT OK")
    // q99: session assignment window AND the session rollup agg both
    // key on user_id — ONE hash shuffle end to end
    val q99Plan = graft.SparkEntry.queries("q99_session_metrics")(spark, dir)
      .queryExecution.executedPlan.toString
    val q99Ex = q99Plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(q99Ex == 1, s"q99: expected exactly 1 hash shuffle, found $q99Ex")
    println("===== q99 SINGLE-SHUFFLE ASSERT OK")
    // q100: attribution is one window over user_id — a single shuffle,
    // no join
    val q100Plan = graft.SparkEntry.queries("q100_last_touch")(spark, dir)
      .queryExecution.executedPlan.toString
    val q100Ex = q100Plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(q100Ex == 1,
      s"q100: expected exactly 1 hash shuffle, found $q100Ex")
    println("===== q100 SINGLE-SHUFFLE ASSERT OK")
    // a WindowExec with an empty partitionSpec requires AllTuples — the
    // single-partition shape that moves the whole frame to one task (and
    // logs "No Partition Defined for Window operation"). No audited
    // query may plan one.
    // NOTE: AdaptiveSparkPlanExec reports NO children (its inner plan is
    // a field, not a child), so a naive plan.collect is vacuously empty
    // under AQE — unwrap it explicitly or the assert asserts nothing.
    def partitionlessWindows(
        plan: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
      def walk(p: SparkPlan): Seq[String] = {
        val here = p match {
          case w: WindowExec if w.partitionSpec.isEmpty => Seq(w.nodeName)
          case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
            Seq(w.nodeName)
          case _ => Nil
        }
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case o => o.children
        }
        here ++ kids.flatMap(walk)
      }
      walk(plan)
    }
    // q101: the registry run is now a memoized PROBE (converged rank
    // table scan + top-k — round 13's build/probe seam), so the
    // iteration-plan laws are audited on the BUILD composition
    // (partPageRank = buildPageRankIndex → convergedRanks → rankTopK,
    // the exact chain the memo executes on a cold session): the
    // entity-sized rank state must broadcast into the CSR adjacency
    // join every iteration — the edge stream never shuffles.
    val q101Baskets = graft.Tables.lineitem(spark, dir)
      .select(org.apache.spark.sql.functions.col("l_orderkey").as("ok"),
        org.apache.spark.sql.functions.col("l_partkey").as("part"))
      .distinct()
    val q101Exec = graft.queries.GraphOps.partPageRank(q101Baskets)
      .queryExecution.executedPlan
    val q101Plan = q101Exec.toString
    assert(q101Plan.contains("BroadcastHashJoin"),
      "q101 build: rank state not broadcast into the adjacency join")
    assert(!q101Plan.contains("CartesianProduct"),
      "q101 build: iteration join lost its key")
    // final top-k must be the distributed partial top-k; the only Window
    // left is the post-limit rnk over ≤ 20 rows, keyed on a constant —
    // never the AllTuples single-partition shape
    assert(q101Plan.contains("TakeOrderedAndProject"),
      "q101 build: final top-k is not TakeOrderedAndProject")
    assert(partitionlessWindows(q101Exec).isEmpty,
      s"q101 build: partition-less Window: ${partitionlessWindows(q101Exec)}")
    // and the registry PROBE itself must stay probe-shaped: a scan of
    // the staged converged table + TakeOrderedAndProject, with no
    // iteration joins re-planned
    val q101ProbeExec = graft.SparkEntry.queries("q101_part_pagerank")(
      spark, dir).queryExecution.executedPlan
    assert(q101ProbeExec.toString.contains("TakeOrderedAndProject"),
      "q101 probe: top-k is not TakeOrderedAndProject")
    assert(partitionlessWindows(q101ProbeExec).isEmpty,
      "q101 probe: partition-less Window in probe plan")
    println("===== q101 BUILD RANK-BROADCAST + PROBE TOPK ASSERT OK")
    // q102: scoring joins tf against the 8-row term table and the 1-row
    // corpus scalars — both must ride broadcasts; only the tf/dl/df
    // aggs may shuffle
    val q102Exec = graft.SparkEntry.queries("q102_bm25")(spark, dir)
      .queryExecution.executedPlan
    val q102Plan = q102Exec.toString
    assert(q102Plan.contains("BroadcastHashJoin"),
      "q102: term-table join is not broadcast")
    assert(!q102Plan.contains("CartesianProduct"),
      "q102: scalar attach fell back to CartesianProduct")
    // term selection over the vocabulary-sized df table must be the
    // distributed partial top-k, not a single-partition global window;
    // the only Window left is the per-token scoring rnk (partitioned)
    assert(q102Plan.contains("TakeOrderedAndProject"),
      "q102: term selection is not TakeOrderedAndProject")
    assert(partitionlessWindows(q102Exec).isEmpty,
      s"q102: partition-less Window in plan: ${partitionlessWindows(q102Exec)}")
    println("===== q102 BROADCAST-TERMS + TOPK ASSERT OK")
    // q103: the labeled seed is the broadcast side; the corpus streams
    // with no shuffle before the per-vector vote windows
    val q103Plan = graft.SparkEntry.queries("q103_knn_classify")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q103Plan.contains("BroadcastNestedLoopJoin"),
      "q103: seed set not broadcast")
    assert(!q103Plan.contains("CartesianProduct"),
      "q103: seed scan fell back to CartesianProduct")
    println("===== q103 SEED-BROADCAST ASSERT OK")
    // q108: the hub-language index is the broadcast side — the non-hub
    // corpus streams once, like q25/q89/q103
    val q108Plan = graft.SparkEntry.queries("q108_bitext_mining")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q108Plan.contains("BroadcastNestedLoopJoin"),
      "q108: hub index not broadcast")
    assert(!q108Plan.contains("CartesianProduct"),
      "q108: hub scan fell back to CartesianProduct")
    println("===== q108 HUB-BROADCAST ASSERT OK")
    // q104/q106: privacy releases are ONE hash-agg on the cell key plus
    // per-cell scalar expressions — no joins at all
    for (qn <- Seq("q104_dp_counts", "q106_kanon_release")) {
      val pl = graft.SparkEntry.queries(qn)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!pl.contains("Join"), s"$qn: unexpected join in a pure agg")
      println(s"===== $qn NO-JOIN ASSERT OK")
    }
    // q105: centroids must come back as a BROADCAST array join — the
    // scoring pass streams the corpus; only the top-k window shuffles
    val q105Plan = graft.SparkEntry.queries("q105_label_outliers")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q105Plan.contains("BroadcastHashJoin"),
      "q105: centroid join is not broadcast")
    println("===== q105 CENTROID-BROADCAST ASSERT OK")
    // q111: the k cluster centers ride a broadcast into the assignment
    // cross join (k rows per vector, never a shuffled product); the
    // suppression join keeps its cluster equi-key
    val q111Plan = graft.SparkEntry.queries("q111_semdedup")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q111Plan.contains("BroadcastNestedLoopJoin"),
      "q111: cluster centers not broadcast into assignment")
    assert(!q111Plan.contains("CartesianProduct"),
      "q111: suppression join lost its cluster key")
    // round-10: assignment is a projection fold (CenterAssign) — the
    // only corpus exchanges left key on cluster (rep_rank window +
    // suppression join), NEVER on vec_id
    assert(!q111Plan.contains("hashpartitioning(vec_id"),
      "q111: assignment regressed to a vec_id argmin shuffle")
    println("===== q111 CENTER-BROADCAST ASSERT OK")
    // q112: fingerprint selection is per-doc window work; the pair
    // generation must stay an equi-join on fp (df-cap-bounded buckets)
    val q112Plan = graft.SparkEntry.queries("q112_winnowing")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!q112Plan.contains("CartesianProduct") &&
      !q112Plan.contains("BroadcastNestedLoopJoin"),
      "q112: pair generation must be an equi-join on fingerprint")
    println("===== q112 EQUI-PAIR ASSERT OK")
    // q113: one corpus-sized (source, token) agg; the fit itself is a
    // per-source agg over <=100 rows — no joins anywhere
    val q113Plan = graft.SparkEntry.queries("q113_zipf_slope")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!q113Plan.contains("Join"), "q113: unexpected join in a pure agg")
    println("===== q113 NO-JOIN ASSERT OK")
    // q116: candidate proposal and verification are all equi-joins
    // (fingerprint buckets, then (doc, shingle) keys) — a cartesian or
    // non-equi fallback means the blocker stopped blocking
    val q116Exec = graft.SparkEntry
      .queries("q116_winnowed_containment")(spark, dir)
      .queryExecution.executedPlan
    assert(!q116Exec.toString.contains("CartesianProduct") &&
      !q116Exec.toString.contains("BroadcastNestedLoopJoin"),
      "q116: verification must stay equi-keyed")
    println("===== q116 EQUI-VERIFY ASSERT OK")
    // q117: every learning round is a TakeOrderedAndProject over the
    // vocabulary agg — never a global sort or partition-less window
    val q117Exec = graft.SparkEntry.queries("q117_bpe_merges")(spark, dir)
    assert(partitionlessWindows(
      q117Exec.queryExecution.executedPlan).isEmpty,
      "q117: partition-less window in merge output")
    println("===== q117 NO-GLOBAL-WINDOW ASSERT OK")
    // q118: model joins are equi-keyed; only the 1-row V scalar may ride
    // a broadcast nested loop; scoring must not cartesian
    val q118Plan = graft.SparkEntry.queries("q118_lm_score")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!q118Plan.contains("CartesianProduct"),
      "q118: scalar attach fell back to CartesianProduct")
    assert(q118Plan.contains("BroadcastNestedLoopJoin"),
      "q118: V scalar should be a broadcast attach")
    println("===== q118 MODEL-JOIN ASSERT OK")
    // q119: application is expression-only — the packing window (keyed
    // on source) must be the ONLY window, and no partition-less one
    val q119Exec = graft.SparkEntry.queries("q119_subword_pack")(spark, dir)
      .queryExecution.executedPlan
    assert(partitionlessWindows(q119Exec).isEmpty,
      "q119: packing window lost its source key")
    assert(!q119Exec.toString.contains("CartesianProduct"),
      "q119: unexpected cartesian in expression-only application")
    println("===== q119 EXPR-APPLY ASSERT OK")
    // q120: encoding rides a 1-row broadcast stat attach — the corpus
    // side must never shuffle-join (no SMJ/shuffled-hash), and the
    // attach is the scalar BroadcastNestedLoopJoin pattern (q118)
    val q120Plan = graft.SparkEntry.queries("q120_embed_quantize")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q120Plan.contains("BroadcastNestedLoopJoin"),
      "q120: stat attach should be a 1-row broadcast")
    assert(!q120Plan.contains("SortMergeJoin") &&
      !q120Plan.contains("ShuffledHashJoin"),
      "q120: corpus side must not shuffle-join")
    println("===== q120 BROADCAST-STATS ASSERT OK")
    // q121: candidate generation is a distributed partial top-k
    // (TakeOrderedAndProject), never a global sort or partition-less
    // window — the greedy consumes only the bounded candidate table
    val q121Cands = graft.queries.Quantize.mmrCandidateQuery(spark, dir)
      .queryExecution.executedPlan
    assert(q121Cands.toString.contains("TakeOrderedAndProject"),
      "q121: candidate top-k must be TakeOrderedAndProject")
    assert(partitionlessWindows(q121Cands).isEmpty,
      "q121: partition-less window in candidate generation")
    println("===== q121 CANDIDATE-TOPK ASSERT OK")
    // q122: the tf agg is one shuffle, then the (token, segment) window
    // and final agg SHARE keys so their sorted exchange plans once —
    // two hash exchanges total, keyed windows only
    val q122Exec = graft.SparkEntry.queries("q122_inverted_postings")(
      spark, dir).queryExecution.executedPlan
    val q122Ex = q122Exec.toString.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(q122Ex <= 2,
      s"q122: expected <=2 hash shuffles (tf agg + shared window/agg key), found $q122Ex")
    assert(partitionlessWindows(q122Exec).isEmpty,
      "q122: postings window lost its (token, segment) key")
    println("===== q122 TWO-SHUFFLE ASSERT OK")
    // q123: projection is a pure expression chain — no shuffle, no join
    val q123Plan = graft.SparkEntry.queries("q123_jl_project")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!q123Plan.contains("Exchange hashpartitioning") &&
      !q123Plan.contains("Join"),
      "q123: projection must stay shuffle- and join-free")
    println("===== q123 EXPR-ONLY ASSERT OK")
    // q124: the touched-key restriction must be a BROADCAST semi-join
    // applied to the tf stream — a shuffled semi-join would move the
    // corpus to restrict it, defeating the incremental claim
    val q124Plan = graft.SparkEntry.queries("q124_incremental_postings")(
      spark, dir).queryExecution.executedPlan.toString
    assert(q124Plan.contains("BroadcastHashJoin") &&
      q124Plan.contains("LeftSemi"),
      "q124: touched-key restriction is not a broadcast semi-join")
    assert(!q124Plan.contains("SortMergeJoin"),
      "q124: corpus-side shuffle join defeats incremental maintenance")
    println("===== q124 BROADCAST-SEMI ASSERT OK")
    // q151: the incremental-curation dedup arm must restrict the
    // CORPUS shingle stream by the broadcast batch-bounded touched
    // (source, shingle) set (the q124 recipe at pipeline scale) —
    // audited on the dedup stage in isolation, where the LeftSemi is
    // unambiguous
    val docsAll = graft.Tables.documentsParallel(spark, dir)
    val q151Dedup = graft.queries.PipelineOps.dedupAgainst(
      docsAll.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 7),
      docsAll.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 7),
      0.5, restrictCorpus = true).queryExecution.executedPlan.toString
    assert(q151Dedup.contains("BroadcastHashJoin") &&
      q151Dedup.contains("LeftSemi"),
      "q151: corpus-side touched-key restriction is not a broadcast semi-join")
    println("===== q151 BROADCAST-SEMI ASSERT OK")
    // q125: the k-row class table rides a broadcast into the token
    // stream; nothing data-sized is broadcast-hinted (the cc model join
    // is left to AQE — a web-scale vocabulary must be free to shuffle)
    val q125Plan = graft.SparkEntry.queries("q125_nb_langid")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q125Plan.contains("BroadcastNestedLoopJoin") ||
      q125Plan.contains("BroadcastHashJoin"),
      "q125: class stats must ride a broadcast")
    assert(!q125Plan.contains("CartesianProduct"),
      "q125: the k-class expansion must never plan a cartesian")
    println("===== q125 BROADCAST-CLASSES ASSERT OK")
    // q126: every assignment pass is a broadcast of the k-dim centers —
    // a shuffled assignment would move the corpus once per round.
    // Round-10: the final assignment (what the registry plan shows) is a
    // zero-exchange projection fold (CenterAssign) — the packed-centers
    // side may exchange its k rows to a single partition, but the corpus
    // side must plan NO hash exchange at all
    val q126Plan = graft.SparkEntry.queries("q126_kmeans")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(q126Plan.contains("BroadcastNestedLoopJoin"),
      "q126: center assignment is not a broadcast join")
    assert(!q126Plan.contains("CartesianProduct"),
      "q126: assignment must never plan a cartesian")
    assert(!q126Plan.contains("Exchange hashpartitioning"),
      "q126: assignment must be exchange-free (the window-argmin shuffle is back)")
    println("===== q126 BROADCAST-CENTERS ASSERT OK")
    // q128: the boilerplate gram drop is an equi-keyed anti-join whose
    // strategy is AQE's call (round-10: the hot set grows with the
    // corpus — boilerplate is corpus-proportional, NOT vocabulary-
    // bounded — so a forced broadcast was a driver-OOM risk at scale;
    // at fixture scale AQE still picks broadcast, which the first
    // assert documents); the islands window must be partitioned
    // (diagonal keys), never global
    // (round 11 session-staged the span table, so the anti-join lives
    // in the BUILD — audit duplicateSpans directly, hold the registry
    // plan to the cartesian-free contract)
    val q128Build = graft.queries.SubstrDedup.duplicateSpans(
      graft.Tables.documentsParallel(spark, dir))
      .queryExecution.executedPlan.toString
    assert(q128Build.contains("LeftAnti"),
      "q128: hot-gram drop lost its anti-join")
    assert(!q128Build.contains("CartesianProduct") &&
      !q128Build.contains("BroadcastNestedLoopJoin"),
      "q128: hot-gram drop must stay equi-keyed")
    val q128Plan = graft.SparkEntry.queries("q128_exact_substr")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!q128Plan.contains("CartesianProduct") &&
      !q128Plan.contains("BroadcastNestedLoopJoin"),
      "q128: registry plan must stay equi-keyed")
    assert(!q128Plan.contains("Window [") ||
      q128Plan.linesIterator.filter(_.contains("Window "))
        .forall(_.contains("windowspecdefinition")),
      "q128: unexpected window shape")
    println("===== q128 BROADCAST-ANTI ASSERT OK")
    // q130: both graph joins (wedge build, closing semi) are equi-keyed
    // hash joins — degree ordering exists precisely so no step needs a
    // cartesian or a global sort. Round 11 session-staged the counts
    // (the registry q130 is a scan of the landed artifact), so audit
    // the BUILD via the unstaged public seam
    val q130Build = graft.queries.GraphOps.triangleCounts(
      graft.Tables.lineitem(spark, dir)
        .select(org.apache.spark.sql.functions.col("l_orderkey").as("ok"),
          org.apache.spark.sql.functions.col("l_partkey").as("part")))
      .queryExecution.executedPlan.toString
    assert(!q130Build.contains("CartesianProduct"),
      "q130: triangle counting must stay equi-join only")
    assert(q130Build.contains("LeftSemi"),
      "q130: wedge closing must be a semi-join")
    println("===== q130 EQUI-JOIN ASSERT OK")
    // q135: PQ encoding is a pure projection against ONE broadcast
    // codebook row — zero hash exchanges (the only exchange in the plan
    // is the fixture-parallelism round-robin shim); q136 adds exactly
    // one: the per-query top-k rank window on qid
    // (round 11 session-staged the code table — the registry q135 is a
    // scan of the landed artifact; audit the ENCODE build seam
    // directly, and hold the registry plan to scan-shaped)
    val embSrc = graft.Tables.embeddingsParallel(spark, dir)
      .filter(org.apache.spark.sql.functions.col("embedding").isNotNull)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val q135Build = graft.queries.PQuant.encode(embSrc,
      graft.queries.PQuant.pqCodebooks(embSrc))
      .queryExecution.executedPlan.toString
    assert(q135Build.contains("BroadcastNestedLoopJoin"),
      "q135: codebook attach is not a broadcast join")
    assert(!q135Build.contains("CartesianProduct"),
      "q135: encode must never plan a cartesian")
    assert(!q135Build.contains("Exchange hashpartitioning"),
      "q135: encode must be exchange-free")
    val q135Plan = graft.SparkEntry.queries("q135_pq_codes")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!q135Plan.contains("Exchange hashpartitioning") &&
      !q135Plan.contains("CartesianProduct"),
      "q135: staged-code scan must stay exchange-free")
    val q136Plan = graft.SparkEntry.queries("q136_pq_ann")(spark, dir)
      .queryExecution.executedPlan.toString
    val q136Ex = q136Plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(q136Ex == 1,
      s"q136: expected exactly the qid rank-window exchange, found $q136Ex")
    assert(!q136Plan.contains("CartesianProduct"),
      "q136: ADC scoring must never plan a cartesian")
    println("===== q135/q136 PQ ZERO-EXCHANGE ASSERT OK")
    // q137: IVF-PQ adds exactly ONE more rank window than q136 (probe
    // selection on qid + final top-k on qid); the candidate side stays
    // codes-only broadcast scans — no corpus-keyed exchange anywhere
    val q137Plan = graft.SparkEntry.queries("q137_ivfpq_ann")(spark, dir)
      .queryExecution.executedPlan.toString
    val q137Ex = q137Plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(q137Ex == 2,
      s"q137: expected the probe + top-k qid windows only, found $q137Ex")
    assert(!q137Plan.contains("CartesianProduct"),
      "q137: IVF-PQ must never plan a cartesian")
    println("===== q137 IVFPQ TWO-WINDOW ASSERT OK")
    // q138: the rerank tier must fetch raw embeddings via broadcast
    // joins of the constant-sized shortlist — a corpus-side shuffle
    // join would defeat the two-tier design
    val q138Plan = graft.SparkEntry.queries("q138_pq_rerank")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!q138Plan.contains("SortMergeJoin"),
      "q138: rerank fetch must not shuffle the corpus")
    assert(!q138Plan.contains("CartesianProduct"),
      "q138: rerank must never plan a cartesian")
    println("===== q138 RERANK BROADCAST ASSERT OK")
    // q139: the skyline must stay the banded prefix-scan — an equi
    // (d1,d2) verdict hash-join plus a band-PARTITIONED window; the
    // naive O(n²) shape would surface as a nested-loop/cartesian, and
    // a partition-less window would mean the global-sort sweep crept in
    val q139Exec = graft.SparkEntry.queries("q139_skyline")(spark, dir)
      .queryExecution.executedPlan
    val q139Plan = q139Exec.toString
    assert(!q139Plan.contains("CartesianProduct") &&
      !q139Plan.contains("BroadcastNestedLoopJoin"),
      "q139: skyline fell back to the O(n²) dominance join")
    assert(partitionlessWindows(q139Exec).isEmpty,
      "q139: global-sort sweep crept in (partition-less window)")
    println("===== q139 SKYLINE BANDED-SCAN ASSERT OK")
    // q141: the per-round label argmax must be a hash agg, never a
    // rank window (no sort in the iteration hot loop). The registry
    // entry only exposes the final staged scan, so audit the ROUND
    // plan directly on an in-memory graph.
    val lpaEdges = spark.range(1, 8).selectExpr("id AS src", "id+1 AS dst")
    val lpaLabels = spark.range(1, 9).selectExpr("id AS node", "id AS label")
    val q141Plan = graft.queries.GraphOps.lpaRound(lpaEdges, lpaLabels)
      .queryExecution.executedPlan.toString
    assert(!q141Plan.contains("Window"),
      "q141: per-node argmax planned a window instead of max(struct)")
    // (SMJ vs BHJ is a size call — either is fine; the shuffle is the
    // node-sized label state, never the edge stream)
    assert(!q141Plan.contains("CartesianProduct"),
      "q141: round label-carry join must stay equi-keyed")
    println("===== q141 LPA ROUND HASH-ARGMAX ASSERT OK")
    // q142: rule scoring joins stay equi-keyed; N rides a broadcast
    // 1-row cross join (the only nested-loop allowed)
    val q142Plan = graft.SparkEntry.queries("q142_assoc_rules")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!q142Plan.contains("CartesianProduct"),
      "q142: association rules must never plan a cartesian")
    println("===== q142 ASSOC EQUI-JOIN ASSERT OK")
    // q205: the top-10 must be TakeOrderedAndProject (per-partition
    // top-k + driver merge), never a global Sort; all three filters
    // reach their scans as PushedFilters
    val q205Exec = graft.SparkEntry.queries("q205_shipping_priority")(
      spark, dir).queryExecution.executedPlan
    val q205Plan = q205Exec.toString
    assert(q205Plan.contains("TakeOrderedAndProject"),
      "q205: top-10 planned a global sort instead of TakeOrdered")
    assert(q205Plan.contains("PushedFilters: [IsNotNull(c_mktsegment), " +
      "EqualTo(c_mktsegment,BUILDING)")
      || q205Plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      "q205: segment filter did not reach the customer scan")
    assert(q205Plan.contains("LessThan(o_orderdate")
      && q205Plan.contains("GreaterThan(l_shipdate"),
      "q205: date filters did not reach the orders/lineitem scans")
    println("===== q205 TAKEORDERED + PUSHDOWN ASSERT OK")
    // q206: region and nation ride broadcasts; the locality predicate
    // is an equi-condition inside the supplier join, never a
    // post-filter (no cartesian, no nested loop)
    val q206Plan = graft.SparkEntry.queries("q206_local_supplier_volume")(
      spark, dir).queryExecution.executedPlan.toString
    assert(q206Plan.contains("BroadcastHashJoin"),
      "q206: dim joins lost their broadcast")
    assert(!q206Plan.contains("CartesianProduct") &&
      !q206Plan.contains("BroadcastNestedLoopJoin"),
      "q206: locality predicate fell out of the equi-join")
    println("===== q206 SNOWFLAKE BROADCAST ASSERT OK")
    // q220: the pair-IN filters reach the scans (nation prunes before
    // its broadcast; the lineitem date range prunes the fact scan) and
    // the cross-side inequality never degrades the joins to a
    // nested-loop or cartesian
    val q220Plan = graft.SparkEntry.queries("q220_nation_pair_trade")(
      spark, dir).queryExecution.executedPlan.toString
    assert(q220Plan.contains("In(n_name"),
      "q220: nation pair IN filter did not reach the nation scan")
    assert(q220Plan.contains("GreaterThanOrEqual(l_shipdate")
      && q220Plan.contains("LessThan(l_shipdate"),
      "q220: ship-date range did not reach the lineitem scan")
    assert(!q220Plan.contains("CartesianProduct") &&
      !q220Plan.contains("BroadcastNestedLoopJoin"),
      "q220: pair disjunction degraded a join")
    println("===== q220 PAIR-PUSHDOWN ASSERT OK")
    // q221: the HAVING-max decorrelation must have NO global sort and
    // the 1-row max must ride a broadcast back over the per-supplier agg
    val q221Plan = graft.SparkEntry.queries("q221_top_supplier")(
      spark, dir).queryExecution.executedPlan.toString
    assert(!q221Plan.contains("Sort "),
      "q221: scalar-max decorrelation planned a sort")
    assert(q221Plan.contains("BroadcastHashJoin"),
      "q221: global max did not broadcast back")
    println("===== q221 SCALAR-MAX BROADCAST ASSERT OK")
    // q223: top-100 must be TakeOrderedAndProject, and the qty HAVING
    // agg must run before the dimension joins
    val q223Plan = graft.SparkEntry.queries("q223_large_volume_customers")(
      spark, dir).queryExecution.executedPlan.toString
    assert(q223Plan.contains("TakeOrderedAndProject"),
      "q223: top-100 planned a global sort instead of TakeOrdered")
    println("===== q223 TAKEORDERED ASSERT OK")
    // q224: the derived per-side envelopes reach both scans even though
    // the exact OR references both join sides
    val q224Plan = graft.SparkEntry.queries("q224_disjunctive_revenue")(
      spark, dir).queryExecution.executedPlan.toString
    assert(q224Plan.contains("In(p_brand"),
      "q224: brand-union envelope did not reach the part scan")
    assert(q224Plan.contains("GreaterThanOrEqual(l_quantity")
      && q224Plan.contains("LessThanOrEqual(l_quantity"),
      "q224: quantity envelope did not reach the lineitem scan")
    println("===== q224 DISJUNCTION-ENVELOPE PUSHDOWN ASSERT OK")
    // q225: the NOT-EXISTS decorrelation must plan a LEFT ANTI join and
    // the date filter must reach the orders scan before the anti probe
    val q225Plan = graft.SparkEntry.queries("q225_dormant_customers")(
      spark, dir).queryExecution.executedPlan.toString
    assert(q225Plan.contains("LeftAnti"),
      "q225: NOT EXISTS did not plan a left-anti join")
    assert(q225Plan.contains("GreaterThanOrEqual(o_orderdate"),
      "q225: date filter did not reach the orders scan")
    println("===== q225 ANTI-JOIN + PUSHDOWN ASSERT OK")
    // q238 (round 17 shape): the d semi-join probes are FUSED into one
    // broadcast bitmap row tested with element_at shift/AND — the fact
    // side must plan NO join at all for membership (no LeftSemi
    // anywhere), only the single broadcast left-outer verification;
    // still no sort-merge and no cartesian (the 1-row bitmap rides a
    // broadcast nested-loop, which is not a CartesianProduct node)
    val q238Plan = graft.SparkEntry.queries("q238_bloom_semijoin")(
      spark, dir).queryExecution.executedPlan.toString
    val q238Semis = q238Plan.linesIterator.count(_.contains("LeftSemi"))
    val q238Truth = q238Plan.linesIterator.count(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftOuter"))
    val q238Bitmap = q238Plan.linesIterator.count(l =>
      l.contains("element_at") && l.contains("shiftleft"))
    assert(q238Semis == 0,
      s"q238: membership must be the fused bitmap test, found " +
        s"$q238Semis semi-join probes")
    assert(q238Bitmap >= 1,
      "q238: the broadcast-bitmap element_at/shiftleft probe is missing")
    assert(q238Truth >= 1,
      "q238: the verification must be ONE broadcast left-outer marked " +
        "join (a semi branch would re-run the whole probe chain)")
    assert(!q238Plan.contains("SortMergeJoin"),
      "q238: a bloom probe fell back to a sort-merge join")
    assert(!q238Plan.contains("CartesianProduct"),
      "q238: bloom probe planned a cartesian")
    println("===== q238 BLOOM FUSED-BITMAP ASSERT OK")
    spark.stop()
  }
}
