package graft.tools

import org.apache.spark.sql.functions._

/** 10×-GRAPH dry-run for the round-10 traversal family: replicates the
  * sf0.1 basket set into R id-shifted DISJOINT copies (unlike a plain
  * row replication, which the per-order `distinct` would collapse back
  * to the same edge set), so node count, edge count AND component
  * count all grow ×R — the honest "bigger graph", not just "more rows
  * scanned". labelProp/assocRules/itemCf process EVERY replica (true
  * ×R work). The single-seed traversals only walk replica 0's
  * component on a disjoint-replica graph: BFS is excluded outright,
  * and weightedPaths' ratio measures the ×R EDGE-STREAM scan cost
  * around an unchanged frontier — read it as scan scaling, not
  * traversal scaling (its per-round state stays node-of-one-component
  * sized by design).
  */
object MiningScaleDryRun {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = 10
    val base = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("part"))
    // disjoint replicas: shift both ids by a replica offset far above
    // the fixture key range
    val big = spark.range(reps).crossJoin(base)
      .select((col("ok") + col("id") * lit(1000000000L)).as("ok"),
        (col("part") + col("id") * lit(10000000L)).as("part"))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    for ((name, df) <- Seq("1x" -> base, s"${reps}x" -> big)) {
      time(s"labelProp $name") {
        graft.queries.GraphOps.labelProp(df).count()
      }
      time(s"weightedPaths $name") {
        // fixed 4 rounds: the dry-run measures per-round edge-scan
        // growth, so the round count must not vary with the dataset
        graft.queries.GraphOps.weightedPaths(df, maxRounds = 4).count()
      }
      time(s"assocRules $name") {
        graft.queries.Mining.assocRules(df).count()
      }
      time(s"itemCf $name") {
        graft.queries.Mining.itemCf(df).count()
      }
    }

    // ---- q139 skyline band-width study (round-10 verdict item 4):
    // B trades driver carry state (B rows collected) against in-band
    // sort width (~distinct-d1/B rows per window partition). Parts are
    // replicated with per-replica price offsets so distinct d1 (the
    // window's sort input) really grows ×R. ----
    val part0 = graft.Tables.part(spark, dir)
      .select(col("p_partkey"),
        col("p_retailprice").cast("double").as("p_retailprice"),
        col("p_size").cast("long").as("p_size"))
    def parts(m: Int) =
      (0 until m).map { k =>
        if (k == 0) part0
        else part0.select((col("p_partkey") + lit(k * 10000000L)).as("p_partkey"),
          (col("p_retailprice") + lit(k * 0.003)).as("p_retailprice"),
          col("p_size"))
      }.reduce(_ unionByName _).repartition(32)
    for (m <- Seq(1, 10); b <- Seq(8, 64, 512)) {
      time(s"skyline B=$b ${m}x") {
        graft.queries.Mining.skyline(parts(m), "p_retailprice", "p_size",
          bands = b).count()
      }
    }

    // ---- q145 entity resolution under a DUPLICATE-DENSE corpus: every
    // doc gets depth−1 near-copies sharing its 32-char prefix, so the
    // fuzzy blocks grow ×depth and in-block candidate pairs ×depth² —
    // the block-bound stress (components become depth-sized cliques;
    // CC still converges in O(1) rounds). ----
    val docs0 = graft.Tables.documentsParallel(spark, dir)
      .filter(col("text").isNotNull)
    def denseDocs(depth: Int) =
      (0 until depth).map { k =>
        if (k == 0) docs0
        else docs0.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" salt$k")).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _).repartition(32)
    time("entityResolve 1x") {
      graft.queries.Mining.entityResolve(docs0).count()
    }
    time("entityResolve dup-dense 5x") {
      graft.queries.Mining.entityResolve(denseDocs(5)).count()
    }

    // ---- q148 composed pipeline under near-dup inflation: input ×5
    // (each doc + 4 salted near-copies, J ≈ 0.93 — the crawl-dup
    // shape), dedup collapses the copies, downstream stages see ~1×.
    // The measure is the seam claim: pipeline cost ≈ dedup cost at the
    // inflated size + unchanged downstream, never ×5 everywhere. ----
    time("curationPipeline 1x") {
      graft.queries.Curation.curationPipeline(docs0).count()
    }
    time("curationPipeline near-dup 5x") {
      graft.queries.Curation.curationPipeline(denseDocs(5)).count()
    }

    // ---- q148 ROW-scale leg (round-11 verdict item 6): ×10 docs at a
    // FIXED dup rate — disjoint id-shifted replicas with a per-replica
    // salt token, so the corpus grows ×10 while the within-replica
    // duplicate structure (the fixture's own dup rate) is preserved.
    // Per-stage timings name which stage dominates growth: dedup label
    // building is block-bounded pair generation (grows with rows ×
    // per-block density), the boilerplate join is vocabulary-bounded
    // on its reduce side but scans ×10 shingles. ----
    def rowDocs(m: Int) =
      (0 until m).map { k =>
        if (k == 0) docs0
        else docs0.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          concat(col("text"), lit(s" rep$k")).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _).repartition(32)
    for ((name, m) <- Seq("1x" -> 1, "10x" -> 10)) {
      val df = rowDocs(m)
      time(s"q148 stage dedup-labels $name") {
        graft.ext.DedupCluster.clusters(df).count()
      }
      time(s"q148 stage cascade-boiler $name") {
        graft.queries.CorpusOps.boilerplateScore(df).count()
      }
      time(s"q148 full pipeline $name") {
        graft.queries.Curation.curationPipeline(df).count()
      }
    }

    // ---- q151 incremental curation: FIXED daily batch against a ×10
    // lake — the claim under test is that daily maintenance cost
    // follows the BATCH (the corpus side is touched-key semi-joined
    // and scanned once for its hot-set statistic), so the ratio should
    // track the corpus SCAN growth, never ×10 work per batch doc. The
    // replica id shift is ≡ 0 mod 10, so the %10 batch/corpus split
    // survives replication. ----
    val batch151 = docs0.filter(col("doc_id") % 10 === 7)
    val bench151 = docs0.filter(col("doc_id") % 97 === 0)
    for ((name, m) <- Seq("1x" -> 1, "10x" -> 10)) {
      val corp = rowDocs(m).filter(col("doc_id") % 10 =!= 7)
      time(s"q151 incremental fixed-batch corpus-$name") {
        graft.queries.Curation
          .incrementalCuration(batch151, corp, bench151).count()
      }
    }

    // ---- q146 sequential patterns at 10× users (type vocabulary
    // constant — the declared |vocab|²-per-user fan-out bound). ----
    val ev0 = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    def evBig(m: Int) =
      (0 until m).map { k =>
        if (k == 0) ev0
        else ev0.withColumn("user_id",
          col("user_id") + lit(k * 1000000000L))
      }.reduce(_ unionByName _).repartition(32)
    time("seqPatterns 1x") {
      graft.queries.Mining.seqPatterns(evBig(1)).count()
    }
    time("seqPatterns 10x") {
      graft.queries.Mining.seqPatterns(evBig(10)).count()
    }
    spark.stop()
  }
}
