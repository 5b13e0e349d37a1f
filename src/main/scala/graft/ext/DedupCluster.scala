package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Duplicate clustering — connected components over the near-dup pair
  * graph (SURVEY.md §2.D): the step a production dedup pipeline runs
  * AFTER pair generation, turning pairwise evidence (exact-hash matches,
  * Jaccard pairs) into transitive duplicate groups so one canonical doc
  * per group survives.
  *
  * Algorithm: iterative min-label propagation over the undirected edge
  * set — every round each doc adopts the smallest cluster id among
  * itself and its neighbors; fixpoint = min doc_id of the connected
  * component, a deterministic canonical id (oracle-checkable via a
  * recursive CTE). Rounds needed = component diameter, and dedup
  * components are near-cliques (every member pairs with most others),
  * so 2–3 rounds suffice in practice; the loop is capped and each
  * round's labels are staged (lineage barrier) so plans don't grow
  * exponentially. At extreme diameters the alternating
  * large-star/small-star formulation (same joins, O(log n) rounds)
  * drops in without changing the contract.
  */
object DedupCluster {

  /** Undirected dedup edges: exact content-hash duplicates plus
    * source-blocked 3-gram Jaccard pairs at `threshold`. */
  def edges(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    // null-text docs are NOT duplicates of each other: Spark's groupBy
    // would collapse the null hash group into one cluster, while SQL
    // equality (the oracle, and the sane semantics) never matches NULLs
    val hashed = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    // STAR edges for exact duplicates (each doc -> its hash group's min
    // id), not the all-pairs self-join: a 10k-deep duplicate group is
    // 10k-1 edges instead of ~50M, and the connected components are
    // identical (every group member reaches the same root)
    val canon = hashed.groupBy(col("h")).agg(min(col("doc_id")).as("root"))
    val exactPairs = hashed.join(canon, "h")
      .filter(col("root") =!= col("doc_id"))
      .select(col("root").as("ea"), col("doc_id").as("eb"))
    val nearPairs = graft.queries.TextOps.jaccardPairs(docs, threshold)
      .select(col("doc_a").as("ea"), col("doc_b").as("eb"))
    val und = exactPairs.union(nearPairs).distinct()
    und.union(und.select(col("eb").as("ea"), col("ea").as("eb")))
  }

  /** (doc_id, cluster_id) for every doc; cluster_id = min doc_id in the
    * doc's connected component (singletons cluster with themselves). */
  def clusters(docs: DataFrame, threshold: Double = 0.5,
      maxRounds: Int = 20): DataFrame = {
    val e = graft.operators.Stage.materialize(
      edges(docs, threshold), "dedup-edges")
    var labels = graft.operators.Stage.materialize(
      docs.select(col("doc_id"),
        col("doc_id").as("cluster_id")), "dedup-labels")
    var round = 0
    var changed = 1L
    while (changed > 0 && round < maxRounds) {
      val nbrMin = e.join(labels, col("ea") === col("doc_id"))
        .groupBy(col("eb")).agg(min(col("cluster_id")).as("nbr_min"))
      // prev label rides along in the staged output, so convergence is a
      // cheap filter-count over the staged bytes, not another join
      val next = graft.operators.Stage.materialize(
        labels.join(nbrMin, col("doc_id") === col("eb"), "left")
          .select(col("doc_id"), col("cluster_id").as("prev_id"),
            least(col("cluster_id"),
              coalesce(col("nbr_min"), col("cluster_id"))).as("cluster_id")),
        s"dedup-labels-$round")
      changed = next.filter(col("cluster_id") =!= col("prev_id")).count()
      labels = next.select(col("doc_id"), col("cluster_id"))
      round += 1
    }
    // never return silently-wrong labels: a component with diameter >
    // maxRounds must fail loudly (raise maxRounds, or switch to the
    // large-star/small-star formulation for pathological chain graphs)
    require(changed == 0,
      s"dedup clustering did not converge within $maxRounds rounds " +
        s"($changed labels still changing) — component diameter exceeds " +
        "maxRounds; raise it or use a star-contraction variant")
    labels
  }

  /** q49 — duplicate clusters over `documents`: transitive closure of
    * exact-hash + Jaccard(0.5) pairs, canonical min-id labels. The
    * recursive-CTE oracle verifies the FULL doc→cluster map, and the
    * fixture fuzzer (duplicated docs) exercises non-trivial clusters. */
  val q49: Q = Q(
    "q49_dedup_clusters",
    run = { (spark, dir) =>
      clusters(Tables.documentsParallel(spark, dir))
    },
    oracle = Some("""
      WITH RECURSIVE
      hx AS (SELECT doc_id, md5(text) AS h FROM documents),
      hpairs AS (SELECT a.doc_id AS ea, b.doc_id AS eb FROM hx a JOIN hx b
                   ON a.h = b.h AND a.doc_id < b.doc_id),
      d AS (SELECT doc_id, source, string_split(text,' ') AS toks FROM documents),
      d3 AS (SELECT doc_id, source, toks, unnest(generate_series(1, len(toks)-2)) AS i
             FROM d WHERE len(toks) >= 3),
      sh AS (SELECT DISTINCT doc_id, source,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM d3),
      cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
      pairs AS (SELECT a.doc_id AS ea, b.doc_id AS eb, CAST(count(*) AS BIGINT) AS inter
                FROM sh a JOIN sh b
                  ON a.source = b.source AND a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      jpairs AS (SELECT ea, eb FROM pairs JOIN cnt ca ON ca.doc_id = ea
                   JOIN cnt cb ON cb.doc_id = eb
                 WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5),
      e0 AS (SELECT ea, eb FROM hpairs UNION SELECT ea, eb FROM jpairs),
      edges AS (SELECT ea, eb FROM e0 UNION SELECT eb, ea FROM e0),
      reach(src, dst) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.src, e.eb FROM reach r JOIN edges e ON r.dst = e.ea)
      SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src"""))

  val all: Seq[Q] = Seq(q49)
}
