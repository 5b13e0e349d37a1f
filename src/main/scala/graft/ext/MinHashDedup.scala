package graft.ext

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** MinHash-LSH near-duplicate detection (SURVEY.md §2.D) — the
  * sub-quadratic 100 TB path: shingle → binary HashingTF vector →
  * MinHash signatures → LSH band-bucket join. Spark ML's
  * `approxSimilarityJoin` shuffles only on band-hash buckets, so the
  * candidate set is |bucket|²-bounded rather than N². Not oracle-checked
  * (approximate, hash-seed-dependent); its recall against the exact
  * Jaccard query (q24) is asserted in unit tests.
  */
object MinHashDedup {

  /** q30 — near-dup candidate pairs with MinHash-estimated Jaccard
    * distance <= 0.5 (i.e. similarity >= 0.5). Deterministic given the
    * fixed seed. */
  val q30: Q = Q(
    "q30_dedup_minhash_lsh",
    run = { (spark, dir) =>
      // Shingle (3-gram) sets, not raw token sets: the fixture vocabulary
      // is tiny, so token-set Jaccard is high for nearly every pair;
      // shingles recover the same near-dup semantics as the exact q24.
      val docs = Tables.documentsParallel(spark, dir)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"),
          graft.functions.TextFunctions.shinglesExpr("toks", 3).as("shingles"))
      val tf = new HashingTF()
        .setInputCol("shingles").setOutputCol("features")
        .setBinary(true).setNumFeatures(1 << 18)
      val feat = tf.transform(docs)
      // 6 hash tables: p(candidate | J=0.5) = 1-(1-0.5)^6 ≈ 98% — the
      // recall/cost knee; the fixtures' planted near-dups (J≈0.97) are
      // recalled with probability ~1.
      val mh = new MinHashLSH()
        .setInputCol("features").setOutputCol("hashes")
        .setNumHashTables(6).setSeed(42L)
      val model = mh.fit(feat)
      // self-join: materialize the hashed side once or the whole
      // shingle→TF→minhash pipeline is re-evaluated for BOTH join inputs
      // (signatures are ~100 bytes/doc — at 100 TB of docs this is the
      // standard stage-the-sketch pattern). Staged to temp parquet, not
      // persist(): no cached blocks leak into the caller's session.
      val hashed = graft.operators.Stage.materialize(
        model.transform(feat).select("doc_id", "features", "hashes"), "minhash")
      model.approxSimilarityJoin(hashed, hashed, 0.5, "jaccard_dist")
        .select(
          col("datasetA.doc_id").as("doc_a"),
          col("datasetB.doc_id").as("doc_b"),
          col("jaccard_dist"))
        .filter(col("doc_a") < col("doc_b"))
    },
    oracle = None)

  val all: Seq[Q] = Seq(q30)
}
