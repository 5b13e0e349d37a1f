package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.VectorFunctions

/** Approximate nearest-neighbor scale path (SURVEY.md §2.D): sign-LSH
  * (random-hyperplane) bucketing over the embedding column.
  *
  * Shape: each vector gets a B-bit bucket key (sign of its dot product
  * with B fixed pseudo-random hyperplanes, computed by the codegen'd
  * vec_dot_f); queries probe their own bucket plus all Hamming-1
  * neighbors (multi-probe), and exact cosine ranks only the candidates.
  * Per-query work drops from O(N) to O(N·(B+1)/2^B) expected — the knob
  * that keeps top-k tractable at 100 TB, at bounded recall cost
  * (recall vs the exact q25 is asserted in tests).
  *
  * Hyperplanes are seeded deterministically (fixed RNG seed), so results
  * are reproducible run to run.
  */
object Similarity {
  /** 16 buckets + Hamming-1 multiprobe → each query scans ~5/16 of the
    * corpus. The fixture embeddings are near-random (max cosine ≈ 0.47),
    * the adversarial case for LSH — real embedding corpora cluster, so
    * production would raise Bits (12–16) for a much smaller scan
    * fraction at the same recall. */
  val Bits = 4

  /** Deterministic pseudo-random hyperplanes, dim x Bits, as float
    * literal columns compatible with vec_dot_f. */
  private def hyperplanes(dim: Int): Seq[Column] = {
    val rng = new scala.util.Random(42L)
    (0 until Bits).map { _ =>
      typedlit((0 until dim).map(_ => (rng.nextGaussian()).toFloat).toArray)
    }
  }

  /** Bucket id: B sign bits packed into an int. */
  private def bucketOf(emb: Column, planes: Seq[Column]): Column =
    planes.zipWithIndex.map { case (h, i) =>
      when(graft.functions.VectorFunctions.dotF(emb, h) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** LSH-bucketed top-k: same output contract as the brute-force q25
    * (qid, nid, cos_sim, rnk) but scanning only same/adjacent buckets. */
  def lshTopK(embeddings: DataFrame, k: Int = 5, nQueries: Int = 10): DataFrame = {
    val spark = embeddings.sparkSession
    VectorFunctions.registerVecDot(spark)
    val dim = 64
    val planes = hyperplanes(dim)
    val e = embeddings
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(expr("vec_dot_f(embedding, embedding)")))
      .withColumn("bucket", bucketOf(col("embedding"), planes))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        col("nrm").as("qnrm"), col("bucket").as("qbucket"))
      // multi-probe: own bucket + every Hamming-1 flip
      .withColumn("probe", explode(array(
        lit(0) +: (0 until Bits).map(b => lit(1 << b)): _*)))
      .withColumn("probe_bucket",
        expr("cast(qbucket as int) ^ cast(probe as int)"))
      .drop("probe")
    e.join(broadcast(q), col("bucket") === col("probe_bucket") &&
        col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        (expr("vec_dot_f(embedding, qemb)") / (col("nrm") * col("qnrm")))
          .as("cos_sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos_sim").desc, col("nid"))))
      .filter(col("rnk") <= k)
  }

  /** q38 — the ANN variant of q25 (rows-only: bucketing is engine-
    * specific; recall vs exact brute force is the tested contract). */
  val q38: Q = Q(
    "q38_similarity_lsh_topk",
    run = { (spark, dir) => lshTopK(Tables.embeddings(spark, dir)) },
    oracle = None)

  val all: Seq[Q] = Seq(q38)
}
