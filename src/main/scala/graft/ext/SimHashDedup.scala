package graft.ext

import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFunctions

/** SimHash near-duplicate detection (SURVEY.md §2.D): 64-bit signature
  * per document computed in ONE projection (higher-order folds, no
  * explode/shuffle — see TextFunctions.simhash64), then banded into
  * 4×16-bit keys; docs sharing a band are Hamming-distance candidates.
  * Not oracle-checked (depends on xxhash64, which DuckDB lacks);
  * signature properties are unit-tested instead.
  */
object SimHashDedup {

  /** q31 — per-doc simhash + band keys + number of same-band candidate
    * docs (0 when no near-dup shares a band). Output is per-document so
    * the result is always non-empty. */
  val q31: Q = Q(
    "q31_dedup_simhash",
    run = { (spark, dir) =>
      TextFunctions.registerSimHash(spark)
      // staged once to temp parquet: the signature table feeds the band
      // self-join (both sides) plus the final join. A persist() here
      // would leak cached blocks to non-Bench callers; staging gives the
      // same evaluate-once guarantee with no session cache state.
      val sigs = graft.operators.Stage.materialize(
        Tables.documentsParallel(spark, dir)
        .withColumn("toks", expr("array_distinct(split(text, ' '))"))
        .select(col("doc_id"), expr("simhash64(toks)").as("simhash"),
          TextFunctions.rollingFingerprint("toks").as("rolling_fp"))
        .select(Seq(col("doc_id"), col("simhash"), col("rolling_fp")) ++
          (0 until 4).map(i =>
            shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))
              .as(s"band$i")): _*),
        "simhash")
      // same-band candidates: ONE posexplode pass (not a 4-way union that
      // would re-evaluate the signature subplan per branch); the self-join
      // shuffles the identical subplan twice → Spark reuses the exchange.
      val bands = sigs
        .select(col("doc_id"),
          posexplode(array((0 until 4).map(i => col(s"band$i")): _*)))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_key")
      val cand = bands.as("x")
        .join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
            col("x.band_key") === col("y.band_key") &&
            col("x.doc_id") =!= col("y.doc_id"))
        .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("cand_id"))
        .distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_band_candidates"))
      sigs.join(cand, Seq("doc_id"), "left")
        .na.fill(0L, Seq("n_band_candidates"))
    },
    oracle = None)

  val all: Seq[Q] = Seq(q31)
}
