package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout (SURVEY.md §4.4 / engine posture): pre-shuffle
  * fact tables ONCE at write time into N buckets on the join key, sorted
  * within buckets — every subsequent equi-join or aggregation on that key
  * runs shuffle-free (bucket i joins bucket i, already sorted for SMJ).
  *
  * This is the biggest repeated-query win at 100 TB: the
  * orders⋈lineitem shuffle disappears from every query that joins on
  * the bucket key. The cost is paid once at ingest.
  */
object Bucketing {

  /** Write a DataFrame as a bucketed+sorted managed table. Idempotent:
    * drops a pre-existing table AND clears an orphaned location left by
    * an earlier session (the in-memory catalog forgets tables on
    * restart but their warehouse directories persist). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Co-located join of two tables bucketed on their join keys: with
    * matching bucket counts Spark plans SortMergeJoin with NO Exchange
    * on either side. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable).join(spark.table(rightTable),
      col(leftKey) === col(rightKey))
  }
}
