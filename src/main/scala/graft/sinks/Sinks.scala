package graft.sinks

import org.apache.spark.sql.DataFrame

/** Sink utilities (SURVEY.md §2.A.4): CSV / parquet / JDBC writers with
  * the reference's observable behaviors made explicit — header CSV
  * without an index column (pandas to_csv(index=False),
  * wine_etl_kaggle.py:92-93), JDBC append with an explicit DDL type map
  * (`:167-202`), and overwrite-vs-append as a caller decision (the
  * reference's silent append-on-rerun duplication, `:199`, is opt-in).
  */
object Sinks {

  def writeCsv(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).option("header", true).csv(path)

  def writeParquet(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).parquet(path)

  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  def writeJsonLines(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** Sharded corpus writer for training pipelines: bounded-size output
    * files (`maxRecordsPerFile`) over a spread of `numShards` output
    * tasks. Round-robin repartition gives uniformly-sized shards
    * regardless of input skew; downstream loaders stream shard-by-shard
    * without any shard exceeding memory. */
  def writeSharded(df: DataFrame, path: String, numShards: Int,
      maxRecordsPerShard: Long, mode: String = "overwrite"): Unit =
    df.repartition(numShards)
      .write.mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerShard)
      .parquet(path)

  /** JDBC write with explicit column DDL (the reference's dtype map —
    * see graft.pipeline.WinePipeline.warehouseColumnTypes). */
  def jdbcWrite(df: DataFrame, url: String, table: String,
      columnTypes: String, mode: String = "append"): Unit =
    df.write.mode(mode)
      .option("createTableColumnTypes", columnTypes)
      .jdbc(url, table, new java.util.Properties())
}
