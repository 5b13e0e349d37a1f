package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout for the events table at scale (SURVEY.md §4.4):
  * parquet partitioned by event date, so any time-bounded query prunes
  * whole partitions at planning time (explain shows PartitionFilters,
  * and non-matching days are never listed, let alone read).
  *
  * At 100 TB: daily partitions keep file listing O(days), each partition
  * internally splittable; sorting within partitions by (user_id, ts)
  * makes the as-of/session window shuffles cheaper (sort locality) and
  * improves column-chunk min/max pruning for user-scoped queries.
  */
object EventsLayout {

  /** Write events partitioned by day (and sorted within partitions). */
  def writePartitionedByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"))
      .sortWithinPartitions(col("user_id"), col("ts"))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(path)

  /** Read back with partition pruning available on event_date. */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
