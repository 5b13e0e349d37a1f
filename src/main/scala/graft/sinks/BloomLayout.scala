package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet BLOOM-FILTER layout — the point-lookup complement to
  * [[ZOrderLayout]]'s range story (SURVEY §2.8 q154). A lake table is
  * usually landed in arrival/date order, so footer min/max stats on a
  * high-cardinality key (order id, doc id, user id) span nearly the
  * whole key domain in EVERY row group — stats-based skipping reads
  * everything for a point probe. A per-row-group bloom filter on that
  * key restores skipping without re-sorting the table: a probe opens
  * only the row groups whose filter (probabilistically) contains the
  * key. This is exactly the parquet-mr bloom feature Spark exposes via
  * `parquet.bloom.filter.enabled#<col>` write options and consults in
  * its row-group filtering (`parquet.filter.bloom.enabled`, on by
  * default) — the writer here just turns it on for a named column and
  * the probe helpers read the landed filters back footer-by-footer so
  * the payoff is measurable, the same way [[ZOrderLayout.rowGroupZoneMap]]
  * measures min/max skipping.
  *
  * At 100 TB: blooms cost ~1.2 MB per 1M distinct keys per row group
  * at 1% FPP (paid once at write), and every point/IN probe over an
  * un-sorted key skips from "all row groups whose [min,max] straddles
  * the key" (≈ all of them) down to "row groups that actually contain
  * it, plus FPP false positives". The layout stays sorted by its
  * natural (date) column, so range scans on date KEEP their stats
  * pruning — bloom adds the second access path for free. */
object BloomLayout {

  /** Land `df` range-partitioned + sorted on `sortCol` (the natural
    * lake order) with a bloom filter on `bloomCol` in every row group.
    * `expectedNdv` sizes the filter (distinct keys per ROW GROUP is
    * the right ballpark; overshooting only costs bytes). `blockSize`
    * shrinks row groups for test-scale skipping evidence — production
    * keeps the default. */
  def writeBloomIndexed(df: DataFrame, sortCol: String, bloomCol: String,
      outDir: String, nFiles: Int, expectedNdv: Long,
      blockSize: Option[Long] = None, bloom: Boolean = true): Unit = {
    val base = df
      .repartitionByRange(nFiles, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode("overwrite")
    val withBloom =
      if (bloom)
        base.option(s"parquet.bloom.filter.enabled#$bloomCol", "true")
          .option(s"parquet.bloom.filter.expected.ndv#$bloomCol",
            expectedNdv.toString)
      else base
    blockSize.fold(withBloom)(b =>
      withBloom.option("parquet.block.size", b.toString)).parquet(outDir)
  }

  /** Per-probe-key row-group skipping A/B over a landed layout, read
    * straight from the parquet footers (driver-side, bounded by files ×
    * row groups): for each key, how many row groups a reader must open
    * under min/max STATS alone vs stats + BLOOM, and how many truly
    * contain the key (the floor no skipping scheme can beat; bloom may
    * exceed it only by false positives, never miss it — asserted in
    * BloomLayoutSpec). Layouts written without a bloom filter report
    * bloom == stats (a null filter can't exclude anything). */
  def rowGroupBloomProbe(spark: SparkSession, dir: String, column: String,
      keys: Seq[Long]): Seq[BloomProbeResult] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    // (min, max, bloomOrNull) per row group, one footer pass
    val groups = fs.listStatus(root).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .flatMap { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(f.getPath, conf))
        try {
          reader.getFooter.getBlocks.asScala.toSeq.map { block =>
            val chunk = block.getColumns.asScala
              .find(_.getPath.toDotString == column)
              .getOrElse(sys.error(s"no column chunk for $column"))
            val st = chunk.getStatistics
            val bloom = reader.getBloomFilterDataReader(block)
              .readBloomFilter(chunk)
            val hashes = keys.map(k =>
              k -> Option(bloom).map(_.hash(k))).toMap
            (st.genericGetMin.asInstanceOf[Number].longValue(),
              st.genericGetMax.asInstanceOf[Number].longValue(),
              Option(bloom),
              hashes)
          }
        } finally reader.close()
      }
    keys.map { k =>
      val statsPass = groups.filter { case (mn, mx, _, _) =>
        mn <= k && k <= mx }
      val bloomPass = statsPass.filter { case (_, _, bloom, hashes) =>
        bloom.forall(_.findHash(hashes(k).get)) }
      BloomProbeResult(k, groups.size, statsPass.size, bloomPass.size)
    }
  }

  final case class BloomProbeResult(key: Long, totalRowGroups: Int,
      statsSurvivors: Int, bloomSurvivors: Int)
}
