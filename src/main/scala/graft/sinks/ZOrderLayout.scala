package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) WRITER — the layout half of q147's zone-map audit
  * (round-10 verdict item 6: "the layout story is audit-only").
  * q147 proves that contiguous Morton ranges are small rectangles in
  * both scan dimensions; this writer actually lands a table in that
  * order (`repartitionByRange` on the Morton key + an in-partition
  * sort), and [[fileZoneMap]]/[[overlappingFiles]] measure the payoff
  * the way an engine's file-skipping would: per-FILE min/max column
  * stats vs a predicate box. The A/B against a 1-D sort layout is
  * asserted in ZOrderLayoutSpec and recorded in BASELINE.md: the
  * z-layout prunes files under predicates on EITHER dimension, where
  * the 1-D layout prunes only its own sort column and must read every
  * file for the other.
  *
  * At 100 TB this is exactly Delta/Iceberg `Z-ORDER BY`: the Morton
  * key is computed per row (pure integer bit-interleave, no UDF), the
  * range-partition boundaries come from Spark's reservoir sketch over
  * the key (one extra pass over the sort column — the standard
  * repartitionByRange cost), and every file's footer min/max on the
  * bucketed dims is the zone map readers prune with.
  */
object ZOrderLayout {

  /** The Σ ((v DIV 2ⁱ) % 2)·4ⁱ bit-interleave terms over two already-
    * bucketed non-negative integer columns — shared with q147's audit
    * so writer and audit can never disagree on the key. DIV/% on
    * non-negative BIGINTs evaluate identically in Spark SQL and DuckDB
    * (`//` there). */
  def mortonTerms(xCol: String, yCol: String, bits: Int = 8): String =
    (0 until bits).map { i =>
      val p2 = 1L << i
      val p4 = 1L << (2 * i)
      s"($xCol DIV $p2 % 2) * $p4 + ($yCol DIV $p2 % 2) * ${2 * p4}"
    }.mkString(" + ")

  /** Append bucketed dims (`zx`, `zy` — pmod into [0, 2^bits)) and the
    * interleaved Morton key `z`. */
  def withMorton(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 8): DataFrame = {
    val buckets = 1L << bits
    df.withColumn("zx", pmod(col(xCol).cast("long"), lit(buckets)))
      .withColumn("zy", pmod(col(yCol).cast("long"), lit(buckets)))
      .withColumn("z", expr(mortonTerms("zx", "zy", bits)))
  }

  /** Write `df` Z-ordered on (xCol, yCol) into `nFiles` parquet files:
    * range-partition on the Morton key, sort within each partition, so
    * every file holds one contiguous z range — a ~square tile in
    * (zx, zy) space whose footer min/max bound BOTH dimensions. */
  /** `blockSize` overrides parquet.block.size — the ROW-GROUP size.
    * Production leaves the default (~128 MB); the row-group skipping
    * audits shrink it so test-scale files carry many row groups. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
      outDir: String, nFiles: Int, bits: Int = 8,
      blockSize: Option[Long] = None): Unit = {
    val w = withMorton(df, xCol, yCol, bits)
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite")
    blockSize.fold(w)(b => w.option("parquet.block.size", b.toString))
      .parquet(outDir)
  }

  /** The 1-D baseline: same bucketed dims, laid out by `zx` alone. */
  def writeSorted1D(df: DataFrame, xCol: String, yCol: String,
      outDir: String, nFiles: Int, bits: Int = 8,
      blockSize: Option[Long] = None): Unit = {
    val w = withMorton(df, xCol, yCol, bits)
      .repartitionByRange(nFiles, col("zx"))
      .sortWithinPartitions(col("zx"))
      .write.mode("overwrite")
    blockSize.fold(w)(b => w.option("parquet.block.size", b.toString))
      .parquet(outDir)
  }

  /** Per-FILE min/max stats for `cols` over a written layout — the
    * zone map a file-skipping reader consults, derived in ONE scan via
    * input_file_name(). (Footer statistics carry the same values; this
    * derivation keeps the audit engine-portable.) */
  def fileZoneMap(spark: SparkSession, dir: String,
      cols: Seq[String]): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)

  /** How many files a reader must open for a conjunctive box
    * predicate, given the zone map: a file survives iff its [min,max]
    * interval overlaps the predicate range on EVERY bounded column. */
  def overlappingFiles(zoneMap: DataFrame,
      box: Seq[(String, Long, Long)]): Long =
    box.foldLeft(zoneMap) { case (zm, (c, lo, hi)) =>
      zm.filter(!(col(s"max_$c") < lo || col(s"min_$c") > hi))
    }.count()

  /** Per-ROW-GROUP [min,max] stats for integer `cols` over a written
    * layout, read straight from the parquet footers (parquet-mr,
    * driver-side, bounded by file count × row groups per file). At
    * 100 TB with ~1 GB files the ROW GROUP — not the file — is the
    * skipping unit that matters: Spark's vectorized reader prunes row
    * groups against exactly these statistics, so this is the zone map
    * the landed order actually buys a reader (round-11 verdict item
    * 7 — the intra-file half of the file-level A/B). */
  def rowGroupZoneMap(spark: SparkSession, dir: String,
      cols: Seq[String]): Seq[Map[String, (Long, Long)]] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).toSeq
      .filter(f => f.getPath.getName.endsWith(".parquet"))
      .flatMap { f =>
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(f.getPath, conf))
        try {
          reader.getFooter.getBlocks.asScala.toSeq.map { block =>
            cols.map { c =>
              val chunk = block.getColumns.asScala
                .find(_.getPath.toDotString == c)
                .getOrElse(sys.error(s"no column chunk for $c"))
              val st = chunk.getStatistics
              c -> (st.genericGetMin.asInstanceOf[Number].longValue(),
                st.genericGetMax.asInstanceOf[Number].longValue())
            }.toMap
          }
        } finally reader.close()
      }
  }

  /** How many row groups survive a conjunctive box predicate under the
    * footer zone map — [[overlappingFiles]]'s intra-file sibling. */
  def overlappingRowGroups(rgMap: Seq[Map[String, (Long, Long)]],
      box: Seq[(String, Long, Long)]): Int =
    rgMap.count(rg => box.forall { case (c, lo, hi) =>
      val (mn, mx) = rg(c)
      !(mx < lo || mn > hi)
    })
}
