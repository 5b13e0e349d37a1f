package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Staged-file source utilities (SURVEY.md §2.A.1; reference
  * /root/reference/dags/wine_etl_kaggle.py:46-64): extract stages files
  * into a directory, downstream discovers them by glob with an explicit
  * missing-file error, reads with a DECLARED schema (no inference pass —
  * at 100 TB schema inference is a full extra read), and cleanup deletes
  * the staging area after a successful load (`:206-223`).
  */
object Staged {

  /** Glob the staging area; throw the reference's explicit
    * FileNotFoundError equivalent when nothing matches (`:60-62`). */
  def globAssert(spark: SparkSession, pattern: String): Seq[String] = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    if (matches.isEmpty)
      throw new java.io.FileNotFoundException(
        s"No staged files matching $pattern")
    matches.map(_.getPath.toString)
  }

  /** Whole-array JSON (the Kaggle wine file shape): one JSON array →
    * multiLine, declared schema. */
  def readJsonArray(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("multiLine", true).json(path)

  /** Line-delimited JSON (the scalable shape — splittable). */
  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Header CSV with declared schema (reference re-reads its
    * inter-stage CSVs this way, `:102,170`). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", true).csv(path)

  /** Recursive staging cleanup: per-child delete with warnings on
    * failure, missing dir tolerated — the reference's semantics
    * (`:206-223`). Returns the deleted paths. */
  def cleanup(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      System.err.println(s"[staged] staging dir $dir does not exist; nothing to clean")
      return Seq.empty
    }
    fs.listStatus(p).toSeq.flatMap { st =>
      val child = st.getPath
      try {
        // Hadoop FileSystems report most failures via a false return, not
        // an exception — treat both as "not deleted" and warn
        if (fs.delete(child, true)) Seq(child.toString)
        else {
          System.err.println(s"[staged] could not delete $child: delete returned false")
          Seq.empty
        }
      } catch {
        case e: Exception =>
          System.err.println(s"[staged] could not delete $child: ${e.getMessage}")
          Seq.empty
      }
    }
  }
}
