package graft.operators

import java.io.File
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.DataFrame

/** Materialization barrier for multi-use intermediates (sketches,
  * signature tables) that feed self-joins: writes the DataFrame to a
  * JVM-scoped temp parquet directory and reads it back.
  *
  * Why not `persist()`: a cached block inside a query closure either
  * leaks into the caller's session (persist-without-unpersist) or, if
  * unpersisted before the caller materializes the result, silently
  * recomputes the subplan per join side. Staging to parquet gives the
  * same evaluate-once guarantee with no session cache state — and it is
  * the pattern that actually survives 100 TB, where a sketch table is
  * staged to distributed storage (here: a local temp dir) rather than
  * pinned in executor memory.
  *
  * The temp root is deleted on JVM shutdown; each call gets a fresh
  * subdirectory, so concurrent queries never collide.
  */
object Stage {

  private lazy val root: File = {
    val dir = Files.createTempDirectory("graft-stage-").toFile
    sys.addShutdownHook(deleteRecursively(dir))
    dir
  }
  private val counter = new AtomicLong()

  private def deleteRecursively(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Write `df` once and return a scan over the staged bytes. Spark
    * round-trips its Catalyst schema (including ML vector UDTs) through
    * the parquet footer metadata, so the staged frame is
    * schema-identical to the input. */
  def materialize(df: DataFrame, hint: String = "stage"): DataFrame = {
    val path = new File(root, s"$hint-${counter.incrementAndGet()}").getAbsolutePath
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }
}
