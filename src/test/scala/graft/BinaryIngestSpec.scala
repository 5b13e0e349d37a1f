package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.BinaryIngest
import graft.ext.Multimodal

/** The raw-file ingestion seam: binaryFile directory scan → the q34
  * decode router, with path-stable ids and listing-level glob pruning. */
class BinaryIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def writeFixtures(): String = {
    val dir = Files.createTempDirectory("binin").toFile
    dir.deleteOnExit()
    val payloads = Multimodal.syntheticMediaPayloads
    payloads.zipWithIndex.foreach { case ((_, bytes), i) =>
      val fmt = Multimodal.sniffBytes(bytes)
      val ext = if (fmt == "bmp" || fmt == "wav") fmt else "bin"
      Files.write(Paths.get(dir.getAbsolutePath, f"m$i%02d.$ext"), bytes)
    }
    Files.write(Paths.get(dir.getAbsolutePath, "notes.txt"),
      "not media".getBytes("UTF-8"))
    dir.getAbsolutePath
  }

  test("ingest+decode matches the direct decode router, file for file") {
    val dir = writeFixtures()
    val rows = BinaryIngest.features(spark, dir, glob = "m*")
      .select("format", "n_bytes", "width", "height", "sample_rate")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .sorted
    val expected = Multimodal.syntheticMediaPayloads.map { case (_, bytes) =>
      val f = Multimodal.decode(0L, bytes)
      (f.format, f.n_bytes, f.width, f.height, f.sample_rate)
    }.sorted
    assert(rows.toSeq == expected,
      "file-roundtripped features diverge from in-memory decode")
    // the real decoders ran, not just the stub router
    assert(rows.exists(_._1 == "bmp") && rows.exists(_._1 == "wav"))
  }

  test("doc ids are path-stable across re-ingestion and independent of listing order") {
    val dir = writeFixtures()
    val a = BinaryIngest.readDir(spark, dir).select("path", "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = BinaryIngest.readDir(spark, dir).select("path", "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.toSet.size == a.size, "id collision within the directory")
    assert(a.values.forall(_ >= 0L), "ids must be non-negative")
    // relocation stability: the same files under a DIFFERENT root get
    // the same ids — ids hash the root-relative path, not the full one
    val moved = writeFixtures()
    val c = BinaryIngest.readDir(spark, moved).select("path", "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def byName(m: Map[String, Long]) =
      m.map { case (p, id) => p.substring(p.lastIndexOf('/') + 1) -> id }
    assert(byName(a) == byName(c),
      "ids changed when the corpus directory was relocated")
  }

  test("pathGlobFilter prunes at the listing: non-matching files are never read") {
    val dir = writeFixtures()
    val all = BinaryIngest.readDir(spark, dir).count()
    val media = BinaryIngest.readDir(spark, dir, glob = "m*").count()
    val none = BinaryIngest.readDir(spark, dir, glob = "*.xyz").count()
    assert(all == Multimodal.syntheticMediaPayloads.size + 1)
    assert(media == Multimodal.syntheticMediaPayloads.size)
    assert(none == 0)
  }
}
