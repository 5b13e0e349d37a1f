package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sinks.TarShards

/** The WebDataset-style shard sink: exact round-trip, byte-level
  * determinism across re-runs, shard-assignment law, and (when a system
  * tar exists) interop with a reader we didn't write. */
class TarShardsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def inputDf = {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        concat(lit("""{"lang":""""), col("lang"), lit(""""}"""))
          .as("meta"))
    // a couple of real media payloads: binary-safety of the tar path
    val media = spark.createDataset(Seq(
      (900001L, ext.Multimodal.pngOf(4, 4, 3, Array.fill(4)(0),
        (x, y, c) => x + y + c), """{"kind":"png"}"""),
      (900002L, ext.Multimodal.gifOf(4, 4,
        Array.tabulate(16)(i => (i, i, i)), Seq((_, _) => 5)),
        """{"kind":"gif"}""")))
      .toDF("doc_id", "payload", "meta")
    docs.unionByName(media)
  }

  test("shards round-trip every sample and follow the assignment law") {
    val dir = Files.createTempDirectory("shards").toString
    val manifest = TarShards.writeShards(inputDf, dir, 4).collect()
    assert(manifest.length == 4)
    assert(manifest.map(_.n_samples).sum == inputDf.count())
    // every doc's payload comes back byte-identical from its shard
    val want = inputDf.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    var seen = 0
    for (m <- manifest) {
      val entries = TarShards.readTar(s"$dir/shard-${"%05d".format(m.shard)}.tar")
      val byName = entries.toMap
      val ids = entries.map(_._1).filter(_.endsWith(".txt"))
        .map(n => n.dropRight(4).toLong)
      ids.foreach { id =>
        assert(math.floorMod(id, 4L) == m.shard, s"doc $id in wrong shard")
        assert(byName(s"$id.txt").toSeq == want(id).toSeq)
        assert(new String(byName(s"$id.json"), "UTF-8").startsWith("{"))
        seen += 1
      }
      // entries are doc_id-sorted within the shard (deterministic order)
      assert(ids == ids.sorted)
      // manifest byte count equals the file's real size
      assert(Files.size(Paths.get(s"$dir/shard-${"%05d".format(m.shard)}.tar"))
        == m.n_bytes)
    }
    assert(seen == inputDf.count())
  }

  test("re-running the job reproduces byte-identical shards") {
    val d1 = Files.createTempDirectory("shards_a").toString
    val d2 = Files.createTempDirectory("shards_b").toString
    TarShards.writeShards(inputDf.repartition(7), d1, 3).collect()
    TarShards.writeShards(inputDf.repartition(13), d2, 3).collect()
    for (s <- 0 until 3) {
      val a = Files.readAllBytes(Paths.get(f"$d1/shard-$s%05d.tar"))
      val b = Files.readAllBytes(Paths.get(f"$d2/shard-$s%05d.tar"))
      assert(java.util.Arrays.equals(a, b), s"shard $s bytes differ")
    }
  }

  test("a reader we didn't write can list the shards (system tar)") {
    val tarBin = Seq("/usr/bin/tar", "/bin/tar").find(p =>
      Files.isExecutable(Paths.get(p)))
    assume(tarBin.isDefined, "no system tar on this box")
    val dir = Files.createTempDirectory("shards_t").toString
    TarShards.writeShards(inputDf.limit(20), dir, 1).collect()
    val proc = new ProcessBuilder(tarBin.get, "-tf",
      s"$dir/shard-00000.tar").redirectErrorStream(true).start()
    val listing = scala.io.Source.fromInputStream(proc.getInputStream)
      .mkString
    assert(proc.waitFor() == 0, s"tar -tf failed:\n$listing")
    val names = listing.linesIterator.toSeq
    assert(names.nonEmpty && names.forall(n =>
      n.endsWith(".txt") || n.endsWith(".json")))
  }

  test("foreachBatch composes the shard sink with a stream (per-batch dirs)") {
    import org.apache.spark.sql.DataFrame
    val src = Files.createTempDirectory("shard_stream_src")
    Tables.documents(spark, TestSpark.sf0001)
      .filter(col("text").isNotNull).limit(40)
      .coalesce(1).write.mode("overwrite").parquet(src.toString)
    val outRoot = Files.createTempDirectory("shard_stream_out").toString
    val stream = spark.readStream
      .schema(Tables.documents(spark, TestSpark.sf0001).schema)
      .parquet(src.toString)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("{}").as("meta"))
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        TarShards.writeShards(batch, s"$outRoot/batch-$id", 2)
          .collect(): Unit
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain in time")
    val entries = new java.io.File(outRoot).listFiles().flatMap(d =>
      d.listFiles().filter(_.getName.endsWith(".tar")))
      .flatMap(f => TarShards.readTar(f.getPath))
    assert(entries.count(_._1.endsWith(".txt")) == 40)
  }
}
