package graft.sinks

import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WebDataset-style training shards: the loader-boundary sink a
  * pretraining pipeline ends at — documents packed into N tar files
  * ("shards"), each sample a basename-grouped pair of entries
  * (`<id>.txt` payload + `<id>.json` metadata), readable by any tar
  * tool or WebDataset-convention loader. Pure JDK ustar writer (POSIX
  * 1003.1-1988 header layout), deterministic byte-for-byte: fixed
  * mtime/uid/mode, shard assignment `doc_id % nShards`, entries sorted
  * by doc_id within a shard — re-running the job reproduces identical
  * shard bytes (suite-asserted), which is what makes shards cacheable
  * and resumable at scale.
  *
  * Scale posture: ONE shuffle keyed on the shard id
  * (`groupByKey(shard)`), then each shard streams to its own file from
  * exactly one task — the "one output object per group" shape; shard
  * count chooses the parallelism/file-size trade-off exactly like a
  * production WebDataset writer. The returned manifest (shard, samples,
  * bytes) is the bounded driver-side summary, one row per shard.
  */
object TarShards {

  final case class ShardManifest(shard: Long, n_samples: Long, n_bytes: Long)

  private def headerBlock(name: String, size: Long): Array[Byte] = {
    require(name.length <= 100, s"tar entry name too long: $name")
    // the classic ustar size field is 11 octal digits + NUL: 8 GiB or
    // more would render 12+ digits and silently clobber mtime — fail
    // loudly like the name check (payloads that large belong in chunks)
    require(size >= 0 && size < (1L << 33),
      s"tar entry too large for a ustar size field: $size bytes")
    val b = new Array[Byte](512)
    def put(off: Int, s: String): Unit = {
      val bytes = s.getBytes(US_ASCII)
      System.arraycopy(bytes, 0, b, off, bytes.length)
    }
    put(0, name)
    put(100, "0000644\u0000")          // mode
    put(108, "0000000\u0000")          // uid
    put(116, "0000000\u0000")          // gid
    put(124, f"$size%011o\u0000")      // size, octal
    put(136, "00000000000\u0000")      // mtime 0: deterministic bytes
    put(156, "0")                       // typeflag: regular file
    put(257, "ustar\u000000")           // magic + version
    // checksum: header with the chksum field as spaces
    java.util.Arrays.fill(b, 148, 156, ' '.toByte)
    var sum = 0
    var i = 0
    while (i < 512) { sum += b(i) & 0xff; i += 1 }
    put(148, f"$sum%06o\u0000 ")
    b
  }

  private def writeEntry(out: java.io.OutputStream, name: String,
      data: Array[Byte]): Long = {
    out.write(headerBlock(name, data.length.toLong))
    out.write(data)
    val pad = (512 - data.length % 512) % 512
    out.write(new Array[Byte](pad))
    512L + data.length + pad
  }

  /** Write `df` (doc_id LONG, payload BINARY, meta STRING) as `nShards`
    * tar shards under `dir` (created if missing); returns the manifest
    * Dataset — materialize it to run the job.
    *
    * Streaming, not buffering: rows are repartitioned on the shard id
    * and sorted (shard, doc_id) WITHIN partitions, so each task streams
    * its rows straight to tar files, switching files when the shard id
    * changes — no shard is ever held in executor memory, which is the
    * property that lets one shard be arbitrarily large.
    *
    * Retry/speculation safety: each task writes
    * `.shard-NNNNN.tar.attempt-<taskAttemptId>` and atomically renames
    * to the final name only at successful close, so a zombie attempt
    * racing a retry can never interleave bytes into a published shard —
    * last completed rename wins with identical bytes (the writer is
    * deterministic). ATOMIC_MOVE is demanded, not hoped for: staging
    * and final file share a directory, so a non-atomic fallback would
    * be a filesystem bug and should fail loudly. */
  def writeShards(df: DataFrame, dir: String,
      nShards: Int): Dataset[ShardManifest] = {
    require(nShards > 0, "nShards must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    Files.createDirectories(Paths.get(dir))
    df.select(
        pmod(col("doc_id").cast("long"), lit(nShards.toLong)).as("shard"),
        col("doc_id").cast("long"), col("payload").cast("binary"),
        col("meta").cast("string"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .as[(Long, Long, Array[Byte], String)]
      .mapPartitions { rows =>
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val manifests = Seq.newBuilder[ShardManifest]
        var cur = -1L
        var out: java.io.OutputStream = null
        var tmp: java.nio.file.Path = null
        var n = 0L
        var bytes = 0L
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](1024)) // two zero blocks: EOF
          bytes += 1024
          out.close()
          Files.move(tmp, Paths.get(dir, f"shard-$cur%05d.tar"),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          // best-effort sweep of STALE attempt files for this shard: a
          // killed/zombie attempt leaves its dot-prefixed temp behind
          // forever otherwise (naive directory listers would ingest a
          // truncated tar). The winning attempt just renamed its own
          // temp away, so anything still matching is a loser's.
          val shardPrefix = f".shard-$cur%05d.tar.attempt-"
          val stale = new java.io.File(dir).listFiles()
          if (stale != null) stale.iterator
            .filter(_.getName.startsWith(shardPrefix))
            .foreach(f => try Files.deleteIfExists(f.toPath) catch {
              case _: java.io.IOException => () // a live racer owns it
            })
          manifests += ShardManifest(cur, n, bytes)
          out = null
        }
        rows.foreach { case (shard, id, payload, meta) =>
          if (shard != cur) {
            close()
            cur = shard
            n = 0L; bytes = 0L
            tmp = Paths.get(dir, f".shard-$shard%05d.tar.attempt-$attempt")
            out = new java.io.BufferedOutputStream(Files.newOutputStream(tmp))
          }
          val p = if (payload == null) Array.emptyByteArray else payload
          val m = if (meta == null) "{}" else meta
          bytes += writeEntry(out, s"$id.txt", p)
          bytes += writeEntry(out, s"$id.json", m.getBytes("UTF-8"))
          n += 1
        }
        close()
        manifests.result().iterator
      }
  }

  /** Minimal ustar reader (tests + read-back verification): returns
    * (entryName, bytes) in archive order. */
  def readTar(path: String): Seq[(String, Array[Byte])] = {
    val p = Files.readAllBytes(Paths.get(path))
    val out = Seq.newBuilder[(String, Array[Byte])]
    var off = 0
    while (off + 512 <= p.length) {
      if (p(off) == 0) { off = p.length } // zero block: EOF
      else {
        val name = new String(p, off, 100, US_ASCII).takeWhile(_ != '\u0000')
        val size = java.lang.Long.parseLong(
          new String(p, off + 124, 11, US_ASCII).trim, 8)
        val data = new Array[Byte](size.toInt)
        System.arraycopy(p, off + 512, data, 0, size.toInt)
        out += name -> data
        off += 512 + ((size + 511) / 512).toInt * 512
      }
    }
    out.result()
  }
}
