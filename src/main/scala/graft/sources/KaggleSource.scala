package graft.sources

import java.nio.file.{Files, Path, Paths}

/** The reference's extract step (SURVEY.md §2.A.1; reference
  * /root/reference/dags/wine_etl_kaggle.py:46-64): authenticate, download
  * a public dataset archive into a staging directory, and hand the staged
  * path downstream. This is a DRIVER-SIDE connector — one archive, no
  * dataflow — so it deliberately lives outside the Spark plan; Spark
  * enters at `Staged.readJsonArray` on the staged path.
  *
  * This environment has no egress, so the network fetch raises a clear
  * error unless a local mirror is supplied (`localMirror`), which is also
  * the unit-test path. The credential shape matches the reference's
  * `~/.kaggle/kaggle.json` ({username, key}).
  */
object KaggleSource {

  final case class Credentials(username: String, key: String)

  /** Load credentials the way the reference's kaggle client does. */
  def loadCredentials(path: String =
      sys.props("user.home") + "/.kaggle/kaggle.json"): Option[Credentials] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) None
    else {
      val s = Files.readString(p)
      def field(k: String): Option[String] =
        ("\"" + k + "\"\\s*:\\s*\"([^\"]*)\"").r.findFirstMatchIn(s).map(_.group(1))
      for (u <- field("username"); k <- field("key")) yield Credentials(u, k)
    }
  }

  /** Injectable HTTP seam: the download transport is a one-method
    * interface so the real client ([[HttpTransport]]) and test fakes
    * (a local HttpServer in the suite) are interchangeable — and so a
    * zero-egress environment fails with a clear error instead of a
    * hung socket. Returns (status, body). */
  trait Transport {
    def get(url: String, headers: Map[String, String]): (Int, Array[Byte])
  }

  /** JDK-only HTTP GET with manual redirect following (the Kaggle API
    * 302s dataset downloads to object storage; `HttpURLConnection`
    * won't follow a cross-host/https hop itself). The Authorization
    * header is dropped on a cross-host redirect — the redirect target
    * carries its own signed credentials, and forwarding basic auth to
    * a third-party host would leak the key. */
  object HttpTransport extends Transport {
    def get(url: String, headers: Map[String, String]): (Int, Array[Byte]) = {
      var current = url
      var auth = headers
      var hops = 0
      while (true) {
        val u = java.net.URI.create(current).toURL
        val conn = u.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setInstanceFollowRedirects(false)
        conn.setConnectTimeout(30000)
        conn.setReadTimeout(120000)
        auth.foreach { case (k, v) => conn.setRequestProperty(k, v) }
        val status = conn.getResponseCode
        if (status >= 300 && status < 400) {
          val loc = Option(conn.getHeaderField("Location")).getOrElse(
            throw new java.io.IOException(s"redirect without Location from $current"))
          conn.disconnect()
          hops += 1
          if (hops > 5)
            throw new java.io.IOException(s"too many redirects fetching $url")
          val next = u.toURI.resolve(loc).toString
          if (java.net.URI.create(next).getHost != u.getHost)
            auth = auth - "Authorization"
          current = next
        } else {
          val is = if (status >= 400) conn.getErrorStream else conn.getInputStream
          val body =
            if (is == null) Array.emptyByteArray
            else try is.readAllBytes() finally is.close()
          conn.disconnect()
          return (status, body)
        }
      }
      throw new IllegalStateException("unreachable")
    }
  }

  /** Per-entry inflation cap: a small archive must not be allowed to
    * expand without bound (zip bomb) — same posture as the PNG
    * decoder's inflate cap. Generous for real datasets, fatal for
    * bombs; raise via the companion if a legitimate dataset needs it. */
  private[graft] val maxEntryBytes: Long = 4L * 1024 * 1024 * 1024

  /** Unzip an archive's regular files into `staging`, rejecting entries
    * that escape it (zip-slip) or inflate past [[maxEntryBytes]], and
    * return the extracted paths. Entries stream to disk in 64 KiB
    * chunks — the inflated bytes are never buffered whole in memory. */
  private[graft] def unzipInto(zipBytes: Array[Byte],
      staging: Path): Seq[String] = {
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(zipBytes))
    try {
      var out = List.empty[String]
      var entry = zin.getNextEntry
      if (entry == null)
        throw new java.io.IOException("downloaded archive is not a zip or is empty")
      while (entry != null) {
        if (!entry.isDirectory) {
          val dst = staging.resolve(entry.getName).normalize()
          if (!dst.startsWith(staging.normalize()))
            throw new java.io.IOException(
              s"zip entry '${entry.getName}' escapes the staging directory")
          Files.createDirectories(dst.getParent)
          val os = Files.newOutputStream(dst)
          try {
            val buf = new Array[Byte](64 * 1024)
            var written = 0L
            var n = zin.read(buf)
            while (n >= 0) {
              written += n
              if (written > maxEntryBytes)
                throw new java.io.IOException(
                  s"zip entry '${entry.getName}' inflates past " +
                    s"$maxEntryBytes bytes — refusing (zip bomb?)")
              os.write(buf, 0, n)
              n = zin.read(buf)
            }
          } finally os.close()
          out ::= dst.toString
        }
        zin.closeEntry()
        entry = zin.getNextEntry
      }
      out.reverse
    } finally zin.close()
  }

  /** The Kaggle dataset download endpoint (reference
    * wine_etl_kaggle.py:50-56 calls the same API via the kaggle
    * client). Overridable base URL so tests point it at a local fake. */
  def datasetUrl(dataset: String,
      baseUrl: String = "https://www.kaggle.com/api/v1"): String =
    s"$baseUrl/datasets/download/$dataset"

  /** Fetch `dataset` (e.g. "zynicide/wine-reviews") into `stagingDir` and
    * return the staged file paths.
    *
    * Three paths, in precedence order:
    *   1. `localMirror` — a directory whose files are copied into
    *      staging, no network (the offline/driver-test path);
    *   2. `transport` — a real download: basic-auth GET of the dataset
    *      archive (credentials in the reference's `kaggle.json`
    *      {username, key} shape), unzipped into staging;
    *   3. neither — a clear no-egress error, never a hung socket. */
  def fetch(dataset: String, stagingDir: String,
      localMirror: Option[String] = None,
      transport: Option[Transport] = None,
      credentials: Option[Credentials] = None,
      baseUrl: String = "https://www.kaggle.com/api/v1",
      policy: Option[graft.pipeline.TaskPolicy.Policy] = None): Seq[String] = {
    // the reference runs its download task under scheduler-level
    // retries/retry_delay/execution_timeout (wine_etl_kaggle.py:22-30);
    // an explicit policy reproduces that contract around THIS fetch —
    // the one genuinely flaky (network) stage of the pipeline
    policy match {
      case Some(p) =>
        return graft.pipeline.TaskPolicy.run(p, s"kaggle-fetch:$dataset")(
          fetch(dataset, stagingDir, localMirror, transport, credentials,
            baseUrl, None))._1
      case None => ()
    }
    val staging = Paths.get(stagingDir)
    Files.createDirectories(staging)
    localMirror match {
      case Some(dir) =>
        val src = Paths.get(dir)
        require(Files.isDirectory(src), s"local mirror $dir is not a directory")
        val stream = Files.list(src) // backed by an open DirectoryStream
        try {
          val it = stream.iterator()
          var out = List.empty[String]
          while (it.hasNext) {
            val f: Path = it.next()
            if (Files.isRegularFile(f)) {
              val dst = staging.resolve(f.getFileName)
              Files.copy(f, dst,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              out ::= dst.toString
            }
          }
          out.reverse
        } finally stream.close()
      case None => transport match {
        case Some(t) =>
          val creds = credentials.orElse(loadCredentials()).getOrElse(
            throw new java.io.IOException(
              s"Cannot download kaggle dataset '$dataset': no credentials " +
                "(expected ~/.kaggle/kaggle.json {username, key})"))
          val token = java.util.Base64.getEncoder.encodeToString(
            s"${creds.username}:${creds.key}".getBytes("UTF-8"))
          val (status, body) = t.get(datasetUrl(dataset, baseUrl),
            Map("Authorization" -> s"Basic $token"))
          if (status != 200)
            throw new java.io.IOException(
              s"kaggle download of '$dataset' failed: HTTP $status")
          // extract into an ATTEMPT-PRIVATE dir, then promote with
          // atomic per-file moves: a timed-out zombie attempt (see
          // TaskPolicy — abandonment is best-effort) can never
          // interleave partial writes with a retry's files
          Files.createDirectories(staging)
          val attemptDir = Files.createTempDirectory(staging, ".attempt-")
          try {
            unzipInto(body, attemptDir).map { s =>
              val src = Paths.get(s)
              val dst = staging.resolve(attemptDir.relativize(src))
              Files.createDirectories(dst.getParent)
              // ATOMIC_MOVE is load-bearing: the attempt dir lives
              // inside staging (same filesystem, rename guaranteed), so
              // a copy+delete fallback — which would reintroduce the
              // partial-write window — fails loudly instead of engaging
              Files.move(src, dst,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE,
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              dst.toString
            }
          } finally {
            // drop the (now file-less) attempt skeleton
            import scala.jdk.CollectionConverters._
            java.nio.file.Files.walk(attemptDir).iterator().asScala.toSeq
              .sortBy(-_.getNameCount)
              .foreach(p => Files.deleteIfExists(p))
          }
        case None =>
          throw new java.io.IOException(
            s"Cannot download kaggle dataset '$dataset': no network egress in " +
              "this environment. Provide localMirror with pre-staged files " +
              "or a Transport for a live fetch.")
      }
    }
  }
}
