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

  /** Fetch `dataset` (e.g. "zynicide/wine-reviews") into `stagingDir` and
    * return the staged file paths. `localMirror`, when given, is a
    * directory whose files are copied into staging instead of any
    * network call (the offline/test path). */
  def fetch(dataset: String, stagingDir: String,
      localMirror: Option[String] = None): Seq[String] = {
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
      case None =>
        throw new java.io.IOException(
          s"Cannot download kaggle dataset '$dataset': no network egress in " +
            "this environment. Provide localMirror with pre-staged files.")
    }
  }
}
