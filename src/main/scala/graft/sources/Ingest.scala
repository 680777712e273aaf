package graft.sources

import java.nio.file.{Files, Path}

/** EP1: driver-side ingestion (SURVEY §2 S1/S2/S6/S9 —
  * /root/reference/src/extraction.py:45-211). Not a distributed scan:
  * one HTTP page fetch + one file download that LANDS a file for
  * `spark.read`, with an object-store backup/restore ladder around it.
  *
  * Transport and blob store are interfaces: production wires a JDK
  * HttpClient and a `gs://`-backed store (Hadoop GCS connector or client
  * SDK); tests (and this zero-egress container) use fakes. The ladder
  * semantics — backup on success with failures swallowed, restore on
  * download failure, abort only when both fail — mirror
  * extraction.py:180-211 exactly.
  */
object Ingest {

  trait Transport { def get(url: String): Array[Byte] }

  /** Production transport (JDK built-in; no extra deps). Follows
    * redirects like the reference's `requests.get` does (a 301 on the
    * landing page must not abort the scrape), and `verifyTls = false`
    * installs a trust-all context — the JDK analogue of the reference's
    * `verify=False` escape hatch (extraction.py uses requests defaults;
    * keep this `true` outside broken-proxy environments). */
  final class JdkHttpTransport(verifyTls: Boolean = true) extends Transport {
    private val client: java.net.http.HttpClient = {
      val b = java.net.http.HttpClient.newBuilder()
        .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      if (!verifyTls) {
        val trustAll: javax.net.ssl.X509TrustManager = new javax.net.ssl.X509TrustManager {
          def checkClientTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
          def checkServerTrusted(c: Array[java.security.cert.X509Certificate], a: String): Unit = ()
          def getAcceptedIssuers: Array[java.security.cert.X509Certificate] = Array.empty
        }
        val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
        ctx.init(null, Array[javax.net.ssl.TrustManager](trustAll), new java.security.SecureRandom())
        b.sslContext(ctx)
        // A permissive trust manager alone is NOT enough: the JDK client
        // still performs HTTPS endpoint identification (hostname check),
        // which is exactly what a broken intercepting proxy fails. The
        // JDK's only switch is this JVM-GLOBAL property, and it is read
        // at client construction — so it must be set before build().
        System.setProperty("jdk.internal.httpclient.disableHostnameVerification", "true")
      }
      b.build()
    }
    def get(url: String): Array[Byte] = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET().build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      require(resp.statusCode() / 100 == 2, s"GET $url -> ${resp.statusCode()}")
      resp.body()
    }
  }

  /** Object-store surface (S6/S9). Production: GCS bucket via the Hadoop
    * `gs://` connector or client SDK; tests: [[LocalDirStore]]. */
  trait BlobStore {
    def upload(local: Path, name: String): Unit
    def download(name: String, dest: Path): Unit
    def list(prefix: String): Seq[String]
  }

  /** Production object store: any Hadoop-FileSystem scheme — `gs://`
    * (GCS connector), `s3a://`, `hdfs://`, `file://`. This is the
    * idiomatic wiring for a Spark library: the cluster's Hadoop
    * configuration already carries the bucket credentials, so
    * `new HadoopFsStore("gs://bucket/backups", spark.sparkContext
    * .hadoopConfiguration)` is the whole production setup. Exercised in
    * this offline sandbox through the `file://` scheme (IngestSpec). */
  final class HadoopFsStore(
      root: String,
      conf: org.apache.hadoop.conf.Configuration) extends BlobStore {
    import org.apache.hadoop.fs.{Path => HPath}
    private val rootPath = new HPath(root)
    private def fs = rootPath.getFileSystem(conf)

    def upload(local: Path, name: String): Unit =
      fs.copyFromLocalFile(false /*delSrc*/, true /*overwrite*/,
        new HPath(local.toUri), new HPath(rootPath, name))

    def download(name: String, dest: Path): Unit = {
      val src = new HPath(rootPath, name)
      require(fs.exists(src), s"blob $name not found; available: ${list("")}")
      if (dest.getParent != null) Files.createDirectories(dest.getParent)
      // raw local target: skip the .crc sidecar ChecksumFileSystem writes
      fs.copyToLocalFile(false, src, new HPath(dest.toUri), true /*useRawLocalFileSystem*/)
    }

    def list(prefix: String): Seq[String] = {
      if (!fs.exists(rootPath)) return Nil
      val rootUri = fs.makeQualified(rootPath).toUri.getPath.stripSuffix("/")
      val it = fs.listFiles(rootPath, true)
      val out = scala.collection.mutable.Buffer.empty[String]
      while (it.hasNext) {
        val rel = it.next().getPath.toUri.getPath
          .stripPrefix(rootUri).stripPrefix("/")
        // Hadoop convention: dot/underscore files are metadata (e.g. the
        // .crc sidecars ChecksumFileSystem writes under file://)
        val hidden = rel.split('/').exists(s => s.startsWith(".") || s.startsWith("_"))
        if (rel.startsWith(prefix) && !hidden) out += rel
      }
      out.toSeq
    }
  }

  final class LocalDirStore(root: Path) extends BlobStore {
    def upload(local: Path, name: String): Unit = {
      val t = root.resolve(name)
      if (t.getParent != null) Files.createDirectories(t.getParent)
      Files.copy(local, t, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    def download(name: String, dest: Path): Unit = {
      val s = root.resolve(name)
      require(Files.exists(s), s"blob $name not found; available: ${list("")}")
      if (dest.getParent != null) Files.createDirectories(dest.getParent)
      Files.copy(s, dest, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    def list(prefix: String): Seq[String] = {
      if (!Files.exists(root)) return Nil
      val it = Files.walk(root).iterator()
      val out = scala.collection.mutable.Buffer.empty[String]
      while (it.hasNext) {
        val p = it.next()
        if (Files.isRegularFile(p)) {
          val rel = root.relativize(p).toString
          if (rel.startsWith(prefix)) out += rel
        }
      }
      out.toSeq
    }
  }

  /** S1 anchor detection: the reference locates `<a id="brxe-dqzlqf">` on
    * the landing page and follows its href (extraction.py:67-70).
    * Attribute order is not guaranteed — match both. */
  def findAnchorHref(html: String, anchorId: String): Option[String] = {
    val p1 = ("""<a\b[^>]*\bid\s*=\s*["']""" + java.util.regex.Pattern.quote(anchorId) +
      """["'][^>]*\bhref\s*=\s*["']([^"']+)["']""").r
    val p2 = ("""<a\b[^>]*\bhref\s*=\s*["']([^"']+)["'][^>]*\bid\s*=\s*["']""" +
      java.util.regex.Pattern.quote(anchorId) + """["']""").r
    p1.findFirstMatchIn(html).map(_.group(1))
      .orElse(p2.findFirstMatchIn(html).map(_.group(1)))
  }

  /** S1+S2: fetch landing page, resolve the anchor, download the file to
    * `destDir/<name>.<filetype>`. */
  def extractFrom3cv(
      transport: Transport,
      pageUrl: String,
      anchorId: String,
      destDir: Path,
      name: String,
      filetype: String): Path = {
    val html = new String(transport.get(pageUrl), java.nio.charset.StandardCharsets.UTF_8)
    val href = findAnchorHref(html, anchorId).getOrElse(
      throw new IllegalStateException(s"anchor id=$anchorId not found on $pageUrl"))
    val bytes = transport.get(href)
    Files.createDirectories(destDir)
    val out = destDir.resolve(s"$name.$filetype")
    Files.write(out, bytes)
    out
  }

  /** The full EP1 ladder (extraction.py:180-211): extract fresh; on
    * success refresh the backup (upload failure only logged); on failure
    * restore the last backup; abort only if both fail. */
  def ingestWithBackup(
      transport: Transport,
      store: BlobStore,
      pageUrl: String,
      anchorId: String,
      destDir: Path,
      name: String,
      filetype: String,
      backupPrefix: String = "data/raw/"): Path = {
    val fileName = s"$name.$filetype"
    try {
      val landed = extractFrom3cv(transport, pageUrl, anchorId, destDir, name, filetype)
      try store.upload(landed, backupPrefix + fileName)
      catch { case e: Exception =>
        System.err.println(s"[ingest] backup upload failed (ignored): ${e.getMessage}")
      }
      landed
    } catch {
      case primary: Exception =>
        System.err.println(s"[ingest] extraction failed (${primary.getMessage}); restoring backup")
        val dest = destDir.resolve(fileName)
        store.download(backupPrefix + fileName, dest) // throws if also missing
        dest
    }
  }
}
