package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Ingest

/** EP1 ladder semantics (S1/S2/S6/S9) with a fake transport/store. */
class IngestSpec extends AnyFunSuite {

  private val page =
    """<html><body>
      |<a class="x" href="https://example.test/other.xls" id="other">no</a>
      |<a class="brxe-button" id="brxe-dqzlqf" href="https://example.test/homologacion.xls">dl</a>
      |</body></html>""".stripMargin

  private class FakeTransport(fail: Boolean = false) extends Ingest.Transport {
    def get(url: String): Array[Byte] = {
      if (fail) throw new RuntimeException("network down")
      if (url.endsWith(".xls")) s"FILE:$url".getBytes else page.getBytes
    }
  }

  test("anchor resolution picks the id'd link regardless of attribute order") {
    assert(Ingest.findAnchorHref(page, "brxe-dqzlqf")
      .contains("https://example.test/homologacion.xls"))
    val flipped = """<a href="https://x.test/f.xls" id="brxe-dqzlqf">dl</a>"""
    assert(Ingest.findAnchorHref(flipped, "brxe-dqzlqf").contains("https://x.test/f.xls"))
    assert(Ingest.findAnchorHref(page, "missing").isEmpty)
  }

  test("successful extraction lands the file and refreshes the backup") {
    val dest = Files.createTempDirectory("ingest")
    val store = new Ingest.LocalDirStore(Files.createTempDirectory("store"))
    val out = Ingest.ingestWithBackup(new FakeTransport(), store,
      "https://example.test/page", "brxe-dqzlqf", dest, "dataRawHom", "xls")
    assert(new String(Files.readAllBytes(out)) == "FILE:https://example.test/homologacion.xls")
    assert(store.list("data/raw/") == Seq("data/raw/dataRawHom.xls"))
  }

  test("extraction failure restores the last backup") {
    val dest = Files.createTempDirectory("ingest2")
    val storeDir = Files.createTempDirectory("store2")
    val store = new Ingest.LocalDirStore(storeDir)
    val backup = Files.createTempFile("bk", ".xls")
    Files.write(backup, "OLD BACKUP".getBytes)
    store.upload(backup, "data/raw/dataRawHom.xls")
    val out = Ingest.ingestWithBackup(new FakeTransport(fail = true), store,
      "https://example.test/page", "brxe-dqzlqf", dest, "dataRawHom", "xls")
    assert(new String(Files.readAllBytes(out)) == "OLD BACKUP")
  }

  test("both paths failing aborts with the store error") {
    val dest = Files.createTempDirectory("ingest3")
    val store = new Ingest.LocalDirStore(Files.createTempDirectory("store3"))
    intercept[Exception] {
      Ingest.ingestWithBackup(new FakeTransport(fail = true), store,
        "https://example.test/page", "brxe-dqzlqf", dest, "dataRawHom", "xls")
    }
  }

  test("HadoopFsStore round-trips through a FileSystem scheme (file://)") {
    val root = Files.createTempDirectory("hfs-store")
    val store = new Ingest.HadoopFsStore(
      s"file://$root", new org.apache.hadoop.conf.Configuration())
    val src = Files.createTempFile("blob", ".xls")
    Files.write(src, "PAYLOAD".getBytes)
    store.upload(src, "data/raw/dataRawHom.xls")
    assert(store.list("data/raw/") == Seq("data/raw/dataRawHom.xls"))
    assert(store.list("other/") == Nil)
    val dest = Files.createTempDirectory("hfs-dest").resolve("restored.xls")
    store.download("data/raw/dataRawHom.xls", dest)
    assert(new String(Files.readAllBytes(dest)) == "PAYLOAD")
    assert(!Files.exists(dest.resolveSibling(".restored.xls.crc")), "no checksum sidecar")
    intercept[IllegalArgumentException](store.download("missing.bin", dest))

    // the full backup/restore ladder works over the FileSystem store too
    val landed = Ingest.ingestWithBackup(new FakeTransport(fail = true), store,
      "https://example.test/page", "brxe-dqzlqf",
      Files.createTempDirectory("hfs-land"), "dataRawHom", "xls")
    assert(new String(Files.readAllBytes(landed)) == "PAYLOAD")
  }

  test("JdkHttpTransport follows a 301 redirect (loopback server)") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def base = s"http://127.0.0.1:${server.getAddress.getPort}"
    server.createContext("/old", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        ex.getResponseHeaders.add("Location", s"$base/new")
        ex.sendResponseHeaders(301, -1); ex.close()
      }
    })
    server.createContext("/new", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = "after-redirect".getBytes
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body); ex.close()
      }
    })
    server.start()
    try {
      val got = new Ingest.JdkHttpTransport().get(s"$base/old")
      assert(new String(got) == "after-redirect")
    } finally server.stop(0)
  }
}
