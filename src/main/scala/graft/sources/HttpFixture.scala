package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** Loopback HTTP harness for the S6/U1/U5 live-wire paths (the HTTP
  * sibling of [[PgServer]]): a JDK `HttpServer` on a free 127.0.0.1
  * port, one per JVM, stopped on exit. Routes:
  *
  *  - `/doc/<id>`      → 200 `doc <id> payload` (text)
  *  - `/img/<id>`      → 200 the committed JFIF fixture BYTES
  *                       (fixtures/media/tiny.jpg) — the reference's
  *                       image-CDN payload shape; bytes, not text
  *  - `/imgflaky/<id>` → 503 on the FIRST hit of each path, the JPEG
  *                       bytes after — the binary retry path
  *  - `/flaky/<id>`    → 503 on the FIRST hit of each path, 200 text
  *                       after — the transient-failure shape
  *                       `Services.Remote`'s retry exists for
  *  - `/dead/<id>`     → 500 always — the permanent-failure shape that
  *                       must exhaust retries loudly
  *  - `/translate?src=..&dst=..` (POST text) → the SAME deterministic
  *                       transform as `Services.translateStub`
  *  - `/ocr?max=K` (POST bytes) → UTF-8-decode, first K space-split
  *                       tokens — the SAME transform as
  *                       `Services.ocrStub`, so the stub oracle
  *                       grades the live OCR wire
  *  - `/ocrflaky?max=K` → 503 on the first hit, then behaves as
  *                       `/ocr` — the retry proof on the upload path
  *  - `/chat?src=..&dst=..` (POST multi-line text) → each LINE of the
  *                       body tagged `[src->dst] `, lines re-joined —
  *                       the batched chat-translate wire (U2): one
  *                       call per GROUP of lines, not per line
  *  - `/chatflaky?...`  → 503 on the first hit, then as `/chat`
  *  - `/name` (POST `category|collection`) → `Name|SKU` with the SAME
  *                       deterministic transform as
  *                       `Services.nameSkuStub` (initcap'd words;
  *                       upper first-8 md5 hex of the body), so the
  *                       stub oracle grades the live namer wire (U4)
  *  - `/nameflaky`      → 503 on the first hit, then as `/name`
  *  - `/logistics` (POST text) → the five `|`-framed fields of
  *                       `Services.extractLogisticsStub`'s transform
  *                       (weight|dims|origin|hs_code|incoterm), so
  *                       the stub oracle grades the live structured-
  *                       extraction wire (U3)
  *  - `/logisticsflaky` → 503 on the first hit, then as `/logistics`
  *
  * [[hits]] counts requests per path so specs can assert the retry
  * actually happened and that partition-scoped clients really
  * handshake once per partition (local mode shares the JVM; on a real
  * cluster the server would be an external host — this is the
  * sandbox's stand-in for the reference's image CDN / translate / OCR
  * endpoints). */
object HttpFixture {

  val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** The JFIF fixture the image routes serve — committed bytes, so
    * the graded oracle can pin its length/digest/SOF0 dimensions.
    * Resolved against the working directory (sbt/driver run from the
    * repo root), not a hard-coded checkout path. */
  lazy val jpegBytes: Array[Byte] = java.nio.file.Files
    .readAllBytes(java.nio.file.Paths.get(
      "fixtures/media/tiny.jpg").toAbsolutePath)

  private def ocrTransform(body: Array[Byte], max: Int): String =
    new String(body, UTF_8).split(" ", -1).take(max).mkString(" ")

  /** Mirror of Spark's `initcap`: first letter of each space-split
    * word uppercased, the rest lowercased. */
  private def initcapLike(s: String): String =
    s.split(" ", -1).map { w =>
      if (w.isEmpty) w
      else w.substring(0, 1).toUpperCase + w.substring(1).toLowerCase
    }.mkString(" ")

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(UTF_8))
      .map(b => f"$b%02x").mkString

  /** `Services.nameSkuStub`'s transform over the `cat|coll` wire
    * body: `Name|SKU`. */
  private def nameTransform(body: String): String = {
    val parts = body.split("\\|", 2)
    val (cat, coll) = (parts(0), if (parts.length > 1) parts(1) else "")
    initcapLike(s"$cat $coll") + "|" + md5Hex(body).take(8).toUpperCase
  }

  lazy val port: Int = {
    val srv = com.sun.net.httpserver.HttpServer
      .create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val n: Int = hits.merge(path, 1, (a, b) => a + b)
      val id = path.substring(path.lastIndexOf('/') + 1)
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val ps = q.split("&").filter(_.contains("="))
        .map(kv => kv.split("=", 2)).map(a => a(0) -> a(1)).toMap
      val (code, bytes: Array[Byte]) =
        if (path.startsWith("/translate")) {
          // POST text/plain body; responds with the SAME deterministic
          // transform Services.translateStub defines, so the stub
          // oracle grades the live wire too
          val text = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          (200, (s"[${ps.getOrElse("src", "?")}->" +
            s"${ps.getOrElse("dst", "?")}] $text").getBytes(UTF_8))
        }
        else if (path.startsWith("/chatflaky") && n == 1)
          (503, "transient failure".getBytes(UTF_8))
        else if (path.startsWith("/chat")) {
          // batched chat-translate: one POST carries a GROUP of
          // lines; each line gets the translateStub transform
          val text = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val tag = s"[${ps.getOrElse("src", "?")}->" +
            s"${ps.getOrElse("dst", "?")}] "
          (200, text.split("\n", -1).map(tag + _).mkString("\n")
            .getBytes(UTF_8))
        }
        else if (path.startsWith("/nameflaky") && n == 1)
          (503, "transient failure".getBytes(UTF_8))
        else if (path.startsWith("/name")) {
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          (200, nameTransform(body).getBytes(UTF_8))
        }
        else if (path.startsWith("/logisticsflaky") && n == 1)
          (503, "transient failure".getBytes(UTF_8))
        else if (path.startsWith("/logistics")) {
          // Services.extractLogisticsStub's transform over the wire:
          // five '|'-framed fields derived from the text
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          val len = body.length
          val fields = Seq(s"${len % 50}kg", s"${len % 9}x${len % 7}",
            body.take(2), s"HS${len % 100}", "FOB")
          (200, fields.mkString("|").getBytes(UTF_8))
        }
        else if (path.startsWith("/ocrflaky") && n == 1)
          (503, "transient failure".getBytes(UTF_8))
        else if (path.startsWith("/ocr")) {
          val max = ps.getOrElse("max", "6").toInt
          (200, ocrTransform(ex.getRequestBody.readAllBytes(), max)
            .getBytes(UTF_8))
        }
        else if (path.startsWith("/img/")) (200, jpegBytes)
        else if (path.startsWith("/imgflaky/") && n == 1)
          (503, "transient failure".getBytes(UTF_8))
        else if (path.startsWith("/imgflaky/")) (200, jpegBytes)
        else if (path.startsWith("/dead/"))
          (500, "permanent failure".getBytes(UTF_8))
        else if (path.startsWith("/flaky/") && n == 1)
          (503, "transient failure".getBytes(UTF_8))
        else (200, s"doc $id payload".getBytes(UTF_8))
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    // the dispatcher thread inherits daemon status from the thread
    // that calls start(); a non-daemon dispatcher would pin the JVM
    // open forever (shutdown hooks only fire once exit BEGINS, and
    // exit waits on non-daemon threads — a deadlock). Same reason
    // the handler executor is a daemon pool.
    srv.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
      (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t }))
    val starter = new Thread(() => srv.start())
    starter.setDaemon(true)
    starter.start()
    starter.join()
    srv.getAddress.getPort
  }
}
