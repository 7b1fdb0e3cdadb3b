package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

/** Loopback HTTP harness for the S6 fetch path (the HTTP sibling of
  * [[PgServer]]): a JDK `HttpServer` on a free 127.0.0.1 port, one
  * per JVM, stopped on exit. Routes:
  *
  *  - `/doc/<id>`   → 200 `doc <id> payload`
  *  - `/flaky/<id>` → 503 on the FIRST hit of each path, 200 with
  *                    the same body after — the transient-failure
  *                    shape `Services.Remote`'s retry exists for
  *  - `/dead/<id>`  → 500 always — the permanent-failure shape that
  *                    must exhaust retries loudly
  *
  * [[hits]] counts requests per path so specs can assert the retry
  * actually happened (local mode shares the JVM; on a real cluster
  * the server would be an external host — this is the sandbox's
  * stand-in for the reference's image CDN / translate endpoints). */
object HttpFixture {

  val hits = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  lazy val port: Int = {
    val srv = com.sun.net.httpserver.HttpServer
      .create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val n: Int = hits.merge(path, 1, (a, b) => a + b)
      val id = path.substring(path.lastIndexOf('/') + 1)
      val (code, body) =
        if (path.startsWith("/translate")) {
          // POST text/plain body; query ?src=..&dst=..; responds with
          // the SAME deterministic transform Services.translateStub
          // defines, so the stub oracle grades the live wire too
          val q = Option(ex.getRequestURI.getQuery).getOrElse("")
          val ps = q.split("&").filter(_.contains("="))
            .map(kv => kv.split("=", 2)).map(a => a(0) -> a(1)).toMap
          val text = new String(
            ex.getRequestBody.readAllBytes(), UTF_8)
          (200, s"[${ps.getOrElse("src", "?")}->" +
            s"${ps.getOrElse("dst", "?")}] $text")
        }
        else if (path.startsWith("/dead/")) (500, "permanent failure")
        else if (path.startsWith("/flaky/") && n == 1)
          (503, "transient failure")
        else (200, s"doc $id payload")
      val bytes = body.getBytes(UTF_8)
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
