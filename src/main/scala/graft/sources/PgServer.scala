package graft.sources

import java.nio.file.{Files, Paths}

/** Embedded-PostgreSQL harness for the live-wire validation (the
  * pg-flavored sibling of the Derby harness behind the S4 `jdbc:`
  * seam): initdb a throwaway cluster in a temp dir, start it on a
  * free loopback port with trust auth, stop it on JVM exit. One
  * server per JVM, started lazily on first use. PostgreSQL refuses
  * to run as root, so under a root JVM every server command runs
  * `su nobody` with the data dir chowned accordingly — the sandbox
  * arrangement, not a production pattern (production connects to a
  * real host; [[PgWire]] only needs host/port/user). */
object PgServer {

  /** (host, port) of the running throwaway server. */
  lazy val hostPort: (String, Int) = start()

  @volatile private var dataDir: String = _

  /** (user, password) of a role the server REQUIRES SCRAM-SHA-256
    * from: created through the trust superuser, then a FIRST-MATCH
    * pg_hba rule is prepended (pg_hba is first-match-wins, so the
    * initdb trust lines no longer apply to this role) and the config
    * reloaded. Connecting as this role exercises the full RFC 7677
    * exchange in [[PgWire.Conn]] — trust can't leak through. */
  lazy val scramUser: (String, String) = {
    val (h, p) = hostPort
    val (user, pass) = ("scram_probe", "graft-s3cret")
    PgWire.query(h, p, "graft", "postgres",
      "SET password_encryption = 'scram-sha-256'; " +
        s"DROP ROLE IF EXISTS $user; " +
        s"CREATE ROLE $user LOGIN PASSWORD '$pass';")
    val hba = java.nio.file.Paths.get(dataDir, "pg_hba.conf")
    val rules =
      s"host all $user 127.0.0.1/32 scram-sha-256\n" +
        s"host all $user ::1/128 scram-sha-256\n"
    Files.writeString(hba, rules + Files.readString(hba))
    PgWire.query(h, p, "graft", "postgres", "SELECT pg_reload_conf();")
    // pg_reload_conf only SIGNALS the postmaster; the new hba rules
    // apply asynchronously. Returning before they land would let the
    // first "scram" connection sail through on the old trust rule —
    // poll until a password-less attempt is actually CHALLENGED (the
    // client throws its named no-password error when the server
    // demands SASL; success means trust still applies).
    var enforced = false
    var waited = 0
    while (!enforced) {
      try {
        PgWire.query(h, p, user, "postgres", "SELECT 1")
        require(waited < 10000,
          "pg_hba scram rule not enforced after 10 s")
        Thread.sleep(50); waited += 50
      } catch {
        case e: java.io.IOException
            if e.getMessage.contains("no password was provided") =>
          enforced = true
      }
    }
    (user, pass)
  }

  private def freePort(): Int = {
    val s = new java.net.ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  private def sh(cmd: String): (Int, String) = {
    val asRoot = System.getProperty("user.name") == "root"
    val full =
      if (asRoot) Array("su", "nobody", "-s", "/bin/sh", "-c", cmd)
      else Array("/bin/sh", "-c", cmd)
    val pb = new ProcessBuilder(full: _*)
    pb.directory(new java.io.File("/tmp"))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    (code, out)
  }

  private def start(): (String, Int) = {
    val bin = Seq("/usr/local/bin", "/usr/bin", "/usr/lib/postgresql/15/bin")
      .find(d => Files.exists(Paths.get(d, "initdb")))
      .getOrElse(throw new IllegalStateException(
        "no PostgreSQL binaries on this host"))
    val dir = Files.createTempDirectory("graft-pg").toString
    dataDir = s"$dir/data"
    if (System.getProperty("user.name") == "root") {
      val (c, o) = {
        val p = new ProcessBuilder("chown", "-R", "nobody", dir).start()
        (p.waitFor(), "")
      }
      require(c == 0, s"chown failed: $o")
    }
    val port = freePort()
    val (ci, oi) = sh(s"$bin/initdb -D $dir/data -U graft --no-sync " +
      "-E UTF8 -A trust")
    require(ci == 0, s"initdb failed: $oi")
    val (cs, os) = sh(s"$bin/pg_ctl -D $dir/data -l $dir/log " +
      s"-o '-p $port -k $dir -c listen_addresses=127.0.0.1 " +
      "-c fsync=off -c TimeZone=UTC' start -w -t 60")
    require(cs == 0, s"pg_ctl start failed: $os")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      sh(s"$bin/pg_ctl -D $dir/data stop -m immediate"); ()
    }))
    ("127.0.0.1", port)
  }
}
