package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.server.{ClickHouseServer, MySqlServer}

/** Wire-authentication parity with the reference (round-9 verdict item 7).
  *
  * The reference performs NO credential verification on either protocol:
  * its MySQL endpoint implements msql-srv's `MysqlShim`
  * (`fusequery/query/src/servers/mysql/mysql_interactive_worker.rs:35` —
  * only on_prepare/on_execute/on_close/on_query/on_init, no auth hook
  * overridden, so the library's default accept-all handshake applies), and
  * its ClickHouse endpoint hands the clickhouse-srv session the Hello
  * packet's user/password without ever reading them
  * (`fusequery/query/src/servers/clickhouse/` — zero auth/password
  * references in the handler, session, or worker). Both graft servers
  * mirror that posture explicitly (MySqlServer.scala "accept anyone";
  * ClickHouseServer.scala "user, password: accept-all").
  *
  * These tests pin the parity: arbitrary usernames, passwords, and
  * auth-plugin response bytes must complete the handshake and run queries.
  * (Production hardening would front either port with a real authenticator;
  * COVERAGE.md documents the posture as reference parity, not an oversight.)
  */
class WireAuthSpec extends AnyFunSuite {
  private lazy val session = TestSpark.spark.newSession()
  private lazy val mysql = new MySqlServer(session)
  private lazy val mysqlPort = mysql.start()
  private lazy val ch = new ClickHouseServer(session)
  private lazy val chPort = ch.start()

  test("MySQL: arbitrary user + arbitrary auth-response bytes are accepted") {
    val junkAuth = Array.tabulate[Byte](20)(i => ((i * 37 + 5) & 0xff).toByte)
    val c = new WireClients.MySql(mysqlPort, user = "not-a-real-user",
      auth = junkAuth)
    try {
      assert(c.serverVersion.nonEmpty) // handshake OK'd despite junk creds
      assert(c.ping())
      assert(c.query("SELECT 1 + 2").map(_._2) === Right(Seq(Seq("3"))))
    } finally c.close()
  }

  test("ClickHouse: arbitrary user/password pass the Hello exchange") {
    val c = new WireClients.Ch(chPort, user = "nobody", password = "wrong-pass")
    try {
      assert(c.serverName.nonEmpty)
      assert(c.query("SELECT 2 + 3").exists(_._3.head.head == "5"))
    } finally c.close()
  }
}
