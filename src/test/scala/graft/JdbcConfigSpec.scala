package graft

import graft.sources.JdbcSourceConfig
import org.scalatest.funsuite.AnyFunSuite

/** The env/config surface of the JDBC source (O1/O5 plumbing) — everything
  * testable without an Oracle driver on the classpath.
  */
class JdbcConfigSpec extends AnyFunSuite {

  private val env = Map(
    "ORACLE_HOST" -> "db.example.internal",
    "ORACLE_SID" -> "OMOP",
    "ORACLE_USER" -> "reader",
    "ORACLE_PASS" -> "s3cret"
  )

  test("fromEnv: builds config from the reference's env surface, defaults port 1521") {
    val cfg = JdbcSourceConfig.fromEnv(env).get
    assert(cfg.url == "jdbc:oracle:thin:@//db.example.internal:1521/OMOP")
    assert(cfg.user == "reader")
    assert(cfg.fetchSize == 2048) // dump_table.py:184 chunk_size parity
  }

  test("fromEnv: explicit port, missing vars -> None") {
    assert(JdbcSourceConfig.fromEnv(env + ("ORACLE_PORT" -> "1522")).get.url.contains(":1522/"))
    assert(JdbcSourceConfig.fromEnv(env - "ORACLE_PASS").isEmpty)
    assert(JdbcSourceConfig.fromEnv(Map.empty).isEmpty)
  }

  test("credentials never leak through toString/logs") {
    val cfg = JdbcSourceConfig.fromEnv(env).get
    assert(!cfg.toString.contains("s3cret"))
  }
}
