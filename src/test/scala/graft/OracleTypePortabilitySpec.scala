package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Build-time guard for the oracle *contract*, not the operators: every
  * oracle SQL's DuckDB result type must sit inside a portable whitelist
  * (BIGINT/INT/DOUBLE/VARCHAR/BOOLEAN/DATE/TIMESTAMP-micros/BLOB and
  * lists/structs thereof).
  *
  * Round-9 lesson: q89/q90 were value-identical to their oracles but
  * hash-FAILED in the driver because DuckDB widens sum(BIGINT) and
  * windowed sum(INT) to HUGEINT (int128), and different client fetch
  * paths render int128 differently (9 vs 9.0 vs Decimal('9')). The same
  * class covers TIMESTAMP_NS and engine-widened DECIMALs. This spec
  * DESCRIBEs every oracle via scripts/check_oracle_types.py so the class
  * dies at `sbt test`, not in the driver's correctness gate.
  *
  * Cancels (not fails) when python3+duckdb or the testdata are absent so
  * the suite stays green in environments without the driver toolchain.
  */
class OracleTypePortabilitySpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def run(cmd: Seq[String]): (Int, String) = {
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    (p.waitFor(), out)
  }

  private def toolchainReady: Boolean =
    Files.exists(Paths.get(sfDir)) && {
      try run(Seq("python3", "-c", "import duckdb"))._1 == 0
      catch { case _: java.io.IOException => false }
    }

  test("every oracle result type is in the portable whitelist") {
    assume(toolchainReady, "python3+duckdb or testdata unavailable")
    val tmp = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(tmp, Verify.oracleJson)
    val (code, out) =
      run(Seq("python3", "scripts/check_oracle_types.py", sfDir, tmp.toString))
    assert(code == 0, s"non-portable oracle result types:\n$out")
    Files.delete(tmp)
  }

  test("the guard actually catches a widened sum (HUGEINT fixture)") {
    assume(toolchainReady, "python3+duckdb or testdata unavailable")
    val tmp = Files.createTempFile("oracle_bad", ".json")
    // sum(BIGINT) widens to HUGEINT in DuckDB — the exact q89 failure mode
    Files.writeString(
      tmp, """{"bad_sum": "SELECT sum(l_orderkey) AS s FROM lineitem"}""")
    val (code, out) =
      run(Seq("python3", "scripts/check_oracle_types.py", sfDir, tmp.toString))
    assert(code == 1, s"guard let a HUGEINT through:\n$out")
    assert(out.contains("HUGEINT"), s"expected HUGEINT violation:\n$out")
    Files.delete(tmp)
  }
}
