package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the dev oracle gate's atomic-type ALLOWLIST (VERDICT r18 ask
  * #5): scripts/check_oracle.py must fail CLOSED on any column type off
  * the list — the old nested-type denylist would wave through an exotic
  * scalar (INTERVAL, UUID, BIT, ENUM…) whose pandas canonicalization in
  * the real driver gate is unverified. The python script carries its
  * own planted-type selftest; this spec drives it so `sbt test` holds
  * the gate's contract. Cancels (does not fail) where the dev-only
  * python/duckdb toolchain is absent — the gate is build-loop tooling,
  * not shipped library surface. */
class OracleGateSpec extends AnyFunSuite {

  test("check_oracle.py rejects planted exotic types, accepts the atomic list") {
    import scala.sys.process._
    val script = new java.io.File("scripts/check_oracle.py")
    assume(script.exists(), "scripts/check_oracle.py not found from test cwd")
    val probe = try Process(Seq("python3", "-c", "import duckdb")).! == 0
      catch { case _: java.io.IOException => false }
    assume(probe, "python3 + duckdb unavailable — dev-gate selftest skipped")
    val out = new StringBuilder
    val rc = Process(Seq("python3", script.getPath, "--selftest"))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    assert(rc === 0, s"selftest failed:\n$out")
    assert(out.toString.contains("SELFTEST PASS"))
  }
}
