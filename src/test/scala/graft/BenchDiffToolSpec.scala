package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs tools/test_bench_diff.py (plain-assert python, no pytest needed)
  * as part of sbt test, so the bench_diff strict-exit contract (0 clean /
  * 1 confirmed regression / 2 canary-demoted suspect) and the per-phase
  * canary demotion are gated alongside the Scala arbitration policy
  * (BenchArbitrationSpec). Cancels, not fails, where python3 is absent —
  * the tool itself only runs where python3 exists. */
class BenchDiffToolSpec extends AnyFunSuite {

  private def runPyTest(path: String): Unit = {
    val py = Seq("/usr/bin/python3", "/usr/local/bin/python3")
      .find(p => new java.io.File(p).canExecute)
      .orElse(Some("python3"))
    val script = new java.io.File(path)
    assume(script.exists, "run from the repo root")
    val pb = new ProcessBuilder(py.get, script.getPath)
    pb.redirectErrorStream(true)
    val proc =
      try pb.start()
      catch { case _: java.io.IOException =>
        cancel("python3 not available on this box"); null
      }
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val rc = proc.waitFor()
    assert(rc == 0, s"$path failed (exit $rc):\n$out")
    assert(out.contains("all assertions passed"), out)
  }

  test("bench_diff per-phase demotion and 0/1/2 strict-exit contract") {
    runPyTest("tools/test_bench_diff.py")
  }

  test("arbitrate flag re-derivation, steady-vs-pass1 verdicts, and " +
      "record stamping") {
    runPyTest("tools/test_arbitrate.py")
  }
}
