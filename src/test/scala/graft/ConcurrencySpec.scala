package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers._

/** Shared-session concurrency (round 12): all batch entries replayed
  * shuffled across 8 threads on ONE SparkSession must equal their
  * sequential baselines — the multi-tenant hazard class is
  * session-global mutable state (layout conf flags, function
  * registration, shared scratch artifacts). Subprocess so the probe
  * gets its own session sized for the purpose (~3.5 min). */
class ConcurrencySpec extends AnyFunSuite {

  test("261 batch entries, 8 threads, one session: rows identical to " +
       "sequential baselines") {
    val java = s"${sys.props("java.home")}/bin/java"
    val opens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ opens ++ Seq(
      "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC", "-Xmx6g",
      "-cp", sys.props("java.class.path"),
      "graft.ConcurrencyProbe", "/root/testdata/sf0.001", "8")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new StringBuilder
    scala.io.Source.fromInputStream(p.getInputStream).getLines()
      .foreach { l => out.append(l).append('\n') }
    val exit = p.waitFor()
    val json = out.toString.linesIterator
      .find(_.startsWith("{\"concurrency_probe\""))
      .getOrElse(fail(
        s"no probe output; tail:\n${out.toString.takeRight(2000)}"))
    withClue(json) {
      exit shouldBe 0
      json should include("\"baseline_errors\":[]")
      json should include("\"concurrent_errors\":[]")
      json should include("\"mismatches\":[]")
    }
  }
}
