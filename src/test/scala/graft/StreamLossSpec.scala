package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers._

/** Executor loss DURING a streaming drain (round 12, the streaming
  * sibling of [[StageRetrySpec]]): [[StreamLossProbe]] kills one of
  * two real executor JVMs (local-cluster[2,1], kill-and-replace) after
  * the first micro-batch commits; the drain must continue on the
  * replacement — state reloaded from the checkpoint, lost tasks
  * retried — and complete to exactly the clean run's rows. Subprocess
  * for the same reasons as StageRetrySpec (own master, repo-local
  * SPARK_HOME, executor kills). */
class StreamLossSpec extends AnyFunSuite {

  test("executor killed mid-drain: streaming query continues on the " +
       "replacement executor and completes to the clean-run rows") {
    val java = s"${sys.props("java.home")}/bin/java"
    val opens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cmd = Seq(java) ++ opens ++ Seq(
      "-Dspark.ui.enabled=false", "-Xmx4g",
      "-cp", sys.props("java.class.path"),
      "graft.StreamLossProbe", "/root/testdata/sf0.001")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    pb.environment().put("GRAFT_JAR", ProbeEnv.jarFromClasses())
    pb.environment().put("SPARK_HOME", ProbeEnv.sparkHomeShim())
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    val p = pb.start()
    val out = new StringBuilder
    scala.io.Source.fromInputStream(p.getInputStream).getLines()
      .foreach { l => out.append(l).append('\n') }
    val exit = p.waitFor()
    val json = out.toString.linesIterator
      .find(_.startsWith("{\"stream_loss_probe\""))
      .getOrElse(fail(
        s"no probe output; tail:\n${out.toString.takeRight(2000)}"))
    withClue(json) {
      exit shouldBe 0
      json should include("\"removed_mid_run\":true")
      (json should not).include("\"equal\":false")
    }
  }
}
