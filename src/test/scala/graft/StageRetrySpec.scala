package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers._

/** Executor-loss / stage-replay determinism (round-11 verdict ask #2):
  * [[StageRetryProbe]] halts a whole executor JVM mid-reduce on a
  * local-cluster[2,1] master, losing that executor's shuffle-map
  * output; the resubmitted reduce task hits FetchFailed, the
  * DAGScheduler replays the map stage, and the recomputed result must
  * equal the clean run exactly. Runs in a subprocess because
  * local-cluster needs its own master + a SPARK_HOME whose work dir is
  * repo-local, and because the probe kills executor JVMs. */
class StageRetrySpec extends AnyFunSuite {

  test("executor halt mid-reduce loses shuffle output; FetchFailed + " +
       "map-stage replay recompute to identical rows") {
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
      "graft.StageRetryProbe", "/root/testdata/sf0.001",
      "agg_multikey", "ext_exact_dedup")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    pb.environment().put("GRAFT_JAR", ProbeEnv.jarFromClasses())
    pb.environment().put("SPARK_HOME", ProbeEnv.sparkHomeShim())
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    val p = pb.start()
    val out = new StringBuilder
    val src = scala.io.Source.fromInputStream(p.getInputStream)
    src.getLines().foreach { l => out.append(l).append('\n') }
    val exit = p.waitFor()
    val json = out.toString.linesIterator
      .find(_.startsWith("{\"stage_retry_probe\""))
      .getOrElse(fail(
        s"no probe output; tail:\n${out.toString.takeRight(2000)}"))
    withClue(json) {
      exit shouldBe 0
      json should include("\"fetch_failed\":true")
      (json should not).include("\"fetch_failed\":false")
      (json should not).include("\"equal\":false")
      json should include("\"executors_removed\":")
      (json should not).include("\"executors_removed\":0,")
      (json should not).include("\"stage_replays\":0}")
    }
  }
}
