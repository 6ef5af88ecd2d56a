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

  /** Jar the CURRENT compiled classes for executor-side classloading —
    * the packaged sbt artifact can be stale relative to the classes
    * under test, and a stale closure class in the executors would fail
    * (or worse, silently test old code). */
  private def jarFromClasses(): String = {
    import scala.jdk.CollectionConverters._
    val classes =
      java.nio.file.Paths.get("/root/repo/target/scala-2.13/classes")
    val scratch = java.nio.file.Paths.get("/root/repo/target/scratch")
    java.nio.file.Files.createDirectories(scratch)
    val out = java.nio.file.Files.createTempFile(
      scratch, "graft_probe_", ".jar")
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(out))
    val files = java.nio.file.Files.walk(classes)
    try files.iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_)).foreach { p =>
        zos.putNextEntry(new java.util.zip.ZipEntry(
          classes.relativize(p).toString.replace('\\', '/')))
        java.nio.file.Files.copy(p, zos)
        zos.closeEntry()
      }
    finally { files.close(); zos.close() }
    out.toString
  }

  /** Repo-local SPARK_HOME (symlinks to /opt/spark): the standalone
    * Worker hardcodes its executor work dir to $SPARK_HOME/work. */
  private def sparkHomeShim(): String = {
    val shim = java.nio.file.Paths.get("/root/repo/target/spark_home_shim")
    java.nio.file.Files.createDirectories(shim)
    Seq("jars", "bin", "sbin", "conf", "RELEASE").foreach { d =>
      val l = shim.resolve(d)
      if (!java.nio.file.Files.exists(l))
        java.nio.file.Files.createSymbolicLink(
          l, java.nio.file.Paths.get(s"/opt/spark/$d"))
    }
    shim.toString
  }

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
    pb.environment().put("GRAFT_JAR", jarFromClasses())
    pb.environment().put("SPARK_HOME", sparkHomeShim())
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
