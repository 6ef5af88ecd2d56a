ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "transitdatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output must NOT pass through sbt's logger: the "[info] "
// prefix it adds stops the driver's bench parser from json.loads-ing the
// one-line {"metric":...} summary (BENCH_r0{1..4}.json all show
// parsed:null). StdoutOutput inherits the parent's raw stdout/stderr, so
// the JSON line is emitted verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Freshness stamp for tools/run_main.sh's staleness gate: zinc content-
// hashes sources, so a no-op recompile (e.g. after a pure touch) does
// NOT rewrite .class files — comparing src mtimes to class mtimes alone
// could wedge the gate stale forever. This file is touched on EVERY
// successful `sbt compile`, no-op or not, so "newest .scala vs stamp"
// is exactly "has sbt compile succeeded since the last source edit".
Compile / compile := {
  val result = (Compile / compile).value
  IO.touch(target.value / "graft_compile_stamp")
  result
}
