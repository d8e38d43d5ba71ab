ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sampledmskinesisrdsmariadbspark"
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
// Pass the forked app's stdout straight through instead of routing it
// via sbt's logger: the logger prefixes every line with "[info] ",
// which breaks machine parsing of Bench/Verify's JSON output lines.
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
  // 16g default (was 8g): the full 137-query bench in one 32-thread
  // JVM at 8g ran full GCs whose 200-500 ms pauses landed inside
  // random sub-second queries — the per-run "flag roulette" where a
  // different handful of queries measured 1.5-2x slow in every run
  // with steady CPU sentinels. More headroom + a 50 ms G1 pause
  // target bound the per-query noise tail instead of the throughput.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+UseG1GC", "-XX:MaxGCPauseMillis=50",
)

// ScalaCheck default minSuccessful is 100; every property here runs
// Spark jobs against an independent plain-Scala reference, so 100
// random cases per law cost ~45 min of the test wall clock while the
// marginal cases past ~16 re-explore the same small generator
// domains. 16 keeps the shrink-on-failure diagnostics and the
// independent-reference discipline at a quarter of the wall time;
// suites that need a SPECIFIC budget (streaming roundtrips at 8,
// BPE at 12) still set it via overrideParameters, which composes on
// top of (and overrides) this base.
Test / testOptions += Tests.Argument(
  TestFrameworks.ScalaCheck, "-minSuccessfulTests", "16")
