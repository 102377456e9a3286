ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mit65840mapreducespark"
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
// Pass the forked JVM's stdout through UNWRAPPED. sbt's default logged
// output strategy prefixes every line with "[info] ", so the bench
// contract's "ONE JSON line on stdout" never actually started with '{'
// — the driver's parser recorded parsed:null in every round (r01–r15).
run / outputStrategy := Some(StdoutOutput)
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

// ExecutorLossSuite runs a real local-cluster (separate executor JVMs) and
// therefore needs (a) its OWN test JVM — one SparkContext per JVM, while
// every other suite shares the local[4,2] session — and (b) the
// SPARK_SCALA_VERSION env var, which the standalone worker's executor
// launcher uses to resolve the /opt/spark distribution classpath.
Test / testGrouping := {
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars(Map("SPARK_SCALA_VERSION" -> "2.13"))
  val (chaos, rest) = (Test / definedTests).value
    .partition(_.name.endsWith("ExecutorLossSuite"))
  Seq(
    Tests.Group("executor-loss", chaos, Tests.SubProcess(forkOpts)),
    Tests.Group("main", rest, Tests.SubProcess(forkOpts))
  ).filter(_.tests.nonEmpty)
}
// one forked test JVM at a time: the chaos cluster must not contend with
// the shared-session suites for the box
Global / concurrentRestrictions += Tags.limit(Tags.ForkedTestGroup, 1)
