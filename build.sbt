ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "simpletonsmapreducespark"
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
// LocalClusterSpec owns the JVM's one SparkContext (local-cluster
// master with real executor processes) — its tests self-cancel unless
// GRAFT_LOCAL_CLUSTER=1 (forked test JVMs inherit the environment);
// exercise it dedicated:
//   GRAFT_LOCAL_CLUSTER=1 sbt 'testOnly graft.LocalClusterSpec'
// The in-JVM standalone Worker launches executor processes through
// SPARK_HOME's command builder, which needs the Scala version that
// spark's shell scripts would normally export.
Test / envVars += ("SPARK_SCALA_VERSION" -> "2.13")
// Forked run output defaults to LoggedOutput, which re-emits every
// child stdout line prefixed with "[info] " — breaking any consumer
// that JSON-parses the tool's output lines (the bench driver does
// json.loads on the tail of sbt's stdout). StdoutOutput hands the
// child sbt's own stdout: program output lands verbatim at column 0.
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
