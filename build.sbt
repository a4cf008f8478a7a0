ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vector_search_enginespark"
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
// The bench/verify mains are driven by a harness that tail-captures
// stdout and parses the LAST line as JSON. Two sbt defaults break that:
// the forked process's output is routed through the sbt logger (every
// line gains an "[info] " prefix) and sbt appends "[success] Total
// time: …" after the program's final println. Inherit stdout directly
// and suppress the success banner so the program's own last line IS the
// last line of captured output.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // the SIMD distance kernels (functions/VectorSimd.scala) use the JDK
  // Vector API, an incubator module that must be added explicitly
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: at 8g the 128-query bench run sat near the heap
  // ceiling (unified-memory caches + 32 task threads), and GC pressure
  // showed up as broad 2-3x slowdowns on queries whose plans had not
  // changed. The box has 128 GiB; local[32] IS the executor.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
