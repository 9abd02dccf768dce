ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cloudwatchsematextawslambdalogshipperspark"
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
// The bench driver parses the LAST line of the captured stdout tail as
// JSON. By default sbt pipes forked output through its logger ("[info] "
// prefix on every line) and prints a "[success] Total time…" trailer
// after the run — both defeat the parse (BENCH_r07 "parsed": null).
// StdoutOutput passes forked-process output through verbatim;
// showSuccess drops the trailer, so the capture ENDS with bare JSON.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // This box is a microVM with ~100-400us first-touch page faults: every
  // freshly touched JVM page costs syscall-like time (touching 4 GB took
  // minutes in isolation). G1's 32 parallel GC threads + eager region
  // touching and Spark's 64 MB task-memory pages made 8-row shuffles take
  // ~10 s of system time. Serial GC + small initial heap + small Spark
  // memory pages make paging pay-as-you-go (measured: flagship query
  // 45 s -> 1.6 s).
  "-XX:+UseSerialGC",
  "-Xms256m",
  "-Dspark.buffer.pageSize=4m",
)
