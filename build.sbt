ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "covid19dataengineeringspark"
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
// The SIMD kernels (graft.simd.PanamaVecOps) build against the JDK's
// incubator Vector API — a JDK module, not a dependency. javac needs
// --add-modules for it, and the flag must go to a FORKED javac (setting
// javaHome forks it): zinc's in-process javac resolves the module inside
// the sbt JVM, where the incubator classes also ride sbt's
// java9-rt-export jar as unnamed-module classpath entries, and the
// duplicate definition dies on a superclass access check. Runtime JVMs
// get the real module via javaOptions below; a JVM launched WITHOUT it
// falls back to the scalar kernel (VecKernels loads the SIMD class
// reflectively), so embedding the jar elsewhere needs no flags.
javacOptions ++= Seq("--add-modules", "jdk.incubator.vector", "-encoding", "UTF-8")
Compile / javaHome := Some(file(sys.props("java.home")))
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
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: the bench/verify box has 128 GiB and runs local[32];
  // an 8g heap showed GC-correlated spikes on the heaviest bench
  // queries in full 204-query runs (e.g. q203 11.4 s @ 8g vs 5.6 s in
  // an otherwise-identical large-heap run). Override via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
