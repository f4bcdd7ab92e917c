ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pythonctdspark"
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
  // local[32] drives 32 concurrent tasks in one JVM; size the heap to the
  // machine (driver boxes have 128 GiB) rather than the 8g JVM-ish default
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // a 51-query suite x warmup+3 timed passes janino-compiles thousands of
  // generated classes; the JDK default 240m code cache can fill, silently
  // disabling the JIT mid-suite (10-20x tail-query slowdowns)
  "-XX:ReservedCodeCacheSize=1g",
  // Catalyst's analyzer recursions (DeduplicateRelations, resolution) are
  // plan-depth-deep; a 26-channel cast through the per-column QC chain
  // overflows the JDK default 1m thread stack (spark-submit itself raises
  // the stack for the same reason)
  "-Xss32m",
)
