ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datapipelinewithhdfssqlintegrationspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++
  // ad-hoc profiling flags for the forked JVM (e.g. -Xlog:gc*:file=…).
  // Split on ';' when one is present (for flags whose VALUE contains
  // spaces, e.g. a log-file path with spaces); otherwise on whitespace.
  // There is no quoting syntax — a flag needing BOTH delimiters in its
  // value is unsupported.
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
    .flatMap(v =>
      (if (v.contains(";")) v.split(";").toSeq else v.split("\\s+").toSeq)
        .map(_.trim).filter(_.nonEmpty))
