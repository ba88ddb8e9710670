ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "qualityspark"
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
// Pass the forked runMain's stdout through verbatim: sbt's default
// LoggedOutput prefixes every line with "[info] ", which breaks the
// driver's parse of Bench's single JSON result line (BENCH_r01/r02
// both show parsed:null for exactly this reason).
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
// Opt-in GC telemetry for soak forensics (r14 VERDICT #3): set
// SPARK_GRAFT_GCLOG=/path/gc.log to capture unified-logging GC records
// from the forked run — used to adjudicate whether a slow rep is heap
// pressure (full GCs, heap near cap) or ambient box load (quiet log).
javaOptions ++= sys.env.get("SPARK_GRAFT_GCLOG")
  .map(p => s"-Xlog:gc*:file=$p:time,uptime:filecount=1,filesize=64m")
  .toSeq
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: the bench suite outgrew 8g's comfort zone around 200
  // queries per pass (measured r12: +6% total from GC headroom alone on a
  // 128 GiB box); SPARK_DRIVER_MEM still overrides both ways
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
