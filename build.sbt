ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "projectetlspark"
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
// Pass the forked JVM's stdout through untouched: sbt's default logger
// prefixes every line with "[info] ", which corrupts Bench's one-line
// JSON contract for any downstream parser expecting a raw JSON line.
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
) ++ {
  // Scratch on tmpfs when the host has one: java.io.tmpdir holds the
  // streaming drains' temp checkpoints (offset WAL + state deltas) and
  // Spark's local dirs hold shuffle files — on a memory-rich node both
  // are classic RAM-disk targets (round-9 A/B at sf0.1: 267 s on ext4
  // /tmp vs 238 s on /dev/shm, ~11% of the whole bench). Production
  // clusters configure spark.local.dir per node; this only tunes the
  // local single-JVM harness. SPARK_GRAFT_TMPDIR overrides; set it to a
  // disk path to opt out.
  val shm = new java.io.File("/dev/shm")
  val tmp = sys.env.get("SPARK_GRAFT_TMPDIR").orElse {
    if (shm.isDirectory && shm.canWrite) {
      val t = new java.io.File(shm, "graft-tmp"); t.mkdirs()
      Some(t.getAbsolutePath)
    } else None
  }
  tmp.toSeq.flatMap(t =>
    Seq(s"-Djava.io.tmpdir=$t", s"-Dspark.local.dir=$t"))
}
