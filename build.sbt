ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "commonsurveydatapipelinespark"
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
// Pass the forked JVM's stdout through RAW: sbt's default logger prefixes
// every child line with "[info] ", which breaks any consumer that greps
// for a line-anchored JSON object (graft.Bench's contract is ONE JSON
// line on stdout; rounds 1-2 lost their bench signal to this prefix).
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
  // r18 (opt guide §2.2, measured): the bypass-merge shuffle writer
  // creates ONE FILE PER REDUCE PARTITION PER MAP TASK — M×R file
  // creates per shuffle (32×32 = 1024 here), and a CPU-weighted stack
  // profile showed FileOutputStream.open0 under DiskBlockObjectWriter
  // was 45% of the heavy dedup queries' executor CPU (29 of 63 s on
  // q_dedup_incremental_exact ×3 runs) — the direct cause of the
  // driver-measured 32-core anti-scaling (8 cores ⇒ 8×8 files, 16×
  // fewer creates). Threshold 0 routes small-R shuffles to the
  // serialized (unsafe) writer: one spill file + one data/index pair
  // per MAP TASK regardless of R. Scale-safe, not a local[32] tune: at
  // production partition counts (R > 200) bypass-merge never fires, so
  // the setting is inert there — it only removes the small-R syscall
  // storm. Static conf (read at shuffle registration), hence set JVM-
  // wide here and not per session; override via SPARK_GRAFT_BYPASS_T.
  s"-Dspark.shuffle.sort.bypassMergeThreshold=${
    sys.env.getOrElse("SPARK_GRAFT_BYPASS_T", "0")}",
  // r18 (measured): without libhadoop, RawLocalFileSystem.setPermission
  // forks a `chmod` PROCESS per written file — one fork/exec+join per
  // tiny parquet file in the micro-batch-heavy queries (wall-sampled as
  // a top write-stage state on q_summary_bucketed). The graft subclass
  // reroutes it through java.nio with identical semantics; local-FS
  // only, other schemes untouched. Unset SPARK_GRAFT_NIO_FS=0 to fall
  // back to the stock implementation.
  s"-Dspark.hadoop.fs.file.impl=${
    if (sys.env.get("SPARK_GRAFT_NIO_FS").contains("0"))
      "org.apache.hadoop.fs.LocalFileSystem"
    else "graft.io.NioLocalFileSystem"}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
