ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "graph500spark"
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
// Pass the forked JVM's stdout through raw instead of wrapping every line
// in sbt's "[info] " logger prefix: Bench/Verify print machine-readable
// JSON lines that downstream tooling parses.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and drop the trailing "[success] Total time" banner so the JSON line
// is the LAST stdout line of `sbt runMain`.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
  // 48g default (128 GiB box): at benchmark SCALE 20 the kernel arrays +
  // Spark block store put ~3 GB live in the heap, and a small heap's GC
  // pauses land in individual BFS run times (8g: median 106 ms, max
  // 0.5 s; 24g: median 75 ms, max 0.1 s) — which the harmonic-mean TEPS
  // amplifies ~2.5×. The headroom above that is for HUMONGOUS
  // allocation: each SCALE-20 construction allocates several 0.1-0.5 GB
  // contiguous primitive arrays, and in a fragmented 24g heap G1 stalls
  // finding contiguous regions for them (measured: buildFromRawPairs
  // 2 s in a fresh heap, 19-24 s on the SAME input after one prior
  // build+unpersist cycle).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // -Xms = -Xmx (lazy commit, no pre-touch): a heap that starts at the
  // JVM default and grows to tens of GB inside the first big shuffle
  // pays the growth as GC churn IN the timed stage — measured at
  // SCALE 24 the same construction plan cost 160 s in a fresh JVM vs
  // 61 s in a grown one with identical spill/shuffle work.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // 32m G1 regions (max): a 268 MB flat-pair array is ~9 contiguous
  // regions instead of ~34 8m ones — an order of magnitude fewer
  // contiguous-run searches for the humongous allocations above.
  "-XX:G1HeapRegionSize=32m",
  // G1's default 200 ms pause target lets a single mixed collection eat
  // 2-3× a SCALE-20 BFS run; a 50 ms target trades it for shorter, more
  // frequent pauses that the per-run timings absorb.
  "-XX:MaxGCPauseMillis=50",
  // The engine's explicit System.gc() calls (between protocol roots,
  // per-level in the capacity batched loop, gcSettle) exist to feed the
  // ContextCleaner so lineage-truncated shuffle files get deleted — NOT
  // to compact. On an 80 GB heap a stop-the-world full GC took >120 s,
  // the driver missed executor heartbeats (timeout 120 s), Spark
  // deregistered the local executor and every in-flight SCALE-26 task
  // died on vanished block-manager files. A concurrent G1 cycle feeds
  // the same reference queue without the fatal pause.
  "-XX:+ExplicitGCInvokesConcurrent",
)
