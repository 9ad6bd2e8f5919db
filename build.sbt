ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadoopwordcountspark"
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
  // 512m code cache (JDK 17 default: 240m): a 175-query codegen'd
  // sweep holds the default at a FLAT ~138 MB while the JIT keeps
  // compiling 0.1-1.6 s per query (r15 instrumented sweep) — i.e.
  // continuous nmethod eviction to make room. The intermittent
  // "execution flip" (a query running ~8-50x slow with idle probes,
  // zero GC, flat storage, RUNNABLE codegen threads, recovering on
  // re-run — r14/r15 NOTES) matches an eviction landing on the next
  // query's hot generated method, which then runs interpreted until
  // re-JIT. A larger reserve removes the turnover; flip frequency
  // across future sweeps is the measurement.
  "-XX:ReservedCodeCacheSize=512m",
  // 16g: local[32] runs the whole engine in one JVM, and the session
  // memos (persisted LSH signature + candidate frames) are long-lived
  // storage by design — at the 20x stress corpus an 8g heap let pinned
  // storage squeeze execution memory and big joins started spilling
  // late in a full sweep (q49 7.8->18.7s). Sizing memory to the
  // working set is the local analog of executor sizing on a cluster.
  // Default heap adapts to the host: the full 165-query sweep wants
  // 32g (the session memos — signatures, pairs, labels, exact-top-k —
  // accumulate on one local JVM; at 16g storage eviction thrashed
  // mid-sweep: q122 20.1 s in-sweep vs 1.17 s isolated, 0.84 s at
  // 32g), but hard-coding 32g would fail JVM startup on smaller
  // hosts where 16g ran everything except that sweep. So: 32g when
  // the host has the physical memory for it, 16g otherwise, and
  // SPARK_DRIVER_MEM always wins. The probe is HotSpot-specific
  // (com.sun.management cast, getTotalMemorySize is JDK 14+), so it
  // sits in a Try: on any other JVM the cast would crash the sbt
  // load, and the right behavior there is the conservative 16g
  // default, not a ClassCastException.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM",
    scala.util.Try(
      if (java.lang.management.ManagementFactory.getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
          .getTotalMemorySize >= 64L * 1024 * 1024 * 1024) "32g" else "16g"
    ).getOrElse("16g"))}",
)
