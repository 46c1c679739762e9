ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "awscdkpipelinesdatalakeetlspark"
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
// Pass the forked process's stdout straight through: sbt's default
// LoggedOutput prefixes every line with "[info] ", which breaks the
// round driver's json.loads over Bench's contract line (BENCH_r01/r02
// both show parsed:null for exactly this reason).
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// ad-hoc JVM flags for probes (e.g. -XX:+PrintCompilation when
// chasing JIT behavior) without editing the build
javaOptions ++= sys.env.get("GRAFT_EXTRA_JVM")
  .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] runs driver+executors in ONE JVM; 8g starves 32 task
  // threads once a long run accumulates state (the box has 128 GiB).
  // r16: 24g → 48g — the sf1 catalog's heavy lanes (triangle merge
  // join, WAND rescore) GC-thrash a 240-query-old 24g heap (measured:
  // 172 s task GC in one stage; the same plan in a fresh JVM runs
  // 21 s with 5 s GC), and the broadcast-adjacency plan adds ~GB-scale
  // hashed relations per execution. Half the box is still left for
  // page cache.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // r15: a 240-query catalog generates thousands of codegen classes;
  // JDK 17's default 240 MB reserved code cache fills mid-run and the
  // sweeper starts flushing HOT generated methods, which then run
  // INTERPRETED — measured as a 60× executor-CPU blowup on the heavy
  // mid-catalog stages (q_minhash_recall's band self-join: 2,325 s CPU
  // for a stage that takes 38 s CPU in a fresh JVM; wall 83 s vs 6 s)
  // with zero GC signal. 1 GiB holds the whole catalog's compiled code.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "1g")}",
  // r17 (VERDICT r16 ask 2 — mechanism MEASURED, not inferred): the
  // default 100-entry whole-stage-codegen cache THRASHES on stage-rich
  // lanes (q_minhash_recall alone generates 92 classes), so every
  // repeat execution recompiled ~40 generated classes and re-paid
  // HotSpot JIT on each (QueryTime probe: warm runs showed
  // codegen_compiles=33-43 and jit_ms=12-15k every run; at 4096
  // entries the repeats drop to 0 and steady-state improves 5.8->4.3 s
  // at sf0.1). On a contended box those perpetually-fresh classes run
  // interpreted far longer - the repeated warm heavy-CPU signature the
  // r16 gate trace could not explain. Static SQL conf, so set at JVM
  // level; ~100-200 MB worst-case heap for cached sources on the 48 g
  // heap.
  "-Dspark.sql.codegen.cache.maxEntries=4096",
  // r17, same investigation: Spark embeds the per-query codegen stage
  // ID in the generated CLASS NAME (spark.sql.codegen.useIdInClassName,
  // default true), and AQE materializes stages in a nondeterministic
  // order, so identical plans get renumbered between runs - every
  // renumbered fragment is a codegen-cache MISS even with the larger
  // cache (measured: q_bm25_pruned recompiled 46-112 classes per
  // repeat run; with the id out of the class name, 0-2). The id is
  // cosmetic (debug stack traces); correctness is unaffected.
  "-Dspark.sql.codegen.useIdInClassName=false",
)
