ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "seqarrayspark"
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
)
// ---- Parallel test execution (round-12 verdict item 2) -------------------
// The driver's round-11 `sbt test` was aborted mid-suite by a shutdown
// hook (VERIFY_r11 tests_ok=false, no assertion failure in the tail) —
// the sequential 53-suite run had grown past the harness budget (~17 min
// on the builder's host). Suites are split into forked JVM groups run
// CONCURRENTLY: each group gets its own SparkSession (same getOrCreate
// semantics as before — within a group, suites still run sequentially,
// so specs that flip session confs like codegen.factoryMode keep their
// isolation), its own warehouse/derby dirs (BucketedJoinSpec's
// saveAsTable must not collide across JVMs), and the same JVM options.
// Known-heavy suites are pinned round-robin so no group inherits two of
// them; the rest hash. 6 groups × local[4] sessions ≈ the host's 32
// hardware threads; heap stays the per-fork default (6 × 8g peak fits
// the 128 GiB sandbox).
val testGroupCount = 6
// heaviest suites, pinned one-per-group (slowest first) so the longest
// pole never shares a group with another heavy suite
val heavySuites = Seq(
  "graft.MpegAudioSpec", "graft.SharedStagesSpec",
  "graft.Round10OpsSpec", "graft.Round11OpsSpec",
  "graft.PipelineFuzzSpec", "graft.CodegenOnlyQuerySpec",
  "graft.PopGenFuzzSpec", "graft.Round9OpsSpec",
  "graft.SeqArraySpec", "graft.Round8OpsSpec",
  "graft.KernelPropertySpec", "graft.Round8bOpsSpec")
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val base = (Test / javaOptions).value.toVector
  val tgt = (Test / target).value
  def groupOf(name: String): Int = {
    val h = heavySuites.indexOf(name)
    if (h >= 0) h % testGroupCount
    else math.abs(name.hashCode) % testGroupCount
  }
  (0 until testGroupCount).flatMap { i =>
    val members = tests.filter(t => groupOf(t.name) == i)
    if (members.isEmpty) None
    else Some(Tests.Group(
      s"g$i",
      members,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(base ++ Vector(
        s"-Dspark.sql.warehouse.dir=${(tgt / s"test-wh-$i").toURI}",
        s"-Dderby.system.home=${tgt / s"test-derby-$i"}")))))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(testGroupCount + 2))
