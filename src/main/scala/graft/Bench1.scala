package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: time one or more queries N times in a warm JVM.
  * `runMain graft.Bench1 <name[,name…]> [reps] [sfDir]` — a comma list
  * runs each query in sequence per rep (the warmup-diagnosis shape:
  * rep1 prices the cold shared-stage builds, rep2 the warm rides). */
object Bench1 {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 2
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { i =>
      val tRep = System.nanoTime()
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[bench1] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
      if (names.size > 1)
        println(f"[bench1] TOTAL rep$i: ${(System.nanoTime() - tRep) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
