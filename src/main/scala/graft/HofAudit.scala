package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.HigherOrderFunction
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback

/** Board-wide interpreted-expression audit (round-11 optimization
  * tooling): Spark HOFs (`transform`/`filter`/`aggregate`/…) and every
  * other `CodegenFallback` expression run INTERPRETED per row — the
  * per-task-work class the optimization guide's §4 targets. This main
  * prints, for every query whose optimized plan contains one, the
  * expression class names and counts, so the expensive sites can be
  * ranked against bench seconds and kernel-ized (the DosageStatsExpr /
  * SampleQcExpr discipline).
  *
  *   runMain graft.HofAudit [sfDir]
  */
object HofAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val opt = fn(spark, dir).queryExecution.optimizedPlan
        val hits = scala.collection.mutable.Map.empty[String, Int]
        opt.foreach { node =>
          node.expressions.foreach(_.foreach {
            case h: HigherOrderFunction =>
              val k = "HOF:" + h.getClass.getSimpleName
              hits(k) = hits.getOrElse(k, 0) + 1
            case c: CodegenFallback
                if !c.getClass.getName.contains("graft") =>
              val k = "FB:" + c.getClass.getSimpleName
              hits(k) = hits.getOrElse(k, 0) + 1
            case _ =>
          })
        }
        if (hits.nonEmpty)
          println(s"$name\t" + hits.toSeq.sortBy(-_._2)
            .map { case (k, n) => s"$k=$n" }.mkString(" "))
      } catch {
        case e: Throwable =>
          println(s"$name\tERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
