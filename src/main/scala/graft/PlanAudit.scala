package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SimpleMode

/** Whole-board physical-plan audit: prints a FLAG line for every query
  * whose plan contains a nested-loop join, a cartesian product, or a
  * global sort outside TakeOrdered — the shapes that do not survive a
  * 100× scale-up. The expected output is ONLY the known-benign
  * BroadcastNestedLoopJoin set: crossJoins against broadcast ≤k-row
  * aggregates (centroid tables, totals rows, bucket maps) and broadcast
  * probe sets on non-equi predicates (kNN's `vec_id =!= probe_id`),
  * each documented at its query. A new FLAG on any other query is a
  * regression; `PlanSpec` pins the per-query shapes, this main gives
  * the one-screen overview (`runMain graft.PlanAudit`).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val p = fn(spark, dir).queryExecution.explainString(SimpleMode)
        // SimpleMode prints SortExec as `Sort [keys], <global>, 0` —
        // a global sort is the line-local `], true, 0` (PlanSpec pins
        // the same format when asserting `false, 0` for local sorts);
        // TakeOrderedAndProject prints no Sort node, so no mask needed
        val flags = Seq(
          "nested-loop" -> p.contains("BroadcastNestedLoopJoin"),
          "cartesian" -> p.contains("CartesianProduct"),
          "global-sort" -> p.linesIterator.exists(l =>
            l.contains("Sort [") && l.contains("], true, 0"))
        ).filter(_._2).map(_._1)
        if (flags.nonEmpty) println(s"FLAG $name: ${flags.mkString(",")}")
      } catch { case e: Throwable =>
        println(s"ERR $name: ${String.valueOf(e.getMessage).take(100)}")
      }
    }
    println("AUDIT DONE")
    spark.stop()
  }
}
