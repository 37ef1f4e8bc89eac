package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SimpleMode

/** Per-query plan inspection tool — [[PlanAudit]] gives the one-screen
  * whole-board overview; this prints the FULL plan of the named queries
  * for iterating on a single operator's shape:
  *
  *   runMain graft.PlanDump <sfDir> <query> [query…]        initial plan
  *   runMain graft.PlanDump --exec <sfDir> <query> [query…] executed
  *
  * `--exec` collects the result first and prints the FINAL adaptive
  * plan (isFinalPlan=true) — the only way to see AQE decisions: runtime
  * broadcast conversions, skew splits, and `ReusedExchange` stage
  * sharing (e.g. the bloom-union single-pass property PlanSpec locks).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val exec = args.headOption.contains("--exec")
    val fmt = args.headOption.contains("--fmt")
    val rest = if (exec || fmt) args.tail else args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- rest.tail) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, rest(0))
      if (exec) {
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else if (fmt) {
        // `--fmt`: explain("formatted") — the round-11 plan-artifact
        // format (plans/r11/<query>_{before,after}.txt)
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } else println(df.queryExecution.explainString(SimpleMode))
    }
    spark.stop()
  }
}
