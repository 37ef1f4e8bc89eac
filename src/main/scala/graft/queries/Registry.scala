package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark implementation plus (when SQL-expressible)
  * an equivalent ANSI-SQL oracle the driver runs in DuckDB over the same
  * parquet tables. Column names MUST match between the two — the driver's
  * compare sorts columns by name before hashing values.
  *
  * @param bench whether Bench includes this query in the headline timing run.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true)

trait QueryModule {
  def queries: Seq[Q]
}
