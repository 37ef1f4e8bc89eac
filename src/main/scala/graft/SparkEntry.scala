package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Q, QueryModule}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by the modules under `graft.queries`; each module
  * covers one slice of the reference's operator inventory (SURVEY.md §2).
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    graft.queries.Relational,
    graft.queries.Genomics,
    graft.queries.TextDedup,
    graft.queries.Similarity,
    graft.queries.Units,
    graft.queries.Merge,
    graft.queries.VcfQ,
    graft.queries.MultimodalQ,
    graft.queries.PackedGeno,
    graft.queries.BedQ,
    graft.queries.Sampling,
    graft.queries.PopGenQ)

  lazy val all: Seq[Q] = {
    val qs = modules.flatMap(_.queries)
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
