package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each scale-factor directory holds one parquet file per table. At cluster
  * scale these would be multi-file datasets; `spark.read.parquet` handles both
  * shapes identically, and all downstream operators rely only on schema.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) (rejected by
      // default — read as long nanos via the legacy conf) and
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) (surfaces as TIMESTAMP_NTZ).
      // Downstream queries always see long NANOS: timestampdiff is the one
      // NTZ→epoch conversion that never consults the session timezone.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType) df
      else df.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestampdiff(MICROSECOND, timestamp_ntz'1970-01-01 00:00:00', ts) * 1000"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
