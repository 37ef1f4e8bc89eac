package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT distributed Spearman rank correlation with textbook midrank tie
  * handling — no sampled ranks, no approximate quantile binning.
  *
  * Doubling every rank keeps midranks INTEGER (midrank2(v) =
  * 2·countBefore(v) + count(v) + 1), and Spearman is Pearson over the
  * midranks, so the whole statistic reduces to five BIGINT sums and the
  * closed form n·Σxy − Σx·Σy over √(n·Σxx − Σx²)·√(n·Σyy − Σy²). The
  * only floating ops are two IEEE-correctly-rounded sqrts, one multiply
  * and one divide — bit-identical in any engine that follows IEEE 754.
  *
  * Scale: ranks are assigned with the two-level cumsum discipline
  * (q228 / packSequences): per distinct value counts (grid-bounded
  * shuffle), bucket totals (summary-sized), a prefix scan over the TINY
  * bucket table, then within-bucket prefixes under a per-bucket
  * partitioned window — no single-partition data-sized exchange
  * anywhere. BIGINT bound: centered doubled midranks reach n, so the
  * product sums reach n³ and overflow int64 past n ≈ 2·10⁶ rows per
  * statistic — beyond that, widen the three product sums to 128-bit
  * partial aggregation before the closed form.
  */
object Spearman {

  /** Doubled midranks over a PRE-AGGREGATED per-value weight table
    * (`__mrv`, `__cnt`); returns (`__mrv`, `out`). Factored out so
    * [[corr]] can rank both axes from ONE pair-count table instead of
    * re-counting (and re-joining) the row-sized input per axis. */
  private def midranksOfCounts(counts0: DataFrame, bucketWidth: Long,
      out: String): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive; got $bucketWidth")
    val counts = counts0
      .withColumn("__mrb", expr(s"__mrv div $bucketWidth"))
    // bucket prefix over the tiny bucket summary
    val wB = Window.orderBy(col("__mrb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketPre = counts.groupBy(col("__mrb"))
      .agg(sum(col("__cnt")).as("__nb"))
      .withColumn("__bpre", sum(col("__nb")).over(wB) - col("__nb"))
      .select(col("__mrb"), col("__bpre"))
    // within-bucket prefix under a BALANCED per-bucket window
    val wIn = Window.partitionBy(col("__mrb")).orderBy(col("__mrv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("__ipre", sum(col("__cnt")).over(wIn) - col("__cnt"))
      .join(broadcast(bucketPre), "__mrb")
      .withColumn(out,
        lit(2L) * (col("__bpre") + col("__ipre")) + col("__cnt") + 1L)
      .select(col("__mrv"), col(out))
  }

  /** Append integer column `out` = doubled midrank of `valueCol`. */
  def midranks2(df: DataFrame, valueCol: String, bucketWidth: Long,
      out: String): DataFrame = {
    val counts = df.groupBy(col(valueCol).as("__mrv"))
      .agg(count(lit(1)).as("__cnt"))
    val ranked = midranksOfCounts(counts, bucketWidth, out)
    df.join(ranked, df(valueCol) === ranked("__mrv")).drop("__mrv")
  }

  /** One-row result: n, num = Σcx·cy, vx = Σcx², vy = Σcy² over
    * CENTERED doubled midranks (c = mr2 − (n+1); the doubled-rank mean
    * is exactly the integer n+1, so centering is exact), and
    * rho = num / (√vx·√vy). Centering before aggregation keeps every
    * sum ≤ n³ — the raw closed form n·Σmr² − (Σmr)² reaches n⁴ and
    * already overflows int64 at n = 6·10⁴. The 1-row count broadcast is
    * the documented benign scalar cross-join shape. */
  def corr(df: DataFrame, xCol: String, yCol: String,
      xBucket: Long, yBucket: Long): DataFrame = {
    // ONE data-sized pass: collapse rows to the (x, y) pair-count grid
    // first, then everything downstream — both per-axis count tables,
    // both midrank scans, n, and the five product sums (weighted by
    // the pair multiplicity: Σ over rows of cx·cy = Σ over pairs of
    // n_xy·cx·cy, exactly) — is grid-sized. The previous shape ranked
    // each axis with its own row-sized groupBy and joined the ranks
    // back to the ROWS, and its second midranks2 call re-derived the
    // whole first join just to count y values: the physical plan held
    // 10 parquet scans of the input; this one holds 1.
    // the pair grid is consumed by FOUR subtrees (cx, cy, n, the rank
    // attach); exchange reuse only folded two of them in the executed
    // plan, so materialize it once — O(grid) rows, orders below the
    // row-sized input (cluster: reliable checkpoint dir, SCALE.md)
    val pairs = graft.core.Checkpoints.truncate(
      df.select(col(xCol).as("__x"), col(yCol).as("__y"))
        .groupBy(col("__x"), col("__y")).agg(count(lit(1)).as("__np")))
    val cx = pairs.groupBy(col("__x").as("__mrv"))
      .agg(sum(col("__np")).as("__cnt"))
    val cy = pairs.groupBy(col("__y").as("__mrv"))
      .agg(sum(col("__np")).as("__cnt"))
    val rx = midranksOfCounts(cx, xBucket, "__rx")
      .select(col("__mrv").as("__x"), col("__rx"))
    val ry = midranksOfCounts(cy, yBucket, "__ry")
      .select(col("__mrv").as("__y"), col("__ry"))
    val tot = pairs.agg(sum(col("__np")).as("__n"))
    // NOTE (measured, round 12): forcing shuffle_hash on these two rank
    // attaches re-shuffled the pair table twice and ran 2× SLOWER than
    // letting the planner broadcast the grid-sized rank tables
    // (6.9 s vs 3.4 s at sf0.1/32c) — leave the strategy to the planner
    pairs.join(rx, "__x").join(ry, "__y")
      .crossJoin(broadcast(tot))
      .select(col("__n"), col("__np"),
        (col("__rx") - (col("__n") + 1L)).as("__cx"),
        (col("__ry") - (col("__n") + 1L)).as("__cy"))
      .groupBy(col("__n"))
      .agg(sum(col("__np") * col("__cx") * col("__cy")).as("num"),
        sum(col("__np") * col("__cx") * col("__cx")).as("vx"),
        sum(col("__np") * col("__cy") * col("__cy")).as("vy"))
      .withColumn("rho", when(col("vx") > 0 && col("vy") > 0,
        col("num").cast("double")
          / (sqrt(col("vx").cast("double")) * sqrt(col("vy").cast("double")))))
      .select(col("__n").as("n"), col("num"), col("vx"), col("vy"),
        col("rho"))
  }
}
