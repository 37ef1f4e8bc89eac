package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph statistics over a plain (pa, pb) edge DataFrame —
  * the graph-analytics layer a co-occurrence / dup-pair / kinship edge
  * set feeds once an engine query has built it (q221 part pairs, q33
  * near-dup pairs, q109 kinship pairs all produce this shape).
  *
  * Scale discipline: triangle counting uses the DEGREE-ORDERED
  * orientation (Suri & Vassilvitskii, WWW 2011; Cohen 2009): every edge
  * points from its lower (degree, id) endpoint, which bounds each
  * out-degree by O(√m), so the wedge self-join fans out O(m^{3/2})
  * total — the proven bound — instead of Σd² of the naive neighbor
  * join. All counters are exact BIGINTs.
  */
object Graphs {

  /** Exact triangle census + global clustering coefficient of the
    * undirected simple graph given as canonical (pa < pb) edges.
    * Returns ONE row: n_nodes, n_wedges (Σ d(d−1)/2), n_edges,
    * n_triangles, gcc = 3·triangles/wedges (NULL on a wedgeless
    * graph). Shuffles: one degree aggregate, two degree joins, the
    * bounded wedge self-join, and the closing edge join — every one
    * keyed, none enumerating non-adjacent pairs. */
  def triangleCensus(edges: DataFrame): DataFrame = {
    require(edges.columns.toSeq == Seq("pa", "pb"),
      s"triangleCensus expects canonical (pa, pb) edges; " +
        s"got ${edges.columns.mkString(",")}")
    val deg = edges.select(col("pa").as("node"))
      .unionByName(edges.select(col("pb").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("node").as("pa"), col("deg").as("da")), "pa")
      .join(deg.select(col("node").as("pb"), col("deg").as("db")), "pb")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("pa") < col("pb"))
    val oriented = withDeg.select(
      when(aFirst, col("pa")).otherwise(col("pb")).as("src"),
      when(aFirst, col("pb")).otherwise(col("pa")).as("dst"),
      when(aFirst, col("db")).otherwise(col("da")).as("ddeg"))
    val e1 = oriented.select(col("src").as("u"), col("dst").as("v"),
      col("ddeg").as("dv"))
    val e2 = oriented.select(col("src").as("u2"), col("dst").as("w"),
      col("ddeg").as("dw"))
    val wedges = e1.join(e2, col("u") === col("u2"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("v").as("ws"), col("w").as("wd"))
    val nTri = wedges
      .join(oriented.select(col("src"), col("dst")),
        col("src") === col("ws") && col("dst") === col("wd"))
      .agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(col("deg") * (col("deg") - 1L)).as("__w2"),
      sum(col("deg")).as("__e2"))
      .select(col("n_nodes"), expr("__w2 div 2").as("n_wedges"),
        expr("__e2 div 2").as("n_edges"))
    stats.crossJoin(broadcast(nTri))
      .withColumn("gcc", when(col("n_wedges") > 0,
        (lit(3L) * col("n_triangles")).cast("double")
          / col("n_wedges").cast("double")))
  }
}
