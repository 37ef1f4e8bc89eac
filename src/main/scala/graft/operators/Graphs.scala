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
  def triangleCensus(edges: DataFrame,
      materialize: Boolean = false): DataFrame = {
    require(edges.columns.toSeq == Seq("pa", "pb"),
      s"triangleCensus expects canonical (pa, pb) edges; " +
        s"got ${edges.columns.mkString(",")}")
    // The edge set is referenced by the degree build (twice, via the
    // union), the orientation join and the closing join, and `oriented`
    // three more times — with an expensive upstream derivation (q257
    // builds edges from a distinct + self-join + aggregate) the physical
    // plan inlines that subtree per reference and AQE's exchange reuse
    // only folds a few copies (the executed q257 plan ran 35 lineitem
    // scans). `materialize` (CALLER OPT-IN — it runs Spark jobs eagerly
    // at DataFrame-construction time) truncates the edge set and the
    // oriented edges once each for such callers; cheap-edge callers
    // must keep the default: the eager checkpoint is pure added cost
    // where AQE reuse already folds the copies (measured 2.7 s ->
    // 5.4 s on q249's pattern).
    def trunc(df: DataFrame): DataFrame = if (materialize)
      df.transform(graft.core.Checkpoints.truncate[org.apache.spark.sql.Row])
    else df
    val e0 = trunc(edges)
    val deg = e0.select(col("pa").as("node"))
      .unionByName(e0.select(col("pb").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = e0
      .join(deg.select(col("node").as("pa"), col("deg").as("da")), "pa")
      .join(deg.select(col("node").as("pb"), col("deg").as("db")), "pb")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("pa") < col("pb"))
    val oriented = withDeg.select(
        when(aFirst, col("pa")).otherwise(col("pb")).as("src"),
        when(aFirst, col("pb")).otherwise(col("pa")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("ddeg"))
      .transform(trunc)
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

  /** INTEGER-TOKEN PageRank (Page et al. 1999 power iteration under a
    * "random surfer carries indivisible tokens" discretization): every
    * node of the directed (src, dst) edge set starts with `scale`
    * tokens, and each of `iters` rounds applies
    *
    *   mass'(v) = (15·scale) div 100
    *            + (85 · (Σ_{u→v} mass(u) div outdeg(u)
    *                     + dangling div n)) div 100
    *
    * — pure BIGINT arithmetic (damping 0.85 as an exact integer
    * fraction, dangling mass redistributed evenly), so ANY engine
    * replays the result bit-for-bit. Classic double-precision PageRank
    * accumulates in data order and can never hash-match across
    * engines; the token form trades exact mass conservation (division
    * remainders evaporate deterministically) for replayability.
    *
    * Scale shape: per round ONE src-keyed contribution join + ONE
    * dst-keyed aggregate + a 1-row dangling aggregate (broadcast) +
    * one node-keyed left join — all linear in edges; no round touches
    * a pair set or an unpartitioned data-sized window. Lineage is
    * truncated per round (eager localCheckpoint; swap for a reliable
    * checkpoint dir on a cluster — SCALE.md). Returns (node, mass)
    * after `iters` rounds. */
  def pageRankInt(edges: DataFrame, iters: Int,
      scale: Long = 1000000L): DataFrame = {
    require(edges.columns.toSeq == Seq("src", "dst"),
      s"pageRankInt expects (src, dst) edges; got " +
        edges.columns.mkString(","))
    require(iters >= 1 && scale >= 100L,
      s"need iters >= 1 and scale >= 100; got $iters, $scale")
    // the edge set is consumed once per round — materialize it ONCE so
    // an expensive upstream derivation (joins, windows, distinct) never
    // replays per iteration (cluster: reliable checkpoint dir, SCALE.md).
    // Pre-partitioned by src BEFORE the checkpoint: the per-round
    // contribution join keys on src, and a checkpoint preserves its
    // physical partitioning — so the edge shuffle happens once at build
    // instead of once per round (guide §2.4, "two operations keyed the
    // same way can share one exchange").
    val e = edges.repartition(col("src"))
      .transform(graft.core.Checkpoints.truncate[org.apache.spark.sql.Row])
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .transform(graft.core.Checkpoints.truncate[org.apache.spark.sql.Row])
    val n = nodes.count()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("__od"))
    val base = 15L * scale / 100L
    var mass = nodes.withColumn("mass", lit(scale))
    for (_ <- 1 to iters) {
      val m = mass.join(outdeg, Seq("node"), "left")
      val contrib = m.filter(col("__od").isNotNull)
        .select(col("node").as("src"),
          expr("mass div __od").as("__c"))
      val inflow = e.join(contrib, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("__c")).as("__in"))
      val dangle = broadcast(m.filter(col("__od").isNull)
        .agg(coalesce(sum(col("mass")), lit(0L)).as("__dg")))
      mass = nodes.join(inflow, Seq("node"), "left")
        .crossJoin(dangle)
        .withColumn("mass", lit(base) +
          expr(s"(85 * (coalesce(__in, 0L) + __dg div ${n}L)) div 100"))
        .select(col("node"), col("mass"))
        .transform(graft.core.Checkpoints.truncate[org.apache.spark.sql.Row])
    }
    mass
  }

  /** SYNCHRONOUS LABEL PROPAGATION communities (Raghavan et al. 2007,
    * made deterministic): labels start as node ids; each round every
    * node adopts the most frequent label among its neighbors AND
    * itself (label retention — the self-vote damps the oscillation
    * synchronous LPA exhibits on near-bipartite structures), ties
    * broken by the SMALLEST label — the argmax is the lexicographic
    * MIN of (−count, label), so the update is an aggregate, not a
    * window, and replays bit-for-bit in any engine. (Negating the
    * COUNT is overflow-safe — counts are nonnegative; the previous
    * max(count, −label) form silently inverted the tie order for a
    * label equal to Long.MinValue, which raw xxhash64 node ids can
    * produce.) The graph is symmetrized (undirected) and deduplicated
    * once up front.
    *
    * Scale: per round ONE label join on dst + two keyed aggregates —
    * linear in edges, the [[pageRankInt]] discipline; lineage truncated
    * per round (localCheckpoint; swap for a reliable checkpoint dir on
    * a cluster — SCALE.md). Returns (node, label) after `iters`
    * rounds. */
  def labelPropagation(edges: DataFrame, iters: Int): DataFrame = {
    require(edges.columns.toSeq == Seq("src", "dst"),
      s"labelPropagation expects (src, dst) edges; got " +
        edges.columns.mkString(","))
    require(iters >= 1, s"need iters >= 1; got $iters")
    // symmetrized once; pre-partitioned by dst BEFORE the checkpoint —
    // the per-round label join keys on dst, and a checkpoint preserves
    // its physical partitioning, so the edge shuffle happens once at
    // build instead of once per round (the pageRankInt discipline)
    val e = edges
      .unionByName(edges.select(col("dst").as("src"),
        col("src").as("dst")))
      .distinct()
      .repartition(col("dst"))
      .transform(graft.core.Checkpoints.truncate[org.apache.spark.sql.Row])
    val nodes = e.select(col("src").as("node")).distinct()
      .transform(graft.core.Checkpoints.truncate[org.apache.spark.sql.Row])
    var lab = nodes.withColumn("label", col("node"))
    for (_ <- 1 to iters) {
      // ONE exchange per round: hash(node) SATISFIES the clustering
      // requirement of BOTH aggregates (partitioning expressions are a
      // subset of the (node, nl) grouping), so partitioning the raw
      // contributions by node up front replaces the previous two
      // exchanges — the (node, nl) count shuffle AND the (node)
      // argmin shuffle (guide §2.4, "two operations keyed the same
      // way can share one exchange").
      val neigh = e
        .join(lab.select(col("node").as("dst"), col("label").as("nl")),
          "dst")
        .select(col("src").as("node"), col("nl"))
        .unionByName(lab.select(col("node"), col("label").as("nl")))
        .repartition(col("node"))
        .groupBy(col("node"), col("nl"))
        .agg(count(lit(1)).as("c"))
      lab = neigh
        .groupBy(col("node"))
        .agg(min(struct((-col("c")).as("nc"), col("nl").as("nl")))
          .as("b"))
        .select(col("node"), col("b.nl").as("label"))
        .transform(graft.core.Checkpoints.truncate[org.apache.spark.sql.Row])
    }
    lab
  }
}
