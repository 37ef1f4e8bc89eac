package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.Tables
import graft.functions.vectorfns._

/** Similarity search over the `embeddings` table (builder brief): exact
  * brute-force cosine top-k as the baseline, and a signed-random-projection
  * LSH bucketed variant as the scale path.
  *
  * Scale design (100 TB): the probe set is always the small side and is
  * broadcast, so the corpus is scanned once with no shuffle of the big side;
  * top-k per probe is a bounded window over probe-partitions. The ANN
  * variant replaces the full scan with an equi-join on the LSH bucket key —
  * the corpus side can be pre-bucketed (partitioned) by that key, making the
  * probe lookup a pruned scan instead of O(n) per probe.
  *
  * Oracle parity: all scoring is on quantized integer vectors (see
  * [[graft.functions.vectorfns]]), so DuckDB reproduces every cosine bit.
  */
object Similarity extends QueryModule {

  private val SCALE = 10000
  private val PROBE_MOD = 40
  // Banded multi-table SRP: TABLES independent BITS-bit signatures. For a
  // neighbor at angle θ each signature bit agrees with prob p = 1 − θ/π,
  // so recall ≈ 1 − (1 − p^BITS)^TABLES: bits control precision (bucket
  // occupancy n/2^BITS ⇒ candidate volume), tables control recall (a true
  // neighbor colliding in ANY table becomes a candidate). The ANN search
  // (q37) additionally MULTI-PROBES: each probe visits its own bucket
  // plus the BITS single-bit-flip neighbors per table (Lv et al. 2007),
  // lifting the per-table hit probability from p^BITS to
  // p^BITS + BITS·p^(BITS−1)(1−p) — at this corpus's hostile p≈0.61
  // (true top-3 neighbors sit at cos 0.29–0.43) that is 0.019 → 0.118
  // per table, ~0.87 recall over 16 tables, for a 9× larger broadcast
  // probe side and an unchanged corpus scan. Measured floors are pinned
  // in AnnRecallSpec (16 bits × 4 tables scored ~0.10 recall@3:
  // near-singleton buckets at test n, and p^16 vanishes for any
  // non-near-dup angle). At larger n, grow BITS with log2(n) to hold
  // occupancy, adding tables to keep recall. CAP bounds the members
  // considered per (table, bucket) so a degenerate bucket can never
  // produce O(n²) pairs — candidates ≤ TABLES · n · CAP by construction.
  private val SRP_BITS = 8
  private val SRP_TABLES = 16
  private val BUCKET_CAP = 64

  /** (tab, bucket) signature rows, one per table, Spark side. */
  private def sigs(e: org.apache.spark.sql.DataFrame) = e
    .select(col("vec_id"), col("qv"), col("nrm"),
      explode(array((0 until SRP_TABLES).map(t =>
        struct(lit(t).as("tab"),
          srpBucket(col("qv"), SRP_BITS, t).as("bucket"))): _*)).as("sig"))
    .select(col("vec_id"), col("qv"), col("nrm"),
      col("sig.tab").as("tab"), col("sig.bucket").as("bucket"))

  /** The identical signature rows in DuckDB SQL (from relation `n`). */
  private def sigSql: String = (0 until SRP_TABLES).map { t =>
    s"""SELECT vec_id, qv, nrm, $t AS tab,
        ${srpBucketSql("qv", SRP_BITS, t)} AS bucket FROM n"""
  }.mkString(" UNION ALL ")

  /** Quantized corpus CTE shared by both oracles. */
  private val qCte =
    s"""SELECT vec_id, label,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * $SCALE) AS BIGINT)) AS qv
       FROM embeddings"""

  private val dotSql =
    "CAST(list_sum(list_transform(range(1, len(%s) + 1), i -> %s[i] * %s[i])) AS BIGINT)"

  private def dot2(a: String, b: String) = dotSql.format(a, a, b)

  /** Shared oracle CTE fragments — ONE source for the brute and ANN
    * rank chains, consumed by q36, q37, AND the q156 recall report (a
    * drifted copy would make the recall harness measure a stale shape
    * while each query still passed its own gate). Each expects a `q`
    * CTE ([[qCte]]) in scope. */
  private lazy val nCteSql =
    s"n AS (SELECT vec_id, qv, ${dot2("qv", "qv")} AS nrm FROM q)"

  private lazy val bruteScoreCtesSql =
    s"""p AS (SELECT vec_id AS probe_id, qv AS pv, nrm AS pnrm FROM n
            WHERE vec_id % $PROBE_MOD = 0),
      bscored AS (SELECT probe_id, vec_id,
        CASE WHEN pnrm > 0 AND nrm > 0 THEN
          CAST(${dot2("pv", "qv")} AS DOUBLE) /
            (sqrt(CAST(pnrm AS DOUBLE)) * sqrt(CAST(nrm AS DOUBLE))) END
          AS cos
        FROM n JOIN p ON vec_id <> probe_id)"""

  private lazy val annCandCtesSql =
    s"""sig AS ($sigSql),
      corp AS (SELECT * FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY tab, bucket
           ORDER BY vec_id) AS rk FROM sig) WHERE rk <= $BUCKET_CAP),
      prb AS (SELECT vec_id AS probe_id, qv AS pv, nrm AS pnrm,
              tab AS ptab, xor(bucket, m) AS pbucket FROM sig,
              (SELECT unnest([${(0L +: (0 until SRP_BITS)
                .map(b => 1L << b)).mkString(", ")}]) AS m)
              WHERE vec_id % $PROBE_MOD = 0),
      cand AS (SELECT probe_id, vec_id, MAX(
        CASE WHEN pnrm > 0 AND nrm > 0 THEN
          CAST(${dot2("pv", "qv")} AS DOUBLE) /
            (sqrt(CAST(pnrm AS DOUBLE)) * sqrt(CAST(nrm AS DOUBLE))) END)
          AS cos
        FROM corp JOIN prb ON tab = ptab AND bucket = pbucket
          AND vec_id <> probe_id
        GROUP BY probe_id, vec_id)"""

  private def topkSql(src: String, k: Int): String =
    s"""SELECT probe_id, vec_id, cos, rank FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
           ORDER BY cos DESC, vec_id) AS rank FROM $src)
      WHERE rank <= $k"""

  /** Brute-force exact cosine top-k per probe (the correctness
    * baseline); (probe_id, vec_id, cos, rank ≤ k). */
  private def bruteTopK(s: org.apache.spark.sql.SparkSession, dir: String,
      k: Int): org.apache.spark.sql.DataFrame =
    topKFrom(Tables(s, dir, "embeddings")
      .select(col("vec_id"), quantize(col("embedding"), SCALE).as("qv")), k)

  /** [[bruteTopK]] on the FIRST `dims` dimensions only — the
    * Matryoshka/truncated-embedding retrieval lane (score with a cheap
    * prefix, optionally re-rank with the full vector). */
  private def prefixTopK(s: org.apache.spark.sql.SparkSession,
      dir: String, k: Int, dims: Int): org.apache.spark.sql.DataFrame =
    topKFrom(Tables(s, dir, "embeddings")
      .select(col("vec_id"),
        slice(quantize(col("embedding"), SCALE), 1, dims).as("qv")), k)

  /** Exact cosine top-k over a prepared (vec_id, qv) corpus — one
    * broadcast of the ≤ |corpus|/PROBE_MOD probe rows, one ranked
    * window per probe. */
  private def topKFrom(eIn: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val e = eIn.withColumn("nrm", dotLong(col("qv"), col("qv")))
    val probes = e.filter(col("vec_id") % PROBE_MOD === 0)
      .select(col("vec_id").as("probe_id"), col("qv").as("pv"),
        col("nrm").as("pnrm"))
    val scored = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosineQ(dotLong(col("pv"), col("qv")), col("pnrm"), col("nrm"))
          .as("cos"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // --- brute-force exact top-k (the correctness baseline). -----------------
  private val q36 = Q("q36_knn_brute",
    (s, dir) => bruteTopK(s, dir, 5),
    Some(s"""WITH q AS ($qCte),
      $nCteSql,
      $bruteScoreCtesSql
      ${topkSql("bscored", 5)}"""))

  // --- LSH-bucketed ANN: banded multi-table equi-join on (table, bucket)
  // instead of a full scan per probe. Corpus membership per bucket is
  // capped (rank by vec_id) so the probe join touches at most CAP rows
  // per (table, bucket); probes keep all their buckets. Candidates are
  // deduped across tables with a max() aggregate (cosine is
  // deterministic per pair, so max == the value). -------------------------
  /** SRP-LSH multi-probe ANN top-k per probe; (probe_id, vec_id, cos,
    * rank ≤ k). */
  private def annTopK(s: org.apache.spark.sql.SparkSession, dir: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    val e = Tables(s, dir, "embeddings")
      .select(col("vec_id"), quantize(col("embedding"), SCALE).as("qv"))
      .withColumn("nrm", dotLong(col("qv"), col("qv")))
    val sg = sigs(e)
    val wB = Window.partitionBy(col("tab"), col("bucket"))
      .orderBy(col("vec_id"))
    val corp = sg.withColumn("rk", row_number().over(wB))
      .filter(col("rk") <= BUCKET_CAP)
    // multi-probe: own bucket + every single-bit flip (mask 0 first)
    val masks = array((lit(0L) +:
      (0 until SRP_BITS).map(b => lit(1L << b))): _*)
    val probes = sg.filter(col("vec_id") % PROBE_MOD === 0)
      .select(col("vec_id").as("probe_id"), col("qv").as("pv"),
        col("nrm").as("pnrm"), col("tab").as("ptab"),
        explode(masks).as("m"), col("bucket"))
      .select(col("probe_id"), col("pv"), col("pnrm"), col("ptab"),
        col("bucket").bitwiseXOR(col("m")).as("pbucket"))
    val cand = corp.join(broadcast(probes),
        col("tab") === col("ptab") && col("bucket") === col("pbucket") &&
          col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        cosineQ(dotLong(col("pv"), col("qv")), col("pnrm"), col("nrm"))
          .as("cos"))
      .groupBy(col("probe_id"), col("vec_id"))
      .agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  private val q37 = Q("q37_ann_lsh",
    (s, dir) => annTopK(s, dir, 3),
    Some(s"""WITH q AS ($qCte),
      $nCteSql,
      $annCandCtesSql
      ${topkSql("cand", 3)}"""))

  // --- centroid (IVF-style) assignment: nearest of the per-label mean
  // vectors — the coarse quantizer of an IVF index, and a grouped-aggregate
  // use of the vector kernels. Means are exact (sum of longs / count) only
  // if kept as (sum, n) pairs; we score against sum vectors scaled by n to
  // stay in integer arithmetic: argmax over c of cos(v, sum_c). -------------
  private val q38 = Q("q38_ivf_assign",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          quantize(col("embedding"), SCALE).as("qv"))
      // per-label component-wise sums: explode → groupBy (label, i) is the
      // shuffle-light pattern; 64 dims × 10 labels stays tiny.
      val sums = e.select(col("label"),
          posexplode_outer(col("qv")).as(Seq("i", "x")))
        .groupBy(col("label"), col("i")).agg(sum(col("x")).as("sx"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("i"), col("sx")))).as("pairs"))
        .select(col("label").as("c_label"),
          transform(col("pairs"), p => p.getField("sx")).as("cv"))
        .withColumn("cnrm", dotLong(col("cv"), col("cv")))
      val scored = e.crossJoin(broadcast(sums))
        .select(col("vec_id"), col("label"), col("c_label"),
          cosineQ(dotLong(col("qv"), col("cv")),
            dotLong(col("qv"), col("qv")), col("cnrm")).as("cos"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("c_label"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("vec_id"), col("label"), col("c_label").as("assigned"),
          col("cos"))
    },
    Some(s"""WITH q AS ($qCte),
      sums AS (SELECT label AS c_label, i,
          CAST(SUM(qv[i]) AS BIGINT) AS sx
        FROM q, (SELECT unnest(range(1, 65)) AS i)
        GROUP BY label, i),
      cent AS (SELECT c_label, list(sx ORDER BY i) AS cv FROM sums
        GROUP BY c_label),
      centn AS (SELECT c_label, cv, ${dot2("cv", "cv")} AS cnrm FROM cent),
      scored AS (SELECT vec_id, label, c_label,
        CASE WHEN ${dot2("qv", "qv")} > 0 AND cnrm > 0 THEN
          CAST(${dotSql.format("qv", "qv", "cv")} AS DOUBLE) /
            (sqrt(CAST(${dot2("qv", "qv")} AS DOUBLE)) *
             sqrt(CAST(cnrm AS DOUBLE))) END AS cos
        FROM q, centn)
      SELECT vec_id, label, c_label AS assigned, cos FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
           ORDER BY cos DESC, c_label) AS rn FROM scored)
      WHERE rn = 1"""))

  // --- embedding-cosine near-dup (brief: dedup via embedding cosine):
  // in-bucket pairs from the banded signatures, deduped across tables,
  // global top-20 with a tie-free order. The per-(table,bucket) CAP makes
  // the self-join's worst case TABLES·n·CAP pairs — a degenerate bucket
  // can no longer go O(n²). A dedup run would add `WHERE cos >= τ`; this
  // corpus has no near-dups (max cos < 0.8), so the query reports the
  // ranked head of the candidate set instead of an empty set. --------------
  private val q39 = Q("q39_embed_neardup",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), quantize(col("embedding"), SCALE).as("qv"))
        .withColumn("nrm", dotLong(col("qv"), col("qv")))
      val wB = Window.partitionBy(col("tab"), col("bucket"))
        .orderBy(col("vec_id"))
      val corp = sigs(e).withColumn("rk", row_number().over(wB))
        .filter(col("rk") <= BUCKET_CAP)
      val pairs = corp.as("a").join(corp.as("b"),
          col("a.tab") === col("b.tab") &&
            col("a.bucket") === col("b.bucket") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          cosineQ(dotLong(col("a.qv"), col("b.qv")),
            col("a.nrm"), col("b.nrm")).as("cos"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(max(col("cos")).as("cos"))
      pairs.orderBy(col("cos").desc, col("id_a"), col("id_b")).limit(20)
    },
    Some(s"""WITH q AS ($qCte),
      n AS (SELECT vec_id, qv, ${dot2("qv", "qv")} AS nrm FROM q),
      sig AS ($sigSql),
      corp AS (SELECT * FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY tab, bucket
           ORDER BY vec_id) AS rk FROM sig) WHERE rk <= $BUCKET_CAP)
      SELECT id_a, id_b, cos FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, MAX(
          CASE WHEN a.nrm > 0 AND b.nrm > 0 THEN
            CAST(${dotSql.format("a.qv", "a.qv", "b.qv")} AS DOUBLE) /
              (sqrt(CAST(a.nrm AS DOUBLE)) * sqrt(CAST(b.nrm AS DOUBLE))) END)
            AS cos
        FROM corp a JOIN corp b ON a.tab = b.tab AND a.bucket = b.bucket
          AND a.vec_id < b.vec_id
        GROUP BY a.vec_id, b.vec_id)
      ORDER BY cos DESC, id_a, id_b LIMIT 20"""))

  // --- full IVF search: the query half of the IVF index q38 only
  // assigns for. Probes score against the 10 broadcast centroids and
  // keep their NPROBE nearest lists; only vectors ASSIGNED to those
  // lists get exact-scored — the corpus scan shrinks to ~NPROBE/nlist
  // of brute force while the plan stays one broadcast join (centroids)
  // + one broadcast join (probe→list pairs) + a bounded top-k window.
  // At 100 TB the assignment is a one-off build artifact (write the
  // corpus partitioned by `assigned`); here it is computed inline so
  // the oracle can replay every step. ------------------------------------
  private val NPROBE = 4
  private val q61 = Q("q61_ivf_search",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          quantize(col("embedding"), SCALE).as("qv"))
        .withColumn("nrm", dotLong(col("qv"), col("qv")))
      val sums = e.select(col("label"),
          posexplode_outer(col("qv")).as(Seq("i", "x")))
        .groupBy(col("label"), col("i")).agg(sum(col("x")).as("sx"))
        .groupBy(col("label"))
        .agg(array_sort(collect_list(struct(col("i"), col("sx")))).as("pairs"))
        .select(col("label").as("c_label"),
          transform(col("pairs"), p => p.getField("sx")).as("cv"))
        .withColumn("cnrm", dotLong(col("cv"), col("cv")))
      // coarse assignment (q38 shape): nearest centroid per vector
      val wA = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("c_label"))
      val assigned = e.crossJoin(broadcast(sums))
        .select(col("vec_id"), col("qv"), col("nrm"), col("c_label"),
          cosineQ(dotLong(col("qv"), col("cv")), col("nrm"), col("cnrm"))
            .as("ccos"))
        .withColumn("rn", row_number().over(wA)).filter(col("rn") === 1)
        .select(col("vec_id"), col("qv"), col("nrm"),
          col("c_label").as("assigned"))
      // probes keep their NPROBE nearest lists
      val wP = Window.partitionBy(col("probe_id"))
        .orderBy(col("pcos").desc, col("c_label"))
      val ptop = e.filter(col("vec_id") % PROBE_MOD === 0)
        .select(col("vec_id").as("probe_id"), col("qv").as("pv"),
          col("nrm").as("pnrm"))
        .crossJoin(broadcast(sums))
        .select(col("probe_id"), col("pv"), col("pnrm"), col("c_label"),
          cosineQ(dotLong(col("pv"), col("cv")), col("pnrm"), col("cnrm"))
            .as("pcos"))
        .withColumn("rn", row_number().over(wP))
        .filter(col("rn") <= NPROBE)
        .select(col("probe_id"), col("pv"), col("pnrm"), col("c_label"))
      // exact scoring on the pruned lists only
      val cand = assigned.join(broadcast(ptop),
          col("assigned") === col("c_label") &&
            col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          cosineQ(dotLong(col("pv"), col("qv")), col("pnrm"), col("nrm"))
            .as("cos"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      cand.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
    },
    Some(s"""WITH q AS ($qCte),
      n AS (SELECT vec_id, label, qv, ${dot2("qv", "qv")} AS nrm FROM q),
      sums AS (SELECT label AS c_label, i,
          CAST(SUM(qv[i]) AS BIGINT) AS sx
        FROM q, (SELECT unnest(range(1, 65)) AS i)
        GROUP BY label, i),
      cent AS (SELECT c_label, list(sx ORDER BY i) AS cv FROM sums
        GROUP BY c_label),
      centn AS (SELECT c_label, cv, ${dot2("cv", "cv")} AS cnrm FROM cent),
      assign AS (SELECT vec_id, qv, nrm, c_label AS assigned FROM
        (SELECT n.vec_id, n.qv, n.nrm, centn.c_label,
           CASE WHEN nrm > 0 AND cnrm > 0 THEN
             CAST(${dotSql.format("qv", "qv", "cv")} AS DOUBLE) /
               (sqrt(CAST(nrm AS DOUBLE)) * sqrt(CAST(cnrm AS DOUBLE))) END
             AS ccos,
           ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY CASE WHEN nrm > 0 AND cnrm > 0 THEN
               CAST(${dotSql.format("qv", "qv", "cv")} AS DOUBLE) /
                 (sqrt(CAST(nrm AS DOUBLE)) * sqrt(CAST(cnrm AS DOUBLE))) END
               DESC, c_label) AS rn
         FROM n, centn) WHERE rn = 1),
      ptop AS (SELECT probe_id, pv, pnrm, c_label FROM
        (SELECT p.vec_id AS probe_id, p.qv AS pv, p.nrm AS pnrm,
           centn.c_label,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
             ORDER BY CASE WHEN p.nrm > 0 AND cnrm > 0 THEN
               CAST(${dotSql.format("p.qv", "p.qv", "cv")} AS DOUBLE) /
                 (sqrt(CAST(p.nrm AS DOUBLE)) * sqrt(CAST(cnrm AS DOUBLE))) END
               DESC, c_label) AS rn
         FROM n p, centn WHERE p.vec_id % $PROBE_MOD = 0) WHERE rn <= $NPROBE),
      cand AS (SELECT probe_id, vec_id,
          CASE WHEN pnrm > 0 AND nrm > 0 THEN
            CAST(${dotSql.format("pv", "pv", "qv")} AS DOUBLE) /
              (sqrt(CAST(pnrm AS DOUBLE)) * sqrt(CAST(nrm AS DOUBLE))) END
            AS cos
        FROM assign JOIN ptop ON assigned = c_label AND vec_id <> probe_id)
      SELECT probe_id, vec_id, cos, rank FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
           ORDER BY cos DESC, vec_id) AS rank FROM cand)
      WHERE rank <= 5"""))

  // --- k-means centroid training (Lloyd): the index-BUILD half of IVF —
  // q38/q61 score against given centroids; this trains them. Exact oracle
  // parity for an iterative float algorithm comes from never dividing:
  // a centroid is its cluster's component-wise integer SUM (cosine is
  // scale-invariant, so cos(v, sum/n) == cos(v, sum) bit-for-bit).
  // Init is deterministic (the K smallest vec_ids as singleton clusters);
  // each iteration is one explode+groupBy tree-aggregate (the standard
  // distributed k-means update — shuffles k·dims rows, never the corpus)
  // plus one broadcast-centroid assignment; ITERS is fixed so the oracle
  // can replay the exact unrolled computation. At 100 TB: corpus scanned
  // ITERS+1 times, each pass one broadcast join + one k·dims-row shuffle.
  private val KMEANS_K = 8
  private val KMEANS_ITERS = 2

  private def cosSql(q: String, c: String, qn: String, cn: String) =
    s"""CASE WHEN $qn > 0 AND $cn > 0 THEN
        CAST(${dotSql.format(q, q, c)} AS DOUBLE) /
          (sqrt(CAST($qn AS DOUBLE)) * sqrt(CAST($cn AS DOUBLE))) END"""

  private def assignSql(cent: String, out: String) =
    s"""$out AS (SELECT vec_id, qv, nrm, cid, cos FROM
      (SELECT n.vec_id, n.qv, n.nrm, c.cid,
         ${cosSql("n.qv", "cv", "n.nrm", "c.cnrm")} AS cos,
         ROW_NUMBER() OVER (PARTITION BY n.vec_id
           ORDER BY ${cosSql("n.qv", "cv", "n.nrm", "c.cnrm")}
             DESC, c.cid) AS rn
       FROM n, $cent c) WHERE rn = 1)"""

  /** Integer-sum centroids of assignment CTE `prev` into `centn$tag`. */
  private def updateSql(prev: String, tag: String) =
    s"""sums$tag AS (SELECT cid, i, CAST(SUM(qv[i]) AS BIGINT) AS sx
         FROM $prev, (SELECT unnest(range(1, 65)) AS i)
         GROUP BY cid, i),
       cent$tag AS (SELECT cid, list(sx ORDER BY i) AS cv FROM sums$tag
         GROUP BY cid),
       centn$tag AS (SELECT cid, cv, ${dot2("cv", "cv")} AS cnrm
         FROM cent$tag)"""

  /** The unrolled Lloyd chain (q63's oracle core): CTEs `q`, `n`,
    * `centn0`, and per-iteration `sums$k`/`cent$k`/`centn$k`/`a$k` up to
    * the final assignment `a$iters` — exactly
    * `TrainingData.kmeansTrain(e, k, iters)`. */
  private def kmeansCtes(k: Int, iters: Int): String = {
    val its = (1 to iters).map(i =>
      updateSql(s"a${i - 1}", i.toString) + ",\n" +
        assignSql(s"centn$i", s"a$i"))
      .mkString(",\n")
    s"""q AS ($qCte),
      n AS (SELECT vec_id, qv, ${dot2("qv", "qv")} AS nrm FROM q),
      centn0 AS (SELECT vec_id AS cid, qv AS cv, nrm AS cnrm FROM
        (SELECT *, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn0 FROM n)
        WHERE rn0 <= $k),
      ${assignSql("centn0", "a0")},
      $its"""
  }

  private val q63 = Q("q63_kmeans_train",
    (s, dir) => {
      // delegates to the public pipeline API — the oracle below proves
      // graft.pipeline.TrainingData.kmeansTrain exact every round
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), quantize(col("embedding"), SCALE).as("qv"))
      val assigned = graft.pipeline.TrainingData
        .kmeansShared(e, KMEANS_K, KMEANS_ITERS)
      assigned.groupBy(col("cid")).agg(
        count(lit(1)).as("n"),
        sum(col("vec_id")).as("sum_vid"),
        min(col("cos")).as("min_cos"),
        max(col("cos")).as("max_cos"))
    },
    Some(s"""WITH ${kmeansCtes(KMEANS_K, KMEANS_ITERS)}
      SELECT cid, COUNT(*) AS n, CAST(SUM(vec_id) AS BIGINT) AS sum_vid,
        MIN(cos) AS min_cos, MAX(cos) AS max_cos
      FROM a$KMEANS_ITERS GROUP BY cid"""))

  // --- IVF search over the TRAINED quantizer: q61 prunes with label-mean
  // lists (labels only loosely track geometry on this corpus); this is
  // the real index — kmeansTrain builds the coarse quantizer, vectors
  // live in their cluster's inverted list, probes rank the CURRENT list
  // centroids (one more integer-sum update over the final assignment)
  // and exact-score only the NPROBE nearest lists. Same plan skeleton as
  // q61: per-iteration k·dims-row shuffles + broadcast assigns to build,
  // then one broadcast probe join + bounded top-k to search. At 100 TB
  // the build is a one-off artifact (corpus written partitioned by cid);
  // the search side touches ~NPROBE/k of the corpus. -----------------------
  private val q75 = Q("q75_ivf_kmeans_search",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), quantize(col("embedding"), SCALE).as("qv"))
      val assigned = graft.pipeline.TrainingData
        .kmeansShared(e, KMEANS_K, KMEANS_ITERS)
      // current list centroids: integer sums over the final assignment
      val cents = assigned
        .select(col("cid"), posexplode_outer(col("qv")).as(Seq("i", "x")))
        .groupBy(col("cid"), col("i")).agg(sum(col("x")).as("sx"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("i"), col("sx"))))
          .as("pairs"))
        .select(col("cid"),
          transform(col("pairs"), p => p.getField("sx")).as("cv"))
        .withColumn("cnrm", dotLong(col("cv"), col("cv")))
      val wP = Window.partitionBy(col("probe_id"))
        .orderBy(col("pcos").desc, col("cid"))
      val ptop = assigned.filter(col("vec_id") % PROBE_MOD === 0)
        .select(col("vec_id").as("probe_id"), col("qv").as("pv"),
          col("nrm").as("pnrm"))
        .crossJoin(broadcast(cents))
        .select(col("probe_id"), col("pv"), col("pnrm"), col("cid"),
          cosineQ(dotLong(col("pv"), col("cv")), col("pnrm"), col("cnrm"))
            .as("pcos"))
        .withColumn("rn", row_number().over(wP))
        .filter(col("rn") <= NPROBE)
        .select(col("probe_id"), col("pv"), col("pnrm"), col("cid"))
      val cand = assigned.join(broadcast(ptop),
          Seq("cid")).filter(col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          cosineQ(dotLong(col("pv"), col("qv")), col("pnrm"), col("nrm"))
            .as("cos"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      cand.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
    },
    Some {
      val f = KMEANS_ITERS
      s"""WITH ${kmeansCtes(KMEANS_K, KMEANS_ITERS)},
      ${updateSql(s"a$f", "F")},
      ptop AS (SELECT probe_id, pv, pnrm, cid FROM
        (SELECT p.vec_id AS probe_id, p.qv AS pv, p.nrm AS pnrm, c.cid,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
             ORDER BY ${cosSql("p.qv", "cv", "p.nrm", "c.cnrm")}
               DESC, c.cid) AS rn
         FROM a$f p, centnF c WHERE p.vec_id % $PROBE_MOD = 0)
        WHERE rn <= $NPROBE),
      cand AS (SELECT probe_id, a.vec_id,
          ${cosSql("pv", "a.qv", "pnrm", "a.nrm")} AS cos
        FROM a$f a JOIN ptop USING (cid) WHERE a.vec_id <> probe_id)
      SELECT probe_id, vec_id, cos, rank FROM
        (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
           ORDER BY cos DESC, vec_id) AS rank FROM cand)
      WHERE rank <= 5"""
    })

  // --- SemDeDup (Abbas et al. 2023) over the embeddings table: k-means
  // → within-cluster ε-ball components → keep the member furthest from
  // its centroid. τ = 0.4 exercises the path on this structureless
  // corpus (its max pair cosine is ~0.51; production corpora with real
  // semantic dups run τ ≈ 0.95). Delegates to the public pipeline API;
  // the oracle replays training, pairing, the transitive closure
  // (recursive CTE), and the keep rule exactly. --------------------------
  private val SEMDEDUP_TAU = 0.4
  // cap 32 < the ~62-member clusters here, so the centroid-cosine
  // banding (the skew defense) is ACTIVE and oracle-gated every round
  private val SEMDEDUP_CAP = 32
  private val q76 = Q("q76_semdedup",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), quantize(col("embedding"), SCALE).as("qv"))
      graft.pipeline.TrainingData
        .semDedup(e, KMEANS_K, KMEANS_ITERS, SEMDEDUP_TAU, SEMDEDUP_CAP)
    },
    Some {
      val f = KMEANS_ITERS
      s"""WITH RECURSIVE ${kmeansCtes(KMEANS_K, KMEANS_ITERS)},
      bnd AS (SELECT *, CAST((ROW_NUMBER() OVER (PARTITION BY cid
          ORDER BY cos ASC, vec_id) - 1) // $SEMDEDUP_CAP AS BIGINT)
          AS band FROM a$f),
      prs AS (SELECT a.vec_id AS va, b.vec_id AS vb
        FROM bnd a JOIN bnd b ON a.cid = b.cid AND a.band = b.band
          AND a.vec_id < b.vec_id
        WHERE ${cosSql("a.qv", "b.qv", "a.nrm", "b.nrm")}
          >= $SEMDEDUP_TAU),
      edges AS (SELECT va AS src, vb AS dst FROM prs
        UNION ALL SELECT vb, va FROM prs),
      comp(id, lbl) AS (
        SELECT vec_id, vec_id FROM a$f
        UNION
        SELECT e.src, c.lbl FROM edges e JOIN comp c ON c.id = e.dst),
      lab AS (SELECT id, MIN(lbl) AS component FROM comp GROUP BY 1)
      SELECT a.vec_id, a.cid, a.cos, l.component,
        CAST(ROW_NUMBER() OVER (PARTITION BY l.component
          ORDER BY a.cos ASC, a.vec_id) = 1 AS INT) AS kept
      FROM a$f a JOIN lab l ON l.id = a.vec_id"""
    })

  // --- int8 scalar-quantized kNN: the memory-scale path. Codes are
  // per-vector max-abs int8 (vectorfns.int8Codes) — 8× smaller than the
  // float corpus, so a 100 TB embedding set's resident working set
  // shrinks to ~12 TB while the per-vector scale cancels out of cosine.
  // The query ranks by int8 cosine AND scores each returned neighbor
  // against the exact fixed-point top-5 (`hit`), so the oracle pins both
  // the quantizer arithmetic and the quantization quality every round;
  // Int8AnnSpec asserts the recall floor. -------------------------------
  private val q80 = Q("q80_int8_ann",
    (s, dir) => {
      val m = Tables(s, dir, "embeddings")
        .select(col("vec_id"), quantize(col("embedding"), SCALE).as("qv"))
        .withColumn("cv", int8Codes(col("qv")))
        .withColumn("nrm", dotLong(col("qv"), col("qv")))
        .withColumn("cnrm", dotLong(col("cv"), col("cv")))
      val probes = m.filter(col("vec_id") % PROBE_MOD === 0)
        .select(col("vec_id").as("probe_id"), col("qv").as("pv"),
          col("cv").as("pc"), col("nrm").as("pnrm"),
          col("cnrm").as("pcnrm"))
      val scored = m.join(broadcast(probes),
          col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          cosineQ(dotLong(col("pc"), col("cv")), col("pcnrm"),
            col("cnrm")).as("cos8"),
          cosineQ(dotLong(col("pv"), col("qv")), col("pnrm"),
            col("nrm")).as("cosx"))
      val w8 = Window.partitionBy(col("probe_id"))
        .orderBy(col("cos8").desc, col("vec_id"))
      val wx = Window.partitionBy(col("probe_id"))
        .orderBy(col("cosx").desc, col("vec_id"))
      scored
        .withColumn("rank", row_number().over(w8))
        .withColumn("__rx", row_number().over(wx))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("vec_id"), col("cos8"), col("rank"),
          when(col("__rx") <= 5, lit(1L)).otherwise(lit(0L)).as("hit"))
    },
    Some(s"""WITH q AS ($qCte),
      n AS (SELECT vec_id, qv, ${int8CodesSql("qv")} AS cv FROM q),
      m AS (SELECT vec_id, qv, cv, ${dot2("qv", "qv")} AS nrm,
          ${dot2("cv", "cv")} AS cnrm FROM n),
      p AS (SELECT vec_id AS probe_id, qv AS pv, cv AS pc,
          nrm AS pnrm, cnrm AS pcnrm FROM m
        WHERE vec_id % $PROBE_MOD = 0),
      scored AS (SELECT probe_id, vec_id,
        CASE WHEN pcnrm > 0 AND cnrm > 0 THEN
          CAST(${dot2("pc", "cv")} AS DOUBLE) /
            (sqrt(CAST(pcnrm AS DOUBLE)) * sqrt(CAST(cnrm AS DOUBLE))) END
          AS cos8,
        CASE WHEN pnrm > 0 AND nrm > 0 THEN
          CAST(${dot2("pv", "qv")} AS DOUBLE) /
            (sqrt(CAST(pnrm AS DOUBLE)) * sqrt(CAST(nrm AS DOUBLE))) END
          AS cosx
        FROM m JOIN p ON vec_id <> probe_id),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY cos8 DESC, vec_id) AS rank,
          ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY cosx DESC, vec_id) AS __rx
        FROM scored)
      SELECT probe_id, vec_id, cos8, rank,
        CASE WHEN __rx <= 5 THEN CAST(1 AS BIGINT)
          ELSE CAST(0 AS BIGINT) END AS hit
      FROM r WHERE rank <= 5"""))

  // --- Product-Quantization ADC search (Jégou et al. 2011) — the third
  // leg of the FAISS-style memory ladder next to int8 SQ (q80) and IVF
  // (q61/q75): vectors compress to PQ_M one-byte codewords (64× smaller
  // than the float corpus), probes precompute a PQ_M×PQ_K distance
  // table against the broadcast codebook, and the scan ranks by
  // asymmetric distance = PQ_M table lookups per vector. Codebook =
  // the PQ_K lowest-vec_id subvectors (the k-means-init sampled-codebook
  // baseline; kmeansTrain per subspace is the trained upgrade). Encode
  // is a broadcast crossJoin + projection (no shuffle of the corpus);
  // ADC is a map-only scan with the probes' distance tables broadcast —
  // the plan shape that survives a 100 TB corpus. The scan keeps the
  // ADC top-PQ_RERANK shortlist per probe and EXACT-L2 re-ranks only
  // that shortlist (the production ADC+R pattern: the exact pass reads
  // PQ_RERANK/n of the corpus; pure-ADC rank order scored recall@5
  // ≈ 0.28 at 8×8-dim subspaces, the 16×4-dim codebook plus re-ranked
  // shortlist lifts it to ≈ 0.77 — floor-gated in AnnRecallSpec). All
  // distances are integer L2², argmin ties break to the
  // smallest codeword via first-position-of-min, so DuckDB replays
  // every bit; `hit` scores each returned neighbor against the
  // full-corpus exact top-5 like q80. -----------------------------------
  private val PQ_M = 16     // subspaces
  private val PQ_DSUB = 4   // dims per subspace (PQ_M * PQ_DSUB = 64)
  private val PQ_K = 16     // codewords per subspace
  private val PQ_RERANK = 50 // ADC shortlist size fed to exact re-rank

  /** The PQ_K lowest-vec_id vectors as a single-row broadcastable
    * codebook (`cbs ARRAY<ARRAY<BIGINT>>`). */
  private def pqCodebook(e: org.apache.spark.sql.DataFrame) =
    e.orderBy(col("vec_id")).limit(PQ_K)
      .agg(array_sort(collect_list(struct(col("vec_id"), col("qv"))))
        .as("pairs"))
      .select(transform(col("pairs"), p => p.getField("qv")).as("cbs"))

  /** Integer L2² between subspace `m` of `v` and of codeword `k`
    * (expects `cbs` in scope) — the HOF twin of the PqEncode kernel's
    * inner loop, used to build probe distance tables. */
  private def pqSubL2(v: org.apache.spark.sql.Column,
      m: org.apache.spark.sql.Column,
      k: org.apache.spark.sql.Column) =
    aggregate(sequence(lit(1), lit(PQ_DSUB)), lit(0L), (acc, i) => {
      val a = element_at(v, (m * PQ_DSUB + i).cast("int"))
      val b = element_at(element_at(col("cbs"), (k + 1).cast("int")),
        (m * PQ_DSUB + i).cast("int"))
      acc + (a - b) * (a - b)
    })

  /** Per-subspace distance list of `v` over the K codewords. */
  private def pqDistList(v: org.apache.spark.sql.Column,
      m: org.apache.spark.sql.Column) =
    transform(sequence(lit(0), lit(PQ_K - 1)), k => pqSubL2(v, m, k))

  /** probe → PQ_M × PQ_K integer distance table (expects `cbs`). */
  private def pqDtab(v: org.apache.spark.sql.Column) =
    transform(sequence(lit(0), lit(PQ_M - 1)), m => pqDistList(v, m))

  private def pqSubL2Sql(v: String) =
    s"""CAST(list_sum(list_transform(range(1, ${PQ_DSUB + 1}), i ->
       ($v[m * $PQ_DSUB + i] - cbs[k + 1][m * $PQ_DSUB + i])
       * ($v[m * $PQ_DSUB + i] - cbs[k + 1][m * $PQ_DSUB + i])))
       AS BIGINT)"""
  private def pqDistListSql(v: String) =
    s"list_transform(range(0, $PQ_K), k -> ${pqSubL2Sql(v)})"
  /** cb/cbrow/codes CTE fragment shared by the PQ oracles; expects the
    * corpus CTE `q` (vec_id, qv) and emits `codes(vec_id, qv, codes)`
    * plus the `cbrow(cbs)` single row. `src` = the relation coded. */
  private def pqCodesCtes(src: String) =
    s"""cb AS (SELECT rk, qv FROM
        (SELECT qv, ROW_NUMBER() OVER (ORDER BY vec_id) AS rk FROM q)
        WHERE rk <= $PQ_K),
      cbrow AS (SELECT list(qv ORDER BY rk) AS cbs FROM cb),
      codes AS (SELECT $src.*,
          list_transform(range(0, $PQ_M), m ->
            CAST(list_position(${pqDistListSql(s"$src.qv")},
              list_min(${pqDistListSql(s"$src.qv")})) - 1 AS INT)) AS codes
        FROM $src, cbrow)"""

  private val q105 = Q("q105_pq_adc",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), quantize(col("embedding"), SCALE).as("qv"))
      val cbRow = pqCodebook(e)
      val codes = e.crossJoin(broadcast(cbRow))
        .select(col("vec_id"), col("qv"),
          pqEncode(col("qv"), col("cbs"), PQ_M, PQ_DSUB).as("codes"))
      val probes = e.filter(col("vec_id") % PROBE_MOD === 0)
        .crossJoin(broadcast(cbRow))
        .select(col("vec_id").as("probe_id"), col("qv").as("pv"),
          pqDtab(col("qv")).as("dtab"))
      val scored = codes.join(broadcast(probes),
          col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          pqAdc(col("dtab"), col("codes")).as("adc"),
          l2Long(col("pv"), col("qv")).as("l2x"))
      val wA = Window.partitionBy(col("probe_id"))
        .orderBy(col("adc").asc, col("vec_id"))
      val wX = Window.partitionBy(col("probe_id"))
        .orderBy(col("l2x").asc, col("vec_id"))
      val wR = Window.partitionBy(col("probe_id"))
        .orderBy(col("l2x").asc, col("vec_id"))
      scored
        .withColumn("__ra", row_number().over(wA))
        .withColumn("__rx", row_number().over(wX))
        .filter(col("__ra") <= PQ_RERANK)
        .withColumn("rank", row_number().over(wR))
        .filter(col("rank") <= 5)
        .select(col("probe_id"), col("vec_id"), col("adc"), col("l2x"),
          col("rank"),
          when(col("__rx") <= 5, lit(1L)).otherwise(lit(0L)).as("hit"))
    },
    Some {
      s"""WITH q AS ($qCte),
      ${pqCodesCtes("q")},
      probes AS (SELECT vec_id AS probe_id, qv AS pv,
          list_transform(range(0, $PQ_M), m -> ${pqDistListSql("qv")})
            AS dtab
        FROM q, cbrow WHERE vec_id % $PROBE_MOD = 0),
      scored AS (SELECT probe_id, c.vec_id,
          CAST(list_sum(list_transform(range(1, ${PQ_M + 1}), m ->
            dtab[m][c.codes[m] + 1])) AS BIGINT) AS adc,
          CAST(list_sum(list_transform(range(1, ${PQ_M * PQ_DSUB + 1}), i ->
            (pv[i] - c.qv[i]) * (pv[i] - c.qv[i]))) AS BIGINT) AS l2x
        FROM codes c JOIN probes ON c.vec_id <> probe_id),
      r AS (SELECT *,
          ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY adc ASC, vec_id) AS __ra,
          ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY l2x ASC, vec_id) AS __rx
        FROM scored),
      rr AS (SELECT *,
          ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY l2x ASC, vec_id) AS rank
        FROM r WHERE __ra <= $PQ_RERANK)
      SELECT probe_id, vec_id, adc, l2x, rank,
        CASE WHEN __rx <= 5 THEN CAST(1 AS BIGINT)
          ELSE CAST(0 AS BIGINT) END AS hit
      FROM rr WHERE rank <= 5"""
    })

  // --- IVF-PQ (FAISS IVFADC+R; Jégou 2011 §V): the composed index —
  // kmeansTrain builds the coarse quantizer (q75's build), vectors
  // store only their PQ codes inside their inverted list, probes rank
  // the current list centroids and visit NPROBE lists, candidates rank
  // by ADC table lookups, and the exact pass re-ranks the PQ_RERANK
  // shortlist. At 100 TB the resident per-vector state is PQ_M bytes +
  // a list id (vs 256 B of floats); the scan touches ~NPROBE/k of the
  // corpus, each visit costing PQ_M lookups — the plan is the k-means
  // chain + two broadcast joins + bounded windows, no corpus shuffle
  // beyond the build. `hit` scores against the FULL-corpus exact-L2
  // top-5, so the gate prices IVF pruning loss AND PQ error together
  // every round. ---------------------------------------------------------
  private val q114 = Q("q114_ivf_pq",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), quantize(col("embedding"), SCALE).as("qv"))
      val assigned = graft.pipeline.TrainingData
        .kmeansShared(e, KMEANS_K, KMEANS_ITERS)
      val cents = assigned
        .select(col("cid"), posexplode_outer(col("qv")).as(Seq("i", "x")))
        .groupBy(col("cid"), col("i")).agg(sum(col("x")).as("sx"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("i"), col("sx"))))
          .as("pairs"))
        .select(col("cid"),
          transform(col("pairs"), p => p.getField("sx")).as("cv"))
        .withColumn("cnrm", dotLong(col("cv"), col("cv")))
      val cbRow = pqCodebook(e)
      val coded = assigned.crossJoin(broadcast(cbRow))
        .select(col("vec_id"), col("qv"), col("cid"),
          pqEncode(col("qv"), col("cbs"), PQ_M, PQ_DSUB).as("codes"))
      val wP = Window.partitionBy(col("probe_id"))
        .orderBy(col("pcos").desc, col("cid"))
      val ptop = assigned.filter(col("vec_id") % PROBE_MOD === 0)
        .select(col("vec_id").as("probe_id"), col("qv").as("pv"),
          col("nrm").as("pnrm"))
        .crossJoin(broadcast(cents))
        .select(col("probe_id"), col("pv"), col("pnrm"), col("cid"),
          cosineQ(dotLong(col("pv"), col("cv")), col("pnrm"), col("cnrm"))
            .as("pcos"))
        .withColumn("rn", row_number().over(wP))
        .filter(col("rn") <= NPROBE)
        .select(col("probe_id"), col("pv"), col("cid"))
      val pdt = ptop.select(col("probe_id"), col("pv")).distinct()
        .crossJoin(broadcast(cbRow))
        .select(col("probe_id"), col("pv"), pqDtab(col("pv")).as("dtab"))
      val cand = coded
        .join(broadcast(ptop.select(col("probe_id"), col("cid"))),
          Seq("cid"))
        .filter(col("vec_id") =!= col("probe_id"))
        .join(broadcast(pdt.select(col("probe_id"), col("dtab"))),
          Seq("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          pqAdc(col("dtab"), col("codes")).as("adc"))
      val wA = Window.partitionBy(col("probe_id"))
        .orderBy(col("adc").asc, col("vec_id"))
      val wR = Window.partitionBy(col("probe_id"))
        .orderBy(col("l2x").asc, col("vec_id"))
      // ADC+R refine-from-storage: the exact pass runs ONLY on the
      // ≤ PQ_RERANK-deep shortlist — original vectors are re-fetched by
      // id (corpus scan joins the broadcast shortlist), so exact L2 is
      // never priced on the full candidate stream (at scale candidates
      // are ~NPROBE/k of the corpus; pricing full-dimension L2 there
      // would negate PQ's compute win).
      val shortlist = cand.withColumn("__ra", row_number().over(wA))
        .filter(col("__ra") <= PQ_RERANK)
        .select(col("probe_id"), col("vec_id"), col("adc"))
      val probesF = e.filter(col("vec_id") % PROBE_MOD === 0)
        .select(col("vec_id").as("probe_id"), col("qv").as("pv"))
      val top = e.select(col("vec_id"), col("qv"))
        .join(broadcast(shortlist), Seq("vec_id"))
        .join(broadcast(probesF), Seq("probe_id"))
        .select(col("probe_id"), col("vec_id"), col("adc"),
          l2Long(col("pv"), col("qv")).as("l2x"))
        .withColumn("rank", row_number().over(wR))
        .filter(col("rank") <= 5)
      val wX = Window.partitionBy(col("probe_id"))
        .orderBy(col("l2x").asc, col("vec_id"))
      val truth = e.join(broadcast(probesF),
          col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          l2Long(col("pv"), col("qv")).as("l2x"))
        .withColumn("__rx", row_number().over(wX))
        .filter(col("__rx") <= 5)
        .select(col("probe_id"), col("vec_id"), lit(1L).as("__h"))
      // truth is ≤ 5·#probes rows by construction — broadcast it
      top.join(broadcast(truth), Seq("probe_id", "vec_id"), "left")
        .select(col("probe_id"), col("vec_id"), col("adc"), col("l2x"),
          col("rank"), coalesce(col("__h"), lit(0L)).as("hit"))
    },
    Some {
      val f = KMEANS_ITERS
      s"""WITH ${kmeansCtes(KMEANS_K, KMEANS_ITERS)},
      ${updateSql(s"a$f", "F")},
      ${pqCodesCtes(s"a$f")},
      ptop AS (SELECT probe_id, pv, cid FROM
        (SELECT p.vec_id AS probe_id, p.qv AS pv, c.cid,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id
             ORDER BY ${cosSql("p.qv", "cv", "p.nrm", "c.cnrm")}
               DESC, c.cid) AS rn
         FROM a$f p, centnF c WHERE p.vec_id % $PROBE_MOD = 0)
        WHERE rn <= $NPROBE),
      pdt AS (SELECT probe_id, pv,
          list_transform(range(0, $PQ_M), m -> ${pqDistListSql("pv")})
            AS dtab
        FROM (SELECT DISTINCT probe_id, pv FROM ptop), cbrow),
      cand AS (SELECT t.probe_id, c.vec_id,
          CAST(list_sum(list_transform(range(1, ${PQ_M + 1}), m ->
            d.dtab[m][c.codes[m] + 1])) AS BIGINT) AS adc,
          CAST(list_sum(list_transform(range(1, ${PQ_M * PQ_DSUB + 1}),
            i -> (d.pv[i] - c.qv[i]) * (d.pv[i] - c.qv[i]))) AS BIGINT)
            AS l2x
        FROM codes c
        JOIN ptop t ON c.cid = t.cid AND c.vec_id <> t.probe_id
        JOIN pdt d ON d.probe_id = t.probe_id),
      ra AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY adc ASC, vec_id) AS __ra FROM cand),
      rr AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY l2x ASC, vec_id) AS rank
        FROM ra WHERE __ra <= $PQ_RERANK),
      truth AS (SELECT probe_id, vec_id FROM
        (SELECT p.vec_id AS probe_id, n2.vec_id,
           ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
             CAST(list_sum(list_transform(range(1, ${PQ_M * PQ_DSUB + 1}),
               i -> (p.qv[i] - n2.qv[i]) * (p.qv[i] - n2.qv[i])))
               AS BIGINT), n2.vec_id) AS rx
         FROM n n2, n p
         WHERE p.vec_id % $PROBE_MOD = 0 AND n2.vec_id <> p.vec_id)
        WHERE rx <= 5)
      SELECT rr.probe_id, rr.vec_id, adc, l2x, rank,
        CASE WHEN truth.vec_id IS NOT NULL THEN CAST(1 AS BIGINT)
          ELSE CAST(0 AS BIGINT) END AS hit
      FROM rr LEFT JOIN truth
        ON truth.probe_id = rr.probe_id AND truth.vec_id = rr.vec_id
      WHERE rank <= 5"""
    })

  // --- hard-negative mining for contrastive training: for each anchor,
  // the top-k most-similar corpus vectors from a DIFFERENT label (label
  // = the positive class; a near-dup fingerprint filter composes the
  // same way). The plan is the q36 broadcast scan with the class filter
  // fused into the join condition — at scale the full scan swaps for
  // any of the ANN paths (q37/q61/q114) feeding the same filter +
  // top-k; margin = anchor's nearest positive cosine minus the
  // negative's (>0 ⇒ the negative is "hard but not confusable"). ---------
  private val HARDNEG_K = 4
  private val q115 = Q("q115_hard_negatives",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          quantize(col("embedding"), SCALE).as("qv"))
        .withColumn("nrm", dotLong(col("qv"), col("qv")))
      val anchors = e.filter(col("vec_id") % PROBE_MOD === 0)
        .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
          col("qv").as("pv"), col("nrm").as("pnrm"))
      val scored = e.join(broadcast(anchors),
          col("vec_id") =!= col("anchor_id"))
        .select(col("anchor_id"), col("a_label"), col("vec_id"),
          col("label"),
          cosineQ(dotLong(col("pv"), col("qv")), col("pnrm"), col("nrm"))
            .as("cos"))
      // nearest positive per anchor (same label) — the margin baseline
      val wPos = Window.partitionBy(col("anchor_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      val pos = scored.filter(col("label") === col("a_label"))
        .withColumn("rn", row_number().over(wPos))
        .filter(col("rn") === 1)
        .select(col("anchor_id"), col("cos").as("pos_cos"))
      val wNeg = Window.partitionBy(col("anchor_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      scored.filter(col("label") =!= col("a_label"))
        .withColumn("rank", row_number().over(wNeg))
        .filter(col("rank") <= HARDNEG_K)
        .join(broadcast(pos), Seq("anchor_id"), "left")
        .select(col("anchor_id"), col("vec_id").as("negative_id"),
          col("label").as("neg_label"), col("cos"), col("rank"),
          (col("pos_cos") - col("cos")).as("margin"))
    },
    Some(s"""WITH q AS ($qCte),
      n AS (SELECT vec_id, label, qv, ${dot2("qv", "qv")} AS nrm FROM q),
      a AS (SELECT vec_id AS anchor_id, label AS a_label, qv AS pv,
          nrm AS pnrm FROM n WHERE vec_id % $PROBE_MOD = 0),
      scored AS (SELECT anchor_id, a_label, vec_id, label,
          CASE WHEN pnrm > 0 AND nrm > 0 THEN
            CAST(${dot2("pv", "qv")} AS DOUBLE) /
              (sqrt(CAST(pnrm AS DOUBLE)) * sqrt(CAST(nrm AS DOUBLE))) END
            AS cos
        FROM n JOIN a ON vec_id <> anchor_id),
      pos AS (SELECT anchor_id, cos AS pos_cos FROM
        (SELECT anchor_id, cos, ROW_NUMBER() OVER (PARTITION BY anchor_id
           ORDER BY cos DESC, vec_id) AS rn
         FROM scored WHERE label = a_label) WHERE rn = 1),
      neg AS (SELECT anchor_id, vec_id AS negative_id,
          label AS neg_label, cos,
          ROW_NUMBER() OVER (PARTITION BY anchor_id
            ORDER BY cos DESC, vec_id) AS rank
        FROM scored WHERE label <> a_label)
      SELECT neg.anchor_id, negative_id, neg_label, cos, rank,
        pos_cos - cos AS margin
      FROM neg LEFT JOIN pos ON pos.anchor_id = neg.anchor_id
      WHERE rank <= $HARDNEG_K"""))

  // --- margin-based bitext mining (Artetxe & Schwenk 2019 ratio margin):
  // source probes vs the odd-id "target side"; per probe the best target
  // plus cos1 / mean(cos2..cos5) — the margin criterion that separates
  // true translations from hubness artifacts. The mean is a FIXED
  // left-associated 4-term sum (pivoted from ranks), never an
  // order-dependent aggregate, so the double is exactly replayable.
  // Scale: probes broadcast; rank 1-5 via WindowGroupLimit-capped
  // per-probe top-k, same shape as q36. ---------------------------------
  private val q131 = Q("q131_bitext_margin",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), quantize(col("embedding"), SCALE).as("qv"))
        .withColumn("nrm", dotLong(col("qv"), col("qv")))
      val probes = e.filter(col("vec_id") % PROBE_MOD === 0)
        .select(col("vec_id").as("probe_id"), col("qv").as("pv"),
          col("nrm").as("pnrm"))
      val target = e.filter(col("vec_id") % 2 === 1)
      val scored = target.crossJoin(broadcast(probes))
        .select(col("probe_id"), col("vec_id"),
          cosineQ(dotLong(col("pv"), col("qv")), col("pnrm"), col("nrm"))
            .as("cos"))
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      val top = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
      def at(r: Int, c: String) = max(when(col("rank") === r, col(c)))
      top.groupBy(col("probe_id"))
        .agg(at(1, "vec_id").as("best_id"), at(1, "cos").as("cos1"),
          at(2, "cos").as("c2"), at(3, "cos").as("c3"),
          at(4, "cos").as("c4"), at(5, "cos").as("c5"))
        .withColumn("margin",
          when(col("c2") + (col("c3") + (col("c4") + col("c5"))) > 0,
            col("cos1") / ((col("c2") + (col("c3")
              + (col("c4") + col("c5")))) / lit(4.0))))
        .select(col("probe_id"), col("best_id"), col("cos1"), col("margin"))
    },
    Some(s"""WITH q AS ($qCte),
      n AS (SELECT vec_id, qv, ${dot2("qv", "qv")} AS nrm FROM q),
      p AS (SELECT vec_id AS probe_id, qv AS pv, nrm AS pnrm FROM n
            WHERE vec_id % $PROBE_MOD = 0),
      t AS (SELECT * FROM n WHERE vec_id % 2 = 1),
      scored AS (SELECT probe_id, vec_id,
        CASE WHEN pnrm > 0 AND nrm > 0 THEN
          CAST(${dot2("pv", "qv")} AS DOUBLE) /
            (sqrt(CAST(pnrm AS DOUBLE)) * sqrt(CAST(nrm AS DOUBLE))) END
          AS cos
        FROM t CROSS JOIN p),
      top AS (SELECT * FROM
          (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
             ORDER BY cos DESC, vec_id) AS rank FROM scored)
        WHERE rank <= 5),
      piv AS (SELECT probe_id,
          MAX(CASE WHEN rank = 1 THEN vec_id END) AS best_id,
          MAX(CASE WHEN rank = 1 THEN cos END) AS cos1,
          MAX(CASE WHEN rank = 2 THEN cos END) AS c2,
          MAX(CASE WHEN rank = 3 THEN cos END) AS c3,
          MAX(CASE WHEN rank = 4 THEN cos END) AS c4,
          MAX(CASE WHEN rank = 5 THEN cos END) AS c5
        FROM top GROUP BY probe_id)
      SELECT probe_id, best_id, cos1,
        CASE WHEN c2 + (c3 + (c4 + c5)) > 0
             THEN cos1 / ((c2 + (c3 + (c4 + c5))) / 4.0) END AS margin
      FROM piv"""))

  // --- leading-subspace covariance of the embedding corpus (whitening /
  // PCA prep, the Matryoshka-style leading block): every Cov(i,j) entry is
  // a ratio of exact BIGINT sums over the quantized vectors — n·Σxy − ΣxΣy
  // — so the whole matrix hash-compares engine-exact; the one division per
  // entry presents it as DOUBLE. ONE aggregation pass with D·(D+1)/2
  // statically-unrolled sums: partial-aggregated map-side, a single
  // 137-value row crosses the wire, then explodes to (i, j) rows. At any
  // corpus size the shuffle is O(D²), never O(n). -------------------------
  private val COV_D = 16

  private val q148 = Q("q148_embed_cov",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(quantize(col("embedding"), SCALE).as("qv"))
      val pairs = for (i <- 0 until COV_D; j <- i until COV_D) yield (i, j)
      val aggs =
        pairs.map { case (i, j) =>
          sum(element_at(col("qv"), i + 1) * element_at(col("qv"), j + 1))
            .as(s"sxy_${i}_$j")
        } ++
        (0 until COV_D).map(i =>
          sum(element_at(col("qv"), i + 1)).as(s"sx_$i")) :+
        count(lit(1)).as("n")
      val one = e.agg(aggs.head, aggs.tail: _*)
      val entries = array(pairs.map { case (i, j) =>
        struct(lit(i).as("i"), lit(j).as("j"),
          col(s"sxy_${i}_$j").as("sxy"),
          col(s"sx_$i").as("sx"), col(s"sx_$j").as("sy"))
      }: _*)
      one.select(col("n"), explode(entries).as("e"))
        .select(col("e.i").as("i"), col("e.j").as("j"), col("n"),
          col("e.sxy").as("sxy"), col("e.sx").as("sx"), col("e.sy").as("sy"),
          ((col("n") * col("e.sxy") - col("e.sx") * col("e.sy"))
            .cast("double") / (col("n") * col("n"))).as("cov"))
    },
    Some {
      val q = s"CAST(floor(CAST(embedding[__D__] AS DOUBLE) * $SCALE) AS BIGINT)"
      val pairs = for (i <- 0 until COV_D; j <- i until COV_D) yield (i, j)
      val sums = pairs.map { case (i, j) =>
        s"CAST(SUM(${q.replace("__D__", (i + 1).toString)} * ${q.replace("__D__", (j + 1).toString)}) AS BIGINT) AS sxy_${i}_$j"
      } ++ (0 until COV_D).map(i =>
        s"CAST(SUM(${q.replace("__D__", (i + 1).toString)}) AS BIGINT) AS sx_$i")
      val entries = pairs.map { case (i, j) =>
        s"{'i': $i, 'j': $j, 'sxy': sxy_${i}_$j, 'sx': sx_$i, 'sy': sx_$j}"
      }.mkString(",\n          ")
      s"""WITH a AS (SELECT ${sums.mkString(",\n          ")},
          CAST(COUNT(*) AS BIGINT) AS n
        FROM embeddings),
      ex AS (SELECT n, unnest([
          $entries]) AS e FROM a)
      SELECT e.i AS i, e.j AS j, n, e.sxy AS sxy, e.sx AS sx, e.sy AS sy,
        CAST(n * e.sxy - e.sx * e.sy AS DOUBLE) / (n * n) AS cov
      FROM ex"""
    })

  // --- ANN recall report (the vector-side twin of the text board's LSH
  // recall q149): per probe, how many of the exact cosine top-5 the
  // SRP-LSH multi-probe path surfaces in ITS top-5. Both rank chains are
  // the proven q36/q37 plans at k=5; the overlap is one pair-keyed left
  // join + a per-probe count — everything downstream of the two ranked
  // lists is exact integers, and recall is the one presented division. --
  private val q156 = Q("q156_ann_recall",
    (s, dir) => {
      val brute = bruteTopK(s, dir, 5).select(col("probe_id"), col("vec_id"))
      val ann = annTopK(s, dir, 5).select(col("probe_id"), col("vec_id"))
        .withColumn("__hit", lit(1L))
      // recall denominator = this probe's ACTUAL exact-top-k row count
      // (== k on big corpora, fewer when the corpus has < k neighbors),
      // never the k literal — both engines divide by the same count
      brute.join(ann, Seq("probe_id", "vec_id"), "left")
        .groupBy(col("probe_id"))
        .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hit"),
          count(lit(1)).as("__nb"))
        .withColumn("recall", col("n_hit").cast("double") / col("__nb"))
        .drop("__nb")
    },
    Some(s"""WITH q AS ($qCte),
      $nCteSql,
      $bruteScoreCtesSql,
      brute AS (SELECT probe_id, vec_id FROM (${topkSql("bscored", 5)})),
      $annCandCtesSql,
      ann AS (SELECT probe_id, vec_id FROM (${topkSql("cand", 5)}))
      SELECT b.probe_id, CAST(COUNT(a.vec_id) AS BIGINT) AS n_hit,
        CAST(COUNT(a.vec_id) AS DOUBLE) / COUNT(*) AS recall
      FROM brute b LEFT JOIN ann a
        ON b.probe_id = a.probe_id AND b.vec_id = a.vec_id
      GROUP BY 1"""))

  // --- per-shard embedding-centroid drift (the distribution-shift
  // monitor a sharded embedding corpus runs): exact BIGINT per-dim sums
  // of the quantized vectors per shard and globally; each shard reports
  // the cosine of its sum-vector against the global sum-vector,
  // assembled from exact integer moments in ONE fixed-order double
  // expression. Shuffles: one (shard, dim) aggregation (≤ 8·64 rows
  // out), one dim rollup, one dim-keyed join of those tiny tables, one
  // shard rollup — all bounded by shards × dims, never by vectors. ----
  private val q195 = Q("q195_shard_drift",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings").select(col("vec_id"),
        quantize(col("embedding"), SCALE).as("qv"))
      val dims = e.select((col("vec_id") % 8).as("shard"),
        posexplode_outer(col("qv")).as(Seq("dim", "v")))
      val sh = dims.groupBy(col("shard"), col("dim"))
        .agg(sum(col("v")).as("sx"))
      val g = dims.groupBy(col("dim")).agg(sum(col("v")).as("gx"))
      val mo = sh.join(g, Seq("dim"))
        .groupBy(col("shard"))
        .agg(sum(col("sx") * col("gx")).as("dot"),
          sum(col("sx") * col("sx")).as("ssx"),
          sum(col("gx") * col("gx")).as("ssg"))
      val nv = e.groupBy((col("vec_id") % 8).as("shard"))
        .agg(count(lit(1)).as("n_vecs"))
      mo.join(nv, Seq("shard"))
        .select(col("shard"), col("n_vecs"), col("dot"), col("ssx"),
          when(col("ssx") > 0 && col("ssg") > 0,
            col("dot").cast("double")
              / (sqrt(col("ssx").cast("double"))
                * sqrt(col("ssg").cast("double")))).as("cos_to_global"))
    },
    Some(s"""WITH q AS ($qCte),
      d AS (SELECT vec_id % 8 AS shard,
          generate_subscripts(qv, 1) - 1 AS dim, unnest(qv) AS v
        FROM q),
      sh AS (SELECT shard, dim, CAST(SUM(v) AS BIGINT) AS sx
        FROM d GROUP BY 1, 2),
      g AS (SELECT dim, CAST(SUM(v) AS BIGINT) AS gx FROM d GROUP BY 1),
      mo AS (SELECT shard,
          CAST(SUM(sx * gx) AS BIGINT) AS dot,
          CAST(SUM(sx * sx) AS BIGINT) AS ssx,
          CAST(SUM(gx * gx) AS BIGINT) AS ssg
        FROM sh JOIN g USING (dim) GROUP BY shard),
      nv AS (SELECT vec_id % 8 AS shard, CAST(COUNT(*) AS BIGINT)
          AS n_vecs FROM q GROUP BY 1)
      SELECT shard, n_vecs, dot, ssx,
        CASE WHEN ssx > 0 AND ssg > 0 THEN CAST(dot AS DOUBLE)
          / (sqrt(CAST(ssx AS DOUBLE)) * sqrt(CAST(ssg AS DOUBLE)))
        END AS cos_to_global
      FROM mo JOIN nv USING (shard)"""))

  // --- Matryoshka / truncated-embedding recall (Kusupati et al. 2022
  // regime): per probe, how many of the FULL-dimension exact cosine
  // top-5 the first-PREFIX_DIMS prefix ranking recovers in its top-5 —
  // the dimension-vs-recall tradeoff report a 100 TB corpus runs
  // before committing to a cheap prefix index. Both rank chains are
  // the proven q36 plan (the prefix side just slices the quantized
  // vector before the norm); overlap and recall follow the q156
  // integer-join shape. -----------------------------------------------
  private val PREFIX_DIMS = 16
  private val q208 = Q("q208_matryoshka_recall",
    (s, dir) => {
      val full = bruteTopK(s, dir, 5).select(col("probe_id"), col("vec_id"))
      val pre = prefixTopK(s, dir, 5, PREFIX_DIMS)
        .select(col("probe_id"), col("vec_id"))
        .withColumn("__hit", lit(1L))
      full.join(pre, Seq("probe_id", "vec_id"), "left")
        .groupBy(col("probe_id"))
        .agg(sum(coalesce(col("__hit"), lit(0L))).as("n_hit"),
          count(lit(1)).as("__nb"))
        .withColumn("recall", col("n_hit").cast("double") / col("__nb"))
        .drop("__nb")
    },
    Some(s"""WITH q AS ($qCte),
      $nCteSql,
      $bruteScoreCtesSql,
      brute AS (SELECT probe_id, vec_id FROM (${topkSql("bscored", 5)})),
      qp AS (SELECT vec_id, qv[1:$PREFIX_DIMS] AS qv FROM q),
      np AS (SELECT vec_id, qv, ${dot2("qv", "qv")} AS nrm FROM qp),
      pp AS (SELECT vec_id AS probe_id, qv AS pv, nrm AS pnrm FROM np
        WHERE vec_id % $PROBE_MOD = 0),
      pscored AS (SELECT probe_id, vec_id,
        CASE WHEN pnrm > 0 AND nrm > 0 THEN
          CAST(${dot2("pv", "qv")} AS DOUBLE) /
            (sqrt(CAST(pnrm AS DOUBLE)) * sqrt(CAST(nrm AS DOUBLE))) END
          AS cos
        FROM np JOIN pp ON vec_id <> probe_id),
      pre AS (SELECT probe_id, vec_id FROM (${topkSql("pscored", 5)}))
      SELECT b.probe_id, CAST(COUNT(p.vec_id) AS BIGINT) AS n_hit,
        CAST(COUNT(p.vec_id) AS DOUBLE) / COUNT(*) AS recall
      FROM brute b LEFT JOIN pre p
        ON b.probe_id = p.probe_id AND b.vec_id = p.vec_id
      GROUP BY 1"""))

  // --- IVF nprobe TUNING CURVE: how many lists must a search visit?
  // For every exact top-5 neighbor (q36's truth) of every probe, the
  // rank of its ASSIGNED k-means list in the probe's centroid ordering;
  // candidate recall@nprobe = fraction of truth neighbors whose list a
  // search visiting `nprobe` lists would scan — the UPPER BOUND on
  // search recall that prices the nlist/nprobe trade before building
  // the index (documented: candidate recall, re-rank can only keep
  // fewer). The nprobe fan-out explodes a 4-element literal over the
  // probes×5 summary; centroid ranking is k rows per probe. -----------
  private val q267 = Q("q267_ivf_nprobe_curve",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), quantize(col("embedding"), SCALE).as("qv"))
      val assigned = graft.pipeline.TrainingData
        .kmeansShared(e, KMEANS_K, KMEANS_ITERS)
      val cents = assigned
        .select(col("cid"), posexplode_outer(col("qv")).as(Seq("i", "x")))
        .groupBy(col("cid"), col("i")).agg(sum(col("x")).as("sx"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("i"), col("sx"))))
          .as("pairs"))
        .select(col("cid"),
          transform(col("pairs"), p => p.getField("sx")).as("cv"))
        .withColumn("cnrm", dotLong(col("cv"), col("cv")))
      val wP = Window.partitionBy(col("probe_id"))
        .orderBy(col("pcos").desc, col("cid"))
      val ranks = assigned.filter(col("vec_id") % PROBE_MOD === 0)
        .select(col("vec_id").as("probe_id"), col("qv").as("pv"),
          col("nrm").as("pnrm"))
        .crossJoin(broadcast(cents))
        .select(col("probe_id"), col("cid"),
          cosineQ(dotLong(col("pv"), col("cv")), col("pnrm"),
            col("cnrm")).as("pcos"))
        .withColumn("list_rank", row_number().over(wP).cast("long"))
        .select(col("probe_id"), col("cid"), col("list_rank"))
      val truth = bruteTopK(s, dir, 5)
        .select(col("probe_id"), col("vec_id"))
      truth
        .join(assigned.select(col("vec_id"), col("cid")), "vec_id")
        .join(ranks, Seq("probe_id", "cid"))
        .select(explode(array(lit(1L), lit(2L), lit(4L), lit(8L)))
          .as("nprobe"), col("list_rank"))
        .groupBy(col("nprobe"))
        .agg(count(lit(1)).as("n_truth"),
          sum(when(col("list_rank") <= col("nprobe"), 1L)
            .otherwise(0L)).as("n_in_lists"))
        .withColumn("cand_recall",
          col("n_in_lists").cast("double") / col("n_truth").cast("double"))
    },
    Some {
      val f = KMEANS_ITERS
      s"""WITH ${kmeansCtes(KMEANS_K, KMEANS_ITERS)},
      ${updateSql(s"a$f", "F")},
      $bruteScoreCtesSql,
      truth AS (${topkSql("bscored", 5)}),
      ranks AS (SELECT probe_id, cid,
          CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY ${cosSql("pv", "cv", "pnrm", "c.cnrm")} DESC, cid)
            AS BIGINT) AS list_rank
        FROM p, centnF c),
      tr AS (SELECT t.probe_id, r.list_rank
        FROM truth t
        JOIN a$f a ON a.vec_id = t.vec_id
        JOIN ranks r ON r.probe_id = t.probe_id AND r.cid = a.cid),
      nps(nprobe) AS (VALUES (CAST(1 AS BIGINT)), (2), (4), (8))
      SELECT nprobe, CAST(COUNT(*) AS BIGINT) AS n_truth,
        CAST(SUM(CASE WHEN list_rank <= nprobe THEN 1 ELSE 0 END)
          AS BIGINT) AS n_in_lists,
        CAST(SUM(CASE WHEN list_rank <= nprobe THEN 1 ELSE 0 END)
          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS cand_recall
      FROM tr CROSS JOIN nps
      GROUP BY 1"""
    })

  // --- q338: EMBEDDING DRIFT BY LABEL — cosine of each label's sum
  // vector against the corpus sum vector (equal to centroid cosine:
  // the counts cancel), the domain-shift monitor a mixture owner
  // reads before reweighting. Components quantize to floor(x·1000)
  // BIGINTs (floor, not round — Spark rounds HALF_UP, DuckDB half
  // away from zero), so all sums/dots are exact integers; the only
  // floats are two sqrts and one division per label. One explode to
  // (label, dim) keyed partials, then a broadcast join of the
  // ≤ #labels·D summary against its own global rollup. ----------------
  private val q338 = Q("q338_embedding_drift",
    (s, dir) => {
      val comp = Tables(s, dir, "embeddings")
        .select(col("label"),
          posexplode_outer(col("embedding")).as(Seq("dim", "x")))
        .select(col("label"), col("dim"),
          floor(col("x").cast("double") * 1000).cast("long").as("q"))
      val byLabel = comp.groupBy(col("label"), col("dim"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("c"))
      val global = broadcast(byLabel.groupBy(col("dim"))
        .agg(sum(col("s")).as("g")))
      byLabel.join(global, "dim")
        .groupBy(col("label"))
        .agg(max(col("c")).as("n_vecs"),
          sum(col("s") * col("g")).as("dot"),
          sum(col("s") * col("s")).as("ss"),
          sum(col("g") * col("g")).as("gg"))
        .withColumn("cos_to_global", when(col("ss") > 0 && col("gg") > 0,
          col("dot").cast("double")
            / (sqrt(col("ss").cast("double"))
              * sqrt(col("gg").cast("double")))))
        .select(col("label"), col("n_vecs"), col("dot"),
          col("cos_to_global"))
    },
    Some("""WITH comp AS (SELECT label,
          generate_subscripts(embedding, 1) - 1 AS dim,
          CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000)
            AS BIGINT) AS q
        FROM embeddings),
      byl AS (SELECT label, dim, CAST(SUM(q) AS BIGINT) AS s,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM comp GROUP BY 1, 2),
      g AS (SELECT dim, CAST(SUM(s) AS BIGINT) AS g FROM byl
        GROUP BY dim)
      SELECT label, MAX(c) AS n_vecs,
        CAST(SUM(s * g.g) AS BIGINT) AS dot,
        CASE WHEN SUM(s * s) > 0 AND SUM(g.g * g.g) > 0 THEN
          CAST(SUM(s * g.g) AS DOUBLE)
            / (sqrt(CAST(SUM(s * s) AS DOUBLE))
              * sqrt(CAST(SUM(g.g * g.g) AS DOUBLE))) END
          AS cos_to_global
      FROM byl JOIN g USING (dim) GROUP BY label"""))

  override def queries: Seq[Q] =
    Seq(q36, q37, q38, q39, q61, q63, q75, q76, q80, q105, q114, q115,
      q131, q148, q156, q195, q208, q267, q338)
}
