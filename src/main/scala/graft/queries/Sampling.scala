package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Deterministic sampling / split operators for the training-data
  * pipeline (builder brief): every large corpus run needs a stable
  * train/validation split and per-group quota sampling ("data mixing" —
  * rebalance a mixture so no language/source dominates). Randomness
  * comes from md5 of the document id, so the assignment is a pure
  * projection — reproducible across runs, engines, and cluster sizes,
  * never a `rand()` that reshuffles per execution.
  *
  * Scale notes (100 TB): the split is a narrow projection (no shuffle).
  * Quota sampling is a per-group top-Q by hash order — Spark's
  * WindowGroupLimit caps every map task at Q rows per group before the
  * shuffle, so the exchange carries ≤ Q·groups·partitions rows, not the
  * corpus.
  */
object Sampling extends QueryModule {

  // --- deterministic train/val split: nibbles c-f (4/16 = 25%) hold
  // out. Aggregated per (lang, split) so the oracle checks both the
  // assignment and that it is a partition of the corpus. Delegates to
  // the public pipeline API (graft.pipeline.TrainingData). ---------------
  private val q64 = Q("q64_split_assign",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      graft.pipeline.TrainingData.trainValSplit(d)
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("first_doc"))
    },
    Some("""SELECT lang,
        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d','e','f')
          THEN 'val' ELSE 'train' END AS split,
        COUNT(*) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        MIN(doc_id) AS first_doc
      FROM documents GROUP BY 1, 2"""))

  // --- per-language quota sampling (mixture rebalancing): keep the Q
  // hash-first documents of every language — a deterministic uniform
  // subsample whose membership never changes as the corpus grows at the
  // tail. ----------------------------------------------------------------
  private val QUOTA = 30
  private val q65 = Q("q65_quota_sample",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"))
      graft.pipeline.TrainingData.quotaSample(d, "lang", QUOTA)
    },
    Some(s"""SELECT doc_id, lang, rk FROM
        (SELECT doc_id, lang,
           ROW_NUMBER() OVER (PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
         FROM documents)
      WHERE rk <= $QUOTA"""))

  // --- benchmark decontamination: drop from the train split every
  // document whose content fingerprint appears in the val split (the
  // "remove test-set leakage" pass every training corpus runs). The
  // corpus carries real exact-dups across splits, so rows demonstrably
  // drop. Delegates to graft.pipeline.TrainingData.decontaminate; one
  // anti-join on the 128-bit fingerprint, eval side broadcastable. -------
  private val q66 = Q("q66_decontaminate",
    (s, dir) => {
      val d = graft.pipeline.TrainingData.trainValSplit(
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text")))
      val train = d.filter(col("split") === "train")
      val eval = d.filter(col("split") === "val")
      val clean = graft.pipeline.TrainingData.decontaminate(train, eval)
      val nTrain = train.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_train"))
      val nClean = clean.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_clean"))
      nTrain.join(nClean, Seq("lang"))
        .withColumn("n_dropped", col("n_train") - col("n_clean"))
    },
    Some("""WITH s AS (SELECT doc_id, lang,
        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
               IN ('c','d','e','f') THEN 'val' ELSE 'train' END AS split,
        md5(array_to_string(list_sort(list_distinct(
          list_filter(string_split_regex(text, '\s+'), t -> t <> ''))),
          ' ')) AS fp
      FROM documents),
      tr AS (SELECT * FROM s WHERE split = 'train'),
      ev AS (SELECT DISTINCT fp FROM s WHERE split = 'val'),
      cl AS (SELECT * FROM tr WHERE fp NOT IN (SELECT fp FROM ev))
      SELECT lang,
        (SELECT COUNT(*) FROM tr t2 WHERE t2.lang = tr.lang) AS n_train,
        (SELECT COUNT(*) FROM cl c2 WHERE c2.lang = tr.lang) AS n_clean,
        (SELECT COUNT(*) FROM tr t2 WHERE t2.lang = tr.lang) -
          (SELECT COUNT(*) FROM cl c2 WHERE c2.lang = tr.lang)
          AS n_dropped
      FROM tr GROUP BY lang"""))

  // --- q66 through the Bloom-prefilter path: the train side is a pure
  // codegen might_contain filter (no join for the clean mass); only
  // sketch-flagged candidates reach the exact anti-join, which removes
  // the false positives — so the result, and hence the oracle, is
  // identical to q66's plain anti-join. -------------------------------
  private val q85 = Q("q85_decontaminate_bloom",
    (s, dir) => {
      val d = graft.pipeline.TrainingData.trainValSplit(
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text")))
      val train = d.filter(col("split") === "train")
      val eval = d.filter(col("split") === "val")
      val clean = graft.pipeline.TrainingData.decontaminateBloom(train, eval)
      val nTrain = train.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_train"))
      val nClean = clean.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_clean"))
      nTrain.join(nClean, Seq("lang"))
        .withColumn("n_dropped", col("n_train") - col("n_clean"))
    },
    Some("""WITH s AS (SELECT doc_id, lang,
        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
               IN ('c','d','e','f') THEN 'val' ELSE 'train' END AS split,
        md5(array_to_string(list_sort(list_distinct(
          list_filter(string_split_regex(text, '\s+'), t -> t <> ''))),
          ' ')) AS fp
      FROM documents),
      tr AS (SELECT * FROM s WHERE split = 'train'),
      ev AS (SELECT DISTINCT fp FROM s WHERE split = 'val'),
      cl AS (SELECT * FROM tr WHERE fp NOT IN (SELECT fp FROM ev))
      SELECT lang,
        (SELECT COUNT(*) FROM tr t2 WHERE t2.lang = tr.lang) AS n_train,
        (SELECT COUNT(*) FROM cl c2 WHERE c2.lang = tr.lang) AS n_clean,
        (SELECT COUNT(*) FROM tr t2 WHERE t2.lang = tr.lang) -
          (SELECT COUNT(*) FROM cl c2 WHERE c2.lang = tr.lang)
          AS n_dropped
      FROM tr GROUP BY lang"""))

  // --- temperature-weighted mixture sampling (α = 1/2): per-source
  // quotas ∝ √n_s, so rare sources up-sample — integer weights from one
  // IEEE sqrt per source, md5-ordered members; DuckDB replays weights,
  // integer-division quotas, and hash ranks bit-for-bit. --------------
  private val q89 = Q("q89_temperature_mix",
    (s, dir) => graft.pipeline.TrainingData.temperatureSample(
        Tables(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", totalBudget = 200L)
      .select(col("doc_id"), col("source")),
    Some("""WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY source),
      w AS (SELECT source,
          CAST(floor(sqrt(CAST(n * 1000000 AS DOUBLE))) AS BIGINT) AS w
        FROM c),
      tw AS (SELECT CAST(SUM(w) AS BIGINT) AS tot FROM w),
      q AS (SELECT source, (200 * w) // tot AS quota
        FROM w CROSS JOIN tw),
      r AS (SELECT doc_id, source,
          row_number() OVER (PARTITION BY source
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents)
      SELECT doc_id, source FROM r JOIN q USING (source)
      WHERE rn <= quota"""))

  // --- GPT-3-style contamination REPORT: per eval doc, the fraction of
  // its distinct 3-grams appearing anywhere in train — measurement, not
  // removal. Gram explosion is linear, the train set joins semi. ------
  private val q91 = Q("q91_contamination_report",
    (s, dir) => {
      val d = graft.pipeline.TrainingData.trainValSplit(
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text")))
      graft.pipeline.TrainingData.contaminationReport(
        d.filter(col("split") === "train"),
        d.filter(col("split") === "val"))
    },
    Some("""WITH s AS (SELECT doc_id,
        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
               IN ('c','d','e','f') THEN 'val' ELSE 'train' END AS split,
        list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks
      FROM documents),
      g AS (SELECT doc_id, split,
          list_distinct([toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
            for i in range(0, len(toks) - 2)]) AS grams
        FROM s WHERE len(toks) >= 3),
      tg AS (SELECT DISTINCT unnest(grams) AS gr FROM g
        WHERE split = 'train'),
      eg AS (SELECT doc_id, unnest(grams) AS gr FROM g
        WHERE split = 'val'),
      t AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
        FROM eg GROUP BY doc_id),
      h AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit FROM eg
        WHERE gr IN (SELECT gr FROM tg) GROUP BY doc_id)
      SELECT t.doc_id, n_grams,
        COALESCE(n_hit, CAST(0 AS BIGINT)) AS n_hit,
        CAST(COALESCE(n_hit, 0) AS DOUBLE) / n_grams AS overlap
      FROM t LEFT JOIN h USING (doc_id)"""))

  // --- NEAR-dup decontamination: exact matching (q66) misses
  // paraphrased leakage; this drops train documents with a verified
  // shingle-Jaccard ≥ 0.5 near-duplicate in the val split. Candidates
  // from a train×val band-key equi-join — never all pairs. Output is
  // the dropped rows, proving cross-split near-dups really exist and
  // really drop. --------------------------------------------------------
  private val q67 = Q("q67_decontaminate_near",
    (s, dir) => {
      val d = graft.pipeline.TrainingData.trainValSplit(
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("lang"), col("text")))
      val train = d.filter(col("split") === "train")
      val eval = d.filter(col("split") === "val")
      val clean = graft.pipeline.TrainingData.decontaminateNear(train, eval)
      train.join(clean.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"))
    },
    Some("""WITH s AS (SELECT doc_id, lang,
        CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
               IN ('c','d','e','f') THEN 'val' ELSE 'train' END AS split,
        list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks
      FROM documents),
      sh AS (SELECT doc_id, lang, split,
        CASE WHEN len(toks) >= 3 THEN
          list_distinct(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
        ELSE [] END AS sh FROM s),
      shv AS (SELECT * FROM sh WHERE len(sh) > 0),
      sig AS (SELECT doc_id, split, sh,
        list_transform(range(1, 13), i ->
          list_min(list_transform(sh, x ->
            md5(CAST(i AS VARCHAR) || ':' || x)))) AS sig
        FROM shv),
      bands AS (SELECT doc_id, split, b,
        md5(array_to_string(sig[b*3+1 : b*3+3], '|')) AS bkey
        FROM sig, (SELECT unnest(range(0, 4)) AS b)),
      cand AS (SELECT DISTINCT t.doc_id AS tid, e.doc_id AS eid
        FROM bands t JOIN bands e ON t.b = e.b AND t.bkey = e.bkey
        WHERE t.split = 'train' AND e.split = 'val'),
      ver AS (SELECT DISTINCT tid FROM cand
        JOIN shv a ON a.doc_id = cand.tid
        JOIN shv b ON b.doc_id = cand.eid
        WHERE CAST(len(a.sh) + len(b.sh)
               - len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5)
      SELECT doc_id, lang FROM s
      WHERE split = 'train' AND doc_id IN (SELECT tid FROM ver)"""))

  /** DuckDB whitespace token count identical to `textfns.tokenCount`. */
  private val ntSql =
    """CAST(len(list_filter(string_split_regex(text, '\s+'),
       t -> t <> '')) AS BIGINT)"""

  // --- concatenate-and-cut sequence packing: documents in id order form
  // one virtual token stream cut into SEQ_LEN-token context windows;
  // each document reports its global offset and the windows it spans —
  // what a loader needs to slice shards without re-tokenizing. The
  // Spark side's running sum is two-level (bucketed cumsum + broadcast
  // bucket prefixes, no single-partition window); the oracle needs only
  // the RESULT, so it uses the plain windowed sum. -----------------------
  private val SEQ_LEN = 512
  private val q77 = Q("q77_pack_sequences",
    (s, dir) => graft.pipeline.TrainingData.packSequences(
      Tables(s, dir, "documents"), SEQ_LEN),
    Some(s"""WITH c AS (SELECT doc_id, $ntSql AS n_tokens FROM documents),
      s AS (SELECT doc_id, n_tokens,
        CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS end_tok
      FROM c)
      SELECT doc_id, n_tokens, end_tok - n_tokens AS start_tok,
        (end_tok - n_tokens) // $SEQ_LEN AS first_seq,
        CASE WHEN n_tokens = 0 THEN (end_tok - n_tokens) // $SEQ_LEN
          ELSE (end_tok - 1) // $SEQ_LEN END AS last_seq,
        CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
          ELSE (end_tok - 1) // $SEQ_LEN
             - (end_tok - n_tokens) // $SEQ_LEN + 1 END AS n_seqs
      FROM s"""))

  // --- token-budget mixture: per source, take hash-first documents
  // until the source's token budget is spent (budgets vary by source to
  // exercise the join; the boundary-crossing doc is included). Training
  // mixtures are token-budgeted, not row-budgeted — this is the mixing
  // step q65's row quotas approximate. -----------------------------------
  private val q78 = Q("q78_token_budget_mix",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      val budgets = d.select(col("source")).distinct()
        .withColumn("budget", lit(200L) +
          lit(50L) * (substring(col("source"), 4, 10).cast("long") % 4))
      graft.pipeline.TrainingData.tokenBudgetSample(d, "source", budgets)
        .select(col("doc_id"), col("source"), col("cum_tokens"))
    },
    Some(s"""WITH c AS (SELECT doc_id, source, $ntSql AS nt
        FROM documents),
      s AS (SELECT doc_id, source, nt,
        CAST(SUM(nt) OVER (PARTITION BY source
          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
          AS cum_tokens
      FROM c),
      b AS (SELECT source,
        200 + 50 * (CAST(substr(source, 4) AS BIGINT) % 4) AS budget
      FROM (SELECT DISTINCT source FROM documents))
      SELECT doc_id, source, cum_tokens FROM s JOIN b USING (source)
      WHERE cum_tokens - nt < budget"""))

  // --- corpus snapshot diff (dataset versioning): v2 simulates one
  // pipeline release — 1/7 of documents dropped, 1/5 edited, a batch of
  // new ids ingested — and the diff classifies every id by comparing
  // 128-bit content fingerprints, never bodies. One id-keyed join. ------
  private val q95 = Q("q95_corpus_diff",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      val prev = d.select(col("doc_id"), col("text"))
      val cur = d.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" [edited v2]")))
            .otherwise(col("text")).as("text"))
        .unionByName(d.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(lit("new doc "), col("doc_id").cast("string"))
              .as("text")))
      graft.pipeline.TrainingData.corpusDiff(prev, cur)
    },
    Some("""WITH prev AS (SELECT doc_id, text FROM documents),
      cur AS (
        SELECT doc_id,
          CASE WHEN doc_id % 5 = 0 THEN text || ' [edited v2]'
            ELSE text END AS text
        FROM documents WHERE doc_id % 7 <> 0
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
          'new doc ' || CAST(doc_id AS VARCHAR) AS text
        FROM documents WHERE doc_id % 11 = 0),
      a AS (SELECT doc_id, md5(text) AS fp_prev FROM prev),
      b AS (SELECT doc_id, md5(text) AS fp_cur FROM cur)
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
        CASE WHEN a.doc_id IS NULL THEN 'added'
             WHEN b.doc_id IS NULL THEN 'removed'
             WHEN fp_prev <> fp_cur THEN 'changed'
             ELSE 'unchanged' END AS status,
        fp_prev, fp_cur
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id"""))

  // --- deterministic shard shuffle (training-export ordering): stable
  // (shard, pos) from md5(seed:id) — reproducible "random" order with
  // no rand(), one shuffle on the shard key, per-shard local sort. ------
  private val q96 = Q("q96_shard_shuffle",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"))
      graft.pipeline.TrainingData.shuffleToShards(d, nShards = 8, seed = 7)
    },
    Some("""WITH k AS (SELECT doc_id, source,
        md5('7:' || CAST(doc_id AS VARCHAR)) AS key FROM documents),
      a AS (SELECT doc_id, source, key,
        CAST(('0x' || substr(key, 1, 8)) AS BIGINT) % 8 AS shard FROM k)
      SELECT doc_id, source, shard,
        CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY key, doc_id)
          AS BIGINT) AS pos
      FROM a"""))

  // --- T5-style span corruption (Raffel et al. 2020): deterministic
  // masked-span (input, target) example pairs straight from the
  // documents table — fixed 3-token spans, a span masks iff the first
  // md5(doc_id:span) nibble ∈ {0,1,2} (≈19% noise), masked span k
  // becomes <extra_id_k>. Pure projection (no shuffle, no join, no
  // rand()); the oracle replays tokenization, flags, sentinel ranking,
  // and both reassembled strings verbatim. Delegates to the public
  // pipeline API (TrainingData.spanCorrupt). ----------------------------
  private val q111 = Q("q111_span_corrupt",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      graft.pipeline.TrainingData.spanCorrupt(d)
    },
    Some("""WITH t AS (SELECT doc_id,
        list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
      FROM documents),
    f AS (SELECT doc_id, toks,
        CAST(ceil(len(toks) / 3.0) AS INT) AS nspans,
        list_transform(range(0, CAST(ceil(len(toks) / 3.0) AS INT)), sp ->
          substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(sp AS VARCHAR)),
            1, 1) IN ('0', '1', '2')) AS flags
      FROM t)
    SELECT doc_id,
      CASE WHEN len(toks) > 0 THEN
        array_to_string(list_transform(range(0, nspans), sp ->
          CASE WHEN flags[sp + 1]
            THEN '<extra_id_' ||
              CAST(len(list_filter(flags[1:sp], x -> x)) AS VARCHAR) || '>'
            ELSE array_to_string(toks[sp * 3 + 1 : sp * 3 + 3], ' ')
          END), ' ')
        ELSE '' END AS input,
      CASE WHEN len(toks) > 0 THEN
        COALESCE(array_to_string(list_transform(
          list_filter(range(0, nspans), sp -> flags[sp + 1]), sp ->
            '<extra_id_' ||
            CAST(len(list_filter(flags[1:sp], x -> x)) AS VARCHAR) ||
            '> ' || array_to_string(toks[sp * 3 + 1 : sp * 3 + 3], ' ')),
          ' '), '')
        ELSE '' END AS target,
      CASE WHEN len(toks) > 0 THEN CAST(nspans AS BIGINT)
        ELSE 0 END AS n_spans,
      CAST(len(list_filter(flags, x -> x)) AS BIGINT) AS n_masked_spans,
      CAST(COALESCE(list_sum(list_transform(
          list_filter(range(0, nspans), sp -> flags[sp + 1]),
          sp -> len(toks[sp * 3 + 1 : sp * 3 + 3]))), 0) AS BIGINT)
        AS n_masked_tokens
    FROM f"""))

  // --- fill-in-the-middle transformation (Bavarian et al. 2022 — the
  // code-LLM pretraining op): deterministically cut each document's
  // token stream into (prefix, middle, suffix) and emit the PSM
  // rearrangement <PRE>prefix<SUF>suffix<MID>middle. Cut points come
  // from md5 nibbles of the doc id (reproducible, no rand()); docs
  // with < 3 tokens pass through unchanged (fim_applied = 0). Pure
  // projection. --------------------------------------------------------
  private val q117 = Q("q117_fim_transform",
    (s, dir) => {
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val toks = filter(split(col("text"), "\\s+"), t => t =!= "")
      val n = size(toks)
      // two md5 nibble pairs → cut1 in [1, n-2], cut2 in (cut1, n-1]:
      // h1 % (n-2) + 1 and cut1 + h2 % (n-1-cut1) + 1, exact integers
      val h1 = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":a"))), 1, 4), 16, 10).cast("long")
      val h2 = conv(substring(md5(concat(col("doc_id").cast("string"),
        lit(":b"))), 1, 4), 16, 10).cast("long")
      val cut1 = (h1 % (n - 2) + 1).cast("int")
      val cut2 = (cut1 + h2 % (n - 1 - cut1) + 1).cast("int")
      val pre = array_join(slice(toks, lit(1), cut1), " ")
      val mid = array_join(slice(toks, cut1 + 1, cut2 - cut1), " ")
      val suf = array_join(slice(toks, cut2 + 1, n - cut2), " ")
      d.select(col("doc_id"),
        when(n >= 3,
          concat(lit("<PRE>"), pre, lit("<SUF>"), suf, lit("<MID>"), mid))
          .otherwise(col("text")).as("fim_text"),
        when(n >= 3, lit(1L)).otherwise(lit(0L)).as("fim_applied"),
        when(n >= 3, (cut2 - cut1).cast("long")).otherwise(lit(0L))
          .as("n_middle_tokens"))
    },
    Some("""SELECT doc_id,
      CASE WHEN n >= 3 THEN
        '<PRE>' || array_to_string(toks[1 : cut1], ' ') ||
        '<SUF>' || array_to_string(toks[cut2 + 1 : n], ' ') ||
        '<MID>' || array_to_string(toks[cut1 + 1 : cut2], ' ')
        ELSE text END AS fim_text,
      CASE WHEN n >= 3 THEN CAST(1 AS BIGINT)
        ELSE CAST(0 AS BIGINT) END AS fim_applied,
      CASE WHEN n >= 3 THEN CAST(cut2 - cut1 AS BIGINT)
        ELSE CAST(0 AS BIGINT) END AS n_middle_tokens
      FROM (SELECT doc_id, text, toks, n, cut1,
          CAST(cut1 + h2 % (n - 1 - cut1) + 1 AS INT) AS cut2
        FROM (SELECT doc_id, text, toks, n, h2,
            CAST(h1 % (n - 2) + 1 AS INT) AS cut1
          FROM (SELECT doc_id, text, toks, len(toks) AS n,
              CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':a'),
                1, 4)) AS BIGINT) AS h1,
              CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':b'),
                1, 4)) AS BIGINT) AS h2
            FROM (SELECT doc_id, text,
                list_filter(string_split_regex(text, '\s+'),
                  t -> t <> '') AS toks
              FROM documents))))"""))

  // --- length-grouped batch assignment (padding-efficiency batching):
  // docs bucket by floor(log2(n_tokens)), batches of BATCH within a
  // bucket in hash order — all windows partition by bucket, so the
  // plan has no global sort and parallelism grows with the length
  // spread; deterministic md5 order keeps batches stable across runs
  // and engines. ------------------------------------------------------
  private val BATCH = 16
  private val q118 = Q("q118_length_batches",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir, "documents").select(col("doc_id"), col("text"))
      val n = size(filter(split(col("text"), "\\s+"), t => t =!= ""))
      // floor(log2(n)) computed EXACTLY as bit-length − 1 (a floating
      // log2 can straddle integer boundaries differently per engine)
      val bucket = when(n <= 0, lit(0))
        .otherwise((length(bin(n.cast("long"))) - 1).cast("int"))
      val key = md5(col("doc_id").cast("string"))
      val w = Window.partitionBy(col("bucket"))
        .orderBy(col("key"), col("doc_id"))
      d.select(col("doc_id"), n.cast("long").as("n_tokens"),
          bucket.as("bucket"), key.as("key"))
        .withColumn("rn", row_number().over(w))
        .select(col("doc_id"), col("n_tokens"), col("bucket"),
          expr(s"CAST((rn - 1) div $BATCH AS BIGINT)")
            .as("batch_in_bucket"),
          ((col("rn") - 1) % BATCH).cast("long").as("slot"))
    },
    Some(s"""SELECT doc_id, n_tokens, bucket,
      CAST((rn - 1) // $BATCH AS BIGINT) AS batch_in_bucket,
      CAST((rn - 1) % $BATCH AS BIGINT) AS slot
      FROM (SELECT doc_id, n_tokens, bucket,
          ROW_NUMBER() OVER (PARTITION BY bucket
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
            CASE WHEN n <= 0 THEN 0
              ELSE CAST(length(bin(CAST(n AS BIGINT))) - 1 AS INT)
            END AS bucket
          FROM (SELECT doc_id,
              len(list_filter(string_split_regex(text, '\\s+'),
                t -> t <> '')) AS n
            FROM documents)))"""))

  // --- DSIR-shaped importance selection (Xie 2023): hashed-token feature
  // buckets (first two md5 nibbles → 256), per-bucket target-vs-raw
  // occurrence counts, and a per-document BIGINT linear discriminant —
  // keep docs whose average target-affinity beats the corpus mean. The
  // bucket table broadcast-HASH-joins back onto the token stream and the
  // per-doc masses partial-aggregate before one doc-key exchange (≈ one
  // row per document crosses the wire — the probe-killed map-literal HOF
  // alternative is documented at TrainingData.dsirSelect); all-integer
  // arithmetic keeps the KEEP decision engine-exact where the published
  // Σlog form would drift. Target slice: lang = 'en'. --------------------
  private val q141 = Q("q141_dsir_select",
    (s, dir) => graft.pipeline.TrainingData.dsirSelect(
        Tables(s, dir, "documents"), isTarget = col("lang") === "en")
      .select(col("doc_id"), col("lang"),
        col("tgt_mass"), col("raw_mass"), col("keep")),
    Some("""WITH t AS (SELECT doc_id, lang,
        list_filter(string_split_regex(text, '\s+'), t -> t <> '') AS toks
        FROM documents),
      tok AS (SELECT doc_id, lang, substr(md5(tk), 1, 2) AS b
        FROM (SELECT doc_id, lang, unnest(toks) AS tk FROM t)),
      bk AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS raw_c,
          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
            AS tgt_c
        FROM tok GROUP BY 1),
      tot AS (SELECT CAST(SUM(raw_c) AS BIGINT) AS raw_tot,
          CAST(SUM(tgt_c) AS BIGINT) AS tgt_tot FROM bk),
      mass AS (SELECT doc_id, CAST(SUM(bk.tgt_c) AS BIGINT) AS tgt_mass,
          CAST(SUM(bk.raw_c) AS BIGINT) AS raw_mass
        FROM tok JOIN bk USING (b) GROUP BY 1)
      SELECT t.doc_id, t.lang,
        COALESCE(m.tgt_mass, 0) AS tgt_mass,
        COALESCE(m.raw_mass, 0) AS raw_mass,
        COALESCE(m.tgt_mass, 0) * tot.raw_tot
          > COALESCE(m.raw_mass, 0) * tot.tgt_tot AS keep
      FROM t LEFT JOIN mass m ON t.doc_id = m.doc_id CROSS JOIN tot"""))

  // --- dataset-card representation & selection-fairness report: per
  // (source, lang) cell — corpus share by docs and by chars, the
  // length-gate selection rate (the documented 200 ≤ n_chars ≤ 2000
  // filter), and the EEOC "four-fifths rule" flag computed as an EXACT
  // integer cross-multiplication (5·sel_g·tot_all < 4·sel_all·tot_g ⇔
  // the cell's selection rate is below 80% of the corpus rate — no
  // rate division enters the comparison). One grid-bounded aggregate +
  // a broadcast totals row. --------------------------------------------
  private val q264 = Q("q264_fairness_report",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("source"), col("lang"), col("n_chars"),
          (col("n_chars") >= 200 && col("n_chars") <= 2000).as("sel"))
      val cells = d.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("n_chars"),
          sum(when(col("sel"), 1L).otherwise(0L)).as("n_sel"))
      val tot = cells.agg(sum(col("n_docs")).as("tot_docs"),
        sum(col("n_chars")).as("tot_chars"),
        sum(col("n_sel")).as("tot_sel"))
      cells.crossJoin(broadcast(tot))
        .select(col("source"), col("lang"), col("n_docs"),
          col("n_chars"), col("n_sel"),
          (col("n_docs").cast("double") / col("tot_docs").cast("double"))
            .as("doc_share"),
          (col("n_chars").cast("double")
            / col("tot_chars").cast("double")).as("char_share"),
          (col("n_sel").cast("double") / col("n_docs").cast("double"))
            .as("sel_rate"),
          (lit(5L) * col("n_sel") * col("tot_docs") <
            lit(4L) * col("tot_sel") * col("n_docs"))
            .as("four_fifths_flag"))
    },
    Some("""WITH cells AS (SELECT source, lang,
          CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(n_chars) AS BIGINT) AS n_chars,
          CAST(SUM(CASE WHEN n_chars >= 200 AND n_chars <= 2000
            THEN 1 ELSE 0 END) AS BIGINT) AS n_sel
        FROM documents GROUP BY 1, 2),
      tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS tot_docs,
          CAST(SUM(n_chars) AS BIGINT) AS tot_chars,
          CAST(SUM(n_sel) AS BIGINT) AS tot_sel FROM cells)
      SELECT source, lang, n_docs, n_chars, n_sel,
        CAST(n_docs AS DOUBLE) / CAST(tot_docs AS DOUBLE) AS doc_share,
        CAST(n_chars AS DOUBLE) / CAST(tot_chars AS DOUBLE)
          AS char_share,
        CAST(n_sel AS DOUBLE) / CAST(n_docs AS DOUBLE) AS sel_rate,
        5 * n_sel * tot_docs < 4 * tot_sel * n_docs AS four_fifths_flag
      FROM cells CROSS JOIN tot"""))

  override def queries: Seq[Q] = Seq(q64, q65, q66, q67, q77, q78, q85,
    q89, q91, q95, q96, q111, q117, q118, q141, q264)
}
