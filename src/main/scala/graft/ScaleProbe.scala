package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TrainingData

/** Scale-linearity probe for the heavy pipeline operators (q68/q72/q76/
  * q81/q92 shapes): times each on the sfDir corpus and on a 10×
  * deterministic expansion, and reports wall-clock ratios. The design
  * claim under test is "no hidden quadratic": every operator is built
  * on bucketed/banded joins and linear shuffles, so 10× data must cost
  * ~10× (ratio well under 15 leaves headroom for fixed overheads and
  * shuffle-partition effects, never for O(n²) blowup — a pair-enumerating
  * implementation would come back ~100×).
  *
  * The 10× corpus is 10 DISJOINT replica shards: every token carries a
  * per-shard suffix, so shards share no shingles and the duplicate
  * DENSITY matches the base corpus (the right null model for a
  * linearity test — naive replication would multiply cluster sizes,
  * which is a data change, not a scale change). Embeddings perturb one
  * coordinate per shard for the same reason.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.ScaleProbe"; one JSON line on stdout + target/scaleprobe.json.
  */
object ScaleProbe {
  /** Expansion factor (SPARK_GRAFT_SCALE_FACTOR, default 10); the
    * 30× runs for the heaviest raters set it to 30 with
    * SPARK_GRAFT_SCALE_OPS filtering to the ops under test. */
  private val Factor =
    sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt

  private def expandDocs(docs: DataFrame, k: Int): DataFrame =
    docs.select(col("doc_id"), col("text"),
        explode(sequence(lit(0), lit(k - 1))).as("__r"))
      .select((col("doc_id") * k + col("__r")).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit("_"), col("__r"))), " ").as("text"))

  private def expandVecs(vecs: DataFrame, k: Int): DataFrame =
    vecs.select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(k - 1))).as("__r"))
      .select((col("vec_id") * k + col("__r")).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x + (col("__r") * (i % 7 - 3)).cast("float") * 0.01f)
          .as("embedding"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // SPARK_GRAFT_SHUFFLE_PARTITIONS: probe at a CLUSTER-like partition
    // count (clusters run thousands) — catches plan-size/driver-side
    // per-partition costs that local core-count partitioning hides
    val shufP = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufP)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs1 = graft.core.Tables(spark, sfDir, "documents")
      .select("doc_id", "text")
    val docsN = expandDocs(docs1, Factor)
    val vecs1 = graft.core.Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val vecsN = expandVecs(vecs1, Factor)
    // materialize the inputs once so expansion cost never pollutes the
    // operator timings. Repartitioned BEFORE the cache: the testdata
    // parquet is single-row-group, so an uncached scan (and therefore
    // the cached table) would hold ONE partition — every op's first
    // projection chain would fuse into a single task and the probe
    // could never show core scaling regardless of SPARK_GRAFT_CPUS
    // (round-12 fix; a real multi-file corpus scan is already parallel)
    val probeParts = shufP.toInt
    def par(df: DataFrame): DataFrame = df.repartition(probeParts)
    val Seq(d1, dN, v1, vN) =
      Seq(docs1, docsN, vecs1, vecsN).map(par)
    d1.cache(); dN.cache(); v1.cache(); vN.cache()
    d1.count(); dN.count(); v1.count(); vN.count()

    def quant(df: DataFrame): DataFrame = df.select(col("vec_id"),
      graft.functions.vectorfns.quantize(col("embedding"), 10000)
        .as("qv"))

    // the LD probe's variants table: dosage vectors from the SynthGeno
    // cube, subsampled like q108. Expansion = 10 replica shards with
    // pos offset by a full window-disjoint stride (shards never pair
    // across the band boundary ⇒ the right linearity null model).
    val vars1 = {
      val v = graft.genomics.SynthGeno.variants(spark, sfDir)
        .filter(col("vid") % 11 === 0)
      v.select(col("vid"), col("chrom"), col("pos"),
        graft.functions.genetics.dosageAlt(col("geno")).as("d"))
    }
    val varsN = vars1
      .select(col("vid"), col("chrom"), col("pos"), col("d"),
        explode(sequence(lit(0), lit(Factor - 1))).as("__r"))
      .select((col("vid") * Factor + col("__r")).as("vid"), col("chrom"),
        (col("pos") + col("__r") * 10000000L).as("pos"), col("d"))
    vars1.cache(); varsN.cache(); vars1.count(); varsN.count()

    sealed trait Input
    case object Docs extends Input
    case object Vecs extends Input
    case object Vars extends Input

    // PQ ADC probes must stay a FIXED set as the corpus grows (the
    // query's % PROBE_MOD would grow them 10× and make the scan 100×
    // by design, not by defect), so the probe set is the base corpus's.
    def pqAdcScan(corpus: DataFrame, probeMod: Int): DataFrame = {
      import graft.functions.vectorfns._
      val e = quant(corpus)
      val cbRow = e.orderBy(col("vec_id")).limit(16)
        .agg(array_sort(collect_list(struct(col("vec_id"), col("qv"))))
          .as("pairs"))
        .select(transform(col("pairs"), p => p.getField("qv")).as("cbs"))
      val codes = e.crossJoin(broadcast(cbRow))
        .select(col("vec_id"), col("qv"),
          pqEncode(col("qv"), col("cbs"), 16, 4).as("codes"))
      val probes = e.filter(col("vec_id") % probeMod === 0)
        .crossJoin(broadcast(cbRow))
        .select(col("vec_id").as("probe_id"), col("qv").as("pv"),
          transform(sequence(lit(0), lit(15)), m =>
            transform(sequence(lit(0), lit(15)), k =>
              l2Long(slice(col("qv"), m * 4 + 1, lit(4)),
                slice(element_at(col("cbs"), (k + 1).cast("int")),
                  m * 4 + 1, lit(4))))).as("dtab"))
      val scored = codes.join(broadcast(probes),
          col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id"),
          pqAdc(col("dtab"), col("codes")).as("adc"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("adc").asc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 50)
    }

    // dosage vector → diploid geno cube (shared by the geno-cube ops)
    def genoFromD(df: DataFrame): DataFrame =
      df.withColumn("geno", array(
        (0 until 8).map { s =>
          val x = element_at(col("d"), s + 1)
          array(when(x >= 1, 1L).otherwise(when(x.isNull,
              lit(null).cast("long")).otherwise(0L)),
            when(x >= 2, 1L).otherwise(when(x.isNull,
              lit(null).cast("long")).otherwise(0L)))
        }: _*)).drop("d")

    val ops: Seq[(String, DataFrame => DataFrame, Input)] = Seq(
      ("ngram_jaccard",
        d => TrainingData.similarityJoin(d, shingleN = 3, threshold = 0.8),
        Docs),
      ("dedup_clusters",
        d => TrainingData.dedupClusters(d, shingleN = 3, minhashK = 32,
          bands = 8, rowsPerBand = 4, threshold = 0.5), Docs),
      ("dup_span_removal",
        d => TrainingData.removeDuplicatedSpans(d, l = 8), Docs),
      ("quality_gate", d => TrainingData.qualityGate(d), Docs),
      ("semdedup",
        d => TrainingData.semDedup(quant(d), k = 8, iters = 2, tau = 0.4,
          clusterCap = 64), Vecs),
      ("ld_r2",
        d => graft.operators.LdWindow.r2(d, 200L), Vars),
      ("ld_prune",
        d => graft.operators.PopGen.ldPrune(d, 200L, 0.5, 8), Vars),
      ("grm",
        d => graft.operators.PopGen.grm(d, 8), Vars),
      ("ibs",
        d => graft.operators.PopGen.ibs(d, 8), Vars),
      ("ld_decay",
        d => graft.operators.LdWindow.decayProfile(d, 200L, 50L), Vars),
      ("source_reputation",
        d => graft.pipeline.TrainingData.sourceReputation(
          d.withColumn("source",
            concat(lit("s"), (col("doc_id") % 41).cast("string")))),
        Docs),
      ("bpe_train",
        d => TrainingData.bpeTrain(d, nMerges = 4), Docs),
      ("cdc_chunks",
        d => TrainingData.cdcChunkStats(d), Docs),
      ("dsir_select",
        d => TrainingData.dsirSelect(d, isTarget = col("doc_id") % 3 === 0),
        Docs),
      ("collocations",
        d => TrainingData.collocations(d), Docs),
      ("pq_adc",
        d => pqAdcScan(d,
          if (d eq vN) 40 * Factor else 40), Vecs),
      // round-6 families: haplotype-window stats (explode ×H + window-
      // keyed string build), window-indexed clumping (cell-key join),
      // f2 pair rollup, and the three corpus diagnostics
      ("garud_h",
        d => graft.operators.PopGen.garudH(genoFromD(d), 200L, 8), Vars),
      ("dstat",
        d => graft.operators.PopGen.dStat(genoFromD(d),
          Seq(0, 1), Seq(2, 3), Seq(4, 5), Seq(6, 7)), Vars),
      ("f3stat",
        d => graft.operators.PopGen.f3Stat(genoFromD(d),
          Seq(0, 1), Seq(2, 3), Seq(4, 5)), Vars),
      ("froh",
        d => graft.operators.PopGen.frohFromDosage(d, 3L), Vars),
      ("clump_lite",
        d => graft.operators.PopGen.clumpLite(d, 200L, 0.5, 8), Vars),
      ("f2_sharing",
        d => graft.operators.PopGen.f2Sharing(
          d.withColumn("nall", lit(2)), 8), Vars),
      ("ngram_novelty",
        d => TrainingData.ngramNovelty(d, nShards = 8), Docs),
      ("lexical_profile",
        d => TrainingData.lexicalProfile(
          d.withColumn("source",
            concat(lit("s"), (col("doc_id") % 41).cast("string")))),
        Docs),
      ("token_spectrum",
        d => TrainingData.tokenSpectrum(d), Docs),
      // round-6 tenth-wave families: two-level exact quantiles, centered
      // midrank Spearman, and the LSH-banded edit-distance verifier
      ("exact_quantiles",
        d => graft.operators.WeightedMedian.exactQuantiles(
          d.select((col("doc_id") % 5).as("g"),
            length(col("text")).cast("long").as("v"), lit(1L).as("w")),
          Seq("g"), "v", "w", 64L, Seq((1, 2), (9, 10), (99, 100))),
        Docs),
      ("spearman",
        d => graft.operators.Spearman.corr(
          d.select(length(col("text")).cast("long").as("x"),
            size(split(col("text"), " ")).cast("long").as("y")),
          "x", "y", 64L, 16L), Docs),
      // triangle census: each doc id u contributes edges (u,u+1) and
      // (u,u+2) — every consecutive id closes a triangle, so truth
      // grows linearly and the probe prices the degree join + oriented
      // wedge join machinery, not the answer's size
      ("triangle_census", { d =>
        val ids = d.select(col("doc_id").as("u"))
        val edges = ids.select(col("u").as("pa"), (col("u") + 1L).as("pb"))
          .unionByName(ids.select(col("u").as("pa"),
            (col("u") + 2L).as("pb")))
        graft.operators.Graphs.triangleCensus(edges)
      }, Docs),
      // suffix-array build: 5 doubling rounds × (distinct + range
      // exchange + join) — the probe prices the distributed dense-rank
      // machinery; positions grow linearly with the corpus
      ("suffix_array", { d =>
        graft.operators.SuffixArray.build(
          d.filter(col("doc_id") % 5 === 0))
      }, Docs),
      // integer-token PageRank over the word-adjacency graph:
      // consecutive-token edges per doc, distinct — expansion suffixes
      // every token per shard, so shards are vocabulary-disjoint and
      // nodes AND edges grow exactly linearly (the right null model
      // for an iterative edge-keyed operator)
      ("pagerank", { d =>
        val toks = d.select(col("doc_id"),
          posexplode_outer(filter(split(col("text"), "\\s+"),
            t => t =!= "")).as(Seq("off", "tok")))
          .filter(col("tok").isNotNull)
        val nxt = toks.select(col("doc_id"),
          (col("off") - 1).as("off"), col("tok").as("nx"))
        val edges = toks.join(nxt, Seq("doc_id", "off"))
          .select(xxhash64(col("tok")).as("src"),
            xxhash64(col("nx")).as("dst"))
          .filter(col("src") =!= col("dst")).distinct()
        graft.operators.Graphs.pageRankInt(edges, iters = 3)
      }, Docs),
      // EHH decay over the geno cube rebuilt from the dosage vectors:
      // cores and windows grow linearly with variants (coreEvery >
      // maxExt keeps each variant in ≤ 1 core's window), so the
      // hap-vector stage must scale with the variant count
      ("ehh_decay", { d =>
        graft.operators.PopGen.ehhDecay(
          genoFromD(d).withColumn("vid", col("vid").cast("long")),
          nSamples = 8, coreEvery = 50L, maxExt = 8,
          exts = Seq(1, 2, 4, 8))
      }, Vars),
      // phasing switch error (q276's shape): explode ×S to per-
      // (sample, site) orientation rows, then ONE (s, chrom)-
      // partitioned lag window. The window partition COUNT is fixed
      // (samples × chroms) while partitions lengthen with the variant
      // count — exactly what a real cohort does — so the probe prices
      // the per-partition sort growth
      ("switch_error", { d =>
        val sites = genoFromD(d)
          .select(col("chrom"), col("pos"), col("vid"),
            posexplode(col("geno")).as(Seq("s", "sa")))
          .withColumn("a0", element_at(col("sa"), 1))
          .withColumn("a1", element_at(col("sa"), 2))
          .filter(col("a0").isNotNull && col("a1").isNotNull
            && col("a0") =!= col("a1"))
          .withColumn("o_true", col("a0") > col("a1"))
          .withColumn("o_test",
            col("o_true") =!= (col("pos") % 7 === 0))
          .select(col("s"), col("chrom"), col("pos"), col("vid"),
            col("o_true"), col("o_test"))
        graft.operators.PopGen.switchError(sites)
      }, Vars),
      // N-way variant-union merge (q298's shape): union + ONE
      // groupBy(vid) with the in-group allele fold; expansion keeps
      // vids disjoint across shards so groups (and the one exchange)
      // grow exactly linearly
      ("merge_nway", { d =>
        val v = genoFromD(d).withColumn("phased",
          array((0 until 8).map(_ => lit(false)): _*))
        def carve(m: Int, alleles: String) =
          v.filter(col("vid") % m === 0)
            .select(col("vid"), lit(alleles).as("alleles"),
              col("geno"), col("phased"))
        graft.operators.MergeVariants.mergeN(Seq(
          carve(2, "A,C,G"), carve(3, "A,G,C"), carve(5, "A,T,C")))
      }, Vars),
      ("editdist_neardup", { d =>
        import graft.functions.textfns._
        val docs = d.select(col("doc_id"), shingles(col("text"), 3).as("sh"))
          .filter(size(col("sh")) > 0)
        val bands = docs
          .select(col("doc_id"),
            minhashSignature(col("sh"), 12).as("sig"))
          .select(col("doc_id"),
            posexplode_outer(lshBands(col("sig"), 4, 3))
              .as(Seq("band", "bkey")))
        val cand = bands.as("a").join(bands.as("b"),
            col("a.band") === col("b.band")
              && col("a.bkey") === col("b.bkey")
              && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .dropDuplicates("doc_a", "doc_b")
        val texts = d.select(col("doc_id"),
          substring(col("text"), 1, 600).as("t"))
        cand
          .join(texts.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("t", "ta"), "doc_a")
          .join(texts.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("t", "tb"), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            levenshtein(col("ta"), col("tb")).cast("long").as("ed"))
      }, Docs),
      // label propagation over the SAME word-adjacency graph as the
      // pagerank probe (vocabulary-disjoint shards ⇒ nodes and edges
      // grow exactly linearly); per round one dst-keyed label join +
      // two keyed aggregates — the q318 shape
      ("label_prop", { d =>
        val toks = d.select(col("doc_id"),
          posexplode_outer(filter(split(col("text"), "\\s+"),
            t => t =!= "")).as(Seq("off", "tok")))
          .filter(col("tok").isNotNull)
        val nxt = toks.select(col("doc_id"),
          (col("off") - 1).as("off"), col("tok").as("nx"))
        val edges = toks.join(nxt, Seq("doc_id", "off"))
          .select(xxhash64(col("tok")).as("src"),
            xxhash64(col("nx")).as("dst"))
          .filter(col("src") =!= col("dst")).distinct()
        graft.operators.Graphs.labelPropagation(edges, iters = 3)
          .groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
      }, Docs),
      // allele-equality ROH runs (q312's shape): one locus aggregate +
      // gaps-and-islands over the (s, chrom) sort; like switch_error,
      // partition COUNT is fixed while partitions lengthen with the
      // variant count
      ("roh_runs", { d =>
        val sites = genoFromD(d)
          .select(col("chrom"), col("pos"), col("vid"),
            posexplode(col("geno")).as(Seq("s", "sa")))
          .withColumn("a0", element_at(col("sa"), 1))
          .withColumn("a1", element_at(col("sa"), 2))
          .filter(col("a0").isNotNull && col("a1").isNotNull)
          .select(col("s"), col("chrom"), col("pos"), col("vid"),
            (col("a0") === col("a1")).as("hom"))
        graft.operators.PopGen.rohRuns(sites, minSites = 5)
      }, Vars),
      // phase-block N50 (q332's shape): locus collapse + gaps-and-
      // islands over the (s, chrom) sort, then the per-sample N50
      // cumsum over BLOCK summaries — partition count fixed at
      // S × chroms while partitions lengthen with variants (the
      // switch_error/roh_runs sort-growth profile)
      ("phase_block_n50", { d =>
        import org.apache.spark.sql.expressions.Window
        val sites = genoFromD(d)
          .select(col("chrom"), col("pos"), col("vid"),
            posexplode(col("geno")).as(Seq("s", "sa")))
          .withColumn("ph", (col("pos") + col("s")) % 3 =!= 0)
          .select(col("s"), col("chrom"), col("pos"), col("vid"),
            col("ph"))
        val wDup = Window.partitionBy(col("s"), col("chrom"))
          .orderBy(col("pos"), col("vid"), col("ph"))
        val lkey = struct(col("pos"), col("vid"))
        val w = Window.partitionBy(col("s"), col("chrom"))
          .orderBy(col("pos"), col("vid"))
        val blocks = sites
          .withColumn("__first",
            coalesce(lag(lkey, 1).over(wDup) =!= lkey, lit(true)))
          .filter(col("__first"))
          .withColumn("__rn", row_number().over(w))
          .filter(col("ph"))
          .withColumn("__grp", col("__rn") - row_number().over(w))
          .groupBy(col("s"), col("chrom"), col("__grp"))
          .agg(count(lit(1)).as("len"))
        val wCum = Window.partitionBy(col("s"))
          .orderBy(col("len").desc, col("chrom"), col("__grp"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wTot = Window.partitionBy(col("s"))
        blocks
          .withColumn("cum", sum(col("len")).over(wCum))
          .withColumn("tot", sum(col("len")).over(wTot))
          .groupBy(col("s"))
          .agg(count(lit(1)).as("n_blocks"), max(col("len")).as("mx"),
            max(when(col("cum") * 2 >= col("tot"), col("len")))
              .as("n50"))
      }, Vars),
      // imputation dosage-r² (q333's shape): statically-unrolled exact
      // BIGINT sums as a pure projection + ONE vid-keyed merge
      // exchange; the re-called twin is a deterministic perturbation
      ("imputation_r2", { d0 =>
        val v = d0.withColumn("d2", transform(col("d"),
          x => when(x.isNull, x).otherwise(pmod(x + 1, lit(3)))))
        def dd(c: String, i: Int) = element_at(col(c), i + 1)
        def terms(f: Int => org.apache.spark.sql.Column) =
          (0 until 8).map(f).reduce(_ + _)
        val both = (i: Int) =>
          dd("d", i).isNotNull && dd("d2", i).isNotNull
        val x = (i: Int) => when(both(i), dd("d", i)).otherwise(0L)
        val y = (i: Int) => when(both(i), dd("d2", i)).otherwise(0L)
        v.select(col("vid"),
            terms(i => when(both(i), 1L).otherwise(0L)).as("n0"),
            terms(x).as("sx0"), terms(y).as("sy0"),
            terms(i => x(i) * y(i)).as("sxy0"),
            terms(i => x(i) * x(i)).as("sxx0"),
            terms(i => y(i) * y(i)).as("syy0"))
          .groupBy(col("vid"))
          .agg(sum(col("n0")).as("n"), sum(col("sx0")).as("sx"),
            sum(col("sy0")).as("sy"), sum(col("sxy0")).as("sxy"),
            sum(col("sxx0")).as("sxx"), sum(col("syy0")).as("syy"))
          .withColumn("r2", when(
            (col("n") * col("sxx") - col("sx") * col("sx")) =!= 0 &&
              (col("n") * col("syy") - col("sy") * col("sy")) =!= 0,
            ((col("n") * col("sxy") - col("sx") * col("sy"))
              * (col("n") * col("sxy") - col("sx") * col("sy")))
              .cast("double")
              / ((col("n") * col("sxx") - col("sx") * col("sx"))
                * (col("n") * col("syy") - col("sy") * col("sy")))
                .cast("double")))
      }, Vars),
      // MoM IBD (q358's shape): per-variant e-terms projected BEFORE
      // the generator pair fan, ONE (i,j) aggregate — pair-count fixed
      // (28) while variants grow, so cost must be linear in variants
      ("ibd_mom", { d =>
        graft.operators.PopGen.ibdMoM(d.select(col("vid"), col("d")), 8)
      }, Vars),
      // gram-free PCA mat-vec (pcaFromGeno's shape): k=1, 2 iterations
      // — per-iteration cost is one pass over the packed variant rows,
      // so the probe prices the distributed mat-vec's linearity
      ("pca_geno", { d =>
        val (ev, _) = graft.operators.PopGen.pcaFromGeno(
          d.select(col("vid"), col("d")), 8, k = 1, iters = 2)
        import org.apache.spark.sql.functions.lit
        d.sparkSession.range(1).select(lit(ev(0)).as("ev0"))
      }, Vars),
      // MJPEG census (q353's shape): build a real MJPG AVI per doc
      // and decode EVERY frame through ImageIO's JPEG path — the one
      // non-arithmetic per-row cost on the board; a partition-local
      // lane, so the probe prices the decoder's linearity in payload
      // count (round-9 verdict "What's missing #3")
      ("avi_mjpeg", { d =>
        import org.apache.spark.sql.{Encoders => Encs}
        val media = d.select(col("doc_id").cast("long"))
          .as(Encs.scalaLong)
          .mapPartitions(_.map { id =>
            val w = ((id % 4) * 8 + 16).toInt
            val h = ((id % 3) * 8 + 16).toInt
            val nf = (id % 6 + 2).toInt
            val frames = (0 until nf).map(f => graft.operators.Avi
              .solidJpeg(w, h, ((id * 53 + f * 17) % 256).toInt))
            graft.operators.Multimodal.MediaRow(id, "video",
              graft.operators.Avi.write(frames, w, h, 24, 1,
                "MJPG", dib = false))
          })(Encs.product[graft.operators.Multimodal.MediaRow])
        graft.operators.Multimodal.decodeMjpegAll(media).toDF()
      }, Docs),
      // MPEG-1 Layer II subband decode (q374's shape): real allocation
      // -class walk + scfsi + degrouping per doc — stateless
      // partition-local integer/bit work, must be linear in payloads
      ("mp2_decode", { d =>
        import org.apache.spark.sql.{Encoders => Encs}
        val media = d.select(col("doc_id").cast("long")).as(Encs.scalaLong)
          .mapPartitions(_.map(id =>
            graft.operators.Multimodal.MediaRow(id, "audio",
              graft.operators.MpegAudio.syntheticMp2(
                id, (id % 6 + 2).toInt))))(
            Encs.product[graft.operators.Multimodal.MediaRow])
        graft.operators.MpegAudio.decodeMp2Bands(media).toDF()
      }, Docs),
      // mixed archive-shard walk (q373's shape, pricing q365–q368's
      // lanes): per doc a real tar / zip / tgz two-member shard, read
      // back through the sniff-routed verified walks (tar checksum,
      // zip central-directory + CRC32, gzip CRC32+ISIZE). Stateless
      // partition-local byte walk — must be linear in shard count
      ("archive_walk", { d =>
        import org.apache.spark.sql.{Encoders => Encs}
        val media = d.select(col("doc_id").cast("long"), col("text"))
          .as(Encs.tuple(Encs.scalaLong, Encs.STRING))
          .mapPartitions(_.map { case (id, text) =>
            val members = Seq(
              "doc.txt" -> text.getBytes("UTF-8"),
              "meta.json" -> s"""{"id":$id}""".getBytes("UTF-8"))
            val payload = (id % 3) match {
              case 0 => graft.operators.Archives.tarWrite(members)
              case 1 => graft.operators.Archives.zipWrite(members)
              case _ => graft.operators.Gzip.gzipMember(
                graft.operators.Archives.tarWrite(members))
            }
            graft.operators.Multimodal.MediaRow(id, "archive", payload)
          })(Encs.product[graft.operators.Multimodal.MediaRow])
        graft.operators.Multimodal.archiveMembersAll(media).toDF()
      }, Docs))

    def time(fn: => DataFrame): Double = {
      // the LD family and the suffix-array span consumers share
      // session-scoped materialized stages (deliberate cross-query
      // fusion); this probe measures COMPUTE linearity, so every timed
      // run starts cold
      graft.operators.LdWindow.clearShared()
      graft.queries.TextDedup.clearSaShared()
      graft.operators.SuffixArray.clearShared()
      graft.operators.PopGen.clearEhhShared()
      TrainingData.clearDedupShared()
      TrainingData.clearKmeansShared()
      TrainingData.clearBpeShared()
      TrainingData.clearSimjoinShared()
      graft.operators.PopGen.clearRohShared()
      graft.operators.PopGen.clearSiteShared()
      graft.queries.TextDedup.clearLshShared()
      graft.queries.Merge.clearMergeShared()
      TrainingData.clearCandShared()
      val t0 = System.nanoTime()
      fn.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val opFilter = sys.env.get("SPARK_GRAFT_SCALE_OPS")
      .map(_.split(",").map(_.trim).toSet)
    val results = ops.filter(o => opFilter.forall(_.contains(o._1)))
      .map { case (name, fn, input) =>
      val (small, big) = input match {
        case Docs => (d1, dN)
        case Vecs => (v1, vN)
        case Vars => (vars1, varsN)
      }
      // min-of-2: first run pays Janino/JIT compile
      val t1 = math.min(time(fn(small)), time(fn(small)))
      val tN = math.min(time(fn(big)), time(fn(big)))
      val ratio = tN / math.max(t1, 1e-9)
      (name, t1, tN, ratio)
    }
    // linear = ratio ≈ Factor; the red line leaves 1.5× headroom for
    // fixed overheads — an O(n²) op would come back at ~Factor²
    val redLine = Factor * 1.5
    val json = results.map { case (n, t1, tN, r) =>
      f""""$n":{"base_s":$t1%.2f,"x${Factor}_s":$tN%.2f,"ratio":$r%.2f,"ok":${r < redLine}}"""
    }.mkString("{\"factor\":" + Factor + ",\"sf\":\"" + sfDir + "\",", ",", "}")
    println(json)
    val out = java.nio.file.Paths.get("target",
      if (Factor == 10) "scaleprobe.json" else s"scaleprobe_x$Factor.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bad = results.filter(_._4 >= redLine)
    if (bad.nonEmpty) {
      System.err.println(s"SUPERLINEAR: ${bad.map(_._1).mkString(",")}")
      spark.stop(); sys.exit(1)
    }
    spark.stop()
  }
}
