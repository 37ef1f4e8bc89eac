package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Whole-query codegen gate: the kernel-heavy queries must EXECUTE with
  * interpreted fallback disabled. `CodegenCompileSpec` compiles each
  * expression in isolation; this catches composition-level failures —
  * a kernel that compiles alone but generates unparseable code inside a
  * WholeStageCodegen subtree (split functions, fresh-name collisions,
  * double stripMargin over fused fragments) would otherwise degrade
  * production runs to interpreted eval without failing anything. */
class CodegenOnlyQuerySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  // one query per kernel family, in its real composition
  private val kernelQueries = Seq(
    "q29_merge_remap", // allele_union + remap_geno in the merge pipeline
    "q33_minhash_lsh", // word_shingles + minhash_sig + band join
    "q37_ann_lsh", // srp_bucket multi-table signatures
    "q57_fmt_roundtrip", // sample_cells (variadic) + parse_gt_cells
    "q58_gds_packed_af", // geno_stats_packed off GDS bit-planes
    "q62_dedup_pipeline", // fingerprint + shingles + minhash composed
    "q68_ngram_jaccard", // shingles under posexplode-of-slice + self-join
    "q69_winnow_fp", // winnow_fps rolling-hash kernel
    "q70_simhash_neardup", // simhash16 inside the band self-join
    "q86_c4_line_clean", // c4_clean_lines line-scan kernel
    "q142_cdc_chunks", // cdc_chunks rolling-hash chunker in the dedup join
    "q105_pq_adc", // pq_encode + pq_adc + l2_i64 in the ADC scan
    "q108_ld_r2") // ld_pair_stats inside the banded LD join

  test("kernel queries execute with codegen fallback disabled") {
    val conf = spark.conf
    val oldFallback = conf.get("spark.sql.codegen.fallback", "true")
    val oldFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    conf.set("spark.sql.codegen.fallback", "false")
    conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      for (q <- kernelQueries) {
        // noop sink (Bench's trick): count() would let Catalyst prune
        // the computed projections and skip the kernels entirely
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    } finally {
      conf.set("spark.sql.codegen.fallback", oldFallback)
      conf.set("spark.sql.codegen.factoryMode", oldFactory)
    }
  }
}
