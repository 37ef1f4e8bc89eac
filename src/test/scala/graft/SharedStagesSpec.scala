package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TrainingData

/** Round-11 shared-stage specs: the session-scoped materializations the
  * optimization round added (trained k-means quantizer, BPE merge list,
  * ROH run substrate, CEU pair stage) must (a) return byte-identical
  * results to the uncached builders and (b) actually share — second
  * semantically-identical call is a telemetry hit, different key a miss.
  */
class SharedStagesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("kmeansShared == kmeansTrain, and same-key callers share") {
    import spark.implicits._
    val vecs = (0 until 64).map(i =>
      (i.toLong, Seq.tabulate(4)(j => ((i * 7 + j * 3) % 11).toLong)))
      .toDF("vec_id", "qv")
    TrainingData.clearKmeansShared()
    val (h0, m0) = TrainingData.kmeansSharedTelemetry
    val direct = TrainingData.kmeansTrain(vecs, 4, 2)
      .orderBy("vec_id").collect().map(_.toString).toSeq
    val shared1 = TrainingData.kmeansShared(vecs, 4, 2)
    val got1 = shared1.orderBy("vec_id").collect()
      .map(_.toString).toSeq
    assert(got1 == direct, "shared stage must equal the direct build")
    // a SEMANTICALLY identical but separately-constructed input plan
    // must hit (canonicalized-plan keying)
    val vecs2 = (0 until 64).map(i =>
      (i.toLong, Seq.tabulate(4)(j => ((i * 7 + j * 3) % 11).toLong)))
      .toDF("vec_id", "qv")
    val shared2 = TrainingData.kmeansShared(vecs2, 4, 2)
    assert(shared2 eq shared1, "same key must return the same handle")
    val (h1, m1) = TrainingData.kmeansSharedTelemetry
    assert(h1 - h0 == 1 && m1 - m0 == 1,
      s"expected 1 hit / 1 miss, got ${h1 - h0} / ${m1 - m0}")
    // different params = different key = a build, not a hit
    val shared3 = TrainingData.kmeansShared(vecs, 4, 1)
    assert(!(shared3 eq shared1))
    val (h2, m2) = TrainingData.kmeansSharedTelemetry
    assert(h2 == h1 && m2 - m1 == 1)
    TrainingData.clearKmeansShared()
  }

  test("bpeMergesShared == bpeTrain trajectory, and same-key callers " +
      "share") {
    import spark.implicits._
    val docs = Seq((1L, "the cat sat on the mat"),
      (2L, "the cat ate the rat"), (3L, "a cat and a mat"))
      .toDF("doc_id", "text")
    TrainingData.clearBpeShared()
    val direct = TrainingData.bpeTrain(docs, nMerges = 3)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val shared = TrainingData.bpeMergesShared(docs, nMerges = 3)
    assert(shared == direct,
      "shared merge trajectory must equal the direct training loop")
    val (h0, m0) = TrainingData.bpeSharedTelemetry
    val docs2 = Seq((1L, "the cat sat on the mat"),
      (2L, "the cat ate the rat"), (3L, "a cat and a mat"))
      .toDF("doc_id", "text")
    val again = TrainingData.bpeMergesShared(docs2, nMerges = 3)
    assert(again == shared)
    val (h1, m1) = TrainingData.bpeSharedTelemetry
    assert(h1 - h0 == 1 && m1 == m0, "second caller must be a hit")
    TrainingData.clearBpeShared()
  }

  test("homRunRows shared substrate: run ids match a hand-checked " +
      "trajectory and same-key callers share") {
    import graft.operators.PopGen
    import spark.implicits._
    // two samples: s0 = hom, hom, het, hom (runs {1,2}, {4});
    // s1 = missing, hom, hom, hom (one run {2,3,4})
    val v = Seq(
      (1L, "c0", 10L, Seq(Some(0L), None)),
      (2L, "c0", 20L, Seq(Some(2L), Some(0L))),
      (3L, "c0", 30L, Seq(Some(1L), Some(2L))),
      (4L, "c0", 40L, Seq(Some(0L), Some(2L))))
      .toDF("vid", "chrom", "pos", "d")
    PopGen.clearRohShared()
    val rows = PopGen.homRunRows(v)
      .select("s", "pos", "hom", "rid")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        r.getBoolean(2), r.getLong(3))).toSet
    assert(rows == Set(
      (0, 10L, true, 1L), (0, 20L, true, 1L), (0, 30L, false, 1L),
      (0, 40L, true, 2L),
      (1, 10L, false, 0L), (1, 20L, true, 1L), (1, 30L, true, 1L),
      (1, 40L, true, 1L)), rows.toString)
    val (h0, m0) = PopGen.rohSharedTelemetry
    val v2 = Seq(
      (1L, "c0", 10L, Seq(Some(0L), None)),
      (2L, "c0", 20L, Seq(Some(2L), Some(0L))),
      (3L, "c0", 30L, Seq(Some(1L), Some(2L))),
      (4L, "c0", 40L, Seq(Some(0L), Some(2L))))
      .toDF("vid", "chrom", "pos", "d")
    PopGen.homRunRows(v2)
    val (h1, m1) = PopGen.rohSharedTelemetry
    assert(h1 - h0 == 1 && m1 == m0,
      "semantically identical input must be a cache hit")
    PopGen.clearRohShared()
  }

  test("sampleQcPacked kernel: CODEGEN_ONLY == NO_CODEGEN == the HOF " +
      "singleton-set original on seeded random cubes (differential)") {
    import graft.functions.genetics._
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(20261117L)
    val rows = (0 until 300).map { i =>
      val geno = Seq.fill(8)(Seq.fill(2)(
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextInt(4).toLong)))
      (i.toLong, geno)
    }
    val df = rows.toDF("vid", "geno")
    // the q143 original, replayed verbatim as the reference
    val fl = flatten(col("geno"))
    val singletons = filter(array_distinct(fl), a =>
      a.isNotNull && a > 0 && size(filter(fl, x => x === a)) === 1)
    def sing(a: org.apache.spark.sql.Column) = when(a.isNotNull &&
      array_contains(col("ss"), a), 1L).otherwise(0L)
    val ref = df.select(col("vid"), col("geno"), singletons.as("ss"),
        explode(sequence(lit(0), lit(7))).as("smp"))
      .select(col("vid"), col("smp"), col("ss"),
        element_at(element_at(col("geno"), col("smp") + 1), 1).as("a1"),
        element_at(element_at(col("geno"), col("smp") + 1), 2).as("a2"))
      .select(col("vid"), col("smp"),
        (col("a1").isNotNull && col("a2").isNotNull).as("called"),
        (col("a1").isNotNull && col("a2").isNotNull &&
          col("a1") =!= col("a2")).as("het"),
        (sing(col("a1")) + sing(col("a2"))).as("sing"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getLong(4))))
      .toMap
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val got = df.select(col("vid"),
            posexplode_outer(sampleQcPacked(col("geno")))
              .as(Seq("smp", "p")))
          .collect().map(r => (r.getLong(0), r.getInt(1)) -> {
            val p = r.getLong(2)
            ((p & 1L) == 1L, ((p >> 1) & 1L) == 1L, p >> 2)
          }).toMap
        assert(got == ref, s"mode=$mode")
      } finally spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
