package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.genetics._
import graft.functions.textfns._

/** Property-based differential tests: random genotype cubes and documents
  * through BOTH the codegen kernels and their declarative HOF oracles —
  * the randomized differential strategy of the reference's test suite
  * (inst/unitTests/test_func.R:92-283) aimed at the custom expressions.
  * Deterministic seeds keep failures reproducible. */
class KernelPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def draw[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val alleleGen: Gen[java.lang.Long] = Gen.frequency(
    (6, Gen.choose(0L, 3L).map(java.lang.Long.valueOf)),
    (2, Gen.const(null.asInstanceOf[java.lang.Long])))

  private def cubeGen(ploidy: Gen[Int]): Gen[Seq[Seq[java.lang.Long]]] = for {
    nSamples <- Gen.choose(1, 6)
    p <- ploidy
    cube <- Gen.listOfN(nSamples, Gen.listOfN(p, alleleGen))
  } yield cube.map(_.toSeq).toSeq

  test("genotype kernels agree with HOF oracles on random cubes") {
    import spark.implicits._
    for (round <- 1 to 6) {
      val cubes = (1 to 50).map(i =>
        draw(cubeGen(Gen.choose(1, 3)), round * 1000L + i))
      val df = cubes.zipWithIndex.map { case (g, i) =>
        (i.toLong, g, g.indices.map(_ % 2 == 0)) }
        .toDF("vid", "geno", "phased")
      val bad = df.select(
          nCalledAlleles(col("geno")).as("a1"),
          nCalledAllelesHof(col("geno")).cast("long").as("b1"),
          alleleCount(col("geno"), lit(1)).as("a2"),
          alleleCountHof(col("geno"), lit(1)).cast("long").as("b2"),
          dosageAlt(col("geno")).as("a3"),
          dosageAltHof(col("geno")).cast("array<long>").as("b3"),
          gtStrings(col("geno"), col("phased"), ";").as("a4"),
          gtStringsHof(col("geno"), col("phased"), ";").as("b4"))
        .filter(col("a1") =!= col("b1") || col("a2") =!= col("b2") ||
          !(col("a3") === col("b3")) || col("a4") =!= col("b4"))
        .count()
      assert(bad == 0, s"round=$round")
    }
  }

  test("2-bit codec: unpack∘pack == ref dosage on random diploid cubes") {
    import spark.implicits._
    for (round <- 1 to 6) {
      val cubes = (1 to 50).map(i =>
        draw(cubeGen(Gen.const(2)), 7000L * round + i))
      val df = cubes.zipWithIndex.map { case (g, i) => (i.toLong, g) }
        .toDF("vid", "geno")
      val bad = df.select(
          unpack2b(pack2b(col("geno")), size(col("geno"))).as("up"),
          dosageRef(col("geno")).cast("array<int>").as("dr"))
        .filter(!(col("up") === col("dr"))).count()
      assert(bad == 0, s"round=$round")
    }
  }

  test("code_count_packed == unpack-and-count on random diploid cubes") {
    import spark.implicits._
    for (round <- 1 to 4) {
      val cubes = (1 to 50).map(i =>
        draw(cubeGen(Gen.const(2)), 9100L * round + i))
      val df = cubes.zipWithIndex.map { case (g, i) => (i.toLong, g) }
        .toDF("vid", "geno")
        .select(pack2b(col("geno")).as("pg"), size(col("geno")).as("n"))
      // the kernel's 4 class counts vs counting the HOF-unpacked codes
      // (null = missing = code 3); widths here exercise the partial-byte
      // tail path the per-byte tables skip
      val bad = df.select((0 to 3).map { c =>
          (codeCountPacked(col("pg"), col("n"), c) =!=
            size(filter(unpack2b(col("pg"), col("n")), x =>
              if (c == 3) x.isNull else x === c))).as(s"bad$c")
        }: _*)
        .filter((0 to 3).map(c => col(s"bad$c")).reduce(_ || _)).count()
      assert(bad == 0, s"round=$round")
    }
  }

  test("round-4 kernels agree with HOF oracles on random inputs") {
    import spark.implicits._
    import graft.functions.vectorfns.{srpBucket, srpBucketHof}
    // sample_cells: arbitrary ragged cubes + a per-sample field column
    for (round <- 1 to 4) {
      val cubes = (1 to 40).map(i =>
        draw(cubeGen(Gen.choose(1, 3)), 11000L * round + i))
      val df = cubes.zipWithIndex.map { case (g, i) =>
        (i.toLong, g, g.indices.map(_ % 2 == 0),
          g.indices.map(s => if ((i + s) % 4 == 0) null else s"f$s"))
      }.toDF("vid", "geno", "phased", "fld")
      val gtArr = split(gtStrings(col("geno"), col("phased"), "\t"), "\t")
      val oracle = array_join(
        transform(sequence(lit(1), size(col("geno"))), i =>
          concat(element_at(gtArr, i), lit(":"),
            coalesce(element_at(col("fld"), i), lit(".")))), "\t")
      val bad = df.select(
          sampleCells(col("geno"), col("phased"), "\t",
            Seq(col("fld"))).as("a"),
          oracle.as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(bad == 0, s"sample_cells round=$round")
    }
    // srp_bucket: random null-free quantized vectors (non-empty — the
    // HOF oracle's sequence(1, size) steps backwards on size 0), all 4
    // tables
    val vecGen = Gen.choose(1, 80).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1000L, 1000L)))
    for (round <- 1 to 4) {
      val vecs = (1 to 60).map(i => draw(vecGen, 13000L * round + i))
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "qv")
      val bad = df.select(
          (0 until 4).map(t => (srpBucket(col("qv"), 16, t) =!=
            srpBucketHof(col("qv"), 16, t)).as(s"d$t")): _*)
        .filter((0 until 4).map(t => col(s"d$t")).reduce(_ || _)).count()
      assert(bad == 0, s"srp round=$round")
    }
    // minhash_sig: random shingle sets incl. empty
    val shingleGen = Gen.choose(0, 25).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("a b c", "b c d", "x y z", "q w e", "spark sql x")))
    for (round <- 1 to 4) {
      val sets = (1 to 60).map(i => draw(shingleGen, 17000L * round + i))
      val df = sets.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "sh")
      val bad = df.select(
          minhashSignature(col("sh"), 8).as("a"),
          minhashSignatureHof(col("sh"), 8).as("b"))
        .filter(!(col("a") === col("b"))).count()
      assert(bad == 0, s"minhash round=$round")
    }
  }

  test("text kernels agree with HOF oracles on random token soup") {
    import spark.implicits._
    val word = Gen.oneOf("spark", "sort", "a", "b", "xy", "zq", "data")
    val textGen = Gen.choose(0, 30)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    for (round <- 1 to 6) {
      val texts = (1 to 60).map(i => draw(textGen, 9000L * round + i))
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val bad = df.select(
          shingles(col("text"), 3).as("a1"),
          wordShingles(tokens(col("text")), 3).as("b1"),
          simhash16Text(col("text")).as("a2"),
          simhash16(tokens(col("text"))).as("b2"))
        .filter(!(col("a1") === col("b1")) || col("a2") =!= col("b2"))
        .count()
      assert(bad == 0, s"round=$round")
    }
  }

  test("similarityJoin == brute force on random tiny-vocab corpora") {
    import spark.implicits._
    // a 6-word vocabulary maximizes shingle collisions — the adversarial
    // case for the prefix/position/length filters; thresholds cover a
    // double BELOW its rational (0.6), exact (0.5), and ABOVE (0.8 —
    // the case where an unguarded ceil over-prunes)
    val word = Gen.oneOf("a", "b", "c", "d", "e", "f")
    val docGen = Gen.choose(5, 14).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    for ((threshold, round) <- Seq(0.5, 0.6, 0.8).zipWithIndex) {
      // 25 random bases + a near-duplicate of each (one word appended /
      // first word dropped) so every threshold, 0.8 included, has true
      // pairs to miss — without them the lossless check is vacuous
      val bases = (1 to 25).map(i => draw(docGen, 17000L * (round + 1) + i))
      val texts = bases ++ bases.zipWithIndex.map { case (t, i) =>
        if (i % 2 == 0) t + " " + draw(word, 900L * round + i)
        else t.split(" ").drop(1).mkString(" ")
      }
      val docs = texts.zipWithIndex
        .map { case (t, i) => (f"d$i%03d", t) }.toDF("doc_id", "text")
      val got = graft.pipeline.TrainingData
        .similarityJoin(docs, threshold = threshold)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val sh = docs.select(col("doc_id"), shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      val want = sh.as("a").join(sh.as("b"),
          col("a.doc_id") < col("b.doc_id"))
        .filter(jaccard(col("a.sh"), col("b.sh")) >= threshold)
        .select(col("a.doc_id"), col("b.doc_id")).collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == want,
        s"threshold=$threshold missed=${want -- got} extra=${got -- want}")
    }
  }

  test("similarityJoin golden: 0.8-threshold prefix boundary pair") {
    import spark.implicits._
    // base = 12 distinct words (10 distinct shingles); variant drops the
    // first two words (8 shared shingles; jac = 8/10 = exactly 0.8).
    // The two base-only shingles have df=1 and fill the head of base's
    // rarest-first order, so the pair survives ONLY through the last
    // prefix slot and the position/length filters at their exact
    // bounds — the adversarial boundary for every pruning filter at a
    // threshold whose double sits above its rational value.
    val words = (1 to 12).map(i => f"t$i%02d")
    val docs = Seq(
      ("a", words.mkString(" ")),
      ("b", words.drop(2).mkString(" "))).toDF("doc_id", "text")
    val got = graft.pipeline.TrainingData
      .similarityJoin(docs, threshold = 0.8).collect()
    assert(got.length == 1, s"expected the boundary pair, got ${got.toSeq}")
    assert(got(0).getString(0) == "a" && got(0).getString(1) == "b")
    assert(math.abs(got(0).getDouble(2) - 0.8) < 1e-12)
  }

  test("PQ/LD kernels agree with HOF oracles on random vectors") {
    import spark.implicits._
    import graft.functions.vectorfns._
    // l2 + pq: null-free vectors (the pipeline never produces null
    // components; the HOF twins propagate nulls differently by design)
    val m = 3; val dsub = 2
    val dimGen = Gen.choose(-50L, 50L)
    val vecGen = Gen.listOfN(m * dsub, dimGen)
    val cbGen = Gen.choose(1, 5).flatMap(k => Gen.listOfN(k, vecGen))
    for (round <- 1 to 4) {
      val rows = (1 to 60).map { i =>
        (i.toLong, draw(vecGen, 21000L * round + i),
          draw(vecGen, 22000L * round + i),
          draw(cbGen, 23000L * round + i))
      }
      val df = rows.toDF("id", "va", "vb", "cbs")
      val bad = df.select(
          l2Long(col("va"), col("vb")).as("a1"),
          l2LongHof(col("va"), col("vb")).as("b1"),
          pqEncode(col("va"), col("cbs"), m, dsub).as("a2"),
          pqEncodeHof(col("va"), col("cbs"), m, dsub).as("b2"))
        .filter(col("a1") =!= col("b1") || !(col("a2") === col("b2")))
        .count()
      assert(bad == 0, s"pq round=$round")
    }
    // adc: per-row distance tables + in-range codes
    val dtabGen = Gen.listOfN(m, Gen.choose(2, 4).flatMap(k =>
      Gen.listOfN(k, Gen.choose(0L, 1000L))))
    for (round <- 1 to 4) {
      val rows = (1 to 60).map { i =>
        val dtab = draw(dtabGen, 31000L * round + i)
        val codes = dtab.zipWithIndex.map { case (r, j) =>
          (i + j) % r.length }
        (i.toLong, dtab, codes)
      }
      val df = rows.toDF("id", "dtab", "codes")
      val bad = df.select(
          pqAdc(col("dtab"), col("codes")).as("a"),
          pqAdcHof(col("dtab"), col("codes")).as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(bad == 0, s"adc round=$round")
    }
    // ld_pair_stats: nullable dosage-like vectors (the kernel's whole
    // point is the both-non-null pairwise-complete rule)
    val dGen: Gen[java.lang.Long] = Gen.frequency(
      (5, Gen.choose(0L, 2L).map(java.lang.Long.valueOf)),
      (2, Gen.const(null.asInstanceOf[java.lang.Long])))
    val dvGen = Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, dGen))
    for (round <- 1 to 4) {
      val rows = (1 to 60).map { i =>
        (i.toLong, draw(dvGen, 41000L * round + i).toSeq,
          draw(dvGen, 42000L * round + i).toSeq)
      }
      val df = rows.toDF("id", "da", "db")
      val bad = df.select(
          ldPairStats(col("da"), col("db")).as("a"),
          ldPairStatsHof(col("da"), col("db")).as("b"))
        .filter(!(col("a") === col("b"))).count()
      assert(bad == 0, s"ld round=$round")
    }
  }

  test("cdc_chunks kernel agrees with its HOF oracle on random ASCII") {
    import spark.implicits._
    // same ASCII regime as the winnow test; small d forces many cuts,
    // lengths straddle both the empty-text and the n<k single-chunk edges
    val charGen = Gen.choose(32, 126).map(_.toChar)
    val textGen = Gen.choose(0, 40)
      .flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    for (round <- 1 to 6) {
      val texts = (1 to 80).map(i => draw(textGen, 15000L * round + i))
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val bad = df.select(
          cdcChunks(col("text"), 8, 4).as("a"),
          cdcChunksHof(col("text"), 8, 4).as("b"))
        .filter(!(col("a") === col("b")))
        .count()
      assert(bad == 0, s"cdc round=$round")
    }
  }

  test("winnow_fps kernel agrees with its HOF oracle on random ASCII") {
    import spark.implicits._
    // printable ASCII (the HOF twin indexes UTF-16 chars; the kernel walks
    // code points — identical off the supplementary planes, and the corpus
    // is ASCII); lengths straddle the k+w-1 empty-result boundary
    val charGen = Gen.choose(32, 126).map(_.toChar)
    val textGen = Gen.choose(0, 40)
      .flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    for (round <- 1 to 6) {
      val texts = (1 to 80).map(i => draw(textGen, 13000L * round + i))
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val bad = df.select(
          winnowFps(col("text"), 8, 4).as("a"),
          winnowFpsHof(col("text"), 8, 4).as("b"))
        .filter(!(col("a") === col("b")))
        .count()
      assert(bad == 0, s"winnow round=$round")
    }
  }
}
