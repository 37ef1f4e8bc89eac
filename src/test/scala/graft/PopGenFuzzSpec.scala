package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PopGen

/** Randomized differential tests for the population-genetics estimators:
  * every statistic recomputed by an independent brute-force Scala
  * implementation on random dosage/genotype cubes (with missingness and
  * DUPLICATE vids — the testdata quirk that motivated carry columns in
  * the LD pair join). The DuckDB oracles prove Spark==SQL on the fixed
  * corpus; this proves the algebra on adversarial inputs. Deterministic
  * seeds keep failures reproducible. */
class PopGenFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def draw[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val N = 4 // samples

  private val dosGen: Gen[java.lang.Long] = Gen.frequency(
    (6, Gen.choose(0L, 2L).map(java.lang.Long.valueOf)),
    (2, Gen.const(null.asInstanceOf[java.lang.Long])))

  private val alleleGen: Gen[java.lang.Long] = Gen.frequency(
    (6, Gen.choose(0L, 2L).map(java.lang.Long.valueOf)),
    (2, Gen.const(null.asInstanceOf[java.lang.Long])))

  private def dVecGen: Gen[Seq[java.lang.Long]] = Gen.listOfN(N, dosGen)

  private case class Var(vid: Long, chrom: String, pos: Long,
    d: Seq[Option[Long]])

  private def varsGen(n: Int): Gen[Seq[Var]] = for {
    ds <- Gen.listOfN(n, dVecGen)
    chroms <- Gen.listOfN(n, Gen.oneOf("c0", "c1"))
    poss <- Gen.listOfN(n, Gen.choose(0L, 400L))
  } yield ds.zipWithIndex.map { case (d, i) =>
    // vid = i/2 → every other vid duplicated (the testdata quirk)
    Var(i / 2L, chroms(i), poss(i), d.map(Option(_).map(_.longValue)))
  }

  test("grm matches brute force on random cubes with missingness") {
    import spark.implicits._
    for (round <- 1 to 4) {
      val vs = draw(varsGen(40), 7000L + round)
      val df = vs.map(v => (v.vid, v.d.map(_.map(java.lang.Long.valueOf)
        .orNull))).toDF("vid", "d")
      val got = PopGen.grm(df, N).collect()
        .map(r => ((r.getInt(0), r.getInt(1)),
          (r.getAs[Long]("n_sites"), r.getAs[Long]("g_num"),
            r.getAs[Long]("g_den")))).toMap
      val scale = PopGen.grmScale(N)
      for (i <- 0 until N; j <- i until N) {
        var (cnt, num, den) = (0L, 0L, 0L)
        for (v <- vs) {
          val n = v.d.count(_.isDefined)
          val a = v.d.flatten.sum
          if (a > 0 && a < 2 * n && v.d(i).isDefined && v.d(j).isDefined) {
            cnt += 1
            num += (n * v.d(i).get - a) * (n * v.d(j).get - a) *
              (scale / (n.toLong * n))
            den += a * (2 * n - a) * (scale / (2L * n * n))
          }
        }
        val g = got.get((i, j))
        if (cnt == 0) assert(g.isEmpty, s"pair ($i,$j) round $round")
        else assert(g.contains((cnt, num, den)), s"pair ($i,$j) round $round")
      }
    }
  }

  test("inbreedingF and prsScore match brute force") {
    import spark.implicits._
    for (round <- 1 to 4) {
      val vs = draw(varsGen(40), 9000L + round)
      val df = vs.map(v => (v.vid, v.d.map(_.map(java.lang.Long.valueOf)
        .orNull), v.vid * 37 % 19 - 9)).toDF("vid", "d", "w")
      val scale = PopGen.hetScale(N)
      val gotF = PopGen.inbreedingF(df, N).collect()
        .map(r => r.getAs[Int]("s") ->
          (r.getAs[Long]("n_sites"), r.getAs[Long]("o_het"),
            r.getAs[Long]("e_scaled"))).toMap
      val gotP = PopGen.prsScore(df).collect()
        .map(r => r.getAs[Int]("s") ->
          (r.getAs[Long]("n_used"), r.getAs[Long]("score_num"))).toMap
      for (s <- 0 until N) {
        var (sites, ohet, esc) = (0L, 0L, 0L)
        var (used, score) = (0L, 0L)
        for (v <- vs) {
          val n = v.d.count(_.isDefined)
          val a = v.d.flatten.sum
          if (n > 0 && v.d(s).isDefined) {
            sites += 1
            if (v.d(s).get == 1) ohet += 1
            esc += a * (2 * n - a) * (scale / (n.toLong * (2L * n - 1)))
          }
          if (v.d(s).isDefined) {
            used += 1
            score += (v.vid * 37 % 19 - 9) * v.d(s).get
          }
        }
        if (sites == 0) assert(!gotF.contains(s))
        else assert(gotF(s) == ((sites, ohet, esc)), s"s=$s round $round")
        if (used == 0) assert(!gotP.contains(s))
        else assert(gotP(s) == ((used, score)), s"s=$s round $round")
      }
    }
  }

  test("trendTest and hudsonFst match brute force") {
    import spark.implicits._
    val pheno = Seq(false, true, true, false)
    for (round <- 1 to 4) {
      val vs = draw(varsGen(40), 11000L + round)
      // geno cube for Fst: rebuild diploid calls whose collapsed dosage
      // is independent — draw alleles directly instead
      val genos = (1 to 40).map(i =>
        draw(Gen.listOfN(N, Gen.listOfN(2, alleleGen)), 12000L * round + i))
      val gdf = genos.zipWithIndex
        .map { case (g, i) => (i.toLong, g.map(_.toSeq).toSeq) }
        .toDF("vid", "geno")
      val gotFst = PopGen.hudsonFst(gdf, Seq(0, 1), Seq(2, 3))
        .collect().map(r => r.getAs[Long]("vid") ->
          (r.getAs[Long]("n1"), r.getAs[Long]("a1"),
            r.getAs[Long]("n2"), r.getAs[Long]("a2"))).toMap
      for ((g, i) <- genos.zipWithIndex) {
        def cnt(ss: Seq[Int]) = {
          val alleles = ss.flatMap(s => g(s))
          (alleles.count(_ != null).toLong,
            alleles.count(a => a != null && a != 0L).toLong)
        }
        val (n1, a1) = cnt(Seq(0, 1)); val (n2, a2) = cnt(Seq(2, 3))
        assert(gotFst(i.toLong) == ((n1, a1, n2, a2)), s"vid=$i round $round")
      }
      val ddf = vs.map(v => (v.vid, v.d.map(_.map(java.lang.Long.valueOf)
        .orNull))).toDF("vid", "d")
      val gotT = PopGen.trendTest(ddf, pheno).collect()
        .map(r => (r.getAs[Long]("vid"), r.getAs[Long]("sx"),
          r.getAs[Long]("sx_case"), r.getAs[Long]("n"), r.getAs[Long]("r")))
        .toSet
      val expT = vs.map { v =>
        val called = v.d.zipWithIndex.filter(_._1.isDefined)
        (v.vid, v.d.flatten.sum,
          called.filter(c => pheno(c._2)).map(_._1.get).sum,
          called.size.toLong,
          called.count(c => pheno(c._2)).toLong)
      }.toSet
      assert(gotT == expT, s"round $round")
    }
  }

  test("cmhTest matches brute force") {
    import spark.implicits._
    val pheno = Seq(false, true, true, false)
    val strata = Seq(Seq(0, 1), Seq(2, 3))
    for (round <- 1 to 4) {
      val vs = draw(varsGen(40), 15000L + round)
      val df = vs.map(v => (v.vid, v.d.map(_.map(java.lang.Long.valueOf)
        .orNull))).toDF("vid", "d")
      val got = PopGen.cmhTest(df, pheno, strata).collect()
        .map(r => (r.getAs[Long]("vid"), r.getAs[Long]("u_scaled"),
          r.getAs[Long]("v_scaled"))).toSet
      val exp = vs.map { v =>
        var (u, vv) = (0L, 0L)
        for (ss <- strata) {
          val n1 = ss.count(s => v.d(s).isDefined && pheno(s)).toLong
          val n2 = ss.count(s => v.d(s).isDefined && !pheno(s)).toLong
          val m1 = ss.count(s => v.d(s).exists(_ > 0)).toLong
          val m2 = ss.count(s => v.d(s).contains(0L)).toLong
          val a = ss.count(s => v.d(s).exists(_ > 0) && pheno(s)).toLong
          val n = n1 + n2
          if (n > 0) u += a * 2 - n1 * m1 * (2 / n)
          if (n > 1) vv += n1 * n2 * m1 * m2 * (4 / (n * n * (n - 1)))
        }
        (v.vid, u, vv)
      }.toSet
      assert(got == exp, s"round $round")
    }
  }

  test("dStat and f3Stat match double brute force (dyadic-exact regime)") {
    import spark.implicits._
    // single-sample groups ⇒ every per-site frequency is a multiple of
    // 1/2, so the brute-force double arithmetic is EXACT and the
    // comparison against the lcm-scaled integer lane is equality-tight
    for (round <- 1 to 4) {
      val genos = (1 to 60).map(i =>
        draw(Gen.listOfN(N, Gen.listOfN(2, alleleGen)), 15000L * round + i))
      val chroms = (1 to 60).map(i => if (i % 3 == 0) "c1" else "c0")
      val gdf = genos.zip(chroms)
        .map { case (g, c) => (c, g.map(_.toSeq).toSeq) }
        .toDF("chrom", "geno")
      def cnt(g: Seq[Seq[java.lang.Long]], s: Int): (Long, Long) =
        (g(s).count(_ != null).toLong,
          g(s).count(a => a != null && a != 0L).toLong)

      val gotD = PopGen.dStat(gdf, Seq(0), Seq(1), Seq(2), Seq(3))
        .collect().map(r => r.getAs[String]("chrom") ->
          (r.getAs[Long]("n_sites"),
            Option(r.getAs[Any]("d_stat")).map(_.asInstanceOf[Double])))
        .toMap
      for (c <- Seq("c0", "c1")) {
        var (ns, abba, baba) = (0L, 0.0, 0.0)
        for ((g, i) <- genos.zipWithIndex if chroms(i) == c) {
          val p = (0 until 4).map { s =>
            val (n, a) = cnt(g, s)
            if (n >= 1) Some(a.toDouble / n) else None
          }
          if (p.forall(_.isDefined)) {
            val Seq(p1, p2, p3, p4) = p.map(_.get)
            ns += 1
            abba += (1 - p1) * p2 * p3 * (1 - p4)
            baba += p1 * (1 - p2) * p3 * (1 - p4)
          }
        }
        if (ns == 0) assert(!gotD.contains(c), s"dStat chrom $c round $round")
        else {
          val (gn, gd) = gotD(c)
          assert(gn == ns, s"dStat n_sites chrom $c round $round")
          if (abba + baba == 0.0)
            assert(gd.isEmpty, s"chrom $c round $round")
          else assert(math.abs(gd.get - (abba - baba) / (abba + baba))
            < 1e-12, s"dStat chrom $c round $round")
        }
      }

      val gotF = PopGen.f3Stat(gdf, Seq(0), Seq(1), Seq(2))
        .collect().map(r => r.getAs[String]("chrom") ->
          (r.getAs[Long]("n_sites"), r.getAs[Double]("f3"))).toMap
      for (c <- Seq("c0", "c1")) {
        var (ns, sum) = (0L, 0.0)
        for ((g, i) <- genos.zipWithIndex if chroms(i) == c) {
          val (nc, xc) = cnt(g, 0)
          val (na, xa) = cnt(g, 1)
          val (nb, xb) = cnt(g, 2)
          if (nc >= 2 && na >= 1 && nb >= 1) {
            ns += 1
            val pc = xc.toDouble / nc
            val pa = xa.toDouble / na
            val pb = xb.toDouble / nb
            sum += (pc - pa) * (pc - pb) -
              xc * (nc - xc).toDouble / (nc.toDouble * nc * (nc - 1))
          }
        }
        if (ns == 0) assert(!gotF.contains(c), s"f3 chrom $c round $round")
        else {
          val (gn, gf) = gotF(c)
          assert(gn == ns, s"f3 n_sites chrom $c round $round")
          assert(math.abs(gf - sum / ns) < 1e-12,
            s"f3 chrom $c round $round")
        }
      }
    }
  }

  test("ldPrune matches brute force, duplicate vids included") {
    import spark.implicits._
    for (round <- 1 to 4) {
      val vs = draw(varsGen(30), 13000L + round)
      val df = vs.map(v => (v.vid, v.chrom, v.pos,
        v.d.map(_.map(java.lang.Long.valueOf).orNull)))
        .toDF("vid", "chrom", "pos", "d")
      val window = 100L
      val got = PopGen.ldPrune(df, window, 0.5, N)
        .select("vid", "pos").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // brute force over ROWS (vid is not unique)
      def maf(v: Var): Double = {
        val n = v.d.count(_.isDefined); val a = v.d.flatten.sum
        if (n > 0) math.min(a, 2L * n - a).toDouble / (2L * n) else 0.0
      }
      def r2(x: Var, y: Var): Option[Double] = {
        val obs = x.d.zip(y.d).collect {
          case (Some(p), Some(q)) => (p, q) }
        val n = obs.size.toLong
        val sx = obs.map(_._1).sum; val sy = obs.map(_._2).sum
        val sxy = obs.map(o => o._1 * o._2).sum
        val sxx = obs.map(o => o._1 * o._1).sum
        val syy = obs.map(o => o._2 * o._2).sum
        val cov = n * sxy - sx * sy
        val vx = n * sxx - sx * sx; val vy = n * syy - sy * sy
        if (vx > 0 && vy > 0)
          Some((cov.toDouble * cov.toDouble) / (vx.toDouble * vy.toDouble))
        else None
      }
      val victims = (for {
        a <- vs; b <- vs
        if a.chrom == b.chrom
        if a.pos < b.pos || (a.pos == b.pos && a.vid < b.vid)
        if b.pos - a.pos <= window
        r <- r2(a, b) if r >= 0.5
      } yield {
        val (ma, mb) = (maf(a), maf(b))
        if (ma < mb) a.vid else if (mb < ma) b.vid else math.max(a.vid, b.vid)
      }).toSet
      val exp = vs.filterNot(v => victims.contains(v.vid))
        .map(v => (v.vid, v.pos)).sorted
      assert(got == exp, s"round $round")
    }
  }

  test("fuLiWindow matches brute force (exact counts, bitwise doubles)") {
    import spark.implicits._
    val win = 100L
    val nAll = 2 * N
    val scale = PopGen.piScale(nAll)
    val (an, uD, vD, uF, vF) = PopGen.fuLiConstants(nAll)
    val r = nAll.toDouble / (nAll - 1.0)
    val fr = (nAll - 1.0) / nAll.toDouble
    for (round <- 1 to 4) {
      val vs = draw(varsGen(40), 9100L + round)
      // genotype cube: sample called (two alleles from its dosage) or
      // fully missing — exactly the shapes the operator sees
      val rows = vs.map { v =>
        val geno = v.d.map {
          case Some(d) => Seq(java.lang.Long.valueOf(if (d >= 1) 1L else 0L),
            java.lang.Long.valueOf(if (d >= 2) 1L else 0L))
          case None => Seq(null.asInstanceOf[java.lang.Long],
            null.asInstanceOf[java.lang.Long])
        }
        (v.vid, v.chrom, v.pos, geno)
      }
      val got = PopGen.fuLiWindow(
        rows.toDF("vid", "chrom", "pos", "geno"), 0 until N, win)
        .collect()
        .map(x => (x.getString(0), x.getLong(1)) ->
          (x.getAs[Long]("s_seg"), x.getAs[Long]("eta_s"),
            x.getAs[Long]("pi_num"),
            Option(x.getAs[java.lang.Double]("d_star")),
            Option(x.getAs[java.lang.Double]("f_star"))))
        .toMap
      // brute replay
      val perSite = vs.map { v =>
        val alleles = v.d.flatMap {
          case Some(d) => Seq(if (d >= 1) 1L else 0L,
            if (d >= 2) 1L else 0L)
          case None => Nil
        }
        val m = alleles.size.toLong
        val a = alleles.count(_ != 0L).toLong
        (v.chrom, v.pos / win, m, a)
      }.filter(_._3 >= 2)
      val exp = perSite.groupBy(t => (t._1, t._2)).map { case (k, ss) =>
        val s = ss.count(t => t._4 > 0 && t._4 < t._3).toLong
        val eta = ss.count(t =>
          (t._4 == 1 || t._4 == t._3 - 1) && t._4 > 0 && t._4 < t._3)
          .toLong
        val piNum = ss.map(t => t._4 * (t._3 - t._4) *
          (if (t._3 >= 2) 2L * scale / (t._3 * (t._3 - 1)) else 0L)).sum
        val pi = piNum.toDouble / scale.toDouble
        val sD = s.toDouble; val eD = eta.toDouble
        val dStar = if (s > 0) Some((r * sD - an * eD) /
          math.sqrt(uD * sD + vD * (sD * sD))) else None
        val fStar = if (s > 0) Some((pi - fr * eD) /
          math.sqrt(uF * sD + vF * (sD * sD))) else None
        k -> ((s, eta, piNum, dStar, fStar))
      }
      assert(got.keySet == exp.keySet, s"round $round windows")
      for ((k, e) <- exp)
        assert(got(k) == e, s"round $round window $k: ${got(k)} vs $e")
    }
  }
}
