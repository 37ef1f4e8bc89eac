package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TrainingData

/** Randomized differential tests for the round-5 pipeline operators:
  * each recomputed by an independent brute-force Scala implementation on
  * random corpora (short docs, duplicates, near-dups, empty docs). The
  * DuckDB oracles prove Spark==SQL on the fixed corpus; this proves the
  * algebra on adversarial inputs. Deterministic seeds. */
class PipelineFuzzSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def draw[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // small vocab → plenty of shared tokens/chunks across docs
  private val wordGen = Gen.oneOf(
    (1 to 12).map(i => "w" + i) ++ Seq("x", "yy", "zzz"))
  private val docGen: Gen[String] =
    Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, wordGen).map(_.mkString(" ")))

  private def corpus(seed: Long, n: Int): Seq[(Long, String)] =
    (1 to n).map(i => (i.toLong, draw(docGen, seed * 1000 + i)))

  private def toks(t: String): Seq[String] =
    t.split("\\s+").filter(_.nonEmpty).toSeq

  // plain-Scala CDC chunker (same published algorithm, shared constants)
  private def bruteChunks(text: String, k: Int, d: Int): Seq[String] = {
    import graft.functions.expressions.WinnowFpExpr.{B, M}
    val cps = text.toCharArray.map(_.toLong)
    if (cps.isEmpty) return Nil
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (cps.length >= k) {
      val p0 = graft.functions.expressions.WinnowFpExpr.headPow(k)
      var h = 0L
      for (i <- 0 until k) h = (h * B + cps(i)) % M
      for (i <- 0 until cps.length - k + 1) {
        if (h % d == 0 && i + k < cps.length) cuts += (i + k)
        if (i + 1 < cps.length - k + 1)
          h = ((h + M - cps(i) * p0 % M) % M * B + cps(i + k)) % M
      }
    }
    val bounds = (0 +: cuts.toSeq) :+ cps.length
    bounds.sliding(2).map(w => md5hex(text.substring(w(0), w(1)))).toSeq
  }

  test("cdcChunkStats == brute chunk-and-count on random corpora") {
    import spark.implicits._
    for (round <- 1 to 4) {
      val docs = corpus(round, 40)
      val got = TrainingData.cdcChunkStats(
          docs.toDF("doc_id", "text"), k = 4, d = 4)
        .select("doc_id", "n_chunks", "n_shared")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val all = docs.map { case (id, t) => id -> bruteChunks(t, 4, 4) }
      val holders = all.flatMap { case (id, ch) => ch.distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      for ((id, ch) <- all) {
        val (nc, ns) = got.getOrElse(id, fail(s"round=$round doc $id missing"))
        assert(nc == ch.size, s"round=$round doc $id n_chunks")
        val wantShared = ch.count(fp => holders(fp) >= 2)
        assert(ns == wantShared, s"round=$round doc $id n_shared")
      }
    }
  }

  test("dsirSelect == brute bucket masses on random corpora") {
    import spark.implicits._
    for (round <- 1 to 4) {
      val docs = corpus(round + 50, 40)
        .map { case (id, t) => (id, if (id % 2 == 0) "en" else "de", t) }
      val got = TrainingData.dsirSelect(
          docs.toDF("doc_id", "lang", "text"), col("lang") === "en")
        .select("doc_id", "tgt_mass", "raw_mass", "keep")
        .as[(Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      def bucket(tk: String) = md5hex(tk).substring(0, 2)
      val allToks = docs.flatMap { case (_, l, t) =>
        toks(t).map(tk => (bucket(tk), l == "en")) }
      val raw = allToks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val tgt = allToks.groupBy(_._1).view
        .mapValues(_.count(_._2).toLong).toMap
      val rawTot = allToks.size.toLong
      val tgtTot = allToks.count(_._2).toLong
      for ((id, _, t) <- docs) {
        val tm = toks(t).map(tk => tgt.getOrElse(bucket(tk), 0L)).sum
        val rm = toks(t).map(tk => raw.getOrElse(bucket(tk), 0L)).sum
        val keep = tm * rawTot > rm * tgtTot
        assert(got(id) == ((tm, rm, keep)), s"round=$round doc $id")
      }
    }
  }

  test("containmentPairs: every reported pair's counts and gate replay " +
      "from brute shingle sets") {
    import spark.implicits._
    for (round <- 1 to 4) {
      // append near-dup copies so candidates exist
      val base = corpus(round + 100, 25).filter(_._2.nonEmpty)
      val dups = base.take(8).map { case (id, t) =>
        (id + 1000L, t + " w1") }
      val docs = base ++ dups
      val got = TrainingData.containmentPairs(
          docs.toDF("doc_id", "text"), thrNum = 4, thrDen = 5)
        .select("doc_a", "doc_b", "n_a", "n_b", "n_common", "containment")
        .as[(Long, Long, Long, Long, Long, Double)].collect()
      def sh(t: String): Set[String] =
        toks(t).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
      val byId = docs.toMap
      for ((a, b, na, nb, nc, cont) <- got) {
        val (sa, sb) = (sh(byId(a)), sh(byId(b)))
        assert(na == sa.size && nb == sb.size, s"round=$round ($a,$b)")
        assert(nc == sa.intersect(sb).size, s"round=$round ($a,$b)")
        assert(nc * 5 >= 4 * math.min(na, nb), s"round=$round gate")
        assert(cont == nc.toDouble / math.min(na, nb))
      }
      // (candidate RECALL is the bands' business — q149 measures it;
      // here only the verify arithmetic is under test)
    }
  }

  test("lshRecallReport: n_exact matches brute all-pairs Jaccard and " +
      "recall is a valid fraction") {
    import spark.implicits._
    for (round <- 1 to 3) {
      val base = corpus(round + 200, 20).filter(_._2.nonEmpty)
      val dups = base.take(6).map { case (id, t) => (id + 1000L, t) }
      val docs = base ++ dups
      val got = TrainingData.lshRecallReport(
          docs.toDF("doc_id", "text"), threshold = 0.6)
        .select("jac_bucket", "n_exact", "n_found", "recall")
        .as[(Int, Long, Long, Double)].collect()
      def sh(t: String): Set[String] =
        toks(t).sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
      val withSh = docs.map { case (id, t) => (id, sh(t)) }
        .filter(_._2.nonEmpty)
      val brute = for {
        (a, sa) <- withSh; (b, sb) <- withSh if a < b
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if j >= 0.6
      } yield math.floor(j * 10).toInt
      val wantBuckets = brute.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      assert(got.map(r => r._1 -> r._2).toMap == wantBuckets,
        s"round=$round n_exact")
      for ((_, ne, nf, rec) <- got) {
        assert(nf <= ne && rec >= 0.0 && rec <= 1.0)
        assert(rec == nf.toDouble / ne)
      }
    }
  }

  test("intervalOverlap == naive all-pairs join on random intervals") {
    import spark.implicits._
    import org.scalacheck.Gen
    val ivGen = for {
      lo <- Gen.choose(0L, 5000L)
      len <- Gen.choose(1L, 1500L)
    } yield (lo, lo + len)
    for (round <- 1 to 4) {
      val as = (1 to 60).map(i =>
        (i.toLong, draw(ivGen, round * 100L + i)))
        .map { case (id, (lo, hi)) => (id, lo, hi) }
      val bs = (1 to 60).map(i =>
        (i.toLong + 1000, draw(ivGen, round * 7000L + i)))
        .map { case (id, (lo, hi)) => (id, lo, hi) }
      val got = graft.operators.RangeJoin.intervalOverlap(
          as.toDF("a_id", "lo_a", "hi_a"), col("lo_a"), col("hi_a"),
          bs.toDF("b_id", "lo_b", "hi_b"), col("lo_b"), col("hi_b"),
          bandWidth = 700L, minNum = 1, minDen = 2)
        .select("a_id", "b_id", "ov_len")
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (aid, la, ha) <- as; (bid, lb, hb) <- bs
        if la < hb && lb < ha
        ov = math.min(ha, hb) - math.max(la, lb)
        if ov * 2 >= (ha - la) && ov * 2 >= (hb - lb)
      } yield (aid, bid, ov)).toSet
      assert(got == want,
        s"round=$round missing=${(want -- got).take(3)} " +
          s"extra=${(got -- want).take(3)}")
    }
  }

  test("collocations == brute recount on a random corpus") {
    import spark.implicits._
    val docs = corpus(999, 40)
    val got = TrainingData.collocations(
        docs.toDF("doc_id", "text"), minCount = 3, k = 1000)
      .select("w1", "w2", "pair_n", "c1", "c2", "score")
      .as[(String, String, Long, Long, Long, Double)].collect()
    val allT = docs.flatMap(d => toks(d._2))
    val uni = allT.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = allT.size.toLong
    val pairs = docs.flatMap(d => toks(d._2).sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 3)
    assert(got.length == pairs.size)
    for ((w1, w2, pn, c1, c2, score) <- got) {
      assert(pairs((w1, w2)) == pn)
      assert(uni(w1) == c1 && uni(w2) == c2)
      assert(score == (pn * n).toDouble / (c1 * c2))
    }
    // descending by (score, w1, w2) — the deterministic emit order
    val keys = got.map(r => (-r._6, r._1, r._2)).toSeq
    assert(keys == keys.sorted)
  }

  test("sourceReputation == brute per-source rollup on random corpora") {
    import spark.implicits._
    for (seed <- Seq(11L, 12L)) {
      val base = corpus(seed, 60)
      // plant duplicates (every 7th doc copies one of the first three),
      // landing unevenly across the 5 sources — the gate needs real
      // dup-rate variance to discriminate
      val docs = base.map { case (id, text) =>
        val t = if (id % 7 == 0) base((id % 3).toInt)._2 else text
        (id, t, "s" + (id % 5))
      }
      val fp = docs.map { case (id, t, _) =>
        id -> md5hex(toks(t).distinct.sorted.mkString(" "))
      }.toMap
      val fpCount = fp.values.groupBy(identity).view.mapValues(_.size).toMap
      val bySrc = docs.groupBy(_._3).view.mapValues { ds =>
        (ds.size.toLong, ds.count(d => fpCount(fp(d._1)) > 1).toLong)
      }.toMap
      // pick the gate between the observed per-source extremes so the
      // fuzz always exercises BOTH outcomes
      val permille = bySrc.values.map { case (nd, dup) => dup * 1000 / nd }
      val thr = (permille.min + permille.max) / 2
      assert(permille.min < permille.max, s"seed=$seed: flat dup rates")
      val got = TrainingData.sourceReputation(
          docs.toDF("doc_id", "text", "source"), dupMaxPermille = thr)
        .select("doc_id", "src_docs", "src_dup_docs", "keep")
        .as[(Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got.size == docs.size)
      for ((id, _, src) <- docs) {
        val (nd, dup) = bySrc(src)
        assert(got(id) == ((nd, dup, !(dup * 1000L > thr * nd))),
          s"seed=$seed doc=$id src=$src")
      }
      assert(got.values.exists(_._3) && got.values.exists(!_._3),
        s"seed=$seed: degenerate gate")
    }
  }

  test("triangleCensus == brute enumeration on random graphs") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val n = 6 + rnd.nextInt(20)
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n
        if rnd.nextInt(4) == 0
      } yield (a.toLong, b.toLong)).distinct
      if (edges.nonEmpty) {
        val got = graft.operators.Graphs.triangleCensus(
          edges.toDF("pa", "pb")).collect().head
        val es = edges.toSet
        def adj(a: Long, b: Long) =
          es((math.min(a, b), math.max(a, b)))
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val tri = (for {
          a <- nodes; b <- nodes if a < b && adj(a, b)
          c <- nodes if b < c && adj(a, c) && adj(b, c)
        } yield 1).size
        val deg = edges.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size)
        val wedges = deg.values.map(d => d.toLong * (d - 1) / 2).sum
        assert(got.getAs[Long]("n_triangles") == tri.toLong,
          s"seed=$seed triangles")
        assert(got.getAs[Long]("n_wedges") == wedges, s"seed=$seed wedges")
        assert(got.getAs[Long]("n_edges") == edges.size.toLong)
        assert(got.getAs[Long]("n_nodes") == nodes.size.toLong)
      }
    }
  }

  test("Skyline.maxMin == brute dominance filter on random points") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(100 + seed)
      val pts = (1 to 40).map(i =>
        (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(8).toLong))
      val got = graft.operators.Skyline
        .maxMin(pts.toDF("id", "rev", "lat"), "rev", "lat")
        .collect().map(_.getLong(0)).sorted.toSeq
      val brute = pts.filter { case (_, r, l) =>
        !pts.exists { case (_, r2, l2) =>
          r2 >= r && l2 <= l && (r2 > r || l2 < l)
        }
      }.map(_._1).sorted
      assert(got == brute, s"seed=$seed: $got vs $brute")
    }
  }

  test("Skyline.maxMin on ~1e6-distinct epoch-millis minCol == " +
      "single-threaded sorted-scan reference (the over-broadcast / " +
      "single-partition-sort hazard case)") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val n = 200000
    // epoch-millis-like minCol: huge sparse domain, essentially all
    // distinct — before the two-level fix this was a data-sized
    // unpartitioned sort plus a data-sized broadcast
    val base = 1723700000000L
    val pts = (1 to n).map { i =>
      (i.toLong, rnd.nextInt(1000000).toLong,
        base + math.abs(rnd.nextLong() % 5000000000L))
    }
    val got = graft.operators.Skyline
      .maxMin(pts.toDF("id", "rev", "lat"), "rev", "lat")
      .collect().map(_.getLong(0)).sorted.toSeq
    // independent reference: sort by lat asc then one scan keeping a
    // strict prefix max over EARLIER lat values (ties handled by
    // batching equal-lat groups)
    val byLat = pts.groupBy(_._3).toSeq.sortBy(_._1)
    val keep = Seq.newBuilder[Long]
    var pfx = Long.MinValue
    for ((_, grp) <- byLat) {
      val clsMax = grp.map(_._2).max
      if (clsMax > pfx)
        grp.foreach { case (id, r, _) => if (r == clsMax) keep += id }
      pfx = math.max(pfx, clsMax)
    }
    val want = keep.result().sorted
    assert(got.size == want.size && got == want,
      s"sizes ${got.size} vs ${want.size}")
  }
}
