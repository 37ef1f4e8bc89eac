package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TrainingData

/** The SemDeDup skew defense: k-means clusters are not balanced, so the
  * within-cluster pair join is banded by centroid-cosine rank and capped
  * at `clusterCap` members per band — one hot cluster must yield O(c·cap)
  * candidate pairs, never c²/2.
  */
class SemDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** A degenerate `assigned` frame: every vector in ONE cluster — the
    * worst-case skew a capped join must survive. */
  private def hotCluster(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      (i.toLong, Seq(1000L + i, 7L), 1000000L + i, 0L, 0.9 + i * 1e-6)
    }.toDF("vec_id", "qv", "nrm", "cid", "cos")
  }

  test("candidate pairs from one hot cluster are banded to O(c·cap)") {
    val n = 100
    val cap = 8
    val got = TrainingData.semDedupCandidates(hotCluster(n), cap).count()
    // 12 full bands of 8 (28 pairs each) + one band of 4 (6 pairs)
    val fullBands = n / cap
    val rem = n % cap
    val expected = fullBands.toLong * cap * (cap - 1) / 2 +
      rem.toLong * (rem - 1) / 2
    assert(got == expected, s"got $got, expected $expected")
    assert(got < n.toLong * (n - 1) / 2 / 10,
      "cap did not bound the pair enumeration")
  }

  test("cap larger than every cluster reproduces the uncapped join") {
    val n = 40
    val capped = TrainingData.semDedupCandidates(hotCluster(n), 4096)
      .select(col("a.vec_id"), col("b.vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = (for {
      a <- 0L until n.toLong; b <- (a + 1) until n.toLong
    } yield (a, b)).toSet
    assert(capped == all)
  }

  test("semDedup end-to-end with an active cap: one row per vector, " +
      "exact duplicates still fold, result deterministic") {
    import spark.implicits._
    // 60 vectors in ~3 directions (exact duplicates within a direction),
    // k=3 so k-means separates them; cap=4 is far below the ~20-member
    // clusters, so banding is active.
    val vecs = (0 until 60).map { i =>
      val base = i % 3 match {
        case 0 => Seq(1000L, 10L, 0L)
        case 1 => Seq(-5L, 1000L, 40L)
        case _ => Seq(0L, -30L, 1000L)
      }
      (i.toLong, base)
    }.toDF("vec_id", "qv")
    val r1 = TrainingData.semDedup(vecs, k = 3, iters = 2, tau = 0.999,
      clusterCap = 4).orderBy("vec_id").collect()
    val r2 = TrainingData.semDedup(vecs, k = 3, iters = 2, tau = 0.999,
      clusterCap = 4).orderBy("vec_id").collect()
    assert(r1.length == 60)
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    // every band of exact duplicates keeps exactly one member, so the
    // kept count equals the number of (component) groups and is far
    // below the input count
    val kept = r1.count(_.getAs[Int]("kept") == 1)
    val components = r1.map(_.getAs[Long]("component")).distinct.length
    assert(kept == components)
    assert(kept <= 3 * (60 / 3 / 4 + 1),
      s"kept=$kept — exact duplicates inside bands must fold")
  }
}
