package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.gds.GdsCore
import graft.sources.gds.GdsCore.{GdsFile, Node}

/** Ranged variable-stride decode ([[GdsCore.stringsRange]] /
  * [[GdsCore.varintsRange]] over the chunk-granular element index) must
  * return exactly the slice of the whole-node decode — for every
  * dStr8/dVL_Int node of both real fixtures, across ranges that start
  * and end mid-chunk, cover one element, and cover elements spanning
  * chunk boundaries (1KG carries a 296 kb indel allele that spans many
  * XZ_RA chunks on its own). */
class GdsRangedSpec extends AnyFunSuite {

  private val extdata = "/root/reference/inst/extdata"

  private def collectNodes(n: Node): Seq[Node] =
    n +: n.children.flatMap(collectNodes)

  private def ranges(count: Int): Seq[(Int, Int)] = {
    val probes = Seq(
      (0, math.min(5, count)),
      (count / 3, math.min(count / 3 + 7, count)),
      (math.max(count - 3, 0), count),
      (count / 2, math.min(count / 2 + 1, count)),
      (0, count))
    probes.filter { case (a, b) => b > a }
  }

  private def checkFile(path: String): Unit = {
    val f = new GdsFile(path)
    try {
      val nodes = collectNodes(f.root)
      val strNodes = nodes.filter(n =>
        n.cls.contains("dStr8") && n.dims.nonEmpty && n.dataId != 0)
      assert(strNodes.nonEmpty, s"no dStr8 nodes in $path")
      strNodes.foreach { n =>
        val whole = GdsCore.strings(f, n)
        val count = n.dims.head
        ranges(count).foreach { case (e0, e1) =>
          val got = GdsCore.stringsRange(f, n, e0, e1)
          assert(got.toSeq == whole.slice(e0, e1).toSeq,
            s"${n.path}[$e0,$e1) mismatch in $path")
        }
      }
      val vlNodes = nodes.filter(n =>
        n.cls.contains("dVL_Int") && n.dims.nonEmpty && n.dataId != 0)
      vlNodes.foreach { n =>
        val count = n.dims.head
        val whole = GdsCore.varints(f, n, count.toLong)
        ranges(count).foreach { case (e0, e1) =>
          val got = GdsCore.varintsRange(f, n, count.toLong, e0, e1)
          assert(got.toSeq == whole.slice(e0, e1).toSeq,
            s"${n.path}[$e0,$e1) mismatch in $path")
        }
      }
    } finally f.close()
  }

  test("CEU_Exon.gds: ranged == whole for every variable-stride node") {
    checkFile(s"$extdata/CEU_Exon.gds")
  }

  test("1KG chr22: ranged == whole incl. the multi-chunk indel allele") {
    checkFile(s"$extdata/1KG_phase1_release_v3_chr22.gds")
  }

  test("Imputed_dosages.gds: ranged == whole") {
    checkFile(s"$extdata/Imputed_dosages.gds")
  }
}
