package graft

import graft.operators.Motif5
import org.scalatest.funsuite.AnyFunSuite

/** Cross-validates the whole hom-algebra census (generic factor
  * elimination, Möbius inversion, overcount solve, canonicalization)
  * against a brute-force induced census over every C(n,5) vertex
  * subset of deterministic random fixtures — one dense enough that all
  * 21 patterns (incl. K5) occur, one sparse. */
class Motif5Spec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("pattern machinery: 21 connected patterns, complete signature") {
    assert(Motif5.patterns.size == 21)
    assert(Motif5.names.distinct.size == 21)
    // the overcount matrix has unit diagonal and is triangular in edges
    for (i <- 0 until 21; j <- 0 until 21) {
      val (ci, cj) = (Motif5.patterns(i), Motif5.patterns(j))
      if (i == j) assert(Motif5.overcount(i)(j) == 1L)
      else if (Integer.bitCount(ci) >= Integer.bitCount(cj))
        assert(Motif5.overcount(i)(j) == 0L)
    }
  }

  private def bruteCensus(n: Int, und: Seq[(Int, Int)]): Map[String, Long] = {
    val adj = Array.fill(n)(new scala.collection.mutable.BitSet(n))
    und.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val counts = scala.collection.mutable.Map.empty[String, Long]
    val vs = new Array[Int](5)
    def rec(start: Int, depth: Int): Unit = {
      if (depth == 5) {
        var mask = 0
        var i = 0
        var bit = 0
        while (i < 5) {
          var j = i + 1
          while (j < 5) {
            if (adj(vs(i))(vs(j))) mask |= 1 << bit
            bit += 1; j += 1
          }
          i += 1
        }
        Motif5.classify(mask).foreach(nm =>
          counts(nm) = counts.getOrElse(nm, 0L) + 1L)
      } else {
        var v = start
        while (v <= n - (5 - depth)) {
          vs(depth) = v
          rec(v + 1, depth + 1)
          v += 1
        }
      }
    }
    rec(0, 0)
    counts.toMap
  }

  private def checkFixture(n: Int, p: Double, seed: Long): Map[String, Long] = {
    val rnd = new scala.util.Random(seed)
    val und = for {
      a <- 0 until n; b <- a + 1 until n if rnd.nextDouble() < p
    } yield (a, b)
    val df = und.map { case (a, b) => (a.toLong, b.toLong) }.toDF("src", "dst")
    val got = Motif5.census(df).first()
    val want = bruteCensus(n, und)
    Motif5.names.foreach { nm =>
      assert(got.getAs[Long](nm) == want.getOrElse(nm, 0L),
        s"$nm: engine ${got.getAs[Long](nm)} vs brute ${want.getOrElse(nm, 0L)}")
    }
    want
  }

  test("census equals brute force on a dense fixture (all 21 nonzero)") {
    val want = checkFixture(26, 0.45, seed = 7L)
    assert(Motif5.names.forall(nm => want.getOrElse(nm, 0L) > 0L),
      s"degenerate fixture: ${Motif5.names.filter(nm => want.getOrElse(nm, 0L) == 0L)}")
  }

  test("census equals brute force on a sparse fixture") {
    checkFixture(40, 0.12, seed = 11L)
  }

  test("degenerate inputs: empty and sub-5-vertex graphs count zero") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val row = Motif5.census(empty).first()
    assert(Motif5.names.forall(nm => row.getAs[Long](nm) == 0L))
    val k3 = Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("src", "dst")
    val row3 = Motif5.census(k3).first()
    assert(Motif5.names.forall(nm => row3.getAs[Long](nm) == 0L))
  }
}
