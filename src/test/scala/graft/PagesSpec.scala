package graft

import graft.sources.{Extract, Pages, WebGraph}
import org.scalatest.funsuite.AnyFunSuite

/** Ingest invariants (FIXTURES.md §1, §3 + BASELINE.json input_hint). */
class PagesSpec extends AnyFunSuite {
  import TestSpark._

  test("pages schema matches input_hint") {
    val f = pages.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(f("url") == "string")
    assert(f("warc_ts") == "timestamp")
    assert(f("html") == "binary")
    assert(f("text") == "string")
    assert(f("lang") == "string")
  }

  test("extracted text is byte-identical to the stored text column") {
    val rows = pages.select("html", "text").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val derived = Extract.text(r.getAs[Array[Byte]](0))
      assert(derived == r.getString(1))
    }
  }

  test("synthesis is deterministic and partitioning-invariant") {
    val a = Pages.synthesize(spark, 64, 7L, numPartitions = 3)
      .orderBy("url").collect()
    val b = Pages.synthesize(spark, 64, 7L, numPartitions = 11)
      .orderBy("url").collect()
    assert(a.length == 64 && b.length == 64)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getString(0) == y.getString(0))
      assert(java.util.Arrays.equals(x.getAs[Array[Byte]](2), y.getAs[Array[Byte]](2)))
      assert(x.getString(3) == y.getString(3))
    }
  }

  test("dictionary ids are dense and ordered by url") {
    val rows = web.dict.orderBy("url").collect()
    rows.zipWithIndex.foreach { case (r, i) => assert(r.getLong(1) == i.toLong) }
  }

  test("url normalization: fragments, trailing slashes, host casing") {
    assert(Extract.normalize("https://Host-1.example/p/9#frag") ==
      "https://host-1.example/p/9")
    assert(Extract.normalize("https://host-1.example/p/9/") ==
      "https://host-1.example/p/9")
    assert(Extract.resolve("https://host-1.example/p/10", "/p/3") ==
      "https://host-1.example/p/3")
    assert(Extract.resolve("https://host-1.example/p/10",
      "https://other.example/x") == "https://other.example/x")
  }

  test("edge cases of the embedded graph hold after clean+densify") {
    // original-id edge set
    val orig = edgeArray.map { case (s, d) => (origOf(s), origOf(d)) }.toSet
    // 0 dangling
    assert(!orig.exists(_._1 == 0L))
    // triangle 1→2→3→1
    assert(orig.contains((1L, 2L)) && orig.contains((2L, 3L)) && orig.contains((3L, 1L)))
    // K4 on 4..7: all 12 directed pairs
    val k4 = for (a <- 4L to 7L; b <- 4L to 7L if a != b) yield (a, b)
    assert(k4.forall(orig.contains))
    // hub 8: large out-degree, > one tile at blockSize=64
    val hubDeg = orig.count(_._1 == 8L)
    assert(hubDeg > 64, s"hub out-degree $hubDeg")
    val hubBlocks = web.adjacency.blocks
      .filter(org.apache.spark.sql.functions.col("src") === denseOf(8L)).count()
    assert(hubBlocks > 1, s"hub should span multiple tiles, got $hubBlocks")
    // 9: self-loop dropped, duplicate link deduped → exactly one 9→10
    assert(!orig.contains((9L, 9L)))
    assert(orig.count(p => p == ((9L, 10L))) == 1)
    // 10: two alias forms → one 10→9 edge
    assert(orig.count(p => p == ((10L, 9L))) == 1)
    // 11 isolated: a vertex, but no edges touch it
    assert(denseOf.contains(11L))
    assert(!orig.exists(p => p._1 == 11L || p._2 == 11L))
    // {12,13} private component
    assert(orig.contains((12L, 13L)))
    assert(!orig.exists(p => (p._2 == 12L || p._2 == 13L) && p._1 != 12L))
  }
}
