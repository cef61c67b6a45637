package graft.sources

import graft.operators.GraphOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic edge table derived from the driver's lineitem parquet —
 * the stand-in for a pre-densified `.gr` file (FileGraph.cpp:47,158-176)
 * that BOTH the Spark engine and the DuckDB oracle can reproduce from the
 * same input with plain arithmetic (no engine-specific hash functions).
 *
 * Construction: src/dst ids in [0, 4000) laid out as 8 residue classes of
 * 500 slots; both endpoints of an edge share `l_orderkey % 8`, so the graph
 * has ≥ 8 connected components by construction (multiple components incl.
 * a per-class giant one — the CC/Afforest-style shape the fixtures call
 * for). Self-loops and duplicate edges are then dropped (gr2cgr).
 */
object TpchGraph {

  /** Clean directed edge table (src: Long, dst: Long). */
  def edges(spark: SparkSession, sfDir: String): DataFrame = {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val raw = li.select(
      ((col("l_orderkey") % 8) + lit(8L) * (col("l_partkey") % 500))
        .cast("long").as("src"),
      ((col("l_orderkey") % 8) + lit(8L) * ((col("l_suppkey") * 13L) % 500))
        .cast("long").as("dst"))
    GraphOps.clean(raw)
  }

  /** Weighted directed fixture: [[edges]] + GraphOps.attachWeights'
    * deterministic [1, 97] weight (the gr2randomweightgr analog — not
    * symmetric under src/dst swap; undirected fixtures apply it to the
    * ordered pair). */
  def weightedEdges(spark: SparkSession, sfDir: String): DataFrame =
    GraphOps.attachWeights(edges(spark, sfDir))

  /** Weighted undirected fixture for MST: upper-oriented symmetrized
    * [[edges]] with the weight on the ordered pair (symmetric by
    * construction). */
  def weightedUndirected(spark: SparkSession, sfDir: String): DataFrame =
    GraphOps.attachWeights(GraphOps.orientUpper(edges(spark, sfDir)))

  /** The same derivation as ANSI SQL (DuckDB oracle side). */
  val edgesSql: String =
    """SELECT DISTINCT src, dst FROM (
      |  SELECT CAST((l_orderkey % 8) + 8 * (l_partkey % 500) AS BIGINT) AS src,
      |         CAST((l_orderkey % 8) + 8 * ((l_suppkey * 13) % 500) AS BIGINT) AS dst
      |  FROM lineitem) AS raw
      |WHERE src <> dst""".stripMargin

  /** Symmetrized variant (gr2sgr) as SQL. */
  val symEdgesSql: String =
    s"""SELECT DISTINCT src, dst FROM (
       |  SELECT src, dst FROM ($edgesSql) AS e0
       |  UNION ALL
       |  SELECT dst AS src, src AS dst FROM ($edgesSql) AS e1) AS u""".stripMargin

  /** [[weightedEdges]] as SQL. */
  val weightedEdgesSql: String =
    s"""SELECT src, dst, CAST(1 + (src * 7 + dst * 13) % 97 AS BIGINT) AS w
       |FROM ($edgesSql) AS e""".stripMargin

  /** [[weightedUndirected]] as SQL (MST fixture). */
  val weightedUndirectedSql: String =
    s"""SELECT src, dst, CAST(1 + (src * 7 + dst * 13) % 97 AS BIGINT) AS w
       |FROM ($symEdgesSql) AS s WHERE src < dst""".stripMargin
}
