package graft.sources

import graft.operators.{Adjacency, GraphOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel

/**
 * pages → link edges → dense vertex ids → [[Adjacency]]: the engine's
 * ingest pipeline, replacing the reference's offline `graph-convert`
 * densification (graph-convert.cpp:2958-2995) with Spark-native jobs.
 */
final case class WebGraph(
    dict: DataFrame,   // (url: String, id: Long) — dense ids, rank-by-url
    edges: DataFrame,  // (src: Long, dst: Long) — cleaned
    adjacency: Adjacency)

object WebGraph {

  /**
   * Dense id assignment for a (possibly huge) url set: ids are the global
   * url sort rank, computed by [[graft.plans.Ranking.globalRank]]
   * (range-partition + per-partition rank + O(P) driver prefix sum — no
   * single-partition stage), so the dictionary build survives 10^12
   * distinct urls. Mirrors the dense `GraphNode = uint32` ids of the
   * reference (LC_CSR_Graph.h:155). Eagerly materialized.
   */
  def densify(spark: SparkSession, urls: DataFrame,
      numPartitions: Int = 32): DataFrame =
    graft.plans.Ranking.globalRank(
      urls.select(col("url")).distinct(), Seq(col("url")), "id",
      numPartitions)

  /** (src_url, dst_url) link pairs extracted from the html column. */
  def extractEdges(spark: SparkSession, pages: DataFrame): DataFrame = {
    import spark.implicits._
    pages.select(col("url"), col("html")).as[(String, Array[Byte])]
      .flatMap { case (u, html) =>
        Extract.links(html, u).map(t => (Extract.normalize(u), t))
      }
      .toDF("src_url", "dst_url")
  }

  /**
   * Full ingest: extract links, build the url dictionary over page urls ∪
   * link targets (isolated pages stay vertices), densify via two
   * shuffle-hash dictionary joins, clean, and assemble the blocked
   * adjacency. The dictionary join is NOT forced to broadcast: at corpus
   * scale the dict is O(V) and must shuffle; Catalyst/AQE will broadcast
   * it by itself at test scale.
   */
  def fromPages(spark: SparkSession, pages: DataFrame,
      blockSize: Int = 1024, numPartitions: Int = 32): WebGraph = {
    val urlEdges = extractEdges(spark, pages)
      .persist(StorageLevel.MEMORY_AND_DISK)

    import spark.implicits._
    val pageUrls = pages.select(col("url")).as[String]
      .map(Extract.normalize).toDF("url")
    val allUrls = pageUrls
      .union(urlEdges.select(col("dst_url").as("url")))
    val dict = densify(spark, allUrls, numPartitions) // eagerly checkpointed

    val bySrc = dict.select(col("url").as("src_url"), col("id").as("src"))
    val byDst = dict.select(col("url").as("dst_url"), col("id").as("dst"))
    val edges = GraphOps.clean(
      urlEdges.join(bySrc, "src_url").join(byDst, "dst_url")
        .select(col("src"), col("dst")))

    val adj = Adjacency.build(edges, blockSize, numPartitions,
      explicitVertices = Some(dict.select(col("id"))))
    urlEdges.unpersist()
    WebGraph(dict, edges, adj)
  }
}
