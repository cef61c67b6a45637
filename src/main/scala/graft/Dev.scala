package graft

import graft.operators._
import graft.sources.{Pages, TpchGraph, WebGraph}
import org.apache.spark.sql.SparkSession

/** Scratch profiling / demo main (not part of the driver contract).
  * Usage: runMain graft.Dev [pages|tpch] [n] */
object Dev {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("pages")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    mode match {
      case "pages" =>
        val n = args.lift(1).map(_.toLong).getOrElse(2000L)
        var t0 = System.nanoTime()
        val pages = Pages.synthesize(spark, n, numPartitions = cpus.toInt)
        val web = WebGraph.fromPages(spark, pages, numPartitions = cpus.toInt)
        println(f"ingest: ${(System.nanoTime() - t0) / 1e9}%.1fs  " +
          f"V=${web.adjacency.numVertices} E=${web.adjacency.numEdges}")
        t0 = System.nanoTime()
        val r = PageRank.runTopo(web.adjacency, tol = 1e-6)
        val secs = (System.nanoTime() - t0) / 1e9
        val eps = r.iterations * web.adjacency.numEdges / secs
        println(f"pagerank: converged=${r.converged} iters=${r.iterations} " +
          f"${secs}%.1fs  ${eps}%.0f edges/sec/iter-agg")
        println("last 3 residuals: " +
          r.metrics.takeRight(3).map(m => f"${m.l1Residual}%.2e").mkString(", "))
        val top = PageRank.topK(r.ranks, 5).collect()
          .map(x => s"${x.getLong(0)}:${f"${x.getDouble(1)}%.6f"}").mkString(" ")
        println(s"top5: $top")
      case "tpch" =>
        val t0 = System.nanoTime()
        val adj = Adjacency.build(TpchGraph.edges(spark, "/root/testdata/sf0.001"),
          numPartitions = cpus.toInt)
        println(f"adj build: ${(System.nanoTime() - t0) / 1e9}%.1fs  V=${adj.numVertices} E=${adj.numEdges}")
        val r = PageRank.runTopo(adj, tol = -1, maxIter = 20)
        r.metrics.foreach(m => println(s"iter ${m.superstep}: ${m.millis} ms"))
    }
    spark.stop()
  }
}
