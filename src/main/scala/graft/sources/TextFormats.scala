package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Long-tail text converters from the reference's `graph-convert` tool:
 * DIMACS shortest-path files (dimacs2gr / gr2dimacs,
 * graph-convert.cpp:2123-2214,2446-2471), node lists (nodelist2gr,
 * graph-convert.cpp:781-850), adjacency lists (gr2adjacencylist,
 * graph-convert.cpp:853-878) and neo4j bulk-import CSVs (gr2neo4j,
 * graph-convert.cpp:2595-2660). Each is a projection/explode over the
 * edge table plus a text/csv read — the heavy lifting (parsing, schema,
 * partitioned IO) is Spark's.
 */
object TextFormats {

  /** gr2dimacs (graph-convert.cpp:2446-2471): `p sp <n> <m>` problem
    * line, then 1-INDEXED `a src dst w` arc lines (DIMACS weights are
    * integers — the reference reads int32, graph-convert.cpp:2177). */
  def writeDimacs(edges: DataFrame, path: String): Unit = {
    val spark = edges.sparkSession
    import spark.implicits._
    val maxRow = edges.agg(greatest(max(col("src")), max(col("dst")))).first()
    val n = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0) + 1
    val m = edges.count()
    val header = Seq(s"p sp $n $m").toDF("value").coalesce(1)
    val body = edges.select(
      concat_ws(" ", lit("a"), col("src") + 1, col("dst") + 1,
        col("w").cast("long")).as("value"))
    header.unionAll(body).write.mode("overwrite").text(path)
  }

  /** dimacs2gr (graph-convert.cpp:2123-2214): arc lines start with `a`,
    * everything else (comments `c`, the `p` problem line) is skipped —
    * exactly the reference's "if tmp != a, skipLine" loop. 0-indexed
    * (src, dst, w). */
  def readDimacs(spark: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), " ")
    spark.read.text(path)
      .filter(col("value").startsWith("a "))
      .select((parts.getItem(1).cast("long") - 1).as("src"),
        (parts.getItem(2).cast("long") - 1).as("dst"),
        parts.getItem(3).cast("long").as("w"))
  }

  /** Node-list export (inverse of nodelist2gr, graph-convert.cpp:781-850):
    * one `src n_neighbors dst...` line per source, 0-indexed, neighbors
    * sorted for a canonical file. */
  def writeNodelist(edges: DataFrame, path: String): Unit =
    edges.groupBy("src")
      .agg(sort_array(collect_list(col("dst"))).as("dsts"))
      .select(concat_ws(" ", col("src"), size(col("dsts")),
        array_join(col("dsts"), " ")).as("value"))
      .write.mode("overwrite").text(path)

  /** nodelist2gr (graph-convert.cpp:781-850): `src n_neighbors dst...`
    * lines, 0-indexed. The count field is positional (field 2); sources
    * with zero neighbors contribute no edges. */
  def readNodelist(spark: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), " ")
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(parts.getItem(0).cast("long").as("src"),
        explode(slice(parts, lit(3), greatest(size(parts) - 2, lit(0)))).as("d"))
      .select(col("src"), col("d").cast("long").as("dst"))
  }

  /** gr2adjacencylist (graph-convert.cpp:853-878): one `src dst dst...`
    * line per source (no count field), 0-indexed, neighbors sorted. */
  def writeAdjacencyList(edges: DataFrame, path: String): Unit =
    edges.groupBy("src")
      .agg(sort_array(collect_list(col("dst"))).as("dsts"))
      .select(concat_ws(" ", col("src"), array_join(col("dsts"), " "))
        .as("value"))
      .write.mode("overwrite").text(path)

  /** Adjacency-list ingest: everything after the first field is a
    * neighbor. */
  def readAdjacencyList(spark: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), " ")
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(parts.getItem(0).cast("long").as("src"),
        explode(slice(parts, lit(2), greatest(size(parts) - 1, lit(0)))).as("d"))
      .select(col("src"), col("d").cast("long").as("dst"))
  }

  /** gr2neo4j (graph-convert.cpp:2595-2660): neo4j bulk-import CSVs —
    * `$path/nodes` with (uid:ID, :LABEL) rows labeled `v`, and
    * `$path/edges` with (:START_ID, :END_ID, :TYPE[, value]) rows labeled
    * `e`; headers inline (Spark csv header mode replaces the reference's
    * separate .nodesheader/.edgesheader files). */
  def writeNeo4j(edges: DataFrame, path: String): Unit = {
    graft.operators.GraphOps.vertices(edges)
      .select(col("id").as("uid:ID"), lit("v").as(":LABEL"))
      .write.mode("overwrite").option("header", "true").csv(s"$path/nodes")
    edges
      .select(col("src").as(":START_ID"), col("dst").as(":END_ID"),
        lit("e").as(":TYPE"), col("w").cast("long").as("value"))
      .write.mode("overwrite").option("header", "true").csv(s"$path/edges")
  }

  /** Read back the neo4j edge CSV as (src, dst, w). */
  def readNeo4jEdges(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(s"$path/edges")
      .select(col(":START_ID").cast("long").as("src"),
        col(":END_ID").cast("long").as("dst"),
        col("value").cast("long").as("w"))
}
