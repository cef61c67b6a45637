package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Plain-text edge-list ingest/export — the reference's `edgelist2gr` and
 * `gr2edgelist` converters (graph-convert.cpp:51,60 / 142,155): the first
 * thing a user with their own graph reaches for. Headerless CSV, one
 * `src,dst` pair per line; the explicit schema keeps the scan narrow and
 * typed (no inference pass over the data).
 */
object EdgeListCsv {

  /** gr2edgelist: export (src, dst) rows as headerless CSV. */
  def write(edges: DataFrame, path: String): Unit =
    edges.select("src", "dst")
      .write.mode("overwrite").option("header", "false").csv(path)

  /** edgelist2gr: ingest a headerless CSV edge list as (src, dst). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema("src LONG, dst LONG").csv(path)
}
