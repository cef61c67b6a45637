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

  /** gr2mtx (graph-convert.cpp:159,747): MatrixMarket coordinate
    * export — `%%MatrixMarket matrix coordinate pattern general` header,
    * `rows cols nnz` size line, then 1-INDEXED `src dst` lines. Header
    * and size line ride as comment-prefixed first partition via a plain
    * text write of pre-formatted lines (the size line needs driver-side
    * counts anyway). */
  def writeMtx(edges: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = edges.sparkSession
    import spark.implicits._
    val maxRow = edges.agg(greatest(max(col("src")), max(col("dst")))).first()
    // empty graph: a valid "0 0 0" size line, not an NPE
    val n = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0) + 1
    val m = edges.count()
    val header = Seq(
      "%%MatrixMarket matrix coordinate pattern general",
      s"$n $n $m").toDF("value").coalesce(1)
    val body = edges
      .select(concat_ws(" ", col("src") + 1, col("dst") + 1).as("value"))
    header.unionAll(body).write.mode("overwrite").text(path)
  }

  /** mtx2gr (graph-convert.cpp:191,648-657 Mtx2Gr: "src and dst start
    * at 1"): MatrixMarket coordinate ingest — skips `%`-comment and size
    * lines, returns 0-indexed (src, dst). Pattern matrices only (our
    * writer's form; weighted edge lines would need the 3rd field). */
  def readMtx(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val lines = spark.read.text(path)
      .filter(!col("value").startsWith("%"))
    val parts = split(col("value"), " ")
    lines
      .select(parts.getItem(0).cast("long").as("src"),
        parts.getItem(1).cast("long").as("dst"),
        size(parts).as("n"))
      // the size line has 3 fields (rows cols nnz); edge lines have 2
      .filter(col("n") === 2)
      .select((col("src") - 1).as("src"), (col("dst") - 1).as("dst"))
  }
}
