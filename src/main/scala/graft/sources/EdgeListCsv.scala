package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** gr2edgelist1ind (graph-convert.cpp:61): 1-INDEXED edge-list export. */
  def write1Indexed(edges: DataFrame, path: String): Unit =
    edges.select((col("src") + 1).as("src"), (col("dst") + 1).as("dst"))
      .write.mode("overwrite").option("header", "false").csv(path)

  /** 1-indexed edge-list ingest (inverse of [[write1Indexed]]). */
  def read1Indexed(spark: SparkSession, path: String): DataFrame =
    read(spark, path)
      .select((col("src") - 1).as("src"), (col("dst") - 1).as("dst"))

  /** Weighted export: (src, dst, w) — the reference's edge-payload
    * edgelists (graph-convert edgelist conversions carry an optional
    * third field, graph-convert.cpp:118-131 EdgeValue). */
  def writeWeighted(edges: DataFrame, path: String): Unit =
    edges.select("src", "dst", "w")
      .write.mode("overwrite").option("header", "false").csv(path)

  /** Weighted ingest: 3-field CSV lines as (src, dst, w: double) — the
    * general payload type; integer weights survive exactly. */
  def readWeighted(spark: SparkSession, path: String): DataFrame =
    spark.read.schema("src LONG, dst LONG, w DOUBLE").csv(path)

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

  /** Weighted MatrixMarket export (`coordinate real general`): banner,
    * size line, 1-indexed `src dst w` lines — written as ONE text file
    * (coalesce(1)): .mtx is a text interchange format whose readers
    * (including [[readMtxWeighted]]) identify the size line positionally
    * as the first non-comment record. */
  def writeMtxWeighted(edges: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = edges.sparkSession
    import spark.implicits._
    val maxRow = edges.agg(greatest(max(col("src")), max(col("dst")))).first()
    val n = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0) + 1
    val m = edges.count()
    // explicit ordinal + single-partition sort: coalesce(1) over a union
    // does NOT guarantee the header partition lands first in the file
    val header = Seq(
      (0L, "%%MatrixMarket matrix coordinate real general"),
      (1L, s"$n $n $m")).toDF("ord", "value")
    val body = edges
      .select(lit(2L).as("ord"),
        concat_ws(" ", col("src") + 1, col("dst") + 1, col("w")).as("value"))
    header.unionAll(body)
      .repartition(1).sortWithinPartitions("ord")
      .select("value").write.mode("overwrite").text(path)
  }

  /** Weighted MatrixMarket ingest: `%`-comment lines are skipped by the
    * CSV parser's comment option and the size line is consumed as the
    * per-file "header" (the first non-comment record — MTX's positional
    * contract), so 3-field weighted edge lines parse unambiguously.
    * Expects one file per matrix, the format's native shape. */
  def readMtxWeighted(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read
      .option("sep", " ").option("comment", "%").option("header", "true")
      .schema("src LONG, dst LONG, w DOUBLE")
      .csv(path)
      .select((col("src") - 1).as("src"), (col("dst") - 1).as("dst"),
        col("w"))
  }

  /** mtx2gr (graph-convert.cpp:191,648-657 Mtx2Gr: "src and dst start
    * at 1"): MatrixMarket coordinate ingest — skips `%`-comment and size
    * lines, returns 0-indexed (src, dst). Pattern matrices only (this
    * writer's form); weighted matrices ride [[readMtxWeighted]]. */
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
