package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time individual SparkEntry queries at a scale dir.
  * `runMain graft.TimeQueries <sfDir> <query...>` (no args → all). */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      println(f"TIMING $q rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.1f")
      // release the query's unreferenced checkpoint blocks (see BenchSuite)
      System.gc()
    }
    spark.stop()
  }
}
