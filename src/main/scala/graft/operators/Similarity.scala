package graft.operators

import graft.functions.Hashes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over an embedding column (`Array[Float]`).
 *
 * - [[bruteTopK]]: exact cosine top-k — the correctness baseline. One
 *   broadcastable query side × full scan of the corpus; O(Q·N) dot
 *   products, no shuffle beyond the final per-query top-k.
 * - [[lshBuckets]] / [[lshNearDup]]: random-hyperplane (sign) LSH — the
 *   scale path: bucket on b sign bits, candidates only within a bucket,
 *   exact cosine re-rank. Hyperplane components are deterministic
 *   splitmix64 values, so results are reproducible across runs/partitions.
 */
object Similarity {

  /** Sequential-order dot product of two float arrays in double precision —
    * a custom codegen'd Expression (see [[graft.functions.FloatDot]]);
    * bit-compatible with the HOF/SQL formulations, ~10x faster. */
  def dot(a: Column, b: Column): Column =
    graft.functions.FloatDot.floatDot(a, b)

  def cosine(a: Column, na: Column, b: Column, nb: Column): Column =
    dot(a, b) / (sqrt(na) * sqrt(nb))

  /** Exact cosine top-k: for each query vector (queryPred over vec_id),
    * the k nearest other vectors. Output (query_id, neighbor_id, cos_i4,
    * rank); ordering on the 1e4-scaled cosine with id tie-break keeps the
    * result engine-portable. */
  def bruteTopK(emb: DataFrame, queryPred: Column, k: Int = 5): DataFrame = {
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nrm"))
    val q = withNorm.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nrm").as("qn"))
    val c = withNorm.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"), col("nrm").as("cn"))
    // multiply-before-divide ((1e4*dot)/norms) for oracle-SQL bit parity
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(lit(10000.0) * dot(col("qe"), col("ce")) /
          (sqrt(col("qn")) * sqrt(col("cn"))))
          .cast("long").as("cos_i4"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_i4").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Deterministic hyperplane component for (plane p, dimension d) in
    * [-1, 1). */
  def plane(seed: Long, p: Int, d: Int): Double = {
    val h = Hashes.strhash(s"$p:$d") // small, deterministic
    val z = graft.sources.Pages.mix(seed ^ (p.toLong << 32) ^ d.toLong ^ h)
    (z & ((1L << 53) - 1)).toDouble / (1L << 52).toDouble - 1.0
  }

  /** (vec_id, bucket): sign-LSH bucket of each embedding under `bits`
    * deterministic hyperplanes. Typed map: per-row dense math. */
  def lshBuckets(emb: DataFrame, bits: Int = 12, seed: Long = 42L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .map { case (id, v) =>
        var bucket = 0L
        var p = 0
        while (p < bits) {
          var s = 0.0
          var d = 0
          while (d < v.length) { s += v(d) * plane(seed, p, d); d += 1 }
          if (s > 0) bucket |= (1L << p)
          p += 1
        }
        (id, bucket)
      }.toDF("vec_id", "bucket")
  }

  /** LSH-bucketed near-duplicate pairs: candidates share a bucket, then
    * exact cosine ≥ threshold. Lower `bits` → higher recall, bigger
    * buckets. Recall vs the quadratic baseline is probabilistic (tested). */
  def lshNearDup(emb: DataFrame, threshold: Double = 0.3, bits: Int = 8,
      seed: Long = 42L): DataFrame = {
    val buckets = lshBuckets(emb, bits, seed)
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nrm"))
      .join(buckets, "vec_id")
    val a = withNorm.select(col("bucket"), col("vec_id").as("a"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = withNorm.select(col("bucket"), col("vec_id").as("b"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    a.join(b, "bucket").filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(lit(10000.0) * cosine(col("ea"), col("na"), col("eb"), col("nb")))
          .cast("long").as("cos_i4"))
      .filter(col("cos_i4") >= math.round(threshold * 10000))
      .distinct()
  }
}
