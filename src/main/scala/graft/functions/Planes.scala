package graft.functions

/**
 * Deterministic random-hyperplane matrices for sign-LSH over embeddings.
 *
 * Components are splitmix64-derived doubles in [-1, 1) ROUNDED TO FLOAT,
 * then used on both engines as exactly that value: the Spark side embeds
 * the float array as a typed literal (FloatDot widens to double per
 * element), and the SQL side embeds `Double.toString(f.toDouble)` — a
 * shortest round-trip decimal that DuckDB parses back to the identical
 * double. Every dot product is therefore the same sequence of double
 * operations on both engines, so bucket assignments hash-match in the
 * driver's correctness gate.
 */
object Planes {

  /** Component for (plane p, dimension d) in [-1, 1) — deterministic in
    * (seed, p, d) only. */
  def component(seed: Long, p: Int, d: Int): Double = {
    val h = Hashes.strhash(s"$p:$d") // small, deterministic
    val z = graft.sources.Pages.mix(seed ^ (p.toLong << 32) ^ d.toLong ^ h)
    (z & ((1L << 53) - 1)).toDouble / (1L << 52).toDouble - 1.0
  }

  /** bits × dim hyperplane matrix, float-rounded for SQL expressibility. */
  def matrix(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Float]] =
    Array.tabulate(bits, dim)((p, d) => component(seed, p, d).toFloat)

  /** DuckDB `VALUES` rows `(p, [v1, …, vdim])` for a `planes(p, v)` CTE. */
  def sqlValues(bits: Int, dim: Int, seed: Long = 42L): String =
    matrix(bits, dim, seed).zipWithIndex.map { case (row, p) =>
      row.map(f => f.toDouble.toString).mkString(s"($p, [", ", ", "])")
    }.mkString(",\n")

  /** Multi-table variant: rows `(t, p, [v…])` for a `planes(t, p, v)` CTE;
    * table `t` uses seed + t (matching `lshBuckets(emb, bits, seed + t)`). */
  def sqlValuesTables(tables: Int, bits: Int, dim: Int,
      seed: Long = 42L): String =
    (0 until tables).flatMap { t =>
      matrix(bits, dim, seed + t).zipWithIndex.map { case (row, p) =>
        row.map(f => f.toDouble.toString).mkString(s"($t, $p, [", ", ", "])")
      }
    }.mkString(",\n")
}
