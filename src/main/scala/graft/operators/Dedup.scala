package graft.operators

import graft.functions.Hashes
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for a training-data pipeline over `documents`.
 *
 * Scale shapes (the point of each variant):
 *  - exact: one hash-aggregate over the corpus — O(N) shuffle on the text
 *    key (at real scale: on a digest of it).
 *  - ngramJaccard: candidate pairs ONLY via an inverted shingle index
 *    (explode → self-join on shingle) with a document-frequency cap on
 *    shingles so a stop-shingle shared by millions of docs never builds a
 *    quadratic candidate set; exact Jaccard re-verified per candidate.
 *  - minhashLsh: constant-size signatures + banded bucket join — the
 *    100 TB path where even the inverted index is too big. Candidates are
 *    confirmed with exact Jaccard, so precision is exact and recall is
 *    the standard LSH probability.
 *  - simhashPairs: 16-bit SimHash, banded into 4×4 bits: any pair within
 *    Hamming distance 3 shares ≥1 full band (pigeonhole), so the banded
 *    join finds EXACTLY the pairs a quadratic scan would at maxHamming≤3.
 *  - embeddingNearDup: cosine over embedding vectors; quadratic form here,
 *    LSH-bucketed form in [[Similarity]].
 */
object Dedup {

  /** Exact dedup groups: (keep_id = min doc_id per identical text, n_dups). */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
      .select(col("keep_id"), col("n_docs"))

  /** Distinct word-trigram shingles as an array column (codegen'd HOFs;
    * must mirror Hashes.shingles and the SQL oracle). */
  def shingleArr(text: Column, n: Int = 3): Column = {
    val t = split(text, " ")
    // guard: sequence(0, negative) would run backwards for < n tokens
    when(size(t) >= n,
      array_distinct(
        transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", (0 until n).map(j => get(t, i + j)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** (a, b, jacc_i4): document pairs with n-gram Jaccard ≥ threshold.
    * dfCap drops shingles appearing in more than dfCap docs from CANDIDATE
    * GENERATION only (skew guard); Jaccard itself is exact. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.5,
      dfCap: Long = 1000L): DataFrame = {
    val base = docs
      .select(col("doc_id"), shingleArr(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("nsh"))
    val inv = base.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val rare = inv.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= dfCap).select("shingle")
    val invRare = inv.join(rare, "shingle")
    val cand = invRare.select(col("shingle"), col("doc_id").as("a"))
      .join(invRare.select(col("shingle"), col("doc_id").as("b")), "shingle")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    jaccardVerify(cand, base, threshold)
  }

  /** Exact-Jaccard confirmation of candidate (a,b) pairs. */
  private def jaccardVerify(cand: DataFrame, base: DataFrame,
      threshold: Double): DataFrame = {
    val ja = base.select(col("doc_id").as("a"), col("sh").as("sha"),
      col("nsh").as("na"))
    val jb = base.select(col("doc_id").as("b"), col("sh").as("shb"),
      col("nsh").as("nb"))
    val inter = size(array_intersect(col("sha"), col("shb"))).cast("long")
    // multiply-before-divide ((1e4*inter)/union) for oracle-SQL bit parity
    cand.join(ja, "a").join(jb, "b")
      .select(col("a"), col("b"),
        round(lit(10000.0) * inter / (col("na") + col("nb") - inter))
          .cast("long").as("jacc_i4"))
      .filter(col("jacc_i4") >= math.round(threshold * 10000))
  }

  /** MinHash signatures (id, sig[numHashes]) via a typed map (integer
    * polynomial hashes — see Hashes; SQL-replicable). */
  def minhashSignatures(docs: DataFrame, numHashes: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, Hashes.minhashSig(t, numHashes)) }
      .toDF("doc_id", "sig")
  }

  /** LSH near-dup pairs: band the signature (rows = numHashes/bands per
    * band), bucket-join, confirm with exact Jaccard ≥ threshold. */
  def minhashLshPairs(docs: DataFrame, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, dfCapForVerify: Long = 1000L): DataFrame = {
    require(numHashes % bands == 0)
    val rows = numHashes / bands
    // Docs with no shingles (< 3 tokens) would keep the Long.MaxValue
    // sentinel in every signature slot, and the band-key fold below would
    // overflow int64 (ANSI mode throws). They can't be near-dups of
    // anything (empty shingle set), so drop them before signing — this
    // also mirrors the SQL oracle, where empty lists vanish via UNNEST.
    val sigs = minhashSignatures(
      docs.filter(size(shingleArr(col("text"))) > 0), numHashes)
    // band key: polynomial fold of the band's rows, mod 2^40 so the fold
    // never overflows int64 (acc < 2^40, x P2 < 2^60). For rows = 2 the
    // mod is the identity (P2^2 < 2^40), which keeps the SQL oracle's
    // plain h0*P2 + h1 formula bit-identical. Key collisions only add
    // candidates, which the exact-Jaccard verify filters.
    val keyMod = 1L << 40
    val bandKey = (b: Int) => (0 until rows)
      .map(r => get(col("sig"), lit(b * rows + r)))
      .reduce((x, y) => pmod(x * lit(Hashes.P2) + y, lit(keyMod)))
    val bandRows = (0 until bands).map { b =>
      sigs.select(col("doc_id"), lit(b).as("band"), bandKey(b).as("key"))
    }.reduce(_ union _)
    val cand = bandRows.select(col("band"), col("key"), col("doc_id").as("a"))
      .join(bandRows.select(col("band"), col("key"), col("doc_id").as("b")),
        Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val base = docs
      .select(col("doc_id"), shingleArr(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"), size(col("sh")).cast("long").as("nsh"))
    jaccardVerify(cand, base, threshold)
  }

  /** (doc_id, simhash) — 32-bit SimHash of widened token strhashes. */
  def simhashes(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, Hashes.simhash32(t.split(" ").toSeq)) }
      .toDF("doc_id", "simhash")
  }

  /** (a, b, hamming): pairs within Hamming distance maxHamming. Banding
    * into 4 bands of 8 bits guarantees (pigeonhole) that any pair with
    * ≤ 3 differing bits shares a full band, so the banded join returns
    * EXACTLY what a quadratic scan would at maxHamming ≤ 3 — without the
    * quadratic scan. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x8-bit banding guarantees recall only to 3")
    val sims = simhashes(docs)
    val banded = (0 until 4).map { b =>
      sims.select(col("doc_id"), col("simhash"), lit(b).as("band"),
        shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L)).as("key"))
    }.reduce(_ union _)
    val cand = banded.select(col("band"), col("key"),
        col("doc_id").as("a"), col("simhash").as("ha"))
      .join(banded.select(col("band"), col("key"),
        col("doc_id").as("b"), col("simhash").as("hb")), Seq("band", "key"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
      .distinct()
    cand.filter(col("hamming") <= maxHamming)
  }

  /** (a, b, cos_i4): embedding near-duplicates with cosine ≥ threshold.
    * Quadratic baseline (fine to ~10^4 vectors); the LSH-bucketed scale
    * path is Similarity.lshNearDup. */
  def embeddingNearDup(emb: DataFrame, threshold: Double = 0.3): DataFrame = {
    val withNorm = emb.select(col("vec_id"), col("embedding"),
      Similarity.dot(col("embedding"), col("embedding")).as("nrm"))
    val a = withNorm.select(col("vec_id").as("a"), col("embedding").as("ea"),
      col("nrm").as("na"))
    val b = withNorm.select(col("vec_id").as("b"), col("embedding").as("eb"),
      col("nrm").as("nb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(lit(10000.0) * Similarity.dot(col("ea"), col("eb")) /
          (sqrt(col("na")) * sqrt(col("nb")))).cast("long").as("cos_i4"))
      .filter(col("cos_i4") >= math.round(threshold * 10000))
  }
}
