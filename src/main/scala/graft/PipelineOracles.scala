package graft

import graft.operators.TextAnalysis

/**
 * DuckDB oracle SQL for the training-data pipeline queries. The hash
 * formulas mirror [[graft.functions.Hashes]] term for term (positional
 * polynomials over ASCII codes, all < 2^63), and every float-valued output
 * is scaled/rounded to int64 with multiply-before-divide operation order so
 * both engines produce bit-identical values.
 */
object PipelineOracles {

  /** strhash of a string column expression `s` (1-based char positions). */
  private def strhashSql(s: String): String =
    s"(list_sum(list_transform(range(1, length($s)+1), " +
      s"i -> ascii($s[i]) * (((i*i)%251)+i))) % 1000003)"

  /** Distinct word-trigram shingle list of a token-list expression `t`. */
  private def shingleSql(t: String): String =
    s"list_distinct(list_transform(range(0, len($t)-2), " +
      s"i -> $t[i+1] || ' ' || $t[i+2] || ' ' || $t[i+3]))"

  val textTokens: String =
    """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  val textQuality: String = {
    val stops = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id,
       |  CAST(len(t) AS BIGINT) AS n_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  CAST(ROUND(10000.0 * len(list_filter(t, x -> x IN ($stops))) / len(t)) AS BIGINT) AS stop_ratio_i4,
       |  CAST(ROUND(10000.0 * (length(text) - len(t) + 1) / len(t)) AS BIGINT) AS avg_token_len_i4
       |FROM (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents) x
       |ORDER BY doc_id""".stripMargin
  }

  /** Mirrors TextAnalysis.langId's left fold (first-wins on ties). */
  val textLangId: String = {
    val markers = TextAnalysis.LangMarkers
    val counts = markers.map { case (lang, ms) =>
      s"len(list_filter(t, x -> x IN (${ms.map(m => s"'$m'").mkString(", ")}))) AS $lang"
    }.mkString(",\n  ")
    // fold: best = en; for each next lang, replace iff strictly greater
    var bestVal = markers.head._1
    var bestLab = s"'${markers.head._1}'"
    markers.tail.foreach { case (lang, _) =>
      bestLab = s"CASE WHEN $lang > $bestVal THEN '$lang' ELSE $bestLab END"
      bestVal = s"CASE WHEN $lang > $bestVal THEN $lang ELSE $bestVal END"
    }
    val total = markers.map(_._1).mkString(" + ")
    s"""WITH c AS (SELECT doc_id,
       |  $counts
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) x)
       |SELECT doc_id,
       |  CASE WHEN $total = 0 THEN 'und' ELSE ($bestLab) END AS pred_lang
       |FROM c ORDER BY doc_id""".stripMargin
  }

  val textFingerprint: String =
    s"""SELECT doc_id,
       |  CAST(list_sum(list_transform(string_split(text, ' '),
       |    (t, j) -> ${strhashSql("t")} * (((j-1) % 16) + 1))) % 1000003 AS BIGINT) AS fp
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Same digest grouping as Dedup.exact: md5 hex + length, never the
    * raw text bytes. */
  val dedupExact: String =
    """SELECT keep_id, n_docs FROM (
      |  SELECT MIN(doc_id) AS keep_id, CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY md5(text), length(text)) g
      |ORDER BY keep_id""".stripMargin

  /** Shared CTE prefix: per-doc distinct shingle lists + sizes. */
  private val shingleBase: String =
    s"""base AS MATERIALIZED (
       |  SELECT doc_id, ${shingleSql("t")} AS sh
       |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents) x
       |  WHERE len(t) >= 3),
       |sizes AS MATERIALIZED (
       |  SELECT doc_id, sh, CAST(len(sh) AS BIGINT) AS nsh FROM base
       |  WHERE len(sh) > 0)""".stripMargin

  /** Exact integer threshold test (1e4·inter ≥ t4·union) — mirrors the
    * engine's Dedup.jaccardCount filter; jacc_i4 is still the rounded
    * report value. */
  private def jaccardVerifySql(thresholdI4: Long): String =
    s"""SELECT a, b, jacc_i4 FROM (
       |  SELECT cand.a, cand.b,
       |    CAST(ROUND(10000.0 * len(list_intersect(sa.sh, sb.sh))
       |      / (sa.nsh + sb.nsh - len(list_intersect(sa.sh, sb.sh)))) AS BIGINT) AS jacc_i4,
       |    10000 * len(list_intersect(sa.sh, sb.sh)) AS lhs,
       |    $thresholdI4 * (sa.nsh + sb.nsh - len(list_intersect(sa.sh, sb.sh))) AS rhs
       |  FROM cand
       |  JOIN sizes sa ON cand.a = sa.doc_id
       |  JOIN sizes sb ON cand.b = sb.doc_id) z
       |WHERE lhs >= rhs ORDER BY a, b""".stripMargin

  /** Naive quadratic re-derivation (every pair, exact integer threshold):
    * the engine's prefix-filtered join must return EXACTLY this set — the
    * oracle independently proves the filter's recall, not just its
    * precision. */
  def dedupNgram(thresholdI4: Long = 5000): String =
    s"""WITH $shingleBase,
       |cand AS MATERIALIZED (
       |  SELECT x.doc_id AS a, y.doc_id AS b
       |  FROM sizes x JOIN sizes y ON x.doc_id < y.doc_id)
       |${jaccardVerifySql(thresholdI4)}""".stripMargin

  /** MinHash LSH (numHashes=8, bands=4, rows=2) + exact-Jaccard confirm. */
  def dedupMinhash(thresholdI4: Long = 5000): String =
    s"""WITH $shingleBase,
       |shs AS MATERIALIZED (
       |  SELECT doc_id, CAST(${strhashSql("s")} AS BIGINT) AS x
       |  FROM (SELECT doc_id, UNNEST(sh) AS s FROM base) u),
       |mh AS MATERIALIZED (
       |  SELECT doc_id, r.k, MIN(((2*r.k+3)*x + r.k*r.k+7) % 1000033) AS h
       |  FROM shs CROSS JOIN range(0, 8) r(k) GROUP BY doc_id, r.k),
       |bandk AS MATERIALIZED (
       |  SELECT doc_id, k // 2 AS band,
       |    MAX(CASE WHEN k % 2 = 0 THEN h END) * 1000033
       |      + MAX(CASE WHEN k % 2 = 1 THEN h END) AS key
       |  FROM mh GROUP BY doc_id, k // 2),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bandk x JOIN bandk y
       |  ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
       |${jaccardVerifySql(thresholdI4)}""".stripMargin

  /** Near-dup survivor groups: the MinHash-LSH verified pairs collapsed
    * by k unrolled min-label rounds over the pair graph; every document
    * gets (doc_id, keep_id = min doc of its component, itself when it
    * has no near-dups). Mirrors Dedup.survivorsFixed over
    * Dedup.minhashLshPairs. */
  def dedupSurvivors(thresholdI4: Long = 5000, k: Int = 8): String = {
    val rounds = (1 to k).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT p.id, LEAST(p.c, COALESCE(m.mc, p.c)) AS c
         |  FROM s${i - 1} p
         |  LEFT JOIN (
         |    SELECT e.dst AS id, MIN(s.c) AS mc
         |    FROM sym e JOIN s${i - 1} s ON e.src = s.id
         |    GROUP BY e.dst) m ON p.id = m.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $shingleBase,
       |shs AS MATERIALIZED (
       |  SELECT doc_id, CAST(${strhashSql("s")} AS BIGINT) AS x
       |  FROM (SELECT doc_id, UNNEST(sh) AS s FROM base) u),
       |mh AS MATERIALIZED (
       |  SELECT doc_id, r.k, MIN(((2*r.k+3)*x + r.k*r.k+7) % 1000033) AS h
       |  FROM shs CROSS JOIN range(0, 8) r(k) GROUP BY doc_id, r.k),
       |bandk AS MATERIALIZED (
       |  SELECT doc_id, k // 2 AS band,
       |    MAX(CASE WHEN k % 2 = 0 THEN h END) * 1000033
       |      + MAX(CASE WHEN k % 2 = 1 THEN h END) AS key
       |  FROM mh GROUP BY doc_id, k // 2),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bandk x JOIN bandk y
       |  ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |prs AS MATERIALIZED (
       |  SELECT a, b FROM (${jaccardVerifySql(thresholdI4)}) jv),
       |sym AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM prs
       |  UNION ALL SELECT b AS src, a AS dst FROM prs),
       |s0 AS MATERIALIZED (
       |  SELECT id, id AS c FROM (SELECT DISTINCT src AS id FROM sym) v),
       |$rounds
       |SELECT d.doc_id, COALESCE(s$k.c, d.doc_id) AS keep_id
       |FROM documents d LEFT JOIN s$k ON d.doc_id = s$k.id
       |ORDER BY d.doc_id""".stripMargin
  }

  private val simhashCte: String =
    s"""tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents),
       |th AS MATERIALIZED (SELECT doc_id,
       |  CAST((${strhashSql("t")} * 2654435761) % 4294967296 AS BIGINT) AS h FROM tok),
       |bits AS (SELECT doc_id, r.b, SUM(((h // (1::BIGINT << b)) % 2) * 2 - 1) AS s
       |         FROM th CROSS JOIN range(0, 32) r(b) GROUP BY doc_id, r.b),
       |sim AS MATERIALIZED (
       |  SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bits GROUP BY doc_id)""".stripMargin

  def dedupSimhash(maxHamming: Int = 3): String =
    s"""WITH $simhashCte
       |SELECT x.doc_id AS a, y.doc_id AS b,
       |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
       |FROM sim x JOIN sim y ON x.doc_id < y.doc_id
       |WHERE bit_count(xor(x.simhash, y.simhash)) <= $maxHamming
       |ORDER BY a, b""".stripMargin

  private val embBase: String =
    """e AS MATERIALIZED (
      |  SELECT vec_id, embedding,
      |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS nrm
      |  FROM embeddings)""".stripMargin

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a.embedding)+1), " +
      s"i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))"

  def embTopK(k: Int = 5, maxQueryId: Long = 10): String =
    s"""WITH $embBase,
       |s AS MATERIALIZED (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    CAST(ROUND(10000.0 * ${dotSql("q", "c")} / (sqrt(q.nrm) * sqrt(c.nrm))) AS BIGINT) AS cos_i4
       |  FROM e q JOIN e c ON q.vec_id < $maxQueryId AND q.vec_id <> c.vec_id)
       |SELECT query_id, neighbor_id, cos_i4, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos_i4 DESC, neighbor_id ASC) AS BIGINT) AS rank FROM s) z
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Sign-LSH bucket CTEs: the SAME float-rounded hyperplane literals the
    * engine bakes into its plan (graft.functions.Planes), dotted with the
    * embedding by an index lambda — the identical double sequence as the
    * engine's FloatDot, so bucket values match bit-for-bit. `dim` must
    * match the corpus (driver tables: 64). */
  private def lshBucketCtes(bits: Int, dim: Int, seed: Long = 42L): String =
    s"""planes(p, v) AS (VALUES
       |${graft.functions.Planes.sqlValues(bits, dim, seed)}),
       |buck AS MATERIALIZED (
       |  SELECT e.vec_id,
       |    CAST(SUM(CASE WHEN list_sum(list_transform(range(1, len(e.embedding)+1),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * p.v[i])) > 0
       |      THEN (1::BIGINT << p.p) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM e CROSS JOIN planes p GROUP BY e.vec_id)""".stripMargin

  /** LSH near-dup: same-bucket pairs, exact cosine ≥ threshold. */
  def embLshNearDup(thresholdI4: Long = 3000, bits: Int = 8,
      dim: Int = 64): String =
    s"""WITH $embBase,
       |${lshBucketCtes(bits, dim)}
       |SELECT a, b, cos_i4 FROM (
       |  SELECT x.vec_id AS a, y.vec_id AS b,
       |    CAST(ROUND(10000.0 * ${dotSql("x", "y")} / (sqrt(x.nrm) * sqrt(y.nrm))) AS BIGINT) AS cos_i4
       |  FROM (SELECT e.*, b.bucket FROM e JOIN buck b USING (vec_id)) x
       |  JOIN (SELECT e.*, b.bucket FROM e JOIN buck b USING (vec_id)) y
       |  ON x.bucket = y.bucket AND x.vec_id < y.vec_id) z
       |WHERE cos_i4 >= $thresholdI4 ORDER BY a, b""".stripMargin

  /** ANN top-k: multi-table multi-probe sign-LSH candidates (the query's
    * bucket + every Hamming-1 bucket, per hash table), exact cosine
    * re-rank (ties → smaller neighbor id). Mirrors Similarity.annTopK. */
  def embAnnTopK(k: Int = 5, maxQueryId: Long = 10, bits: Int = 4,
      tables: Int = 4, dim: Int = 64): String =
    s"""WITH $embBase,
       |planes(t, p, v) AS (VALUES
       |${graft.functions.Planes.sqlValuesTables(tables, bits, dim)}),
       |buck AS MATERIALIZED (
       |  SELECT e.vec_id, p.t,
       |    CAST(SUM(CASE WHEN list_sum(list_transform(range(1, len(e.embedding)+1),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * p.v[i])) > 0
       |      THEN (1::BIGINT << p.p) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM e CROSS JOIN planes p GROUP BY e.vec_id, p.t),
       |probes AS MATERIALIZED (
       |  SELECT vec_id AS query_id, t,
       |    CASE WHEN r.j = 0 THEN bucket
       |         ELSE xor(bucket, (1::BIGINT << (r.j - 1))) END AS bucket
       |  FROM buck CROSS JOIN range(0, ${bits + 1}) r(j)
       |  WHERE vec_id < $maxQueryId),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT pr.query_id, b.vec_id AS neighbor_id
       |  FROM probes pr JOIN buck b ON pr.t = b.t AND pr.bucket = b.bucket
       |  WHERE pr.query_id <> b.vec_id),
       |s AS MATERIALIZED (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    CAST(ROUND(10000.0 * ${dotSql("q", "c")} / (sqrt(q.nrm) * sqrt(c.nrm))) AS BIGINT) AS cos_i4
       |  FROM cand
       |  JOIN e q ON cand.query_id = q.vec_id
       |  JOIN e c ON cand.neighbor_id = c.vec_id)
       |SELECT query_id, neighbor_id, cos_i4, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos_i4 DESC, neighbor_id ASC) AS BIGINT) AS rank FROM s) z
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  val eventsWindow: String =
    """SELECT date_trunc('hour', ts) AS hour, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(ROUND(10000.0 * SUM(value)) AS BIGINT) AS sum_value_i4
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** The generation side of the multimodal contract
    * (Multimodal.imgDims): the engine must RECOVER these dimensions from
    * real PNG bytes via ImageIO, the oracle predicts them from doc_id. */
  val multimodalMeta: String =
    """SELECT doc_id,
      |  CAST(16 + (doc_id % 32) AS BIGINT) AS width,
      |  CAST(16 + ((doc_id * 7) % 24) AS BIGINT) AS height,
      |  'png' AS format
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Gap-based sessionization re-derived relationally: a session break is
    * a > gap-minute silence per user (events ordered by ts, value —
    * mirroring EventStream.sessionize's sort); sessions are the cumulative
    * sum of breaks. Tie order among equal (ts, value) rows cannot change
    * session membership, so the grouping is deterministic. */
  def streamSessions(gapMinutes: Int): String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT user_id, ts, value,
       |    CASE WHEN LAG(ts) OVER w IS NULL
       |           OR epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > ${gapMinutes * 60000L}
       |         THEN 1 ELSE 0 END AS brk
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, value)),
       |s AS MATERIALIZED (
       |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, value
       |    ROWS UNBOUNDED PRECEDING) AS sid FROM e)
       |SELECT user_id,
       |  epoch_ms(MIN(ts)) AS session_start_ms,
       |  epoch_ms(MAX(ts)) AS session_end_ms,
       |  CAST(COUNT(*) AS BIGINT) AS n_events,
       |  CAST(ROUND(10000.0 * SUM(value)) AS BIGINT) AS sum_value_i4
       |FROM s GROUP BY user_id, sid
       |ORDER BY user_id, session_start_ms""".stripMargin

  /** Mirrors Multimodal.frameCount/frameDims with stride-2 sampling. */
  val multimodalFrames: String =
    """SELECT doc_id, CAST(f AS BIGINT) AS frame_no,
      |  CAST(16 + ((doc_id + 3*f) % 32) AS BIGINT) AS width,
      |  CAST(12 + ((doc_id * 7 + f) % 24) AS BIGINT) AS height
      |FROM (SELECT doc_id, UNNEST(range(0, 1 + doc_id % 7)) AS f
      |      FROM documents) z
      |WHERE f % 2 = 0 ORDER BY doc_id, frame_no""".stripMargin
}
