package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The Common-Crawl-style `pages` input surface mandated by BASELINE.json's
 * input_hint: `(url: string, warc_ts: timestamp, html: binary, text: string,
 * lang: string)`.
 *
 * The reference consumes pre-densified `.gr` files (FileGraph.cpp:47) and has
 * NO html ingest; this layer is our engine's new ingest front-end, so the
 * extraction semantics are defined HERE, precisely, and the deterministic
 * generator writes the `text` column through the very same
 * [[Extract.text]] function — the per-row invariant "byte-identical
 * extracted text per url" is then checkable by re-deriving text from html.
 *
 * Synthesis is pure per-row hashing (splitmix64) of (seed, id): no RNG
 * state, no wall clock — the same (n, seed) yields the same table at any
 * parallelism, and generation is fully distributed via spark.range(n).
 *
 * Embedded link structure (power-law out-links like the reference's rmat*
 * test graphs) with the FIXTURES.md §3 edge cases at reserved ids:
 *   0          dangling (no out-links)
 *   1,2,3      directed triangle 1→2→3→1
 *   4,5,6,7    K4 (all 12 directed pairs)
 *   8          hub: out-degree ≫ the 512-edge tile size
 *   9          self-loop + duplicate links (dropped by clean)
 *   10         aliased links: same target via fragment / trailing-slash
 *              variants → one edge after normalization
 *   11         isolated vertex (no out-links, never targeted)
 *   12,13      two-vertex component 12→13 (never targeted from outside)
 *   14…n-1     1 + (h mod 16) out-links, targets skewed quadratically
 *              toward low ids (power-law in-degree)
 */
object Pages {

  /** splitmix64 — public-domain mixing constants (Steele et al.). */
  def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def h(seed: Long, id: Long, k: Long): Long = mix(seed ^ mix(id) ^ mix(k))
  private def pos(x: Long): Long = x & Long.MaxValue

  val Langs: Array[String] = Array("en", "de", "fr", "es")
  private val Vocab: Array[String] = Array(
    "graph", "vertex", "edge", "rank", "walk", "crawl", "page", "link",
    "web", "index", "query", "score", "node", "path", "degree", "label")

  def url(id: Long): String = s"https://host-${id % 64}.example/p/$id"

  /** Reserved ids that must never be random link targets. */
  private val NeverTarget = Set(11L, 12L, 13L)

  /** Out-link TARGET IDS of page `id` — the ground-truth link structure
    * (multi-edges/self-loops included; cleaning is the graph layer's job).
    * `avgOut` widens the random tier's degree for big benchmark corpora;
    * the default 8 (degree 1 + h mod 16) is the fixture shape. */
  def linkTargets(id: Long, n: Long, seed: Long, avgOut: Int = 8): Seq[Long] =
    id match {
      case 0L | 11L | 13L => Seq.empty
      case 1L => Seq(2L)
      case 2L => Seq(3L)
      case 3L => Seq(1L)
      case k if k >= 4 && k <= 7 => (4L to 7L).filter(_ != k)
      case 8L =>
        // hub: ~600 targets (> EDGE_TILE_SIZE 512 of the reference)
        val m = math.min(n - 1, 600L)
        (0L until m).map(i => pickTarget(seed, 8L, i, n))
      case 9L => Seq(9L, 10L, 10L) // self-loop + duplicate
      case 10L => Seq(9L, 9L)      // two alias forms of the same target
      case 12L => Seq(13L)
      case k =>
        val deg = 1 + (pos(h(seed, k, 1)) % (2L * avgOut)).toInt
        (0 until deg).map(i => pickTarget(seed, k, i.toLong, n))
    }

  /** Intended out-link URLS (pre-normalization html forms) for page `id`. */
  def linkForms(id: Long, n: Long, seed: Long): Seq[String] = id match {
    case 10L =>
      // alias: fragment and trailing-slash variants of the SAME target
      Seq(url(9) + "#frag", url(9) + "/")
    case k => linkTargets(k, n, seed).map(url)
  }

  /** Quadratically low-id-skewed target (power-law in-degree), avoiding
    * the reserved isolated/small-component ids and self. */
  private def pickTarget(seed: Long, src: Long, i: Long, n: Long): Long = {
    var j = i
    while (true) {
      val u = (pos(h(seed, src, 1000 + j)) % 1000000L).toDouble / 1000000.0
      val t = (u * u * n).toLong.min(n - 1)
      if (t != src && !NeverTarget.contains(t)) return t
      j += 7919
    }
    0L
  }

  def textWords(id: Long, seed: Long): String = {
    val len = 8 + (pos(h(seed, id, 2)) % 40).toInt
    (0 until len)
      .map(i => Vocab((pos(h(seed, id, 100 + i)) % Vocab.length).toInt))
      .mkString(" ")
  }

  def htmlFor(id: Long, n: Long, seed: Long): String = {
    val anchors = linkForms(id, n, seed).zipWithIndex
      .map { case (u, i) => s"""<li><a href="$u">ref $i</a></li>""" }
      .mkString("")
    s"""<html><head><title>Page $id</title><meta charset="utf-8"/></head>""" +
      s"""<body><h1>Page $id</h1><p>${textWords(id, seed)}</p>""" +
      s"""<ul>$anchors</ul></body></html>"""
  }

  final case class Page(url: String, warc_ts: java.sql.Timestamp,
      html: Array[Byte], text: String, lang: String)

  /** Fixed corpus epoch: 2024-01-01T00:00:00Z (no wall clock anywhere). */
  val Epoch: Long = 1704067200000L

  /** Direct deterministic synthesis of the RAW edge table (same link
    * structure as the html corpus, in original-id space, duplicates and
    * self-loops included) — for benchmark corpora where materializing html
    * strings would only measure string throughput. Pass through
    * GraphOps.clean before building an adjacency. */
  def synthesizeEdges(spark: SparkSession, n: Long, seed: Long = 42L,
      avgOut: Int = 8, numPartitions: Int = 64): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions).as[Long]
      .flatMap(id => linkTargets(id, n, seed, avgOut).map(t => (id, t)))
      .toDF("src", "dst")
  }

  /** Deterministic distributed synthesis of the pages table. */
  def synthesize(spark: SparkSession, n: Long, seed: Long = 42L,
      numPartitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, numPartitions).as[Long].map { id =>
      val html = htmlFor(id, n, seed)
      Page(
        url = url(id),
        warc_ts = new java.sql.Timestamp(Epoch + id * 1000L),
        html = html.getBytes("UTF-8"),
        text = Extract.text(html.getBytes("UTF-8")),
        lang = Langs((pos(h(seed, id, 3)) % Langs.length).toInt))
    }.toDF()
  }
}

/**
 * Pure extraction functions — the engine's defined parser semantics.
 * Deterministic, UTF-8, no external libs; used both by the generator (to
 * write the expected `text`) and by the engine (to re-derive it), so the
 * byte-identical invariant is testable end to end.
 */
object Extract {

  /** Extracted text := body markup with tags stripped, whitespace runs
    * collapsed to single spaces, trimmed. Head (incl. title) is excluded. */
  def text(html: Array[Byte]): String = {
    val s = new String(html, "UTF-8")
    val bodyStart = s.indexOf("</head>")
    val body = if (bodyStart >= 0) s.substring(bodyStart + 7) else s
    body.replaceAll("<[^>]*>", " ").replaceAll("\\s+", " ").trim
  }

  private val Href = """href="([^"]*)"""".r

  /** Normalize a resolved absolute URL: drop the fragment, strip trailing
    * slashes, lowercase scheme+host. */
  def normalize(u: String): String = {
    val noFrag = { val i = u.indexOf('#'); if (i >= 0) u.substring(0, i) else u }
    val stripped = noFrag.reverse.dropWhile(_ == '/').reverse
    val schemeEnd = stripped.indexOf("://")
    if (schemeEnd < 0) stripped
    else {
      val pathStart = stripped.indexOf('/', schemeEnd + 3)
      if (pathStart < 0) stripped.toLowerCase
      else stripped.substring(0, pathStart).toLowerCase + stripped.substring(pathStart)
    }
  }

  /** Resolve an href against the page url: absolute http(s) kept; leading
    * "/" is host-rooted; anything else resolves against the host root. */
  def resolve(baseUrl: String, href: String): String =
    if (href.startsWith("http://") || href.startsWith("https://")) href
    else {
      val schemeEnd = baseUrl.indexOf("://")
      val pathStart = baseUrl.indexOf('/', schemeEnd + 3)
      val root = if (pathStart < 0) baseUrl else baseUrl.substring(0, pathStart)
      if (href.startsWith("/")) root + href else root + "/" + href
    }

  /** All normalized outgoing link targets of a page, in document order,
    * duplicates preserved (cleaning is the graph layer's job). */
  def links(html: Array[Byte], baseUrl: String): Seq[String] = {
    val s = new String(html, "UTF-8")
    Href.findAllMatchIn(s).map(m => normalize(resolve(baseUrl, m.group(1)))).toSeq
  }
}
