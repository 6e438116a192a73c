package graft.pipeline

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL / domain curation layer (SURVEY.md §2c #36) — the first pass
  * every web-crawl corpus build runs (RefinedWeb / CCNet shape):
  * per-registrable-domain mass accounting for source weighting and
  * blocklists, and canonical-URL exact dedup (the same page fetched
  * under scheme-case, `www.`, default-port, trailing-slash and
  * tracking-parameter variants is ONE document).
  *
  * Both operators are map-only parses feeding one hash aggregate
  * (domain-keyed / canonical-URL-keyed) — no joins, no windows over
  * raw rows, nothing that grows with anything but the key count, so
  * the formulation runs unchanged at crawl scale. Every string rule
  * stays inside the Java↔RE2-safe regex subset (char classes, anchors,
  * no lookaround) so Spark and the DuckDB oracle parse identical
  * spans — the text_strip_markup precedent.
  *
  * The synthetic corpus has no url column, so the driver-visible
  * entries first ATTACH one deterministically from doc_id
  * ([[withUrl]], the strip_markup/piiScrub dirtying precedent): 120
  * canonical pages spread over 7 hosts / 4 registrable domains, each
  * re-fetched under every decoration the canonicalizer must undo —
  * the oracle rebuilds identical URLs. [[canonicalizeUrl]] /
  * [[parsedUrls]] are the reusable surfaces for real crawls. */
object Urls {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir))

  /** Canonical-page count for the synthetic URL attachment: doc_ids
    * congruent mod [[UrlPages]] are fetches of the SAME page under
    * different decorations (variant index v = doc_id div UrlPages). */
  val UrlPages = 120

  /** Attach a deterministic synthetic `url` column: page identity g =
    * doc_id % [[UrlPages]] fixes everything canonical (host choice,
    * path, a real ?id= param on every 5th page, a genuine :8080
    * non-default port on every 13th); the variant index v = doc_id div
    * [[UrlPages]] drives only what canonicalization must remove —
    * scheme/host case, a `www.` prefix, the default :443 port, a
    * trailing slash, and utm_* tracking params. */
  private[pipeline] def withUrl(d: DataFrame): DataFrame = {
    val g = col("doc_id") % UrlPages
    val v = expr(s"doc_id div $UrlPages")
    val gs = g.cast("string")
    val dom = when(g % 7 === 0, lit("example.com"))
      .when(g % 7 === 1, lit("news.example.com"))
      .when(g % 7 === 2, lit("blog.sample.org"))
      .when(g % 7 === 3, lit("data.sample.org"))
      .when(g % 7 === 4, lit("archive.test-site.net"))
      .when(g % 7 === 5, lit("cdn.test-site.net"))
      .otherwise(lit("wiki.demo.io"))
    val host0 = concat(when(v % 2 === 1, lit("www.")).otherwise(lit("")), dom)
    val url = concat(
      when(v % 2 === 0, lit("https://")).otherwise(lit("HTTPS://")),
      when(v % 3 === 0, upper(host0)).otherwise(host0),
      when(g % 13 === 0, lit(":8080")).when(v % 4 === 2, lit(":443")).otherwise(lit("")),
      lit("/articles/"), gs,
      when(v % 3 === 1, lit("/")).otherwise(lit("")),
      when(g % 5 === 0 && v % 2 === 0, concat(lit("?id="), gs, lit("&utm_source=feed")))
        .when(g % 5 === 0, concat(lit("?id="), gs))
        .when(v % 2 === 0, lit("?utm_source=feed&utm_campaign=x"))
        .otherwise(lit("")))
    d.withColumn("url", url)
  }

  /** The shared SQL rendering of [[withUrl]] (oracle side). */
  private def withUrlSql: String =
    s"""base AS (
       |  SELECT doc_id, text, doc_id % $UrlPages AS g, doc_id // $UrlPages AS v
       |  FROM documents),
       |hosts AS (
       |  SELECT doc_id, text, g, v,
       |    (CASE WHEN v % 2 = 1 THEN 'www.' ELSE '' END) ||
       |    (CASE g % 7 WHEN 0 THEN 'example.com' WHEN 1 THEN 'news.example.com'
       |       WHEN 2 THEN 'blog.sample.org' WHEN 3 THEN 'data.sample.org'
       |       WHEN 4 THEN 'archive.test-site.net' WHEN 5 THEN 'cdn.test-site.net'
       |       ELSE 'wiki.demo.io' END) AS host0
       |  FROM base),
       |urls AS (
       |  SELECT doc_id, text,
       |    (CASE WHEN v % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END) ||
       |    (CASE WHEN v % 3 = 0 THEN upper(host0) ELSE host0 END) ||
       |    (CASE WHEN g % 13 = 0 THEN ':8080' WHEN v % 4 = 2 THEN ':443' ELSE '' END) ||
       |    '/articles/' || CAST(g AS VARCHAR) ||
       |    (CASE WHEN v % 3 = 1 THEN '/' ELSE '' END) ||
       |    (CASE WHEN g % 5 = 0 AND v % 2 = 0 THEN '?id=' || CAST(g AS VARCHAR) || '&utm_source=feed'
       |         WHEN g % 5 = 0 THEN '?id=' || CAST(g AS VARCHAR)
       |         WHEN v % 2 = 0 THEN '?utm_source=feed&utm_campaign=x'
       |         ELSE '' END) AS url
       |  FROM hosts)""".stripMargin

  /** Lower-cased scheme of a url column ('' when unparseable). */
  private def schemeOf(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z]+)://", 1))

  /** The NORMALIZED AUTHORITY every host/port rule reads: userinfo
    * stripped ('u@example.com' → 'example.com', so credentialed crawl
    * variants collapse with the bare page), lower-cased, leading
    * `www.` stripped — in that order, BEFORE any port logic, so host
    * and port are always decomposed from the same string. (The
    * UrlCanonPropertySpec idempotency sweep caught the alternative:
    * with www-stripping after the port strip, 'www.[::1]:8080'
    * defeated the bracket-aware strip but still fed the port
    * extractor, and canonicalization APPENDED a duplicate ':8080' on
    * every pass.) */
  private def normAuth(url: Column): Column =
    regexp_replace(
      lower(regexp_replace(
        regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1), "^[^/?#]*@", "")),
      "^www\\.", "")

  /** Canonical host: [[normAuth]] minus a clean `:port` suffix. The
    * strip is bracket-aware (an IPv6 literal '[::1]:443' → '[::1]')
    * and anchored to a WHOLE host:port form — a malformed remainder
    * ('host:abc', 'host:1:2') is left untouched, and [[portOf]] uses
    * the SAME anchored form, so whatever this keeps, that never
    * extracts: no append-without-strip drift. */
  private def hostOf(url: Column): Column =
    regexp_replace(normAuth(url), "^(\\[[^\\]]*\\]|[^:]*?):[0-9]+$", "$1")

  /** Numeric port of a clean host:port authority, '' otherwise —
    * the extraction twin of [[hostOf]]'s strip. */
  private def portOf(url: Column): Column =
    regexp_extract(normAuth(url), "^(?:\\[[^\\]]*\\]|[^:]*?):([0-9]+)$", 1)

  /** CANONICAL URL of any url column — the dedup key. Rules (each one
    * a variant the same page is crawled under):
    *  - scheme and host lower-cased; leading `www.` dropped;
    *  - default port for the scheme dropped (https:443 / http:80),
    *    any other port kept;
    *  - trailing slashes stripped from the path;
    *  - query params whose name starts `utm_` dropped (tracking), the
    *    rest kept in original order; an emptied query loses its `?`;
    *  - fragments never reach the server — everything from `#` on is
    *    stripped FIRST, so a `?` inside a fragment
    *    (`https://h/p#sec?x=1`) never becomes a query. */
  def canonicalizeUrl(url: Column): Column = {
    val preFragment = regexp_replace(url, "#.*$", "")
    val scheme = schemeOf(url)
    val port = portOf(url)
    val keptPort = when(port === "", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/+$", "")
    val q = array_join(
      filter(split(regexp_extract(preFragment, "\\?(.*)", 1), "&"),
        p => length(p) > 0 && substring(p, 1, 4) =!= "utm_"),
      "&")
    // unparseable input (no scheme, OR a scheme with an empty/absent
    // authority — relative links, 'https:///x', junk frontier entries)
    // falls back to the trimmed original: exact duplicates still
    // collapse, nothing is silently rewritten, and distinct junk is
    // never merged into one bare 'scheme://' key
    val host = hostOf(url)
    when(scheme === "" || host === "", trim(url)).otherwise(
      concat(scheme, lit("://"), host, keptPort, path,
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** The canonicalization CTE chain shared by both oracles — the SQL
    * twin of [[canonicalizeUrl]]/[[hostOf]], rule for rule. */
  private def canonSql: String =
    """parts AS (
      |  SELECT doc_id, text, url,
      |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
      |    regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1) AS hostport,
      |    regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/+$', '') AS path,
      |    COALESCE(array_to_string(list_filter(string_split(regexp_extract(regexp_replace(url, '#.*$', ''), '\?(.*)', 1), '&'),
      |      p -> len(p) > 0 AND substr(p, 1, 4) <> 'utm_'), '&'), '') AS q
      |  FROM urls),
      |auths AS (
      |  SELECT *, regexp_replace(lower(regexp_replace(hostport, '^[^/?#]*@', '')), '^www\.', '') AS auth
      |  FROM parts),
      |canon AS (
      |  SELECT doc_id, text, url, scheme,
      |    regexp_replace(auth, '^(\[[^\]]*\]|[^:]*?):[0-9]+$', '\1') AS host,
      |    regexp_extract(auth, '^(?:\[[^\]]*\]|[^:]*?):([0-9]+)$', 1) AS port, path, q
      |  FROM auths),
      |curl AS (
      |  SELECT doc_id, text, host,
      |    CASE WHEN scheme = '' OR host = '' THEN trim(url) ELSE
      |    scheme || '://' || host ||
      |    (CASE WHEN port = '' THEN ''
      |         WHEN scheme = 'https' AND port = '443' THEN ''
      |         WHEN scheme = 'http' AND port = '80' THEN ''
      |         ELSE ':' || port END) ||
      |    path ||
      |    (CASE WHEN q = '' THEN '' ELSE '?' || q END) END AS canonical_url
      |  FROM canon)""".stripMargin

  /** Parse + canonicalize a frame carrying a `url` column: adds
    * `host` (canonical), `domain` (registrable: last two labels — the
    * public-suffix-list-free approximation every first-pass crawl
    * audit starts with) and `canonical_url`. Map-only; reusable over
    * any real crawl frame. */
  def parsedUrls(d: DataFrame): DataFrame = {
    val url = col("url")
    d.withColumn("host", hostOf(url))
      .withColumn("domain", regexp_extract(col("host"), "([^.]+\\.[^.]+)$", 1))
      .withColumn("canonical_url", canonicalizeUrl(url))
  }

  // ------------------------------------------------------------ #36 corpus_url_stats

  /** PER-REGISTRABLE-DOMAIN corpus mass — the crawl-curation first
    * pass: docs, distinct canonical hosts, whitespace-token mass and
    * its corpus share per domain. The share is what a source-weighting
    * / blocklist decision reads (a domain carrying 40% of the tokens
    * dominates training); n_hosts separates a single hot host from a
    * broad subdomain farm. One map-side parse + one domain-keyed
    * aggregate; the share's global total comes from an unpartitioned
    * window OVER THE DOMAIN-GRAIN AGGREGATE (bounded by the domain
    * count), never over raw rows. */
  def urlStats(spark: SparkSession, dir: String): DataFrame =
    parsedUrls(withUrl(docs(spark, dir)))
      .withColumn("n_toks",
        size(graft.functions.Tokens.tokens(col("text"))).cast("long"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum(col("n_toks")).as("n_tokens"))
      .withColumn("token_share", round(
        col("n_tokens").cast("double") /
          sum(col("n_tokens")).over(org.apache.spark.sql.expressions.Window.partitionBy())
            .cast("double"), 6))
      .select(col("domain"), col("n_docs"), col("n_hosts"), col("n_tokens"),
        col("token_share"))
      .orderBy(col("domain"))

  val urlStatsSql: String =
    s"""WITH $withUrlSql,
       |$canonSql,
       |toks AS (
       |  SELECT doc_id, host,
       |    regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain,
       |    CAST(len(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) AS BIGINT) AS n_toks
       |  FROM curl),
       |agg AS (
       |  SELECT domain, COUNT(*) AS n_docs, COUNT(DISTINCT host) AS n_hosts,
       |    CAST(SUM(n_toks) AS BIGINT) AS n_tokens
       |  FROM toks GROUP BY domain)
       |SELECT domain, n_docs, n_hosts, n_tokens,
       |  round(CAST(n_tokens AS DOUBLE) / CAST(SUM(n_tokens) OVER () AS DOUBLE), 6) AS token_share
       |FROM agg ORDER BY domain""".stripMargin

  // ------------------------------------------------------------ #36b dedup_url_canonical

  /** CANONICAL-URL EXACT DEDUP — [[Dedup.exact]]'s shape keyed on
    * [[canonicalizeUrl]] instead of a content digest: every
    * canonical page with its fetch count and keeper (min doc_id).
    * Catches the re-crawl duplicates content hashing only finds
    * AFTER paying to fetch and store the body; at crawl scale this
    * runs on the URL frontier BEFORE fetching. One map-side
    * canonicalization + one canonical-url-keyed aggregate (map-side
    * partial combine collapses variants before the exchange). */
  def urlCanonicalDedup(spark: SparkSession, dir: String): DataFrame =
    parsedUrls(withUrl(docs(spark, dir)))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("canonical_doc_id"))
      .orderBy(col("canonical_doc_id"))

  val urlCanonicalDedupSql: String =
    s"""WITH $withUrlSql,
       |$canonSql
       |SELECT canonical_url, COUNT(*) AS n_copies, MIN(doc_id) AS canonical_doc_id
       |FROM curl GROUP BY canonical_url ORDER BY canonical_doc_id""".stripMargin

  /** The `dom AS (...)` CTE both doc-grain operators below share:
    * (doc_id, registrable domain) off the canonical host. */
  private def domSql: String =
    s"""dom AS (
       |  SELECT doc_id, regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain
       |  FROM curl)""".stripMargin

  // ------------------------------------------------------------ #36c corpus_url_blocklist

  /** Registrable domains dropped by the blocklist filter. A real
    * deployment feeds a 10k-entry list; the mechanics are identical —
    * a literal relation, broadcast-anti-joined. */
  val BlockedDomains = Seq("sample.org", "demo.io")

  /** DOMAIN-BLOCKLIST FILTER — the crawl-curation kill switch: docs
    * whose registrable domain is on the blocklist are dropped, the
    * rest pass with their domain attached. The blocklist is a literal
    * LocalRelation (bounded by construction, so its forced broadcast
    * is sanctioned by the plan guard's walk) anti-joined against the
    * map-side-parsed domain — no shuffle of the corpus at all: the
    * broadcast anti-join fuses into the scan. */
  def urlBlocklist(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blocked = BlockedDomains.toDF("domain")
    parsedUrls(withUrl(docs(spark, dir)))
      .select(col("doc_id"), col("host"), col("domain"))
      .join(broadcast(blocked), Seq("domain"), "left_anti")
      .select(col("doc_id"), col("domain"), col("host"))
      .orderBy(col("doc_id"))
  }

  val urlBlocklistSql: String =
    s"""WITH $withUrlSql,
       |$canonSql,
       |$domSql
       |SELECT d.doc_id, d.domain, c.host
       |FROM dom d JOIN curl c ON d.doc_id = c.doc_id
       |WHERE d.domain NOT IN (${BlockedDomains.map(b => s"'$b'").mkString(", ")})
       |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------------ #36d corpus_domain_cap

  /** Per-domain doc cap. */
  val DomainCapK = 40

  /** PER-DOMAIN DOC CAP — the C4/RefinedWeb anti-monoculture rule:
    * keep at most [[DomainCapK]] docs per registrable domain (first
    * [[DomainCapK]] by doc_id — deterministic; a production run ranks
    * by a quality score, same plan). Output carries the in-domain
    * rank and the domain's total so the drop rate is visible (no
    * silent caps).
    *
    * Plan: the round-3 TWO-STAGE top-N — (1) rank within
    * (domain, input-partition) and prune to ≤ K per slice (bounded
    * window partitions; only a slice's top-K can be in the global
    * top-K), (2) rank the ≤ K·P survivors per domain (a lone-domain
    * window is legitimate HERE: it sits above the stage-1 reducer,
    * never over raw docs — a viral domain contributes K rows per
    * slice, not its whole corpus), (3) equi-join the domain totals
    * (domain-keyed aggregate; no broadcast hint — the domain universe
    * is DATA-sized on a real crawl, so AQE must decide). NOT
    * DistributedRanks: its offsets broadcast is (groups × partitions)
    * rows — bounded metadata for few-valued keys (source, label),
    * corpus-sized for crawl domains. */
  /** The two-stage per-domain top-K prune shared by [[urlDomainCap]]
    * and [[webFunnel]] — ONE copy so the skew posture can't silently
    * diverge between the standalone operator and the funnel stage:
    * rank within (domain, input-partition) and prune to ≤ K per slice
    * (bounded tasks — a viral domain contributes K rows per slice,
    * never its whole corpus), then rank the ≤ K·P survivors per
    * domain. Keeps every input column, adds `domain_rank`. */
  private def domainCapped(d: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wLocal = Window.partitionBy(col("domain"), col("pid")).orderBy(col("doc_id"))
    val wDomain = Window.partitionBy(col("domain")).orderBy(col("doc_id"))
    d.withColumn("pid", spark_partition_id())
      .withColumn("lrn", row_number().over(wLocal))
      .filter(col("lrn") <= DomainCapK)
      .withColumn("domain_rank", row_number().over(wDomain))
      .filter(col("domain_rank") <= DomainCapK)
      .drop("pid", "lrn")
  }

  def urlDomainCap(spark: SparkSession, dir: String): DataFrame = {
    val parsed = parsedUrls(withUrl(docs(spark, dir)))
      .select(col("doc_id"), col("domain"))
    val counts = parsed.groupBy(col("domain")).agg(count(lit(1)).as("domain_docs"))
    domainCapped(parsed)
      .join(counts, Seq("domain"))
      .select(col("doc_id"), col("domain"),
        col("domain_rank").cast("long").as("domain_rank"), col("domain_docs"))
      .orderBy(col("doc_id"))
  }

  val urlDomainCapSql: String =
    s"""WITH $withUrlSql,
       |$canonSql,
       |$domSql,
       |ranked AS (
       |  SELECT doc_id, domain,
       |    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS domain_rank,
       |    COUNT(*) OVER (PARTITION BY domain) AS domain_docs
       |  FROM dom)
       |SELECT doc_id, domain, domain_rank, domain_docs
       |FROM ranked WHERE domain_rank <= $DomainCapK ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ #36e corpus_web_funnel

  /** THE WEB-CURATION FUNNEL — the round's operators composed in the
    * order a RefinedWeb/CCNet-style build runs them, with the
    * per-stage mass accounting every curation report leads with
    * (docs and token mass surviving each stage):
    *
    *  1. `all`         — the fetched corpus;
    *  2. `blocklist`   — registrable domain not on the blocklist
    *                     (broadcast anti-join, corpus never shuffles);
    *  3. `domain_cap`  — at most [[DomainCapK]] docs per domain
    *                     (two-stage top-N over the SURVIVORS — the cap
    *                     ranks what the blocklist kept);
    *  4. `line_dedup`  — docs retaining at least one line after
    *                     corpus-level boilerplate removal
    *                     ([[TextAnalysis.cleanedDocs]]; the hot-line
    *                     relation is computed over the FULL corpus —
    *                     boilerplate is a corpus property, not a
    *                     survivor property);
    *  5. `exact_dedup` — one doc per md5 of the CLEANED text (min
    *                     doc_id keeper) — dedup after cleaning, so
    *                     docs differing only in boilerplate collapse.
    *
    * Each stage is the already-audited plan of its standalone
    * operator; the funnel adds only 1-row global aggregates and
    * doc-keyed equi-joins. The two frames that feed both a stage
    * count and the next stage's input are checkpointed so the window
    * stages run once. */
  def webFunnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // checkpointed: this widest map-side pass (URL parse + tokenize)
    // feeds the stage-1 count, the blocklist survivors' count AND the
    // cap stage — without the checkpoint it would re-run three times
    val parsed = parsedUrls(withUrl(docs(spark, dir)))
      .withColumn("n_toks",
        size(graft.functions.Tokens.tokens(col("text"))).cast("long"))
      .select(col("doc_id"), col("domain"), col("n_toks"))
      .localCheckpoint()
    val s1 = parsed.join(broadcast(BlockedDomains.toDF("domain")), Seq("domain"), "left_anti")
    val s2 = domainCapped(s1)
      .select(col("doc_id"), col("domain"), col("n_toks"))
      .localCheckpoint()
    val s3 = s2.join(
        TextAnalysis.cleanedDocs(spark, dir)
          .filter(col("n_lines") > col("n_removed"))
          .select(col("doc_id"), col("clean_text")),
        Seq("doc_id"))
      .localCheckpoint()
    val keepers = s3.select(col("doc_id"), md5(col("clean_text")).as("dg"))
      .groupBy(col("dg")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val s4 = s3.join(keepers, Seq("doc_id"))
    def stage(no: Int, name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_toks")), lit(0L)).as("n_tokens"))
        .select(lit(no).as("stage_no"), lit(name).as("stage"),
          col("n_docs"), col("n_tokens"))
    stage(1, "all", parsed)
      .unionAll(stage(2, "blocklist", s1))
      .unionAll(stage(3, "domain_cap", s2))
      .unionAll(stage(4, "line_dedup", s3))
      .unionAll(stage(5, "exact_dedup", s4))
      .orderBy(col("stage_no"))
  }

  val webFunnelSql: String =
    s"""WITH $withUrlSql,
       |$canonSql,
       |$domSql,
       |${TextAnalysis.lineCtesSql},
       |tokc AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(lower(text), ' '), t -> len(t) > 0)) AS BIGINT) AS n_toks
       |  FROM documents),
       |p AS (
       |  SELECT d.doc_id, d.domain, t.n_toks FROM dom d JOIN tokc t USING (doc_id)),
       |s1 AS (
       |  SELECT * FROM p
       |  WHERE domain NOT IN (${BlockedDomains.map(b => s"'$b'").mkString(", ")})),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY domain ORDER BY doc_id) AS rn FROM s1),
       |s2 AS (SELECT doc_id, domain, n_toks FROM r WHERE rn <= $DomainCapK),
       |s3 AS (
       |  SELECT s2.doc_id, s2.n_toks, c.clean_text
       |  FROM s2 JOIN cleaned c USING (doc_id) WHERE c.n_lines > c.n_removed),
       |keepers AS (
       |  SELECT MIN(doc_id) AS doc_id
       |  FROM (SELECT doc_id, md5(clean_text) AS dg FROM s3) GROUP BY dg),
       |s4 AS (SELECT s3.* FROM s3 JOIN keepers USING (doc_id))
       |SELECT * FROM (
       |  SELECT 1 AS stage_no, 'all' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) AS n_tokens FROM p
       |  UNION ALL SELECT 2, 'blocklist', CAST(COUNT(*) AS BIGINT),
       |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM s1
       |  UNION ALL SELECT 3, 'domain_cap', CAST(COUNT(*) AS BIGINT),
       |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM s2
       |  UNION ALL SELECT 4, 'line_dedup', CAST(COUNT(*) AS BIGINT),
       |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM s3
       |  UNION ALL SELECT 5, 'exact_dedup', CAST(COUNT(*) AS BIGINT),
       |    CAST(COALESCE(SUM(n_toks), 0) AS BIGINT) FROM s4)
       |ORDER BY stage_no""".stripMargin
}
