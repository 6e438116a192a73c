package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spec for [[Urls]] — SURVEY §2c #36: canonicalization rules pinned
  * one by one on literal URLs, then the corpus-level stats/dedup
  * invariants the oracle hash can't articulate. */
class UrlsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(Urls.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalization rules, one literal URL per rule") {
    assert(canon(
      "HTTPS://Example.COM/a",             // scheme+host case
      "https://www.example.com/a",         // www strip
      "https://example.com:443/a",         // default https port drop
      "http://example.com:80/a",           // default http port drop
      "http://example.com:443/a",          // 443 is NOT http's default → kept
      "https://example.com:8080/a",        // non-default port kept
      "https://example.com/a/",            // trailing slash strip
      "https://example.com/a///",          // ...even repeated
      "https://example.com/a?utm_source=x&id=7&utm_b=y", // utm strip keeps order
      "https://example.com/a?utm_source=x",// emptied query loses '?'
      "https://example.com/a?id=7#frag",   // fragment drop
      "https://example.com/a#frag",        // fragment drop, no query
      "  /relative/link  ",                // unparseable → trimmed as-is
      "not a url at all",                  // unparseable → unchanged
      "https:///a",                        // scheme but EMPTY authority → as-is
      "https:///b",                        // ...must NOT collapse with /a
      "https://?q=1",                      // empty authority, query only
      "HTTPS://:8080/x"                    // port-only authority → as-is
    ) == Seq(
      "https://example.com/a",
      "https://example.com/a",
      "https://example.com/a",
      "http://example.com/a",
      "http://example.com:443/a",
      "https://example.com:8080/a",
      "https://example.com/a",
      "https://example.com/a",
      "https://example.com/a?id=7",
      "https://example.com/a",
      "https://example.com/a?id=7",
      "https://example.com/a",
      "/relative/link",
      "not a url at all",
      "https:///a",
      "https:///b",
      "https://?q=1",
      "HTTPS://:8080/x"))
  }

  test("canonicalization edge cases: fragment-embedded '?', userinfo, IPv6") {
    assert(canon(
      "https://h/p#sec?x=1",                // '?' INSIDE a fragment is not a query
      "https://h/p?a=1#sec?x=2",            // real query survives, fragment '?' doesn't
      "https://u@example.com/a",            // userinfo collapses with the bare host
      "https://u:pw@example.com/a",         // ...including password form
      "https://example.com/a",              // the bare host those collapse WITH
      "https://[::1]:8080/a",               // IPv6 literal keeps non-default port
      "https://[::1]:443/a",                // IPv6 default port drop
      "https://[2001:db8::1]/a",            // IPv6, no port: colons survive intact
      "https://example.com:abc/a"           // malformed port → left as-is in host
    ) == Seq(
      "https://h/p",
      "https://h/p?a=1",
      "https://example.com/a",
      "https://example.com/a",
      "https://example.com/a",
      "https://[::1]:8080/a",
      "https://[::1]/a",
      "https://[2001:db8::1]/a",
      "https://example.com:abc/a"))
  }

  test("url stats: registrable domains, shares sum to 1, host counts") {
    val rows = Urls.urlStats(spark, dir).collect()
    val domains = rows.map(_.getAs[String]("domain")).toSeq
    assert(domains == Seq("demo.io", "example.com", "sample.org", "test-site.net"))
    // registrable = exactly two labels
    assert(domains.forall(_.count(_ == '.') == 1))
    assert(math.abs(rows.map(_.getAs[Double]("token_share")).sum - 1.0) < 1e-5)
    // two hosts feed every domain except the single-host demo.io
    val hosts = rows.map(r => r.getAs[String]("domain") -> r.getAs[Long]("n_hosts")).toMap
    assert(hosts == Map("demo.io" -> 1L, "example.com" -> 2L,
      "sample.org" -> 2L, "test-site.net" -> 2L))
    assert(rows.map(_.getAs[Long]("n_docs")).sum == 500L)
  }

  test("blocklist: blocked domains gone, survivors partition the corpus, anti-join broadcast") {
    val kept = Urls.urlBlocklist(spark, dir)
    val rows = kept.collect()
    assert(rows.forall(r => !Urls.BlockedDomains.contains(r.getAs[String]("domain"))))
    // kept + blocked partition the corpus exactly
    val stats = Urls.urlStats(spark, dir).collect()
      .map(r => r.getAs[String]("domain") -> r.getAs[Long]("n_docs")).toMap
    val blockedDocs = Urls.BlockedDomains.map(stats).sum
    assert(rows.length.toLong == 500L - blockedDocs)
    // the literal blocklist broadcasts; the corpus side never shuffles
    val phys = kept.queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin") && phys.contains("LeftAnti"), phys)
  }

  test("domain cap: at most K per domain, ranks contiguous from 1, totals honest") {
    val rows = Urls.urlDomainCap(spark, dir).collect()
    val byDom = rows.groupBy(_.getAs[String]("domain"))
    val stats = Urls.urlStats(spark, dir).collect()
      .map(r => r.getAs[String]("domain") -> r.getAs[Long]("n_docs")).toMap
    assert(byDom.keySet == stats.keySet)
    byDom.foreach { case (dom, rs) =>
      val expectedKept = math.min(Urls.DomainCapK.toLong, stats(dom))
      assert(rs.length.toLong == expectedKept, s"$dom kept ${rs.length}")
      // ranks are exactly 1..kept under doc_id order (the global rank
      // DistributedRanks promises), and the domain total is honest
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      assert(sorted.map(_.getAs[Long]("domain_rank")).toSeq ==
        (1L to expectedKept))
      assert(rs.forall(_.getAs[Long]("domain_docs") == stats(dom)))
    }
  }

  test("web funnel: stages agree with the standalone operators and only ever shrink") {
    val f = Urls.webFunnel(spark, dir).collect()
      .map(r => r.getAs[String]("stage") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens")))).toMap
    assert(f.keySet == Set("all", "blocklist", "domain_cap", "line_dedup", "exact_dedup"))
    assert(f("all")._1 == 500L)
    // stage 2 matches the standalone blocklist operator; stage 3 caps
    // the SURVIVORS (the funnel order), so its expectation comes from
    // the per-domain masses of the non-blocked domains
    assert(f("blocklist")._1 == Urls.urlBlocklist(spark, dir).count())
    val survivorCap = Urls.urlStats(spark, dir).collect()
      .filterNot(r => Urls.BlockedDomains.contains(r.getAs[String]("domain")))
      .map(r => math.min(Urls.DomainCapK.toLong, r.getAs[Long]("n_docs"))).sum
    assert(f("domain_cap")._1 == survivorCap)
    // monotone: a funnel never grows, in docs or tokens
    val order = Seq("all", "blocklist", "domain_cap", "line_dedup", "exact_dedup")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(f(b)._1 <= f(a)._1, s"$b docs grew over $a")
      assert(f(b)._2 <= f(a)._2, s"$b tokens grew over $a")
    }
    assert(f("exact_dedup")._1 > 0L)
  }

  test("canonical dedup: every synthetic variant collapses; members congruent mod UrlPages") {
    val d = Urls.urlCanonicalDedup(spark, dir).collect()
    // 500 docs over 120 pages → every page a group, every doc in one
    assert(d.length == Urls.UrlPages)
    assert(d.map(_.getAs[Long]("n_copies")).sum == 500L)
    // keeper is the page id itself (min doc_id ≡ g), groups of 4-5
    d.foreach { r =>
      val keeper = r.getAs[Long]("canonical_doc_id")
      assert(keeper < Urls.UrlPages)
      val n = r.getAs[Long]("n_copies")
      assert(n >= 4L && n <= 5L, s"page $keeper has $n copies")
    }
    // the canonical string carries the g-derived invariants: the
    // non-default port survives exactly on the 13-divisible pages
    d.foreach { r =>
      val keeper = r.getAs[Long]("canonical_doc_id")
      val c = r.getAs[String]("canonical_url")
      assert(c.contains(":8080") == (keeper % 13 == 0), c)
      assert(c.contains("?id=") == (keeper % 5 == 0), c)
      assert(!c.contains("utm_") && !c.contains("www.") && c == c.toLowerCase, c)
    }
  }
}
