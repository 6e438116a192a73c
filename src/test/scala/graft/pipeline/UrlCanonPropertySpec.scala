package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized invariant check for [[Urls.canonicalizeUrl]] — the
  * properties a dedup key must have, on arbitrary URL-shaped strings
  * (seeded, so failures reproduce):
  *
  *  - IDEMPOTENT: canon(canon(u)) == canon(u). Without this, the
  *    batch dedup (over raw URLs) and the streaming frontier (which
  *    may see an already-canonicalized URL re-emitted by an upstream
  *    normalizer) would disagree on the key.
  *  - NORMAL FORM: a parseable canonical URL never carries a
  *    fragment, a utm_ parameter, userinfo, a www. prefix, a default
  *    port, an upper-case scheme/host, or a trailing slash.
  *  - VARIANT COLLAPSE: decorating a canonical URL with any
  *    combination of fragment / utm params / default port / www. /
  *    case noise / trailing slashes canonicalizes back to it. */
class UrlCanonPropertySpec extends SparkSpec {

  private def canon(urls: Seq[String]): Seq[String] = {
    import spark.implicits._
    urls.toDF("url").select(Urls.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  /** URL-shaped generator: scheme/userinfo/host-case/www/port/path/
    * slashes/query(with and without utm)/fragment all randomized;
    * ~1 in 12 strings is deliberate junk. */
  private def genUrls(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))
    (1 to n).map { _ =>
      if (rnd.nextInt(12) == 0)
        pick(Seq("not a url", "  /rel/path ", "https:///", "://x", "", "just#frag?q=1"))
      else {
        val scheme = pick(Seq("http", "https", "HTTP", "Https", "ftp"))
        val user = if (rnd.nextInt(5) == 0) pick(Seq("u@", "u:pw@")) else ""
        val www = if (rnd.nextBoolean()) "www." else ""
        val host = pick(Seq("example.com", "Sub.Example.COM", "demo.io", "[::1]", "x-y.net"))
        val port = pick(Seq("", ":80", ":443", ":8080"))
        val path = pick(Seq("", "/", "/a", "/a/b", "/a/b/", "/a//", "/a%20b"))
        val q = pick(Seq("", "?id=1", "?utm_source=x", "?id=1&utm_c=2", "?utm_a=1&utm_b=2", "?a=1&b=2"))
        val frag = pick(Seq("", "#top", "#sec?x=1", "#a&b"))
        s"$scheme://$user$www$host$port$path$q$frag"
      }
    }
  }

  test("canonicalization is idempotent on arbitrary URL-shaped input (3 seeds)") {
    for (seed <- Seq(1, 7, 42)) {
      val urls = genUrls(seed, 400)
      val once = canon(urls)
      val twice = canon(once)
      once.zip(twice).zip(urls).foreach { case ((c1, c2), raw) =>
        assert(c1 == c2, s"not idempotent for <$raw>: <$c1> -> <$c2>")
      }
    }
  }

  test("parseable canonical URLs are in normal form") {
    val urls = genUrls(99, 600)
    val parseableCanon = canon(urls).filter(_.matches("^[a-z]+://[^/?#]+.*"))
    assert(parseableCanon.nonEmpty)
    parseableCanon.foreach { c =>
      assert(!c.contains("#"), c)
      assert(!c.contains("utm_"), c)
      val authority = c.replaceFirst("^[a-z]+://", "").takeWhile(ch => ch != '/' && ch != '?')
      assert(!authority.contains("@"), c)
      assert(!authority.startsWith("www."), c)
      // only the SCHEME'S default port is dropped — :80 on https (or
      // :443 on http) is a real non-default port and must survive
      if (c.startsWith("http://")) assert(!authority.endsWith(":80"), c)
      if (c.startsWith("https://")) assert(!authority.endsWith(":443"), c)
      assert(authority == authority.toLowerCase, c)
      val path = c.replaceFirst("^[a-z]+://[^/?#]+", "").takeWhile(_ != '?')
      assert(path.isEmpty || !path.endsWith("/"), c)
    }
  }

  test("decorated variants of a canonical URL collapse back to it") {
    val rnd = new scala.util.Random(5)
    val bases = canon(genUrls(3, 200)).distinct
      .filter(_.matches("^https?://[a-z0-9\\[\\]:.-]+(/[^?#]*)?(\\?.*)?$"))
    assert(bases.size > 20)
    val decorated = bases.map { b =>
      val (pre, frag) = (b, "#reDecorated?x=1")
      val hostEnd = pre.indexOf("://") + 3
      val withWww = pre.take(hostEnd) + "www." + pre.drop(hostEnd)
      val variant = rnd.nextInt(3) match {
        case 0 => withWww + frag
        case 1 => (if (pre.contains('?')) pre + "&utm_k=v" else pre + "?utm_k=v") + frag
        case _ =>
          val rest = pre.drop(hostEnd)
          val hostLen = rest.takeWhile(c => c != '/' && c != '?').length
          pre.take(hostEnd) + rest.take(hostLen).toUpperCase + rest.drop(hostLen) + frag
      }
      (b, variant)
    }
    canon(decorated.map(_._2)).zip(decorated).foreach { case (got, (b, v)) =>
      assert(got == b, s"variant <$v> of <$b> canonicalized to <$got>")
    }
  }
}
