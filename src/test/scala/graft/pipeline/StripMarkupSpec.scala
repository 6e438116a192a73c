package graft.pipeline

import graft.SparkSpec

/** stripMarkupOn contract on handcrafted markup: script blocks vanish
  * WITH their payload, tags strip, entities decode, whitespace
  * collapses, counts are exact, and markup-free text passes through
  * (modulo whitespace normalization). */
class StripMarkupSpec extends SparkSpec {

  test("strips tags, removes script payloads, decodes entities") {
    import spark.implicits._
    val docs = Seq(
      (1L, "<html><body><p>hello world</p></body></html>"),
      (2L, "<div>keep</div><script>var secret = 1; leak();</script><p>this</p>"),
      (3L, "Tom &amp; Jerry say 1 &lt; 2 &gt; 0"),
      (4L, "plain text,  already   clean"),
      (5L, "<nav><a href=\"/x\">X</a> | <a href=\"/y\">Y</a></nav> <p>body</p>")
    ).toDF("doc_id", "text")

    val out = TextAnalysis.stripMarkupOn(docs, "text")
      .select("doc_id", "n_tags", "n_entities", "clean_text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)), r.getString(3))).toMap

    assert(out(1L)._2 == "hello world")
    assert(out(1L)._1 == ((6L, 0L)))
    // the script PAYLOAD must not leak into clean text
    assert(out(2L)._2 == "keep this")
    assert(!out(2L)._2.contains("secret"))
    assert(out(3L)._2 == "Tom & Jerry say 1 < 2 > 0")
    assert(out(3L)._1._2 == 3L)
    // markup-free text: untouched except whitespace collapse
    assert(out(4L)._2 == "plain text, already clean")
    assert(out(5L)._2 == "X | Y body")
  }

  test("driver entry: overhead positive, clean text recovers the original") {
    val dir = "/root/testdata/sf0.001"
    val out = TextAnalysis.stripMarkup(spark, dir)
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = out.select("doc_id", "markup_overhead", "clean_text", "n_tags").collect()
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val (id, overhead, clean, nTags) =
        (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3))
      assert(overhead > 0.0, s"doc $id: markup added, overhead must be positive")
      assert(nTags >= 6L, s"doc $id: at least the html/body/p skeleton")
      // the skeleton wrap preserves the document's words: clean text
      // must CONTAIN the whitespace-collapsed original (nav-bar docs
      // prefix "Home | About")
      val collapsed = docs(id).replaceAll("\\s+", " ").trim
      assert(clean.contains(collapsed),
        s"doc $id: clean text lost original content")
      assert(!clean.contains("track();"), s"doc $id: script payload leaked")
    }
  }
}
