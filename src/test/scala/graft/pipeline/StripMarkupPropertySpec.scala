package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized invariant check for [[TextAnalysis.stripMarkupOn]] —
  * the UrlCanonPropertySpec pattern applied to the markup stripper
  * (r11 directive #6). Seeded markup-shaped strings (tags, broken
  * tags, script blocks, entities, entity-encoded markup, chained
  * entities, whitespace runs), checked against:
  *
  *  - NO SCRIPT SURVIVES: the clean text never matches ScriptRe,
  *    including the entity-encoded "&lt;script&gt;evil()…" class the
  *    sweep caught in round 12 (payload used to decode into a
  *    live-looking script block; fixed by a post-decode script pass).
  *  - IDEMPOTENT on the entity-free class: strip∘strip ≡ strip for
  *    every input without entities. (Entity decode itself is ONE
  *    LEVEL PER PASS — HTML semantics, browsers likewise — so
  *    double-encoded input is the documented non-fixpoint class, and
  *    decoded "1 < 2 > 0" text may be tag-shaped by design.)
  *  - NORMAL FORM: trimmed, no whitespace runs, never longer than
  *    the input.
  *  - PASS-THROUGH: markup-free input comes back as its own
  *    whitespace-collapsed self.
  *  - EXACT COUNTS: n_tags / n_entities equal a local regex model. */
class StripMarkupPropertySpec extends SparkSpec {

  private val tagRe = java.util.regex.Pattern.compile(TextAnalysis.TagRe)
  private val scriptRe = java.util.regex.Pattern.compile(TextAnalysis.ScriptRe)
  private val entityRe = java.util.regex.Pattern.compile(TextAnalysis.EntityRe)

  private def gen(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val toks = Seq("hello", "world", "x", "1", "<b>", "</b>", "<a href='x'>", "<>",
      "<broken", "only>", "&amp;", "&lt;", "&gt;", "&nbsp;", "&amp;lt;", "&amp;amp;",
      "<script>var x=1;</script>", "<script>unclosed",
      "&lt;script&gt;evil()&lt;/script&gt;", "a<b", "b>c", "  ", "\t", "\n",
      "Tom&amp;Jerry", "&lt;3", "<p class=\"x\">")
    (1 to n).map(_ => (0 until rnd.nextInt(13)).map(_ => toks(rnd.nextInt(toks.length))).mkString(" "))
  }

  private def strip(texts: Seq[String]): Seq[(String, String, Long, Long)] = {
    import spark.implicits._
    TextAnalysis.stripMarkupOn(texts.toDF("text"), "text")
      .select(col("text"), col("clean_text"), col("n_tags"), col("n_entities"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
  }

  test("seeded sweep: no script survives, entity-free idempotency, normal form, exact counts") {
    val inputs = gen(42, 600) ++ gen(7, 600)
    val once = strip(inputs)
    val twice = strip(once.map(_._2)).map(_._2)
    once.zip(twice).foreach { case ((raw, clean, nTags, nEnts), clean2) =>
      // script payloads never survive, whatever the encoding level here
      assert(!scriptRe.matcher(clean).find(), s"script in clean of: $raw -> $clean")
      assert(!clean.contains("evil()") && !clean.contains("var x=1"),
        s"script payload leaked: $raw -> $clean")
      // normal form
      assert(clean == clean.trim && !clean.contains("  ") && !clean.contains("\t")
        && !clean.contains("\n"), s"whitespace not normalized: '$clean'")
      assert(clean.length <= raw.length, s"clean grew: '$raw' -> '$clean'")
      // exact counts vs the local model
      def count(p: java.util.regex.Pattern, s: String): Long = {
        val m = p.matcher(s); var c = 0L; while (m.find()) c += 1; c
      }
      assert(nTags == count(tagRe, raw), s"n_tags off for: $raw")
      assert(nEnts == count(entityRe, raw), s"n_entities off for: $raw")
      // idempotency on the entity-free class (entities decode one
      // level per pass by design — see scaladoc)
      if (!entityRe.matcher(raw).find()) {
        assert(clean2 == clean, s"not idempotent (entity-free): '$raw' -> '$clean' -> '$clean2'")
        assert(!tagRe.matcher(clean).find(), s"tag in entity-free clean: '$raw' -> '$clean'")
      }
      // markup-free input passes through collapsed
      if (!tagRe.matcher(raw).find() && !entityRe.matcher(raw).find() && !raw.contains("<script"))
        assert(clean == raw.replaceAll("\\s+", " ").trim, s"pass-through broke: '$raw'")
    }
  }

  test("the round-12 finding, pinned: entity-encoded script decodes WITHOUT its payload") {
    val out = strip(Seq("&lt;script&gt;evil()&lt;/script&gt; safe text",
      "pre &lt;script&gt;document.cookie&lt;/script&gt; post"))
    assert(out(0)._2 == "safe text", out(0)._2)
    assert(out(1)._2 == "pre post", out(1)._2)
    // while decoded NON-script text is what the page displayed — keep it
    val keep = strip(Seq("Tom &amp; Jerry say 1 &lt; 2 &gt; 0 &lt;3"))
    assert(keep(0)._2 == "Tom & Jerry say 1 < 2 > 0 <3", keep(0)._2)
  }
}
