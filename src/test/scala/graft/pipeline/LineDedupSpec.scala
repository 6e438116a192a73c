package graft.pipeline

import graft.SparkSpec

/** text_line_dedup contract: boilerplate lines (df > MaxLineDf
  * distinct docs) are removed from EVERY doc, unique lines survive in
  * original order, counts are honest, and a line repeated WITHIN one
  * doc counts that doc once toward df. */
class LineDedupSpec extends SparkSpec {

  test("corpus run: injected boilerplate removed everywhere, counts and order honest") {
    val rows = TextAnalysis.lineDedup(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val clean = r.getAs[String]("clean_text")
      // the injected newsletter/footer lines are corpus-wide (df 500 /
      // 250 >> MaxLineDf) — they must be gone from every document
      assert(!clean.contains("subscribe to our newsletter today"))
      assert(!clean.contains("all rights reserved"))
      val (n, rem) = (r.getAs[Long]("n_lines"), r.getAs[Long]("n_removed"))
      // every doc lost at least its injected boilerplate (1 or 2 lines)
      val injected = if (r.getAs[Long]("doc_id") % 2 == 0) 2 else 1
      assert(rem >= injected && rem <= n, s"doc ${r.getAs[Long]("doc_id")}: $rem of $n")
      // kept lines = n_lines - n_removed, and clean_text agrees
      val keptLines = if (clean.isEmpty) 0 else clean.split("\n", -1).length
      assert(keptLines == (n - rem).toInt, s"doc ${r.getAs[Long]("doc_id")}")
    }
    // the threshold has teeth both ways: some non-injected content
    // lines survive somewhere (the corpus is not all boilerplate)
    assert(rows.exists(_.getAs[String]("clean_text").nonEmpty))
  }

  test("hot-lines report names the injected boilerplate with honest df") {
    val hot = TextAnalysis.hotLines(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getAs[String]("line") -> r.getAs[Long]("df")).toMap
    // every doc carries the newsletter line, every even doc the footer
    assert(hot("subscribe to our newsletter today") == 500L)
    assert(hot("all rights reserved") == 250L)
    // report and removal use the same threshold: everything reported
    // is above MaxLineDf
    assert(hot.values.forall(_ > TextAnalysis.MaxLineDf))
  }

  test("order preservation: kept lines appear in original chunk order") {
    val rows = TextAnalysis.lineDedup(spark, "/root/testdata/sf0.001").collect()
    // reconstruct doc 1's expected kept lines by brute force
    val doc = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 1L)
      .head().getAs[String]("text")
    val words = doc.split(" ").filter(_.nonEmpty)
    val chunks = words.grouped(TextAnalysis.LineWords).map(_.mkString(" ")).toSeq
    val got = rows.find(_.getAs[Long]("doc_id") == 1L).get
      .getAs[String]("clean_text").split("\n", -1).filter(_.nonEmpty).toSeq
    // kept lines are a SUBSEQUENCE of the original chunks (boilerplate
    // and any corpus-hot chunk removed, order untouched)
    def isSubseq(sub: Seq[String], sup: Seq[String]): Boolean = {
      var i = 0
      sup.foreach { s => if (i < sub.length && sub(i) == s) i += 1 }
      i == sub.length
    }
    assert(isSubseq(got, chunks), s"kept lines not in original order: $got vs $chunks")
  }
}
