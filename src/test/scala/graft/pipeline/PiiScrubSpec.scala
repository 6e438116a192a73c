package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** piiScrubOn contract on handcrafted dirty text: per-class counts,
  * span-exact redaction (surrounding text untouched), clean docs pass
  * through identical, and multiple matches of one class all redact. */
class PiiScrubSpec extends SparkSpec {

  test("detects and redacts emails, IPv4s and phones; clean text unchanged") {
    import spark.implicits._
    val docs = Seq(
      (1L, "reach me at alice.smith+spam@sub-domain.example.org or bob@x.io thanks"),
      (2L, "server 192.168.0.1 and backup 10.0.255.77 are down"),
      (3L, "call +1-555-0199 immediately"),
      (4L, "mixed: eve@corp.com from 172.16.3.9 call +1-555-7000 now"),
      (5L, "nothing sensitive here, just words and 42 numbers"),
      (6L, "not-an-ip 1.2.3 and not-an-email foo@bar stay put")
    ).toDF("doc_id", "text")

    val out = TextAnalysis.piiScrubOn(docs, "text")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "pii_total", "clean_text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)), r.getString(5))).toMap

    assert(out(1L)._1 == ((2L, 0L, 0L, 2L)))
    assert(out(1L)._2 == "reach me at <EMAIL> or <EMAIL> thanks")
    assert(out(2L)._1 == ((0L, 2L, 0L, 2L)))
    assert(out(2L)._2 == "server <IP> and backup <IP> are down")
    assert(out(3L)._1 == ((0L, 0L, 1L, 1L)))
    assert(out(3L)._2 == "call <PHONE> immediately")
    assert(out(4L)._1 == ((1L, 1L, 1L, 3L)))
    assert(out(4L)._2 == "mixed: <EMAIL> from <IP> call <PHONE> now")
    assert(out(5L)._1 == ((0L, 0L, 0L, 0L)))
    assert(out(5L)._2 == "nothing sensitive here, just words and 42 numbers")
    // 3-octet string and TLD-less address must NOT match
    assert(out(6L)._1 == ((0L, 0L, 0L, 0L)))
    assert(out(6L)._2 == "not-an-ip 1.2.3 and not-an-email foo@bar stay put")
  }

  test("driver entry dirties deterministically: counts follow the modular schedule") {
    val got = TextAnalysis.piiScrub(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_emails", "n_ips", "n_phones")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (id, e, ip, ph) =>
      assert(e == (if (id % 3 == 0) 1L else 0L), s"doc $id emails")
      assert(ip == (if (id % 4 == 0) 1L else 0L), s"doc $id ips")
      assert(ph == (if (id % 5 == 0) 1L else 0L), s"doc $id phones")
    }
  }

  test("no detectable PII survives scrubbing, even on adversarial chained inputs") {
    import spark.implicits._
    // the leak shapes a one-pass redactor can get wrong: chained '@'s
    // (a half-consumed email leaving 'EMAIL@w.com'-style bait — the
    // replacement token's closing '>' is what breaks local-part
    // adjacency, so this spec is the guard that keeps the token
    // bracketed), long dotted-digit runs (leftovers must be caught as
    // subsequent non-overlapping matches in the SAME pass), PII
    // touching token boundaries, and seeded random concatenations
    val rnd = new scala.util.Random(11)
    val parts = Seq(
      "x@y.zz@w.com", "zz@a@b.com", "@a@b.com", "a@b.com@",
      "1.2.3.4.5.6.7.8", "255.255.255.255.255", "1.2.3.4.500",
      "+1-555-12345", "+1-555-+1-555-1234", "a@1.2.3.4.com",
      "plain words ", "a@b.com", "10.0.0.1", "+1-555-0000")
    val nasty = (1 to 300).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(5) + 1)(parts(rnd.nextInt(parts.length)))
        .mkString(rnd.nextInt(3) match { case 0 => "" case 1 => " " case _ => "." }))
    }
    val scrubbed = TextAnalysis.piiScrubOn(
      nasty.toDF("doc_id", "text"), "text")
      .select(col("doc_id"), col("clean_text"))
    // re-running detection on the scrubbed text must find NOTHING
    val leaks = TextAnalysis.piiScrubOn(scrubbed, "clean_text")
      .filter(col("pii_total") > 0)
      .select(col("doc_id"), col("clean_text"))
      .collect()
    assert(leaks.isEmpty,
      leaks.take(5).map(r => s"${r.getLong(0)}: <${r.getString(1)}>").mkString("\n"))
  }
}
