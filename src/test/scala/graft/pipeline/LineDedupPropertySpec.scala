package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Randomized fixpoint check for the line-dedup core (r11 directive
  * #6): on seeded corpora with viral boilerplate, rare shared lines,
  * and repeated-within-doc lines,
  *
  *  - removed lines are EXACTLY those whose distinct-doc frequency
  *    exceeds MaxLineDf (a local model recomputes the hot set);
  *  - surviving lines keep their original order;
  *  - re-running the pass on its own reassembled output REMOVES
  *    NOTHING (hot-line removal takes every occurrence, so survivor
  *    document frequencies are unchanged) — the invariant that lets
  *    a crawl pipeline re-clean previously cleaned shards safely. */
class LineDedupPropertySpec extends SparkSpec {

  private def mkLined(docs: Seq[(Long, Seq[String])]): DataFrame = {
    import spark.implicits._
    docs.flatMap { case (id, lines) =>
      lines.zipWithIndex.map { case (l, p) => (id, p, l) }
    }.toDF("doc_id", "pos", "line")
  }

  private def run(docs: Seq[(Long, Seq[String])]): Map[Long, (Long, Long, String)] =
    TextAnalysis.dedupLines(mkLined(docs)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  private def gen(seed: Int): Seq[(Long, Seq[String])] = {
    val rnd = new scala.util.Random(seed)
    val viral = Seq("subscribe now", "all rights reserved", "cookie notice")
    val shared = (1 to 8).map(i => s"shared line $i")       // df stays ≤ threshold
    val nDocs = 40
    (0 until nDocs).map { d =>
      val unique = (0 to rnd.nextInt(4)).map(i => s"doc $d body line $i")
      val maybeShared = shared.filter(_ => rnd.nextInt(6) == 0) // ~7 docs each
      val maybeViral = viral.filter(_ => rnd.nextInt(10) > 0)   // ~36 docs each
      // repeat a line within the same doc sometimes: df counts
      // DISTINCT docs, so this must not tip a line over the threshold
      val rep = if (rnd.nextBoolean()) unique.take(1) else Nil
      (d.toLong, rnd.shuffle(unique ++ maybeShared ++ maybeViral ++ rep))
    }
  }

  test("seeded sweep: removal ≡ df model, order kept, re-run is a no-op") {
    for (seed <- Seq(11, 23, 57)) {
      val docs = gen(seed)
      // local model: distinct-doc frequency per line
      val df = docs.flatMap { case (d, ls) => ls.distinct.map(_ -> d) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val hot = df.filter(_._2 > TextAnalysis.MaxLineDf).keySet
      assert(hot.nonEmpty, s"seed $seed generated no hot lines — generator broken")
      assert(df.exists { case (l, f) => f > 1 && f <= TextAnalysis.MaxLineDf },
        s"seed $seed generated no shared-but-cold lines")
      val out = run(docs)
      docs.foreach { case (d, lines) =>
        val (nLines, nRemoved, clean) = out(d)
        assert(nLines == lines.length, s"seed $seed doc $d n_lines")
        assert(nRemoved == lines.count(hot), s"seed $seed doc $d n_removed")
        val expect = lines.filterNot(hot).mkString("\n")
        assert(clean == expect, s"seed $seed doc $d order/content:\n$clean\nvs\n$expect")
      }
      // FIXPOINT: re-run on the reassembled survivors — nothing removed
      val relined = out.toSeq.map { case (d, (_, _, clean)) =>
        (d, clean.split("\n").toSeq.filter(_.nonEmpty))
      }
      val again = run(relined)
      relined.foreach { case (d, lines) =>
        val (n2, removed2, clean2) = again(d)
        assert(removed2 == 0L, s"seed $seed doc $d: re-run removed $removed2 lines")
        assert(n2 == lines.length && clean2 == lines.mkString("\n"),
          s"seed $seed doc $d: re-run changed content")
      }
    }
  }
}
