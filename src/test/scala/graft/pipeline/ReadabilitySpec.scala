package graft.pipeline

import graft.SparkSpec

/** text_readability contract on handcrafted prose: word / sentence /
  * vowel-group-syllable counts and the Flesch composition, including
  * the no-punctuation floor and the text-level-equals-per-word-sum
  * syllable identity. */
class ReadabilitySpec extends SparkSpec {

  test("counts and Flesch score on handcrafted docs") {
    import spark.implicits._
    val docs = Seq(
      // 6 words, 2 sentence runs, vowel groups: the/cat/sat/a/dog/ran → 6
      (1L, "The cat sat. A dog ran!"),
      // no sentence punctuation: sentence count floors at 1
      (2L, "alpha beta gamma"),
      // multi-vowel-group word: b-eau-t-i-f-u-l → 3 groups
      (3L, "beautiful")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readabilityOn(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(6)))).toMap

    val (w1, s1, y1, f1) = out(1L)
    assert((w1, s1, y1) == ((6L, 2L, 6L)))
    val expected1 = BigDecimal(206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(f1 == expected1)

    val (w2, s2, y2, _) = out(2L)
    assert((w2, s2) == ((3L, 1L)))
    assert(y2 == 6L) // alpha: a,a; beta: e,a; gamma: a,a

    val (w3, s3, y3, _) = out(3L)
    assert((w3, s3, y3) == ((1L, 1L, 3L))) // eau, i, u
  }
}
