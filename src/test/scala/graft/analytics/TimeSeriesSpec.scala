package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral spec for [[TimeSeries]] — the properties the oracle
  * hash can't articulate: z-normalization makes the search
  * scale/offset INVARIANT (an affine copy of a series is distance 0),
  * shape actually discriminates (a reversed series lands in a
  * different word), and the hot-word cap bounds pairing. */
class TimeSeriesSpec extends SparkSpec {

  // user 1: a 2-cycle ramp; user 2: the SAME SHAPE affine-transformed
  // (v' = 3v + 100) — z-identical by construction; user 3: the ramp
  // REVERSED; users 100.. : 52 flat alternators sharing one SAX word
  // (df > MaxWordDf → capped out of pairing).
  private lazy val dir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("tsspec").toString
    import spark.implicits._
    val ramp = Seq(10.0, 20.0, 30.0, 40.0, 10.0, 20.0, 30.0, 40.0)
    def series(uid: Long, vs: Seq[Double]): Seq[(Long, Long, Long, Double)] =
      vs.zipWithIndex.map { case (v, i) => (uid, uid * 1000 + i, 1000000L * (i + 1), v) }
    val rows =
      series(1L, ramp) ++
        series(2L, ramp.map(v => 3 * v + 100)) ++
        series(3L, ramp.reverse) ++
        (100L until 152L).flatMap(u => series(u, Seq.fill(4)(Seq(10.0, 40.0)).flatten))
    rows.toDF("user_id", "event_id", "t_us", "value")
      .withColumn("ts", timestamp_micros(col("t_us"))).drop("t_us")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  test("sax: affine copies share a word, the reversed shape gets the mirrored word") {
    val words = TimeSeries.tsSax(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("sax_word")).toMap
    assert(words(1L) == "adad" && words(2L) == "adad",
      s"z-normalization must erase the affine transform: $words")
    assert(words(3L) == "dada")
    assert(words(100L) == "cccc", "flat alternators sit at the zero-mean symbol")
  }

  test("paa: the affine copy's segment means are bit-equal to the original's") {
    val paa = TimeSeries.tsPaa(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("seg")) -> r.getAs[Double]("paa"))
      .toMap
    (0 until TimeSeries.PaaSegments).foreach { s =>
      assert(paa((1L, s.toLong)) == paa((2L, s.toLong)),
        s"seg $s: ${paa((1L, s.toLong))} vs ${paa((2L, s.toLong))}")
    }
  }

  test("anomaly: the injected spike is flagged, partial windows and flat series are not scored") {
    import spark.implicits._
    val day = 86400000000L
    // type "a": alternating 10/11 baseline, a 100.0 spike on day 9;
    // type "b": flat — zero variance, never scored
    val rows =
      (0 to 9).map { d =>
        val v = if (d == 9) 100.0 else if (d % 2 == 0) 10.0 else 11.0
        ("a", d.toLong * day + 1000L, v)
      } ++ (0 to 9).map { d => ("b", d.toLong * day + 1000L, 5.0) }
    val events = rows.toDF("event_type", "t_us", "value")
      .select(col("event_type"), expr("timestamp_micros(t_us)").as("ts"), col("value"))
    val got = graft.analytics.TimeSeries.tsAnomalyOn(events).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(4)))
    // only days 7-9 of type "a" carry a FULL 7-day trailing window;
    // type "b" has std = 0 everywhere and is excluded entirely
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq(("a", 7L), ("a", 8L), ("a", 9L)), got.mkString(","))
    assert(got.map(_._3).toSeq == Seq(false, false, true),
      s"only the spike day may flag: ${got.mkString(",")}")
  }

  test("autocorr: an alternating series scores −1/+1/−1 at lags 1/2/3; flat series report NULL") {
    import spark.implicits._
    val day = 86400000000L
    val rows =
      (0 to 11).map { d => ("a", d.toLong * day + 500L, if (d % 2 == 0) 10.0 else 20.0) } ++
        (0 to 11).map { d => ("b", d.toLong * day + 500L, 7.0) }
    val events = rows.toDF("event_type", "t_us", "value")
      .select(col("event_type"), expr("timestamp_micros(t_us)").as("ts"), col("value"))
    val got = graft.analytics.TimeSeries.tsAutocorrOn(events).collect()
      .map(r => ((r.getString(0), r.getInt(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // period-2 series: perfect anti-correlation at odd lags, perfect
    // correlation at even lags
    assert(got(("a", 1)) == ((11L, Some(-1.0))), got.toString)
    assert(got(("a", 2)) == ((10L, Some(1.0))), got.toString)
    assert(got(("a", 3)) == ((9L, Some(-1.0))), got.toString)
    // zero variance: NULL, never an IEEE artifact
    (1 to 3).foreach { k => assert(got(("b", k)) == ((12L - k, None)), got.toString) }
  }

  test("search: the affine pair wins at distance 0; capped words emit no pairs") {
    val stats = TimeSeries.tsWordStats(spark, dir).collect()
      .map(r => r.getAs[String]("sax_word") ->
        (r.getAs[Long]("n_users"), r.getAs[Boolean]("capped"))).toMap
    assert(stats("cccc") == ((52L, true)), s"the 52-user word must be capped: $stats")
    assert(stats("adad") == ((2L, false)))

    val pairs = TimeSeries.tsTopkSimilar(spark, dir).collect()
    assert(pairs.nonEmpty)
    val top = pairs.head
    assert(top.getAs[Long]("user_id_1") == 1L && top.getAs[Long]("user_id_2") == 2L &&
      top.getAs[Double]("dist2") == 0.0,
      s"the affine pair must rank first at distance 0: ${top}")
    // the capped word's C(52,2) = 1326 pairs must NOT appear
    assert(pairs.forall(_.getAs[String]("sax_word") != "cccc"),
      "hot-word pairs must be excluded from the search")
  }
}
