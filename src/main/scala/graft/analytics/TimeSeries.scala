package graft.analytics

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series similarity search over per-user event-value series
  * (SURVEY.md §2b #23ag) — the PAA/SAX representation line the
  * retrieved distributed-similarity-search papers build on (iSAX-style
  * symbolization; candidate pruning by symbol-word equality as in
  * REPOSE's reference-point tries / the EDBT streaming-similarity
  * systems): z-normalize each user's value series, reduce it to a
  * fixed [[PaaSegments]]-segment Piecewise Aggregate Approximation,
  * symbolize against pinned breakpoints, and search for the most
  * similar user pairs WITHOUT ever scoring all pairs — candidates are
  * users sharing an exact SAX word, the bucketing that makes the
  * search linear in the bucket histogram.
  *
  * Engine-portable determinism, same rules as the rest of the repo:
  * per-user mean/std from exact DECIMAL sums with one double
  * division + sqrt each (the q_zscore contract); z-scores rounded to
  * 6 then DECIMAL-summed per segment (partitioning-stable); PAA
  * distances are fixed-arity expression trees over the 4 rounded
  * segment means (no aggregation order anywhere).
  *
  * Scale: one user-keyed exchange builds series, stats and segments
  * (windows over user partitions — the sessionize shape, thousands of
  * rows per partition at most); the profile relation is USER-grain
  * (4 doubles + a word per user — corpus-scale reduction before any
  * join); pairing shuffles profiles once on the SAX word with the
  * universal hot-key cap ([[MaxWordDf]]) applied BEFORE the
  * self-join, and [[tsWordStats]] is its no-silent-caps sidecar. */
object TimeSeries {

  /** Users need at least this many events to qualify (a series
    * shorter than 2× the segment count has no shape to compare). */
  val TsMinEvents = 8

  /** PAA segments per series (the reduced dimensionality). */
  val PaaSegments = 4

  /** SAX breakpoints for a 4-symbol alphabet — the standard Gaussian
    * equiprobable cut points, pinned as literals. */
  val SaxBreaks: Seq[Double] = Seq(-0.6745, 0.0, 0.6745)

  /** Hot-word cap: SAX words shared by more users than this are
    * excluded from pairing (f² pairs are beyond any join strategy —
    * the ngramJaccard/media-hash rule) and reported by
    * [[tsWordStats]]. */
  val MaxWordDf = 50

  /** Pairs [[tsTopkSimilar]] returns. */
  val TsTopK = 50

  // ------------------------------------------------ shared series prep

  /** Per-(user, segment) PAA frame: z-normalized segment means for
    * every qualifying user. One user-keyed exchange: the row_number
    * and the moment sums share the user partition. */
  private def paaFrame(spark: SparkSession, dir: String): DataFrame = {
    val dec2 = (c: Column) => c.cast("decimal(18,2)")
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("time_us"), col("event_id"))
    val wAll = Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("time_us"))
      .withColumn("idx", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s1", sum(dec2(col("value"))).over(wAll))
      .withColumn("s2", sum(dec2(col("value")) * dec2(col("value"))).over(wAll))
      .filter(col("n") >= TsMinEvents)
      .withColumn("mean", col("s1").cast("double") / col("n"))
      .withColumn("std",
        sqrt(greatest(col("s2").cast("double") / col("n") - col("mean") * col("mean"),
          lit(0.0))))
      .filter(col("std") > 0)
      .withColumn("z", round((col("value") - col("mean")) / col("std"), 6))
      .withColumn("seg", expr(s"((idx - 1) * $PaaSegments) div n"))
      .groupBy(col("user_id"), col("seg"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("z").cast("decimal(12,6)")).as("zsum"))
      // The segment mean is rounded in EXACT INTEGER micro-units, not
      // round(double, 6): a scale-6 sum divided by a small count lands
      // on a decimal half (….xxxxxx5) constantly, and the engines'
      // double-round implementations disagree exactly there (Spark
      // expands the nearest double via BigDecimal; DuckDB multiplies
      // by 10⁶ and nearbyints) — measured 7 flipped ulps per 6000 rows
      // at sf0.1. Integer half-away-from-zero is engine-free; the
      // abs/negate keeps the floor-vs-truncate divide difference out.
      .withColumn("zi", (col("zsum") * 1000000).cast("long"))
      .withColumn("paa_micro", expr(
        "CASE WHEN zi >= 0 THEN (2 * zi + n_points) div (2 * n_points) " +
          "ELSE -((2 * (-zi) + n_points) div (2 * n_points)) END"))
      .withColumn("paa", col("paa_micro").cast("double") / 1000000.0d)
      .select(col("user_id"), col("seg"), col("n_points"), col("paa"))
  }

  /** The SQL twin of [[paaFrame]], ending in CTE
    * `paa(user_id, seg, n_points, paa)`. */
  private val paaCtes: String =
    s"""ev AS (
       |  SELECT user_id, event_id, value, epoch_us(ts) AS time_us,
       |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS idx,
       |    COUNT(*) OVER (PARTITION BY user_id) AS n,
       |    SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id) AS s1,
       |    SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
       |      OVER (PARTITION BY user_id) AS s2
       |  FROM events),
       |zs AS (
       |  SELECT user_id, idx, n,
       |    CAST(s1 AS DOUBLE) / n AS mean,
       |    sqrt(greatest(CAST(s2 AS DOUBLE) / n -
       |      (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 0.0)) AS std,
       |    value
       |  FROM ev WHERE n >= $TsMinEvents),
       |z AS (
       |  SELECT user_id, ((idx - 1) * $PaaSegments) // n AS seg,
       |    round((value - mean) / std, 6) AS zv
       |  FROM zs WHERE std > 0),
       |paa0 AS (
       |  SELECT user_id, seg, CAST(COUNT(*) AS BIGINT) AS n_points,
       |    CAST(SUM(CAST(zv AS DECIMAL(12,6))) * 1000000 AS BIGINT) AS zi
       |  FROM z GROUP BY user_id, seg),
       |paa AS (
       |  SELECT user_id, seg, n_points,
       |    CAST(CASE WHEN zi >= 0 THEN (2 * zi + n_points) // (2 * n_points)
       |         ELSE -((2 * (-zi) + n_points) // (2 * n_points)) END AS DOUBLE)
       |      / 1000000.0 AS paa
       |  FROM paa0)""".stripMargin

  // ------------------------------------------------------ #23ag-a PAA

  /** TS_PAA — the per-user reduced representation itself. */
  def tsPaa(spark: SparkSession, dir: String): DataFrame =
    paaFrame(spark, dir).orderBy(col("user_id"), col("seg"))

  val tsPaaSql: String =
    s"""WITH $paaCtes
       |SELECT user_id, seg, n_points, paa FROM paa
       |ORDER BY user_id, seg""".stripMargin

  // ------------------------------------------------------ #23ag-b SAX

  private def saxSymbol(paa: Column): Column =
    when(paa < SaxBreaks(0), "a")
      .when(paa < SaxBreaks(1), "b")
      .when(paa < SaxBreaks(2), "c")
      .otherwise("d")

  private val saxSymbolSql: String =
    s"""CASE WHEN paa < ${SaxBreaks(0)} THEN 'a'
       |     WHEN paa < ${SaxBreaks(1)} THEN 'b'
       |     WHEN paa < ${SaxBreaks(2)} THEN 'c'
       |     ELSE 'd' END""".stripMargin.replace("\n", " ").replaceAll("\\s+", " ")

  /** Per-user SAX profile: the 4 segment means pivoted to columns
    * (deterministic — a conditional max per fixed segment id, never
    * an order-dependent collect) plus the concatenated word. */
  private def saxProfiles(spark: SparkSession, dir: String): DataFrame = {
    val p = paaFrame(spark, dir).withColumn("sym", saxSymbol(col("paa")))
    val aggs = (0 until PaaSegments).map(i =>
      max(when(col("seg") === i, col("paa"))).as(s"p$i")) ++
      (0 until PaaSegments).map(i =>
        max(when(col("seg") === i, col("sym"))).as(s"y$i"))
    p.groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("sax_word",
        concat((0 until PaaSegments).map(i => col(s"y$i")): _*))
  }

  /** SQL twin ending in CTE
    * `prof(user_id, p0..p3, sax_word)`. */
  private val profCtes: String = {
    val ps = (0 until PaaSegments).map(i =>
      s"MAX(CASE WHEN seg = $i THEN paa END) AS p$i").mkString(",\n       |    ")
    val ys = (0 until PaaSegments).map(i =>
      s"MAX(CASE WHEN seg = $i THEN sym END)").mkString(" || ")
    s"""$paaCtes,
       |sym AS (SELECT user_id, seg, paa, $saxSymbolSql AS sym FROM paa),
       |prof AS (
       |  SELECT user_id,
       |    $ps,
       |    $ys AS sax_word
       |  FROM sym GROUP BY user_id)""".stripMargin
  }

  /** TS_SAX — per-user symbolic word (the index key). */
  def tsSax(spark: SparkSession, dir: String): DataFrame =
    saxProfiles(spark, dir)
      .select(col("user_id"), col("sax_word"))
      .orderBy(col("user_id"))

  val tsSaxSql: String =
    s"""WITH $profCtes
       |SELECT user_id, sax_word FROM prof ORDER BY user_id""".stripMargin

  // ----------------------------------------------- #23ag-c word stats

  /** TS_WORD_STATS — the SAX-word histogram AND the no-silent-caps
    * sidecar for [[tsTopkSimilar]]: every word with its user count
    * and whether the pairing stage will exclude it (df >
    * [[MaxWordDf]]). An operator reading the pair relation sees what
    * was dropped and why. */
  def tsWordStats(spark: SparkSession, dir: String): DataFrame =
    saxProfiles(spark, dir)
      .groupBy(col("sax_word"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("capped", col("n_users") > MaxWordDf)
      .orderBy(col("n_users").desc, col("sax_word"))

  val tsWordStatsSql: String =
    s"""WITH $profCtes
       |SELECT sax_word, CAST(COUNT(*) AS BIGINT) AS n_users,
       |  (COUNT(*) > $MaxWordDf) AS capped
       |FROM prof GROUP BY sax_word
       |ORDER BY n_users DESC, sax_word""".stripMargin

  // --------------------------------------------- #23ag-d top-k search

  /** TS_TOPK_SIMILAR — the [[TsTopK]] most similar user pairs by
    * squared PAA Euclidean distance, candidates restricted to users
    * sharing an exact SAX word (the symbol-equality bucketing of the
    * iSAX/REPOSE line) with hot words capped BEFORE the self-join.
    * The distance is a fixed-arity expression over the 4 rounded
    * segment means — no aggregation, no order dependence — and sqrt
    * is skipped (monotone; rank-equivalent and hash-stable). */
  def tsTopkSimilar(spark: SparkSession, dir: String): DataFrame = {
    val prof = saxProfiles(spark, dir)
    val hot = prof.groupBy(col("sax_word")).agg(count(lit(1)).as("df"))
      .filter(col("df") > MaxWordDf).select(col("sax_word"))
    val kept = prof.join(hot, Seq("sax_word"), "left_anti")
    def d2(a: String, b: String): Column = {
      val terms = (0 until PaaSegments).map { i =>
        (col(s"$a.p$i") - col(s"$b.p$i")) * (col(s"$a.p$i") - col(s"$b.p$i"))
      }
      round(terms.reduce(_ + _), 9)
    }
    kept.as("a").join(kept.as("b"),
        col("a.sax_word") === col("b.sax_word") &&
          col("a.user_id") < col("b.user_id"))
      .select(col("a.user_id").as("user_id_1"), col("b.user_id").as("user_id_2"),
        col("a.sax_word").as("sax_word"), d2("a", "b").as("dist2"))
      .orderBy(col("dist2"), col("user_id_1"), col("user_id_2"))
      .limit(TsTopK)
  }

  val tsTopkSimilarSql: String = {
    val terms = (0 until PaaSegments).map(i =>
      s"(a.p$i - b.p$i) * (a.p$i - b.p$i)").mkString(" + ")
    s"""WITH $profCtes,
       |hot AS (SELECT sax_word FROM prof GROUP BY sax_word HAVING COUNT(*) > $MaxWordDf),
       |kept AS (SELECT * FROM prof WHERE sax_word NOT IN (SELECT sax_word FROM hot))
       |SELECT a.user_id AS user_id_1, b.user_id AS user_id_2,
       |  a.sax_word AS sax_word, round($terms, 9) AS dist2
       |FROM kept a JOIN kept b
       |  ON a.sax_word = b.sax_word AND a.user_id < b.user_id
       |ORDER BY dist2, user_id_1, user_id_2
       |LIMIT $TsTopK""".stripMargin
  }

  // ------------------------------------------------ #23ah ts_anomaly

  /** Trailing window for the anomaly baseline (days). */
  val AnomalyWindowDays = 7
  /** |z| above this flags an anomaly (the classic 2σ residual rule). */
  val AnomalyZ = 2.0

  /** TS_ANOMALY — residual z-score anomaly detection over the daily
    * per-event-type value series: each day scores against the mean/σ
    * of its own TRAILING [[AnomalyWindowDays]]-day window (current
    * day excluded — scoring a point against a baseline it belongs to
    * shrinks exactly the deviations being hunted). A day is an
    * anomaly when |z| > [[AnomalyZ]]; only days with a FULL trailing
    * window score (partial baselines produce confident-looking
    * nonsense at series heads).
    *
    * Engine-portable determinism: daily totals and the trailing
    * moment sums are exact DECIMAL (order-free); mean/σ take one
    * double division + sqrt each; z rounds to 6 and the flag
    * compares the ROUNDED value, so both engines flag identical days
    * (the q_zscore contract, applied along time).
    *
    * Scale: one (event_type, day) aggregate — corpus-scale reduction
    * BEFORE any window — then a frame-bounded window over day-grain
    * rows (≤ a few thousand per event type per decade of retention);
    * the unpartitioned-window rule is respected since the window
    * partitions by event_type over the aggregated day grain. */
  def tsAnomaly(spark: SparkSession, dir: String): DataFrame =
    tsAnomalyOn(Tables.events(spark, dir))

  /** The detector over any events-shaped frame (event_type, ts,
    * value) — bring your own series. */
  private[graft] def tsAnomalyOn(events: DataFrame): DataFrame = {
    val dec2 = (c: Column) => c.cast("decimal(18,2)")
    anomalyOfDaily(events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"), col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(dec2(col("value"))).as("tot")))
  }

  /** The scoring half over a day-grain `(event_type, day, tot)` frame
    * — shared by the batch detector and the streaming monitor (which
    * MAINTAINS the daily frame and re-scores it per micro-batch). */
  private[graft] def anomalyOfDaily(daily: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-AnomalyWindowDays, -1)
    daily
      .withColumn("n_prior", count(lit(1)).over(w))
      .withColumn("s1", sum(col("tot")).over(w))
      .withColumn("s2", sum(col("tot") * col("tot")).over(w))
      .filter(col("n_prior") === AnomalyWindowDays)
      .withColumn("mean", col("s1").cast("double") / AnomalyWindowDays)
      .withColumn("std", sqrt(greatest(
        col("s2").cast("double") / AnomalyWindowDays - col("mean") * col("mean"),
        lit(0.0))))
      .filter(col("std") > 0)
      .withColumn("zscore", round((col("tot").cast("double") - col("mean")) / col("std"), 6))
      .select(col("event_type"), col("day"), col("tot").cast("double").as("day_value"),
        col("zscore"), (abs(col("zscore")) > AnomalyZ).as("is_anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  // ------------------------------------------------ #23ai ts_autocorr

  /** Autocorrelation is reported for lags 1..this. */
  val AutocorrMaxLag = 3

  /** TS_AUTOCORR — lag-k autocorrelation of the daily per-event-type
    * value series (k = 1..[[AutocorrMaxLag]]): Pearson r between the
    * series and its own k-day lead over the observed day sequence —
    * "does today predict the next days", the seasonality/persistence
    * primitive that pairs with [[tsAnomaly]]'s residual alarm.
    *
    * The [[graft.analytics.Queries.qCorr]] bit-stability discipline:
    * exact DECIMAL power sums (n, Σx, Σy, Σxy, Σx², Σy²) per
    * (event_type, lag) — never a streaming variance — then identical
    * double math on both engines; a zero-variance side reports NULL
    * rather than an IEEE Infinity artifact.
    *
    * Scale: the corpus reduces to day grain FIRST ([[tsAnomaly]]'s
    * aggregate); each lag adds one lead() over the day-grain frame
    * and one few-key aggregate — O(lags · days-per-type), no
    * data-sized window. */
  def tsAutocorr(spark: SparkSession, dir: String): DataFrame =
    tsAutocorrOn(Tables.events(spark, dir))

  /** The statistic over any events-shaped frame (event_type, ts,
    * value) — bring your own series. */
  private[analytics] def tsAutocorrOn(events: DataFrame): DataFrame = {
    val dec2 = (c: Column) => c.cast("decimal(18,2)")
    val daily = events
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"), col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(dec2(col("value"))).as("tot"))
      .localCheckpoint() // one day-grain frame feeds every lag branch
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    def d(c: Column) = c.cast("double")
    val branches = (1 to AutocorrMaxLag).map { k =>
      daily.withColumn("y", lead(col("tot"), k).over(w))
        .filter(col("y").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("tot")).as("sx"), sum(col("y")).as("sy"),
          sum(col("tot") * col("y")).as("sxy"),
          sum(col("tot") * col("tot")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("num", col("n_pairs") * d(col("sxy")) - d(col("sx")) * d(col("sy")))
        .withColumn("den2",
          (col("n_pairs") * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
            (col("n_pairs") * d(col("syy")) - d(col("sy")) * d(col("sy"))))
        .select(col("event_type"), lit(k).as("lag"), col("n_pairs"),
          when(col("den2") <= 0, lit(null).cast("double"))
            .otherwise(round(col("num") / sqrt(col("den2")), 6)).as("autocorr"))
    }
    branches.reduce(_ unionByName _).orderBy(col("event_type"), col("lag"))
  }

  val tsAutocorrSql: String = {
    val branches = (1 to AutocorrMaxLag).map { k =>
      s"""  SELECT event_type, CAST($k AS INT) AS lag, COUNT(*) AS n_pairs,
         |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         |    SUM(x * x) AS sxx, SUM(y * y) AS syy
         |  FROM (
         |    SELECT event_type, tot AS x,
         |      LEAD(tot, $k) OVER (PARTITION BY event_type ORDER BY day) AS y
         |    FROM daily)
         |  WHERE y IS NOT NULL GROUP BY 1""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    SUM(CAST(value AS DECIMAL(18,2))) AS tot
       |  FROM events GROUP BY 1, 2),
       |sums AS (
       |$branches
       |)
       |SELECT event_type, lag, n_pairs,
       |  CASE WHEN (n_pairs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |          * (n_pairs * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0
       |    THEN NULL
       |    ELSE round((n_pairs * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |      / sqrt((n_pairs * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |           * (n_pairs * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       |  END AS autocorr
       |FROM sums ORDER BY event_type, lag""".stripMargin
  }

  val tsAnomalySql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
       |    SUM(CAST(value AS DECIMAL(18,2))) AS tot
       |  FROM events GROUP BY 1, 2),
       |fr AS (
       |  SELECT event_type, day, tot,
       |    COUNT(*) OVER win AS n_prior,
       |    SUM(tot) OVER win AS s1,
       |    SUM(tot * tot) OVER win AS s2
       |  FROM daily
       |  WINDOW win AS (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN $AnomalyWindowDays PRECEDING AND 1 PRECEDING)),
       |scored AS (
       |  SELECT event_type, day, tot,
       |    CAST(s1 AS DOUBLE) / $AnomalyWindowDays AS mean,
       |    sqrt(greatest(CAST(s2 AS DOUBLE) / $AnomalyWindowDays -
       |      (CAST(s1 AS DOUBLE) / $AnomalyWindowDays)
       |        * (CAST(s1 AS DOUBLE) / $AnomalyWindowDays), 0.0)) AS std
       |  FROM fr WHERE n_prior = $AnomalyWindowDays)
       |SELECT event_type, day, CAST(tot AS DOUBLE) AS day_value,
       |  round((CAST(tot AS DOUBLE) - mean) / std, 6) AS zscore,
       |  abs(round((CAST(tot AS DOUBLE) - mean) / std, 6)) > $AnomalyZ AS is_anomaly
       |FROM scored WHERE std > 0
       |ORDER BY event_type, day""".stripMargin
}
