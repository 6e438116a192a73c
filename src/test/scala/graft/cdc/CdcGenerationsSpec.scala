package graft.cdc

import graft.SparkSpec

/** Generation assignment from a bring-your-own generations relation
  * (GenerationMetadata [start, end?) containment), with boundaries the
  * hardcoded constants can't express. */
class CdcGenerationsSpec extends SparkSpec {

  import spark.implicits._

  test("irregular [start,end) boundaries assign by containment; last generation is open") {
    val log = Seq(
      // (stream, time) — boundaries at 200 and 250: [min,200) [200,250) [250,∞)
      (0L, 150L), (0L, 199L), (1L, 200L), (1L, 249L), (2L, 250L), (0L, 999L))
      .toDF("cdc_stream_id", "time_us")
    val gens = Seq(
      (0, Long.MinValue, Option(200L)),
      (1, 200L, Option(250L)),
      (2, 250L, Option.empty[Long]))
      .toDF("generation_id", "gen_start_us", "gen_end_us")
    val out = CdcOps.generationAssignFromTable(log, gens)
      .select($"generation_id", $"n_streams", $"n_changes", $"first_change_us", $"last_change_us")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0, 1L, 2L, 150L, 199L),   // left-inclusive: 199 in gen0
      (1, 1L, 2L, 200L, 249L),   // boundary 200 starts gen1 (right-exclusive)
      (2, 2L, 2L, 250L, 999L)))  // open-ended tail
  }

  test("a change before every generation is dropped (no matching interval)") {
    val log = Seq((0L, 50L), (0L, 150L)).toDF("cdc_stream_id", "time_us")
    val gens = Seq((0, 100L, Option.empty[Long]))
      .toDF("generation_id", "gen_start_us", "gen_end_us")
    val out = CdcOps.generationAssignFromTable(log, gens)
    assert(out.select($"n_changes").as[Long].collect().toSeq == Seq(1L))
  }

  test("generation-done: TTL expiry finishes a closed generation even if unconsumed") {
    val log = Seq((0L, 150L)).toDF("cdc_stream_id", "time_us") // watermark 150
    val gens = Seq(
      (0, Long.MinValue, Option(100L)), // closed, end 100
      (1, 100L, Option(400L)),          // closed, end 400 (not consumed)
      (2, 400L, Option.empty[Long]))    // open
      .toDF("generation_id", "gen_start_us", "gen_end_us")
    // ttl=1s → expiry cutoff at now−1e6 µs < 0: nothing TTL-expires,
    // done is decided purely by consumption
    val Seq(g0, g1, g2) = CdcOps.generationDoneFromTable(log, gens,
        nowUs = 310L, tableTtlSeconds = Some(1L))
      .as[(Int, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
    assert(g0 == ((0, true, false, true, true)))   // consumed (150 ≥ 100)
    assert(g1 == ((1, true, false, false, false))) // open work remains
    assert(g2 == ((2, false, false, false, false))) // never done while open

    // with a zero TTL a closed generation whose end has PASSED now is
    // expired; one ending in the future (gen1, end 400 > now 310) is not
    val expired = CdcOps.generationDoneFromTable(log, gens,
        nowUs = 310L, tableTtlSeconds = Some(0L))
      .as[(Int, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
    assert(expired.map(t => (t._1, t._3, t._5)) ==
      Seq((0, true, true), (1, false, false), (2, false, false)))
  }

  test("generation-done over an EMPTY log: booleans are false, never null") {
    val log = Seq.empty[(Long, Long)].toDF("cdc_stream_id", "time_us")
    val gens = Seq(
      (0, Long.MinValue, Option(100L)), // closed, untouched
      (1, 100L, Option.empty[Long]))    // open
      .toDF("generation_id", "gen_start_us", "gen_end_us")
    val rows = CdcOps.generationDoneFromTable(log, gens,
      nowUs = 310L, tableTtlSeconds = Some(1000L)).collect()
    // a null watermark must not leak three-valued nulls: every flag is
    // a real boolean and an unconsumed generation reads false
    assert(rows.forall(r => (1 to 4).forall(i => !r.isNullAt(i))))
    val out = CdcOps.generationDoneFromTable(log, gens,
        nowUs = 310L, tableTtlSeconds = Some(1000L))
      .as[(Int, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
    assert(out == Seq((0, true, false, false, false), (1, false, false, false, false)))
  }

  test("the constant-boundary table reproduces the hardcoded assignment") {
    val gens = CdcOps.generationsTable(spark)
      .as[(Int, Long, Option[Long])].collect().toSeq.sortBy(_._1)
    assert(gens == Seq(
      (0, Long.MinValue, Some(CdcOps.Gen1StartUs)),
      (1, CdcOps.Gen1StartUs, Some(CdcOps.Gen2StartUs)),
      (2, CdcOps.Gen2StartUs, None)))
  }
}
