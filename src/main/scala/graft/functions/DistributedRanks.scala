package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-group ranking — `row_number` + group count over a
  * (group, sort...) order WITHOUT ever colocating a whole group in
  * one task.
  *
  * `Window.partitionBy(group)` puts every row of a group in ONE
  * window partition, and window partitions cannot be skew-split by
  * AQE — with few or hot groups (an event_type, a market segment, a
  * source, a label) that is a single-task bottleneck at 100 TB. This
  * helper is the scale-correct replacement, the grouped
  * generalization of the two-phase prefix sum in
  * [[graft.pipeline.Corpus.selectBudget]]:
  *
  *  1. `repartitionByRange` on (group, sort...) — the range sampler
  *     balances partitions regardless of the group histogram (ties
  *     split fine because the sort key ends in a unique column);
  *  2. per-(group, partition) row counts — a tiny
  *     (groups × partitions) frame — prefix-summed per group and
  *     broadcast back as offsets (plus the per-group total);
  *  3. ranks local to (group, partition) — bounded tasks — shifted
  *     by the offset: offset + local rank = the exact global rank in
  *     the group, independent of where the sampled boundaries land.
  *
  * Output: the input columns plus `rn` (1-based rank of the row in
  * its group under the sort order) and `n` (group size). The ranked
  * frame is localCheckpointed (it feeds the offsets AND the probe;
  * without it the upstream subtree would execute twice, and partition
  * ids must stay frozen between the two uses).
  */
object DistributedRanks {

  def withGroupRanks(df: DataFrame, group: String, sort: Seq[Column]): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(parts, (col(group) +: sort): _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val wOff = Window.partitionBy(col(group)).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wGrp = Window.partitionBy(col(group))
    // tiny frame: (groups × partitions) rows — the windows over it
    // never see data-sized partitions
    val offsets = ranged.groupBy(col(group), col("pid")).agg(count(lit(1)).as("cnt"))
      .withColumn("part_offset", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(wGrp))
      .select(col(group), col("pid"), col("part_offset"), col("n"))
    val wLocal = Window.partitionBy(col(group), col("pid")).orderBy(sort: _*)
    // null-safe group equality: the naive Window.partitionBy(group)
    // this helper replaces keeps NULL as its own partition, so a plain
    // equi-join (NULL never matches) would silently drop those rows
    val off = offsets
      .withColumnRenamed(group, "__grp").withColumnRenamed("pid", "__pid")
    ranged.join(broadcast(off),
        col(group) <=> col("__grp") && col("pid") === col("__pid"))
      .withColumn("rn", col("part_offset") + row_number().over(wLocal))
      .drop("pid", "part_offset", "__grp", "__pid")
  }

  /** Grouped INCLUSIVE running sum of an integral `value` under the
    * sort order, as column `out` — the prefix-sum twin of
    * [[withGroupRanks]], with the same two-phase layout: a
    * `Window.partitionBy(group).orderBy(...).rowsBetween(...)` running
    * sum serializes each group through one task; here only bounded
    * (group, range-partition) slices ever sit in a window, and the
    * per-slice totals (a tiny groups × partitions frame) bridge them.
    * The result is independent of where the sampled range boundaries
    * land. */
  def withGroupPrefixSum(df: DataFrame, group: String, sort: Seq[Column],
      value: Column, out: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .withColumn("__v", value)
      .repartitionByRange(parts, (col(group) +: sort): _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val wOff = Window.partitionBy(col(group)).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col(group), col("pid")).agg(sum(col("__v")).as("cnt"))
      .withColumn("part_offset", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .select(col(group).as("__grp"), col("pid").as("__pid"), col("part_offset"))
    val wLocal = Window.partitionBy(col(group), col("pid")).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offsets),
        col(group) <=> col("__grp") && col("pid") === col("__pid"))
      .withColumn(out, col("part_offset") + sum(col("__v")).over(wLocal))
      .drop("pid", "__v", "part_offset", "__grp", "__pid")
  }
}
