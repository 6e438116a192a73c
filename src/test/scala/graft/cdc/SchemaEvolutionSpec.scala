package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema evolution across ALTER TABLE boundaries (reference
  * AlterAddColIT / AlterDropColIT / AlterReAddColIT) and task grouping
  * from wire-format stream metadata (GroupedTasks / TableCDCController
  * createTasks). */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  test("unionEvolved: added column nulls backward, dropped column keeps history") {
    val v1 = Seq((1L, 10.0)).toDF("user_id", "value")                  // original
    val v2 = Seq((2L, 20.0, "x")).toDF("user_id", "value", "extra")    // ALTER ADD extra
    val v3 = Seq((3L, "y")).toDF("user_id", "extra")                   // ALTER DROP value
    val u = CdcOps.unionEvolved(Seq(v1, v2, v3)).orderBy("user_id")
    assert(u.columns.toSeq == Seq("user_id", "value", "extra"))
    val rows = u.collect().map(r =>
      (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    assert(rows == Seq(
      (1L, Some(10.0), None),       // pre-ALTER: extra reads null
      (2L, Some(20.0), Some("x")),
      (3L, None, Some("y"))))       // post-DROP: value reads null, old rows kept theirs
  }

  test("unionEvolved: re-added column takes the newest (widened) type") {
    val v1 = Seq((1L, 7)).toDF("user_id", "n")          // n INT
    val v2 = Seq((2L, 9L)).toDF("user_id", "n")         // re-added as BIGINT
    val u = CdcOps.unionEvolved(Seq(v1, v2))
    assert(u.schema("n").dataType == org.apache.spark.sql.types.LongType)
    assert(u.orderBy("user_id").select("n").as[Long].collect().toSeq == Seq(7L, 9L))
  }

  test("ChangeSchemas.diff classifies add / drop / retype") {
    val before = ChangeSchemas.fromStruct(
      Seq((1L, 1, "a")).toDF("user_id", "n", "gone").schema, Seq("user_id"), Nil)
    val after = ChangeSchemas.fromStruct(
      Seq((1L, 1L, true)).toDF("user_id", "n", "fresh").schema, Seq("user_id"), Nil)
    val d = ChangeSchemas.diff(before, after)
    assert(d.added.map(_.columnName) == Seq("fresh"))
    assert(d.removed.map(_.columnName) == Seq("gone"))
    assert(d.retyped.map { case (b, a) => (b.columnName, b.sparkType, a.sparkType) } ==
      Seq(("n", org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)))
    assert(!d.isCompatible)
  }

  test("groupedTasksFromStreams groups wire-format stream ids into (gen, table, vnode) tasks") {
    val blobs = Seq(
      (0, StreamIds.makeBlob(vnode = 3, upperWord = 1L)),
      (0, StreamIds.makeBlob(vnode = 3, upperWord = 2L)), // second stream, same vnode
      (0, StreamIds.makeBlob(vnode = 5, upperWord = 3L)),
      (1, StreamIds.makeBlob(vnode = 3, upperWord = 4L))) // next generation
    val streams = blobs.toDF("generation_id", "stream_id")
      .withColumn("table_name", lit("ks.t"))
    val out = CdcOps.groupedTasksFromStreams(streams)
      .select($"generation_id", $"vnode_id", $"n_streams", size($"stream_ids_hex").as("sz"))
      .as[(Int, Int, Long, Int)].collect().toSeq
    assert(out == Seq((0, 3, 2L, 2), (0, 5, 1L, 1), (1, 3, 1L, 1)))
  }
}
