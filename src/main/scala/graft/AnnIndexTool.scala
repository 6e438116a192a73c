package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standing-ANN-index CLI — the index-family analogue of
  * [[Replicate]]: `build` trains and persists the IVFADC index off
  * the embeddings table (run once per training cadence); `search`
  * probes a previously stored index WITHOUT retraining and writes the
  * neighbor table. Splitting the two across processes is the point:
  * the search invocation never touches the corpus floats, exactly the
  * build-once/serve-many split a production index runs.
  *
  * Usage:
  *   `sbt "runMain graft.AnnIndexTool build <sfDir> <indexPath> [untilVecId]"`
  *   `sbt "runMain graft.AnnIndexTool add <sfDir> <indexPath> <fromVecId>"`
  *   `sbt "runMain graft.AnnIndexTool search <sfDir> <indexPath> <outDir> [k]"`
  *   `sbt "runMain graft.AnnIndexTool compact <indexPath>"`
  *
  * `add` is the ONLINE INSERT between rebuilds: vectors with
  * `vec_id >= fromVecId` are encoded under the STORED geometry and
  * appended ([[pipeline.AnnIndex.add]]) — no retraining. `compact` is
  * the maintenance pass between adds ([[pipeline.AnnIndex.compact]]):
  * drops replayed-append duplicates, collapses each cell to one file.
  *
  * At 100 TB the same lines run on a cluster with the paths pointed
  * at the lake; `codes/` is cell-partitioned so a search reads its
  * probed cells' files (SURVEY §2c 30f). */
object AnnIndexTool {

  /** Train + persist; returns the indexed vector count.
    * `untilVecId` bounds the build to a prefix of the table (the
    * base for a later [[add]]); Long.MaxValue = everything. */
  def build(spark: SparkSession, sfDir: String, indexPath: String,
      untilVecId: Long = Long.MaxValue): Long = {
    val emb = Tables.spread(Tables.embeddings(spark, sfDir))
      .filter(col("vec_id") < untilVecId)
    pipeline.AnnIndex.write(emb, indexPath)
    pipeline.AnnIndex.manifest(spark, indexPath).head().getAs[Long]("n_vectors")
  }

  /** Online-insert the tail of the embeddings table (vec_id >=
    * fromVecId) into a stored index; returns the index's grown
    * vector count. */
  def add(spark: SparkSession, sfDir: String, indexPath: String, fromVecId: Long): Long = {
    val emb = Tables.spread(Tables.embeddings(spark, sfDir))
      .filter(col("vec_id") >= fromVecId)
    pipeline.AnnIndex.add(emb, indexPath)
    pipeline.AnnIndex.manifest(spark, indexPath).head().getAs[Long]("n_vectors")
  }

  /** Probe a stored index with the standard query sample
    * (`vec_id < NumQueries`); writes `outDir/neighbors` and returns
    * the neighbor-row count. */
  def search(spark: SparkSession, sfDir: String, indexPath: String,
      outDir: String, k: Int): Long = {
    val queries = Tables.spread(Tables.embeddings(spark, sfDir))
      .filter(col("vec_id") < pipeline.Similarity.NumQueries)
    val out = pipeline.AnnIndex.search(queries,
      pipeline.AnnIndex.load(spark, indexPath), topK = k)
    out.write.mode("overwrite").parquet(s"$outDir/neighbors")
    spark.read.parquet(s"$outDir/neighbors").count()
  }

  def main(args: Array[String]): Unit = {
    val usage = "usage: AnnIndexTool build <sfDir> <indexPath> [untilVecId] | " +
      "AnnIndexTool add <sfDir> <indexPath> <fromVecId> | " +
      "AnnIndexTool search <sfDir> <indexPath> <outDir> [k] | " +
      "AnnIndexTool compact <indexPath>"
    require(args.nonEmpty, usage)
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    args.toSeq match {
      case Seq("build", sfDir, indexPath) =>
        val n = build(spark, sfDir, indexPath)
        println(s"index built: $indexPath ($n vectors)")
      case Seq("build", sfDir, indexPath, untilVecId) =>
        val n = build(spark, sfDir, indexPath, untilVecId.toLong)
        println(s"index built: $indexPath ($n vectors)")
      case Seq("add", sfDir, indexPath, fromVecId) =>
        val n = add(spark, sfDir, indexPath, fromVecId.toLong)
        println(s"index grown: $indexPath ($n vectors)")
      case Seq("search", sfDir, indexPath, outDir) =>
        val n = search(spark, sfDir, indexPath, outDir, pipeline.Similarity.TopK)
        println(s"search written: $outDir/neighbors ($n rows)")
      case Seq("search", sfDir, indexPath, outDir, k) =>
        val n = search(spark, sfDir, indexPath, outDir, k.toInt)
        println(s"search written: $outDir/neighbors ($n rows)")
      case Seq("compact", indexPath) =>
        val s = pipeline.AnnIndex.compact(spark, indexPath)
        println(s"index compacted: $indexPath (rows ${s.rowsBefore} -> ${s.rowsAfter}, " +
          s"files ${s.filesBefore} -> ${s.filesAfter}, ${s.nVectors} vectors)")
      case other => throw new IllegalArgumentException(s"$usage (got: $other)")
    }
    spark.stop()
  }
}
