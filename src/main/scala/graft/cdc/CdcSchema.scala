package graft.cdc

/** CDC operation types, mirroring the reference's operation ids.
  *
  * Reference: scylla-cdc-base/src/main/java/com/scylladb/cdc/model/worker/RawChange.java:17-41
  * (enum OperationType). The CDC log's metadata columns
  * (RawChange.java:43-65) map to our `cdc_*` columns:
  * cdc$stream_id→cdc_stream_id, cdc$time→cdc_time,
  * cdc$batch_seq_no→cdc_batch_seq_no, cdc$operation→cdc_operation,
  * cdc$ttl→cdc_ttl, cdc$end_of_batch→cdc_end_of_batch,
  * cdc$deleted_X→cdc_deleted_X.
  */
object CdcSchema {
  val PreImage: Int = 0
  val RowUpdate: Int = 1
  val RowInsert: Int = 2
  val RowDelete: Int = 3
  val PartitionDelete: Int = 4
  val RangeDeleteInclLeft: Int = 5
  val RangeDeleteExclLeft: Int = 6
  val RangeDeleteInclRight: Int = 7
  val RangeDeleteExclRight: Int = 8
  val PostImage: Int = 9

  /** Human-readable names, matching the reference enum constant names. */
  val operationNames: Map[Int, String] = Map(
    PreImage -> "PRE_IMAGE",
    RowUpdate -> "ROW_UPDATE",
    RowInsert -> "ROW_INSERT",
    RowDelete -> "ROW_DELETE",
    PartitionDelete -> "PARTITION_DELETE",
    RangeDeleteInclLeft -> "ROW_RANGE_DELETE_INCLUSIVE_LEFT_BOUND",
    RangeDeleteExclLeft -> "ROW_RANGE_DELETE_EXCLUSIVE_LEFT_BOUND",
    RangeDeleteInclRight -> "ROW_RANGE_DELETE_INCLUSIVE_RIGHT_BOUND",
    RangeDeleteExclRight -> "ROW_RANGE_DELETE_EXCLUSIVE_RIGHT_BOUND",
    PostImage -> "POST_IMAGE")

  /** Number of logical CDC streams the adapter shards the log into. */
  val NumStreams = 64
  /** Streams per vnode-task group (StreamId.getVNodeId analogue). */
  val NumVnodes = 8
}
