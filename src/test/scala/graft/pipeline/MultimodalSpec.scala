package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Spec for [[Multimodal]] — SURVEY.md §2c #35: binary column +
  * metadata plumbing with a stubbed decode. */
class MultimodalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("attachBinary produces binary payload + typed metadata") {
    val media = Multimodal.attachBinary(graft.Tables.documents(spark, dir))
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("width").dataType.typeName == "integer")
    assert(schema("format").dataType.typeName == "string")
    val row = media.filter(col("doc_id") === 3).head()
    assert(row.getAs[String]("format") == "png") // 3 % 3 == 0
    assert(row.getAs[Int]("width") == (3 % 64) * 16 + 64)
  }

  test("stubbed decode emits deterministic features with real batch plumbing") {
    val feats = Multimodal.pipeline(spark, dir)
    val rows = feats.collect()
    assert(rows.length == 500)
    // n_bytes equals the utf-8 length of the original text
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.take(50).foreach { f =>
      assert(f.n_bytes == docs(f.doc_id), s"doc ${f.doc_id}")
      assert(f.mean_luma >= 0.0 && f.mean_luma <= 1.0)
    }
    // determinism: same checksum on re-run
    val again = Multimodal.pipeline(spark, dir).collect()
    assert(rows.map(f => f.doc_id -> f.checksum).toMap ==
      again.map(f => f.doc_id -> f.checksum).toMap)
  }
}
