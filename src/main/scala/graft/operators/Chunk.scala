package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document chunking — split long documents into fixed-size token
  * windows with overlap (stride < size), the stage that turns a curated
  * corpus into context-window-sized training/retrieval units. No
  * reference analogue; first-class training-data operator.
  *
  * Pure projection + explode: chunk starts are a `sequence(0, n−1,
  * stride)` array exploded per document, each chunk a `slice` of the
  * token array — zero shuffle, scan-parallel, exactly like the shingle
  * explode in dedup. The chunk id rides along as the explode ordinal,
  * so (doc_id, chunk_idx) is a stable key for downstream dedup/packing
  * regardless of partitioning.
  */
object Chunk {

  /** One row per (document, chunk): (idCol, chunk_idx, n_chunk_tokens,
    * chunk_hash). The trailing chunk may be shorter than `window`;
    * documents with zero tokens produce no chunks. Chunk starts stop
    * once the previous chunk already reached the document end — with
    * stride < window a naive `sequence(0, n−1, stride)` would emit
    * trailing short chunks that are strict SUBSETS of the previous
    * chunk (duplicated training content); every token is still covered
    * because the last emitted start is < n − window + stride. */
  def split(docs: DataFrame, idCol: String, textCol: String,
            window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val withToks = docs
      .select(col(idCol), TextFunctions.tokens(col(textCol)).as("_ts"))
      .filter(size(col("_ts")) > 0)
    // largest useful start: the first start whose PREDECESSOR's chunk
    // ends before n, i.e. start ≤ n − window + stride − 1 (clamped to
    // [0, n−1] so short docs keep their single whole-doc chunk)
    val lastStart = least(size(col("_ts")) - 1,
      greatest(lit(0), size(col("_ts")) - window + stride - 1))
    withToks
      .select(col(idCol), col("_ts"),
        posexplode(sequence(lit(0), lastStart, lit(stride)))
          .as(Seq("chunk_idx", "_start")))
      .select(col(idCol), col("chunk_idx"),
        slice(col("_ts"), col("_start") + 1, lit(window)).as("_chunk"))
      .select(col(idCol), col("chunk_idx"),
        size(col("_chunk")).as("n_chunk_tokens"),
        md5(concat_ws(" ", col("_chunk"))).as("chunk_hash"))
  }
}
