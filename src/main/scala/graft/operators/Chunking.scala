package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking: split each document into fixed-size token windows
  * with overlap — the packing step that turns raw documents into
  * training-sized pieces (context-window fill, RAG indexing, embedding
  * input). Entirely scan-local: tokenize once, generate window starts with
  * `sequence`, slice per window — one pass, zero shuffles, any scale. The
  * chunk id is derived arithmetically from the window start so it is
  * reproducible across engines and runs (no monotonically_increasing_id,
  * which is partition-layout-dependent).
  */
object Chunking {

  /** One row per (doc, window): `chunk_idx` (0-based), `n_chunk_tokens`,
    * and the space-rejoined `chunk_text`. Windows start every `stride`
    * tokens and hold up to `size` tokens (the final windows clip at the
    * document end; `stride < size` gives the standard overlap so no token
    * run of length ≥ size-stride straddles a boundary unseen). Documents
    * with zero tokens produce zero chunks.
    */
  def tokenWindows(docs: DataFrame, idCol: String, textCol: String,
                   size: Int = 50, stride: Int = 40): DataFrame = {
    require(size > 0 && stride > 0, "size and stride must be positive")
    docs
      .select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("__t"))
      .filter(org.apache.spark.sql.functions.size(col("__t")) > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0),
          org.apache.spark.sql.functions.size(col("__t")) - 1, lit(stride))).as("__start"),
        col("__t"))
      .select(col("doc_id"),
        (col("__start") / stride).cast("int").as("chunk_idx"),
        slice(col("__t"), col("__start") + 1, lit(size)).as("__w"))
      .select(col("doc_id"), col("chunk_idx"),
        org.apache.spark.sql.functions.size(col("__w")).as("n_chunk_tokens"),
        concat_ws(" ", col("__w")).as("chunk_text"))
  }
}
