package graft.textanalysis

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size token chunking with overlap — the RAG/context-window
  * prep step: every document splits into `size`-token windows whose
  * starts advance by `size − overlap`, so consecutive chunks share
  * `overlap` tokens and no token is more than one stride from a chunk
  * boundary. The last chunk is the one whose window reaches the end
  * (standard splitter rule: no trailing chunk that is a pure suffix of
  * its predecessor — chunk count is 1 + ⌈(n − size)/stride⌉, exactly).
  *
  * Wholly distributed and codegen-friendly: one `split`, one integer
  * chunk-count expression, one `explode(sequence(...))`, one `slice` —
  * no UDF, no window, no shuffle beyond the explode's narrow expansion.
  * Token arithmetic is integer, so the chunk boundaries replay exactly
  * on any engine. Output: (id, chunk_id, n_chunk_tokens, chunk_text);
  * empty/whitespace-only docs produce no chunks. */
object Chunker {
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    df.where(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol),
        split(trim(col(textCol)), "\\s+").as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // ⌈(n − size)/stride⌉ via integer arithmetic, 0 when n ≤ size
      .withColumn("__kmax",
        when(col("__n") <= chunkSize, lit(0))
          .otherwise(expr(s"(__n - $chunkSize + ${stride - 1}) div $stride")))
      .select(col(idCol),
        explode(expr("sequence(0, __kmax)")).as("chunk_id"),
        col("__toks"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("__toks"),
          col("chunk_id") * stride + 1, lit(chunkSize)).as("__ct"))
      .select(col(idCol), col("chunk_id"),
        size(col("__ct")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("__ct")).as("chunk_text"))
  }
}
