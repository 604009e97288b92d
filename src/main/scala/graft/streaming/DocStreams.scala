package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming mirrors of the document-pipeline operators — continuous
  * ingestion shapes of the batch ops in [[graft.llm.Dedup]].
  */
object DocStreams {

  /** Streaming benchmark decontamination: the continuous-ingestion
    * mirror of [[graft.llm.Dedup.decontaminate]]. The incoming document
    * stream is shingled map-side (same single-pass hash kernel), joined
    * STREAM-STATIC against the reference set's distinct shingle hashes
    * — a stateless per-micro-batch join, no stream state — and
    * aggregated per doc_id.
    *
    * The only stateful operator is the per-doc hit-count aggregation,
    * and its state is bounded: each doc_id arrives in one micro-batch,
    * so keys stop updating immediately and the sink sees their final
    * count in the next trigger (run in Update mode; pair with a
    * watermark on an ingest-time column to let Spark evict the
    * finished keys when the stream carries one).
    *
    * The reference side is static and broadcast — the same asymmetry
    * contract as the batch operator: eval suites are small, the stream
    * is the 100 TB side.
    */
  def decontaminate(
      docsStream: DataFrame, reference: DataFrame, n: Int = 3,
      minHits: Int = 2): DataFrame = {
    import graft.functions.text.hashed_sorted_shingles
    val refSh = reference
      .select(explode(hashed_sorted_shingles(col("text"), n)).as("g"))
      .distinct()
    docsStream
      .select(col("doc_id"),
        explode(hashed_sorted_shingles(col("text"), n)).as("g"))
      .join(broadcast(refSh), "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)
  }
}
