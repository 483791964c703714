package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * JSONL (newline-delimited JSON) export — the handoff format trainers
 * and tokenizer pipelines actually ingest (HF datasets, Megatron/NeMo
 * preprocessors, tooling scripts all read .jsonl): one JSON object per
 * line, UTF-8, written through Spark's native JSON datasource so the
 * write stays a distributed, codegen'd, partition-parallel sink — one
 * file per partition, no driver funnel, task-commit protocol included
 * (unlike the raw per-partition streams in MirrorSink/WET, this sink
 * inherits Spark's atomic FileOutputCommitter semantics for free).
 *
 * Fidelity is gated end-to-end rather than asserted: q_jsonl_roundtrip
 * writes the documents table, reads the files BACK through the JSON
 * parser, and the oracle compares against the original rows — so JSON
 * string escaping (quotes, control chars, non-ASCII), null handling,
 * and numeric round-tripping are all under the hash compare.
 */
object JsonlSink {

  /** Write `df` as JSONL under `path` (one .json file per partition). */
  def write(df: DataFrame, path: String,
            compression: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** Read a JSONL directory back with an EXPLICIT schema (inference
    * would re-scan the data and can widen types; a roundtrip gate wants
    * the exact schema it wrote). */
  def read(spark: SparkSession, path: String,
           schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
