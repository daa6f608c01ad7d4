package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Front-door ingestion operators: the step BEFORE a corpus exists,
  * where raw interchange bytes (JSONL — the lingua franca of crawl
  * dumps and dataset releases) become typed rows. At 100 TB the
  * defining requirement is that malformed records are IMPOSSIBLE to
  * silently drop OR silently null-through: every input line comes out
  * exactly once, tagged parsed-or-quarantined, so the quarantine rate
  * is a first-class pipeline metric and bad shards surface immediately.
  *
  * Reference analog: the sink-side envelope serializers
  * (`internal/eventing/sink`) assume well-formed JSON end-to-end; the
  * ingest direction needs the tolerant half. All row-local (codegen
  * `from_json`, no shuffle, streaming-legal as a map-only stage).
  */
object Ingest {

  /** Tolerant JSONL parse: `rawCol` (one JSON object per row) against
    * `schema`, keeping every input row — valid lines surface their
    * typed fields, malformed lines keep NULL fields and
    * `is_corrupt = true` plus the raw payload for the quarantine
    * channel. Corruption is judged by `markerCol` (a field the source
    * contract makes NON-null in every valid record, e.g. the id):
    * Spark's PERMISSIVE `from_json` yields a NULL struct or NULL
    * fields for malformed input depending on how the parse fails, and
    * anchoring on a mandatory field collapses both into one honest
    * flag. Columns in `keep` pass through (line numbers, shard ids).
    */
  def jsonlParse(raw: DataFrame, schema: StructType, markerCol: String,
                 rawCol: String = "line", keep: Seq[String] = Nil): DataFrame = {
    require(schema.fieldNames.contains(markerCol),
      s"jsonlParse: marker '$markerCol' not in schema ${schema.fieldNames.mkString(",")}")
    val parsed = raw.withColumn("__p", from_json(col(rawCol), schema))
    val corrupt = col("__p").isNull || col("__p").getField(markerCol).isNull
    parsed.select(
      keep.map(col) ++
        schema.fieldNames.toSeq.map(f =>
          when(!corrupt, col("__p").getField(f)).as(f)) :+
        corrupt.as("is_corrupt") :+
        when(corrupt, col(rawCol)).as("quarantine_raw"): _*)
  }

  /** Quarantine-rate report over a [[jsonlParse]] output: lines and
    * corrupt lines per `groupCol` (shard, source file, date) — the
    * operational dashboard row. One partial-agg shuffle. */
  def quarantineStats(parsed: DataFrame, groupCol: String): DataFrame =
    parsed.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("is_corrupt"), 1L).otherwise(0L)).as("n_corrupt"))
}
