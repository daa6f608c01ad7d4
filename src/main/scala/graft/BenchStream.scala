package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Streaming-path throughput benchmark (the batch `Bench` never drives
  * Structured Streaming): runs the full CDC envelope stream — file
  * micro-batches → shape → stream-static broadcast chunk resolution →
  * op gates → Debezium envelope JSON — through `foreachBatch` with
  * AvailableNow, and prints ONE JSON line with events/s. This is the
  * number to hold against the reference's implied floor (≈48 ev/s from
  * its 1440-events-in-30-s snapshot test; BASELINE.md).
  *
  * `runMain graft.BenchStream [sfDir]`.
  */
object BenchStream {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // codegen falls back to interpreted expressions once a generated
      // method exceeds HotSpot's 8 KB JIT-compile limit (the 64 KB default
      // guards Janino, not the JIT): an un-JIT-able giant method runs as
      // interpreted BYTECODE, ~3x slower than Spark's interpreted
      // expression path on the wide conversion sweeps
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-bench-stream").toString
    val n = new java.util.concurrent.atomic.AtomicLong(0)
    val t0 = System.nanoTime()
    // envelope JSON is materialized per event (count(envelope) forces the
    // full payload+schema rendering, not just row counting)
    val q = graft.streaming.StreamPipeline.envelopeStream(spark, sfDir)
      .select(graft.cdc.Cdc.envelopeJsonCol().as("envelope"))
      .writeStream
      .option("checkpointLocation", s"$ckpt/cp")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        n.addAndGet(batch.filter(batch("envelope").isNotNull).count())
        (): Unit
      }
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9
    val rate = if (secs > 0) n.get() / secs else 0.0
    println(f"""{"metric":"stream_envelopes_per_sec","value":$rate%.1f,"unit":"events/sec","n_events":${n.get()},"wall_sec":$secs%.2f,"sf":"$sfDir"}""")
    spark.stop()
    if (n.get() == 0) sys.exit(1)
  }
}
