package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.Streaming

/** Streaming = batch equivalence: append-mode emission with the sentinel
  * watermark advance must reproduce exactly the batch aggregation over the
  * same finished dataset (the property the DuckDB oracles rely on).
  */
class StreamingSpec extends AnyFunSuite with SparkFixture {

  test("streamed tumbling windows equal the batch aggregation") {
    val streamed = Streaming.queries("q_stream_tumbling")(spark, sfDir)
      .collect().toSet
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))
      .collect().toSet
    assert(streamed == batch)
  }

  test("streamed dedup drops the injected duplicates and nothing else") {
    val streamed = Streaming.queries("q_stream_dedup")(spark, sfDir)
      .select("event_id").collect().map(_.getLong(0)).sorted
    val all = Tables.load(spark, sfDir, "events")
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(streamed.sameElements(all))
  }
}
