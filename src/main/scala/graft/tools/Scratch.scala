package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway dev micro-bench for isolating operator costs (not wired into
  * any query; safe to delete). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(tag: String)(body: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        body
        println(f"[scratch] $tag pass$i: ${(System.nanoTime() - t0) / 1e9}%.3fs")
      }
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("raw scan")(noop(docs))
    time("split only (1 part)")(noop(docs.select(split(col("text"), " ").as("w"))))
    val spread = docs.repartition(cpus.toInt)
    time("repartition only")(noop(spread))
    time("split+explode (1 part)")(
      noop(docs.select(explode(split(col("text"), " ")).as("tok"))))
    time("split+explode (spread)")(
      noop(spread.select(explode(split(col("text"), " ")).as("tok"))))
    time("vocab agg (spread)")(
      noop(spread.select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))))
    time("vocab top32 (spread)")(
      noop(spread.select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok").asc).limit(32)))
    time("bigram zip_with (spread)")(
      noop(spread.select(split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 2)
        .select(explode(expr(
          "zip_with(slice(w, 1, size(w)-1), slice(w, 2, size(w)-1), " +
            "(x, y) -> struct(x as w1, y as w2))")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))))
    spark.stop()
  }
}
