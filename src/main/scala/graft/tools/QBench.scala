package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-time standalone query timer: `runMain graft.tools.QBench q1 q2 ...`
  * runs each named SparkEntry query REPS times against SPARK_GRAFT_SF_DIR
  * (default sf0.1) and prints per-run seconds — the tool for separating a
  * real regression from machine contention (single-run bench numbers here
  * carry ±30% noise). */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.sharedState.cacheManager.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[qbench] $name: ${times.map(t => f"$t%.2f").mkString(" ")} s (min ${times.min}%.2f)")
    }
    spark.stop()
  }
}
