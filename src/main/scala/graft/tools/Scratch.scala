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

    @volatile var taskMs = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) taskMs += m.executorRunTime
      }
    })

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(tag: String)(body: => Unit): Unit = {
      (1 to 4).foreach { i =>
        taskMs = 0
        val t0 = System.nanoTime()
        body
        val w = (System.nanoTime() - t0) / 1e9
        Thread.sleep(100)
        println(f"[scratch] $tag pass$i: wall=$w%.3fs taskSum=${taskMs / 1e3}%.2fs")
      }
    }

    Seq(1, 4, 8, 16, 32).foreach { n =>
      val d = if (n == 1) docs else docs.repartition(n)
      time(s"vocab-agg width=$n") {
        d.select(explode(split(col("text"), " ")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    Seq(8, 16, 32).foreach { n =>
      val d = orders.repartition(n)
      time(s"md5-agg width=$n") {
        d.select(expr(
            "cast(conv(substring(md5(cast(o_orderkey as string)),1,8),16,10) as bigint)")
            .as("h"))
          .agg(sum("h"), count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
