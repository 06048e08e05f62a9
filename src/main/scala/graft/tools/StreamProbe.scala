package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-time probe: run named streaming queries and dump every micro-batch's
  * durationMs map via a session-level StreamingQueryListener — shows where
  * the per-trigger wall goes (planning vs WAL vs state commit vs exec). */
object StreamProbe {
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

    @volatile var collect = false
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (collect) {
          val p = e.progress
          val dur = p.durationMs
          import scala.jdk.CollectionConverters._
          val ds = dur.asScala.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }.mkString(" ")
          println(s"[sprobe-batch] batch=${p.batchId} rows=${p.numInputRows} $ds")
        }
    })

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
      collect = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      collect = false
      Thread.sleep(300)
      println(f"[sprobe] $name wall=$wall%.2fs")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
