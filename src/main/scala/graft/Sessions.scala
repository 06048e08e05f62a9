package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap — the Spark-native analog of the reference job's
  * session builder (reference: userdata/cloudinit.sh:337-344 builds a
  * SparkSession with app name + connector config and sets WARN logging).
  *
  * Tuned for local[N] single-JVM execution but with settings that carry to a
  * real cluster: AQE on (runtime re-planning, skew-join handling), shuffle
  * partitions matched to parallelism instead of the 200 default, UTC session
  * timezone for oracle parity.
  */
object Sessions {
  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def local(appName: String = "graft", cpus: String = defaultCpus): SparkSession = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
