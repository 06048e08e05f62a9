package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * This is the engine's "source" layer — the Spark-native stand-in for the
  * reference's Cassandra table scan (reference: userdata/cloudinit.sh:346-349
  * reads keyspace/table through the DataStax connector). Parquet gives us the
  * same read-surface capabilities the pinned connector advertised — filter
  * pushdown, column pruning, partition-sized splits with preferred locations —
  * natively through the DSv1 file source (SURVEY.md §2.2).
  */
object Tables {
  val star: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val pipeline: Seq[String] = Seq("events", "documents", "embeddings")
  val all: Seq[String] = star ++ pipeline

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "events" =>
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
      // unless spark.sql.legacy.parquet.nanosAsLong is set — done once in the
      // session builders (Sessions/Verify/Bench), not here: a loader must not
      // mutate session conf as a read side effect. The long nanos are
      // truncated to microseconds, exactly what DuckDB stores internally, so
      // oracles agree.
      spark.read.parquet(path(dir, name))
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    case _ =>
      spark.read.parquet(path(dir, name))
  }

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Spread rows across all cores ONLY when the scan yields fewer splits
    * than the default parallelism (the local single-file-testdata case, where
    * expensive per-row work would otherwise serialize on one core). On a real
    * cluster the scan already has ≥cores splits and this is a genuine no-op —
    * no shuffle is added. Inspecting partition count forces physical planning
    * of the scan only, not execution. */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < p) df.repartition(p) else df
  }
}
