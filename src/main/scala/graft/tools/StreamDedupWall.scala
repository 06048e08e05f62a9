package graft.tools

/** q_stream_dedup wall attribution (r17 verdict item 1): the probe's ×100
  * wall ratio moved 61× → 110× round-over-round with NO code change — the
  * only probe above the data ratio — while its state stayed plateaued.
  * After the containment lesson (CONTAINMENT_CANDIDATES.json), "machine
  * floor" must be shown, not assumed: this tool re-runs the EXACT
  * q_stream_dedup pipeline at base/×10/×100 through an instrumented handle
  * (Streaming.dedupWallProbe) and decomposes each tier's wall into the
  * components that CAN own it — micro-batch count, per-component trigger
  * durations (addBatch / walCommit / commitOffsets / state maintenance),
  * state-store put/evict counts and times, memory-sink volume, the final
  * batch sort of the sink, and JVM GC time.
  *
  * `runMain graft.tools.StreamDedupWall [x10Dir] [x100Dir] [outFile]`
  *
  * What distinguishes q_stream_dedup from every other stream probe is its
  * SINK: it is the only one whose output is the full deduped EVENT stream
  * (≈10M rows at ×100) landing in a driver-side memory sink and then batch-
  * sorted — the other probes emit small aggregates. The decomposition below
  * separates that harness-side cost (rows into the memory sink + sort_sec,
  * GC) from the engine-side state costs the probe exists to bound, so the
  * round-over-round wall drift can be pinned on the component that moved.
  */
object StreamDedupWall {
  def main(args: Array[String]): Unit = {
    val x10Dir = args.lift(0).getOrElse("/root/repo/target/scaledata/sf1")
    val x100Dir = args.lift(1).getOrElse("/root/repo/target/scaledata/sf10")
    val outFile = args.lift(2).getOrElse("/root/repo/STREAM_DEDUP_WALL.json")
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val spark = graft.Sessions.local("graft-stream-dedup-wall")

    // warm pass: JIT + state-store engine init off the attributed path
    graft.streaming.Streaming.dedupWallProbe(spark, warmDir)
    val tiers = Seq("base" -> baseDir, "x10" -> x10Dir, "x100" -> x100Dir)
    val rows = tiers.map { case (tag, dir) =>
      val j = graft.streaming.Streaming.dedupWallProbe(spark, dir)
      System.err.println(s"[dedup-wall] $tag @ $dir: $j")
      s""""$tag":$j"""
    }
    val json =
      s"""{"metric":"stream_dedup_wall","base_sf":"$baseDir",""" +
      s""""x10_dir":"$x10Dir","x100_dir":"$x100Dir",""" +
      s""""note":"stream_sec excludes one-off staging (stage_sec) and the """ +
      """finished-sink batch sort (sort_sec); dur_ms are per-component """ +
      """sums across micro-batches from StreamingQueryProgress; state.* """ +
      """are state-store op totals/peaks; gc_*_ms is JVM GC time during """ +
      """the run - the component that moves with machine memory pressure",""" +
      s""""tiers":{${rows.mkString(",")}}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
