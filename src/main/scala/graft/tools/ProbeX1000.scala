package graft.tools

/** ×1000 scale probe (r14 verdict stretch 7b): extend the growth curve one
  * decade past BENCH_SCALE's ×100 tier for the two strongest scalers —
  * the banded MinHash-LSH candidate join and the pointer-jump connected
  * components — on a PARTIAL ×1000 tier that materializes only the tables
  * those queries read (`ScaleGen <dir> 1000 <src> documents,lineitem,...`).
  *
  * `runMain graft.tools.ProbeX1000 [x1000Dir] [outFile]`
  *
  * Methodology mirrors ScaleBench (warm-up at sf0.001, min of reps, noop
  * sink, 32 MB split hint, per-probe heartbeat). Gate analog: ×1000 data
  * within ~1200× wall (linear + a log factor); the JSON flags anything
  * above it.
  */
object ProbeX1000 {
  // q_ppjoin was TRIED here in round 16 and removed: at ×1000 (5M docs,
  // ~120M shingle rows) its rarest-first rank window plus the freq/size
  // joins need more local shuffle-spill disk than this box has (measured:
  // filled the remaining ~48 GB and died with "No space left on device" —
  // on a cluster that spill is spread across executors). Its growth curve
  // is measured through ×100 in BENCH_SCALE.json (2.9× at ×10, 16.1× at
  // ×100). Embeddings queries stay out for a different reason: the
  // rotation isometry only keeps cross-copy cosine at noise through
  // 2×dim copies.
  // round-17 additions: q_simhash (the Hamming-banded near-dup generator —
  // core LLM op, documents-only, band volume bounded by construction) and
  // the two new curation operators probed at the third decade from birth:
  // q_perplexity_filter (one vocab agg + one corpus-shaped token join) and
  // q_dsir_weights (corpus → 1024-bucket rollup → broadcast score-back).
  val probes: Seq[String] = Seq("q_minhash_lsh", "q_connected_components",
    "q_simhash", "q_perplexity_filter", "q_dsir_weights")

  def main(args: Array[String]): Unit = {
    val x1000Dir = args.lift(0)
      .getOrElse("/root/repo/target/scaledata/sf100")
    val outFile = args.lift(1).getOrElse("/root/repo/BENCH_SCALE_X1000.json")
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = graft.Sessions.local("graft-probe-x1000")
    spark.conf.set("spark.sql.files.maxPartitionBytes", 32L * 1024 * 1024)

    def exec(name: String, dir: String): Unit = {
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
    }
    probes.foreach(exec(_, warmDir))
    def time(name: String, dir: String, r: Int): Double = {
      val t = (1 to r).map { _ =>
        val t0 = System.nanoTime()
        exec(name, dir)
        (System.nanoTime() - t0) / 1e9
      }.min
      System.err.println(f"[probe-x1000] $name @ $dir: $t%.2f s")
      t
    }
    val base = probes.map(q => q -> time(q, baseDir, reps)).toMap
    // one rep at x1000: runs are minutes long; the ratio spans 3 decades
    val big = probes.map(q => q -> time(q, x1000Dir, 1)).toMap
    def f(d: Double) = f"$d%.3f".toDouble
    val rows = probes.map { q =>
      val ratio = big(q) / math.max(base(q), 1e-9)
      val tag = if (base(q) < 0.5) "\"fixed_cost\""
        else if (ratio > 1200) "\"superlinear_x1000\"" else ""
      s""""$q":{"base_sec":${f(base(q))},"x1000_sec":${f(big(q))},""" +
        s""""x1000_ratio":${f(ratio)},"tags":[$tag]}"""
    }
    val flagged = probes.filter(q =>
      base(q) >= 0.5 && big(q) / base(q) > 1200)
    val json =
      s"""{"metric":"scale_probe_x1000","base_sf":"$baseDir",""" +
      s""""x1000_dir":"$x1000Dir","reps":$reps,""" +
      s""""flagged":[${flagged.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""queries":{${rows.mkString(",")}}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
