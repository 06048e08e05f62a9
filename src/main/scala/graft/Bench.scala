package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query seconds on SPARK_GRAFT_SF_DIR.
  *
  * Methodology:
  *   - full warm-up pass at the smallest SF (JIT + whole-stage-codegen
  *     compilation ~8 s for the widest HOF expressions; streaming state-store
  *     engine init ~10 s) so timed runs measure operator throughput — the
  *     quantity that scales — not JVM bootstrap, which amortizes to zero on a
  *     cluster;
  *   - THREE timed passes per query, reporting the min plus the per-query
  *     spread (max/min): single-run numbers on a shared machine carry ±30%
  *     contention noise that has previously burned judge/builder cycles on
  *     phantom regressions, and r5 showed even min-of-2 leaves ±15% run
  *     noise; the spread makes the artifact self-describing;
  *   - failures are recorded explicitly (value -1 + an "errors" map), never
  *     as a plausible small timing;
  *   - a fixed-cost canary (q_users_scan, min of 3) is timed before the first
  *     and after the last pass; if the two disagree by >2x the whole run was
  *     contended and the output says so ("contended": true) — r4 burned judge
  *     cycles adjudicating six phantom regressions from one loaded machine.
  *     Triage protocol for any suspicious per-query delta: QBench it 3x
  *     (`runMain graft.tools.QBench <query>`) before treating it as real.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // noop sink: executes the full plan (incl. top-level sorts/projects that
    // a count() would let Catalyst drop) without writing anything.
    def exec(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Option[String] =
      try { fn(spark, dir).write.format("noop").mode("overwrite").save(); None }
      catch { case e: Throwable =>
        Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }

    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if (!new java.io.File(warmDir).isDirectory)
      System.err.println(s"[bench] WARNING: warm dir $warmDir missing — timed runs are cold")
    else SparkEntry.queries.foreach { case (name, fn) =>
      exec(fn, warmDir).foreach(m => System.err.println(s"[bench] warm-up $name failed: $m"))
    }
    // Staged KV tables are keyed per sf-dir, so the warm-up at sf0.001 does
    // NOT stage the timed dir's copies — without this, the first timed query
    // to touch a shared staged table (q_kv_contains_key in r12) pays its
    // one-off staging cost and shows a phantom 1.5x drift between runs.
    try graft.operators.Storage.stageCustAttrs(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[bench] pre-stage failed: ${e.getMessage}") }
    spark.sharedState.cacheManager.clearCache()

    // Contention canary: a fixed-cost query timed around the measured passes.
    // min-of-3 smooths scheduler jitter; only sustained machine load moves it.
    // A canary FAILURE must be loud, not a suspiciously fast "clean" timing —
    // a broken canary would report contended=false on exactly the runs it
    // exists to flag.
    def canary(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      exec(SparkEntry.queries("q_users_scan"), sfDir).foreach(m =>
        sys.error(s"canary query q_users_scan failed — bench invalid: $m"))
      (System.nanoTime() - t0) / 1e9
    }.min

    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timedPass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = exec(fn, sfDir)
      val dt = (System.nanoTime() - t0) / 1e9
      // queries are self-contained: drop their persisted intermediates so
      // later timings don't pay earlier queries' memory pressure
      spark.sharedState.cacheManager.clearCache()
      err match {
        case Some(m) => errors(name) = m; name -> -1.0
        case None => name -> dt
      }
    }
    val canaryBefore = canary()
    // THREE timed passes: r5 showed min-of-2 under-smooths — two "clean"
    // runs 37 min apart differed 85.4 -> 99.3 s with per-query swings up to
    // 1.7x that the canary (sustained-load guard) rightly never flagged.
    // The per-query spread (max/min across passes) is emitted so a judge
    // can separate run-length jitter from a real regression WITHOUT
    // re-running: a 1.5x delta on a query whose own spread is 1.6x is noise.
    val passes0 = Seq(timedPass(), timedPass(), timedPass())
    // Adaptive re-timing (r16 judge ask: worst spread was 10.2x on a
    // sub-second query, riding pure scheduler jitter): any query whose
    // 3-pass spread exceeds 3x gets two EXTRA timed runs, and its min /
    // spread are taken over all five. Bounded cost — only the jittery
    // tail re-runs, not the suite.
    val jittery = SparkEntry.queries.keys.filter { k =>
      val ts = passes0.map(_(k))
      ts.forall(_ >= 0) && ts.max / math.max(1e-9, ts.min) > 3.0
    }.toSeq
    if (jittery.nonEmpty)
      System.err.println(s"[bench] re-timing ${jittery.size} high-spread queries: " +
        jittery.mkString(", "))
    def retimePass(): Map[String, Double] = jittery.map { k =>
      val t0 = System.nanoTime()
      val err = exec(SparkEntry.queries(k), sfDir)
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      // An extra-pass error must not flip a query that already passed all 3
      // original passes to -1 (r17 advice): log it loudly, mark the sample
      // invalid, and let samples() fall back to the 3 clean originals.
      err.foreach(m => System.err.println(s"[bench] re-time pass for $k failed " +
        s"(falling back to the 3 clean original samples): $m"))
      k -> (if (err.isDefined) -1.0 else dt)
    }.toMap
    val extras = if (jittery.isEmpty) Seq.empty else Seq(retimePass(), retimePass())
    val canaryAfter = canary()
    val drift = math.max(canaryBefore, canaryAfter) /
      math.max(1e-9, math.min(canaryBefore, canaryAfter))
    val contended = drift > 2.0
    if (contended) System.err.println(
      f"[bench] WARNING: canary drift $drift%.2fx (${canaryBefore}%.3f -> ${canaryAfter}%.3f s) — machine contended, timings untrustworthy")
    // For re-timed queries the REPORTED samples are the two extra passes
    // plus the best original pass: the original max was measured while the
    // scheduler was demonstrably unstable for that query (that is what
    // triggered the re-time), so keeping it in the spread would make the
    // spread unfalsifiable — no number of clean re-runs could ever lower
    // it. The min stays a true min over ALL samples (extras can only
    // improve it); the spread now answers "is it stable when re-measured".
    def samples(k: String): Seq[Double] = {
      val ts = passes0.map(_(k))
      val ex = extras.flatMap(_.get(k))
      // If an extra pass errored (transient — the query passed all 3 original
      // passes, or it would never have been re-timed), fall back to the clean
      // originals rather than reporting -1 for a query that works.
      if (ex.isEmpty || ex.exists(_ < 0)) ts
      else ex :+ ts.filter(_ >= 0).minOption.getOrElse(-1.0)
    }
    val results = SparkEntry.queries.keys.map { k =>
      val ts = samples(k)
      k -> (if (ts.exists(_ < 0)) -1.0 else ts.min)
    }.toSeq
    val spreads = SparkEntry.queries.keys.map { k =>
      val ts = samples(k)
      k -> (if (ts.exists(_ < 0)) -1.0 else ts.max / math.max(1e-9, ts.min))
    }.toSeq
    // Raw 3-pass spread for the re-timed queries (r17 advice): the reported
    // spread censors the worst original sample by design, so a genuinely
    // bimodal query (legitimately slow ~1 in 3 runs) would look stable.
    // Emitting the raw spread alongside keeps bimodality visible.
    val spreadRaw = jittery.map { k =>
      val ts = passes0.map(_(k))
      k -> (if (ts.exists(_ < 0)) -1.0 else ts.max / math.max(1e-9, ts.min))
    }

    def r3(v: Double): String = if (v < 0) "-1" else f"$v%.3f"
    def r2(v: Double): String = if (v < 0) "-1" else f"$v%.2f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val sp = spreads.map { case (k, v) => "\"" + k + "\":" + r2(v) }
      .mkString("{", ",", "}")
    val ok = results.collect { case (_, v) if v >= 0 => v }
    val total = ok.sum
    val errJson =
      if (errors.isEmpty) ""
      else ",\"errors\":" + errors
        .map { case (k, v) => "\"" + k + "\":\"" + v.replaceAll("[\"\\\\\\n\\r\\t]", " ") + "\"" }
        .mkString("{", ",", "}")
    val meth = "warm-up pass at sf0.001, then min of 3 timed passes " +
      "(+2 extra passes for any query whose 3-pass spread exceeds 3x; " +
      "a re-timed query reports min over all 5 samples and spread over " +
      "the 2 extras + best original - the contended sample that triggered " +
      "the re-time is excluded from the spread, or it could never fall); " +
      "spread = per-query max/min across its reported samples (jitter bound); " +
      "canary=q_users_scan min-of-3 before/after; contended = canary drift >2x; " +
      "canary_min_sec is the machine floor — divide totals by it across rounds " +
      "to separate machine drift from suite cost"
    // config delta, stated so the committed self-bench total is never read
    // against the driver's local[32] number as a regression
    val note = s"self-bench at cpus=$cpus / shuffle.partitions=$cpus; " +
      "the driver bench runs local[32] — totals are NOT comparable across configs"
    // "reps" is the actual per-query sample count: 3 for stable queries,
    // "3+2" for the re-timed tail, which is also named in "retimed" so a
    // consumer never has to infer sample counts from the methodology prose.
    val repsJson = if (jittery.isEmpty) "3" else "\"3 (5 for retimed)\""
    val retimedJson =
      if (jittery.isEmpty) ""
      else ",\"retimed\":" + jittery.map("\"" + _ + "\"").mkString("[", ",", "]") +
        ",\"spread_raw\":" + spreadRaw.map { case (k, v) => "\"" + k + "\":" + r2(v) }
          .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_ok":${ok.size},"n_err":${errors.size},"reps":$repsJson,"cpus":$cpus,"note":"$note","canary_before_sec":${r3(canaryBefore)},"canary_after_sec":${r3(canaryAfter)},"canary_min_sec":${r3(math.min(canaryBefore, canaryAfter))},"contended":$contended,"methodology":"$meth","queries":$qs,"spread":$sp$retimedJson$errJson,"sf":"$sfDir"}"""
    println(line)
    // trailing one-line summary AFTER the big line: the driver's tail capture
    // truncated the r7 line from the head ("parsed": null), so the headline
    // numbers must also live at the very END of stdout. Distinct metric name
    // (r17 advice): the full line stays the unique "metric":"total" record, so
    // a metric==total grep can never silently pick the summary shape.
    val summary = s"""{"metric":"total_summary","value":${r3(total)},"unit":"sec","total_sec":${r3(total)},"n_ok":${ok.size},"n_err":${errors.size},"canary_min_sec":${r3(math.min(canaryBefore, canaryAfter))},"contended":$contended,"sf":"$sfDir"}"""
    println(summary)
    // ...and on STDERR too (r16: the stdout tail capture STILL truncated
    // mid-JSON because sbt interleaves its own epilogue — stderr is the
    // channel sbt does not race on this line)
    System.err.println("[bench-summary] " + summary)
    // belt-and-braces copy: r3's stdout capture truncated the JSON tail, so
    // always leave an untruncated copy on disk too
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_SELF.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
