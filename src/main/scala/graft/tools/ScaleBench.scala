package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-probe bench: empirically back the "survives a 10×/100× scale-up"
  * design claims (r9 verdict item 5) by timing the most expensive
  * non-streaming declared queries at sf0.1 and at a ScaleGen'd ×10 tier,
  * and reporting the wall-time growth ratio per query.
  *
  * `runMain graft.tools.ScaleBench [scaledDir] [outFile]`
  *
  * Acceptance gate: 10× data should cost ≤ ~12× wall (linear + a log factor
  * for sort/shuffle depth); the artifact flags anything above 12× and hard-
  * flags > 20× (2× super-linear). Queries whose base time is under 0.5 s are
  * annotated `fixed_cost` — there the ratio mostly measures job-scheduling
  * floor, not throughput, and a large ratio is NOT evidence of super-linear
  * data work (it is evidence the base run never left the fixed-cost regime).
  *
  * Probe set: the top batch data-path queries by self-bench cost, covering
  * every candidate-generation pattern whose scaling could go quadratic if a
  * cap/band were wrong — MinHash/SimHash/Jaccard/embedding-LSH near-dup,
  * connected components, SemDeDup, IVF top-k, TextRank, BPE, TF-IDF — plus
  * scan-agg/join/window/skew baselines (TPC-H shapes). Streaming is excluded
  * (micro-batch scheduling floor dominates; state is watermark-bounded by
  * construction and StreamingSpec covers eviction), and the KV-registry
  * queries are excluded (the registry is the documented in-driver modeling
  * boundary, explicitly capped and "not a data path" — SURVEY §8).
  *
  * Methodology mirrors Bench: warm-up pass at sf0.001 (JIT + codegen
  * compile), min of REPS timed runs per (query, tier), noop sink so the
  * whole plan executes, cache cleared between runs.
  */
object ScaleBench {
  val probes: Seq[String] = Seq(
    // scan-agg / join / window / skew baselines (TPC-H shapes)
    "q1_pricing_summary", "q9_product_profit", "q16_supplier_parts",
    "q_revenue_by_nation_year", "q_window_topn_per_customer",
    "q_sessionize_batch", "q_skew_salted_agg", "q_skew_salted_join",
    // dedup family — every banded/blocked candidate generator
    "q_dedup_exact", "q_minhash_lsh", "q_simhash", "q_ngram_jaccard",
    "q_edit_distance", "q_dup_clusters", "q_image_neardup",
    // similarity family
    "q_embed_neardup_lsh", "q_cosine_topk", "q_cosine_topk_ivf",
    "q_semantic_dedup",
    // text-analysis heavies (iterative / two-pass)
    "q_tfidf", "q_textrank", "q_bpe_merges", "q_collocations",
    "q_vocab_build", "q_token_entropy")

  def main(args: Array[String]): Unit = {
    val scaledDir = args.lift(0).getOrElse("/root/repo/target/scaledata/sf1")
    val outFile = args.lift(1).getOrElse("/root/repo/BENCH_SCALE.json")
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = graft.Sessions.local("graft-scalebench")

    def exec(name: String, dir: String): Unit = {
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
    }
    // warm-up: JIT + whole-stage-codegen compile off the timed path
    probes.foreach(exec(_, warmDir))

    def time(name: String, dir: String): Double = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      exec(name, dir)
      (System.nanoTime() - t0) / 1e9
    }.min

    val base = probes.map(q => q -> time(q, baseDir)).toMap
    val scaled = probes.map(q => q -> time(q, scaledDir)).toMap
    val ratio = probes.map(q => q -> scaled(q) / math.max(base(q), 1e-9)).toMap
    def f(d: Double) = f"$d%.3f".toDouble
    val rows = probes.map { q =>
      val tags = Seq(
        if (base(q) < 0.5) Some("\"fixed_cost\"") else None,
        if (ratio(q) > 20 && base(q) >= 0.5) Some("\"superlinear\"")
        else if (ratio(q) > 12 && base(q) >= 0.5) Some("\"watch\"") else None
      ).flatten.mkString(",")
      s""""$q":{"base_sec":${f(base(q))},"scaled_sec":${f(scaled(q))},"ratio":${f(ratio(q))},"tags":[$tags]}"""
    }
    val meaningful = probes.filter(base(_) >= 0.5)
    val flagged = meaningful.filter(ratio(_) > 12)
    val json =
      s"""{"metric":"scale_probe","base_sf":"$baseDir","scaled_dir":"$scaledDir",""" +
      s""""copies":10,"reps":$reps,""" +
      s""""base_total_sec":${f(base.values.sum)},"scaled_total_sec":${f(scaled.values.sum)},""" +
      s""""total_ratio":${f(scaled.values.sum / base.values.sum)},""" +
      s""""flagged":[${flagged.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""queries":{${rows.mkString(",")}}}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
