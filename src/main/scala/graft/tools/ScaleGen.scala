package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ×N scale-up of the driver testdata, for the scale-probe
  * bench (`runMain graft.tools.ScaleGen [outDir] [copies] [srcDir]`).
  *
  * The probe's question is "does wall time grow ~linearly with data volume"
  * (SURVEY §6 / r9 verdict item 5), so the scaled corpus must be
  * STATISTICALLY SELF-SIMILAR to the base corpus — N independent shards that
  * each look exactly like sf0.1 — not N literal replicas. A literal ×10 copy
  * would turn every duplicate group, LSH bucket and near-neighbor list 10×
  * denser, measuring a DIFFERENT workload (quadratic candidate growth) rather
  * than the same workload on more data. Per table:
  *
  *   - fact/dim keys shift by `copy * (max(key)+1)` so copies never collide
  *     and referential integrity (orders→customer, lineitem→{orders,part,
  *     supplier}) holds within each copy; region/nation stay fixed (global
  *     dims, as in TPC-H where nation is SF-independent);
  *   - `documents.text` of copy i>0 suffixes every whitespace token with
  *     "_i": intra-copy shingle/token structure (near-dup pairs, TF-IDF
  *     shape, n-gram stats) is preserved exactly, while NO shingle survives
  *     across copies — cross-copy Jaccard is 0, so dedup candidate volume
  *     scales linearly like a real corpus; n_chars is recomputed;
  *   - `embeddings.embedding` of copy i is the base vector cyclically
  *     rotated by i positions: a permutation preserves norms and all
  *     intra-copy dot products (the copy's ANN geometry is isometric to the
  *     base) while cross-copy cosine drops to noise;
  *   - `events` shifts event_id/user_id AND shifts copy i's timestamps by
  *     i whole-day strides: per-user window/session density is unchanged
  *     (each user lives in one copy) while the stream gets N× LONGER in
  *     event-time instead of N× denser — so watermark horizons actually
  *     expire state across copies, like a real longer-running ingest.
  *
  * Output layout mirrors /root/testdata (`<out>/<table>.parquet`), so every
  * SparkEntry query runs against it unmodified. Deterministic: no RNG, the
  * same inputs always produce byte-identical rows (file split layout aside).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("/root/repo/target/scaledata/sf1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val src = args.lift(2).getOrElse("/root/testdata/sf0.1")
    // optional 4th arg: comma-separated table subset — the ×1000 tier only
    // materializes the tables its two probe queries read (a full ×1000
    // lineitem+orders+events copy would be ~20 GB of parquet nobody scans)
    val tables = args.lift(3).map(_.split(",").toSet)
    val spark = graft.Sessions.local("graft-scalegen")
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, copies, tables)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, copies: Int,
      tables: Option[Set[String]] = None): Unit = {
    def read(t: String): DataFrame = graft.sources.Tables.load(spark, src, t)
    def write(t: String, df: DataFrame): Unit =
      if (tables.forall(_.contains(t))) {
        df.write.mode("overwrite").parquet(s"$out/$t.parquet")
        println(s"[scalegen] $t -> $out/$t.parquet")
      }
    // stride = max(key)+1 per keyed table, so shifted copies never collide
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    // cross-join each row with copy indices 0..copies-1 as column `_i`
    def fan(df: DataFrame): DataFrame =
      df.withColumn("_i", explode(lit((0 until copies).toArray)))
    def shift(c: String, s: Long) = (col(c) + col("_i") * s).as(c)

    // global dims: SF-independent, copied verbatim (like TPC-H nation/region)
    write("region", read("region"))
    write("nation", read("nation"))

    val cust = read("customer"); val custS = stride(cust, "c_custkey")
    // c_name regenerates from the SHIFTED key ('Customer#' || 9-digit pad —
    // the base generator's own rule, so copy 0 is byte-identical): a
    // verbatim name copy would put 10/100 IDENTICAL names in every ER
    // block, densifying the linkage candidate set quadratically — the same
    // self-similarity requirement the documents/embeddings perturbations
    // implement (copies must look like MORE customers, not repeated ones)
    write("customer", fan(cust).select(shift("c_custkey", custS),
      concat(lit("Customer#"),
        lpad((col("c_custkey") + col("_i") * custS).cast("string"), 9, "0"))
        .as("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")))

    val supp = read("supplier"); val suppS = stride(supp, "s_suppkey")
    write("supplier", fan(supp).select(shift("s_suppkey", suppS),
      col("s_name"), col("s_nationkey"), col("s_acctbal")))

    val part = read("part"); val partS = stride(part, "p_partkey")
    write("part", fan(part).select(shift("p_partkey", partS), col("p_name"),
      col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")))

    val ord = read("orders"); val ordS = stride(ord, "o_orderkey")
    write("orders", fan(ord).select(shift("o_orderkey", ordS),
      shift("o_custkey", custS), col("o_orderstatus"), col("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority")))

    val li = read("lineitem")
    write("lineitem", fan(li).select(shift("l_orderkey", ordS),
      shift("l_partkey", partS), shift("l_suppkey", suppS),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")))

    val ev = read("events")
    val evS = stride(ev, "event_id"); val userS = stride(ev, "user_id")
    // Copy i's timestamps shift by i whole-day strides past the base span:
    // the ×N stream is N× LONGER in event-time, not N× denser. A verbatim
    // ts copy makes every scaled event land inside one base-sized horizon,
    // so watermark-bounded state (the q_stream_dedup probe) can never
    // demonstrate eviction — its in-horizon working set IS the whole
    // stream (the r15 "probe artifact"). Per-user density, session gaps
    // and window shapes are unchanged (each user lives in one copy); the
    // timeline growing with volume is exactly what a real ingest does.
    val tsDayStride = {
      val r = ev.select(
        (floor((unix_micros(max(col("ts")).cast("timestamp")) -
          unix_micros(min(col("ts")).cast("timestamp"))) /
          (86400L * 1000000L)) + lit(2L)).as("d")).head()
      r.getLong(0)
    }
    write("events", fan(ev).select(shift("event_id", evS),
      expr(s"timestampadd(DAY, _i * ${tsDayStride}L, ts)").as("ts"),
      shift("user_id", userS), col("event_type"), col("value"), col("props")))

    val docs = read("documents"); val docS = stride(docs, "doc_id")
    // copy 0 is the base corpus verbatim; copy i>0 suffixes every token with
    // "_i" — same intra-copy structure, zero cross-copy shingle overlap
    val perturbed = when(col("_i") === 0, col("text")).otherwise(
      concat_ws(" ", transform(split(col("text"), " "),
        w => concat(w, lit("_"), col("_i")))))
    write("documents", fan(docs).select(shift("doc_id", docS),
      perturbed.as("text"), col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")))

    val emb = read("embeddings"); val embS = stride(emb, "vec_id")
    // cyclic rotation by copy index: an isometry of each copy's geometry.
    // Rotation repeats mod dim, so for copies >= dim (the ×100 tier on
    // 64-dim vectors) the second lap is ALSO negated — negation preserves
    // every intra-copy dot product (signs cancel pairwise) while sending
    // cross-lap cosine to its negative, keeping cross-copy near-dup density
    // at zero through 2×dim copies.
    val dim = size(col("embedding"))
    val rolled = transform(sequence(lit(0), dim - 1),
      j => element_at(col("embedding"), ((j + col("_i")) % dim) + 1))
    val rotated = when(col("_i") < dim, rolled)
      .otherwise(transform(rolled, x => -x))
    write("embeddings", fan(emb).select(shift("vec_id", embS),
      rotated.as("embedding"), col("label")))
  }
}
