package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Input of [[WeightedAvg]]: price in exact integer cents + integer weight. */
case class WavgIn(cents: Long, w: Long)

/** Buffer of [[WeightedAvg]]: Σ(cents·weight) and Σweight. */
case class WavgBuf(sumCw: Long, sumW: Long)

/** Typed `Aggregator` UDAF demo (SURVEY.md §2.4/§7.3): weighted mean over
  * exact integer cents, registered through `functions.udaf` and used in
  * `Relational.queries("q_udaf_weighted_avg")`.
  *
  * The buffer holds integer sums only, so the result is independent of
  * partition count and partial-aggregation order: the same cross-engine
  * determinism rule every money aggregate in this repo follows (see
  * Relational.scala Scaladoc). The reference has no UDAF surface at all (its
  * one query is a bare scan, reference: userdata/cloudinit.sh:346-351); this
  * is the driver-mandated typed aggregation extension.
  */
object WeightedAvg extends Aggregator[WavgIn, WavgBuf, Double] {
  def zero: WavgBuf = WavgBuf(0L, 0L)
  def reduce(b: WavgBuf, a: WavgIn): WavgBuf =
    WavgBuf(b.sumCw + a.cents * a.w, b.sumW + a.w)
  def merge(x: WavgBuf, y: WavgBuf): WavgBuf =
    WavgBuf(x.sumCw + y.sumCw, x.sumW + y.sumW)
  def finish(b: WavgBuf): Double =
    if (b.sumW == 0L) Double.NaN else b.sumCw.toDouble / (100.0 * b.sumW)
  def bufferEncoder: Encoder[WavgBuf] = Encoders.product[WavgBuf]
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  val inputEncoder: Encoder[WavgIn] = Encoders.product[WavgIn]
}
