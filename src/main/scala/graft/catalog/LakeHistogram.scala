package graft.catalog

import org.apache.spark.sql.connector.read.colstats.{Histogram, HistogramBin}

import graft.functions.KllOps

/** Equi-height histograms for CBO, derived at scan-planning time from the
  * analyze-maintained KLL quantile sketches (zero data passes — the sketch
  * IS the summary).
  *
  * Bin boundaries are the sketch's quantiles at ranks i/numBins; duplicate
  * boundaries are KEPT (a heavy value owns several ranks → several
  * lo==hi bins), preserving the equi-height invariant Catalyst's
  * `FilterEstimation`/`JoinEstimation` assume: every bin holds exactly
  * `height = n / numBins` rows. Per-bin NDV is exact (1) for point bins
  * and the uniform share `ndvTotal / numBins` otherwise, clamped to
  * [1, height] — the standard equi-height uniformity assumption; skew in
  * VALUE placement is captured by the boundaries themselves, which is the
  * entire point of the histogram over plain min/max.
  *
  * Values are sketched in Catalyst's own estimation domain
  * (`EstimationUtils.toDouble`: numeric as-is, DATE as epoch days,
  * TIMESTAMP as epoch micros — see [[LakeMaintenance.analyze]]), so the
  * planner's literals land in the same coordinate system as the bins.
  */
object LakeHistogram {
  val NumBins = 64

  def fromSketch(bytes: Array[Byte], ndvTotal: Long): Option[Histogram] = {
    val s = KllOps.heapify(bytes)
    if (s.isEmpty || s.getN < 2) return None
    val n = s.getN
    val numBins = math.min(NumBins, n).toInt
    val ranks = (0 to numBins).map(_.toDouble / numBins).toArray
    val qs = s.getQuantiles(ranks,
      org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE)
    val h = n.toDouble / numBins
    val uniformNdv = math.max(1L, math.min(math.round(ndvTotal.toDouble / numBins), math.round(h)))
    val binArr: Array[HistogramBin] = Array.tabulate(numBins) { i =>
      val (loV, hiV) = (qs(i), qs(i + 1))
      new HistogramBin {
        override def lo(): Double = loV
        override def hi(): Double = hiV
        override def ndv(): Long = if (loV == hiV) 1L else uniformNdv
      }
    }
    Some(new Histogram {
      override def height(): Double = h
      override def bins(): Array[HistogramBin] = binArr
    })
  }
}
