package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-forecast accuracy metrics — the readout layer for the
  * time-series tier (Holt/EWMA/seasonality forecasts in
  * [[graft.events.TimeSeries]] produce predictions; this scores them
  * per series). Completes the eval family the way
  * [[graft.eval.BinaryMetrics]] does for classifiers.
  *
  * Scale shape: ONE hash aggregate keyed on the series columns —
  * conditional sums only, no window, no second scan. Output is one row
  * per series key. */
object ForecastEval {

  /** Per-key forecast accuracy over (actual, predicted) rows:
    *
    *  - `mae`   mean |error|,
    *  - `rmse`  √(mean error²),
    *  - `bias`  mean (pred − actual) — signed, detects systematic
    *            over/under-forecast,
    *  - `mape`  mean |error|/|actual| over NONZERO actuals only
    *            (zero-actual rows are excluded from this ratio and
    *            counted in `n_zero_actual`; the conventional dodge of
    *            the divide-by-zero, made visible rather than silent),
    *  - `smape` mean 2|error|/(|actual|+|pred|) over rows where the
    *            denominator is nonzero (both-zero rows score a perfect
    *            0 by convention and are INCLUDED in the mean),
    *  - `wape`  Σ|error| / Σ|actual| — the volume-weighted aggregate
    *            ratio (robust to the small-denominator rows that
    *            dominate MAPE); null when Σ|actual| = 0.
    *
    * Empty keys cannot occur (the aggregate only emits observed keys);
    * an all-zero-actual key yields null mape/wape. */
  def forecastEval(df: DataFrame, actualCol: String, predCol: String,
                   keys: Seq[String] = Nil): DataFrame = {
    val y = col(actualCol).cast("double")
    val p = col(predCol).cast("double")
    val clean = df.na.drop(keys ++ Seq(actualCol, predCol))
    val e = p - y
    val ae = abs(e)
    val sdenom = abs(y) + abs(p)
    val aggs = Seq(
      count(lit(1)).as("n"),
      sum(when(y === 0, 1L).otherwise(0L)).as("n_zero_actual"),
      avg(ae).as("mae"),
      sqrt(avg(e * e)).as("rmse"),
      avg(e).as("bias"),
      avg(when(y =!= 0, ae / abs(y))).as("mape"),
      avg(when(sdenom > 0, lit(2.0) * ae / sdenom).otherwise(lit(0.0)))
        .as("smape"),
      (sum(ae) / nullif(sum(abs(y)), lit(0.0))).as("wape"))
    if (keys.isEmpty) clean.agg(aggs.head, aggs.tail: _*)
    else clean.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
