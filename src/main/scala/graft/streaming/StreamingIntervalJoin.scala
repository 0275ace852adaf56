package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream INTERVAL join — the attribution shape (each conversion
  * matches the same user's impressions within an event-time window), the
  * one join class Structured Streaming cannot express as a broadcast or
  * stateless map: both sides buffer keyed state, the interval condition
  * bounds how long a row can still match, and the watermarks let the
  * engine EVICT state (without them the buffers grow forever — at 100 TB
  * of events the watermark IS the memory bound).
  *
  * Matched rows emit as they join (inner-join semantics); the
  * `horizon` watermark + the interval bound give Spark the proof it
  * needs that an impression older than (watermark − window) can never
  * match again and its state can drop. The same plan runs batch —
  * StreamingJoinSpec proves streaming ≡ the batch range join. */
object StreamingIntervalJoin {

  /** Join conversions to the same user's impressions within
    * [imp_ts, imp_ts + windowSec]. Column contract: impressions
    * (user_id, imp_ts, imp_id), conversions (c_user_id, conv_ts,
    * conv_id). */
  def attribute(impressions: DataFrame, conversions: DataFrame,
      horizon: String = "10 minutes", windowSec: Int = 3600): DataFrame =
    impressions.withWatermark("imp_ts", horizon)
      .join(conversions.withWatermark("conv_ts", horizon),
        expr(s"""user_id = c_user_id AND
                 conv_ts >= imp_ts AND
                 conv_ts <= imp_ts + interval $windowSec seconds"""))
      .select(col("user_id"), col("imp_id"), col("conv_id"),
        col("imp_ts"), col("conv_ts"))
}
