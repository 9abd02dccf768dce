package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins over the shipper's document stream — the remaining
  * Structured Streaming join shape (SURVEY.md §2.2 streaming row; the
  * reference itself is stateless, this is north-star surface).
  */
object StreamJoins {

  /** Attribute each streamed error doc to deploys of the same function
    * that happened up to `horizonMinutes` before it — the "did a deploy
    * cause this error burst?" correlation, as a watermarked stream-stream
    * interval join.
    *
    * Semantics/state contract: both sides carry event-time watermarks and
    * the join condition bounds err_ts to [dep_ts, dep_ts + horizon], so
    * Spark can expire join state on BOTH sides once the watermark passes
    * the horizon — bounded state by construction, the only shape a
    * stream-stream join may take at 100 TB/day ingest (an unbounded-range
    * join would accrete the full deploy history per function).
    *
    * Expected schemas: errors(function_name, err_ts, message),
    * deploys(dep_function, dep_ts, version).
    */
  def errorsNearDeploys(errors: DataFrame, deploys: DataFrame,
                        horizonMinutes: Int = 5,
                        watermark: String = "10 minutes"): DataFrame =
    errors.withWatermark("err_ts", watermark)
      .join(deploys.withWatermark("dep_ts", watermark),
        expr(s"""function_name = dep_function
                |AND err_ts >= dep_ts
                |AND err_ts <= dep_ts + interval $horizonMinutes minutes
                |""".stripMargin))
      .select(col("function_name"), col("version"), col("dep_ts"),
        col("err_ts"), col("message"))
}
