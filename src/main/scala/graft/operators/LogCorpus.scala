package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic CloudWatch-style log corpus synthesized from the `events`
  * table — the bridge between the driver's TPC-H-ish testdata and the
  * reference's log-event domain (SURVEY.md §2.1 fixtures).
  *
  * Every branch of the reference parser (shipper.js:62-112) and classifier
  * (shipper.js:31-49) is exercised:
  *
  *  - signup   -> `START RequestId: ...`              platform drop (S9)
  *  - error    -> raw error lines, k-bucketed over the three classifier
  *                groups incl. the "module initialization error" -> runtime
  *                first-match quirk (shipper.js:31-47)
  *  - click    -> JSON logs (S10a), k>=80 carrying an error message
  *  - purchase -> k<50: JSON *without* a `message` key — the hidden edge case
  *                (SURVEY.md §2.1) that must fall through to the raw branch;
  *                k>=50: tab-structured logs (S10b, shipper.js:22)
  *  - view     -> parser edge cases by k-bucket: k>=90 JSON with a nested
  *                object value; 80-89 non-string `message` plus a nested
  *                decoy `"message":"x"` (must go raw); 70-79 structured
  *                line with a tab in the tail (JS split('\t',3) truncates);
  *                60-69 unicode-escaped key/value JSON (JSON.parse
  *                normalizes); else raw passthrough lines (S10c)
  *
  * The construction is pure deterministic string algebra over (event_id,
  * user_id, event_type, k, second-truncated ts), so the DuckDB oracle can
  * derive the expected parser *output* independently — see
  * [[graft.OracleSql.logCorpusBase]].
  */
object LogCorpus {
  val Region = "us-east-1"
  val LogStream = "2024/01/01/[$LATEST]abc123"

  /** Adds the envelope/enrichment inputs + the synthesized `msg` column. */
  def withMessages(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    val eid = col("event_id").cast("string")
    val rid = concat(lit("r-"), eid)
    val iso = concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"), lit(".000Z"))
    val uid = concat(lpad(eid, 8, "0"), lit("-0000-0000-0000-"), lpad(eid, 12, "0"))
    val ks = k.cast("string")
    val et = col("event_type")

    val msg =
      when(et === "signup", concat(lit("START RequestId: "), rid))
        .when(et === "error" && k < 20,
          concat(lit("unable to import module handler_"), ks))
        .when(et === "error" && k < 40,
          concat(lit("module initialization error: code "), ks))
        .when(et === "error" && k < 60,
          concat(lit("Task timed out after "), ks, lit(" seconds")))
        .when(et === "error",
          concat(lit("Process exited before completing request "), ks))
        .when(et === "click" && k >= 80,
          concat(lit("{\"message\":\"error: payment failed "), ks,
            lit("\",\"requestId\":\""), rid, lit("\",\"timestamp\":\""), iso,
            lit("\",\"k\":\""), ks, lit("\"}")))
        .when(et === "click",
          concat(lit("{\"message\":\"clicked button "), ks,
            lit("\",\"requestId\":\""), rid, lit("\",\"timestamp\":\""), iso,
            lit("\",\"k\":\""), ks, lit("\"}")))
        .when(et === "purchase" && k < 50,
          concat(lit("{\"level\":\"info\",\"k\":\""), ks, lit("\"}")))
        .when(et === "purchase",
          concat(iso, lit("\t"), uid, lit("\t"), lit("purchased item "), ks))
        // view k>=90: JSON with a NESTED object value — JSON.parse spreads
        // it; engine keeps it as re-serialized text in attrs (declared
        // deviation, now corpus-exercised)
        .when(et === "view" && k >= 90,
          concat(lit("{\"message\":\"viewed nested "), ks,
            lit("\",\"ctx\":{\"a\":1}}")))
        // view 80-89: NON-STRING outer message + nested object whose own
        // "message":"x" key would fool a raw-text regex guard — JS throws in
        // checkLogError (5 has no .match) and emits the raw doc
        .when(et === "view" && k >= 80,
          concat(lit("{\"message\":"), ks,
            lit(",\"inner\":{\"message\":\"x\"}}")))
        // view 70-79: structured line with a TAB in the tail — JS
        // split('\t',3) truncates after the third field
        .when(et === "view" && k >= 70,
          concat(iso, lit("\t"), uid, lit("\tviewed item "), ks,
            lit("\ttail-"), ks))
        // view 60-69: unicode-escaped key/value (\u006d='m', \u0065='e') —
        // JSON.parse normalizes both, so this IS a JSON log with an 'error'
        // message
        .when(et === "view" && k >= 60,
          concat(lit("{\"\\u006dessage\":\"hi \\u0065rror "), ks, lit("\"}")))
        .otherwise(concat(lit("user viewed page "), ks))

    events
      .withColumn("k", k)
      .withColumn("logGroup",
        concat(lit("/aws/lambda/fn-"), (col("user_id") % 8).cast("string")))
      .withColumn("logStream", lit(LogStream))
      .withColumn("aws_region", lit(Region))
      .withColumn("msg", msg)
  }

  /** The corpus run through the real parse/classify/enrich operators
    * (S6, S7, S9, S10a-c, S11, S12), keeping `event_id` for oracle joins.
    */
  def parsed(events: DataFrame): DataFrame =
    // shared by classify/error-hist/entry — one scoped cache entry per
    // events frame (graft.Caches evicts the predecessor on sf change), so
    // the synthesis+parse runs once per (session, sf) and a long session
    // never accretes cached corpora
    graft.Caches.cached("logcorpus",
        events.queryExecution.analyzed.semanticHash().toString) {
      val m = withMessages(events)
      LogPipeline.parseStaged(m,
          LogPipeline.lambdaName(col("logGroup")),
          LogPipeline.lambdaVersion(col("logStream")),
          col("msg"), col("aws_region"))
        .filter(col("doc").isNotNull)
        .select(col("event_id"), col("doc.*"))
    }
}
