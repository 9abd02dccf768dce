package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType
import org.apache.spark.sql.types.StringType

import graft.Tables.{dec, t, toDouble}

/** Scalar-function surface coverage (SURVEY.md §2.2 string / date / math /
  * array / map-JSON rows), one oracle-checked projection query per family.
  * All per-row, no shuffle except the final presentation sort — these plans
  * are pure whole-stage-codegen maps at any scale.
  *
  * Parity notes: only IEEE-deterministic math (sqrt/abs/floor/ceil/mod) is
  * oracle-compared — transcendentals (ln/exp/pow) differ across libms and
  * are excluded. Rounding goes through decimals (HALF_UP == away-from-zero
  * for positive values in both engines).
  */
object FunctionQueries {

  def qStringFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("u"),
        lower(col("p_type")).as("lo"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 1, 5).as("sub"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("re_word"),
        instr(col("p_name"), "widget").as("pos"),
        col("p_name").startsWith("small").as("sw"),
        col("p_name").endsWith("bolt").as("ew"),
        regexp_replace(col("p_name"), "widget", "gadget").as("rep"),
        lpad(col("p_brand"), 10, "*").as("pad"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
        trim(lit("  x  ")).as("tr"),
        reverse(col("p_brand")).as("rev"))
      .orderBy("p_partkey")

  def qDateFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        quarter(col("o_orderdate")).as("q"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate"))
          .as("days_to_2002"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd")
          .as("plus3m"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"))
      .orderBy("o_orderkey")

  def qMathFuncs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_extendedprice") - 1000.0).as("a"),
        ceil(col("l_quantity") / 7.0).cast("double").as("c"),
        floor(col("l_quantity") / 7.0).cast("double").as("f"),
        toDouble(round(dec(col("l_extendedprice")), 1)).as("r1"),
        sqrt(col("l_quantity")).as("sq"),
        (col("l_partkey") % 7).as("m7"),
        signum(col("l_discount") - 0.05).as("sg"),
        greatest(col("l_tax"), col("l_discount")).as("g"),
        least(col("l_tax"), col("l_discount")).as("l"),
        (col("l_quantity") * col("l_quantity")).as("q2"))
      .orderBy("l_orderkey", "l_linenumber")

  def qArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val tokens = split(col("text"), " ")
    t(spark, dir, "documents").select(
        col("doc_id"),
        size(tokens).as("n_tokens"),
        size(array_distinct(tokens)).as("n_distinct"),
        concat_ws(" ", slice(tokens, 1, 3)).as("first3"),
        array_contains(tokens, "spark").as("has_spark"),
        element_at(array_sort(tokens), 1).as("min_token"),
        array_join(array_sort(array_distinct(tokens)), ",").as("vocab"))
      .orderBy("doc_id")
  }

  /** explode + count: the classic token frequency query (S8 explode over
    * array values; the reference explodes logEvents the same way).
    */
  def qWordcount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  /** Map/JSON functions over the events props column (S4/S10a territory:
    * from_json to an open map, key ops, to_json reconstruction).
    */
  def qJsonFuncs(spark: SparkSession, dir: String): DataFrame = {
    val parsed = from_json(col("props"), MapType(StringType, StringType))
    t(spark, dir, "events").select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        array_join(map_keys(parsed), ",").as("keys"),
        array_join(map_values(parsed), ",").as("vals"),
        map_contains_key(parsed, "k").as("has_k"),
        to_json(map_concat(parsed,
          map(lit("e"), col("event_id").cast("string")))).as("augmented"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_string_funcs" -> qStringFuncs,
    "q_date_funcs" -> qDateFuncs,
    "q_math_funcs" -> qMathFuncs,
    "q_array_funcs" -> qArrayFuncs,
    "q_wordcount" -> qWordcount,
    "q_json_funcs" -> qJsonFuncs)

  val oracles: Map[String, String] = Map(
    "q_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS u, lower(p_type) AS lo,
        |  length(p_name) AS len, substring(p_name, 1, 5) AS sub,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS re_word,
        |  instr(p_name, 'widget') AS pos,
        |  starts_with(p_name, 'small') AS sw, ends_with(p_name, 'bolt') AS ew,
        |  regexp_replace(p_name, 'widget', 'gadget') AS rep,
        |  lpad(p_brand, 10, '*') AS pad,
        |  concat_ws('|', p_brand, p_type) AS cw,
        |  trim('  x  ') AS tr, reverse(p_brand) AS rev
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  quarter(o_orderdate) AS q, dayofmonth(o_orderdate) AS d,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS days_to_2002,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_extendedprice - 1000.0) AS a,
        |  CAST(ceil(l_quantity / 7.0) AS DOUBLE) AS c,
        |  CAST(floor(l_quantity / 7.0) AS DOUBLE) AS f,
        |  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)), 1) AS DOUBLE) AS r1,
        |  sqrt(l_quantity) AS sq,
        |  l_partkey % 7 AS m7,
        |  CASE WHEN l_discount - 0.05 > 0 THEN 1.0
        |       WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS sg,
        |  greatest(l_tax, l_discount) AS g, least(l_tax, l_discount) AS l,
        |  l_quantity * l_quantity AS q2
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_array_funcs" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  list_sort(string_split(text, ' '))[1] AS min_token,
        |  array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',') AS vocab
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_wordcount" ->
      """SELECT word, COUNT(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_id, CAST(props->>'k' AS INTEGER) AS k,
        |  'k' AS keys, CAST(props->>'k' AS VARCHAR) AS vals,
        |  TRUE AS has_k,
        |  '{"k":"' || (props->>'k') || '","e":"' || CAST(event_id AS VARCHAR) || '"}' AS augmented
        |FROM events ORDER BY event_id""".stripMargin)
}
