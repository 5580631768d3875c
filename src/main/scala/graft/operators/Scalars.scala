package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.B7): one oracle-checked query per
  * function family. Everything stays inside `org.apache.spark.sql.functions`
  * (whole-stage-codegen'd) — zero UDFs. Integer-returning functions are cast
  * to long on the Spark side because the DuckDB oracle's integers are BIGINT
  * and the compare is dtype-sensitive.
  */
object Scalars {

  /** Strings: length / substr / upper / concat_ws / instr / levenshtein /
    * regexp_extract / regexp_replace. Also proves n_chars == length(text).
    */
  def stringFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("len_text"),
        (length(col("text")).cast("long") === col("n_chars")).as("len_matches"),
        upper(substring(col("text"), 1, 8)).as("head8"),
        concat_ws("-", col("lang"), col("source")).as("lang_src"),
        instr(col("text"), "scan").cast("long").as("scan_pos"),
        levenshtein(col("lang"), lit("en")).cast("long").as("lev_en"),
        regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
        regexp_replace(substring(col("text"), 1, 20), " ", "_").as("head_snake"))
      .orderBy("doc_id")

  /** Date/time: extract parts, truncate, day difference, add months. */
  def dateFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("oyear"),
        month(col("o_orderdate")).cast("long").as("omonth"),
        dayofmonth(col("o_orderdate")).cast("long").as("oday"),
        quarter(col("o_orderdate")).cast("long").as("oquarter"),
        date_trunc("month", col("o_orderdate")).cast("date").as("omonth_start"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("days_since_epoch0"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3m"))
      .orderBy("o_orderkey")

  /** Math: sqrt/ln/ceil/floor/abs/pow/greatest/least/round. */
  def mathFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.part(spark, sfDir)
      .select(
        col("p_partkey"),
        round(sqrt(col("p_retailprice")), 6).as("sqrt_price"),
        round(log(col("p_retailprice")), 6).as("ln_price"),
        ceil(col("p_retailprice")).cast("long").as("ceil_price"),
        floor(col("p_retailprice")).cast("long").as("floor_price"),
        abs(col("p_size") - 25).cast("long").as("abs_size_off"),
        pow(col("p_size"), 2).as("size_sq"),
        greatest(col("p_size"), lit(25)).cast("long").as("size_hi"),
        least(col("p_size"), lit(25)).cast("long").as("size_lo"))
      .orderBy("p_partkey")

  /** Arrays + higher-order functions over the 64-d embedding column: size,
    * element access, HOF aggregate-sum (the dot-product building block),
    * min/max, contains. Floats are widened to double before arithmetic so
    * the sequential in-order sum is bit-identical to the oracle's.
    */
  def arrayFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.embeddings(spark, sfDir)
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        round(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
        round(expr(
          "aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), 0D, (s, x) -> s + x)"), 6)
          .as("vsum"),
        round(array_max(col("embedding")).cast("double"), 6).as("vmax"),
        round(array_min(col("embedding")).cast("double"), 6).as("vmin"),
        array_contains(col("embedding"), element_at(col("embedding"), 1)).as("has_e1"),
        size(array_distinct(col("embedding"))).cast("long").as("n_distinct"))
      .orderBy("vec_id")

  /** JSON: extract via path, via from_json map, and typed cast. The events
    * `props` column is `{"k": <int>}` (FIXTURES.md).
    */
  def jsonFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_path"),
        element_at(from_json(col("props"), lit("MAP<STRING, BIGINT>")), "k").as("k_map"),
        (get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod10"))
      .orderBy("event_id")

  /** Map family: from_json map, map_keys/map_values/size, str_to_map built
    * from row values and read back with element_at.
    */
  def mapFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("m", from_json(col("props"), lit("MAP<STRING, BIGINT>")))
      .withColumn("sm", expr("str_to_map(concat('et=', event_type, '&u=', cast(user_id as string)), '&', '=')"))
      .select(
        col("event_id"),
        array_join(map_keys(col("m")), ",").as("keys_csv"),
        element_at(map_values(col("m")), 1).as("first_val"),
        size(col("m")).cast("long").as("n_entries"),
        element_at(col("sm"), "et").as("et_val"),
        element_at(col("sm"), "u").as("u_val"))
      .orderBy("event_id")

  /** Conditionals: CASE WHEN tiers + boolean algebra. */
  def conditionalFuncs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("tier"),
        (col("c_acctbal") > 5000 && col("c_mktsegment") =!= "BUILDING").as("rich_nonbuild"))
      .orderBy("c_custkey")
}
