package graft

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every query obeys SURVEY §4 portability rules so the DuckDB oracle
  * hash-matches: md5-only hashing, decimal-exact money aggregation,
  * ROUND(,6) on float outputs, literal time cutoffs, sorted
  * concat_ws for arrays, total-order sort keys.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact decimal sum of a money expression, emitted as double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("b1_pricing_summary")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- B1
  /** TPC-H Q1 shape: single-shuffle grouped aggregation with partial
    * (map-side) aggregation; decimal-exact sums per SURVEY §4.2. */
  private def b1(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem").filter(col("l_shipdate") <= lit("1998-09-01"))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        round(dsum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  // ---------------------------------------------------------------- A1
  /** Hashtag extraction (reference utils.py:20): every word of the
    * document is turned into a '#tag' deterministically, then the real
    * extractor runs: group-1 regex, lowercase, dedup. Map-side only. */
  private def a1(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val msg = concat(lit("#"), regexp_replace(col("text"), lit(" "), lit(" #")))
    d.select(
      col("doc_id"),
      concat_ws(",", array_sort(TextFunctions.extractTags(msg))).as("tags"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- A2
  /** Link extraction + trailing-punctuation cleanup (utils.py:4). */
  private def a2(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val msg = concat(
      lit("see https://telegra.ph/"), col("lang"), lit("-"), col("doc_id"),
      lit(" and (https://telegra.ph/p-"), col("source"), lit(".) end"))
    d.select(
      col("doc_id"),
      concat_ws(",", array_sort(TextFunctions.extractLinks(msg))).as("links"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- A6
  /** MD5 content hash + word count (telegraph_processor.py:128,142). */
  private def a6(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"),
      TextFunctions.contentHash(col("text")).as("content_hash"),
      TextFunctions.wordCount(col("text")).cast("long").as("word_count"))
      .orderBy(col("doc_id"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b1_pricing_summary" -> (b1 _),
    "a1_extract_hashtags" -> (a1 _),
    "a2_extract_links" -> (a2 _),
    "a6_content_hash" -> (a6 _))

  /** DuckDB-runnable oracle SQL per query (SURVEY §4). */
  def oracleSql: Map[String, String] = Map(
    "b1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a1_extract_hashtags" ->
      """SELECT doc_id,
        |  list_aggregate(list_sort(list_distinct(
        |    list_transform(regexp_extract_all('#' || replace(text, ' ', ' #'),
        |                                      '#([a-zA-Zа-яА-Я0-9_]+)', 1),
        |                   t -> lower(t)))), 'string_agg', ',') AS tags
        |FROM documents ORDER BY doc_id""".stripMargin,
    "a2_extract_links" ->
      """SELECT doc_id,
        |  list_aggregate(list_sort(list_distinct(
        |    list_transform(
        |      regexp_extract_all('see https://telegra.ph/' || lang || '-' || doc_id ||
        |                         ' and (https://telegra.ph/p-' || source || '.) end',
        |                         'https://telegra\.ph/[^\s\n\])>_*}]+', 0),
        |      l -> regexp_replace(l, '[.,"''\*_]+$', '')))), 'string_agg', ',') AS links
        |FROM documents ORDER BY doc_id""".stripMargin,
    "a6_content_hash" ->
      """SELECT doc_id,
        |  CASE WHEN text IS NULL OR text = '' THEN '' ELSE md5(text) END AS content_hash,
        |  CAST(CASE WHEN text IS NULL OR trim(text) = '' THEN 0
        |       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS word_count
        |FROM documents ORDER BY doc_id""".stripMargin)
}
