package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML field extraction (SURVEY A7) — the reference's BeautifulSoup
  * scraping (pasta-pipeline `dags/processors/telegraph_processor.py:191-229`)
  * re-expressed as codegen-friendly regex column expressions. For the
  * well-formed pages the reference targets (Telegraph), anchored
  * regexes over `<title>`, `<h1>` and `<meta property=… content=…>`
  * reproduce its extraction; empty match → null like soup.find → None.
  */
object HtmlFunctions {

  private def nullIfEmpty(c: Column): Column = when(c === "", lit(null)).otherwise(c)

  /** Article h1 title, else <title> with the " – Telegraph" suffix
    * stripped (telegraph_processor.py:194-200). */
  def extractTitle(html: Column): Column = {
    val h1 = regexp_extract(html, "<h1[^>]*>([^<]*)</h1>", 1)
    val t = regexp_extract(html, "<title>([^<]*)</title>", 1)
    nullIfEmpty(coalesce(nullIfEmpty(trim(h1)),
      trim(regexp_replace(t, lit(" – Telegraph"), lit("")))))
  }

  /** content="…" of a <meta property="…"> tag
    * (telegraph_processor.py:204-206 twitter:description). */
  def extractMeta(html: Column, property: String): Column =
    nullIfEmpty(trim(regexp_extract(html,
      s"""<meta[^>]*property="$property"[^>]*content="([^"]*)"""", 1)))

  /** article:published_time meta parsed to timestamp
    * (telegraph_processor.py:217-224); Z normalized to +00:00. */
  def extractPublishedTime(html: Column): Column = {
    val raw = extractMeta(html, "article:published_time")
    to_timestamp(regexp_replace(raw, lit("Z$"), lit("+00:00")),
      "yyyy-MM-dd'T'HH:mm:ssXXX")
  }

  /** mrakopedia description-prefix cleanup
    * (telegraph_processor.py:208-213): drop the wiki-URL prefix. */
  def cleanDescription(desc: Column): Column =
    when(desc.isNull, lit(null)).otherwise(
      trim(regexp_replace(desc, lit("""^https://mrakopedia\.net/wiki/[^\s]+"""), lit(""))))
}
