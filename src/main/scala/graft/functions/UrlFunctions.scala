package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus pipelines (SURVEY C48).
  *
  * Crawled corpora carry the same page under many spellings — scheme
  * and host case, default ports, fragments, tracker query params,
  * shuffled param order, trailing slashes. URL-level dedup (the first
  * dedup gate in CommonCrawl-style pipelines, BEFORE any content
  * hashing) needs one canonical spelling per page. The reference
  * pipeline keys its pages on raw link strings
  * (pasta-pipeline `dags/processors/telegraph_processor.py:81`,
  * `dags/utils/utils.py:4-17`), which silently treats variants as
  * distinct pages; this generalizes that key to a canonical form.
  *
  * Everything here is built-in Catalyst expressions (regexp + array
  * HOFs) — pure map-side, whole-stage codegen, zero shuffle, so the
  * canonical key costs nothing extra at 100 TB: it runs inside the
  * same stage as the scan, and downstream dedup shuffles on a column
  * that is no wider than the raw URL was.
  *
  * The rules (each documented on the step below):
  *   1. drop the #fragment (client-side only, never a different page)
  *   2. lowercase scheme and host (DNS is case-insensitive; paths are
  *      NOT touched — they are case-sensitive per RFC 3986)
  *   3. strip the scheme's default port (:80 http, :443 https)
  *   4. drop tracking params (utm_*, fbclid, gclid, msclkid, ref),
  *      sort the survivors (param order is almost never semantic),
  *      drop the '?' if nothing survives
  *   5. strip one trailing '/' from a non-root path; empty path → '/'
  */
object UrlFunctions {

  /** Query params dropped by default: analytics trackers that never
    * change the page content. Prefix match for `utm_`; exact key
    * match otherwise. */
  val DefaultTrackerParams: Seq[String] = Seq("fbclid", "gclid", "msclkid", "ref")

  /** Canonical form of an http(s) URL column (see object doc for the
    * rules). Non-URL input (no scheme://host) canonicalizes to NULL
    * so malformed strings can't alias a real page. */
  def canonicalize(url: Column,
                   trackerParams: Seq[String] = DefaultTrackerParams): Column = {
    // 1. fragment off first — everything else parses the remainder
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([Hh][Tt][Tt][Pp][Ss]?)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[^:/?#]+://([^/?#]+)", 1))
    // 3. default port only — a non-default port IS a different origin
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_extract(noFrag, "^[^:/?#]+://[^/?#]+([^?#]*)", 1)
    // 5. one trailing slash off a non-root path; empty path is root
    val path = when(rawPath === "" || rawPath === "/", lit("/"))
      .otherwise(regexp_replace(rawPath, "/$", ""))
    val rawQuery = regexp_extract(noFrag, "\\?([^#]*)", 1)
    // 4. param list → drop trackers and empties → sort → rejoin;
    //    array_sort is lexicographic on the full k=v string, which is
    //    deterministic and oracle-portable (DuckDB list_sort agrees
    //    on ASCII)
    val keyOf = (p: Column) => regexp_extract(p, "^([^=]*)", 1)
    // foldLeft over lit(false), not reduce: trackerParams = Seq.empty
    // is legal public API ("only the utm_ prefix rule") and reduce on
    // an empty Seq throws at plan-build time
    val kept = array_sort(filter(split(rawQuery, "&"), p =>
      p =!= "" && !keyOf(p).startsWith("utm_") &&
        !trackerParams.map(t => keyOf(p) === t).foldLeft(lit(false))(_ || _)))
    val query = array_join(kept, "&")
    when(scheme === "" || hostPort === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }
}
