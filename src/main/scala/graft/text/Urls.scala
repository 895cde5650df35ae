package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus pipelines (beyond-reference scope).
  *
  * Common-Crawl-style corpora dedup and aggregate by CANONICAL URL: the
  * same page arrives as `HTTP://WWW.Example.com:80/a/?utm_source=x&b=1#f`
  * and `http://example.com/a?b=1`, and naive string grouping treats them
  * as distinct documents. Canonicalization here is a pure codegen'd
  * column expression (regexp parsing + array HOFs, no UDF): it runs as a
  * narrow projection inside the document scan, so URL-keyed dedup at
  * 100 TB costs exactly one shuffle on the canonical key.
  *
  * Normalization rules (each independently SQL-expressible, so the whole
  * pipeline is DuckDB-oracleable):
  *   1. scheme and host lowercase; leading `www.` stripped from the host;
  *   2. default ports dropped (`:80` for http, `:443` for https), other
  *      ports kept;
  *   3. trailing `/` stripped from the path (`/a/` ≡ `/a`; a bare `/`
  *      collapses to the empty path);
  *   4. the fragment (`#...`) dropped — never sent to the server;
  *   5. tracking parameters removed (`utm_*`, `gclid`, `fbclid`, `ref`),
  *      and the surviving query parameters SORTED so that param order
  *      cannot split a group; an emptied query drops its `?`.
  *
  * The reference has no URL handling (its inputs are curated datasets);
  * this is part of the training-data-pipeline surface the engine adds.
  */
object Urls {

  private val TrackingParam = "^(utm_[a-z0-9]+|gclid|fbclid|ref)="

  /** Extract the host (lowercased, `www.`-stripped) — the usual
    * aggregation key for per-site statistics and robots policies.
    */
  def canonicalHost(url: Column): Column = {
    val host = lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1))
    regexp_replace(host, "^www\\.", "")
  }

  /** Full canonical form of an absolute http(s) URL per the rules above.
    * Non-URL input (no `scheme://`) canonicalizes to NULL so malformed
    * rows can be routed, not silently grouped.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val host = canonicalHost(url)
    val port = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/:?#]*:([0-9]+)", 1)
    // Path: between authority and ?/#; trailing slashes collapse.
    val rawPath = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = regexp_replace(rawPath, "/+$", "")
    val rawQuery = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(
      split(rawQuery, "&"),
      p => p =!= "" && !p.rlike(TrackingParam))
    val query = array_join(array_sort(params), "&")
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path,
        when(query =!= "", concat(lit("?"), query)).otherwise(lit(""))))
  }
}
