package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and host extraction — the crawl-side dedup
  * prerequisite (the same page fetched as `HTTP://Example.COM:80/a?b=2&a=1`
  * and `http://example.com/a?a=1&b=2` must collapse BEFORE content
  * dedup ever runs, or the corpus pays a fetch-and-hash for every
  * variant). Everything is a pure column expression built from regex +
  * array ops with exact integer/string semantics — no libm, no UDF —
  * so the DuckDB oracle replays it verbatim (`q_url_normalize`).
  *
  * Deliberately NOT implemented with `parse_url` (engine-specific
  * quirks differ) or a full public-suffix list (a real deployment
  * broadcasts the PSL as a table; [[registeredDomain]] documents the
  * approximation it uses instead).
  */
object UrlFunctions {

  /** Lowercased host (authority minus userinfo and port). Empty string
    * when `u` has no `scheme://` authority.
    */
  def urlHost(u: Column): Column =
    lower(regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))

  /** Registered-domain approximation: the last two host labels, or the
    * last three when the second-to-last label is a common second-level
    * registry label (`co`, `com`, `net`, `org`, `ac`, `gov`, `edu`)
    * AND the TLD is 2 characters (`bbc.co.uk` → `bbc.co.uk`,
    * `a.b.example.com` → `example.com`). A production deployment swaps
    * this for a broadcast public-suffix table; the approximation is
    * deterministic and covers the bulk of the crawl.
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val sld = element_at(labels, -2)
    val tld = element_at(labels, -1)
    val take3 = n >= 3 && length(tld) === 2 &&
      sld.isin("co", "com", "net", "org", "ac", "gov", "edu")
    when(n <= 2, host)
      .when(take3, concat_ws(".",
        element_at(labels, -3), sld, tld))
      .otherwise(concat_ws(".", sld, tld))
  }

  /** Canonical URL: lowercase scheme and host, strip userinfo is NOT
    * touched (a credentialed URL stays distinct), drop default ports
    * (`:80` for http, `:443` for https), drop the fragment, drop
    * tracking parameters (`utm_*`, `fbclid`, `gclid`), sort the
    * surviving query parameters, and drop a then-empty `?`. The path
    * is preserved byte-for-byte (case-significant by RFC 3986).
    */
  def normalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    val rest = regexp_replace(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+", "")
    val hostLower = lower(hostPort)
    val hostNoPort =
      when(scheme === "http", regexp_replace(hostLower, ":80$", ""))
        .when(scheme === "https", regexp_replace(hostLower, ":443$", ""))
        .otherwise(hostLower)
    val path = regexp_replace(rest, "\\?.*$", "")
    val query = when(rest.contains("?"),
      regexp_replace(rest, "^[^?]*\\?", "")).otherwise(lit(""))
    val keptParams = array_sort(filter(split(query, "&"), p =>
      length(p) > 0 && !p.rlike("^(utm_[^=]*|fbclid|gclid)=")))
    val queryOut = when(size(keptParams) > 0,
      concat(lit("?"), array_join(keptParams, "&"))).otherwise(lit(""))
    when(scheme === "", u) // not an absolute URL: leave untouched
      .otherwise(concat(scheme, lit("://"), hostNoPort, path, queryOut))
  }
}
