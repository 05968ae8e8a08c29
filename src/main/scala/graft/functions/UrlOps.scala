package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization and domain extraction — the document-identity half
  * of web-corpus curation (the C4 / RefinedWeb recipe dedups fetched pages
  * by canonical URL before any content-based pass, and applies domain
  * blocklists / per-domain quotas on the registered domain).
  *
  * Everything here is a pure built-in `Column` expression chain — no UDF,
  * no regex backtracking hazards (all patterns are anchored and linear) —
  * so the whole canonicalization inlines into whole-stage codegen and runs
  * map-side at scan speed: the shape that matters when the input is a
  * 100 TB crawl table and the canonical key feeds directly into the
  * dedup `groupBy`.
  *
  * Canonical form (RFC 3986 §6 normalizations that preserve semantics,
  * plus the conventional crawl-pipeline ones):
  *   - scheme and host lowercased; userinfo dropped; leading `www.` dropped
  *   - default port stripped (`:80` for http, `:443` for https); other
  *     ports kept
  *   - fragment dropped
  *   - trailing slashes stripped from the path (root path `/` → empty)
  *   - tracking query parameters removed (`utm_*` prefixes and the exact
  *     click-id set below), remaining parameters SORTED so parameter order
  *     never splits identical resources
  */
object UrlOps {

  /** Exact (lowercased) tracking-parameter names dropped from query
    * strings. The `utm_*` family is matched by prefix, not listed. */
  val trackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "igshid", "mc_cid", "mc_eid", "ref")

  /** Two-label public suffixes for the registered-domain heuristic: a host
    * ending in one of these keeps THREE labels, anything else keeps two.
    * (A stand-in for the full public-suffix list, which is data, not
    * logic — a production deployment broadcasts the real list the same
    * way.) */
  val multiLabelSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "com.au",
      "com.br", "co.in", "com.cn", "com.mx")

  private def noFragment(u: Column): Column = substring_index(u, "#", 1)

  /** Everything past `scheme://` (fragment already stripped). */
  private def afterScheme(u: Column): Column =
    regexp_replace(noFragment(u), "^[A-Za-z][A-Za-z0-9+.-]*://", "")

  /** `host[:port]` with userinfo stripped, original case. */
  private def authority(u: Column): Column =
    substring_index(
      substring_index(substring_index(afterScheme(u), "/", 1), "?", 1), "@", -1)

  /** Lowercased scheme (empty when the input has no `://`). */
  def urlScheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host, userinfo/port dropped, leading `www.` dropped. */
  def urlHost(u: Column): Column =
    regexp_replace(lower(substring_index(authority(u), ":", 1)), "^www\\.", "")

  /** Explicit port string (empty when none). */
  def urlPort(u: Column): Column =
    regexp_extract(authority(u), ":([0-9]+)$", 1)

  /** Path component, trailing slashes stripped (`/a/b/` → `/a/b`, `/` →
    * empty). Case is preserved — paths are case-sensitive. */
  def urlPath(u: Column): Column = {
    val rest = afterScheme(u)
    val pathQ = regexp_replace(rest, "^[^/?]*", "") // drop authority
    val path = substring_index(substring_index(pathQ, "?", 1), "#", 1)
    regexp_replace(path, "/+$", "")
  }

  /** Query string with tracking parameters removed and the survivors
    * sorted; empty when nothing survives. */
  def cleanQuery(u: Column): Column = {
    val rest = afterScheme(u)
    // Everything after the FIRST '?' (split with limit 2 keeps later '?'
    // literal); `get` returns null out-of-bounds, so no-query URLs -> "".
    val q = coalesce(get(split(rest, "\\?", 2), lit(1)), lit(""))
    val params = filter(split(q, "&"), p => {
      val key = lower(substring_index(p, "=", 1))
      p =!= "" && !key.startsWith("utm_") && !key.isin(trackingParams: _*)
    })
    array_join(array_sort(params), "&")
  }

  /** The full canonical URL (see object doc for the normalization set). */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = urlScheme(u)
    val host = urlHost(u)
    val port = urlPort(u)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val q = cleanQuery(u)
    concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      urlPath(u),
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }

  /** Registered domain of a (already-canonical, lowercase) host: last two
    * labels, or last three when the host ends in a [[multiLabelSuffixes]]
    * entry. A bare or single-label host passes through unchanged. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    when(n >= lit(3) && last2.isin(multiLabelSuffixes: _*), last3)
      .when(n >= lit(2), last2)
      .otherwise(host)
  }
}
