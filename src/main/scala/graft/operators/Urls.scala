package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + registrable-domain extraction — the crawl
  * curation primitives in front of per-domain dedup and caps: frontier
  * dedup keys on the CANONICAL url (else every utm-tagged share of a
  * page is a "new" document), and domain-level mixture caps
  * ([[DataSplit.capPerKey]]) key on the REGISTRABLE domain, not the
  * host (else every subdomain of a link farm is its own budget).
  *
  * Deterministic, single-pass column expressions (regex + array ops,
  * all codegen'd, RE2-safe) — composes into the same one curation scan
  * as [[TextAnalysis]]; zero shuffle, replayed exactly by the DuckDB
  * oracle. The public-suffix handling is the pragmatic short list of
  * two-level suffixes (a full PSL is a data file, not an algorithm —
  * load one into [[suffixes2]]'s place at deploy time). */
object Urls {

  /** Two-level public suffixes the heuristic must not split (extend
    * with the full PSL in production). */
  val suffixes2: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "com.ar", "co.za", "github.io", "blogspot.com")

  /** Tracking parameters stripped during canonicalization. */
  val trackingParams: String = "utm_[A-Za-z]+|fbclid|gclid|msclkid|ref|mc_eid"

  /** Canonical form: scheme+host lowercased, default :80/:443 port
    * dropped, fragment dropped, tracking params removed, surviving
    * query params sorted, empty query dropped. The path keeps its
    * case (paths ARE case-sensitive; hosts are not). */
  def canonicalizeUrl(url: Column): Column = {
    val prefix = regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val prefixLc = regexp_replace(lower(prefix), ":(80|443)$", "")
    val path = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = array_sort(filter(split(query, "&"), p =>
      !(p.rlike(s"^($trackingParams)=") || p === "")))
    val queryOut = when(size(kept) > 0,
      concat(lit("?"), array_join(kept, "&"))).otherwise(lit(""))
    concat(prefixLc, path, queryOut)
  }

  /** Host of a URL, lowercased, port stripped. */
  def host(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1)),
      "^$", "")

  /** Registrable domain: last two host labels, or three when the last
    * two are a known public suffix (e.g. example.co.uk). A bare or
    * single-label host returns itself. */
  def registrableDomain(url: Column): Column = {
    val h = host(url)
    val labels = split(h, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3), element_at(labels, -2),
      element_at(labels, -1))
    when(n <= 1, h)
      .when(n >= 3 && last2.isin(suffixes2: _*), last3)
      .otherwise(last2)
  }
}
