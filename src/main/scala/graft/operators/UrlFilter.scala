package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL blocklist gate — the UT1/adult-domain-list style pre-filter every
  * web-corpus pipeline runs next to the robots gate (RefinedWeb §3.1,
  * FineWeb's URL filtering stage): drop pages whose host falls under a
  * blocked domain, or whose path starts with a blocked prefix under that
  * domain.
  *
  * Entry semantics (`blocklist(domain, path_prefix)`):
  *  - a host matches an entry's `domain` when it IS that domain or is a
  *    subdomain of it (`ads.example` blocks `ads.example` and
  *    `cdn.ads.example`, never `badads.example` — label-boundary suffix
  *    match);
  *  - `path_prefix` NULL (or empty) blocks the whole domain; otherwise
  *    only URLs whose path+query starts with that prefix are blocked
  *    (`("example.com", "/forum/")` blocks the forum, keeps the rest);
  *  - multiple entries per domain union.
  * A URL with no parseable authority (relative, null) is KEPT — there is
  * no host to match, same permissive default as the robots gate's
  * absent-robots rule.
  *
  * 100 TB shape — identical to [[Robots.filterAllowed]]'s broadcast path:
  * the blocklist is collected ONCE, compiled to a hash map keyed by exact
  * domain, and broadcast; pages are gated by a narrow codegen'd native
  * predicate over the url column only. Zero corpus exchange (host skew
  * cannot concentrate anything), zero serialization boundary (no typed
  * `Row` filter), and the per-row cost is O(host labels) hash probes — the
  * suffix WALK probes the map, never scans the list, so a 10⁷-entry UT1
  * list costs the same per row as a 10-entry one. Real-world blocklists
  * (UT1 ≈ 4M domains) broadcast in the tens of MB; the collect is
  * size-guarded and FAILS FAST past `maxRows`/`maxBytes` with a
  * sharding hint rather than silently degrading semantics (an exact-host
  * join fallback would stop matching subdomains — a correctness change, not
  * an execution detail, so it is not automatic).
  */
object UrlFilter {

  /** Per-domain verdict: whole-domain block and/or path prefixes. */
  final case class DomainRule(whole: Boolean, prefixes: Array[String]) {
    def blocks(path: String): Boolean = {
      if (whole) return true
      var i = 0
      while (i < prefixes.length) {
        if (path.startsWith(prefixes(i))) return true
        i += 1
      }
      false
    }
  }

  /** Compiled blocklist: exact-domain map probed by the suffix walk. */
  final case class Blocklist(rules: Map[String, DomainRule]) {
    /** Is `url` blocked? Probes every label-boundary suffix of the host:
      * for `a.b.example` → `a.b.example`, `b.example`, `example`. A
      * trailing root label is stripped first (`ads.example.` ≡
      * `ads.example` in DNS) — otherwise appending a dot to the host
      * would evade every entry; [[compile]] normalizes entries the same
      * way. */
    def blocked(url: String): Boolean = {
      val host = stripRootLabel(Robots.hostOf(url))
      if (host.isEmpty) return false
      var path: String = null // computed once, only if some suffix matches
      var from = 0
      while (from >= 0 && from < host.length) {
        rules.get(if (from == 0) host else host.substring(from)) match {
          case Some(r) =>
            if (path == null) path = Robots.pathOf(url)
            if (r.blocks(path)) return true
          case None => ()
        }
        val dot = host.indexOf('.', from)
        from = if (dot < 0) -1 else dot + 1
      }
      false
    }
  }

  /** DNS root-label normalization: drop trailing dots (`example.` →
    * `example`). */
  private def stripRootLabel(host: String): String = {
    var end = host.length
    while (end > 0 && host.charAt(end - 1) == '.') end -= 1
    if (end == host.length) host else host.substring(0, end)
  }

  /** Compile blocklist rows ((domain, path_prefix) pairs; domains
    * case-normalized like [[Robots.hostOf]]'s output, trailing root
    * labels stripped) into the probe map. */
  def compile(rows: Seq[(String, String)]): Blocklist = {
    val byDomain = rows
      .map { case (d, p) =>
        (if (d == null) "" else stripRootLabel(d.toLowerCase(java.util.Locale.ROOT)), p)
      }
      .filter { case (d, _) => d.nonEmpty }
      .groupBy(_._1)
    Blocklist(byDomain.map { case (d, es) =>
      val whole = es.exists { case (_, p) => p == null || p.isEmpty }
      val prefixes =
        if (whole) Array.empty[String]
        else es.map(_._2).distinct.sortBy(identity[String]).toArray
      d -> DomainRule(whole, prefixes)
    })
  }

  /** Drop the pages `blocklist(domain, path_prefix)` blocks. */
  def filterBlocked(pages: DataFrame, blocklist: DataFrame,
                    urlCol: String = "url",
                    maxRows: Long = 50L * 1000 * 1000,
                    maxBytes: Long = 2L << 30): DataFrame = {
    val spark = pages.sparkSession
    val Array(guard) = blocklist
      .agg(count(lit(1)),
        sum(octet_length(col("domain")) +
          coalesce(octet_length(col("path_prefix")), lit(0)))).collect()
    val nRows = guard.getLong(0)
    val nBytes = if (guard.isNullAt(1)) 0L else guard.getLong(1)
    require(nRows <= maxRows && nBytes <= maxBytes,
      s"blocklist too large to broadcast ($nRows rows, $nBytes bytes; " +
        s"limits $maxRows/$maxBytes): shard the corpus by host and gate " +
        "each shard with its blocklist slice, or raise the limits")
    val compiled = compile(blocklist
      .select(col("domain").cast("string"), col("path_prefix").cast("string"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1))))
    val bc = spark.sparkContext.broadcast(compiled)
    pages.filter(url_allowed(col(urlCol), bc))
  }

  /** Column wrapper for [[UrlAllowed]]. */
  def url_allowed(url: Column,
                  bc: org.apache.spark.broadcast.Broadcast[Blocklist]): Column =
    org.apache.spark.sql.GraftShim.column(
      UrlAllowed(org.apache.spark.sql.GraftShim.expression(url), bc))

  /** Native predicate over the shared [[UrlGateExpression]] codegen
    * template: true when the broadcast blocklist does NOT block this url.
    * Null urls are kept. */
  final case class UrlAllowed(
      child: org.apache.spark.sql.catalyst.expressions.Expression,
      bc: org.apache.spark.broadcast.Broadcast[Blocklist])
    extends UrlGateExpression {
    override def prettyName: String = "url_allowed"
    def allowedUrl(u: org.apache.spark.unsafe.types.UTF8String): Boolean =
      u == null || !bc.value.blocked(u.toString)
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression): UrlAllowed =
      copy(child = c)
  }
}
