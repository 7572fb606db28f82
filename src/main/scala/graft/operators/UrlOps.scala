package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL-level curation: canonicalization, URL dedup, per-domain quotas.
  *
  * Web-scale corpus assembly runs these BEFORE content dedup — a crawl
  * sees the same page under `?utm_source=` decorations, `www.`/bare
  * host twins and trailing-slash variants, and URL-level collapse is a
  * map-only key extraction where content dedup costs a shuffle of the
  * full text. All operators here are pure column expressions + keyed
  * aggregations: no windows over hot keys, no driver loops over data.
  */
object UrlOps {

  /** Tracking query parameters dropped by canonicalization (the
    * click-attribution family that never changes page content). */
  val TrackingParamPattern = "^(utm_[^=&]*|fbclid|gclid|msclkid)(=.*)?$"

  /** Canonical form of a URL, NULL when the value does not parse as a
    * scheme://host URL (callers decide what non-URLs mean — [[urlDedup]]
    * keeps them unconditionally). Deterministic, engine-portable, one
    * map-only expression tree:
    *
    *  - scheme and host lowercased (path/query stay case-sensitive);
    *  - fragment dropped;
    *  - default ports dropped (`:80` for http, `:443` for https);
    *  - leading `www.` dropped;
    *  - trailing slashes of the path dropped (`/a/` ≡ `/a`, `/` ≡ "");
    *  - tracking params ([[TrackingParamPattern]]) dropped, remaining
    *    query params SORTED (param order never identifies a resource).
    *
    * http vs https stay DISTINCT — protocol downgrade can serve
    * different content, so folding them is a recall/precision call
    * left to the caller. Every `?`/`&` is treated as a parameter
    * separator (RFC 3986 allows `?` inside query values; a crawl's
    * dedup key does not need to). */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1))
    val rest = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^#]*)", 1)
    val noPort = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val host = regexp_replace(noPort, "^www\\.", "")
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val kept = array_sort(filter(split(query, "[&?]"),
      p => p =!= "" && !p.rlike(TrackingParamPattern)))
    val queryPart = when(size(kept) > 0, concat(lit("?"), concat_ws("&", kept)))
      .otherwise(lit(""))
    when(hostport === "" || hostport.isNull, lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path, queryPart))
  }

  /** URL-level dedup: one document per canonical URL — the keeper is
    * the LONGEST text (crawls re-fetch pages; the fullest capture
    * wins), ties to the smallest id. Rows whose URL does not
    * canonicalize (NULL) keep unconditionally: a malformed URL is
    * metadata damage, not evidence of duplication.
    *
    * Scale shape: the keeper per canonical URL is one
    * `min(struct(-len, id))` aggregation — partial-aggregates
    * map-side, so a URL crawled a billion times collapses to one
    * candidate per input partition before the shuffle (same
    * skew-immunity as line dedup); the keep-set joins back on the id,
    * high-cardinality and unskewed.
    *
    * Output: (id, canonical_url, n_in_group) for kept rows —
    * n_in_group is the collapse count (1 = unique; NULL canonical
    * rows report 1). */
  private def canonical(docs: DataFrame, urlCol: String, idCol: String,
                        textCol: String): DataFrame =
    docs.select(col(idCol),
      canonicalizeUrl(col(urlCol)).as("canonical_url"),
      coalesce(length(col(textCol)), lit(0)).cast("long").as("_len"))

  /** The keeper aggregation alone (canonicalizable rows only) — the
    * stateful heart of [[urlDedup]], exposed separately because
    * min(struct)/count are fold-anywhere mergeable: the SAME code runs
    * as a Structured Streaming aggregation (complete mode), folding
    * each micro-batch of crawled pages into the keep-set
    * incrementally. */
  def urlKeepers(docs: DataFrame, urlCol: String = "url",
                 idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    canonical(docs, urlCol, idCol, textCol)
      .where(col("canonical_url").isNotNull)
      .groupBy("canonical_url")
      .agg(min(struct((-col("_len")).as("nl"), col(idCol).as("id"))).as("k"),
           count(lit(1)).as("n_in_group"))
      .select(col("k.id").as(idCol), col("canonical_url"), col("n_in_group"))

  def urlDedup(docs: DataFrame, urlCol: String = "url",
               idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    urlKeepers(docs, urlCol, idCol, textCol).unionByName(
      canonical(docs, urlCol, idCol, textCol)
        .where(col("canonical_url").isNull)
        .select(col(idCol), col("canonical_url"), lit(1L).as("n_in_group")))

  /** Per-domain quota (the RefinedWeb-style host cap): keep at most
    * `maxPerDomain` documents per registrable host, ranked by
    * `scoreCol` descending (ties to the smallest id). Rows without a
    * parseable host keep unconditionally and report rank 0.
    *
    * Scale shape: top-k per host is a window sort per host, and host
    * frequency is Zipf — one mega-host would sort in a single task
    * (window exchanges are exempt from AQE skew splitting). So the
    * quota runs in TWO phases: a local top-k per (host, hash-bucket)
    * first — each of the `preBuckets` buckets forwards at most
    * `maxPerDomain` rows, capping any host's contribution to the
    * global sort at preBuckets×maxPerDomain no matter how many pages
    * it has — then the exact global top-k per host over that bounded
    * remainder. Phase 1 cannot change the answer: a row in a host's
    * global top-k is necessarily in the top-k of any subgroup it
    * belongs to.
    *
    * Output: input columns + (host, rank_in_host) for kept rows. */
  def domainQuota(docs: DataFrame, maxPerDomain: Int,
                  urlCol: String = "url", scoreCol: String = "score",
                  idCol: String = "doc_id",
                  preBuckets: Int = 64): DataFrame = {
    require(maxPerDomain > 0, s"maxPerDomain must be positive: $maxPerDomain")
    require(preBuckets > 0, s"preBuckets must be positive: $preBuckets")
    val hosted = docs.withColumn("host", TextOps.extractHost(col(urlCol)))
    val attributable = hosted.where(col("host").isNotNull && col("host") =!= "")
    val order = Seq(col(scoreCol).desc, col(idCol).asc)
    val local = Window
      .partitionBy(col("host"), pmod(hash(col(idCol)), lit(preBuckets)))
      .orderBy(order: _*)
    val global = Window.partitionBy(col("host")).orderBy(order: _*)
    val kept = attributable
      .withColumn("_lrn", row_number().over(local))
      .where(col("_lrn") <= maxPerDomain)
      .drop("_lrn")
      .withColumn("rank_in_host", row_number().over(global))
      .where(col("rank_in_host") <= maxPerDomain)
    kept.unionByName(
      hosted.where(col("host").isNull || col("host") === "")
        .withColumn("rank_in_host", lit(0)))
  }
}
