"""URL canonicalization + URL-keyed document dedup.

Beyond the reference (an emission-inventory engine has no URLs): a
large-scale training-data pipeline dedups crawled documents by their
canonical URL before any content-based pass — it is the cheapest dedup
signal available (one string op per row, no shuffle until the final
group).  Canonicalization follows the usual crawl conventions
(RFC 3986 normalization plus tracker stripping):

- drop the fragment (``#…``);
- lowercase scheme and host, strip a leading ``www.``;
- strip the scheme's default port (``:443`` for https, ``:80`` http);
- drop a trailing slash on non-root paths;
- remove tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``) and sort the survivors so parameter order is irrelevant.

Everything is built from ``pyspark.sql.functions`` string/array
expressions — JVM-side, whole-stage-codegen friendly, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|ref)="


def canonical_url(url: Column | str) -> Column:
    """Canonical form of a URL column (see module docstring)."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, r"#.*$", "")  # fragment never reaches servers
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    # path+query = everything after the authority
    pathq = F.substring(rest, F.length(hostport) + 1, 1 << 30)
    host = F.regexp_replace(F.lower(hostport), r"^www\.", "")
    host = F.when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(F.regexp_replace(host, r":80$", ""))
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    path = F.when(
        F.length(path) > 1, F.regexp_replace(path, r"/$", "")
    ).otherwise(path)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def dedup_by_url(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Group documents by canonical URL; keep the min-id representative.

    Returns (canon_url, keeper, n_docs).  ONE shuffle on the canonical
    key with map-side partial aggregation — the cheapest dedup pass a
    crawl pipeline runs, ahead of any content-based (MinHash/SimHash)
    stage.
    """
    return (
        docs.withColumn("canon_url", canonical_url(url_col))
        .groupBy("canon_url")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count("*").alias("n_docs"),
        )
    )
