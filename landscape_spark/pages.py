"""Common-Crawl-style page table: deterministic synthesis + link/text extraction.

The driver's input_hint fixes the raw-source shape: an Iceberg-style table
``pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
The reference ingests pre-built edge streams; the north rule instead requires
extracting hyperlink edges from pages with **byte-identical extracted text per
url** between a pure-pandas oracle extractor and the distributed pipeline.

Everything is derived from a seed — no external data. The link targets follow
the same skewed law as the reference's SimpleStream generator
(/root/reference/experiment/simple_stream.h:77-91): hub pages absorb a
disproportionate share of in-links.

Extraction is Arrow-vectorized (mapInPandas) — never per-row Python UDFs.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from landscape_spark.hashing import splitmix64

LANGS = ["en", "de", "fr", "es"]
MEAN_OUT_DEGREE = 8
N_HUBS = 8
WORDS = (
    "graph stream sketch merge sample vertex edge component forest query "
    "page link crawl rank label triangle hash bucket shuffle partition"
).split()


URL_SALT = 0x517E


def url_of(page_id: int, n_sites: int = 64) -> str:
    site = int(splitmix64(np.uint64(page_id) ^ np.uint64(URL_SALT)) % np.uint64(n_sites))
    return f"https://site{site}.example/p/{page_id}"


def _hash_arr(x: np.ndarray, salt: int) -> np.ndarray:
    return splitmix64(x.astype(np.uint64) ^ np.uint64(salt))


def synthesize_pages(spark: SparkSession, n_docs: int, seed: int = 42) -> DataFrame:
    """Deterministic pages table. html embeds <a href> links whose targets
    follow the hub-skew law; text is EXACTLY what extract_text_oracle yields."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                rows.append(_render_page(int(i), n_docs, seed))
            out = pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )
            yield out

    base = spark.range(n_docs).repartition(32)
    df = base.mapInPandas(
        gen,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    return df


def page_links(page_id: int, n_docs: int, seed: int) -> list[int]:
    """Deterministic out-link targets with hub skew (mirrors linkgraph law)."""
    i = np.uint64(page_id)
    out = []
    k = int(_hash_arr(np.array([page_id]), seed + 1)[0] % np.uint64(MEAN_OUT_DEGREE * 2 - 1)) + 1
    for j in range(k):
        h = int(_hash_arr(np.array([page_id * 131 + j]), seed + 2)[0])
        if h % 16 < 3:
            t = h % N_HUBS
        else:
            t = h % n_docs
        if t != page_id:
            out.append(int(t))
    return out


def _render_page(page_id: int, n_docs: int, seed: int) -> tuple:
    links = page_links(page_id, n_docs, seed)
    h = int(_hash_arr(np.array([page_id]), seed + 3)[0])
    lang = LANGS[h % 4]
    title_words = [WORDS[int(_hash_arr(np.array([page_id * 7 + w]), seed + 4)[0]) % len(WORDS)] for w in range(3)]
    title = " ".join(title_words)
    n_paras = 2 + h % 3
    paras = []
    for pi in range(n_paras):
        wl = [
            WORDS[int(_hash_arr(np.array([page_id * 1009 + pi * 31 + w]), seed + 5)[0]) % len(WORDS)]
            for w in range(12)
        ]
        paras.append(" ".join(wl))
    # anchor text: first word consistent per TARGET (the "sites describe a
    # page the same way" property that makes an anchor-text index useful),
    # second word varies per link site — both from the deterministic law
    anchor_html = "".join(
        '<a href="{u}">{w1} {w2}</a> '.format(
            u=url_of(t),
            w1=WORDS[int(_hash_arr(np.array([t]), seed + 6)[0]) % len(WORDS)],
            w2=WORDS[int(_hash_arr(np.array([t * 7 + ai]), seed + 7)[0]) % len(WORDS)],
        )
        for ai, t in enumerate(links)
    )
    html = (
        f"<html><head><title>{title}</title></head><body>"
        + "".join(f"<p>{p}</p>" for p in paras)
        + f"<div>{anchor_html}</div>"
        + "</body></html>"
    )
    text = extract_text_from_html(html)
    ts = pd.Timestamp("2024-01-01", tz=None) + pd.Timedelta(seconds=h % 31536000)
    return (url_of(page_id), ts, html.encode("utf-8"), text, lang)


_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_HREF_RE = re.compile(r'<a\s+href="([^"]+)"')
_ANCHOR_RE = re.compile(r'<a\s+href="([^"]+)"\s*>([^<]*)</a>')
_PAGE_ID_RE = re.compile(r"/p/(\d+)$")


def extract_text_from_html(html: str) -> str:
    """THE text extractor (oracle definition): strip tags, collapse whitespace
    to single spaces, LF-free, strip ends. Pure function of the html bytes —
    the distributed pipeline must reproduce it byte-for-byte per url."""
    no_tags = _TAG_RE.sub(" ", html)
    return _WS_RE.sub(" ", no_tags).strip()


def extract_links_from_html(html: str) -> list[str]:
    return _HREF_RE.findall(html)


def extract_text_oracle(pages_pdf: pd.DataFrame) -> pd.DataFrame:
    """Pure-pandas oracle: (url, text) from html bytes."""
    return pd.DataFrame(
        {
            "url": pages_pdf["url"],
            "text": [extract_text_from_html(b.decode("utf-8")) for b in pages_pdf["html"]],
        }
    )


def extract_anchors_oracle(pages_pdf: pd.DataFrame) -> pd.DataFrame:
    """Pure-pandas oracle: one row per link, (url, out_url, anchor) — the
    anchor text is the raw inner text of the <a> element (the synthesis
    never nests markup inside anchors). The distributed extractor must
    reproduce it byte-for-byte per (url, link position)."""
    rows = []
    for url, blob in zip(pages_pdf["url"], pages_pdf["html"]):
        for out_url, anchor in _ANCHOR_RE.findall(blob.decode("utf-8")):
            rows.append((url, out_url, anchor))
    return pd.DataFrame(rows, columns=["url", "out_url", "anchor"])


def extract_anchors(pages: DataFrame) -> DataFrame:
    """Distributed anchor extraction: (url, out_url, anchor) per link.
    One Arrow pass, vectorized pandas .str.extractall over each batch —
    zero per-row Python (same standard as extract_pages)."""

    def ex(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            s = pdf["html"].str.decode("utf-8")
            s.index = pdf["url"].to_numpy()
            hits = s.str.extractall(_ANCHOR_RE)
            if hits.empty:
                continue
            out = pd.DataFrame(
                {
                    "url": hits.index.get_level_values(0).to_numpy(),
                    "out_url": hits[0].to_numpy(),
                    "anchor": hits[1].to_numpy(),
                }
            )
            yield out

    return pages.select("url", "html").mapInPandas(
        ex, "url string, out_url string, anchor string"
    )


def anchor_text_index(anchors: DataFrame) -> DataFrame:
    """Per-TARGET anchor-text index over (url, out_url, anchor) rows:
    (out_url, n_anchors, n_unique_anchors, top_anchor, top_count) with
    top_anchor the most frequent anchor text pointing at the target
    (count desc, text asc tie-break — deterministic). The classic
    web-search relevance signal (anchor text describes the TARGET better
    than the target's own words — Brin & Page '98 §2.2).

    Plan: one (out_url, anchor) count aggregate, a per-target window for
    the argmax (partitioned by out_url — never global), one final
    aggregate. All shuffles key on the target url."""
    from pyspark.sql import Window

    per_text = anchors.groupBy("out_url", "anchor").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("out_url").orderBy(
        F.desc("cnt"), F.asc("anchor")
    )
    ranked = per_text.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("out_url")
        .agg(
            F.sum("cnt").alias("n_anchors"),
            F.count(F.lit(1)).alias("n_unique_anchors"),
            F.max(F.when(F.col("rn") == 1, F.col("anchor"))).alias("top_anchor"),
            F.max(F.when(F.col("rn") == 1, F.col("cnt"))).alias("top_count"),
        )
    )


def extract_pages(pages: DataFrame) -> DataFrame:
    """Distributed extraction: (url, text, out_url). One Arrow pass, fully
    vectorized pandas .str ops over each batch — zero per-row Python (the
    north-rule production extractor must not row-loop). Explodes to one row
    per out-link (pages with no links yield out_url NULL so text coverage
    stays total)."""

    def ex(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            s = pdf["html"].str.decode("utf-8")
            text = (
                s.str.replace(_TAG_RE, " ", regex=True)
                .str.replace(_WS_RE, " ", regex=True)
                .str.strip()
            )
            links = s.str.findall(_HREF_RE)
            out = pd.DataFrame(
                {
                    "url": pdf["url"].to_numpy(),
                    "text": text.to_numpy(),
                    "out_url": links.to_numpy(),
                }
            ).explode("out_url", ignore_index=True)
            out["out_url"] = out["out_url"].astype(object).where(
                out["out_url"].notna(), None
            )
            yield out

    return pages.select("url", "html").mapInPandas(
        ex, "url string, text string, out_url string"
    )


def url_vertex_dictionary(extracted: DataFrame, num_partitions: int = 32) -> DataFrame:
    """Dense url->vid dictionary (the reference requires dense 0..n-1 ids,
    graph_distrib_update.h:13), sorted by url.

    zipWithIndex-style two-phase assignment — a global row_number window
    would funnel EVERY url through one partition (at web scale, the whole
    vertex set through one task): range-partition + sort by url, count rows
    per partition (tiny DF), broadcast cumulative offsets back, add the
    partition-local rank. Global order holds because range partitioning puts
    smaller urls in lower partition ids."""
    from pyspark.sql import Window

    urls = (
        extracted.select(F.col("url").alias("u"))
        .unionAll(
            extracted.where(F.col("out_url").isNotNull()).select(
                F.col("out_url").alias("u")
            )
        )
        .distinct()
    )
    ranged = (
        urls.repartitionByRange(num_partitions, "u")
        .sortWithinPartitions("u")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin partition assignment across reuses
    )
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    # cumulative offsets over <= num_partitions rows — windowing THIS tiny DF
    # on one partition is free
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("cnt").over(w_off), F.lit(0)).alias("off")
    )
    w_local = Window.partitionBy("pid").orderBy("u")
    return (
        ranged.join(F.broadcast(offsets), on="pid")
        .select(
            F.col("u").alias("url"),
            (F.col("off") + F.row_number().over(w_local) - 1).cast("long").alias("vid"),
        )
    )


def edges_from_pages(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """pages -> (vertices(url, vid), edges(src, dst)) via extraction +
    dictionary join. Broadcast the dictionary when small; at web scale this
    becomes a sort-merge join on url — both Catalyst-chosen."""
    # materialize both results eagerly and release the intermediate caches
    # before returning — a cache the caller never unpersists is a
    # per-invocation executor-memory leak (same standard as q_ann_lsh)
    ex = extract_pages(pages).cache()
    vdict = url_vertex_dictionary(ex).localCheckpoint(eager=True)
    src = ex.where(F.col("out_url").isNotNull()).join(vdict, on="url").select(
        F.col("vid").alias("src"), "out_url"
    )
    edges = (
        src.join(
            vdict.withColumnRenamed("url", "out_url").withColumnRenamed("vid", "dst"),
            on="out_url",
        )
        .select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ex.unpersist()
    return vdict, edges
