"""Page synthesis + extraction: byte-identical text invariant (north rule),
edge extraction correctness, dictionary density."""

from __future__ import annotations

from pyspark.sql import functions as F

from landscape_spark import pages as P


def test_text_byte_identical_oracle_vs_pipeline(spark):
    pg = P.synthesize_pages(spark, 200, seed=42).cache()
    # distributed pipeline text
    dist = {
        r.url: r.text
        for r in P.extract_pages(pg).select("url", "text").distinct().collect()
    }
    # pure-pandas oracle on the same html bytes
    pdf = pg.select("url", "html").toPandas()
    oracle = P.extract_text_oracle(pdf)
    ora = dict(zip(oracle["url"], oracle["text"]))
    assert set(dist) == set(ora)
    for url in ora:
        assert dist[url].encode() == ora[url].encode(), f"text differs for {url}"
    # stored text column also matches (synthesis used the same extractor)
    stored = {r.url: r.text for r in pg.select("url", "text").collect()}
    assert stored == ora


def test_synthesis_deterministic(spark):
    a = P.synthesize_pages(spark, 50, seed=7).orderBy("url").collect()
    b = P.synthesize_pages(spark, 50, seed=7).orderBy("url").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_edges_match_link_law(spark):
    n = 100
    pg = P.synthesize_pages(spark, n, seed=42)
    vdict, edges = P.edges_from_pages(pg)
    # oracle: recompute expected edge set from the generator law
    url2id = {P.url_of(i): i for i in range(n)}
    vmap = {r.url: r.vid for r in vdict.collect()}
    got = {
        (r.src, r.dst) for r in edges.collect()
    }
    vid_of_page = {url2id[u]: vmap[u] for u in vmap if u in url2id}
    expected = set()
    for i in range(n):
        for t in P.page_links(i, n, 42):
            if t != i:
                expected.add((vid_of_page[i], vid_of_page[t]))
    assert got == expected
    assert len(got) > 0


def test_dictionary_dense(spark):
    pg = P.synthesize_pages(spark, 80, seed=1)
    vdict, _ = P.edges_from_pages(pg)
    vids = sorted(r.vid for r in vdict.collect())
    assert vids == list(range(len(vids)))  # dense 0..n-1


def test_pages_schema(spark):
    pg = P.synthesize_pages(spark, 10, seed=3)
    assert pg.schema.simpleString() == (
        "struct<url:string,warc_ts:timestamp,html:binary,text:string,lang:string>"
    )
    langs = {r.lang for r in pg.select("lang").distinct().collect()}
    assert langs <= {"en", "de", "fr", "es"}


def test_anchor_extraction_byte_identical_oracle_vs_pipeline(spark):
    """The vectorized extractall anchor extractor reproduces the
    pure-pandas regex oracle byte-for-byte, row-multiset-equal (same
    standard as the text invariant)."""
    pg = P.synthesize_pages(spark, 150, seed=42).cache()
    dist = sorted(
        (r.url, r.out_url, r.anchor) for r in P.extract_anchors(pg).collect()
    )
    pdf = pg.select("url", "html").toPandas()
    ora = P.extract_anchors_oracle(pdf)
    want = sorted(zip(ora["url"], ora["out_url"], ora["anchor"]))
    assert dist == want
    assert len(dist) > 0
    for _, _, anchor in dist:
        assert anchor  # synthesis never emits empty anchor text


def test_anchor_text_index_invariants(spark):
    """Aggregation invariants: n_anchors sums to the raw link count per
    target, top_anchor is the (count desc, text asc) argmax, and the index
    is partition-invariant."""
    pg = P.synthesize_pages(spark, 120, seed=42).cache()
    anchors = P.extract_anchors(pg).cache()
    idx = {r.out_url: r for r in P.anchor_text_index(anchors).collect()}
    # python oracle
    rows = [(r.out_url, r.anchor) for r in anchors.collect()]
    per_target: dict = {}
    for t, a in rows:
        per_target.setdefault(t, {})
        per_target[t][a] = per_target[t].get(a, 0) + 1
    assert set(idx) == set(per_target)
    for t, counts in per_target.items():
        r = idx[t]
        assert r.n_anchors == sum(counts.values())
        assert r.n_unique_anchors == len(counts)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (r.top_anchor, r.top_count) == best
    # partition invariance
    again = {
        r.out_url: (r.n_anchors, r.top_anchor)
        for r in P.anchor_text_index(anchors.repartition(17)).collect()
    }
    assert again == {t: (r.n_anchors, r.top_anchor) for t, r in idx.items()}


def test_anchor_first_word_consistent_per_target(spark):
    """The synthesis law makes the FIRST anchor word a pure function of the
    target — the 'sites describe a page consistently' property the index
    surfaces; top_anchor must start with that word."""
    pg = P.synthesize_pages(spark, 120, seed=42)
    anchors = P.extract_anchors(pg).collect()
    first_word: dict = {}
    for r in anchors:
        w = r.anchor.split(" ")[0]
        assert first_word.setdefault(r.out_url, w) == w
