"""Deterministic synthetic web-page corpus with planted entity clusters.

Implements FIXTURES.md T1-T3. Every value is a pure function of
(seed, row/cluster index) via per-key `random.Random(f"{seed}:{key}")` —
no wall-clock, no global RNG state.

Shapes mirror the WDC LSPC corpus the reference consumes
(/root/reference/src/processing/preprocess/preprocess_corpus.py:18-28):
offers have (id, cluster_id, category, title, description, brand, price,
specTableContent); pages carry the *raw* WDC-quad-style renderings
("value"@en artifacts, whitespace zoo) that the extraction stage must clean
byte-identically (utils.py:17-33 semantics).
"""

from __future__ import annotations

import random
from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..functions.cleaning import clean_spec_py, clean_string_py

CATEGORIES = (
    "Computers_and_Accessories",
    "Camera_and_Photo",
    "Shoes",
    "Jewelry",
)

_BRANDS = [f"brand{i:02d}" for i in range(50)]
_MEGA_BRAND = "omnicorp"  # hot-key brand (~30% of rows) for skew tests
_MODEL_WORDS = [f"model{i:03d}" for i in range(200)]
_ADJECTIVES = [
    "pro", "ultra", "slim", "max", "mini", "plus", "lite", "prime", "neo",
    "turbo", "classic", "sport", "deluxe", "eco", "smart", "compact",
]
_FILLER = [f"word{i:03d}" for i in range(400)]
_SPEC_KEYS = ["weight", "color", "width", "height", "voltage", "material", "origin"]

_BASE_TS = pd.Timestamp("2020-06-01T00:00:00")


@dataclass
class _Cluster:
    cluster_id: int
    category: str
    brand: str
    model: str
    code: str
    series: str
    size: int


def _rng(seed: int, key: str) -> random.Random:
    return random.Random(f"{seed}:{key}")


def _plan_clusters(n_offers: int, seed: int) -> list[_Cluster]:
    """Skewed cluster-size plan: singletons, 2-10 bulk, a few 11-79, one >80."""
    clusters: list[_Cluster] = []
    remaining = n_offers
    cid = 0
    while remaining > 0:
        r = _rng(seed, f"cluster:{cid}")
        if cid == 0 and n_offers >= 400:
            size = 90  # the mandated >80 giant (skew control target)
        else:
            roll = r.random()
            if roll < 0.50:
                size = 1
            elif roll < 0.90:
                size = r.randint(2, 10)
            elif roll < 0.99:
                size = r.randint(11, 30)
            else:
                size = r.randint(40, 79)
        size = min(size, remaining)
        category = CATEGORIES[r.randrange(len(CATEGORIES))]
        brand = _MEGA_BRAND if r.random() < 0.30 else _BRANDS[r.randrange(50)]
        model = _MODEL_WORDS[r.randrange(len(_MODEL_WORDS))]
        # two rare tokens every member shares (FIXTURES.md: blocking must collide)
        code = f"zx{cid * 7 + 11}-{r.randint(100, 999)}"
        series = f"series{cid * 13 + 5}"
        clusters.append(_Cluster(cid, category, brand, model, code, series, size))
        remaining -= size
        cid += 1
    return clusters


def _title_tokens(c: _Cluster, r: random.Random, hard: bool) -> list[str]:
    tokens = [c.brand, c.model, c.code, c.series]
    n_adj = 1 if hard else r.randint(2, 4)
    tokens += [ _ADJECTIVES[r.randrange(len(_ADJECTIVES))] for _ in range(n_adj) ]
    r.shuffle(tokens)
    # casing / punctuation variation
    out = []
    for t in tokens:
        roll = r.random()
        if roll < 0.2:
            t = t.upper()
        elif roll < 0.4:
            t = t.title()
        if r.random() < 0.1:
            t = t + ","
        out.append(t)
    return out


def _raw_quad(value: str, r: random.Random) -> str:
    """Render a cleaned value as a raw WDC-quad-style string (to be re-cleaned)."""
    style = r.random()
    if style < 0.45:
        return f'"{value}"@en '
    if style < 0.70:
        toks = value.split()
        cut = max(1, len(toks) // 2)
        return f'"{" ".join(toks[:cut])}"@en "{" ".join(toks[cut:])}"@en'
    if style < 0.90:
        messy = value.replace(" ", r.choice(["  ", "\t", " \n ", " "]))
        return f'"{messy}"@en-US '
    return f'  "{value}" '


def _spec_raw(r: random.Random) -> str:
    n = r.randint(2, 6)
    parts = []
    for _ in range(n):
        k = _SPEC_KEYS[r.randrange(len(_SPEC_KEYS))]
        v = f"{r.randint(1, 999)}{r.choice(['g', 'cm', 'mm', 'v', ''])}"
        parts.append(f"{k} :\t {v}")
    return "  \n".join(parts) + "  "


def generate_offers(n_pages: int = 2000, seed: int = 42) -> pd.DataFrame:
    """Planted-truth offer table (FIXTURES.md T2) with raw + cleaned fields."""
    clusters = _plan_clusters(n_pages, seed)
    rows = []
    oid = 0
    for c in clusters:
        for member in range(c.size):
            r = _rng(seed, f"offer:{c.cluster_id}:{member}")
            hard = c.size >= 2 and member == c.size - 1  # one low-sim variant per cluster
            title = " ".join(_title_tokens(c, r, hard))
            desc_head = [f"the {c.brand} {c.model} {c.code} {c.series}"]
            n_fill = r.randint(0, 115)
            filler = [_FILLER[r.randrange(len(_FILLER))] for _ in range(n_fill)]
            description = " ".join(desc_head + filler)
            brand = None if r.random() < 0.20 else c.brand
            price = None if r.random() < 0.15 else r.choice(
                [f"${r.randint(1, 9)},{r.randint(100, 999)}.00",
                 f"USD {r.randint(10, 2000)}",
                 f"{r.randint(10, 2000)}.99"]
            )
            spec = None if r.random() < 0.50 else _spec_raw(r)

            raw_title = _raw_quad(title, r)
            raw_desc = _raw_quad(description, r)
            raw_brand = _raw_quad(brand, r) if brand else ""
            raw_price = _raw_quad(price, r) if price else ""
            raw_spec = spec or ""

            rows.append(
                {
                    "id": oid,
                    "cluster_id": c.cluster_id,
                    "category": c.category,
                    "raw_title": raw_title,
                    "raw_description": raw_desc,
                    "raw_brand": raw_brand,
                    "raw_price": raw_price,
                    "raw_specTableContent": raw_spec,
                    "title": clean_string_py(raw_title),
                    "description": clean_string_py(raw_desc),
                    "brand": clean_string_py(raw_brand),
                    "price": clean_string_py(raw_price),
                    "specTableContent": clean_spec_py(raw_spec),
                }
            )
            oid += 1
    df = pd.DataFrame(rows)
    df["id"] = df["id"].astype("int64")
    df["cluster_id"] = df["cluster_id"].astype("int64")
    return df


def _page_text(row: pd.Series) -> str:
    return (
        f"<<sku>>{row['id']}<</sku>>"
        f"<<category>>{row['category']}<</category>>"
        f"<<title>>{row['raw_title']}<</title>>"
        f"<<description>>{row['raw_description']}<</description>>"
        f"<<brand>>{row['raw_brand']}<</brand>>"
        f"<<price>>{row['raw_price']}<</price>>"
        f"<<spec>>{row['raw_specTableContent']}<</spec>>"
    )


def generate_pages(offers: pd.DataFrame, seed: int = 42) -> pd.DataFrame:
    """Pages table (FIXTURES.md T1): (url, warc_ts, html, text, lang)."""
    n = len(offers)
    site = (offers["id"] % 97).astype("int64")
    url = [
        f"https://shop{s:03d}.example/offer/{i}"
        for s, i in zip(site.tolist(), offers["id"].tolist())
    ]
    text = offers.apply(_page_text, axis=1)
    html = [
        (
            "<html><body>"
            f"<h1 class=\"title\">{t}</h1>"
            "</body></html>"
        ).encode("utf-8")
        for t in text.tolist()
    ]
    lang = [
        "en" if _rng(seed, f"lang:{i}").random() < 0.95
        else _rng(seed, f"lang2:{i}").choice(["de", "fr"])
        for i in offers["id"].tolist()
    ]
    warc_ts = [_BASE_TS + pd.Timedelta(minutes=int(i)) for i in offers["id"].tolist()]
    df = pd.DataFrame(
        {"url": url, "warc_ts": warc_ts, "html": html, "text": text, "lang": lang}
    )
    # Spark's parquet reader rejects TIMESTAMP(NANOS); write microseconds.
    df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
    return df


def generate_labeled_pairs(
    offers: pd.DataFrame, seed: int = 42, n_pairs: int = 1000
) -> pd.DataFrame:
    """Gold-standard labeled pairs (FIXTURES.md T3), ~3:1 neg:pos.

    Only offers on English pages can be resolved by the pipeline, so pairs are
    drawn from rows whose page is English (lang is a pure function of id).
    """
    en_mask = [
        _rng(seed, f"lang:{i}").random() < 0.95 for i in offers["id"].tolist()
    ]
    pool = offers[pd.Series(en_mask, index=offers.index)]
    # usable offers need a non-empty cleaned title (blocking operates on it)
    pool = pool[pool["title"].fillna("") != ""]
    by_cluster: dict[int, list[int]] = {}
    for cid, oid in zip(pool["cluster_id"].tolist(), pool["id"].tolist()):
        by_cluster.setdefault(cid, []).append(oid)
    multi = {cid: ids for cid, ids in by_cluster.items() if 2 <= len(ids) <= 80}

    n_pos = n_pairs // 4
    n_neg = n_pairs - n_pos
    r = _rng(seed, "pairs")

    pos: set[tuple[int, int]] = set()
    cids = sorted(multi)
    if not cids:
        # tiny/skewed corpora can lack any 2..80-member English cluster;
        # degrade to zero positive pairs instead of randrange(0) crashing
        n_pos, n_neg = 0, n_pairs
    guard = 0
    while len(pos) < n_pos and guard < n_pos * 50:
        guard += 1
        cid = cids[r.randrange(len(cids))]
        ids = multi[cid]
        a, b = r.sample(ids, 2)
        pos.add((min(a, b), max(a, b)))

    cluster_of = dict(zip(pool["id"].tolist(), pool["cluster_id"].tolist()))
    cat_of = dict(zip(pool["id"].tolist(), pool["category"].tolist()))
    by_cat: dict[str, list[int]] = {}
    for oid in pool["id"].tolist():
        by_cat.setdefault(cat_of[oid], []).append(oid)

    neg: set[tuple[int, int]] = set()
    # hard negatives first (FIXTURES.md: high textual similarity, cross-cluster):
    # offers from different clusters sharing brand+model look near-identical
    # except for their code/series tokens.
    bm_of = {}
    for oid, title in zip(pool["id"].tolist(), pool["title"].tolist()):
        toks = set((title or "").lower().split())
        bm_of[oid] = toks
    by_brand_model: dict[tuple[str, str, str], list[int]] = {}
    # reconstruct (category, brand, model) from the cluster plan via truth cols
    brand_col = dict(zip(pool["id"].tolist(), pool["brand"].tolist()))
    for oid in pool["id"].tolist():
        shared = sorted(t for t in bm_of[oid] if t.startswith("model"))
        if not shared:
            continue
        keyt = (cat_of[oid], (brand_col[oid] or "").lower(), shared[0])
        by_brand_model.setdefault(keyt, []).append(oid)
    n_hard = n_neg // 2
    for keyt in sorted(by_brand_model):
        ids = by_brand_model[keyt]
        clusters_here = {cluster_of[i] for i in ids}
        if len(clusters_here) < 2 or len(neg) >= n_hard:
            continue
        rr = _rng(seed, f"hardneg:{keyt}")
        for _ in range(4):
            a, b = rr.sample(ids, 2)
            if cluster_of[a] != cluster_of[b]:
                key = (min(a, b), max(a, b))
                if key not in pos:
                    neg.add(key)
    guard = 0
    while len(neg) < n_neg and guard < n_neg * 50:
        guard += 1
        cat = CATEGORIES[r.randrange(len(CATEGORIES))]
        ids = by_cat.get(cat, [])
        if len(ids) < 2:
            continue
        a, b = r.sample(ids, 2)
        if cluster_of[a] == cluster_of[b]:
            continue
        key = (min(a, b), max(a, b))
        if key not in pos:
            neg.add(key)

    attrs = ["title", "description", "brand", "price", "specTableContent"]
    idx = pool.set_index("id")
    rows = []
    for a, b in sorted(pos) + sorted(neg):
        row = {
            "pair_id": f"{a}#{b}",
            "id_left": a,
            "id_right": b,
            "cluster_id_left": cluster_of[a],
            "cluster_id_right": cluster_of[b],
            "label": 1 if cluster_of[a] == cluster_of[b] else 0,
        }
        for attr in attrs:
            row[f"{attr}_left"] = idx.at[a, attr]
            row[f"{attr}_right"] = idx.at[b, attr]
        rows.append(row)
    return pd.DataFrame(rows)


def write_fixtures(out_dir: str, n_pages: int = 2000, seed: int = 42) -> dict[str, str]:
    """Write pages/offers_truth/labeled_pairs_gs parquet; returns paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    offers = generate_offers(n_pages, seed)
    pages = generate_pages(offers, seed)
    pairs = generate_labeled_pairs(offers, seed, n_pairs=max(200, n_pages // 2))
    paths = {
        "pages": f"{out_dir}/pages.parquet",
        "offers_truth": f"{out_dir}/offers_truth.parquet",
        "labeled_pairs_gs": f"{out_dir}/labeled_pairs_gs.parquet",
    }
    # Small row groups so Spark's split planner can actually parallelize the
    # scan: a single-row-group file is one task no matter how many byte-range
    # splits exist, which serializes the map-only extraction stage. Real
    # web-scale corpora arrive as thousands of files/row groups; the fixture
    # should present the same shape to the scheduler.
    pages.to_parquet(paths["pages"], index=False, row_group_size=512)
    offers.to_parquet(paths["offers_truth"], index=False, row_group_size=2048)
    pairs.to_parquet(paths["labeled_pairs_gs"], index=False, row_group_size=4096)
    return paths
