"""Adversarial-corpus oracle parity: the driver's fixed testdata is benign
(single-space English text, no NULLs); this module re-runs the documents/
embeddings-backed oracle queries against a nasty synthetic corpus — tabs,
newlines, double spaces, unicode, quotes, empty strings, NULL text, a
whitespace-only doc — and asserts Spark↔DuckDB hash parity holds there
too. This is the test class that catches tokenizer-split and NULL-handling
divergences the benign fixture cannot (e.g. the whitespace-run vs
single-space vocabulary split fixed in bert_pair_encode).
"""

import hashlib
import math
import random

import duckdb
import numpy as np
import pandas as pd
import pytest

from productbert_intermediate_spark.plans.testdata_queries import REGISTRY

# documents/embeddings-only queries whose semantics must survive nasty text.
# (Excluded by design: lineitem/orders/part-backed queries — their tables
# aren't regenerated here — and sampling queries whose row *content* is the
# whole output anyway.)
FUZZ_QUERIES = [
    "wdc_clean_string",
    "stopword_removal",
    "minhash_lsh_pairs",
    "jaccard_dup_pairs",
    "simhash_fingerprint",
    "quality_score",
    "token_count_bpe",
    "doc_fingerprint",
    "multimodal_meta",
    "mlm_mask",
    "bert_pair_encode",
    "vocab_min_df",
    "wordcooc_feature",
    "lang_id",
    "exact_dedup",
    "det_shuffle",
    "seeded_sample",
    "class_ratio",
    "ann_cosine_matches",
    "ann_topk",
    "ann_ivf_probeall",
    "embedding_neardup",
    "label_encode",
    "histogram",
    "token_stats",
    "distinct_count",
    "er_blocking_pairs",
    "er_score_pairs_jvm",
    "er_entities_jvm",
    "training_neg_knn",
    "connected_components",
]

_NASTY = [
    "",
    " ",
    "   ",
    "a  b   c",
    "tab\tseparated\ttokens",
    "new\nline\ntext",
    'he said "hello" loudly',
    "café ñoño 中文 текст",
    "'); drop table documents; --",
    "repeat " * 40,
    "\t\n ",
    "ünïcödé with  doubled  spaces\tand\ttabs",
    None,
    # engine-specific whitespace: Java \s has \x0B but RE2 doesn't; neither
    # has NBSP/NEL/U+2028, all of which Python str.split() treats as
    # whitespace — the explicit PY_WS_CLASS must make all engines agree
    "vertical\x0btab here",
    "non\xa0breaking\xa0space",
    "next\x85line and unicode separators",
    "ideographic　space  em-space",
    "\xa0\x0b ",
]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("oracle_fuzz")
    rng = random.Random(1234)
    words = ["the", "quick", "brown", "fox", "data", "engine", "spark",
             "uno", "dos", "tres", "le", "la", "und", "der"]
    rows = []
    for i in range(300):
        if i < len(_NASTY):
            text = _NASTY[i]
        else:
            text = " ".join(rng.choices(words, k=rng.randint(1, 30)))
            if rng.random() < 0.1:
                text += "\t" + rng.choice(words)
            if rng.random() < 0.1:
                text = text.replace(" ", "  ", 1)
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": rng.choice(["en", "es", "de"]),
                # a few NULL sources: grouping/blocking/window semantics must
                # agree on whether NULL is a group (they do — explicitly)
                "source": None if 20 <= i < 24 else f"s{i % 4}",
                "n_chars": len(text) if text is not None else 0,
            }
        )
    pd.DataFrame(rows).to_parquet(f"{d}/documents.parquet", index=False)

    nprng = np.random.RandomState(99)
    vectors = [nprng.normal(size=64).astype(np.float32) for _ in range(119)]
    # zero-norm vector: unguarded cosine would be NaN, which DuckDB orders
    # ABOVE all numbers while Spark compares it false — the queries must
    # null it out identically on both engines
    vectors.append(np.zeros(64, dtype=np.float32))
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(120, dtype=np.int64),
            "embedding": vectors,
            "label": nprng.randint(0, 3, size=120).astype(np.int32),
        }
    )
    emb.to_parquet(f"{d}/embeddings.parquet", index=False)
    return str(d)


@pytest.fixture(scope="module")
def fuzz_con(fuzz_dir):
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.execute(f"create view {t} as select * from '{fuzz_dir}/{t}.parquet'")
    return c


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return f"{type(v).__name__}:{v}" if not isinstance(v, (int, str)) else str(v)


def _hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.mark.parametrize("name", FUZZ_QUERIES)
def test_query_matches_oracle_on_adversarial_corpus(spark, fuzz_dir, fuzz_con, name):
    fn, sql = REGISTRY[name]
    sdf = fn(spark, fuzz_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = fuzz_con.execute(sql)
    orows = res.fetchall()
    ocols = [d[0] for d in res.description]
    assert sorted(sdf.columns) == sorted(ocols)
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)}"
    assert _hash(srows, sdf.columns) == _hash(orows, ocols), name
