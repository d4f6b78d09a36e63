"""O(batch) incremental blocking: a persistent key index + token-df deltas.

``resolve_batch_increment`` (streaming/incremental_er.py) re-blocks the FULL
accumulated corpus every micro-batch — exact, but O(corpus) per batch. This
module maintains the blocking state incrementally so per-batch work scales
with the batch (plus the tokens whose df-status flipped), while the
candidate-pair set stays EXACTLY what ``operators.blocking.block_offers``
would produce from scratch on the accumulated corpus — the same pinned
invariant, now at index-maintenance cost.

Why exactness is nontrivial: blocking keys depend on corpus-wide statistics.
A token is usable iff ``min_df ≤ df ≤ max_df_frac·N(group)``; rare-token
keys exist iff additionally ``df ≤ max_rare_df``; LSH band keys hash the
offer's PRUNED token set. So a batch can retroactively change OLD offers'
keys three ways: a token's second occurrence arrives (crosses min_df — the
retroactive-pair case), a token's df outgrows ``max_rare_df`` (its block
key dies), or group growth moves the ``max_df_frac·N`` ceiling (boilerplate
tokens flip in/out, changing LSH signatures). The index handles all three
by construction:

1. merge the batch's (group, token) counts into ``token_df`` and diff each
   token's (kept, rare) STATUS under old vs new thresholds → ``flipped``;
2. holders of flipped tokens (bucket-pruned ``postings`` lookup) plus the
   batch's offers are the only offers whose key sets can change;
3. recompute keys for exactly those offers — REUSING ``rare_token_keys`` /
   ``minhash_band_keys`` verbatim so the key strings cannot drift from the
   batch blocker — and diff against ``offer_keys`` → membership deltas;
4. apply deltas to ``key_members``; the candidate-pair delta is the gated
   pair diff per touched key, with a shared-key support check before any
   removal (a pair leaves the candidate set only when NO valid key still
   yields it).

Per-batch cost: one pass over the batch, one V-sized token_df merge (V =
vocabulary, sublinear in corpus — Heaps' law), bucket-pruned lookups for
flipped-token holders, and pair work bounded by touched_keys·max_block²/2.
Nothing re-tokenizes or re-shuffles the accumulated corpus. State lives in
a VersionedState (state_store.py): bucket-pruned reads, hard-link
carryover, atomic snapshot commit — the Iceberg-shaped seam.

No reference counterpart (the reference is offline batch scripts,
/root/reference/README.md:25-38); this is the continuous-crawl capability
the north rule's 10^12-document setting demands.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.blocking import (
    DEFAULT_BANDS,
    DEFAULT_MAX_DF_FRAC,
    DEFAULT_MIN_DF,
    DEFAULT_NUM_HASHES,
    build_title_for_ts,
    minhash_band_keys,
    rare_token_keys,
)
from .state_store import VersionedState, bucket_of

_NULL_GROUP = "\x00<null>"

# table schemas (bucket column included — it is the partition dir)
SCH_TOKEN_DF = "gnorm string, token string, df long, bucket int"
SCH_POSTINGS = "gnorm string, token string, id long, bucket int"
SCH_OFFER_TOKENS = "id long, gnorm string, tokens array<string>, bucket int"
SCH_OFFER_KEYS = "id long, key string, bucket int"
SCH_KEY_MEMBERS = "key string, id long, bucket int"
SCH_GROUP_SIZES = "gnorm string, n long, bucket int"


@dataclass
class BlockingParams:
    min_df: int = DEFAULT_MIN_DF
    max_df_frac: float = DEFAULT_MAX_DF_FRAC
    max_rare_df: int | None = None
    num_hashes: int = DEFAULT_NUM_HASHES
    bands: int = DEFAULT_BANDS
    max_block_size: int = 100
    use_lsh: bool = True

    @property
    def rare_df(self) -> int:
        # block_offers: `max_rare_df or max_block_size`
        return self.max_rare_df or self.max_block_size


def _status_cols(df_col, n_col, p: BlockingParams):
    """(kept, rare) under the exact predicates prune_tokens_by_df and
    rare_token_keys apply (blocking.py:83-84,129)."""
    kept = (df_col >= F.lit(p.min_df)) & (
        df_col <= (n_col * F.lit(p.max_df_frac))
    )
    return kept, kept & (df_col <= F.lit(p.rare_df))


def _gated_pairs(members: DataFrame, max_block_size: int) -> DataFrame:
    """(key, id) → per-key gated candidate pairs (id_l < id_r), NOT globally
    deduped — callers own the set semantics. Same sorted-array combination
    expansion as candidate_pairs_from_keys (blocking.py:248-271)."""
    bounded = (
        members.groupBy("key")
        .agg(F.array_sort(F.collect_set("id")).alias("ids"))
        .where(
            (F.size("ids") >= 2) & (F.size("ids") <= max_block_size)
        )
    )
    pairs = bounded.select(
        F.explode(
            F.flatten(
                F.transform(
                    "ids",
                    lambda x, i: F.transform(
                        F.slice(
                            "ids",
                            i + F.lit(2),
                            F.greatest(F.size("ids") - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(x.alias("id_l"), y.alias("id_r")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select("p.id_l", "p.id_r")


def _ckpt(df: DataFrame) -> DataFrame:
    """Cut lineage for a small multi-consumer intermediate."""
    return df.localCheckpoint(eager=True)


def apply_batch(
    state: VersionedState,
    batch: DataFrame,
    params: BlockingParams,
) -> dict:
    """Fold one micro-batch of NEW offers (already deduped by id against the
    accumulated corpus) into the blocking index; the caller has ``begin()``-ed
    a version and commits after downstream steps.

    Returns {"pair_adds", "pair_removals", "n_offers"}: pairs entering /
    leaving the batch-equivalent candidate set, and the accumulated offer
    count (maintained, no corpus scan).
    """
    spark = state.spark
    nb = state.n_buckets
    gnorm = F.coalesce(
        F.col("category").cast("string"), F.lit(_NULL_GROUP)
    ).alias("gnorm")

    # -- 1. batch tokens + postings ------------------------------------
    batch_tok = _ckpt(
        build_title_for_ts(batch).select("id", gnorm, "tokens")
    )
    batch_posts = batch_tok.select(
        "gnorm", F.explode("tokens").alias("token"), "id"
    )

    # -- 2. token_df merge + flip detection ----------------------------
    old_df = state.read("token_df", SCH_TOKEN_DF).select("gnorm", "token", "df")
    old_n = state.read("group_sizes", SCH_GROUP_SIZES).select("gnorm", "n")
    batch_counts = batch_posts.groupBy("gnorm", "token").agg(
        F.count("*").alias("d_df")
    )
    batch_n = batch.select(gnorm).groupBy("gnorm").agg(
        F.count("*").alias("d_n")
    )
    new_n = _ckpt(
        old_n.join(batch_n, "gnorm", "full")
        .select(
            "gnorm",
            (
                F.coalesce("n", F.lit(0)) + F.coalesce("d_n", F.lit(0))
            ).alias("n"),
        )
    )
    merged = (
        old_df.join(batch_counts, ["gnorm", "token"], "full")
        .select(
            "gnorm",
            "token",
            F.coalesce("df", F.lit(0)).alias("df_old"),
            (
                F.coalesce("df", F.lit(0)) + F.coalesce("d_df", F.lit(0))
            ).alias("df"),
        )
        .join(F.broadcast(old_n.withColumnRenamed("n", "n_old")), "gnorm", "left")
        .join(F.broadcast(new_n), "gnorm")
        .withColumn("n_old", F.coalesce("n_old", F.lit(0)))
    )
    kept_o, rare_o = _status_cols(F.col("df_old"), F.col("n_old"), params)
    kept_n, rare_n = _status_cols(F.col("df"), F.col("n"), params)
    merged = merged.select(
        "gnorm",
        "token",
        "df",
        kept_o.alias("kept_o"),
        rare_o.alias("rare_o"),
        kept_n.alias("kept_n"),
        rare_n.alias("rare_n"),
    )
    # V-sized rewrite — the one vocabulary-linear cost per batch
    merged = _ckpt(merged)
    new_token_df = merged.select(
        "gnorm", "token", "df", bucket_of(F.col("token"), nb).alias("bucket")
    )
    state.rewrite_buckets(
        "token_df", SCH_TOKEN_DF, new_token_df, list(range(nb))
    )
    state.rewrite_buckets(
        "group_sizes",
        SCH_GROUP_SIZES,
        new_n.select("gnorm", "n", bucket_of(F.col("gnorm"), nb).alias("bucket")),
        list(range(nb)),
    )
    flipped = _ckpt(
        merged.where(
            (F.col("kept_o") != F.col("kept_n"))
            | (F.col("rare_o") != F.col("rare_n"))
        ).select("gnorm", "token")
    )

    # -- 3. touched offers: flipped-token holders + the batch ----------
    flip_buckets = [
        r["b"]
        for r in flipped.select(
            bucket_of(F.col("token"), nb).alias("b")
        ).distinct().collect()
    ]
    old_posts = state.read("postings", SCH_POSTINGS)
    holders = (
        old_posts.where(F.col("bucket").isin(flip_buckets))
        .join(flipped, ["gnorm", "token"], "left_semi")
        .select("id")
        .distinct()
        if flip_buckets
        else spark.createDataFrame([], "id long")
    )
    holders = _ckpt(holders)

    # append batch postings + raw token arrays (needed for FUTURE flips)
    state.append(
        "postings",
        batch_posts.select(
            "gnorm", "token", "id", bucket_of(F.col("token"), nb).alias("bucket")
        ),
    )
    state.append(
        "offer_tokens",
        batch_tok.select(
            "id", "gnorm", "tokens", bucket_of(F.col("id"), nb).alias("bucket")
        ),
    )

    # raw tokens for every touched offer: holders from the store, batch
    # offers from this batch (bucket-pruned lookup, never a corpus pass)
    holder_tokens = state.lookup(
        "offer_tokens", SCH_OFFER_TOKENS, "id", holders
    ).select("id", "gnorm", "tokens")
    touched_raw = _ckpt(
        batch_tok.select("id", "gnorm", "tokens").unionByName(holder_tokens)
    )

    # -- 4-7. re-key the touched offers and diff (shared with retraction)
    kept_tokens = merged.where("kept_n").select("gnorm", "token", "df")
    raw_adds, removed = _rekey_and_diff(state, touched_raw, kept_tokens, params)
    n_offers = int(
        new_n.agg(F.coalesce(F.sum("n"), F.lit(0))).collect()[0][0]
    )
    return {
        "pair_adds": raw_adds,
        "pair_removals": removed,
        "n_offers": n_offers,
    }


def _rekey_and_diff(
    state: VersionedState,
    touched_raw: DataFrame,
    kept_tokens: DataFrame,
    params: BlockingParams,
) -> tuple[DataFrame, DataFrame]:
    """Steps 4-7 of the index fold, shared by :func:`apply_batch` and
    :func:`apply_retraction`: recompute keys for ``touched_raw`` (id, gnorm,
    raw tokens — an EMPTY token array means the offer leaves the index, so
    every old key it held dies), diff against the stored key sets, apply the
    membership deltas to ``offer_keys`` / ``key_members`` in the in-progress
    version, and return (pair_adds, pair_removals) with the shared-key
    support check applied to removals. ``kept_tokens`` is the (gnorm, token,
    df) set valid under the NEW thresholds."""
    spark = state.spark
    nb = state.n_buckets

    exploded = touched_raw.select(
        "id", "gnorm", F.explode("tokens").alias("token")
    )
    pruned_arrays = (
        exploded.join(kept_tokens, ["gnorm", "token"])
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "token"))).alias("_dt"))
        .select(
            "id",
            F.col("_dt.token").alias("tokens"),
            F.col("_dt.df").alias("tok_df"),
        )
    )
    pruned = touched_raw.select("id", "gnorm").join(
        pruned_arrays, "id", "left"
    ).select(
        "id",
        "gnorm",
        F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens"),
        F.coalesce("tok_df", F.array().cast("array<bigint>")).alias("tok_df"),
    )
    # key generation REUSES the batch blocker's own functions — key strings
    # are identical by construction, not by contract
    new_keys = rare_token_keys(pruned, params.rare_df, group_col="gnorm")
    if params.use_lsh:
        new_keys = new_keys.unionByName(
            minhash_band_keys(
                pruned, params.num_hashes, params.bands, group_col="gnorm"
            )
        )
    new_keys = _ckpt(new_keys.select("id", "key").dropDuplicates())

    # -- 5. membership deltas vs the stored key sets -------------------
    touched_ids = _ckpt(touched_raw.select("id").distinct())
    old_keys = _ckpt(
        state.lookup("offer_keys", SCH_OFFER_KEYS, "id", touched_ids).select(
            "id", "key"
        )
    )
    mem_add = _ckpt(new_keys.join(old_keys, ["id", "key"], "left_anti"))
    mem_del = _ckpt(old_keys.join(new_keys, ["id", "key"], "left_anti"))

    # offer_keys: rewrite only buckets containing touched ids
    id_buckets = [
        r["b"]
        for r in touched_ids.select(
            bucket_of(F.col("id"), nb).alias("b")
        ).distinct().collect()
    ]
    prev_ok = state.read("offer_keys", SCH_OFFER_KEYS)
    keep_ok = (
        prev_ok.where(F.col("bucket").isin(id_buckets))
        .join(touched_ids, "id", "left_anti")
        .select("id", "key")
    )
    state.rewrite_buckets(
        "offer_keys",
        SCH_OFFER_KEYS,
        keep_ok.unionByName(new_keys).select(
            "id", "key", bucket_of(F.col("id"), nb).alias("bucket")
        ),
        id_buckets,
    )

    # -- 6. key_members: rewrite touched key buckets; pair deltas ------
    touched_keys = _ckpt(
        mem_add.select("key").unionByName(mem_del.select("key")).distinct()
    )
    key_buckets = [
        r["b"]
        for r in touched_keys.select(
            bucket_of(F.col("key"), nb).alias("b")
        ).distinct().collect()
    ]
    prev_km = state.read("key_members", SCH_KEY_MEMBERS)
    prev_km_touched = prev_km.where(F.col("bucket").isin(key_buckets)).select(
        "key", "id"
    )
    old_members = _ckpt(
        prev_km_touched.join(touched_keys, "key", "left_semi")
    )
    new_members = _ckpt(
        old_members.join(mem_del, ["key", "id"], "left_anti").unionByName(
            mem_add.select("key", "id")
        )
    )
    km_rows = (
        prev_km_touched.join(touched_keys, "key", "left_anti")
        .unionByName(new_members)
        .select("key", "id", bucket_of(F.col("key"), nb).alias("bucket"))
    )
    state.rewrite_buckets("key_members", SCH_KEY_MEMBERS, km_rows, key_buckets)

    old_pairs = _gated_pairs(old_members, params.max_block_size).distinct()
    new_pairs = _gated_pairs(new_members, params.max_block_size).distinct()
    # adds: gated pairs of touched keys not already in the candidate set.
    # "already in" == present in match_edges — every candidate pair is
    # scored and kept there (incl. match=false), so the state itself is the
    # membership test; the caller does that anti-join (it owns match_edges).
    raw_adds = _ckpt(new_pairs.subtract(old_pairs))
    removal_cand = _ckpt(old_pairs.subtract(new_pairs))

    # -- 7. support check: remove only pairs NO valid key still yields --
    if removal_cand.isEmpty():
        removed = removal_cand
    else:
        rc_ids = (
            removal_cand.select(F.col("id_l").alias("id"))
            .unionByName(removal_cand.select(F.col("id_r").alias("id")))
            .distinct()
        )
        # NEW key sets: touched offers from new_keys, untouched offers from
        # the store (their keys did not change this batch — that is the
        # flip argument), looked up bucket-pruned
        rc_untouched = rc_ids.join(touched_ids, "id", "left_anti")
        rc_keys = (
            state.lookup("offer_keys", SCH_OFFER_KEYS, "id", rc_untouched)
            .select("id", "key")
            .unionByName(new_keys.join(rc_ids, "id", "left_semi"))
        )
        removed = _supported_pairs(
            state, removal_cand, rc_keys, new_members, touched_keys, params
        )
    return raw_adds, removed


def apply_retraction(
    state: VersionedState,
    ids: DataFrame,
    params: BlockingParams,
) -> dict:
    """Fold one batch of offer RETRACTIONS into the blocking index — the
    lifecycle event a continuous crawl cannot avoid (page taken down,
    right-to-erasure, re-crawl superseding old content). ``ids`` must be
    restricted to offers currently in the index (caller intersects); the
    caller has ``begin()``-ed a version and commits after downstream steps.

    Same exactness invariant as :func:`apply_batch`, mirrored: after the
    fold, the candidate set equals ``block_offers`` from scratch on the
    corpus MINUS ``ids``. Retraction moves corpus statistics the opposite
    way — a token's df (and its group's size ceiling) can FALL back inside
    the gates, re-validating keys of SURVIVING offers — so the returned
    ``pair_adds`` are retroactive pairs among survivors and
    ``pair_removals`` cover every candidate pair touching a retracted id
    plus flip fallout, both via the same flip machinery and shared-key
    support check as the insert path. Retracted ids re-key to the EMPTY
    set (``_rekey_and_diff``), which deletes their memberships uniformly.

    Per-batch cost mirrors apply_batch — one V-sized token_df merge,
    bucket-pruned lookups keyed by the retracted offers' ids and tokens,
    pair work bounded by touched keys, no corpus scan — with one honest
    asymmetry: deletes are COPY-ON-WRITE (each touched bucket rewrites
    whole, Iceberg-COW semantics) where inserts APPEND. Right-sized when
    retractions are batched and touch a small fraction of buckets — the
    crawl-lifecycle shape — and the upgrade if tombstone feeds ever
    dominate is named: position-delete side files applied as read-time
    anti-joins, compacted past a tombstone-fraction threshold
    (merge-on-read), exactly the swap the catalog layer documents for
    Iceberg.
    """
    spark = state.spark
    nb = state.n_buckets
    ids = _ckpt(ids.select("id").distinct())

    gone_tok = _ckpt(
        state.lookup("offer_tokens", SCH_OFFER_TOKENS, "id", ids).select(
            "id", "gnorm", "tokens"
        )
    )
    gone_posts = gone_tok.select(
        "gnorm", F.explode("tokens").alias("token"), "id"
    )

    # -- token_df / group_sizes: negative merge + flip detection --------
    old_df = state.read("token_df", SCH_TOKEN_DF).select("gnorm", "token", "df")
    old_n = state.read("group_sizes", SCH_GROUP_SIZES).select("gnorm", "n")
    gone_counts = gone_posts.groupBy("gnorm", "token").agg(
        F.count("*").alias("d_df")
    )
    gone_n = gone_tok.groupBy("gnorm").agg(F.count("*").alias("d_n"))
    new_n = _ckpt(
        old_n.join(gone_n, "gnorm", "left")
        .select(
            "gnorm",
            (F.col("n") - F.coalesce("d_n", F.lit(0))).alias("n"),
        )
        .where(F.col("n") > 0)
    )
    merged = (
        old_df.join(gone_counts, ["gnorm", "token"], "left")
        .select(
            "gnorm",
            "token",
            F.col("df").alias("df_old"),
            (F.col("df") - F.coalesce("d_df", F.lit(0))).alias("df"),
        )
        .join(F.broadcast(old_n.withColumnRenamed("n", "n_old")), "gnorm")
        .join(F.broadcast(new_n), "gnorm", "left")
        .withColumn("n", F.coalesce("n", F.lit(0)))
    )
    kept_o, rare_o = _status_cols(F.col("df_old"), F.col("n_old"), params)
    kept_n, rare_n = _status_cols(F.col("df"), F.col("n"), params)
    merged = _ckpt(
        merged.select(
            "gnorm",
            "token",
            "df",
            kept_o.alias("kept_o"),
            rare_o.alias("rare_o"),
            kept_n.alias("kept_n"),
            rare_n.alias("rare_n"),
        )
    )
    # df=0 rows leave the vocabulary table instead of lingering forever
    state.rewrite_buckets(
        "token_df",
        SCH_TOKEN_DF,
        merged.where(F.col("df") > 0).select(
            "gnorm", "token", "df", bucket_of(F.col("token"), nb).alias("bucket")
        ),
        list(range(nb)),
    )
    state.rewrite_buckets(
        "group_sizes",
        SCH_GROUP_SIZES,
        new_n.select("gnorm", "n", bucket_of(F.col("gnorm"), nb).alias("bucket")),
        list(range(nb)),
    )
    flipped = _ckpt(
        merged.where(
            (F.col("kept_o") != F.col("kept_n"))
            | (F.col("rare_o") != F.col("rare_n"))
        ).select("gnorm", "token")
    )

    # -- touched survivors: flipped-token holders minus the retracted ---
    flip_buckets = [
        r["b"]
        for r in flipped.select(
            bucket_of(F.col("token"), nb).alias("b")
        ).distinct().collect()
    ]
    old_posts = state.read("postings", SCH_POSTINGS)
    holders = (
        old_posts.where(F.col("bucket").isin(flip_buckets))
        .join(flipped, ["gnorm", "token"], "left_semi")
        .select("id")
        .distinct()
        .join(ids, "id", "left_anti")
        if flip_buckets
        else spark.createDataFrame([], "id long")
    )
    holders = _ckpt(holders)

    # -- delete retracted rows from postings / offer_tokens -------------
    gone_tok_buckets = [
        r["b"]
        for r in gone_posts.select(
            bucket_of(F.col("token"), nb).alias("b")
        ).distinct().collect()
    ]
    keep_posts = (
        old_posts.where(F.col("bucket").isin(gone_tok_buckets))
        .join(F.broadcast(ids), "id", "left_anti")
        .select("gnorm", "token", "id", "bucket")
    )
    state.rewrite_buckets("postings", SCH_POSTINGS, keep_posts, gone_tok_buckets)
    id_buckets = [
        r["b"]
        for r in ids.select(
            bucket_of(F.col("id"), nb).alias("b")
        ).distinct().collect()
    ]
    old_ot = state.read("offer_tokens", SCH_OFFER_TOKENS)
    keep_ot = (
        old_ot.where(F.col("bucket").isin(id_buckets))
        .join(F.broadcast(ids), "id", "left_anti")
        .select("id", "gnorm", "tokens", "bucket")
    )
    state.rewrite_buckets("offer_tokens", SCH_OFFER_TOKENS, keep_ot, id_buckets)

    # -- re-key: survivors with their raw tokens, retracted with EMPTY --
    holder_tokens = state.lookup(
        "offer_tokens", SCH_OFFER_TOKENS, "id", holders
    ).select("id", "gnorm", "tokens")
    touched_raw = _ckpt(
        holder_tokens.unionByName(
            gone_tok.select(
                "id",
                "gnorm",
                F.array().cast("array<string>").alias("tokens"),
            )
        )
    )
    kept_tokens = merged.where("kept_n").select("gnorm", "token", "df")
    raw_adds, removed = _rekey_and_diff(state, touched_raw, kept_tokens, params)
    n_offers = int(
        new_n.agg(F.coalesce(F.sum("n"), F.lit(0))).collect()[0][0]
    )
    return {
        "pair_adds": raw_adds,
        "pair_removals": removed,
        "n_offers": n_offers,
    }


def _supported_pairs(
    state: VersionedState,
    removal_cand: DataFrame,
    rc_keys: DataFrame,
    new_members_touched: DataFrame,
    touched_keys: DataFrame,
    params: BlockingParams,
) -> DataFrame:
    """Subset of ``removal_cand`` with NO surviving valid shared key —
    the pairs that truly leave the candidate set."""
    kl = rc_keys.select(
        F.col("id").alias("id_l"), F.col("key").alias("_k")
    )
    kr = rc_keys.select(
        F.col("id").alias("id_r"), F.col("key").alias("_k")
    )
    shared = (
        removal_cand.join(kl, "id_l").join(kr, ["id_r", "_k"])
        .select("id_l", "id_r", F.col("_k").alias("key"))
        .distinct()
    )
    if shared.isEmpty():
        return removal_cand
    # sizes of the candidate shared keys in the NEW state: touched keys from
    # new_members (in-flight; a touched key emptied this batch is simply
    # absent → size 0 → invalid), untouched keys from the previous version
    # (no membership delta ⇒ size unchanged), bucket-pruned
    skeys = shared.select("key").distinct()
    touched_sizes = new_members_touched.join(skeys, "key", "left_semi").groupBy(
        "key"
    ).agg(F.count("*").alias("_n"))
    stored = state.lookup(
        "key_members", SCH_KEY_MEMBERS, "key",
        skeys.join(touched_keys, "key", "left_anti"),
    )
    stored_sizes = stored.groupBy("key").agg(F.count("*").alias("_n"))
    sizes = touched_sizes.unionByName(stored_sizes)
    valid_shared = shared.join(
        sizes.where(
            (F.col("_n") >= 2) & (F.col("_n") <= params.max_block_size)
        ).select("key"),
        "key",
        "left_semi",
    )
    supported = valid_shared.select("id_l", "id_r").distinct()
    return removal_cand.join(supported, ["id_l", "id_r"], "left_anti")
