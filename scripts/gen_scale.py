#!/usr/bin/env python
"""Generate seeded sf-scaled twins of the driver testdata tables.

The driver ships sf0.001/sf0.01/sf0.1; the 100 TB story needs at least one
measured point ABOVE the bench scale to show sub-quadratic growth for the
bucketed pipelines (SCALE.md).  This writes `documents`, `embeddings` and
`events` parquet files whose schemas match /root/testdata exactly
(documents: doc_id/text/lang/source/n_chars; embeddings: vec_id/
embedding list<float>/label; events: event_id/ts timestamp[ns]/user_id/
event_type/value/props) and whose distributions mirror the originals:

- documents: bag-of-words text over a small vocab (the originals are
  random short words, avg ~300 chars), ~2% mutated near-duplicates and
  ~0.2% exact duplicates so dedup pipelines have real positives;
- embeddings: 64-dim float32 N(0,1), 10 labels, ~1% near-duplicate
  vectors (small perturbation of an earlier row) for the LSH path;
- events: uniform user/event_type/value with JSON props, timestamp[ns]
  (parquet TIMESTAMP(NANOS), same as the originals — the session reads it
  via nanosAsLong).

Usage:  python scripts/gen_scale.py --mult 10 --out /tmp/scale_sf1
`--mult` scales row counts relative to sf0.1 (10 → "sf1").  Fully seeded:
same args → byte-identical output.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# sf0.1 row counts (TESTDATA.md)
BASE = {
    "documents": 5_000,
    "embeddings": 2_000,
    "events": 100_000,
    "orders": 150_000,
    "customer": 15_000,
}

VOCAB = (
    "batch part spark line column order small sort fast value scan slow "
    "group agg filter query big key window join hash merge shuffle stage "
    "task node rack disk page cache read write push prune skew salt plan "
    "cost rule tree scan row map list set dict heap stack queue log index"
).split()

LANGS = ["en", "de", "fr", "es", "pt"]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def gen_documents(n: int, rng: np.random.Generator) -> pa.Table:
    lens = rng.integers(8, 110, size=n)
    vocab = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n):
        r = rng.random()
        if i > 100 and r < 0.002:  # exact duplicate of an earlier doc
            texts.append(texts[rng.integers(0, i)])
        elif i > 100 and r < 0.022:  # near-duplicate: few word swaps
            words = texts[rng.integers(0, i)].split()
            for _ in range(max(1, len(words) // 20)):
                words[rng.integers(0, len(words))] = vocab[
                    rng.integers(0, len(vocab))
                ]
            texts.append(" ".join(words))
        else:
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), lens[i])]))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                np.array(LANGS)[rng.integers(0, len(LANGS), n)], pa.string()
            ),
            "source": pa.array(
                [f"src_{i:02d}" for i in rng.integers(0, 20, n)], pa.string()
            ),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )


def gen_embeddings(
    n: int,
    rng: np.random.Generator,
    dim: int = 64,
    clusters: int | None = None,
) -> pa.Table:
    if clusters:
        # mixture of gaussians: real embedding corpora are clustered, not
        # isotropic — the regime where LSH/IVF probe ladders climb fast
        # and where a TRAINED coarse quantizer beats a random one
        # (scripts/ann_tradeoff.py --train-ivf; SCALE.md round 10).
        # Within-cluster std 0.35 vs unit-norm centers: neighbors are
        # overwhelmingly intra-cluster but clusters still overlap.
        centers = rng.standard_normal((clusters, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        sizes = rng.multinomial(n, rng.dirichlet(np.full(clusters, 2.0)))
        parts = [
            centers[c] + rng.standard_normal((sz, dim)) * 0.35
            for c, sz in enumerate(sizes)
            if sz
        ]
        vecs = np.concatenate(parts).astype(np.float32)
        rng.shuffle(vecs, axis=0)
    else:
        vecs = rng.standard_normal((n, dim)).astype(np.float32)
    # ~1% near-duplicates: tiny perturbation of an earlier vector
    n_dup = n // 100
    src = rng.integers(0, n // 2, n_dup)
    dst = rng.integers(n // 2, n, n_dup)
    vecs[dst] = vecs[src] + rng.standard_normal((n_dup, dim)).astype(np.float32) * 0.01
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, n).astype(np.int32)),
        }
    )


def gen_events(n: int, rng: np.random.Generator) -> pa.Table:
    base_ns = np.int64(1_704_067_200_000_000_000)  # 2024-01-01T00:00:00Z
    ts = base_ns + np.cumsum(rng.integers(1, 60_000, n)).astype(np.int64) * 1_000_000
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts, pa.timestamp("ns")),
            "user_id": pa.array(rng.integers(0, 1_500 * max(1, n // BASE["events"]), n)),
            "event_type": pa.array(
                np.array(EVENT_TYPES)[rng.integers(0, len(EVENT_TYPES), n)],
                pa.string(),
            ),
            "value": pa.array(np.round(rng.random(n) * 150, 2)),
            "props": pa.array(
                [f'{{"k": {v}}}' for v in rng.integers(0, 100, n)], pa.string()
            ),
        }
    )


def gen_customer(n: int, rng: np.random.Generator) -> pa.Table:
    """Matches the testdata customer schema; c_custkey is 1-based like
    TPC-H so orders can draw foreign keys from the same range."""
    segments = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    keys = np.arange(1, n + 1, dtype=np.int64)
    return pa.table(
        {
            "c_custkey": pa.array(keys),
            "c_name": pa.array([f"Customer#{k:09d}" for k in keys], pa.string()),
            "c_nationkey": pa.array(rng.integers(0, 25, n).astype(np.int32)),
            "c_acctbal": pa.array(np.round(rng.random(n) * 11_000 - 1_000, 2)),
            "c_mktsegment": pa.array(
                np.array(segments)[rng.integers(0, len(segments), n)], pa.string()
            ),
        }
    )


def zipf_keys(
    n: int, n_keys: int, s: float, rng: np.random.Generator
) -> np.ndarray:
    """n draws from a zipfian(s) distribution over keys 1..n_keys.

    Rank-based inverse-CDF sampling (P(rank r) ∝ r^-s), so the exponent
    holds exactly over the FINITE key range — numpy's rng.zipf samples
    unbounded support and clamping distorts the head.  Rank 1 maps to
    key 1: the hottest key is known, which the skew bench exploits."""
    ranks = np.arange(1, n_keys + 1, dtype=np.float64)
    p = ranks**-s
    p /= p.sum()
    return rng.choice(np.arange(1, n_keys + 1, dtype=np.int64), size=n, p=p)


def gen_orders(
    n: int,
    rng: np.random.Generator,
    n_cust: int,
    zipf_s: float | None = None,
) -> pa.Table:
    """Matches the testdata orders schema.  Like TPC-H, only ~2/3 of
    customers place orders (o_custkey drawn from the lower 2/3 of the key
    range) — the bloom_filter query needs genuine non-members to score
    false positives against.

    ``zipf_s``: when set, o_custkey is drawn zipfian (exponent s) over
    the same range instead of uniformly — the skew-stress twin
    (scripts/skew_bench.py).  s≈1.1 puts a few percent of ALL orders on
    the single hottest customer, the classic hot-FK shuffle-join bomb."""
    base_us = np.int64(757_382_400_000_000)  # 1994-01-01T00:00:00Z in µs
    span_us = np.int64(6 * 365 * 24 * 3600) * 1_000_000
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "o_custkey": pa.array(
                # inclusive upper bound: the lower-2/3 key range is
                # [1, 2n/3] (rng.integers' high is exclusive)
                zipf_keys(n, max(2, n_cust * 2 // 3), zipf_s, rng)
                if zipf_s is not None
                else rng.integers(1, max(2, n_cust * 2 // 3) + 1, n).astype(
                    np.int64
                )
            ),
            "o_orderstatus": pa.array(
                np.array(["O", "F", "P"])[rng.integers(0, 3, n)], pa.string()
            ),
            "o_totalprice": pa.array(np.round(rng.random(n) * 400_000 + 900, 2)),
            "o_orderdate": pa.array(
                base_us + (rng.random(n) * span_us).astype(np.int64),
                pa.timestamp("us"),
            ),
            "o_orderpriority": pa.array(
                np.array(prios)[rng.integers(0, len(prios), n)], pa.string()
            ),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10, help="row-count multiple of sf0.1")
    ap.add_argument("--out", default="/tmp/scale_sf1")
    ap.add_argument("--seed", type=int, default=20260813)
    ap.add_argument(
        "--zipf-orders",
        type=float,
        default=None,
        metavar="S",
        help="draw o_custkey zipfian with exponent S (skew twin) instead of uniform",
    )
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset to generate (default: all) — e.g. "
        "orders,customer for a big skew twin without the slow documents loop",
    )
    ap.add_argument(
        "--clustered-emb",
        type=int,
        default=None,
        metavar="M",
        help="draw embeddings from a mixture of M gaussians (clustered-corpus "
        "ANN twin) instead of isotropic N(0,1)",
    )
    ap.add_argument(
        "--cust-mult",
        type=int,
        default=None,
        help="row-count multiple for customer only (default: --mult) — a "
        "smaller dim vs fact ratio, the salted-join middle regime",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    cust_mult = args.cust_mult if args.cust_mult is not None else args.mult
    n_cust = BASE["customer"] * cust_mult
    only = set(args.tables.split(",")) if args.tables else None
    for name, gen in [
        ("documents", gen_documents),
        (
            "embeddings",
            lambda n, rng: gen_embeddings(n, rng, clusters=args.clustered_emb),
        ),
        ("events", gen_events),
        ("customer", gen_customer),
        ("orders", lambda n, rng: gen_orders(n, rng, n_cust, args.zipf_orders)),
    ]:
        if only is not None and name not in only:
            continue
        mult = cust_mult if name == "customer" else args.mult
        table = gen(BASE[name] * mult, rng)
        # multiple row groups → parallel scan partitions, like real 100 TB
        # inputs (the shipped testdata is single-row-group; model.py's
        # ensure_parallelism exists to compensate for exactly that)
        pq.write_table(
            table,
            os.path.join(args.out, f"{name}.parquet"),
            row_group_size=max(10_000, len(table) // 32),
        )
        print(name, len(table), "rows ->", args.out)


if __name__ == "__main__":
    main()
