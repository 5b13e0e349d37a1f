#!/usr/bin/env python3
"""Adversarial fixture perturbation for the parity gate.

Copies an sf directory and injects the data hazards the clean fixtures
never exercise — NULLs in nullable columns, sub-shingle-length and
duplicated documents, tied order dates — while respecting the declared
column contracts (ids/timestamps stay non-null, props keeps its
single-key JSON shape). Running tools/check.py against the fuzzed copy
then exercises every oracle query's null/tie/boundary semantics.

Usage: python3 tools/fuzz_fixtures.py <srcSfDir> <dstDir>
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 1234


def fuzz_events(t: pa.Table, rng) -> pa.Table:
    n = t.num_rows
    cols = {c: t[c].to_pylist() for c in t.column_names}
    # 5% null value, 3% null props, 2% null event_type
    for i in rng.choice(n, max(n // 20, 1), replace=False):
        cols["value"][i] = None
    for i in rng.choice(n, max(n // 33, 1), replace=False):
        cols["props"][i] = None
    for i in rng.choice(n, max(n // 50, 1), replace=False):
        cols["event_type"][i] = None
    # within-user timestamp TIES across event types: the hazard the
    # funnel's strict-ordering (a click at exactly t_view must not
    # count), the as-of boundary, and the interval-join edges actually
    # face — global random ties would mostly land on different users and
    # stress nothing
    by_user = {}
    for idx, u in enumerate(cols["user_id"]):
        by_user.setdefault(u, []).append(idx)
    for rows in by_user.values():
        if len(rows) >= 2 and rng.random() < 0.3:
            i, j = rng.choice(len(rows), 2, replace=False)
            cols["ts"][rows[int(j)]] = cols["ts"][rows[int(i)]]
    return pa.table(
        {c: pa.array(cols[c], type=t.schema.field(c).type) for c in t.column_names})


def fuzz_documents(t: pa.Table, rng) -> pa.Table:
    cols = {c: t[c].to_pylist() for c in t.column_names}
    n = t.num_rows
    # a handful of sub-3-token docs (shingle totality) and exact+shuffled dups
    for k, txt in enumerate(["a", "a b", "", "x y"]):
        i = int(rng.integers(0, n))
        cols["text"][i] = txt
        cols["n_chars"][i] = len(txt)
    # exact + shuffled duplicates — resample so the hazards are ALWAYS
    # injected (a fixed seed would otherwise skip them forever for the
    # unlucky fixture size)
    src = int(rng.integers(0, n))
    dup = int(rng.integers(0, n))
    while n >= 2 and dup == src:
        dup = int(rng.integers(0, n))
    cols["text"][dup] = cols["text"][src]               # exact duplicate
    cols["n_chars"][dup] = cols["n_chars"][src]
    shuf = int(rng.integers(0, n))
    toks = cols["text"][src].split(" ")
    for _ in range(10):                                  # force a real permutation
        rng.shuffle(toks)
        if " ".join(toks) != cols["text"][src] or len(set(toks)) <= 1:
            break
    cols["text"][shuf] = " ".join(toks)                  # shuffled duplicate
    cols["n_chars"][shuf] = len(cols["text"][shuf])
    # NULL text (after the dup machinery so it never picks a null src):
    # exercises null propagation through every text query AND the
    # null-text semantics of dedup clustering / hash splits
    special = {src, dup, shuf}
    candidates = [i for i in range(n) if i not in special]
    for i in rng.choice(len(candidates), min(3, len(candidates)), replace=False):
        j = candidates[int(i)]
        cols["text"][j] = None
        cols["n_chars"][j] = 0
    return pa.table(
        {c: pa.array(cols[c], type=t.schema.field(c).type) for c in t.column_names})


def fuzz_embeddings(t: pa.Table, rng) -> pa.Table:
    cols = {c: t[c].to_pylist() for c in t.column_names}
    n = t.num_rows
    # null embeddings (undecodable rows) + a null label (blocking key)
    for i in rng.choice(n, 2, replace=False):
        cols["embedding"][int(i)] = None
    cols["label"][int(rng.integers(0, n))] = None
    return pa.table(
        {c: pa.array(cols[c], type=t.schema.field(c).type) for c in t.column_names})


def fuzz_orders(t: pa.Table, rng) -> pa.Table:
    cols = {c: t[c].to_pylist() for c in t.column_names}
    n = t.num_rows
    # force order-date ties WITHIN customers (the hazard q15's window
    # tie-break actually faces) — global random pairs would mostly create
    # cross-customer "ties" that stress nothing
    by_cust = {}
    for idx, ck in enumerate(cols["o_custkey"]):
        by_cust.setdefault(ck, []).append(idx)
    for rows in by_cust.values():
        if len(rows) >= 2 and rng.random() < 0.5:
            i, j = rng.choice(len(rows), 2, replace=False)
            cols["o_orderdate"][rows[int(j)]] = cols["o_orderdate"][rows[int(i)]]
    # tied total prices (top-k / rank ties)
    for _ in range(n // 20):
        i, j = rng.integers(0, n, 2)
        cols["o_totalprice"][int(j)] = cols["o_totalprice"][int(i)]
    return pa.table(
        {c: pa.array(cols[c], type=t.schema.field(c).type) for c in t.column_names})


def main():
    src, dst = sys.argv[1], sys.argv[2]
    import os
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(SEED)
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        t = pq.read_table(f"{src}/{name}.parquet")
        if name == "events":
            t = fuzz_events(t, rng)
        elif name == "documents":
            t = fuzz_documents(t, rng)
        elif name == "orders":
            t = fuzz_orders(t, rng)
        elif name == "embeddings":
            t = fuzz_embeddings(t, rng)
        pq.write_table(t, f"{dst}/{name}.parquet")
    print(f"fuzzed fixtures written to {dst}")


if __name__ == "__main__":
    main()
