#!/usr/bin/env python3
"""Measured key-skew rehearsal (round-10 verdict ask #1, second half):
the repo's skew machinery (AQE skew-join split, salting, df-caps,
degree orientation, postings-grain joins) had never met a ZIPFIAN
corpus through real entries — every claim was validated on synthetic
two-value splits. This builds TWIN corpora that differ ONLY in key
distribution and times the heavy-tail entries on both:

  uniform: events.user_id ~ U(20k users), documents.source ~ U(50)
  zipf:    hot key owns 30% of rows, remainder zipf(s=1.2) —
           the rank-frequency shape every real 100 TB corpus has

Everything else (timestamps, values, text content, planted dup
families, row counts) is generated from the SAME seed sequence, so a
time delta is attributable to key distribution alone. Scale: events
1M rows (10x bench), documents 20k (4x bench) — big enough that a
one-reducer hot partition would dominate wall-clock visibly.

Usage: python3 tools/skew_rehearsal.py [iters] [name ...]
Writes corpora under target/skew/{uniform,zipf}, prints AB-style
min/med per (corpus, entry). Dev-only tool; not part of the library.
"""
import os
import shutil
import subprocess
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.1"
N_EV = 1_000_000
N_DOC = 20_000
N_USERS = 20_000
N_SRC = 50
HOT = 0.30

ENTRIES = ["win_sessionize_gap", "ext_funnel", "ext_cohort_retention",
           "agg_multikey", "ext_substring_dedup", "ext_lm_score",
           "ext_minhash_dedup", "ext_dedup_clusters", "ext_tfidf"]

VOCAB = ("the fast key order sort table scan merge part window small "
         "hash join batch stream spark dup group query row data slow "
         "filter customer line value agg column big vector net port").split()


def zipf_keys(rng, n_rows, n_keys):
    """Hot key 0 owns HOT of rows; tail ranks follow zipf(1.2),
    REJECTION-sampled into [1, n_keys): clamping (the round-11
    spelling) piled the ~10-12% of zipf(1.2) draws above the cap onto
    key n_keys-1, manufacturing a second hot key the AB then
    mis-attributed to 'zipf shape' (round-11 ADVICE)."""
    hot = rng.random(n_rows) < HOT
    tail = rng.zipf(1.2, n_rows)
    bad = tail >= n_keys
    while bad.any():
        tail[bad] = rng.zipf(1.2, int(bad.sum()))
        bad = tail >= n_keys
    return np.where(hot, 0, tail).astype(np.int64)


def build(out, skew):
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"):
        src = f"{BASE}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copy(src, dst)
    # --- events: identical except user_id
    rng = np.random.default_rng(77)
    ts = (pd.Timestamp("2024-01-01").value // 1000 +
          rng.integers(0, 30 * 86400 * 1_000_000, N_EV))
    val = np.round(rng.uniform(0.01, 350, N_EV), 2)
    et = np.array(["click", "view", "purchase", "signup", "error"])[
        rng.integers(0, 5, N_EV)]
    props = np.char.add(np.char.add("{\"k\": ",
        rng.integers(0, 100, N_EV).astype(str)), "}")
    rng_k = np.random.default_rng(78)    # key draws SEPARATE from values
    uid = zipf_keys(rng_k, N_EV, N_USERS) if skew else \
        rng_k.integers(0, N_USERS, N_EV)
    tbl = pa.table({
        "event_id": pa.array(np.arange(N_EV), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "value": pa.array(val, pa.float64()),
        "props": pa.array(props, pa.string())})
    pq.write_table(tbl, f"{out}/events.parquet")
    # --- documents: identical text/dups except source
    rng = np.random.default_rng(79)
    texts = []
    for i in range(N_DOC):
        if i and rng.random() < 0.10:
            texts.append(texts[int(rng.integers(0, i))])  # exact dup
        else:
            k = int(rng.integers(20, 60))
            texts.append(" ".join(np.array(VOCAB)[
                rng.integers(0, len(VOCAB), k)]))
    rng_k = np.random.default_rng(80)
    src = zipf_keys(rng_k, N_DOC, N_SRC) if skew else \
        rng_k.integers(0, N_SRC, N_DOC)
    langs = np.array(["en", "fr", "de", "es", "zh"])[
        np.random.default_rng(81).integers(0, 5, N_DOC)]
    tbl = pa.table({
        "doc_id": pa.array(np.arange(N_DOC), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(np.char.add("src", src.astype(str)), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())})
    pq.write_table(tbl, f"{out}/documents.parquet")


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or ENTRIES
    for mode in ("uniform", "zipf"):
        out = f"{REPO}/target/skew/{mode}"
        build(out, skew=(mode == "zipf"))
        print(f"[skew] {mode}: corpus at {out}", flush=True)
    for mode in ("uniform", "zipf"):
        out = f"{REPO}/target/skew/{mode}"
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=out)
        r = subprocess.run(
            [f"{REPO}/tools/run_main.sh", "graft.AB", str(iters)] + names,
            cwd=REPO, env=env, capture_output=True, text=True)
        for l in r.stdout.splitlines():
            if l.startswith("AB-SUMMARY"):
                print(f"[skew] {mode} {l}", flush=True)
        if r.returncode != 0:
            tail = (r.stdout + r.stderr).splitlines()[-12:]
            print(f"[skew] {mode} AB FAILED:\n" + "\n".join(tail))
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
