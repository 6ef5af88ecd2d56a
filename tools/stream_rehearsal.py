#!/usr/bin/env python3
"""Multi-micro-batch streaming rehearsal (round-9 verdict ask #4).

Structured Streaming's drained==batch invariant for append-mode /
watermarked queries only holds when arrival order respects the
watermark: a k-batch drain over files that each span the WHOLE time
range marks ~everything older than (running max ts - delay) late and
drops it — correct engine semantics, observed at sf1 as a ~40% row
loss on the five append/watermark entries (complete-mode aggregations
are immune; the watermark never filters input there).

A real large-scale ingest lands files in roughly time order, so the
faithful rehearsal is: re-lay events.parquet TIME-ORDERED into k files
(ascending file names AND ascending mtimes — FileStreamSource orders
by modification time, path as tiebreak), build a rehearsal corpus dir
whose other tables symlink the originals, then run graft.Verify with
GRAFT_STREAM_MAX_FILES=1 so AvailableNow drains one file per
micro-batch, and check_local the streaming entries against the same
rehearsal dir. Cross-batch watermark advancement is then genuinely
exercised (k batches, monotone event time) and every entry must equal
its batch oracle EXACTLY — any miss is a real state/watermark bug.

Usage:
    python3 tools/stream_rehearsal.py <sfDir> [k_files] [--unordered]
Builds target/stream_rehearsal/<basename>/ and prints the Verify +
check commands' results. Exit 0 iff all 12 streaming entries are OK.

--unordered deliberately VIOLATES the contract (round-robin split: every
file spans the whole time range) to prove the failure mode is loud, not
silent: the four watermark/append entries now carry a late-drop observer
(EventsStream.assertNoWatermarkDrops) that fails the drain with the
exact drop count when files arrive out of time order. In this mode the
tool reports each observer message and exits 0 iff ALL four guarded
entries raised it (and none returned short counts quietly).

Dev-only tool (driver-side python); not part of the shipped library.
"""
import glob
import os
import shutil
import subprocess
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENTRIES = ("stream_hourly_agg stream_sliding_agg stream_chained_agg "
           "stream_dedup_counts stream_sessionize stream_running_max "
           "stream_incremental_daily stream_enrich_join "
           "stream_interval_join stream_interval_left_join "
           "stream_upsert_merge stream_embedding_drift").split()

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]


# the entries guarded by EventsStream.assertNoWatermarkDrops — the ones
# the sf1 rehearsal measured losing ~40% of rows on unordered arrival
GUARDED = ["stream_chained_agg", "stream_dedup_counts",
           "stream_interval_join", "stream_interval_left_join"]


def main() -> int:
    unordered = "--unordered" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--unordered"]
    sf_dir = os.path.abspath(args[0])
    k = int(args[1]) if len(args) > 1 else 8
    name = os.path.basename(sf_dir.rstrip("/")) + \
        ("_unordered" if unordered else "")
    rdir = f"{REPO}/target/stream_rehearsal/{name}"
    shutil.rmtree(rdir, ignore_errors=True)
    os.makedirs(rdir)
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        if os.path.exists(src):
            os.symlink(src, f"{rdir}/{t}.parquet")
    # time-ordered k-file re-layout of events, physical schema preserved
    # (the TIMESTAMP(NANOS) vs (MICROS) probe in EventsStream depends on
    # the footer type, so the writer must not coerce)
    src = f"{sf_dir}/events.parquet"
    paths = sorted(glob.glob(f"{src}/*.parquet")) if os.path.isdir(src) \
        else [src]
    tbl = pa.concat_tables([pq.read_table(p) for p in paths])
    tbl = tbl.sort_by("ts")
    out = f"{rdir}/events.parquet"
    os.makedirs(out)
    n = tbl.num_rows
    t0 = time.time() - 3600
    if unordered:
        # round-robin: every file spans the whole time range, so from
        # file 2 on, ~everything is late vs the advanced watermark
        import pyarrow.compute as _pc
        idx = pa.array([i % k for i in range(n)])
        for i in range(k):
            chunk = tbl.filter(_pc.equal(idx, i))
            if not chunk.num_rows:
                continue
            p = f"{out}/part-{i:05d}.parquet"
            pq.write_table(chunk, p)
            os.utime(p, (t0 + i, t0 + i))
        print(f"[rehearsal] {n} events -> {k} UNORDERED (round-robin) "
              f"files in {out}", flush=True)
    else:
        step = (n + k - 1) // k
        for i in range(k):
            chunk = tbl.slice(i * step, step)
            if not chunk.num_rows:
                continue
            p = f"{out}/part-{i:05d}.parquet"
            pq.write_table(chunk, p)
            os.utime(p, (t0 + i, t0 + i))  # ascending mtimes = arrival order
        print(f"[rehearsal] {n} events -> {k} time-ordered files in {out}",
              flush=True)
    vdir = f"{REPO}/target/stream_rehearsal/verify_{name}"
    shutil.rmtree(vdir, ignore_errors=True)
    env = dict(os.environ, GRAFT_STREAM_MAX_FILES="1")
    entries = GUARDED if unordered else ENTRIES
    r = subprocess.run(
        ["sbt", "-batch",
         "runMain graft.Verify %s %s %s" % (rdir, vdir, " ".join(entries))],
        cwd=REPO, env=env, capture_output=True, text=True)
    # Verify prints per-entry failures on STDERR — scan both streams
    vlines = r.stdout.splitlines() + r.stderr.splitlines()
    for l in vlines:
        if "[verify]" in l:
            print(f"[rehearsal] {l}", flush=True)
    if unordered:
        # the observer's message carries the drop count; Verify prints it
        # per entry as "[verify] <name> failed: ..." — all four guarded
        # entries must raise it (a quiet short-count return is the bug)
        raised = {e for e in GUARDED
                  for l in vlines
                  if f"[verify] {e} failed" in l
                  and "dropped" in l and "watermark" in l}
        for e in sorted(raised):
            print(f"[rehearsal] observer fired for {e}", flush=True)
        quiet = [e for e in GUARDED if e not in raised]
        for e in quiet:
            print(f"[rehearsal] QUIET LOSS: {e} did not raise the "
                  "late-drop observer on unordered input", flush=True)
        print(f"[rehearsal] unordered mode: {len(raised)}/{len(GUARDED)} "
              f"observers fired")
        return 0 if not quiet else 1
    chk = subprocess.run(
        [sys.executable, f"{REPO}/tools/check_local.py", rdir, vdir],
        cwd=REPO, capture_output=True, text=True)
    bad = []
    for l in chk.stdout.splitlines():
        if l.startswith("stream_"):
            print(f"[rehearsal] {l}", flush=True)
            if " OK" not in l:
                bad.append(l)
    missing = [e for e in ENTRIES
               if not os.path.isdir(f"{vdir}/{e}")]
    for m in missing:
        print(f"[rehearsal] MISSING dump: {m}", flush=True)
    ok = not bad and not missing
    print(f"[rehearsal] {'ALL OK' if ok else 'FAILURES'} "
          f"({len(ENTRIES) - len(bad) - len(missing)}/{len(ENTRIES)})")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
