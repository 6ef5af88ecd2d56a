#!/usr/bin/env python3
"""Timing-scaling exponents for the heavy tail (round-11 verdict ask
#6): the scale matrix proves CORRECTNESS at sf0.001→3; this pins the
COST curve. For every entry in the >1.0 s bench tail, run graft.AB
(interleaved min-of-N, the only trustworthy per-query instrument) at
sf0.1 / sf0.3 / sf1 / sf3 (relative data scales 1/3/10/30 — ScaleUp
corpora are faithful k× copies), then fit a per-entry log-log slope:

    t(scale) ≈ c · scale^alpha   →   alpha = slope of ln t vs ln scale

alpha ≈ 1 is linear (healthy: scan/shuffle/band-join dominated);
alpha < 1 means fixed overhead still dominates at these scales;
alpha materially > 1 is the early-warning signal a 100× scale-up
punishes. Two fits are reported: full 4-point OLS and the tail slope
from the two largest scales (sf1→sf3) — the latter is what
extrapolates. Entries whose DOCUMENTED shape is super-linear (CC
label-propagation rounds grow ~log n; window sorts n·log n) are
annotated rather than flagged. Per-scale AB JSONs are resumable: an
existing target/scaling/ab_<tag>.json is reused unless --fresh.

Usage: python3 tools/scaling_exponents.py [--fresh] [iters] [name ...]
Writes target/scaling/scaling_exponents.json and prints a PLANS.md
table. Dev-only tool (driver-side python); not part of the library.
"""
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = [("sf0.1", "/root/testdata/sf0.1", 1.0),
          ("sf0.3", f"{REPO}/target/scale/sf0.3", 3.0),
          ("sf1", f"{REPO}/target/scale/sf1", 10.0),
          ("sf3", f"{REPO}/target/scale/sf3", 30.0)]

# documented super-linear shapes (PLANS.md plan audits): expected
# exponent ceilings above which even the documented shape is violated
DOCUMENTED = {
    # connected-components label propagation: rounds ~ log(diameter),
    # each round a shuffle — expect alpha ~1.0-1.3
    "ext_dedup_clusters": 1.35, "ext_embed_clusters": 1.35,
    "ext_keep_best": 1.35, "ext_incremental_dedup": 1.35,
    # degree-oriented triangle counting: O(E^1.5) worst case on a
    # densifying graph — expect up to ~1.5
    "ext_triangle_count": 1.6,
    # band-bounded pair generation: pairs grow ~quadratically INSIDE a
    # band as dup density rises with corpus size on ScaleUp copies
    # (planted families are duplicated k×, so family size grows k×,
    # pairs k²) — expect up to ~2 BY CORPUS CONSTRUCTION, with banding
    # still bounding the blowup
    "ext_hamming_hist": 2.1, "ext_minhash_dedup": 2.1,
    "ext_semdedup": 2.1, "ext_dedup_pipeline": 2.1,
    # exact mutual-kNN: the block-pair grid is Θ(N²) BY CONSTRUCTION
    # (oracle-mandated exactness — the documented 100 TB swap is
    # ext_knn_ann_clusters); plus CC log-rounds
    "ext_knn_mutual_clusters": 2.2,
    # ANN mutual-kNN: scale-adaptive IVF multiprobe — assignment N·S and
    # candidates ≈ 2·N²/S with S ≈ √N, i.e. Θ(N^1.5); the measured
    # contrast against the exact entry's quadratic slope IS the 100 TB
    # argument (round 14)
    "ext_knn_ann_clusters": 1.7,
}
DEFAULT_CEILING = 1.3    # anything else: linear-ish or gets flagged


def run_ab(tag, sf_dir, names, iters):
    out = f"{REPO}/target/scaling/ab_{tag}.json"
    if os.path.exists(out) and "--fresh" not in sys.argv:
        cached = json.load(open(out))
        missing = [n for n in names if n not in cached.get("queries", {})]
        if not missing:
            print(f"[scaling] {tag}: reusing {out}", flush=True)
            return cached
        # incremental cohort growth (round-13 verdict ask #2): AB only
        # the entries the cached artifact lacks and merge them in, so a
        # new entry gets its cost curve without re-timing the whole
        # cohort. Cross-session box speed is handled downstream — the
        # fit normalizes per-entry times by each SESSION's calibration,
        # and the merged artifact keeps a per-entry calibration override
        # so entries timed in different sessions normalize by their own.
        print(f"[scaling] {tag}: extending cache with {missing}",
              flush=True)
        part = f"{REPO}/target/scaling/ab_{tag}_add.json"
        if os.path.exists(part):
            os.remove(part)
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_AB_OUT=part, SPARK_GRAFT_CPUS="32",
                   SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM",
                                                   "24g"))
        r = subprocess.run(
            [f"{REPO}/tools/run_main.sh", "graft.AB", str(iters)] + missing,
            cwd=REPO, env=env, capture_output=True, text=True)
        if not os.path.exists(part):
            sys.exit(f"[scaling] {tag}: incremental AB failed\n"
                     + r.stdout[-2000:] + r.stderr[-2000:])
        add = json.load(open(part))
        for n, v in add["queries"].items():
            cached["queries"][n] = v
            cached.setdefault("calibration_overrides", {})[n] = \
                add.get("calibration_sec")
        with open(out, "w") as f:
            json.dump(cached, f, indent=1)
        return cached
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_AB_OUT=out, SPARK_GRAFT_CPUS="32",
               SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "24g"))
    print(f"[scaling] {tag}: AB x{iters} over {len(names)} entries",
          flush=True)
    r = subprocess.run(
        [f"{REPO}/tools/run_main.sh", "graft.AB", str(iters)] + names,
        cwd=REPO, env=env, capture_output=True, text=True)
    if not os.path.exists(out):
        sys.exit(f"[scaling] {tag}: AB failed\n" + r.stdout[-2000:]
                 + r.stderr[-2000:])
    return json.load(open(out))


def ols_slope(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def main():
    args = [a for a in sys.argv[1:] if a != "--fresh"]
    iters = int(args[0]) if args and args[0].isdigit() else 2
    names = args[1:] if args and args[0].isdigit() else args
    if not names:
        bench = json.load(open(f"{REPO}/target/bench_full.json"))
        names = sorted(n for n, t in bench["queries"].items()
                       if t >= 1.0 and not n.startswith("stream_"))
    os.makedirs(f"{REPO}/target/scaling", exist_ok=True)
    for tag, d, _ in SCALES:
        if not os.path.isdir(d):
            sys.exit(f"[scaling] missing corpus {d} — run graft.ScaleUp")
    abs_ = {tag: run_ab(tag, d, names, iters) for tag, d, _ in SCALES}
    cal = {tag: abs_[tag].get("calibration_sec") for tag, _, _ in SCALES}
    # Calibration-normalize each scale's times before fitting: the four
    # scales run in four JVM sessions, and session-level box speed
    # swings ±10-25% on this box (measured; see bench-box-variance).
    # Each session's interleaved-median calibration_sec measures exactly
    # that swing, so t' = t * cal_ref/cal_session divides it out — a
    # slow sf1 session can no longer flatten (or a fast sf3 session
    # flatter) the tail slope. cal_ref is the median across sessions.
    cals = sorted(v for v in cal.values() if v)
    cal_ref = cals[len(cals) // 2] if cals else None

    def norm(tag, n):
        # entries merged in from a later session normalize by THAT
        # session's calibration (calibration_overrides), not the
        # original run's — otherwise a box-speed delta between the two
        # sessions would masquerade as slope
        c = (abs_[tag].get("calibration_overrides", {}).get(n)
             or cal.get(tag))
        return cal_ref / c if (c and cal_ref) else 1.0
    rows = []
    for n in names:
        pts = []
        for tag, _, scale in SCALES:
            t = abs_[tag]["queries"].get(n, {}).get("min")
            if t and t > 0:
                pts.append((scale, t * norm(tag, n)))
        if len(pts) < 3:
            rows.append({"entry": n, "error": "insufficient points"})
            continue
        xs = [math.log(s) for s, _ in pts]
        ys = [math.log(t) for _, t in pts]
        alpha_full = ols_slope(xs, ys)
        (s1, t1), (s2, t2) = pts[-2], pts[-1]
        alpha_tail = math.log(t2 / t1) / math.log(s2 / s1)
        ceiling = DOCUMENTED.get(n, DEFAULT_CEILING)
        rows.append({
            "entry": n, "alpha_full": round(alpha_full, 3),
            "alpha_tail": round(alpha_tail, 3),
            "ceiling": ceiling,
            "documented_superlinear": n in DOCUMENTED,
            "flag": alpha_tail > ceiling,
            "times": {tag: abs_[tag]["queries"].get(n, {}).get("min")
                      for tag, _, _ in SCALES}})
    flagged = [r for r in rows if r.get("flag")]
    out = {"iters": iters, "calibration_sec": cal,
           "calibration_ref_sec": cal_ref,
           "note": "alphas fit on calibration-normalized times "
                   "(t * cal_ref/cal_session); per-row 'times' are raw",
           "rows": rows,
           "flagged": [r["entry"] for r in flagged]}
    with open(f"{REPO}/target/scaling/scaling_exponents.json", "w") as f:
        json.dump(out, f, indent=1)
    print("\n| entry | sf0.1 | sf0.3 | sf1 | sf3 | α(full) | α(sf1→3) "
          "| ceiling | flag |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in sorted(rows, key=lambda r: -r.get("alpha_tail", 9)):
        if "error" in r:
            print(f"| {r['entry']} | {r['error']} |")
            continue
        t = r["times"]
        print(f"| {r['entry']} | " +
              " | ".join(f"{t.get(tag) or float('nan'):.2f}"
                         for tag, _, _ in SCALES) +
              f" | {r['alpha_full']} | {r['alpha_tail']} | "
              f"{r['ceiling']}"
              f"{' (doc)' if r['documented_superlinear'] else ''} | "
              f"{'FLAG' if r['flag'] else 'ok'} |")
    print(f"\n[scaling] {len(rows)} entries, {len(flagged)} flagged")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
