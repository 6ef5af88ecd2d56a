#!/usr/bin/env python3
"""Price multi-JVM execution (round-12 verdict ask #5).

The local_cluster correctness cell proved the contract survives real
process boundaries; this tool prices them. It ABs the bench tail under
local[32] and under local-cluster[2,16,16384] (two real executor JVMs,
32 total cores — SAME core count, so the per-entry ratio isolates the
cost of crossing process boundaries: broadcast ship, shuffle transport
through the block-transfer service, task-result serialization) and
compares per-entry calibration-normalized ratios against the cohort
median. An entry whose ratio is an outlier vs the cohort is hiding
driver-adjacent work or an oversized broadcast — exactly what a real
1000-executor cluster exposes and local[32] never can.

Both runs use the interleaved-median calibration probe; the probe
itself runs ON the cluster's executors, so the normalization removes
any residual box-speed difference between the two sessions, not the
multi-JVM tax (which is the signal).

Usage: tools/lc_bench.py [iters] [name ...]
  default entries: the BENCH_AB_r12.json tail (the >=1.0 s cohort).
Writes target/lc_bench.json. Exit 0 always — outliers are findings to
attribute in PLANS.md, not gate failures.
"""
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ADD_OPENS = " ".join(
    f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in [
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar"])
JAR = (f"{REPO}/target/scala-2.13/"
       "transitdatapipelinespark_2.13-0.1.0.jar")


def default_names():
    d = json.load(open(os.path.join(REPO, "BENCH_AB_r12.json")))
    return sorted(d["queries"].keys())


def run_ab(tag, names, iters, extra_env):
    out = os.path.join(REPO, "target", "lc_bench", f"{tag}.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    log = out.replace(".json", ".log")
    env = dict(os.environ)
    env.update({"SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
                "SPARK_GRAFT_CPUS": "32",
                "SPARK_GRAFT_AB_OUT": out,
                "SPARK_DRIVER_MEM": "12g"})
    env.update(extra_env)
    print(f"[lc] AB x{iters} under {tag} over {len(names)} entries ...",
          flush=True)
    with open(log, "w") as lf:
        rc = subprocess.call(
            [f"{REPO}/tools/run_main.sh", "graft.AB", str(iters)] + names,
            stdout=lf, stderr=subprocess.STDOUT, env=env, cwd=REPO)
    if rc != 0:
        print(f"[lc] {tag} AB FAILED rc={rc} — see {log}")
        sys.exit(2)
    return json.load(open(out))


def main():
    args = sys.argv[1:]
    iters = int(args[0]) if args and args[0].isdigit() else 3
    names = args[1:] if len(args) > 1 else default_names()
    # fresh shim + packaged jar: executors classload from the jar, and a
    # stale jar would price OLD code
    subprocess.check_call(
        ["bash", "-c", "tools/spark_home_shim.sh && sbt -batch package"],
        cwd=REPO, stdout=subprocess.DEVNULL)
    local = run_ab("local32", names, iters, {})
    lc = run_ab("local_cluster", names, iters, {
        "SPARK_GRAFT_MASTER": "local-cluster[2,16,16384]",
        "SPARK_SCALA_VERSION": "2.13",
        "SPARK_HOME": f"{REPO}/target/spark_home_shim",
        "SPARK_GRAFT_EXTRA_CONF":
            (f"spark.jars={JAR};"
             f"spark.executor.extraClassPath={JAR};"
             "spark.executor.memory=12g;"
             f"spark.executor.extraJavaOptions={ADD_OPENS}"),
    })
    cal_ratio = lc["calibration_sec"] / local["calibration_sec"]
    rows = []
    for n in names:
        a = local["queries"].get(n, {}).get("min")
        b = lc["queries"].get(n, {}).get("min")
        # None/absent = missing entry; 0.0 would be a legitimate (if
        # sub-resolution) min and must not be silently dropped with it,
        # but it cannot divide — report it instead (round-13 ADVICE)
        if a is None or b is None:
            continue
        if a <= 0:
            print(f"[lc] {n}: local min {a} unusable for a ratio — "
                  "skipped (sub-timer-resolution)")
            continue
        rows.append({"entry": n, "local_sec": a, "lc_sec": b,
                     "ratio": round(b / a / cal_ratio, 3)})
    ratios = [r["ratio"] for r in rows]
    if not ratios:
        print("[lc] no entry has a usable min in BOTH artifacts — "
              "nothing to compare (wrong names? empty AB runs?)")
        return 2
    med = statistics.median(ratios)
    for r in rows:
        r["vs_cohort"] = round(r["ratio"] / med, 3)
        r["outlier"] = r["vs_cohort"] > 1.5 or r["vs_cohort"] < 0.5
    rows.sort(key=lambda r: -r["vs_cohort"])
    artifact = {
        "iters": iters,
        "local_calibration_sec": local["calibration_sec"],
        "lc_calibration_sec": lc["calibration_sec"],
        "calibration_ratio": round(cal_ratio, 4),
        "cohort_median_ratio": round(med, 3),
        "local_total_sec": round(sum(r["local_sec"] for r in rows), 2),
        "lc_total_sec": round(sum(r["lc_sec"] for r in rows), 2),
        "driver_peak": {
            "local": {k: local.get(k) for k in
                      ("driver_peak_heap_mb", "driver_rss_hwm_mb",
                       "driver_live_heap_mb")},
            "local_cluster": {k: lc.get(k) for k in
                              ("driver_peak_heap_mb", "driver_rss_hwm_mb",
                               "driver_live_heap_mb")}},
        "rows": rows,
    }
    dst = os.path.join(REPO, "target", "lc_bench.json")
    json.dump(artifact, open(dst, "w"), indent=1)
    print(f"[lc] calibration local={local['calibration_sec']} "
          f"lc={lc['calibration_sec']} (ratio {cal_ratio:.3f}); "
          f"cohort median multi-JVM ratio = {med:.3f}")
    print(f"[lc] totals: local {artifact['local_total_sec']} s -> "
          f"local-cluster {artifact['lc_total_sec']} s")
    for r in rows:
        flag = "  <-- OUTLIER" if r["outlier"] else ""
        print(f"[lc] {r['entry']:28s} {r['local_sec']:7.3f} -> "
              f"{r['lc_sec']:7.3f} s  x{r['ratio']:5.2f} "
              f"(vs cohort {r['vs_cohort']:4.2f}){flag}")
    print(f"[lc] wrote {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
