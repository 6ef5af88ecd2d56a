#!/usr/bin/env python3
"""Config-robustness matrix (round-10 verdict ask #3): the full contract
must be green under OTHER Spark configurations than the one blessed
default — a plan that is only accidentally correct under one config
(codegen'd path, AQE re-planning, one shuffle-partition count) is a
latent 100 TB incident, because a real cluster differs in all three.

Cells (each = full graft.Verify at the gate scale + check_local.py):
  codegen_off   wholeStage codegen AND expression codegen disabled —
                the interpreted evaluator is a genuinely different
                execution engine for the custom Catalyst expressions
                (FloatVecDot, MaskAndCount, SortedIntersectCount,
                CdcBoundaries), whose eval() path the default config
                never runs at bench scale
  aqe_off       adaptive execution off — static shuffle planning,
                no runtime coalesce/skew-split/replan
  shuffle7      spark.sql.shuffle.partitions=7 (odd, smaller than the
                default 4-cpu count is not possible; 7 forces uneven
                key->partition regrouping vs the blessed 4)
  shuffle2048   spark.sql.shuffle.partitions=2048 (the 100 TB-ish
                setting: most partitions EMPTY at gate scale — empty-
                partition handling, per-partition init paths)

State is per-cell resumable in the state JSON; a cell is re-run only if
not already OK. Usage:
    python3 tools/config_matrix.py [sfDir] [state.json]

Dev-only tool (driver-side python); not part of the shipped library.
"""
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Multi-JVM cell (round-11 verdict ask #1): everything before round 12
# ran in ONE JVM — local[*] shares the driver heap with all "executors",
# so broadcast variables were never serialized across a process
# boundary, shuffle blocks were never fetched over a transport, and the
# five custom Catalyst expressions were never classloaded by a remote
# executor. local-cluster[2,2,mem] spawns true separate executor JVMs
# (standalone Worker forks them), which is exactly what a 1000-executor
# 100 TB cluster does millions of times per stage. The library jar rides
# in via spark.jars + executor extraClassPath; executor JVMs need the
# same JDK17 add-opens the driver gets from run_main.sh; the Worker's
# command builder needs SPARK_SCALA_VERSION to resolve its classpath in
# a release distro.
_ADD_OPENS = " ".join(
    f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in [
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
        "sun.security.action", "sun.util.calendar"])
_JAR = (f"{REPO}/target/scala-2.13/"
        "transitdatapipelinespark_2.13-0.1.0.jar")

CELLS = {
    "codegen_off": {"conf": ("spark.sql.codegen.wholeStage=false;"
                             "spark.sql.codegen.factoryMode=NO_CODEGEN")},
    "aqe_off": {"conf": "spark.sql.adaptive.enabled=false"},
    "shuffle7": {"conf": "spark.sql.shuffle.partitions=7"},
    "shuffle2048": {"conf": "spark.sql.shuffle.partitions=2048"},
    # Spill rehearsal (verdict ask #2): deterministic force-spill
    # thresholds push every sort / window buffer / sort-merge-join
    # buffer / hash-agg fallback through the external-spill machinery
    # (UnsafeExternalSorter, ExternalAppendOnlyUnsafeRowArray,
    # sort-based agg fallback) that ample local[32] memory never
    # exercises. SPARK_GRAFT_ASSERT_SPILL=1 makes graft.Verify FAIL
    # unless task metrics show real spill bytes — the rehearsal proves
    # the hashes were produced THROUGH the spill path, not around it.
    # Threshold choice (round-11 finding): 32-row thresholds spill a
    # 10k-row window partition into ~300 files, and the merge's
    # per-file 1 MB read-ahead buffers OOM an 8 GB driver heap
    # (join_asof_forward died, taking the context with it). 2000-row
    # thresholds + read-ahead off still spill ~4.3 GB across the
    # contract (sorts, windows, SMJ buffers, hash-agg fallback) with
    # single-digit files per merge.
    "spill": {
        "conf": ("spark.shuffle.spill.numElementsForceSpillThreshold=2000;"
                 "spark.sql.windowExec.buffer.in.memory.threshold=2000;"
                 "spark.sql.windowExec.buffer.spill.threshold=2000;"
                 "spark.sql.sortMergeJoinExec.buffer.in.memory.threshold=2000;"
                 "spark.sql.sortMergeJoinExec.buffer.spill.threshold=2000;"
                 "spark.sql.objectHashAggregate.sortBased.fallbackThreshold=128;"
                 "spark.unsafe.sorter.spill.read.ahead.enabled=false"),
        "env": {"SPARK_GRAFT_ASSERT_SPILL": "1"},
        "expect_spill": True,
    },
    # Streaming multi-micro-batch cell (round-13 verdict ask #6): the
    # 12 stream_* entries re-certify per round like the batch cells do —
    # tools/stream_rehearsal.py re-lays events TIME-ORDERED into k
    # files, drains 1 file per micro-batch (real incremental state,
    # watermark advancement, per-batch sink commits), and requires every
    # streaming entry to equal its batch oracle exactly, with the
    # watermark-drop observers armed. Different runner, same gate
    # semantics: exit 0 iff 12/12 OK.
    "streaming": {
        "cmd": [sys.executable, "tools/stream_rehearsal.py", "{sf_dir}"],
    },
    "local_cluster": {
        "conf": (f"spark.jars={_JAR};"
                 f"spark.executor.extraClassPath={_JAR};"
                 "spark.executor.memory=6g;"
                 f"spark.executor.extraJavaOptions={_ADD_OPENS}"),
        # SPARK_HOME shim: the standalone Worker hardcodes its work dir
        # to $SPARK_HOME/work (LocalSparkCluster passes a null workDir
        # and no conf overrides it) — pointing SPARK_HOME at a symlink
        # shim inside the repo keeps executor logs/app dirs out of the
        # read-only /opt/spark distro. tools/spark_home_shim.sh builds it.
        "env": {"SPARK_GRAFT_MASTER": "local-cluster[2,2,8192]",
                "SPARK_SCALA_VERSION": "2.13",
                "SPARK_HOME": f"{REPO}/target/spark_home_shim"},
        # the executors classload from the PACKAGED jar, not the classes
        # dir — repackage so the cell always certifies current code
        "pre": ["bash", "-c",
                "tools/spark_home_shim.sh && sbt -batch package"],
    },
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    state_path = sys.argv[2] if len(sys.argv) > 2 else \
        f"{REPO}/target/config_matrix_state.json"
    # optional cell filter (comma list) for targeted dev runs; the
    # round-closing sweep runs with no filter so every cell re-certifies
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    cells = {k: v for k, v in CELLS.items() if only is None or k in only}
    state = {}
    if os.path.exists(state_path):
        state = json.load(open(state_path))

    def save():
        tmp = state_path + ".tmp"
        json.dump(state, open(tmp, "w"), indent=1, sort_keys=True)
        os.replace(tmp, state_path)

    for cell, spec in cells.items():
        if str(state.get(cell, {}).get("status", "")) == "OK":
            print(f"[matrix] {cell}: already OK, skipping", flush=True)
            continue
        # command cells (streaming rehearsal): own runner, same gate
        # semantics — OK iff exit 0; record the summary tail either way
        if "cmd" in spec:
            cmd = [a.replace("{sf_dir}", sf_dir) for a in spec["cmd"]]
            t0 = time.time()
            print(f"[matrix] {cell}: {' '.join(cmd[1:])}", flush=True)
            rr = subprocess.run(cmd, cwd=REPO, capture_output=True,
                                text=True)
            tail = (rr.stdout + rr.stderr).strip().splitlines()[-12:]
            state[cell] = {
                "status": "OK" if rr.returncode == 0 else "FAIL",
                "cmd": " ".join(cmd[1:]),
                "summary": tail[-1] if tail else "",
                "output_tail": tail,
                "verify_sec": round(time.time() - t0, 1),
            }
            save()
            print(f"[matrix] {cell}: {state[cell]['status']} "
                  f"({state[cell]['verify_sec']:.0f}s) "
                  f"{state[cell]['summary']}", flush=True)
            continue
        conf = spec["conf"]
        out = f"{REPO}/target/matrix/{cell}"
        subprocess.run(["rm", "-rf", out])
        if "pre" in spec:
            pr = subprocess.run(spec["pre"], cwd=REPO,
                                capture_output=True, text=True)
            if pr.returncode != 0:
                state[cell] = {"status": "FAIL", "conf": conf,
                               "pre_error": pr.stdout[-500:]}
                save()
                print(f"[matrix] {cell}: FAIL pre-step {spec['pre']}",
                      flush=True)
                continue
        env = dict(os.environ, SPARK_GRAFT_EXTRA_CONF=conf,
                   **spec.get("env", {}))
        t0 = time.time()
        print(f"[matrix] {cell}: verify ({conf})", flush=True)
        rv = subprocess.run(
            [f"{REPO}/tools/run_main.sh", "graft.Verify", sf_dir, out],
            cwd=REPO, env=env, capture_output=True, text=True)
        t_verify = time.time() - t0
        allout = (rv.stdout + rv.stderr).splitlines()
        spill_line = next((l.strip() for l in allout
                           if "[verify] SPILL" in l), "")
        verr = [l for l in allout
                if "[verify]" in l and "SPILL mem=" not in l
                and "DRIVER_PEAK" not in l]  # the r13 memory gauge line
                                             # is telemetry, not an error
        if spec.get("expect_spill") and rv.returncode != 0:
            verr.append(f"spill-assert exit {rv.returncode}: {spill_line}")
        t1 = time.time()
        rc = subprocess.run(
            [sys.executable, f"{REPO}/tools/check_local.py", sf_dir, out],
            cwd=REPO, capture_output=True, text=True)
        t_check = time.time() - t1
        summary = next((l for l in rc.stdout.splitlines()
                        if l.startswith("==") and "oracle-checked" in l), "")
        bad = [l for l in rc.stdout.splitlines()
               if l and "OK" not in l and not l.startswith(("==", "--"))]
        m = re.search(r"== (\d+)/(\d+) oracle-checked OK", summary)
        ok = bool(m) and m.group(1) == m.group(2) and not verr
        state[cell] = {
            "status": "OK" if ok else "FAIL",
            "conf": conf,
            "summary": summary,
            "spill": spill_line,
            "verify_errors": verr[:20],
            "check_failures": bad[:40],
            "verify_sec": round(t_verify, 1),
            "check_sec": round(t_check, 1),
        }
        save()
        print(f"[matrix] {cell}: {state[cell]['status']} {summary} "
              f"(verify {t_verify:.0f}s, check {t_check:.0f}s)", flush=True)
        for l in (verr + bad)[:20]:
            print(f"[matrix] {cell} FINDING: {l}", flush=True)
    n_ok = sum(1 for c in cells if state.get(c, {}).get("status") == "OK")
    print(f"[matrix] {n_ok}/{len(cells)} cells OK")
    return 0 if n_ok == len(cells) else 1


if __name__ == "__main__":
    sys.exit(main())
