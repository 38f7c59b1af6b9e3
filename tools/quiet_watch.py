#!/usr/bin/env python3
"""Quiet-box watch: loop a load probe, fire the sf0.1 record pair
automatically when the box goes quiet (SURVEY section 6 -- the r13
sf0.1 record 58.3 s was taken at calib 0.079 and no later round got a
quiet window while anyone was watching; this watches for one).

Usage (from the repo root, with nothing else using sbt):

  nohup python3 tools/quiet_watch.py >> quiet_watch.log 2>&1 &

  --threshold S   fire when the min-of-3 calib probe <= S (default
                  0.075 -- "quiet" per the cross-round baselines:
                  quiet sweep calib is ~0.066-0.080 s)
  --interval S    seconds between probes (default 900)
  --max-hours H   give up after H hours (default 24)
  --sf-dir D      data dir for the record pair (default
                  /root/testdata/sf0.1)
  --once          one probe, report, exit (no firing)

Each probe runs graft.CalibProbe (the same warmed min-of-3 2^28
xxhash64 reference Bench brackets records with) and appends a line to
quiet_watch_probes.jsonl. On a quiet probe it fires TWO full Bench
runs back-to-back (the section-6 same-day pair contract; per-rep
stamp arrays land in the records), min-merges them through
stamp_filter.py, and exits. SPARK_GRAFT_ROUND=99 keeps the runs'
archive copies away from the driver's per-round bench_out_rNN files.

Serialize with other sbt use: sbt holds a project lock, so the watch
must be the only sbt client while it runs.
"""
import argparse
import datetime
import json
import subprocess
import sys
import time


def sbt(cmd, env_extra=None):
    import os
    env = dict(os.environ)
    env.update(env_extra or {})
    return subprocess.run(["sbt", "-batch", cmd], capture_output=True,
                          text=True, env=env)


def probe():
    r = sbt("runMain graft.CalibProbe")
    for ln in reversed(r.stdout.splitlines()):
        ln = ln.replace("[info]", "").strip()
        if ln.startswith('{"calib"'):
            return json.loads(ln)
    print(r.stdout[-2000:], file=sys.stderr)
    print(r.stderr[-2000:], file=sys.stderr)
    raise RuntimeError("CalibProbe produced no JSON line")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=0.075)
    ap.add_argument("--interval", type=float, default=900)
    ap.add_argument("--max-hours", type=float, default=24)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--once", action="store_true")
    a = ap.parse_args()

    deadline = time.time() + a.max_hours * 3600
    while True:
        t0 = time.time()
        p = probe()
        p["ts"] = datetime.datetime.now().isoformat(timespec="seconds")
        p["probe_wall_sec"] = round(time.time() - t0, 1)
        with open("quiet_watch_probes.jsonl", "a") as f:
            f.write(json.dumps(p) + "\n")
        quiet = p["calib"] <= a.threshold
        print(f"[quiet_watch] {p['ts']} calib={p['calib']:.4f} "
              f"loadavg={p['loadavg']} quiet={quiet}", flush=True)
        if a.once:
            return 0
        if quiet:
            stamp = datetime.datetime.now().strftime("%Y%m%dT%H%M")
            outs = []
            for run in (1, 2):
                out = f"bench_out_sf0.1_quiet_{stamp}_run{run}.json"
                print(f"[quiet_watch] firing sf0.1 run {run} -> {out}",
                      flush=True)
                r = sbt("runMain graft.Bench", {
                    "SPARK_GRAFT_SF_DIR": a.sf_dir,
                    "SPARK_GRAFT_BENCH_OUT": out,
                    "SPARK_GRAFT_ROUND": "99"})
                if r.returncode != 0:
                    print(r.stderr[-3000:], file=sys.stderr)
                    raise RuntimeError(f"bench run {run} failed")
                outs.append(out)
            subprocess.run([sys.executable, "tools/stamp_filter.py"] + outs)
            print(f"[quiet_watch] pair complete: {outs}", flush=True)
            return 0
        if time.time() > deadline:
            print("[quiet_watch] window never came; giving up", flush=True)
            return 1
        time.sleep(max(0.0, a.interval - (time.time() - t0)))


if __name__ == "__main__":
    sys.exit(main())
