#!/usr/bin/env python3
"""Stamp-filtered analysis of graft Bench full records (SURVEY §6 r15).

The round-14 per-rep diagnostics exist to separate two inflation
mechanisms no blind min-of-reps can tell apart on this box:

  * HOST BURSTS — a co-tenant CPU burst with zero guest-visible steal
    inflates a whole rep window. Signature: the rep's mini-calibration
    stamp (a fixed ~45 ms pure-CPU reference run right after the rep)
    is itself inflated. Such a rep is an invalid measurement of the
    engine and is DISCARDED here.
  * JVM CODE STATE — a JIT recompile storm charges C2 compile time to
    the rep. Signature: a quiet stamp but seconds of rep_jit_secs.
    Such a rep is a valid wall measurement that carries attributed
    JIT cost; reported, not discarded.

Usage:
  stamp_filter.py A.json [B.json ...]      # min-merge across records
  stamp_filter.py --cap 0.09 A.json ...    # explicit stamp cutoff

Per query, over every rep of every record: the raw min, the
stamp-filtered min (reps whose stamp exceeds the cap are dropped; if
every rep is tainted the raw min is kept and the row is flagged), the
JIT seconds riding the filtered-min rep, and the taint census. The cap
defaults to max(2 x median stamp across the record set, 0.09 s) -- the
quiet-box stamp is ~0.045 s, so 0.09 is "twice quiet".
"""
import json
import statistics
import sys


def main(argv):
    args = list(argv[1:])
    cap_arg = None
    if args and args[0] == "--cap":
        cap_arg = float(args[1])
        args = args[2:]
    if not args:
        sys.exit(__doc__)
    recs = [json.load(open(p)) for p in args]

    stamps = [s
              for rec in recs
              for q in rec["diag"].values()
              for s in q.get("rep_calib_secs", []) if s > 0]
    base = statistics.median(stamps) if stamps else 0.0
    cap = cap_arg if cap_arg is not None else max(2 * base, 0.09)

    names = sorted(set(n for rec in recs for n in rec["diag"]))
    rows = {}
    n_unstamped = 0  # fallback reps with no stamp: they always pass the
    #                  cap, so the census must say how many there were
    for name in names:
        reps = []  # (sec, stamp, jit) across every record
        for rec in recs:
            d = rec["diag"].get(name)
            if d is None or "rep_secs" not in d:
                # pre-stamp record (the per-rep arrays landed late in
                # r14): fall back to the reported min as one un-stamped
                # rep so old records can still min-merge
                v = rec.get("queries", {}).get(name)
                if v is not None and v >= 0:
                    reps.append((v, 0.0, 0.0))
                    n_unstamped += 1
                continue
            if "rep_calib_secs" not in d:
                # census the un-stamped reps that actually enter the
                # merge: failed reps (-1 sentinels) are dropped below
                # and must not inflate this line
                n_unstamped += sum(1 for s in d["rep_secs"] if s >= 0)
            secs = d["rep_secs"]
            cal = d.get("rep_calib_secs", [0.0] * len(secs))
            jit = d.get("rep_jit_secs", [0.0] * len(secs))
            # a malformed record must fail loudly, not silently: zip()
            # would truncate reps on a short array, and a short stamp
            # array would let the lost reps dodge the filter entirely
            if len(cal) != len(secs) or len(jit) != len(secs):
                sys.exit(f"{name}: per-rep arrays disagree in length "
                         f"(rep_secs={len(secs)}, rep_calib_secs={len(cal)}, "
                         f"rep_jit_secs={len(jit)}) — malformed record, refusing")
            reps += [(s, c, j) for s, c, j in zip(secs, cal, jit) if s >= 0]
        if not reps:
            rows[name] = {"min_raw": -1.0, "min_filtered": -1.0,
                          "reps": 0, "reps_kept": 0, "all_tainted": False,
                          "jit_sec_of_min": 0.0}
            continue
        kept = [r for r in reps if r[1] <= cap]
        raw = min(reps)[0]
        tainted = not kept
        pick = min(kept) if kept else min(reps)
        rows[name] = {"min_raw": round(raw, 3),
                      "min_filtered": round(pick[0], 3),
                      "reps": len(reps), "reps_kept": len(kept),
                      "all_tainted": tainted,
                      "jit_sec_of_min": round(pick[2], 3)}

    total_raw = sum(r["min_raw"] for r in rows.values() if r["min_raw"] >= 0)
    total_filt = sum(r["min_filtered"] for r in rows.values()
                     if r["min_filtered"] >= 0)
    n_tainted_reps = sum(r["reps"] - r["reps_kept"] for r in rows.values())
    n_reps = sum(r["reps"] for r in rows.values())
    flagged = [n for n, r in rows.items() if r["all_tainted"]]

    hdr = (f"stamp base (median) {base:.3f} s, cap {cap:.3f} s; "
           f"{n_tainted_reps}/{n_reps} reps discarded as burst-stamped; "
           f"{n_unstamped} un-stamped fallback reps (always pass the cap); "
           f"{len(flagged)} rows all-tainted (raw min kept): {flagged}")
    print(hdr, file=sys.stderr)
    for name in names:
        r = rows[name]
        mark = " TAINTED" if r["all_tainted"] else ""
        delta = r["min_raw"] - r["min_filtered"]
        note = f" (raw {r['min_raw']:.3f}, burst dodged {-delta:.3f})" \
            if delta < -1e-9 else ""
        jit = f" jit={r['jit_sec_of_min']:.2f}s" \
            if r["jit_sec_of_min"] > 0.5 else ""
        print(f"{name:32s} {r['min_filtered']:8.3f}"
              f" [{r['reps_kept']}/{r['reps']}]{jit}{note}{mark}",
              file=sys.stderr)
    print(f"{'TOTAL (filtered)':32s} {total_filt:8.3f}   raw {total_raw:.3f}",
          file=sys.stderr)
    print(json.dumps({"stamp_base": round(base, 4), "stamp_cap": round(cap, 4),
                      "records": args, "n_reps": n_reps,
                      "n_reps_discarded": n_tainted_reps,
                      "n_reps_unstamped": n_unstamped,
                      "rows_all_tainted": flagged,
                      "total_raw": round(total_raw, 3),
                      "total_filtered": round(total_filt, 3),
                      "queries": rows}))


if __name__ == "__main__":
    main(sys.argv)
