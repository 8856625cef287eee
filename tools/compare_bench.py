#!/usr/bin/env python3
"""Host-normalized round-over-round bench comparison.

The per-round driver VM differs in clock/memory bandwidth, so raw per-query
deltas mislead (the same commit measured b03's loop anywhere from 19 s to
94 s across boxes). This tool divides every per-query ratio by the MEDIAN
ratio — the median absorbs the host factor, so what remains is per-query
movement worth investigating.

Usage: python3 tools/compare_bench.py OLD.json NEW.json [norm_threshold]
Accepts either a full bench artifact ({"queries": ...}) or a driver
BENCH_r{N}.json wrapper ({"parsed": {...}} — falls back to git history if
parsed is null). Flags queries whose normalized ratio exceeds the threshold
(default 1.5) in either direction and prints the eips sidecars side by side.
"""
import json, statistics, sys


def load(path):
    d = json.load(open(path))
    if "queries" in d:
        return d
    p = d.get("parsed")
    if isinstance(p, dict) and "queries" in p:
        return p
    raise SystemExit(f"{path}: no usable 'queries' (driver tail-only "
                     "artifact — use the committed BENCH_LOCAL.json of that "
                     "round instead, e.g. `git show <commit>:BENCH_LOCAL.json`)")


def main(old_path, new_path, thr=1.5):
    old, new = load(old_path), load(new_path)
    qo, qn = old["queries"], new["queries"]
    ratios = {k: qn[k] / qo[k] for k in qn
              if k in qo and qo[k] > 0.3 and qn[k] > 0}
    if not ratios:
        raise SystemExit(
            "no shared query with old wall > 0.3s between the two artifacts "
            "(subset run via SPARK_GRAFT_ONLY, or disjoint registries?) — "
            "nothing to normalize against")
    med = statistics.median(ratios.values())
    print(f"median wall ratio new/old = {med:.2f} (host factor)")
    flagged = False
    for k, v in sorted(ratios.items(), key=lambda kv: -kv[1]):
        n = v / med
        if (n > thr and qn[k] > 1.0) or (n < 1 / thr and qo[k] > 1.0):
            word = "SLOWER" if n > 1 else "faster"
            print(f"  {k}: {word} x{max(n, 1/n):.2f} normalized "
                  f"({qo[k]:.2f}s -> {qn[k]:.2f}s)")
            flagged = True
    if not flagged:
        print("  no per-query movement beyond host variance")
    # Anchor throughput through the variance lens: the 64M anchors swing
    # 2-3x in wall across driver VMs (memory-bandwidth/clock-bound), so an
    # eips ratio inside that band is host noise by default; only a ratio
    # OUTSIDE it is evidence of a code regression. The bench artifact now
    # carries the same ratios itself (eips_vs_prev / eips_variance_band).
    BAND = (1 / 3.0, 3.0)
    for key in sorted(set(old) | set(new)):
        if "eips" in key and key.endswith(("_total", "_loop")):
            ov, nv = old.get(key), new.get(key)
            ov_ok = isinstance(ov, (int, float)) and ov > 0
            nv_ok = isinstance(nv, (int, float)) and nv > 0
            if ov_ok and nv_ok:
                r = nv / ov
                verdict = ("within 2-3x host band"
                           if BAND[0] <= r <= BAND[1]
                           else "OUTSIDE band — investigate")
                print(f"  {key}: {ov:.3g} -> {nv:.3g} (x{r:.2f}, {verdict})")
            else:
                # A -1 (failed anchor) or one-sided key is a red flag, not
                # a neutral line — say so explicitly.
                print(f"  {key}: {ov} -> {nv} "
                      "(MISSING/FAILED on one side — investigate)")
        elif "salted" in key or key.endswith("_iters"):
            print(f"  {key}: {old.get(key)} -> {new.get(key)}")
    # Calibration-normalized comparison (round 9+ artifacts): when both
    # sides carry host_factor, the *_norm ratio removes the host speed
    # difference entirely — read IT, not the raw band, when available.
    hf_o, hf_n = old.get("host_factor"), new.get("host_factor")
    if isinstance(hf_o, (int, float)) and isinstance(hf_n, (int, float)):
        print(f"host_factor: {hf_o} -> {hf_n} (calibration-normalized "
              "ratios below are host-independent)")
        for key in sorted(set(old) & set(new)):
            if key.endswith(("_eips_loop_norm", "_eps_norm")):
                ov, nv = old[key], new[key]
                if ov > 0 and nv > 0:
                    print(f"  {key}: {ov:.3g} -> {nv:.3g} (x{nv/ov:.2f})")
    for key in sorted(set(old) | set(new)):
        if key.endswith("_contention") or key.endswith("_rerun"):
            print(f"  {key}: {old.get(key)} -> {new.get(key)}")
    print(f"hosts: {old.get('host_cpu', '?')} -> {new.get('host_cpu', '?')}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 1.5)
