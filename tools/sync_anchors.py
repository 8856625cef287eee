#!/usr/bin/env python3
"""Regenerate the throughput-anchor blocks in COVERAGE.md / README.md from
the committed BENCH_LOCAL.json — never hand-sync these numbers (round 5
shipped anchors that predated the final bench run).

Usage: python3 tools/sync_anchors.py  (from the repo root)
Rewrites everything between <!-- ANCHORS:BEGIN --> and <!-- ANCHORS:END -->
in both docs with a table derived from the artifact. Exits 1 if a marker
pair is missing.
"""
import json, re, sys

B = json.load(open("BENCH_LOCAL.json"))
Q = B["queries"]


def m(x):
    return f"{x / 1e6:.1f}M"


def block():
    rows = []
    rows.append("| anchor | wall s | eips total | eips loop | notes |")
    rows.append("|---|---|---|---|---|")
    rows.append(f"| b01 4elt SSSP (reference replay) | {Q['b01_sssp_4elt']:.3f} "
                f"| — | — | native baseline 0.2806 s |")
    # b02: CSR tier. Since r10 the artifact carries the adjudicated figures
    # directly (eips_total over the best run; eips_loop over the
    # instrumented relaxation loop alone), with the wall-derived value as
    # a legacy-artifact fallback.
    it02 = B.get("b02_iters", 11)
    e02t = B.get("b02_eips_total", 8e6 * it02 / Q["b02_sssp_rand8m"])
    e02l = B.get("b02_eips_loop", -1)
    rows.append(f"| b02 8M uniform SSSP (CSR tier) | {Q['b02_sssp_rand8m']:.2f} "
                f"| {m(e02t)} | {m(e02l) if e02l > 0 else '—'} "
                f"| auto-dispatch local loop, iters={it02} |")
    for tag, label in [("b03", "b03 64M uniform SSSP (distributed)"),
                       ("b04", "b04 64M skew SSSP (salted)"),
                       ("b05", "b05 64M skew PageRank ×2"),
                       ("b07", "b07 64M uniform PageRank→converged (d=0.5)")]:
        qn = {"b03": "b03_sssp_rand64m", "b04": "b04_sssp_skew64m",
              "b05": "b05_pagerank_skew64m",
              "b07": "b07_pagerank_conv64m"}[tag]
        if qn not in Q or f"{tag}_salted_hubs" not in B:
            continue  # pre-r7 artifact or subset run without this anchor
        note = (f"salted_hubs={B[f'{tag}_salted_hubs']}"
                f" ×{B[f'{tag}_salt_factor']}, iters={B[f'{tag}_iters']}")
        rows.append(f"| {label} | {Q[qn]:.1f} | {m(B[f'{tag}_eips_total'])} "
                    f"| {m(B[f'{tag}_eips_loop'])} | {note} |")
    # b06 runs through GraphXRunner; since r10 the artifact carries its
    # adjudicated eips (rounds from the same depth golden the query
    # REQUIREs) and contention figure.
    if "b06_sssp_graphx64m" in Q:
        e06 = f"{m(B['b06_eips_total'])}" if "b06_eips_total" in B else "—"
        note = "cross-runner equality pin (b03 depth golden)"
        if "b06_contention" in B:
            note += f"; contention {B['b06_contention']:.1f}"
            if B.get("b06_rerun") and "b06_rerun_sec" in B:
                note += (f" — structural for GraphX's task mix; two runs "
                         f"({B['b06_first_sec']:.0f}s / "
                         f"{B['b06_rerun_sec']:.0f}s) adjudicate it")
        rows.append(f"| b06 64M uniform SSSP (GraphX runner) "
                    f"| {Q['b06_sssp_graphx64m']:.1f} | {e06} | — "
                    f"| {note} |")
    # b08: TriangleCount anchor (edges/s, not edge-relaxations/s — the
    # baseline comparable is TC G1 GMR @1 slave ≈ 1.02M edges/s).
    if "b08_eps" in B and "b08_triangles_8m" in Q:
        note8 = (f"canon {B['b08_canon_sec']:.1f}s + close "
                 f"{B['b08_close_sec']:.1f}s; total pinned (633) + DuckDB "
                 "oracle; TC baseline ≈ 1.02M e/s")
        if "b08_contention" in B:
            note8 += f"; contention {B['b08_contention']:.1f}"
            if B.get("b08_rerun") and "b08_rerun_sec" in B:
                note8 += (f" (two runs: {B['b08_first_sec']:.0f}s / "
                          f"{B['b08_rerun_sec']:.0f}s)")
        rows.append(f"| b08 8M TriangleCount (wedge-close) "
                    f"| {Q['b08_triangles_8m']:.1f} | {m(B['b08_eps'])} e/s "
                    f"| — | {note8} |")
    host = B.get("host_cpu", "unknown")
    calib = ""
    if "host_factor" in B:
        calib = (f"; calibration probe cpu {B['calib_cpu_sec']:.2f}s / mem "
                 f"{B['calib_mem_sec']:.2f}s → host_factor "
                 f"{B['host_factor']:.2f} — the *_eips_loop_norm fields are "
                 "host-independent")
    return ("\n".join(rows) +
            f"\n\nArtifact: `BENCH_LOCAL.json` (host: {host}{calib}; the 64M"
            " anchors are clock/memory-bandwidth-bound and per-round VMs"
            " differ — compare calibration-normalized eips, not absolute"
            " walls, across rounds; BASELINE.md's native convention ≈ 7.1M"
            " eips total). Generated "
            "by `tools/sync_anchors.py`; do not hand-edit this block.\n")


def patch(path):
    text = open(path).read()
    pat = re.compile(r"(<!-- ANCHORS:BEGIN -->\n).*?(<!-- ANCHORS:END -->)",
                     re.S)
    if not pat.search(text):
        print(f"{path}: marker pair missing")
        return False
    open(path, "w").write(pat.sub(lambda g: g.group(1) + block() + g.group(2),
                                  text))
    print(f"{path}: anchors regenerated")
    return True


if __name__ == "__main__":
    ok = all([patch("COVERAGE.md"), patch("README.md")])
    sys.exit(0 if ok else 1)
