#!/usr/bin/env python3
"""10x scale probe: measure how catalog entries scale from sf0.1 to a
derived ~10x dataset, and flag super-linear entries.

One command reproduces the r13+ per-round ritual:

    python3 tools/scale_probe.py               # probe the risk list
    python3 tools/scale_probe.py --regen       # rebuild sfx10 first
    python3 tools/scale_probe.py --entries a,b # probe a custom subset
    python3 tools/scale_probe.py --sfx100      # second decade: sfx100/sfx10
                                               # on the top-risk list

Steps:
  1. (--regen, or when missing) derive the ~10x dataset from sf0.1 via
     `graft.tools.ScaleUp` into /tmp/graft_scale/sfx10 — seed-stable,
     workload-character-preserving (see ScaleUp scaladoc).
  2. run graft.Bench twice with SPARK_GRAFT_BENCH_ONLY=<entries>
     (sf0.1 then sfx10; same session shape: 16 cpus, 2 reps each).
  3. print per-entry and per-artifact ratio tables (sfx10 median /
     sf0.1 median; linear = 10x) and flag anything over the bar
     (13x = the r12 verdict's 1.3x criterion). Exit 1 on a flag, so
     the probe can gate.

The default list is the 29 risk entries from the r13 probe (windows,
dedup families, quantile selectors, CC, ANN) plus entries added since;
the three declared n^2-oracle audits (x_knn_graph, x_knn_graph_recall,
x_recall_by_label) and the exact-graph consumers that would force the
deliberately-n^2 exact-kNN artifact at 10x (x_label_propagation) stay
excluded by design — at scale those run on sampled slices.

Timings are noise-sensitive: run on a quiet machine (no concurrent
sbt test / verify), like every bench ritual.
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SFX10 = "/tmp/graft_scale/sfx10"
SFX100 = "/tmp/graft_scale/sfx100"
BAR = 13.0  # 1.3x the linear 10x
# must match graft.tools.ScaleUp.DerivationVersion — a derived dir
# stamped with an older scheme (or never stamped) is regenerated, so
# the two probe legs always come from the SAME derivation
DERIVATION = "v4-char24-suffix-window"


def derivation_ok(path):
    try:
        with open(os.path.join(path, "_derivation.txt")) as f:
            return f.read().split()[0] == DERIVATION
    except OSError:
        return False

# r13 risk list + r14 additions (x_pair_pagerank rides the pair graph).
DEFAULT_ENTRIES = [
    "x_dedup_exact", "x_dedup_minhash", "x_dedup_ngram",
    "x_dedup_containment", "x_dedup_clusters", "x_cluster_safe_split",
    "x_fuzzy_match", "x_semantic_dedup", "x_dedup_lines",
    "x_dup_passages", "x_khop_reach", "x_knn_graph_ann", "x_ann_lsh",
    "x_ann_ivf", "x_cosine_topk", "x_open_orders", "x_rolling_wau",
    "x_sessionize", "x_ks_drift", "x_bin_drift", "x_mode_per_group",
    "x_exact_quantiles", "x_value_deciles", "x_quality_bands",
    "x_lm_score", "x_epoch_shuffle", "x_pack_bins", "x_tfidf_topk",
    "x_dedup_embedding", "x_pair_pagerank", "x_dup_ngram_frac",
    "x_split_leakage", "x_ann_int8", "x_int8_recall", "x_ann_ivf_int8",
]
# artifacts whose builds are n^2 BY DESIGN (ground-truth oracles,
# sampled-slice at scale) — reported but never flagged
N2_BY_DESIGN_ARTIFACTS = {"exact_knn_graph"}
# entries whose WORK is quadratic by contract, excluded from decade
# probes like the n^2-oracle audits: x_stream_ann_ingest retrieves
# with nProbe = nlist (exhaustive cells) so each micro-batch's
# retrieval is batch x seen integer dots — the price of a closed-form
# exact oracle for the fold; the SERVING shape at scale is the pruned
# x_ann_index_probe path (measured flat: 0.85/1.12/1.22 s across
# three decades). Probing the fold at sfx100 would only measure this
# declared contract (r17: 34+ min per execution).
EXHAUSTIVE_BY_CONTRACT = {"x_stream_ann_ingest"}

# which single entry forces each shared artifact's build, for the
# isolated re-measure of a flagged artifact name
ARTIFACT_DRIVER = {
    "ngram_pair_graph": "x_dedup_ngram",
    "doc_shingles": "x_dedup_containment",
    "annotated_lineitem": "p8_split_summary",
    "fuzzy_pairs": "x_fuzzy_match",
    "passage_spans": "x_dup_passages",
    "lm_model": "x_lm_score",
    "gopher_signals": "x_gopher_rules",
    "late_stream": "x_stream_late_drops",
}

# --sfx100 decade probe: the top-risk entries (worst measured 10x
# ratios + the structural risks the 10x probe can hide: the counting
# filter's sum(|posting|^2) term, capped-collect hot buckets, CC
# rounds, quantile narrowing passes) PLUS one driver entry per shared
# artifact so every artifact build except the by-design-n^2
# exact_knn_graph gets a measured 100x/10x ratio. The n^2-oracle
# consumers (x_knn_graph*, x_recall_by_label, x_label_propagation,
# x_int8_recall and friends) stay out: they'd force the exact graph.
DECADE_ENTRIES = [
    # top-10 risk
    "x_dedup_embedding", "x_semantic_dedup", "x_dedup_ngram",
    "x_dedup_containment", "x_dedup_minhash", "x_dedup_clusters",
    "x_knn_graph_ann", "x_ann_ivf_int8", "x_pair_pagerank",
    "x_quality_bands",
    # artifact coverage: fuzzy_pairs, passage_spans, lm_model,
    # gopher_signals, annotated_lineitem, late_stream
    "x_fuzzy_match", "x_dup_passages", "x_lm_score", "x_gopher_rules",
    "p8_split_summary", "x_stream_late_drops",
    # r16 wave 4: the pq_index/pq_top10 artifacts (via the pareto
    # capstone, which also exercises the BQ/MRL legs) and the two
    # encode-heavy io folds of the PQ serving split
    "x_ann_pareto", "x_pq_index_grow", "x_pq_index_probe",
]
# sfx100-mode legs run through bench_chunked (<=5 entries/session) —
# see its docstring for the big-session degradation this guards.


def run(cmd, env=None, **kw):
    e = dict(os.environ)
    if env:
        e.update(env)
    print(f"[probe] $ {cmd}", flush=True)
    return subprocess.run(cmd, shell=True, cwd=REPO, env=e, **kw)


def bench(sf_dir, entries, out_json, cpus, reps, driver_mem=None):
    env = {
        "SPARK_GRAFT_SF_DIR": sf_dir,
        "SPARK_GRAFT_CPUS": str(cpus),
        "SPARK_GRAFT_BENCH_REPS": str(reps),
        "SPARK_GRAFT_BENCH_ONLY": ",".join(entries),
        "SPARK_GRAFT_BENCH_MEDIANS_FILE": out_json,
    }
    if driver_mem:
        env["SPARK_DRIVER_MEM"] = driver_mem
    r = run('sbt -batch "runMain graft.Bench"', env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:])
        raise SystemExit(f"bench failed at {sf_dir}")
    with open(os.path.join(REPO, out_json) if not os.path.isabs(out_json)
              else out_json) as f:
        return json.load(f)


def bench_chunked(sf_dir, entries, out_json, cpus, reps, driver_mem=None,
                  chunk=5):
    """bench() in <=chunk-entry sessions, medians/artifacts merged.

    One big session's in-session numbers are not trustworthy at the
    decade scales: a 9-entry 48g-driver sfx100-mode session was
    observed (2026-08-16) degrading 20-60x on compute-heavy entries
    partway through, while the same entries measure clean in small
    sessions. Chunking costs one JVM spin-up per chunk and buys
    numbers that don't need a forensic pass. NOTE: shared artifacts
    rebuild per chunk — their times stay first-touch-cold either way.
    """
    if not entries:
        # json.dump(None) would write a literal `null` and every reader
        # downstream would die on a subscript — fail where the bug is
        raise ValueError("bench_chunked called with no entries")
    merged = None
    for i in range(0, len(entries), chunk):
        part = bench(sf_dir, entries[i:i + chunk],
                     f"{out_json}.part{i // chunk}", cpus, reps, driver_mem)
        if merged is None:
            merged = part
        else:
            merged["queries"].update(part.get("queries", {}))
            # scalar totals cover ONE chunk's session each — sum the
            # cross-chunk-additive ones (artifact build cost accrues per
            # chunk since shared artifacts rebuild per JVM) so the
            # merged top level doesn't silently report chunk 1 only
            merged["artifact_sec"] = (merged.get("artifact_sec") or 0.0) + \
                (part.get("artifact_sec") or 0.0)
            # io_sec is additive exactly like artifact_sec (each chunk's
            # value covers only its own entries); io_queries/rep_outliers
            # are per-chunk lists — union them so io-fraction reads off
            # the merged artifact cover every chunk, not chunk 1
            merged["io_sec"] = (merged.get("io_sec") or 0.0) + \
                (part.get("io_sec") or 0.0)
            for lk in ("io_queries", "rep_outliers"):
                seen = list(merged.get(lk) or [])
                seen += [n for n in (part.get(lk) or []) if n not in seen]
                merged[lk] = seen
            # session-health fields: keep the WORST observation, not the
            # first chunk's
            merged["sick"] = bool(merged.get("sick")) or bool(part.get("sick"))
            merged["contended"] = bool(merged.get("contended")) or \
                bool(part.get("contended"))
            merged["n_band_outliers"] = (merged.get("n_band_outliers") or 0) + \
                (part.get("n_band_outliers") or 0)
            merged["passes"] = max(merged.get("passes") or 1,
                                   part.get("passes") or 1)
            # load: keep the chunk with the hottest median (hot flag
            # follows it) so a contended chunk can't hide behind chunk 1
            ml, pl = merged.get("load") or {}, part.get("load") or {}
            if (pl.get("median") or -1.0) > (ml.get("median") or -1.0):
                merged["load"] = pl
            merged["n_failed"] = (merged.get("n_failed") or 0) + \
                (part.get("n_failed") or 0)
            ab = merged.setdefault("artifact_breakdown", {})
            for k, v in (part.get("artifact_breakdown") or {}).items():
                # keep the first (cold) observation per artifact
                ab.setdefault(k, v)
    # the headline total must cover every merged chunk, not chunk 1
    merged["value"] = sum(v for v in merged["queries"].values() if v >= 0)
    with open(os.path.join(REPO, out_json) if not os.path.isabs(out_json)
              else out_json, "w") as f:
        json.dump(merged, f)
    return merged


def ratio_table(title, base, x10, flag_exempt=frozenset()):
    rows, flagged = [], []
    for k in sorted(set(base) | set(x10)):
        b, x = base.get(k), x10.get(k)
        if b is None or x is None:
            rows.append((k, b, x, None))
            continue
        # Bench writes -1.0 as the failure sentinel — a leg that could
        # not run at EITHER scale is the worst possible scaling result,
        # never a pass (x=-1.0/b>0 would otherwise print a sub-bar
        # negative ratio and dissolve silently)
        if b <= 0 or x <= 0:
            rows.append((k, b, x, float("inf")))
            if k not in flag_exempt:
                flagged.append((k, float("inf")))
            continue
        r = x / b
        rows.append((k, b, x, r))
        if r > BAR and k not in flag_exempt:
            flagged.append((k, r))
    rows.sort(key=lambda t: -(t[3] or 0))
    print(f"\n## {title} (linear = 10x, bar = {BAR}x)\n")
    print("| name | base s | 10x-data s | ratio |")
    print("|---|---|---|---|")
    for k, b, x, r in rows:
        fb = f"{b:.2f}" if b is not None else "-"
        fx = f"{x:.2f}" if x is not None else "-"
        fr = f"{r:.1f}x" if r is not None else "-"
        mark = " **OVER BAR**" if r is not None and r > BAR and k not in flag_exempt else ""
        note = " (n2-by-design)" if k in flag_exempt else ""
        print(f"| {k}{note} | {fb} | {fx} | {fr}{mark} |")
    return flagged


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--regen", action="store_true",
                    help="rebuild the sfx10 derivation before probing")
    ap.add_argument("--entries", default=None,
                    help="comma-separated catalog entries (default: risk list)")
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sfx100", action="store_true",
                    help="probe the second decade: sfx100/sfx10 ratios on "
                         "the top-risk + artifact-coverage list (same 13x "
                         "bar — 1.3x per decade)")
    args = ap.parse_args()

    # declared-quadratic contracts are absent from the default lists;
    # an explicit --entries run naming one gets a loud banner instead
    # of silently measuring a contract the bar was never meant for
    if args.entries:
        for name in EXHAUSTIVE_BY_CONTRACT:
            if name in args.entries:
                print(f"[probe] WARNING: {name} is quadratic BY CONTRACT "
                      "(exhaustive-probe retrieval for a closed-form oracle) "
                      "— its ratio measures the declared contract, not a "
                      "scale defect; the serving shape at scale is the "
                      "pruned-probe path", flush=True)

    if args.sfx100:
        entries = ([e.strip() for e in args.entries.split(",") if e.strip()]
                   if args.entries else DECADE_ENTRIES)
        for tgt, n in ((SFX10, 10), (SFX100, 100)):
            if args.regen or not derivation_ok(tgt):
                r = run(f'sbt -batch "runMain graft.tools.ScaleUp {SF01} {tgt} {n}"',
                        env={"SPARK_GRAFT_CPUS": "16",
                             "SPARK_DRIVER_MEM": "32g"})
                if r.returncode != 0:
                    raise SystemExit(f"ScaleUp {n}x failed")
                if not derivation_ok(tgt):
                    # a fresh stamp that still mismatches means the
                    # Scala constant moved without this one — fail
                    # loudly ONCE instead of regenerating forever
                    raise SystemExit(
                        "derivation version mismatch after regen — update "
                        "DERIVATION in scale_probe.py to match "
                        "graft.tools.ScaleUp.DerivationVersion")
        base = bench_chunked(SFX10, entries, "/tmp/probe_sfx10d.json",
                             args.cpus, args.reps, driver_mem="48g")
        x = bench_chunked(SFX100, entries, "/tmp/probe_sfx100.json",
                          args.cpus, args.reps, driver_mem="48g")
        title_lo, title_hi = "sfx10", "sfx100"
    else:
        entries = ([e.strip() for e in args.entries.split(",") if e.strip()]
                   if args.entries else DEFAULT_ENTRIES)
        if args.regen or not derivation_ok(SFX10):
            r = run(f'sbt -batch "runMain graft.tools.ScaleUp {SF01} {SFX10} 10"')
            if r.returncode != 0:
                raise SystemExit("ScaleUp failed")
            if not derivation_ok(SFX10):
                raise SystemExit(
                    "derivation version mismatch after regen — update "
                    "DERIVATION in scale_probe.py to match "
                    "graft.tools.ScaleUp.DerivationVersion")
        base = bench(SF01, entries, "/tmp/probe_sf01.json", args.cpus, args.reps)
        x = bench(SFX10, entries, "/tmp/probe_sfx10.json", args.cpus, args.reps)
        title_lo, title_hi = "sf0.1", "sfx10"

    flagged = ratio_table(f"entries ({title_hi}/{title_lo})",
                          base.get("queries", {}), x.get("queries", {}))
    flagged += ratio_table(
        f"shared-artifact builds ({title_hi}/{title_lo})",
        base.get("artifact_breakdown", {}) or {},
        x.get("artifact_breakdown", {}) or {},
        flag_exempt=N2_BY_DESIGN_ARTIFACTS)

    a_b = base.get("artifact_sec")
    a_x = x.get("artifact_sec")
    if a_b and a_x:
        print(f"\nartifact_sec total: {a_b:.1f} -> {a_x:.1f} "
              f"({a_x / a_b:.1f}x)")

    if flagged:
        # A shared-session probe leg runs ~16 entries and their cached
        # artifacts in ONE JVM — cross-entry cache/GC pressure can
        # inflate an individual number several-fold (r15: the sfx100
        # leg timed x_dedup_containment at 29.8x in-session vs 9.6x
        # isolated). Before believing a flag, re-measure that name
        # ALONE in fresh sessions at both scales; only isolation-
        # confirmed flags fail the probe.
        lo_dir, hi_dir = (SFX10, SFX100) if args.sfx100 else (SF01, SFX10)
        dm = "48g" if args.sfx100 else None
        print("\nflagged in shared session; re-measuring isolated:")
        survived = []
        for k, r in flagged:
            name = k if k in entries else next(
                (e for e in entries if ARTIFACT_DRIVER.get(k) == e), None)
            if name is None:
                name = ARTIFACT_DRIVER.get(k)
            if name is None:
                print(f"  {k}: {r:.1f}x shared — no known driver entry, kept")
                survived.append((k, r))
                continue
            # a crashed isolated leg (sbt OOM / driver kill raises
            # SystemExit inside bench) must behave like the
            # missing/-1.0 case — flag KEPT — not abort the whole
            # probe before the kept-flags summary prints
            try:
                b = bench(lo_dir, [name], f"/tmp/probe_iso_lo_{name}.json",
                          args.cpus, args.reps, driver_mem=dm)
                x = bench(hi_dir, [name], f"/tmp/probe_iso_hi_{name}.json",
                          args.cpus, args.reps, driver_mem=dm)
            except SystemExit as e:
                print(f"  {k}: isolated re-run crashed ({e}) — flag kept")
                survived.append((k, r))
                continue
            src_b = b["queries"] if k in b.get("queries", {}) \
                else (b.get("artifact_breakdown") or {})
            src_x = x["queries"] if k in x.get("queries", {}) \
                else (x.get("artifact_breakdown") or {})
            bb, xx = src_b.get(k), src_x.get(k)
            if bb is not None and xx is not None and bb > 0 and xx > 0:
                ir = xx / bb
                verdict = "OVER BAR" if ir > BAR else "ok"
                print(f"  {k}: {r:.1f}x shared -> {ir:.1f}x isolated "
                      f"({bb:.2f} -> {xx:.2f} s) [{verdict}]")
                if ir > BAR:
                    survived.append((k, ir))
            else:
                # missing or -1.0 failure-sentinel legs: a flag whose
                # isolated re-run FAILED must survive, not dissolve
                print(f"  {k}: isolated legs ({bb}, {xx}) failed or "
                      "missing — flag kept")
                survived.append((k, r))
        if survived:
            print("\nFLAGGED (super-linear, isolation-confirmed):")
            for k, r in survived:
                print(f"  {k}: {r:.1f}x")
            return 1
        print("\nAll flags dissolved under isolation; at or below the bar.")
        return 0
    print("\nAll probed names at or below the bar.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
