#!/usr/bin/env python
"""Aggregate scaling_bench invocation JSONs into one summary.

Usage: python scripts/scaling_aggregate.py .cache/scaling_r6_*.json

Each input is one scaling_bench.py output (possibly empty if that
invocation found no CALM window — skipped here).  Emits the cross-
campaign best-of-each-level efficiency and the calmest same-pass
pairing (highest min(probe_pre, probe_post) among calm_pair passes),
so the recorded number is derived from the full log, not hand-picked.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    best: dict[str, dict] = {}  # level-suffix -> {"sec":…, "tput":…, "steal":…}
    passes: list[dict] = []
    n, n4 = None, None
    used, empty = [], []
    for path in sys.argv[1:]:
        try:
            d = json.load(open(path))
        except (ValueError, OSError):
            empty.append(path)
            continue
        used.append(path)
        n, n4 = d["n_cores"], d["n4_cores"]
        for lv in (n, n4):
            cand = {
                "sec": d[f"sec_local{lv}"],
                "tput": d[f"tput_local{lv}"],
                "steal": d.get(f"steal_local{lv}"),
                "from": path,
            }
            if str(lv) not in best or cand["sec"] < best[str(lv)]["sec"]:
                best[str(lv)] = cand
        for p in d.get("passes", []):
            passes.append({**p, "from": path})
    if not used:
        raise SystemExit("no non-empty invocation JSONs")
    best_eff = round(best[str(n4)]["tput"] / best[str(n)]["tput"] / 4, 3)
    calm = [p for p in passes if p.get("calm_pair")]
    # Both calm-named keys are STRICTLY calm: when no pass has a verified-
    # held window, emit null rather than silently promoting a NOISY pass
    # under a calm key (ADVICE r6; originally only best_calm_pair was
    # restricted — calmest_pass had the same silent fallback).
    # Efficiency > 1.0 from N to 4N cores is physically impossible for this
    # CPU-bound kernel — a super-unity "calm" pass PROVES the N side ate a
    # bandwidth/SMT squeeze the single-core probe cannot see (the same
    # confound that produces 0.5-class lows on the other side).  Such
    # passes must never be promoted under either calm-named key (probes
    # that "held" around an impossible ratio measured the wrong thing):
    # they are reported separately, not silently dropped.
    plausible = [p for p in calm if p["efficiency"] <= 1.0]
    superunity = [p for p in calm if p["efficiency"] > 1.0]
    calmest = (
        max(plausible, key=lambda p: min(p["probe_pre"], p["probe_post"]))
        if plausible
        else None
    )
    # The single-core probe cannot see 8-core bandwidth pressure (CLAUDE.md:
    # it's a window-quality gate, not a linear corrector), so the max-min-
    # probe pass can still carry a squeezed 4N side.  Also report the best
    # efficiency among passes whose window verifiably held (calm_pair) —
    # with the full pass log attached, neither number is hand-picked.
    best_calm = (
        max(plausible, key=lambda p: p["efficiency"]) if plausible else None
    )
    print(
        json.dumps(
            {
                "n_cores": n,
                "n4_cores": n4,
                "n_invocations": len(used),
                "n_empty_invocations": len(empty),
                "n_passes": len(passes),
                "n_calm_passes": len(calm),
                # exact exclusion boundary, recorded so consumers see the
                # choice (ADVICE r7): calm passes with efficiency above
                # this are reported under superunity_calm_passes, never
                # under the calm-named keys
                "superunity_cutoff": 1.0,
                "n_superunity_calm_passes": len(superunity),
                "superunity_calm_passes": superunity,
                "best_of_each_level": best,
                "best_of_efficiency": best_eff,
                "calmest_pass_efficiency": calmest["efficiency"] if calmest else None,
                "calmest_pass": calmest,
                "best_calm_pair_efficiency": best_calm["efficiency"] if best_calm else None,
                "best_calm_pair": best_calm,
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
