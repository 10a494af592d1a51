"""Summarize a paired-scaling campaign into a host-phase ledger section.

VERDICT r3 item 1 allows two outcomes: a headline median valid pair with
steady efficiency >= 0.8, OR "a measured host-phase ledger proving no such
window existed". This tool produces the latter (and contextualizes the
former) from BENCH/paired_pairs.jsonl — per-pair steal fractions over
time, valid/dirty split, and the dirty-pair efficiency distribution with
its steal covariate, appended to BENCH/BASELINE.md.

    python bench/campaign_summary.py [--sig SUBSTR] [--write]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(sig: str | None) -> list[dict]:
    out = []
    with open(os.path.join(REPO, "BENCH", "paired_pairs.jsonl")) as f:
        for ln in f:
            d = json.loads(ln)
            if sig is None or sig in d.get("sig", ""):
                out.append(d)
    return out


def render(pairs: list[dict]) -> str:
    valid = [p for p in pairs if p["valid"]]
    dirty = [p for p in pairs if not p["valid"]]
    lines = [
        "",
        "## Host-phase ledger (campaign full disclosure)",
        "",
        f"Generated {datetime.now(timezone.utc).isoformat()} by "
        "`bench/campaign_summary.py` over `BENCH/paired_pairs.jsonl`.",
        "",
        f"{len(pairs)} pairs attempted; {len(valid)} valid "
        "(both legs' in-run hypervisor steal < 2% of host CPU), "
        f"{len(dirty)} dirty. Every pair, timestamped:",
        "",
        "| UTC | order | eff steady | eff cpu | steal A | steal B | valid |",
        "|---|---|---|---|---|---|---|",
    ]
    for p in pairs:
        ts = datetime.fromtimestamp(p["ts"], timezone.utc).strftime("%H:%M:%S")
        lines.append(
            f"| {ts} | {p['order']} | {p['eff_steady']:.3f} | "
            f"{p['eff_cpu']:.3f} | {p['steal_frac_small']:.3f} | "
            f"{p['steal_frac_big']:.3f} | "
            f"{'YES' if p['valid'] else 'no'} |"
        )
    if dirty:
        med = statistics.median(p["eff_steady"] for p in dirty)
        medc = statistics.median(p["eff_cpu"] for p in dirty)
        worst = max(max(p["steal_frac_small"], p["steal_frac_big"])
                    for p in dirty)
        lines += [
            "",
            f"Dirty-pair steady-efficiency median: **{med:.3f}** "
            f"(eff_cpu median {medc:.3f}; worst leg steal {worst:.1%}). "
            "Steal in the SMALL leg inflates apparent efficiency and in "
            "the BIG leg deflates it, so dirty medians are reported as "
            "context, never as the headline.",
        ]
    if valid:
        medv = statistics.median(p["eff_steady"] for p in valid)
        lines += ["",
                  f"Valid-pair steady-efficiency median: **{medv:.3f}**."]
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sig", default=None,
                    help="filter pairs whose sig contains this substring")
    ap.add_argument("--write", action="store_true",
                    help="append to BENCH/BASELINE.md (default: stdout)")
    args = ap.parse_args()
    pairs = load(args.sig)
    text = render(pairs)
    if args.write:
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(text)
        print(f"appended {len(text)} chars to BENCH/BASELINE.md")
    else:
        print(text)
