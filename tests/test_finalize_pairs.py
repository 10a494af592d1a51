"""Unit-test the paired-scaling validity predicate (pure python).

The headline in BENCH/BASELINE.md is the median of pairs this predicate
admits; each clause exists because a real contamination mode slipped past
the previous gate stack during round 4 (see BENCH/ROUND4_NOTES.md), so
each clause gets a regression case shaped like the incident that
motivated it.
"""

from __future__ import annotations

import copy
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.finalize_pairs import NCPU, pair_valid  # noqa: E402

CFG = {
    "max_steal_frac": 0.02,
    "max_foreign_frac": 0.03,
    "min_cpu_headroom": 0.90,
    "min_mem_headroom": 0.85,
    "min_cpu_rate_small": 2.2,
    "min_cpu_rate_big": 8.8,
    "min_mem_rate_small": 12.5,
    "min_mem_rate_big": 47.5,
    "min_ev_pcpu_small": 91_000,
    "min_ev_pcpu_big": 87_000,
    "max_epoch_spread": 1.6,
}


def _leg(cpus: int, wall: float, ev_pcpu: float, *,
         steal: float = 0.0, foreign: float = 0.0,
         epochs=(1.0, 1.1, 1.05, 1.0)) -> dict:
    n_events = 32_000_000
    pcpu = n_events / ev_pcpu
    return {
        "cpus": cpus,
        "n_events": n_events,
        "wall_sec": wall,
        "proc_cpu_sec": pcpu,
        "cpu_sec": pcpu + foreign * wall * NCPU,
        "steal_sec": steal * wall * NCPU,
        "events_per_proc_cpu_sec": ev_pcpu,
        "per_epoch_sec": list(epochs),
    }


def _probe(cpu_head=0.99, mem_head=0.95, cpu_rate=2.7, mem_rate=15.0,
           cpu_rate_big=10.5, mem_rate_big=55.0):
    return {"cpu_headroom": cpu_head, "mem_headroom": mem_head,
            "cpu_rate_small": cpu_rate, "mem_rate_small": mem_rate,
            "cpu_rate_big": cpu_rate_big, "mem_rate_big": mem_rate_big}


def _clean_pair() -> dict:
    return {
        "small": _leg(2, 150.0, 100_000),
        "big": _leg(8, 40.0, 95_000),
        "pre_probe": _probe(),
        "mid_probe": _probe(),
        "post_probe": _probe(),
    }


def test_clean_pair_is_valid():
    assert pair_valid(_clean_pair(), CFG)


def test_steal_on_either_leg_rejects():
    for leg in ("small", "big"):
        p = _clean_pair()
        p[leg]["steal_sec"] = 0.05 * p[leg]["wall_sec"] * NCPU
        assert not pair_valid(p, CFG)


def test_foreign_cpu_rejects():
    # incident: a leaked test-suite JVM burned 4.5% foreign with 0.3% steal
    p = _clean_pair()
    p["big"]["cpu_sec"] = (p["big"]["proc_cpu_sec"]
                           + 0.045 * p["big"]["wall_sec"] * NCPU)
    assert not pair_valid(p, CFG)


def test_probe_headroom_ratio_rejects():
    p = _clean_pair()
    p["mid_probe"] = _probe(mem_head=0.71)  # co-tenant bandwidth phase
    assert not pair_valid(p, CFG)


def test_probe_absolute_rate_floor_rejects():
    # incident: pair valid at eff 0.33 — ratios clean, host at 70% speed
    p = _clean_pair()
    p["pre_probe"] = _probe(cpu_rate=1.9)
    assert not pair_valid(p, CFG)


def test_leg_efficiency_floor_rejects():
    # incident: 5-15 s bandwidth burst entirely inside a leg, all probes
    # clean, big leg at half its clean per-CPU efficiency
    p = _clean_pair()
    p["big"] = _leg(8, 60.0, 57_000)
    assert not pair_valid(p, CFG)


def test_epoch_spread_rejects():
    # incident: burst ended mid-leg -> per-epoch walls [38.9, 44.1, 18.8,
    # 16.7] with flat probes on both sides
    p = _clean_pair()
    p["big"]["per_epoch_sec"] = [38.9, 44.1, 18.8, 16.7]
    assert not pair_valid(p, CFG)


def test_missing_probes_admit_when_legs_certify():
    # pre-probe-era ledger rows carry no probe records; the per-leg floors
    # are the certification, probes are a hunting heuristic
    p = _clean_pair()
    for k in ("pre_probe", "mid_probe", "post_probe"):
        del p[k]
    assert pair_valid(p, CFG)
    p2 = copy.deepcopy(p)
    p2["small"]["events_per_proc_cpu_sec"] = 80_000
    assert not pair_valid(p2, CFG)


def test_big_proc_rate_floor_rejects():
    """ADVICE r4: the big-proc rates are the gate most sensitive to the
    documented 16-proc bandwidth bursts — they now persist with the pair
    and the finalizer replays them."""
    p = _clean_pair()
    p["mid_probe"]["mem_rate_big"] = 30.0  # burst cut the socket ~2x
    assert not pair_valid(p, CFG)
    p2 = _clean_pair()
    p2["post_probe"]["cpu_rate_big"] = 5.0
    assert not pair_valid(p2, CFG)


def test_live_rejected_pair_never_resurrected():
    """ADVICE r4: a pair the live campaign marked invalid (possibly on
    fields the ledger no longer carries) stays invalid on replay."""
    p = _clean_pair()
    p["valid"] = False
    assert not pair_valid(p, CFG)
    p["valid"] = True  # recorded-valid pairs still re-face current rules
    assert pair_valid(p, CFG)


def test_probe_era_pair_without_big_rates_passes_probe_clause():
    """Legacy pairs (big rates not persisted) must not be auto-failed by
    the new floors — absent fields default permissive, and the recorded
    live verdict (previous test) is what protects against resurrection."""
    p = _clean_pair()
    for k in ("pre_probe", "mid_probe", "post_probe"):
        p[k].pop("cpu_rate_big")
        p[k].pop("mem_rate_big")
    p["valid"] = True
    assert pair_valid(p, CFG)


def test_stored_host_ncpu_used_for_fractions():
    """ADVICE r4: steal/foreign fractions replay with the CPU count the
    host had at bench time, not the replaying machine's."""
    from tools.finalize_pairs import foreign_frac, steal_frac

    p = _clean_pair()
    leg = p["big"]
    # same absolute steal seconds look dirty on a 32-cpu host but clean on
    # a (hypothetical) 128-cpu one — the stored value must win
    leg["steal_sec"] = 0.03 * leg["wall_sec"] * NCPU
    leg["host_ncpu"] = NCPU
    assert steal_frac(leg) > 0.02
    leg["host_ncpu"] = NCPU * 4
    assert steal_frac(leg) < 0.02
    leg["cpu_sec"] = leg["proc_cpu_sec"] + 0.04 * leg["wall_sec"] * NCPU
    leg["host_ncpu"] = NCPU
    assert foreign_frac(leg) > 0.03
    leg["host_ncpu"] = NCPU * 4
    assert foreign_frac(leg) < 0.03
