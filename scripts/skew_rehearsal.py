"""Skew rehearsal at bench scale (verdict-r4 item 4).

Runs the flagship KG pipeline twice at sf0.1 scale (40k conversations):
once on the uniform corpus, once on a zipfian variant with planted
10k-turn hub conversations, with the per-conversation turn cap lowered so
the quarantine path ENGAGES — each hub's tail past the cap must land in
the @error graph, be counted by the per-bucket lineage manifests, and the
run's throughput must stay within 1.5x of the uniform corpus.

Prints ONE JSON line:
  {"metric": "kg_skew_rehearsal", "uniform_sec": ..., "skewed_sec": ...,
   "uniform_turns_per_sec": ..., "skewed_turns_per_sec": ...,
   "throughput_ratio": ..., "quarantined_turns": ...,
   "expected_quarantined": ..., "hubs": ..., "max_turns": ...}

Usage: python scripts/skew_rehearsal.py  (env: RAY_GRAFT_CPUS, GRAFT_SKEW_N)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = int(os.environ.get("GRAFT_SKEW_N", "40000"))
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
HUB_EVERY = 5_000   # 8 hubs among 40k conversations
HUB_TURNS = 10_000
MAX_TURNS = 2_000   # cap well under the hub length so quarantine engages
OUT = "/tmp/rayld_skew"


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from rayld.pipelines.kg import run_kg_pipeline
    from rayld.sources.transcripts import transcripts_dataset

    # untimed warm-up (the bench.py convention: measure steady state)
    run_kg_pipeline(transcripts_dataset(200), f"{OUT}/warm", num_buckets=8)

    legs = {}
    for name, kw in (
        ("uniform", {}),
        ("skewed", {"hub_every": HUB_EVERY, "hub_turns": HUB_TURNS}),
    ):
        out_dir = f"{OUT}/{name}"
        shutil.rmtree(out_dir, ignore_errors=True)
        ds = transcripts_dataset(N, **kw)
        n_turns = transcripts_dataset(N, **kw).count()
        t0 = time.perf_counter()
        res = run_kg_pipeline(ds, out_dir, num_buckets=32,
                              max_turns=MAX_TURNS)
        sec = time.perf_counter() - t0
        n_err = 0
        for b in range(32):
            with open(f"{out_dir}/bucket={b}/_manifest.json") as f:
                n_err += json.load(f)["n_errors"]
        legs[name] = {
            "sec": round(sec, 2),
            "turns": n_turns,
            "triples": res["triples"],
            "turns_per_sec": round(n_turns / sec, 1),
            "quarantined": n_err,
        }

    n_hubs = (N + HUB_EVERY - 1) // HUB_EVERY
    ratio = (legs["uniform"]["turns_per_sec"]
             / legs["skewed"]["turns_per_sec"])
    print(json.dumps({
        "metric": "kg_skew_rehearsal",
        "n_conversations": N,
        "num_cpus": NCPU,
        "hubs": n_hubs,
        "hub_turns": HUB_TURNS,
        "max_turns": MAX_TURNS,
        "uniform_sec": legs["uniform"]["sec"],
        "skewed_sec": legs["skewed"]["sec"],
        "uniform_turns": legs["uniform"]["turns"],
        "skewed_turns": legs["skewed"]["turns"],
        "uniform_turns_per_sec": legs["uniform"]["turns_per_sec"],
        "skewed_turns_per_sec": legs["skewed"]["turns_per_sec"],
        "throughput_ratio": round(ratio, 3),
        "within_1p5x": bool(ratio <= 1.5),
        "uniform_quarantined": legs["uniform"]["quarantined"],
        "quarantined_turns": legs["skewed"]["quarantined"],
        "expected_quarantined": n_hubs * (HUB_TURNS - MAX_TURNS),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
