"""Print Ray Data per-operator stats for the flagship KG pipeline — the
measurement loop used to tune block sizing, pool scaling and shuffle layout
(see BASELINE.md optimization log).

Usage: python scripts/pipeline_stats.py [n_conversations] [num_cpus]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    n_conv = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import time

    from rayld.pipelines.kg import build_triples
    from rayld.sources.transcripts import transcripts_dataset

    ds = build_triples(transcripts_dataset(n_conv))
    t0 = time.perf_counter()
    materialized = ds.materialize()
    wall = time.perf_counter() - t0
    n = materialized.count()
    print(f"# {n_conv} conversations -> {n} triples in {wall:.1f}s "
          f"({n / wall:,.0f} triples/s at {num_cpus} cpus)\n")
    print(materialized.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
