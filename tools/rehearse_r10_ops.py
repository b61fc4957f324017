"""Scale rehearsal for the round-10 operator family at the 10x fixture
(.scale/sf1: 5,000 -> 50,000 documents, 100k -> 1M events, 600k -> 6M
lineitem rows): PassJoin edit join, AllPairs set-similarity join,
Misra-Gries heavy hitters, degree-oriented triangle counting, histogram
exact quantiles, gap fill, cohort retention, funnel.

Each step appends one JSON line to .scale/rehearsal_<tag>.jsonl with the
wall and a result signature (row count + a content checksum where cheap),
so decade-over-decade ratios are comparable across rounds.  Run SOLO —
walls taken under load are upper bounds only.

Usage: python tools/rehearse_r10_ops.py [--tag r10ops] [--sf-dir .scale/sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r10ops")
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".scale", "sf1"))
    args = ap.parse_args()
    out_path = os.path.join(REPO, ".scale", f"rehearsal_{args.tag}.jsonl")

    import __spark_entry__ as entry_mod
    from esper_tv_spark import get_spark

    spark = get_spark("rehearse-r10-ops")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    def emit(row: dict) -> None:
        with open(out_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps(row), flush=True)

    steps = [
        "q119_fuzzy_title_join",
        "q122_set_similarity_join",
        "q121_heavy_hitters",
        "q123_triangle_count",
        "q125_exact_quantiles",
        "q120_gap_fill",
        "q124_cohort_retention",
        "q116_event_funnel",
        "q115_repeated_spans",
        "q117_pagerank",
    ]
    for name in steps:
        t0 = time.time()
        try:
            rows = qs[name](spark, args.sf_dir).collect()
            emit(
                {
                    "step": name,
                    "sf_dir": args.sf_dir,
                    "wall_s": round(time.time() - t0, 1),
                    "rows": len(rows),
                }
            )
        except Exception as e:  # record the failure, keep rehearsing
            emit(
                {
                    "step": name,
                    "sf_dir": args.sf_dir,
                    "wall_s": round(time.time() - t0, 1),
                    "error": f"{type(e).__name__}: {e}"[:300],
                }
            )
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
