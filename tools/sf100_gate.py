"""The sf100 (1000x) spot hash-gate: every contract query whose DuckDB
oracle is feasible at 2.05M vectors / 5M docs / 600M lineitem rows, run
through tools/check.py against .scale/sf100.

This is the list the round-6 gate proved 14/14 (see NEXT_STEPS.md):
the persisted-index family (build + probe + census), the multimodal
codecs (fixture-independent), and the regression classes that caught
real bugs in earlier rounds (avg accumulation order, IEEE -0.0,
int64 hash overflow).  Excluded because their ORACLE is infeasible in
DuckDB at this scale (the Spark paths are covered by the rehearsal
walls in tools/rehearse.py): q28/q93 (minhash over ~1e9 shingles),
q37 (shingle-set join replay), q60 (position unnest over ~1e10 chars),
q85 (2M x 1432 assignment cross join).

Usage: SPARK_CHECK_DRIVER_MEMORY=24g python tools/sf100_gate.py
(Also runs automatically as the LAST step of tools/rehearse.py.)
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FEASIBLE = [
    # round-6 persisted-index + codec family
    "q90_avi_decode_stats",
    "q91_video_frame_sample",
    "q87_ivf_cell_census",
    "q88_pq_adc_topk",
    "q92_ivfpq_ann",
    "q80_ivf_ann",
    # round-7: the IVF-SQ8 probe (bounds/encode/decode all plain SQL
    # arithmetic) and the indexed batch kNN join.  q94 (OPQ) is NOT here:
    # its rotation-replay CTE exceeded 119 GB in DuckDB at sf100 (measured
    # — it OOM-killed the first r7 gate attempt); q94 joins the documented
    # sf100-oracle-infeasible list (q28/q37/q60/q85/q93) with sf1 hash
    # evidence from the full gate.
    "q95_ivfsq_ann",
    "q96_ivf_knn_join",
    "q97_ivfpq_knn_join",
    # round-8: the batch joins over the residual IVF-PQ and SQ8 indexes —
    # both oracles stay per-row list arithmetic (no unnest-regroup CTE of
    # the q94 rotation-replay kind, which is what made q94 infeasible)
    "q98_ivfpq_residual_knn_join",
    "q99_ivfsq_knn_join",
    # round-10: the table-carrier ADC join — q98's oracle with the probe
    # rank widened to 10 and the batch cut to 2 queries (r10 config), so
    # sf100 feasibility is q98's at ~2-3x the replayed candidate rows.
    # q113 (DSL hybrid) stays OUT with q109: the BM25 half is the
    # ~1e9-row token unnest.
    "q105_lut_table_adc_join",
    # round-9: the two-level coarse-quantizer probe and its batch join —
    # their oracles add tiny CTEs (group assignment over n_cells rows,
    # per-query group ranking over n_groups rows) to the q80/q96
    # replays, so sf100 feasibility is q80's/q96's
    "q100_hier_ivf_ann",
    "q101_hier_ivf_knn_join",
    # round-9: logical-delete probe — q80's oracle + a NOT IN literal
    "q102_ivf_delete_probe",
    # round-9: the retirement lifecycle (census CTEs over the
    # n_cells-row centroid table on top of the q80 replay — q80-class
    # feasible, passed at 80.7s).  q103 (trained groups) is NOT here:
    # its oracle unrolls the Lloyd training, which re-derives the
    # full-corpus 256-dim assignment per iteration — measured OOM at
    # 32 AND 80 GB DuckDB caps (non-spillable pins); q103 joins the
    # documented sf100-oracle-infeasible list (q28/q37/q60/q85/q93/q94)
    # with its sf1 full-gate hash as the scale evidence.
    "q104_retired_cell_probe",
    # round-9: pre-filtered ANN + range search + the filtered batch join
    # (q80/q96 replays plus a label IN-list / threshold predicate) and
    # the two corpus-prep steps (a hash+ln projection; one cumsum) —
    # all plain-SQL-cheap at 5M docs / 2.05M vectors.  q109 (hybrid
    # RRF) stays OUT: its BM25 half unnests every token of every
    # document (~1e9 rows at sf100, the q60-class exclusion); sf1 full
    # gate + three-scale driver gates are its evidence.
    "q106_filtered_ann",
    "q107_range_search",
    "q108_filtered_knn_join",
    "q110_weighted_sample",
    "q111_shard_packing",
    # regression classes (caught real bugs at this scale in r4)
    "q01_pricing_summary",
    "q16_events_hourly",
    "q27_doc_fingerprints",
    "q31_knn",
    "q32_label_centroids",
    "q33_embedding_norms",
    "q47_ann_topk",
    "q65_nearest_centroid",
]


def main() -> int:
    env = dict(os.environ)
    env.setdefault("SPARK_CHECK_DRIVER_MEMORY", "24g")
    # oracle-RESULT cache: a second consecutive sf100 gate run replays the
    # heavy DuckDB oracles (q98's residual replay alone is ~18 min) from
    # cache, keyed on (oracle SQL, data-stat fingerprint) — see
    # tools/check.py.  The Spark side always runs live.
    env.setdefault(
        "SPARK_CHECK_ORACLE_CACHE", os.path.join(REPO, ".scale", "oracle_cache")
    )
    sf100 = os.path.join(REPO, ".scale", "sf100")
    if not os.path.isdir(sf100):
        print("no .scale/sf100 — build it first: python tools/make_scale.py 1000 .scale/sf100 --embed-dim 256")
        return 2
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check.py"), sf100, *FEASIBLE],
        cwd=REPO,
        env=env,
    )
    return r.returncode


if __name__ == "__main__":
    sys.exit(main())
