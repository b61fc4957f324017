"""Build a skew-stress fixture: a zipfian-keyed fact table + a dim too big
to broadcast — the regime where a shuffled equi-join collapses onto the
reducers owning the hot keys.

The driver's generated events table is uniform in user_id, so the repo's
skew machinery (AQE skew-join splitting, plans/salting.py) is only ever
exercised by unit tests. This fixture makes it MEASURABLE: bench.py grows
a "skew" section when this directory exists, timing the same join three
ways (AQE skew split off / on / explicit salting) so a plan-engagement
regression shows up as a wall-clock number, not a green test.

Shape (deterministic, seeded):
- events_skew.parquet: N rows (default 16M). user_id mix: 25% on key 0,
  10% on key 1, 5% on key 2, remainder uniform over 400k keys — a hot
  partition ~13x the average, well past AQE's 5x/256MB split thresholds
  scaled down by the advisory partition size.
- users_dim.parquet: 400k rows with a 64-char payload (~90MB on disk),
  over get_spark's 64MB broadcast threshold, so the join shuffles.

Usage: python tools/make_skew.py [n_rows] [out_dir]   (default 16M,
.scale/skew under the repo root — gitignored).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_USERS = 400_000
HOT = [(0, 0.25), (1, 0.10), (2, 0.05)]


def build(n_rows: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(20260814)

    parts = []
    for key, frac in HOT:
        parts.append(np.full(int(n_rows * frac), key, dtype=np.int64))
    rest = n_rows - sum(len(p) for p in parts)
    parts.append(rng.randint(0, N_USERS, size=rest).astype(np.int64))
    user_id = np.concatenate(parts)
    rng.shuffle(user_id)

    events = pa.table(
        {
            "event_id": pa.array(np.arange(n_rows, dtype=np.int64)),
            "user_id": pa.array(user_id),
            "amount": pa.array(np.round(rng.uniform(0, 100, size=n_rows), 2)),
        }
    )
    pq.write_table(events, f"{out_dir}/events_skew.parquet")

    pad = "x" * 64
    dim = pa.table(
        {
            "user_id": pa.array(np.arange(N_USERS, dtype=np.int64)),
            "segment": pa.array((np.arange(N_USERS) % 7).astype(np.int32)),
            "payload": pa.array([f"{pad}{i}" for i in range(N_USERS)]),
        }
    )
    pq.write_table(dim, f"{out_dir}/users_dim.parquet", compression="none")
    print(f"wrote {out_dir}: events {n_rows} rows, dim {N_USERS} rows")


def build_intervals(out_dir: str, hot_rows: int = 60_000, n_cold: int = 119) -> None:
    """Interval-SKEW fixture — SURVEY §7's flagged regime: one 3-hour
    video among 10-minute clips.  Video 0 spans 10800s and carries
    `hot_rows` intervals PER SIDE; videos 1..n_cold span 600s with ~800
    intervals each.  An overlap join keyed on video_id alone sends the
    hot video's hot_rows x hot_rows candidate cross-product (3.6e9 at the
    default) to ONE task; the banded join splits it across (video, band)
    buckets — the rehearsal times both and records the ratio.

    Two tables (iv_a / iv_b), both (video_id, item_id, start, end) with
    2-10s interval lengths, deterministic seed."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(20260815)

    def side(tag: int) -> "pa.Table":
        vids, starts, lens = [], [], []
        # hot video 0: 3 hours
        vids.append(np.zeros(hot_rows, dtype=np.int64))
        starts.append(rng.uniform(0, 10800, size=hot_rows))
        lens.append(rng.uniform(2, 10, size=hot_rows))
        # cold 10-minute clips
        for v in range(1, n_cold + 1):
            n = 800
            vids.append(np.full(n, v, dtype=np.int64))
            starts.append(rng.uniform(0, 600, size=n))
            lens.append(rng.uniform(2, 10, size=n))
        vid = np.concatenate(vids)
        s = np.round(np.concatenate(starts), 3)
        e = np.round(s + np.concatenate(lens), 3)
        return pa.table(
            {
                "video_id": pa.array(vid),
                "item_id": pa.array(np.arange(len(vid), dtype=np.int64) + tag * 10_000_000),
                "start": pa.array(s),
                "end": pa.array(e),
            }
        )

    pq.write_table(side(0), f"{out_dir}/iv_a.parquet")
    pq.write_table(side(1), f"{out_dir}/iv_b.parquet")
    print(
        f"wrote {out_dir}: iv_a/iv_b — hot video 0 with {hot_rows} rows/side "
        f"(3h span), {n_cold} cold clips (600s, 800 rows/side)"
    )


if __name__ == "__main__":
    if "--intervals" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        out = args[0] if args else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale", "skew_intervals",
        )
        build_intervals(out)
        sys.exit(0)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "skew"
        )
    )
    build(n, out)
