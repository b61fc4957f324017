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


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "skew"
        )
    )
    build(n, out)
