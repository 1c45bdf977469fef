"""Synthesize a one-size-up bench input ("sf1") from the sf0.1 testdata.

The sf0.1 tables are small enough that JVM fixed costs dominate the bench
pins; this builds a 10x input at /tmp/modlyn_bench/sf1 so shuffle-bound
behavior dominates instead. Replication is LINEAR by construction — each
replica is decorrelated from the others so near-duplicate structure (the
quadratic-prone part) scales exactly 10x, never replica^2:

- events: ids offset per replica (user_id/event_id + r * 10^9) — new
  disjoint entities with the same per-entity burst structure.
- documents: doc_id offset; text passed through a per-replica bijective
  a-z rotation (str.translate). A bijection preserves every within-replica
  shingle equality (so the dup-cluster structure of sf0.1 repeats exactly
  10x) while making cross-replica shingle sets disjoint (no spurious
  cross-replica near-dups).
- embeddings: vec_id offset; vector dimensions rolled by replica index —
  norm-preserving, keeps within-replica geometry identical, decorrelates
  directions across replicas.
- lineitem/orders/customer/nation/region: symlinked from sf0.1 unchanged
  (only quoted for queries whose input actually scaled).

Usage: python scripts/make_bench_sf1.py [replicas] [out_dir]
"""

from __future__ import annotations

import os
import string
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
OFFSET = 10**9


def _rot_table(r: int) -> dict:
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    t = {}
    for s in (lower, upper):
        for i, ch in enumerate(s):
            t[ord(ch)] = ord(s[(i + r) % 26])
    return t


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/modlyn_bench/sf1"
    os.makedirs(out, exist_ok=True)

    ev = pd.read_parquet(f"{SRC}/events.parquet")
    pd.concat(
        [
            ev.assign(
                event_id=ev["event_id"] + r * OFFSET,
                user_id=ev["user_id"] + r * OFFSET,
            )
            for r in range(replicas)
        ],
        ignore_index=True,
    ).to_parquet(f"{out}/events.parquet", index=False)

    docs = pd.read_parquet(f"{SRC}/documents.parquet")
    parts = []
    for r in range(replicas):
        t = _rot_table(r)
        parts.append(
            docs.assign(
                doc_id=docs["doc_id"] + r * OFFSET,
                text=docs["text"].map(
                    lambda s, t=t: s.translate(t) if isinstance(s, str) else s
                ),
            )
        )
    pd.concat(parts, ignore_index=True).to_parquet(
        f"{out}/documents.parquet", index=False
    )

    emb = pd.read_parquet(f"{SRC}/embeddings.parquet")
    dim = len(emb["embedding"].iloc[0])
    parts = []
    for r in range(replicas):
        parts.append(
            emb.assign(
                vec_id=emb["vec_id"] + r * OFFSET,
                embedding=emb["embedding"].map(
                    lambda v, r=r: np.roll(np.asarray(v), r % dim).tolist()
                ),
            )
        )
    pd.concat(parts, ignore_index=True).to_parquet(
        f"{out}/embeddings.parquet", index=False
    )

    for t in ["lineitem", "orders", "customer", "nation", "region",
              "supplier", "part"]:
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)

    import pyarrow.parquet as pq

    for t in ["events", "documents", "embeddings"]:
        n = pq.ParquetFile(f"{out}/{t}.parquet").metadata.num_rows
        print(f"{t}: {n:,} rows")
    print(f"wrote {out} (replicas={replicas})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
