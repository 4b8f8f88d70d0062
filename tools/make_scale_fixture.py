"""Synthesize an N-times-larger documents/embeddings fixture from
sf0.1, for the bigger scale step the r3 judge asked for (skew
defenses — max_postings, banding, salting — only show up under more
data than sf0.1's 5k docs).

Usage: python tools/make_scale_fixture.py [out_dir] [multiplier]
       (defaults /tmp/scale10, 10)

Construction (fully deterministic — seeded by (doc_id, replica)):

- documents: every sf0.1 doc appears once verbatim (replica 0);
  replicas r>0 get the SAME token multiset deterministically
  permuted plus a few replica-salted tokens. Permutation destroys
  shingle structure, so replicas are NOT near-duplicates of their
  source — the near-dup pair count stays governed by the original
  dup rate instead of exploding quadratically with the multiplier
  (which would measure output growth, not plan behavior). Token and
  domain distributions are preserved.
- embeddings: fresh seeded-gaussian vectors per replica (same dim,
  labels cycled) — brand-new points, same geometry.
- the remaining sf0.1 tables are copied verbatim so warmers and
  mixed-table queries still resolve.
"""

from __future__ import annotations

import os
import random
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def build(out_dir: str, mult: int) -> None:
    os.makedirs(out_dir, exist_ok=True)

    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    d = docs.to_pylist()
    n0 = len(d)
    rows = []
    for r in range(mult):
        for row in d:
            if r == 0:
                rows.append(row)
                continue
            rng = random.Random(row["doc_id"] * 1000 + r)
            toks = row["text"].split()
            rng.shuffle(toks)
            # sprinkle replica-salted tokens (~2%) so even permuted
            # token BAGS differ
            for _ in range(max(1, len(toks) // 50)):
                toks.insert(
                    rng.randrange(len(toks) + 1),
                    f"r{r}x{rng.randrange(10_000)}",
                )
            text = " ".join(toks)
            rows.append(
                {
                    "doc_id": row["doc_id"] + r * n0,
                    "text": text,
                    "lang": row["lang"],
                    "source": row["source"],
                    "n_chars": len(text),
                }
            )
    pq.write_table(
        pa.Table.from_pylist(rows, schema=docs.schema),
        os.path.join(out_dir, "documents.parquet"),
    )

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    e = emb.to_pylist()
    m0 = len(e)
    dim = len(e[0]["embedding"])
    out_e = list(e)
    for r in range(1, mult):
        g = np.random.default_rng(1000 + r)
        vecs = g.standard_normal((m0, dim)).astype(np.float32)
        for i, row in enumerate(e):
            out_e.append(
                {
                    "vec_id": row["vec_id"] + r * m0,
                    "embedding": [float(x) for x in vecs[i]],
                    "label": (row["label"] + r) % 10,
                }
            )
    pq.write_table(
        pa.Table.from_pylist(out_e, schema=emb.schema),
        os.path.join(out_dir, "embeddings.parquet"),
    )

    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f not in ("documents.parquet", "embeddings.parquet"):
            dst = os.path.join(out_dir, f)
            if not os.path.exists(dst):
                shutil.copy(os.path.join(SRC, f), dst)
    print(f"wrote {len(rows)} docs, {len(out_e)} embeddings -> {out_dir}")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    build(out, mult)
