"""The retuned-knob scale octave (r4 VERDICT item #7).

The 100x extrapolation argument for the banded families rests on the
claim that band/plane counts are "a config, not a plan change": as the
corpus grows, per-bucket pair cost is held flat by RETUNING the knobs
(more minhash rows per band, more hyperplanes), not by changing the
plan. This tool MEASURES that claim across a 30x octave:

  for each family, report
    - wall time, and
    - pair work = sum over band buckets of C(bucket_size, 2)
      (the exact candidate-generation cost driver), normalized per
      input row,
  at (small fixture, baseline knobs), (30x fixture, baseline knobs —
  the blowup you would ship by NOT retuning), and (30x fixture,
  retuned knobs — the flat line the claim requires).

Usage: python tools/scale_octave.py [small_dir] [big_dir] [--families minhash,simhash,emb,ann]
       (defaults /root/testdata/sf0.1 /tmp/scale30; build the big
        fixture first: python tools/make_scale_fixture.py /tmp/scale30 30)

Prints one JSON line per (family, scale, knobs) row plus a readable
table; paste the table into PERFORMANCE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def pair_work(banded, key_cols) -> float:
    """sum over buckets of n*(n-1)/2 — the candidate-join cost."""
    row = (
        banded.groupBy(*key_cols)
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("w"))
        .first()
    )
    return float(row["w"] or 0.0)


def simhash_banded(docs, bands, max_hamming=3):
    """The operator's REAL candidate tables (combinatorial banding,
    shared code path) so pair_work measures what the join sees."""
    from bht_etl_app_spark.operators.dedup import (
        simhash64,
        simhash_banded_frame,
        simhash_pick,
    )

    sig = simhash64(docs)
    return simhash_banded_frame(sig, bands, simhash_pick(bands, max_hamming))


def emb_banded(emb, n_planes, bands, dim):
    from bht_etl_app_spark.operators.similarity import (
        hyperplane_bucket_expr,
        lsh_planes,
    )

    planes = lsh_planes(n_planes, dim, seed=42)
    rpb = n_planes // bands
    mask = (1 << rpb) - 1
    sig = emb.select(
        "vec_id", hyperplane_bucket_expr(F.col("embedding"), planes).alias("s")
    )
    return sig.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright(F.col("s"), b * rpb)
                    .bitwiseAND(F.lit(mask))
                    .alias("bk"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("vec_id", "bb.band", "bb.bk")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("small", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("big", nargs="?", default="/tmp/scale30")
    ap.add_argument("--families", default="minhash,simhash,emb,ann")
    args = ap.parse_args()

    from bht_etl_app_spark import get_spark
    from bht_etl_app_spark.operators.dedup import (
        embedding_lsh_near_dup_pairs,
        minhash_bands,
        minhash_lsh_pairs,
        simhash_near_dup_pairs,
    )
    from bht_etl_app_spark.operators.similarity import ann_lsh_topk, lsh_planes

    spark = get_spark("scale-octave")
    spark.sparkContext.setLogLevel("ERROR")
    fams = set(args.families.split(","))

    def docs(d):
        return spark.read.parquet(os.path.join(d, "documents.parquet"))

    def emb(d):
        return spark.read.parquet(os.path.join(d, "embeddings.parquet"))

    n_small_docs = docs(args.small).count()
    n_big_docs = docs(args.big).count()
    n_small_emb = emb(args.small).count()
    n_big_emb = emb(args.big).count()
    # warm the session before any timed row: the first action in a
    # fresh JVM pays executor spin-up + whole-stage-codegen compile
    # (~10s), which otherwise lands entirely on the first family's
    # "small" measurement (the r4 run recorded minhash small at 170s
    # vs 60s big for exactly this reason)
    minhash_lsh_pairs(docs(args.small), threshold=0.5).count()
    spark.catalog.clearCache()
    from bht_etl_app_spark.functions.lifecycle import sweep_checkpoints

    sweep_checkpoints(spark.sparkContext)
    data_ratio = n_big_docs / n_small_docs
    rows = []

    def record(family, scale, knobs, wall, pw, n_rows):
        r = {
            "family": family, "scale": scale, "knobs": knobs,
            "wall_s": round(wall, 2),
            "pair_work": pw, "pairs_per_row": round(pw / n_rows, 3),
        }
        rows.append(r)
        print(json.dumps(r), flush=True)

    def run(family, scale, knobs, full_fn, banded_fn, n_rows):
        t0 = time.perf_counter()
        full_fn().collect()
        wall = time.perf_counter() - t0
        pw = pair_work(*banded_fn())
        spark.catalog.clearCache()
        from bht_etl_app_spark.functions.lifecycle import sweep_checkpoints

        sweep_checkpoints(spark.sparkContext)
        record(family, scale, knobs, wall, pw, n_rows)

    if "minhash" in fams:
        # baseline 16 hashes / 4 bands (r=4); retuned doubles the rows
        # per band (r=8) — random band collisions drop ~quadratically
        for scale, d, nh, n_rows in (
            ("small", args.small, 16, n_small_docs),
            ("big-baseline", args.big, 16, n_big_docs),
            ("big-retuned", args.big, 32, n_big_docs),
        ):
            run(
                "minhash", scale, f"num_hashes={nh},bands=4",
                lambda d=d, nh=nh: minhash_lsh_pairs(
                    docs(d), threshold=0.5, num_hashes=nh, bands=4
                ),
                lambda d=d, nh=nh: (
                    minhash_bands(docs(d), num_hashes=nh, bands=4),
                    ["band", "bh"],
                ),
                n_rows,
            )

    if "simhash" in fams:
        # baseline bands=4 (one 16-bit block per table — quadratic
        # bucket growth past ~2^16 docs, measured r4); retuned bands=8
        # (Manku combinatorial: C(8,5)=56 tables on 40-bit keys)
        for scale, d, bnd, n_rows in (
            ("small", args.small, 4, n_small_docs),
            ("big-baseline", args.big, 4, n_big_docs),
            ("big-retuned", args.big, 8, n_big_docs),
        ):
            run(
                "simhash", scale, f"max_hamming=3,bands={bnd}",
                lambda d=d, bnd=bnd: simhash_near_dup_pairs(
                    docs(d), max_hamming=3, bands=bnd
                ),
                lambda d=d, bnd=bnd: (
                    simhash_banded(docs(d), bnd), ["band", "bk"]
                ),
                n_rows,
            )

    dim = len(emb(args.small).select("embedding").first()[0])
    if "emb" in fams:
        # baseline 16 planes / 4 bands (4-bit band keys — 16 buckets);
        # retuned 32 planes / 4 bands (8-bit keys — 256 buckets)
        for scale, d, np_, n_rows in (
            ("small", args.small, 16, n_small_emb),
            ("big-baseline", args.big, 16, n_big_emb),
            ("big-retuned", args.big, 32, n_big_emb),
        ):
            run(
                "emb-lsh", scale, f"n_planes={np_},bands=4",
                lambda d=d, np_=np_: embedding_lsh_near_dup_pairs(
                    emb(d), lsh_planes(np_, dim, seed=42), bands=4,
                    threshold=0.95,
                ),
                lambda d=d, np_=np_: (
                    emb_banded(emb(d), np_, 4, dim),
                    ["band", "bk"],
                ),
                n_rows,
            )

    if "ann" in fams:
        # query-time op: bucket-restricted scoring; knob = plane count
        # (bucket granularity). pair_work for a query op is the probe
        # SET size (rows scored), not a self-join: report rows in the
        # query's probe buckets per total rows.
        qv = emb(args.small).select("embedding").first()[0]
        for scale, d, np_, n_rows in (
            ("small", args.small, 8, n_small_emb),
            ("big-baseline", args.big, 8, n_big_emb),
            ("big-retuned", args.big, 12, n_big_emb),
        ):
            planes = lsh_planes(np_, dim, seed=42)
            t0 = time.perf_counter()
            ann_lsh_topk(
                emb(d), list(qv), planes, k=10, multiprobe_bits=1
            ).collect()
            wall = time.perf_counter() - t0
            from bht_etl_app_spark.operators.similarity import (
                hyperplane_bucket_expr,
            )

            qbits = 0
            for i, p in enumerate(planes):
                s = sum(float(a) * float(b) for a, b in zip(qv, p))
                if s > 0:
                    qbits |= 1 << i
            probes = [qbits] + [qbits ^ (1 << i) for i in range(np_)]
            scanned = (
                emb(d)
                .where(
                    hyperplane_bucket_expr(F.col("embedding"), planes).isin(
                        probes
                    )
                )
                .count()
            )
            record(
                "ann-lsh", scale, f"n_planes={np_},probe_bits=1",
                wall, float(scanned), n_rows,
            )

    print()
    print(f"data ratio (docs): {data_ratio:.1f}x")
    hdr = f"{'family':10s} {'scale':13s} {'knobs':26s} {'wall_s':>7s} {'pairs/row':>10s}"
    print(hdr)
    for r in rows:
        print(
            f"{r['family']:10s} {r['scale']:13s} {r['knobs']:26s} "
            f"{r['wall_s']:7.2f} {r['pairs_per_row']:10.3f}"
        )


if __name__ == "__main__":
    main()
