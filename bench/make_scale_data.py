"""Build a larger profiling dataset by stacking key-shifted copies of
an existing testdata scale factor (guide §1: measure at the scale that
hurts).  The driver's round-end MEASUREMENT may run bench.py at a
larger, driver-generated sf than the local /root/testdata tree holds;
this tool approximates that scale locally so optimizations can be
validated where the pain actually shows (several hot queries were
superlinear between sf0.1 and the driver's sf1.0).

Every copy shifts the 0-based contiguous keys by copy_index * base_rows
so the stacked table is indistinguishable from a natively bigger
generation for join cardinality and modular synth arithmetic
(event_id % k cycles identically).  Text/embedding payloads are
perturbed per copy so dedup/LSH entries don't see artificial 10x exact
duplicates.  nation/region stay fixed (dimension tables).

Usage: python bench/make_scale_data.py [--mult 10] [--src DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFTS = {
    "customer": {"c_custkey": 15000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 1500},
    "documents": {"doc_id": 5000},
    "embeddings": {"vec_id": 2000},
    "part": {"p_partkey": 20000},
    "supplier": {"s_suppkey": 1000},
}
FIXED = ["nation", "region"]


def scale_table(src: str, out: str, name: str, mult: int) -> None:
    base = pq.read_table(os.path.join(src, f"{name}.parquet"))
    copies = []
    rng = np.random.default_rng(12345)
    for i in range(mult):
        t = base
        for col, unit in SHIFTS[name].items():
            shifted = pc.add(t[col], pa.scalar(i * unit, t.schema.field(col).type))
            t = t.set_column(t.schema.get_field_index(col), col, shifted)
        if name == "documents" and i > 0:
            # Interleave a per-copy salt token every 3 words: a prefix
            # alone leaves every interior shingle identical across
            # copies, so the copies' near-dup clusters MERGE into 10x
            # LSH buckets (measured: bucket sum-of-squares grew 96x
            # for 10x rows — a stacking artifact a native generation
            # does not have; cluster count scales, cluster size does
            # not).  Salting every n-gram window keeps each copy's
            # dup structure internal, like independently generated
            # docs.
            salt = f"copyv{i}x"
            texts = t["text"].to_pylist()
            out_texts = []
            for s in texts:
                if s is None:
                    out_texts.append(None)
                    continue
                w = s.split(" ")
                chunks = []
                for j in range(0, len(w), 3):
                    chunks.append(" ".join(w[j:j + 3]))
                out_texts.append(
                    (salt + " ") + f" {salt} ".join(chunks)
                )
            t = t.set_column(
                t.schema.get_field_index("text"), "text",
                pa.array(out_texts, type=pa.string()),
            )
        if name == "embeddings" and i > 0:
            emb = t["embedding"].combine_chunks()
            vals = emb.values.to_numpy(zero_copy_only=False)
            noise = rng.normal(0, 0.05, size=vals.shape).astype(np.float32)
            newvals = pa.array(vals + noise, type=pa.float32())
            newemb = pa.ListArray.from_arrays(emb.offsets, newvals)
            t = t.set_column(
                t.schema.get_field_index("embedding"), "embedding", newemb
            )
        copies.append(t)
    stacked = pa.concat_tables(copies)
    pq.write_table(stacked, os.path.join(out, f"{name}.parquet"),
                   compression="zstd", row_group_size=200_000)
    print(name, stacked.num_rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/sf1x")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name in SHIFTS:
        scale_table(args.src, args.out, name, args.mult)
    for name in FIXED:
        t = pq.read_table(os.path.join(args.src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(args.out, f"{name}.parquet"))
        print(name, t.num_rows)


if __name__ == "__main__":
    main()
