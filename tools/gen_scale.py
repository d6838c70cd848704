"""Generate a larger SF by key-shifted replication of driver testdata.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only); the 100 TB
mandate wants at least one measured point ABOVE the bench SF to catch
plan flips (broadcast threshold crossings, BNL growth) the static plan
audit can't see. This tool derives sfN from sf0.1 by concatenating K
key-shifted copies:

- fact/dim keys (custkey, orderkey, partkey, suppkey, event_id,
  user_id, doc_id, vec_id) shift by copy_index * (max_key + 1), and
  every FOREIGN key shifts by its referenced table's offset — so join
  fan-outs, group sizes, and selectivities are IDENTICAL per copy and
  aggregate linearly, exactly what a scale probe wants;
- region/nation stay fixed (TPC-H dims don't scale with SF);
- event timestamps shift by copy_index * (span + 1h), so time-window
  DENSITY is constant (window count scales, rows-per-window doesn't);
- document text is letter-rotated (Caesar shift k) per copy: word
  lengths, whitespace, punctuation, and n_chars stay EXACT, intra-copy
  duplicate/near-duplicate structure is preserved bit-for-bit, but the
  shingle sets of different copies are disjoint — so the near-dup pair
  count scales LINEARLY with copies, like a real corpus, instead of
  giving every doc K-1 cross-copy near-duplicates (a trailing tag was
  measured to inflate q_near_dup_verified 11.8x at 10 copies);
- embeddings are cyclically dimension-rolled per copy: norms and all
  intra-copy cosines are preserved exactly, cross-copy similarity is
  scrambled, so ANN bucket occupancy scales linearly too.

This is a SCALE probe, not a correctness oracle input: parity still
runs against the driver's own sf0.01.

Usage: python tools/gen_scale.py <src_sf_dir> <out_dir> <copies>
       python tools/gen_scale.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

FIXED_DIMS = {"region", "nation"}

# table -> columns keyed by that table's own key space
OWN_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# table -> {column: key-space table}
FOREIGN = {
    "orders": {"o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"user_id": "events_user"},
}


def _max_plus_one(src: str, table: str, col: str) -> int:
    t = pq.read_table(f"{src}/{table}.parquet", columns=[col])
    return pc.max(t[col]).as_py() + 1


def generate(src: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    offsets = {
        name: _max_plus_one(src, name, cols[0])
        for name, cols in OWN_KEYS.items()
    }
    offsets["events_user"] = _max_plus_one(src, "events", "user_id")
    ev_ts = pq.read_table(f"{src}/events.parquet", columns=["ts"])["ts"]
    ts_span_us = (
        pc.max(ev_ts).cast(pa.int64()).as_py()
        - pc.min(ev_ts).cast(pa.int64()).as_py()
        + 3_600_000_000
    )
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for name in tables:
        t = pq.read_table(f"{src}/{name}.parquet")
        dst = f"{out}/{name}.parquet"
        if name in FIXED_DIMS:
            pq.write_table(t, dst)
            continue
        writer = pq.ParquetWriter(dst, t.schema)
        try:
            for k in range(copies):
                c = t
                shift_cols: dict[str, int] = {}
                for col in OWN_KEYS.get(name, []):
                    shift_cols[col] = k * offsets[name]
                for col, space in FOREIGN.get(name, {}).items():
                    shift_cols[col] = k * offsets[space]
                arrays = []
                for field in t.schema:
                    arr = c[field.name].combine_chunks()
                    if field.name in shift_cols and k > 0:
                        arr = pc.add(
                            arr, pa.scalar(shift_cols[field.name], field.type)
                        )
                    elif name == "events" and field.name == "ts" and k > 0:
                        arr = pc.add(
                            arr.cast(pa.int64()),
                            pa.scalar(k * ts_span_us, pa.int64()),
                        ).cast(field.type)
                    elif name == "documents" and field.name == "text" and k > 0:
                        shift = k % 25 + 1
                        lower = "abcdefghijklmnopqrstuvwxyz"
                        upper = lower.upper()
                        table = str.maketrans(
                            lower + upper,
                            lower[shift:] + lower[:shift]
                            + upper[shift:] + upper[:shift],
                        )
                        arr = pa.array(
                            [
                                None if s is None else s.translate(table)
                                for s in arr.to_pylist()
                            ],
                            type=field.type,
                        )
                    elif name == "embeddings" and field.name == "embedding" and k > 0:
                        import numpy as np

                        rolled = [
                            None
                            if v is None
                            else np.roll(np.asarray(v, dtype=np.float32), k).tolist()
                            for v in arr.to_pylist()
                        ]
                        arr = pa.array(rolled, type=field.type)
                    arrays.append(arr)
                writer.write_table(
                    pa.Table.from_arrays(arrays, schema=t.schema)
                )
        finally:
            writer.close()
        meta = pq.read_metadata(dst)
        print(f"{name}: {meta.num_rows} rows, {os.path.getsize(dst)>>20} MiB")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(src, out, copies)
