"""Scale the sf0.1 fixtures 10× into an sf1 evidence set.

Scaling recipe: 10 *namespaced* copies of sf0.1 rather than row
replication — replicated rows would turn every document into a
10-clone cluster and every near-dup workload quadratic in ways a real
10× crawl is not. Per copy k (k=0 is the original, verbatim):

- TPC-H tables: surrogate keys shift by k·10^7 (customer/supplier/
  part/orders/lineitem), preserving referential integrity within each
  copy; the tiny region/nation dimensions stay fixed, like TPC-H.
- events: event_id/user_id shift — 10× event density over the same
  time range (sessionization/watermark load grows, horizons don't).
- documents: doc_id shifts and every token gets a per-copy prefix
  (`q{k}`), so cross-copy Jaccard is ~0 while intra-copy shingle
  structure (the planted near-dups) is preserved exactly → near-dup
  pair volume scales linearly, like independent crawl shards.
- embeddings: vec_id shifts, labels shift by k·10 (blocked joins stay
  within a copy), and vectors get a per-copy seeded dimension
  permutation + sign flip — an orthogonal transform, so intra-copy
  norms/cosines are preserved bit-for-bit while cross-copy cosines
  decorrelate.

Deterministic (seeded), pure pyarrow/numpy — no Spark needed. Output
is an EVIDENCE artifact (bench + local drive at 10× bench scale);
nothing in the engine depends on it.

Usage: python tools/make_sf1.py [src_dir] [dst_dir]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

KOFF = 10_000_000
N_COPIES = 10

_KEY_SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}


def _shift(table: pa.Table, cols: list[str], k: int) -> pa.Table:
    for c in cols:
        i = table.schema.get_field_index(c)
        shifted = pc.add(table.column(c), pa.scalar(k * KOFF, pa.int64()))
        table = table.set_column(i, table.schema.field(i),
                                 shifted.cast(table.schema.field(i).type))
    if "p_brand" in table.column_names and k > 0:
        # Decorrelate part BRANDS across copies the same way document
        # tokens are namespaced. Verbatim-replicated (brand, name)
        # blocks make the fuzzy name join's candidate set AND its
        # output quadratic in the copy count (measured 130x runtime at
        # 10 copies) — a fixture artifact, not a 10x-corpus workload:
        # ten independent crawl shards don't share a key space. Brand
        # is the fuzzy join's equi-join block key, so a per-copy
        # suffix kills every cross-copy candidate before any
        # levenshtein runs, leaves names (and name-based LIKE
        # predicates / edit distances) untouched, and only grows brand
        # cardinality 10x — exactly what 10x more sources looks like
        # to the brand-grouped aggregates.
        i = table.schema.get_field_index("p_brand")
        brands = [f"{s}#{k}" for s in table.column("p_brand").to_pylist()]
        table = table.set_column(i, table.schema.field(i),
                                 pa.array(brands, pa.string()))
    return table


def _documents_copy(table: pa.Table, k: int) -> pa.Table:
    t = _shift(table, ["doc_id"], k)
    if k == 0:
        return t
    texts = [" ".join(f"q{k}{w}" for w in s.split())
             for s in t.column("text").to_pylist()]
    t = t.set_column(t.schema.get_field_index("text"), "text",
                     pa.array(texts, pa.string()))
    return t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                        pa.array([len(s) for s in texts], pa.int64()))


def _embeddings_copy(table: pa.Table, k: int) -> pa.Table:
    t = _shift(table, ["vec_id"], k)
    lbl = pc.add(t.column("label"), pa.scalar(k * 10, pa.int32()))
    t = t.set_column(t.schema.get_field_index("label"), "label",
                     lbl.cast(pa.int32()))
    if k == 0:
        return t
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    rs = np.random.RandomState(1000 + k)
    perm = rs.permutation(vecs.shape[1])
    signs = rs.choice(np.array([-1.0, 1.0], dtype=np.float32),
                      vecs.shape[1])
    out = vecs[:, perm] * signs
    emb = pa.array(out.tolist(), t.schema.field("embedding").type)
    return t.set_column(t.schema.get_field_index("embedding"),
                        t.schema.field("embedding"), emb)


def main(src: str, dst: str, n_copies: int = N_COPIES,
         only: set[str] | None = None) -> None:
    import os
    os.makedirs(dst, exist_ok=True)

    def want(name: str) -> bool:
        return only is None or name in only

    for name in ("region", "nation"):
        if not want(name):
            continue
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"),
                       f"{dst}/{name}.parquet")
        print(name, "copied")
    for name, cols in _KEY_SHIFTS.items():
        if not want(name):
            continue
        base = pq.read_table(f"{src}/{name}.parquet")
        parts = [_shift(base, cols, k) for k in range(n_copies)]
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(name, base.num_rows, "->", out.num_rows)
    if want("documents"):
        base = pq.read_table(f"{src}/documents.parquet")
        out = pa.concat_tables([_documents_copy(base, k)
                                for k in range(n_copies)])
        pq.write_table(out, f"{dst}/documents.parquet")
        print("documents", base.num_rows, "->", out.num_rows)
    if want("embeddings"):
        base = pq.read_table(f"{src}/embeddings.parquet")
        out = pa.concat_tables([_embeddings_copy(base, k)
                                for k in range(n_copies)])
        pq.write_table(out, f"{dst}/embeddings.parquet")
        print("embeddings", base.num_rows, "->", out.num_rows)


if __name__ == "__main__":
    # argv: [src [dst [n_copies [table ...]]]] — n_copies=100 over
    # sf0.1 builds an sf10 (100× bench scale) evidence set; naming a
    # table subset skips the rest (partial dirs are fine for queries
    # that only touch those tables)
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scratch/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else N_COPIES
    only = set(sys.argv[4:]) or None
    main(src, dst, n, only)
