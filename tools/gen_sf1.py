"""Synthesize sf1 fixtures (~10× sf0.1) for the scale-proof bench run.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md, read-only), so sf1 is
built locally from sf0.1:

- RELATIONAL tables (customer/supplier/part/orders/lineitem/events) are
  REPLICATED 10× with per-copy key offsets on every key column — value
  distributions, join selectivities and referential integrity are preserved
  exactly (copy i's orders point at copy i's customers), and the
  deterministic trips derivation (plans/trips.trips_raw: golden text by
  event_id % n) keeps the same text-distinct profile. region/nation are
  dimension constants and copied as-is.
- DOCUMENTS / EMBEDDINGS are REGENERATED at 10× count with a seeded
  generator fitted to the observed sf0.1 statistics (vocab, token-count
  distribution, (lang, source) joint empirical distribution, ~5% near-dup
  rate via token dropout; per-label Gaussian clusters + ~1% perturbation
  near-dup partners for embeddings). Plain 10× replication would make
  every document a 10-way EXACT duplicate — a degenerate dedup workload
  where candidate fan-out is dominated by replication artifacts rather
  than the organic dup rate.

Output: $OUT_DIR (default /tmp/sf1), one parquet per table, same schemas
as sf0.1. Usage: python tools/gen_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10
SEED = 20260814

# key columns to offset per copy, per table (offset = copy_idx * (max+1))
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
# offsets must be consistent across tables (orders.o_custkey uses the
# customer key-space size, etc.): column -> (owning table, primary key)
KEY_SPACE = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
}


def replicate(name: str, out_dir: str, spans: dict[str, int]) -> None:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    chunks = []
    for i in range(COPIES):
        cols = []
        for field in t.schema:
            col = t.column(field.name)
            if field.name in KEYED.get(name, []):
                off = i * spans[field.name]
                arr = pa.compute.add(col, pa.scalar(off, type=field.type))
                cols.append(arr.cast(field.type))
            else:
                cols.append(col)
        chunks.append(pa.table(cols, schema=t.schema))
    out = pa.concat_tables(chunks)
    pq.write_table(out, f"{out_dir}/{name}.parquet")
    print(f"{name}: {t.num_rows} -> {out.num_rows}")


def copy_as_is(name: str, out_dir: str) -> None:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    pq.write_table(t, f"{out_dir}/{name}.parquet")
    print(f"{name}: {t.num_rows} (copied)")


def gen_documents(out_dir: str, rng: np.random.Generator) -> None:
    src = pq.read_table(f"{SRC}/documents.parquet").to_pydict()
    texts = src["text"]
    vocab = sorted({w for t in texts for w in t.split()})
    # Heaps' law: vocabulary grows ~N^0.6 with corpus size. Keeping the
    # sf0.1 vocab for a 10× corpus SATURATES the k-shingle space (measured:
    # distinct shingles stayed flat at ~30k while occurrences grew 10×, so
    # per-shingle df — and the equi-join's candidate volume, Σ df² — grew
    # quadratically: a fixture artifact real corpora don't have). Extend
    # the vocab to |V|·COPIES^0.6 with deterministic synthetic tokens.
    target_v = int(len(vocab) * COPIES**0.6)
    vocab = vocab + [f"w{i:04d}" for i in range(target_v - len(vocab))]
    vocab = np.array(vocab)
    tok_counts = np.array([len(t.split()) for t in texts])
    pairs = list(zip(src["lang"], src["source"]))
    uniq_pairs = sorted(set(pairs))
    pair_p = np.array([pairs.count(p) for p in uniq_pairs], dtype=float)
    pair_p /= pair_p.sum()

    n = len(texts) * COPIES
    dup_rate = 0.05  # observed: ~250 dup-marked of 5000
    lens = rng.choice(tok_counts, size=n)
    pair_idx = rng.choice(len(uniq_pairs), size=n, p=pair_p)
    out_texts: list[str] = []
    for i in range(n):
        if out_texts and rng.random() < dup_rate:
            # near-dup of a recent doc: ~10% token dropout + dup marker
            base = out_texts[rng.integers(max(0, len(out_texts) - 50), len(out_texts))]
            toks = [w for w in base.split() if rng.random() > 0.1]
            toks.append("dup")
            out_texts.append(" ".join(toks))
        else:
            out_texts.append(
                " ".join(rng.choice(vocab, size=int(lens[i])).tolist())
            )
    table = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(out_texts, type=pa.string()),
            "lang": pa.array([uniq_pairs[j][0] for j in pair_idx], type=pa.string()),
            "source": pa.array([uniq_pairs[j][1] for j in pair_idx], type=pa.string()),
            "n_chars": pa.array([len(t) for t in out_texts], type=pa.int64()),
        }
    )
    pq.write_table(table, f"{out_dir}/documents.parquet")
    print(f"documents: {len(texts)} -> {n} (regenerated)")


def gen_embeddings(out_dir: str, rng: np.random.Generator) -> None:
    src = pq.read_table(f"{SRC}/embeddings.parquet").to_pydict()
    labels = np.array(src["label"])
    mat = np.array([list(v) for v in src["embedding"]], dtype=np.float64)
    uniq = sorted(set(labels.tolist()))
    means = {l: mat[labels == l].mean(axis=0) for l in uniq}
    stds = {l: mat[labels == l].std(axis=0) for l in uniq}
    label_p = np.array([(labels == l).mean() for l in uniq])

    n = len(labels) * COPIES
    out_lab = rng.choice(uniq, size=n, p=label_p)
    vecs = np.empty((n, mat.shape[1]), dtype=np.float64)
    for l in uniq:
        m = out_lab == l
        vecs[m] = means[l] + stds[l] * rng.standard_normal((m.sum(), mat.shape[1]))
    # ~1% near-dup partners: tiny perturbation of the previous vector
    dup = rng.random(n) < 0.01
    dup[0] = False
    idx = np.nonzero(dup)[0]
    vecs[idx] = vecs[idx - 1] + 0.01 * rng.standard_normal((len(idx), mat.shape[1]))
    out_lab[idx] = out_lab[idx - 1]

    table = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(out_lab.astype("int32"), type=pa.int32()),
        }
    )
    pq.write_table(table, f"{out_dir}/embeddings.parquet")
    print(f"embeddings: {len(labels)} -> {n} (regenerated)")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out_dir, exist_ok=True)
    # span = max+1 of each key column in its OWN table, so copy i's offset
    # moves the whole key space (orders.o_custkey shares customer's span so
    # copy i's orders point at copy i's customers)
    spans: dict[str, int] = {}
    for col, (table, pk) in KEY_SPACE.items():
        arr = pq.read_table(f"{SRC}/{table}.parquet", columns=[pk])
        spans[col] = int(pa.compute.max(arr.column(pk)).as_py()) + 1
    rng = np.random.default_rng(SEED)
    for name in ["region", "nation"]:
        copy_as_is(name, out_dir)
    for name in ["customer", "supplier", "part", "orders", "lineitem", "events"]:
        replicate(name, out_dir, spans)
    gen_documents(out_dir, rng)
    gen_embeddings(out_dir, rng)
    print("done ->", out_dir)


if __name__ == "__main__":
    main()
