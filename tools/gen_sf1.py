#!/usr/bin/env python3
"""Deterministic sf1 test-data builder (scale evidence, VERDICT r5 #1).

The driver ships sf0.001/0.01/0.1 (read-only). For the 10x scale-up run
we derive sf1 under the REPO's testdata/ dir (never /root/testdata):

- Relational tables (customer/supplier/part/orders/lineitem/events):
  10 offset-replicated copies of sf0.1 -- keys are dense 0-based, so
  copy i shifts every key column by i*count(table). FK integrity and
  every non-key value distribution are preserved exactly; key-derived
  names (Customer#/Supplier#) are rebuilt from the new key. This is
  indistinguishable from a larger run of the same generator for the
  relational battery.
- region/nation: fixed dims, copied as-is (TPC-H does not scale them).
- documents: replication would plant a pathological 10-copy dup group on
  EVERY doc and turn the dedup family into a different workload, so sf1
  documents are a FRESH draw from the observed generative process:
  uniform random words from sf0.1's vocabulary, lengths uniform 10..100,
  lang/source from the observed marginals, exact-dup pairs planted at
  the observed rate (8 per 5000).
- embeddings: fresh uniform random unit vectors (the observed process:
  spread ~1, center-norm ~1/sqrt(n), zero planted near-dup pairs),
  labels uniform 0..9.

Physical parquet types are preserved via schema casts -- whatever type
the source corpus generation uses for events.ts (int64 nanos through
round 6, timestamp[us] NTZ since round 7's environment shift) carries
through, and graft.queries.Tables.events schema-dispatches on load.

Usage: python3 tools/gen_sf1.py [outDir]   (default testdata/sf1)

`--copies N` scales further (N x sf0.1; default 10 = sf1) and
`--tables a,b` restricts generation — the VERDICT r6 #6 sf10 spot-run
of the dedup/ANN families needs only documents+embeddings at 100 x:

  python3 tools/gen_sf1.py testdata/sf10 --copies 100 \
      --tables documents,embeddings
"""
import argparse
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_ap = argparse.ArgumentParser()
_ap.add_argument("out", nargs="?", default="testdata/sf1")
_ap.add_argument("--copies", type=int, default=10)
_ap.add_argument("--tables", default="",
                 help="comma-separated subset; default all")
_ap.add_argument("--vocab", choices=["observed", "heaps"],
                 default="observed",
                 help="documents vocabulary: 'observed' reuses sf0.1's "
                 "fixed ~50-word vocabulary at every scale (the "
                 "worst case for LSH bucket occupancy — shingle space "
                 "fixed while N grows); 'heaps' draws a synthetic "
                 "vocabulary that grows as V = 3*sqrt(total_tokens) "
                 "(Heaps' law, beta=0.5) with Zipf(1.1) frequencies — "
                 "the natural-text shape, for measuring what the "
                 "MaxBandBucket occupancy cap costs on a corpus whose "
                 "vocabulary scales with it (VERDICT r12 #4)")
_args = _ap.parse_args()

SRC = "/root/testdata/sf0.1"
OUT = _args.out
COPIES = _args.copies
ONLY = set(filter(None, _args.tables.split(",")))
SEED = 42_000_001


def wanted(name):
    return not ONLY or name in ONLY

# Row groups sized so every table yields MANY input splits (Spark assigns
# one task per row group when byte-range splitting can't cut inside a
# group). A single 50k-row row group made the whole documents scan ONE
# partition -- every non-repartitioned operator serialized on one core.
# Real 100 TB datasets arrive as thousands of files/row groups; the
# generator must reproduce that property, not fight it.
ROW_GROUPS = {
    "customer": 16 * 1024, "supplier": 4 * 1024, "part": 32 * 1024,
    "orders": 128 * 1024, "lineitem": 256 * 1024, "events": 64 * 1024,
    "documents": 4 * 1024, "embeddings": 2 * 1024,
    "region": 1024, "nation": 1024,
}

import os
os.makedirs(OUT, exist_ok=True)


def load(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def write(name, table, schema):
    pq.write_table(table.cast(schema), f"{OUT}/{name}.parquet",
                   row_group_size=ROW_GROUPS[name])
    print(f"{name}: {table.num_rows} rows, "
          f"{ROW_GROUPS[name]}-row groups")


def replicate(name, offsets, renames=None):
    """10 copies; column c gets +i*offsets[c]; renames[c](key_array) rebuilds
    a key-derived column from the already-shifted key."""
    t = load(name)
    parts = []
    for i in range(COPIES):
        cols = {}
        for c in t.column_names:
            col = t.column(c)
            if c in offsets and i > 0:
                col = pc.add(col, i * offsets[c])
            cols[c] = col
        if renames:
            for c, fn in renames.items():
                cols[c] = fn(cols)
        parts.append(pa.table([cols[c] for c in t.column_names],
                              names=t.column_names))
    write(name, pa.concat_tables(parts), t.schema)


def key_name(prefix, key_col):
    keys = key_col.to_numpy(zero_copy_only=False)
    return pa.array([f"{prefix}#{k:09d}" for k in keys], pa.string())


def main():
    # fixed dims: straight copies
    for name in ("region", "nation"):
        if wanted(name):
            t = load(name)
            write(name, t, t.schema)

    if wanted("customer"):
        replicate("customer", {"c_custkey": 15000},
                  renames={"c_name": lambda c: key_name("Customer", c["c_custkey"])})
    if wanted("supplier"):
        replicate("supplier", {"s_suppkey": 1000},
                  renames={"s_name": lambda c: key_name("Supplier", c["s_suppkey"])})
    if wanted("part"):
        replicate("part", {"p_partkey": 20000})
    if wanted("orders"):
        replicate("orders", {"o_orderkey": 150000, "o_custkey": 15000})
    if wanted("lineitem"):
        replicate("lineitem",
                  {"l_orderkey": 150000, "l_partkey": 20000, "l_suppkey": 1000})
    if wanted("events"):
        replicate("events", {"event_id": 100000, "user_id": 1500})

    rng = np.random.default_rng(SEED)

    if not wanted("documents") and not wanted("embeddings"):
        return

    if wanted("documents"):
        # documents: fresh draw from the observed process
        src_docs = load("documents")
        vocab = sorted({w for txt in src_docs.column("text").to_pylist()
                        if txt is not None for w in txt.split(" ")})
        # BMP non-ASCII vocabulary (multi-byte UTF-8): the generated
        # corpora force the byte-vs-character question on every text and
        # media operator at the scale gates, instead of the driver
        # corpus's ASCII luck. BMP ONLY: Spark's charAt-based folds see
        # UTF-16 code units while DuckDB's ascii() sees code points --
        # equal exactly on the BMP (a non-BMP char would diverge by
        # construction, and the media family reads UTF-8 BYTES anyway).
        vocab += ["café", "naïve", "über", "déjà", "niño", "çay",
                  "tårta", "żółć", "φάρος", "κήπος", "чай", "мир",
                  "日本語", "汉字", "한글", "ありがとう"]
        langs, lang_counts = np.unique(
            np.array(src_docs.column("lang").to_pylist()), return_counts=True)
        lang_p = lang_counts / lang_counts.sum()
        n_docs = src_docs.num_rows * COPIES
        lengths = rng.integers(10, 101, size=n_docs)
        if _args.vocab == "heaps":
            # natural-text shape: vocabulary grows with the corpus
            # (Heaps V = K*T^beta, K=3, beta=0.5) and word frequencies
            # follow Zipf. Words are deterministic synthetic tokens;
            # the multi-byte forcing set stays appended so the
            # byte-vs-character gates keep firing.
            total_tokens = int(lengths.sum())
            v_size = max(64, int(3 * np.sqrt(total_tokens)))
            synth = np.array([f"w{i:06d}" for i in range(v_size)])
            vocab_arr = np.concatenate([synth, np.array(vocab[-16:])])
            ranks = np.arange(1, len(vocab_arr) + 1, dtype=np.float64)
            zipf_p = ranks ** -1.1
            zipf_p /= zipf_p.sum()
            # one bulk draw (per-doc rng.choice(p=...) re-cumsums the
            # distribution 500k times at sf10)
            flat = rng.choice(len(vocab_arr), size=total_tokens, p=zipf_p)
            offs = np.concatenate([[0], np.cumsum(lengths)])
            texts = [" ".join(vocab_arr[flat[offs[i]:offs[i + 1]]])
                     for i in range(n_docs)]
        else:
            vocab_arr = np.array(vocab)
            texts = [" ".join(
                vocab_arr[rng.integers(0, len(vocab_arr), size=n)])
                for n in lengths]
        # planted exact dups at the observed rate (8 per 5000 docs, group size 2)
        n_dups = 8 * COPIES
        dup_to = rng.choice(np.arange(n_docs // 2, n_docs), size=n_dups, replace=False)
        dup_from = rng.integers(0, n_docs // 2, size=n_dups)
        for a, b in zip(dup_to, dup_from):
            texts[a] = texts[b]
        doc_lang = rng.choice(langs, size=n_docs, p=lang_p)
        doc_src = np.char.add("src", rng.integers(0, 20, size=n_docs).astype(str))
        write("documents", pa.table({
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(doc_lang, pa.string()),
            "source": pa.array(doc_src, pa.string()),
            "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
        }), src_docs.schema)

    if not wanted("embeddings"):
        return

    # embeddings: fresh uniform random unit vectors. Dedicated stream so a
    # --tables subset draws identical data to the full run.
    rng = np.random.default_rng(SEED + 1)
    src_emb = load("embeddings")
    n_vec = src_emb.num_rows * COPIES
    dim = len(src_emb.column("embedding")[0])
    vecs = rng.standard_normal((n_vec, dim)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n_vec), pa.int32()),
    }), src_emb.schema)


if __name__ == "__main__":
    main()
