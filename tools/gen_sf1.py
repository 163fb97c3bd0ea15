"""Deterministic sf1 corpus (10× sf0.1) for the bench's scale rung.

The driver ships sf0.001/0.01/0.1 only; the sub-linear-shuffle claims
of the dedup/ANN/textstats operators deserve one decade more rows, so
this synthesizes documents/embeddings tables with sf0.1's empirical
per-row statistics (same 31-word vocabulary and word frequencies, same
10..100 word lengths, same lang/source mix, same exact-dup rate, same
64-dim embedding scale and 10-label structure) at 10× the row count —
per-row operator work is then comparable across the two scales and any
per-row cost growth is shuffle/plan overhead, which is what the rung
measures. Pure numpy+pyarrow (no JVM); ~2 s; cached by a _SUCCESS
marker keyed on (mult, seed).
"""

from __future__ import annotations

import os
import shutil

import numpy as np

SEED = 20260817
DEFAULT_BASE = "/tmp/ragflow_sf1"


def ensure_sf1(
    src_dir: str = "/root/testdata/sf0.1",
    base: str | None = None,
    mult: int = 10,
) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = base or DEFAULT_BASE
    path = f"{base}_x{mult}_s{SEED}"
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    src_docs = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    texts = src_docs.column("text").to_pylist()
    langs = src_docs.column("lang").to_pylist()
    rng = np.random.default_rng(SEED)

    # empirical word frequencies from the source corpus
    from collections import Counter

    wc: Counter = Counter()
    for t in texts:
        wc.update(t.split(" "))
    vocab = sorted(wc)
    freq = np.array([wc[w] for w in vocab], dtype=np.float64)
    freq /= freq.sum()
    lang_vals, lang_counts = np.unique(langs, return_counts=True)
    lang_p = lang_counts / lang_counts.sum()

    n = len(texts) * mult
    lens = rng.integers(10, 101, n)
    word_idx = rng.choice(len(vocab), size=int(lens.sum()), p=freq)
    vocab_arr = np.array(vocab)
    out_texts: list[str] = []
    pos = 0
    for ln in lens:
        out_texts.append(" ".join(vocab_arr[word_idx[pos : pos + ln]]))
        pos += ln
    # exact-dup rate ~0.16% (sf0.1 has 8/5000): copy earlier texts
    n_dup = max(1, int(round(n * 8 / 5000)))
    dup_to = rng.choice(n, size=n_dup, replace=False)
    dup_from = rng.integers(0, n, n_dup)
    for a, b in zip(dup_to, dup_from):
        if a != b:
            out_texts[int(a)] = out_texts[int(b)]
    doc_ids = np.arange(n, dtype=np.int64)
    docs = pa.table(
        {
            "doc_id": doc_ids,
            "text": out_texts,
            "lang": np.array(lang_vals)[
                rng.choice(len(lang_vals), size=n, p=lang_p)
            ],
            "source": np.char.add("src", (doc_ids % 20).astype(str)),
            "n_chars": np.array([len(t) for t in out_texts], np.int64),
        }
    )
    pq.write_table(docs, os.path.join(path, "documents.parquet"))

    src_emb = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))
    n_emb = src_emb.num_rows * mult
    dim = len(src_emb.column("embedding")[0])
    n_labels = len(set(src_emb.column("label").to_pylist()))
    centers = rng.normal(0, 0.12, (n_labels, dim))
    lab = rng.integers(0, n_labels, n_emb)
    vecs = (centers[lab] + rng.normal(0, 0.08, (n_emb, dim))).astype(
        np.float32
    )
    emb = pa.table(
        {
            "vec_id": np.arange(n_emb, dtype=np.int64),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": lab.astype(np.int64),
        }
    )
    pq.write_table(emb, os.path.join(path, "embeddings.parquet"))
    with open(marker, "w"):
        pass
    return path


if __name__ == "__main__":
    print(ensure_sf1())
