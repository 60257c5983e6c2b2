"""Train the model-based quality-filter golden: a fastText-style linear
domain classifier over hashed bag-of-ngram features.

The public method this mirrors (CCNet §4.4 / GPT-3 appendix A / DCLM):
train a linear classifier to separate a CURATED domain from the general
crawl, score every crawl document, and keep by score. The reference has
no model-based filter (its curation surface is the upsert pipeline), so
this is extension surface like the rest of the curation family — but it
is the single most load-bearing quality op a 100 TB pretraining pipeline
runs, and its Spark shape (broadcast weight join + one per-doc exchange)
is exactly the decontaminate/perplexity shape already pinned.

Determinism contract:
- Training corpus: sf0.01 ``documents``, doc_id order. POSITIVE domain =
  sources src0-src4 (the "curated" fifth of the corpus — each synthetic
  source has a distinct word distribution, so the classifier learns real
  signal; train accuracy is printed).
- Features: space-split lowercase unigrams + adjacent bigrams (the
  corpus tokenization convention used by every text operator here), df
  >= MIN_DF; x = count / total_feature_count (fastText's mean-of-buckets
  with OOV contributing to the denominator only).
- Optimizer: full-batch gradient descent in float64, fixed iterations /
  rate / L2 — bit-reproducible on any IEEE-754 machine, no RNG anywhere.
- Output: ``golden/quality_model.parquet`` (term, weight) and
  ``golden/quality_model_meta.parquet`` (bias, n_train, train_acc). The
  DuckDB oracle joins term STRINGS; the Spark scorer joins xxhash64 of
  the same strings, so the hash-match doubles as a collision check (the
  text_decontaminate convention).

Also prints the keep-boundary margin min|z| at sf0.01 and sf0.1 — the
CORRECTNESS gate's safety measurement for the ``keep = z >= 0`` flag
(cross-engine float noise is ~1e-15; the margin must dwarf it).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
POS_SOURCES = {"src0", "src1", "src2", "src3", "src4"}
MIN_DF = 3
ITERS = 5000
LR = 50.0
L2 = 1e-6


def feats_of(text: str) -> list[str]:
    t = text.lower().split(" ")
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def load_docs(sf_dir: str):
    con = duckdb.connect()
    return con.execute(
        "SELECT doc_id, text, source FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()


def main() -> None:
    docs = load_docs("/root/testdata/sf0.01")
    from collections import Counter

    df_counts: Counter = Counter()
    per_doc: list[Counter] = []
    y = np.zeros(len(docs))
    for i, (_id, text, source) in enumerate(docs):
        fs = feats_of(text)
        c = Counter(fs)
        per_doc.append(c)
        df_counts.update(c.keys())
        y[i] = 1.0 if source in POS_SOURCES else 0.0
    vocab = sorted(t for t, d in df_counts.items() if d >= MIN_DF)
    vidx = {t: j for j, t in enumerate(vocab)}
    x = np.zeros((len(docs), len(vocab)))
    for i, c in enumerate(per_doc):
        n_feats = sum(c.values())
        for t, n in c.items():
            j = vidx.get(t)
            if j is not None:
                x[i, j] = n / n_feats
    w = np.zeros(len(vocab))
    b = 0.0
    for _ in range(ITERS):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= LR * (x.T @ g / len(docs) + L2 * w)
        b -= LR * float(g.mean())
    z = x @ w + b
    acc = float(((z >= 0) == (y == 1)).mean())
    print(f"vocab={len(vocab)} train_acc={acc:.3f} bias={b:.6f}")

    con = duckdb.connect()
    con.execute("CREATE TABLE wt (term VARCHAR, weight DOUBLE)")
    con.executemany(
        "INSERT INTO wt VALUES (?, ?)", list(zip(vocab, (float(v) for v in w)))
    )
    con.execute(
        f"COPY (SELECT * FROM wt ORDER BY term) TO "
        f"'{ROOT}/golden/quality_model.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        "COPY (SELECT CAST(? AS DOUBLE) AS bias, CAST(? AS BIGINT) AS n_train,"
        " CAST(? AS DOUBLE) AS train_acc) TO "
        f"'{ROOT}/golden/quality_model_meta.parquet' (FORMAT PARQUET)",
        [float(b), len(docs), acc],
    )

    # keep-boundary margin audit at both gate SFs
    wmap = dict(zip(vocab, w))
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        margins = []
        for _id, text, _src in load_docs(sf):
            fs = feats_of(text)
            zz = b + sum(wmap.get(t, 0.0) for t in fs) / len(fs)
            margins.append(abs(zz))
        print(f"{sf}: min|z| = {min(margins):.3e} over {len(margins)} docs")


if __name__ == "__main__":
    main()
