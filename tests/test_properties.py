"""Hypothesis property tests over the deterministic scalar kernels.

Pure-Python kernels (hash_embed_py) are fuzzed directly; column
functions are checked by batching all generated examples into ONE Spark
job against an independently computed Python reference — property
coverage without per-example Spark round-trips.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from demo_pgvector_spark.functions.embedding import hash_embed_py

TEXTS = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=200,
)


@given(TEXTS)
@settings(max_examples=60, deadline=None)
def test_hash_embed_unit_norm_and_deterministic(text):
    v1 = hash_embed_py(text, dim=16)
    v2 = hash_embed_py(text, dim=16)
    assert v1 == v2
    n = math.sqrt(sum(x * x for x in v1))
    assert math.isclose(n, 1.0, rel_tol=1e-9) or n == 0.0


@given(TEXTS, TEXTS)
@settings(max_examples=40, deadline=None)
def test_hash_embed_discriminates(a, b):
    """Different texts must produce different vectors (distinct sha256
    base seeds → distinct gaussian draws; a collision would need the
    32-bit seed prefix AND every downstream draw to coincide)."""
    if a != b:
        assert hash_embed_py(a, dim=16) != hash_embed_py(b, dim=16)


def test_fingerprint_and_quality_match_python_reference(spark):
    """Batch 80 generated texts through the Spark expressions and compare
    with a direct Python evaluation of the same definitions."""
    import hashlib

    from pyspark.sql import functions as F

    from demo_pgvector_spark.functions import textstats

    rng = np.random.RandomState(11)
    vocab = ["the", "cat", "word", "deep", "la", "und", "数", "x1", "..", "a-b"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(1, 30)).tolist())
        for _ in range(80)
    ]
    df = spark.createDataFrame(list(enumerate(texts)), "i long, text string")
    got = {
        r["i"]: (r["fp"], r["n"])
        for r in df.select(
            "i",
            textstats.fingerprint(F.col("text")).alias("fp"),
            F.size(F.split(F.lower(F.col("text")), " ")).alias("n"),
        ).collect()
    }
    P, M = textstats.FINGERPRINT_P, textstats.FINGERPRINT_MULT
    for i, t in enumerate(texts):
        h = 0
        for w in t.lower().split(" "):
            base = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
            h = (h * M + base) % P
        assert got[i][0] == h, t
        assert got[i][1] == len(t.split(" "))


def test_minhash_containment_property(spark):
    """Adding words to a document can only LOWER each minhash value or
    keep it equal (min over a superset)."""
    from pyspark.sql import functions as F  # noqa: F401

    from demo_pgvector_spark.operators import dedup

    base = " ".join(f"w{i}" for i in range(30))
    extended = base + " " + " ".join(f"x{i}" for i in range(10))
    df = spark.createDataFrame([(0, base), (1, extended)], "doc_id long, text string")
    sigs = {r["doc_id"]: r["minhash"] for r in dedup.minhash_signatures(df).collect()}
    assert all(e <= b for b, e in zip(sigs[0], sigs[1]))


# -- chunk_bpe packing properties (batched into one Spark job) -------------


def _bpe_reference(text, budget, sub=4):
    """Independent plain-Python reference of the chunk_bpe packing.

    re.ASCII matches the engine semantics: Java regex (Spark) and RE2
    (DuckDB) both default \\w to [0-9A-Za-z_], so CJK text splits per
    character — Python's Unicode \\w would merge it and diverge."""
    import re

    pieces = re.findall(r"\w+|[^\w\s]", text, re.ASCII)
    out = {}
    cum = 0
    for p in pieces:
        cost = -(-len(p) // sub)
        chunk = (cum) // budget
        cum += cost
        out.setdefault(chunk, []).append((p, cost))
    return out


def test_chunk_bpe_matches_python_reference_on_fuzzed_texts(spark):
    # deterministic fuzzed corpus, batched into ONE Spark job (the
    # module's convention for column-function property coverage)
    import random

    rng = random.Random(20260813)
    alphabet = "abcdefg hij  kl,m.n-o_p  qq  αβγ  内国  🙂  '\"!?;:0123456789   "
    corpus = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 300)))
        for _ in range(120)
    ]
    from demo_pgvector_spark.operators import chunking

    budget = 7
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {}
    for r in chunking.chunk_bpe(docs, max_bpe_tokens=budget).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_number"]] = (
            r["n_pieces"], r["n_bpe_tokens"], r["chunk_text"]
        )
    for i, t in enumerate(corpus):
        ref = _bpe_reference(t, budget)
        want = {
            c: (len(ps), sum(x[1] for x in ps), " ".join(x[0] for x in ps))
            for c, ps in ref.items()
        }
        assert got.get(i, {}) == want, (i, t[:50])


# -- dedup_assign vs union-find reference ----------------------------------


def test_dedup_assign_matches_union_find_on_random_graphs(spark):
    import random

    from demo_pgvector_spark.operators import dedup

    rng = random.Random(99)
    n = 60
    edges = sorted(
        {tuple(sorted(rng.sample(range(n), 2))) for _ in range(70)}
    )

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}
    # normalize: keeper = min member of the component
    comps = {}
    for i, r in want.items():
        comps.setdefault(find(r), []).append(i)
    want = {i: min(members) for r, members in comps.items() for i in members}

    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["keeper_id"] for r in dedup.dedup_assign(docs, pairs).collect()}
    assert got == want


# -- curation properties (batched into one Spark job each) -----------------


def test_pack_sequences_matches_python_reference_on_fuzzed_streams(spark):
    """Random per-stratum token streams: Spark pack assignment must equal
    the plain-Python floor(prefix_before/budget) fold, and no pack may
    exceed the budget except via its final member."""
    import random

    from demo_pgvector_spark.operators import curation

    rng = random.Random(17)
    rows, budget = [], 50
    for i in range(300):
        stratum = f"s{rng.randrange(5)}"
        rows.append((i, " ".join("w" for _ in range(rng.randrange(1, 40))), stratum))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: (r["pack_id"], r["n_tokens"])
        for r in curation.pack_sequences(df, budget=budget).collect()
    }
    cum: dict[str, int] = {}
    packs: dict[tuple, int] = {}
    for i, text, stratum in rows:  # ascending doc_id == packing order
        n = len(text.split(" "))
        before = cum.get(stratum, 0)
        want_pack = before // budget
        assert got[i] == (want_pack, n), (i, got[i], want_pack, n)
        cum[stratum] = before + n
        key = (stratum, want_pack)
        packs[key] = packs.get(key, 0) + n
    # budget contract: pack total minus its last member stays under budget
    lasts: dict[tuple, int] = {}
    for i, text, stratum in rows:
        lasts[(stratum, got[i][0])] = got[i][1]
    for key, total in packs.items():
        assert total - lasts[key] < budget, key


def test_decontaminate_matches_python_reference_on_fuzzed_docs(spark):
    """Random small-vocab docs vs a random eval split: n_grams/n_overlap
    must equal the plain-Python distinct-set computation."""
    import random

    from demo_pgvector_spark.operators import curation

    rng = random.Random(23)
    vocab = [f"v{j}" for j in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 30))))
        for i in range(120)
    ]
    n = 5
    df = spark.createDataFrame(rows, "doc_id long, text string")
    eval_df = df.filter("doc_id % 7 = 0")
    train_df = df.filter("doc_id % 7 != 0")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_overlap"], r["contaminated"])
        for r in curation.decontaminate(train_df, eval_df, n=n).collect()
    }

    def grams(text):
        w = text.split(" ")
        if len(w) < n:
            return set()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    eval_grams = set()
    for i, t in rows:
        if i % 7 == 0:
            eval_grams |= grams(t)
    for i, t in rows:
        if i % 7 == 0:
            continue
        g = grams(t)
        want = (len(g), len(g & eval_grams), bool(g & eval_grams))
        assert got[i] == want, (i, got[i], want)


def test_scrub_text_matches_python_re_reference(spark):
    """Spark's Java-regex scrub against a pure-Python ``re`` replay of
    the same patterns over adversarial PII-dense text: dialect
    divergence (word boundaries, greedy octets, class escapes) would
    surface as a mismatch here before it reached the DuckDB gate."""
    import re as _re
    import random

    from demo_pgvector_spark.operators.curation import (
        PII_EMAIL, PII_IPV4, PII_PHONE, scrub_text,
    )

    rng = random.Random(11)
    frag = [
        "a@b.co", "x.y+z@mail.example.org", "not@an", "a@@b.com", "@start",
        "1.2.3.4", "10.0.0.255", "999.999.999.999", "1.2.3", "1.2.3.4.5",
        "v1.2.3.4-rel", "+1 555 010-2030", "+44 (0) 20 7946 0958", "+12",
        "plain words here", "x", "", "tab\tsep", "trail.", "dot.word",
    ]
    rows = []
    for i in range(60):
        n_lines = rng.randrange(1, 5)
        lines = [
            " ".join(rng.choice(frag) for _ in range(rng.randrange(0, 6)))
            for _ in range(n_lines)
        ]
        rows.append((i, "\n".join(lines)))
    got = {
        r["doc_id"]: r
        for r in scrub_text(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }

    for i, text in rows:
        masked = _re.sub(PII_EMAIL, "<EMAIL>", text)
        masked = _re.sub(PII_IPV4, "<IP>", masked)
        masked = _re.sub(PII_PHONE, "<PHONE>", masked)
        lines = masked.split("\n")
        kept = [
            ln for ln in lines if len(_re.split(" +", ln.strip())) >= 3
        ]
        r = got[i]
        assert r["clean_text"] == "\n".join(kept), (i, text)
        assert r["n_emails"] == len(_re.findall(PII_EMAIL, text))
        assert r["n_ips"] == len(_re.findall(PII_IPV4, text))
        assert r["n_phones"] == len(_re.findall(PII_PHONE, text))
        assert (r["n_lines_kept"], r["n_lines_total"]) == (len(kept), len(lines))


def test_ngram_jaccard_completeness_on_random_corpora(spark):
    """The AllPairs+PPJoin filter chain must return EXACTLY the
    brute-force pair set on randomized corpora — the completeness
    theorem exercised beyond the fixed testdata: random word soups with
    deliberately shared boilerplate spans, several thresholds and gram
    sizes, all checked against a pure-Python all-pairs reference in one
    Spark job per config."""
    import itertools
    import random

    from demo_pgvector_spark.operators import dedup

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(40)]
    boiler = "the quick shared header of every generated document"

    def make_doc(i):
        words = [vocab[rng.randrange(len(vocab))] for _ in range(rng.randrange(6, 30))]
        if i % 3 == 0:
            words = boiler.split() + words  # shared boilerplate run
        if i % 7 == 0 and i > 0:
            return i, None  # near-dup of doc i-1 handled below
        return i, " ".join(words)

    docs = []
    for i in range(60):
        j, text = make_doc(i)
        if text is None:
            prev = docs[i - 1][1].split()
            k = rng.randrange(len(prev))
            prev = prev[:k] + ["altered"] + prev[k + 1:]
            text = " ".join(prev)
        docs.append((j, text))

    def grams_of(text, k):
        toks = text.lower().split(" ")
        if len(toks) < k:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    df = spark.createDataFrame(docs, "doc_id long, text string")
    for tau, k in [(0.2, 3), (0.5, 3), (0.3, 2), (0.7, 4)]:
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in dedup.ngram_jaccard_pairs(df, threshold=tau, k=k).collect()
        }
        gsets = {i: grams_of(t, k) for i, t in docs}
        want = {}
        for a, b in itertools.combinations(range(60), 2):
            j = round(len(gsets[a] & gsets[b]) / len(gsets[a] | gsets[b]), 6)
            if j >= tau:
                want[(a, b)] = j
        assert got == want, (tau, k)


def test_substring_runs_match_python_reference(spark):
    """Randomized corpus with PLANTED shared spans (unique filler +
    span templates spliced at random offsets), one Spark job vs a
    direct Python evaluation of the positioned-gram-chain definition:
    grams → shared-gram hits → diagonal islands → maximal runs."""
    from demo_pgvector_spark.operators import dedup

    L = 12
    rng = np.random.RandomState(23)
    templates = [
        [f"span{t}_{i}" for i in range(rng.randint(L, 2 * L + 5))]
        for t in range(5)
    ]
    docs = []
    uid = 0
    for d in range(40):
        toks = []
        for _ in range(rng.randint(1, 4)):
            filler = [f"u{uid + i}" for i in range(rng.randint(0, 10))]
            uid += 10
            toks += filler
            if rng.rand() < 0.7:
                toks += templates[rng.randint(0, 5)]
        docs.append((d, " ".join(toks)))

    def py_runs(corpus):
        grams = {}  # gram -> list of (doc, pos)
        toked = {i: t.lower().split(" ") for i, t in corpus}
        for i, toks in toked.items():
            for p in range(len(toks) - L + 1):
                grams.setdefault(" ".join(toks[p:p + L]), []).append((i, p))
        hits = {}  # (a, b, diag) -> set of pos_a
        for occ in grams.values():
            for ai in range(len(occ)):
                for bi in range(len(occ)):
                    (a, pa), (b, pb) = occ[ai], occ[bi]
                    if a < b:
                        hits.setdefault((a, b, pa - pb), set()).add(pa)
        out = set()
        for (a, b, diag), poss in hits.items():
            run = sorted(poss)
            start = prev = run[0]
            n = 1
            for p in run[1:]:
                if p == prev + 1:
                    prev = p
                    n += 1
                else:
                    out.add((a, b, start, start - diag, n + L - 1))
                    start = prev = p
                    n = 1
            out.add((a, b, start, start - diag, n + L - 1))
        return out

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["start_a"], r["start_b"], r["span_len"])
        for r in dedup.substring_pairs(df, gram_l=L).collect()
    }
    assert got == py_runs(docs) and len(got) > 10


def test_blockhash_matches_python_reference(spark):
    """60 random 16×16 images through the Arrow decode path vs a direct
    Python evaluation of the integer block-mean bit definition."""
    from demo_pgvector_spark.operators import multimodal as mm

    rng = np.random.RandomState(31)
    blobs = [
        (i, b"IMG|16|16|" + rng.randint(0, 256, 256, dtype=np.uint8).tobytes())
        for i in range(60)
    ]

    def py_hash(payload):
        px = np.frombuffer(payload, dtype=np.uint8).reshape(16, 16).astype(int)
        h = 0
        for by in range(8):
            for bx in range(8):
                blk = px[2 * by:2 * by + 2, 2 * bx:2 * bx + 2]
                if 2 * int(blk.sum()) > 255 * blk.size:
                    h |= 1 << (by * 8 + bx)
        return h & 0xFFFFFFFF, h >> 32

    df = spark.createDataFrame(blobs, "doc_id long, content binary")
    got = {
        r["doc_id"]: (r["phash_lo"], r["phash_hi"])
        for r in mm.image_blockhash(df).collect()
    }
    assert got == {i: py_hash(b[10:]) for i, b in blobs}


def test_rrf_fuse_matches_python_reference(spark):
    """Random rank lists (three lists, partial overlap) fused in one
    Spark job vs a direct Python evaluation of the integer-scaled RRF
    definition, including the (score DESC, id ASC) cut."""
    from demo_pgvector_spark.operators import retrieval

    rng = np.random.RandomState(41)
    lists = {}
    for name in ("a", "b", "c"):
        ids = rng.choice(100, size=20, replace=False)
        lists[name] = [(int(d), r + 1) for r, d in enumerate(ids)]
    s = 1_000_000_000
    scores = {}
    for rows in lists.values():
        for d, r in rows:
            scores[d] = scores.get(d, 0) + s // (60 + r)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:12]

    dfs = {
        n: spark.createDataFrame(rows, "doc_id long, rank int")
        for n, rows in lists.items()
    }
    got = [
        (r["doc_id"], r["rrf_scaled"])
        for r in retrieval.rrf_fuse(dfs, topk=12).collect()
    ]
    assert got == expect


def test_url_canonicalize_matches_python_reference(spark):
    """200 synthesized URLs (scheme/www/case/path-slash/fragment/
    query-mix variants) canonicalized in one Spark job vs a direct
    Python re-implementation of the documented contract."""
    import re as _re

    from pyspark.sql import functions as F

    from demo_pgvector_spark.operators import dedup

    rng = np.random.RandomState(43)
    semantic = ["page=2", "id=7", "q=hello", "last_utm_source=a",
                "xfbclid=1", "myutm_x=9"]
    tracking = ["utm_source=f", "utm_campaign=c1", "fbclid=zz", "gclid=g2"]
    urls = []
    for i in range(200):
        parts = []
        n = rng.randint(0, 4)
        pool = semantic + tracking
        idx = rng.choice(len(pool), size=n, replace=False)
        parts = [pool[j] for j in idx]
        u = (
            ("https://" if i % 2 else "http://")
            + ("www." if i % 3 == 0 else "")
            + f"Site{i % 7}.example.com/p/{i % 11}"
            + ("/" if i % 5 == 0 else "")
            + (("?" + "&".join(parts)) if parts else "")
            + (f"#frag{i % 4}" if i % 4 == 0 else "")
        )
        urls.append((i, u))

    def py_canon(u):
        c = u.lower()
        c = _re.sub(r"^https?://", "", c)
        c = _re.sub(r"^www\.", "", c)
        c = c.split("#", 1)[0]
        c = _re.sub(r"&(utm_[a-z0-9]+|fbclid|gclid)=[^&]*", "", c)
        c = _re.sub(r"\?(utm_[a-z0-9]+|fbclid|gclid)=[^&]*&?", "?", c)
        c = _re.sub(r"[?&]+$", "", c)
        path, sep, query = c.partition("?")
        return _re.sub(r"/+$", "", path) + (sep + query if sep else "")

    df = spark.createDataFrame(urls, "doc_id long, url string")
    got = {
        r["doc_id"]: r["canon"]
        for r in df.select(
            "doc_id", dedup.url_canonicalize(F.col("url")).alias("canon")
        ).collect()
    }
    assert got == {i: py_canon(u) for i, u in urls}
