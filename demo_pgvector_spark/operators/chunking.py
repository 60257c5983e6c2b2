"""Document chunking + enrichment — the 1-row→N-rows ingest stage
(reference ``SourceDocument``, src/lib/documents.py:51-90).

The reference delegates splitting to docling's HybridChunker driven by a
HuggingFace tokenizer — an external, model-dependent tool. Per SURVEY
§2.1 (``chunk_docling``) the engine's chunker is a *deterministic
token-bounded splitter*: whitespace tokens grouped into fixed-size
chunks. That keeps the operator fully oracle-testable while preserving
the pipeline shape (convert → split ≤max_tokens → enumerate → enrich).

Spark shape: the chunk list is a pure Catalyst ``transform(sequence(...))``
expression and ``posexplode`` yields (chunk_number, chunk_text) — the
`enumerate()` of src/lib/documents.py:54 — so the whole stage is
whole-stage-codegen'd, shuffle-free, and scales linearly with input
splits. No mapInPandas needed: a word-boundary splitter is expressible
in SQL; a real tokenizer (BPE) would slot in as an Arrow-batched
pandas_udf producing the same (doc, chunk_number, text) contract.

Enrichment (src/lib/documents.py:51-65) merges the document's metadata
with the four constant fields {chunk_tokenizer_model, chunk_size,
chunk_number, import_date}. ``import_date`` is an injected constant by
default (the reference stamps ``datetime.now().isoformat()`` per run —
nondeterministic; SURVEY §1.2 prescribes the injected-constant variant
for reproducibility) — pass ``import_date=None`` to use
``current_timestamp()``.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve via module globals
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Reference defaults: MAX_CHUNK_TOKENS=512 (src/lib/documents.py:19; Quirk
# Q1 notes the import CLI silently overrides it to 1536) and the HF
# tokenizer model name (src/lib/documents.py:41-43). Testdata docs are
# 10-100 words, so tests/registry use a smaller max_tokens to actually
# exercise multi-chunk splits.
MAX_CHUNK_TOKENS = 512
DEFAULT_TOKENIZER_MODEL = "deepseek-ai/DeepSeek-R1-Distill-Qwen-1.5B"
FIXED_IMPORT_DATE = "2026-01-01T00:00:00"


def chunk_split(
    docs: DataFrame,
    max_tokens: int = MAX_CHUNK_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into ≤max_tokens-word chunks —
    ``chunk_docling``'s deterministic stand-in. Returns all input columns
    plus (chunk_number, chunk_text)."""
    toked = docs.withColumn("_toks", F.split(F.col(text_col), " "))
    chunked = toked.withColumn(
        "_chunks",
        F.expr(
            f"transform(sequence(0, cast(ceil(size(_toks) / {max_tokens}.0) as int) - 1),"
            f" i -> concat_ws(' ', slice(_toks, i * {max_tokens} + 1, {max_tokens})))"
        ),
    )
    cols = [c for c in docs.columns if c != text_col]
    return chunked.select(
        *cols, F.posexplode("_chunks").alias("chunk_number", "chunk_text")
    )


def enrich_split(
    split: DataFrame,
    max_tokens: int = MAX_CHUNK_TOKENS,
    tokenizer_model: str = DEFAULT_TOKENIZER_MODEL,
    import_date: str | None = FIXED_IMPORT_DATE,
    meta_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """Enrichment half of ``chunk_enrich`` over ANY split output (rows
    with ``chunk_number``/``chunk_text`` — the word splitter's or
    ``chunk_bpe_real``'s): the constant metadata fields plus a
    ``metadata`` map merging the document's metadata columns with the
    per-chunk constants — the engine form of the reference's dict merge
    (src/lib/documents.py:58-64)."""
    stamp = (
        F.lit(import_date)
        if import_date is not None
        else F.date_format(
            F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
        )
    )
    enriched = (
        split.withColumn("chunk_tokenizer_model", F.lit(tokenizer_model))
        .withColumn("chunk_size", F.lit(int(max_tokens)))
        .withColumn("import_date", stamp)
    )
    meta_entries = []
    for c in meta_cols:
        meta_entries += [F.lit(c), F.col(c).cast("string")]
    meta_entries += [
        F.lit("chunk_tokenizer_model"), F.lit(tokenizer_model),
        F.lit("chunk_size"), F.lit(str(int(max_tokens))),
        F.lit("chunk_number"), F.col("chunk_number").cast("string"),
        F.lit("import_date"), stamp,
    ]
    return enriched.withColumn("metadata", F.create_map(*meta_entries))


def chunk_enrich(
    docs: DataFrame,
    max_tokens: int = MAX_CHUNK_TOKENS,
    tokenizer_model: str = DEFAULT_TOKENIZER_MODEL,
    import_date: str | None = FIXED_IMPORT_DATE,
    id_col: str = "doc_id",
    text_col: str = "text",
    meta_cols: tuple[str, ...] = ("lang", "source"),
) -> DataFrame:
    """Enriched chunk rows (src/lib/documents.py:51-65): the word-budget
    split plus ``enrich_split``'s metadata."""
    split = chunk_split(docs, max_tokens, id_col, text_col)
    return enrich_split(split, max_tokens, tokenizer_model, import_date, meta_cols)


BPE_SUBWORD_LEN = 4


def chunk_bpe(
    docs: DataFrame,
    max_bpe_tokens: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    subword_len: int = BPE_SUBWORD_LEN,
) -> DataFrame:
    """Tokenizer-faithful chunking — the ``chunk_bpe`` narrowing of the
    docling/HybridChunker gap (reference src/lib/documents.py:67-90
    drives chunk boundaries with a HuggingFace BPE tokenizer; the
    whitespace splitter above counts words instead). This operator
    budgets chunks by SUBWORD token count with a deterministic BPE-style
    cost model, so long words consume more budget exactly as they do
    under a real tokenizer:

    - pre-tokenize with the BPE pre-tokenization regex ``\\w+|[^\\w\\s]``
      (words + isolated punctuation — the same split real BPE vocabs
      apply before merges);
    - per-piece cost = ceil(len(piece)/subword_len), the fixed-length
      stand-in for learned merges (a real HF tokenizer slots in as an
      Arrow pandas_udf producing the same (piece, cost) contract);
    - pack pieces into chunks by cumulative budget: piece i joins chunk
      floor(cumulative_cost_before_i / max_bpe_tokens) — boundaries fall
      at fixed token offsets, so every chunk except the last holds
      ≥max_bpe_tokens−max_piece_cost+1 tokens and ≤max_bpe_tokens+
      max_piece_cost−1. (True greedy reset-packing differs only when a
      piece straddles a boundary; the fixed-offset rule is chosen
      because both engines can express it exactly — divergence from
      docling documented per SURVEY §2.1.)

    Plan shape: one hash exchange on ``id_col`` for the per-document
    cumulative-sum window; the chunk regroup's (id, chunk) partitioning
    is a superset of the same key so AQE plans it off the existing
    exchange with a partial aggregate. ``chunk_text`` is the
    space-joined piece stream (tokenized text — original whitespace is
    not reconstructed, as in any detokenization-free BPE pipeline).
    """
    pieces = F.expr(f"regexp_extract_all({text_col}, '\\\\w+|[^\\\\w\\\\s]', 0)")
    e = docs.select(F.col(id_col), F.posexplode(pieces).alias("pos", "piece"))
    e = e.withColumn(
        "cost", F.ceil(F.length("piece") / F.lit(float(subword_len)))
    )
    return _pack_pieces(e, max_bpe_tokens, id_col)


def _pack_pieces(
    e: DataFrame, max_bpe_tokens: int, id_col: str = "doc_id"
) -> DataFrame:
    """Shared budget-packing tail of ``chunk_bpe``/``chunk_bpe_real``:
    (id, pos, piece, cost) rows → (id, chunk_number, n_pieces,
    n_bpe_tokens, chunk_text). One doc-keyed exchange for the cumulative
    sum; the chunk regroup reuses the same partitioning."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    e = e.withColumn("cum", F.sum("cost").over(w)).withColumn(
        "chunk_number",
        F.floor(
            (F.col("cum") - F.col("cost")) / F.lit(float(max_bpe_tokens))
        ).cast("int"),
    )
    ordered = F.array_sort(F.collect_list(F.struct("pos", "piece")))
    return (
        e.groupBy(id_col, "chunk_number")
        .agg(
            F.count(F.lit(1)).alias("n_pieces"),
            F.sum("cost").alias("n_bpe_tokens"),
            F.array_join(
                F.transform(ordered, lambda s: s.getField("piece")), " "
            ).alias("chunk_text"),
        )
    )


def chunk_bpe_real(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    max_bpe_tokens: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``chunk_bpe`` with REAL learned merge costs: the pinned Arrow UDF
    slot runs an actual BPE encoder (functions/bpe.py — the public
    Sennrich/GPT-2 train+encode pair) over a merge table, so each piece's
    budget cost is its true token count under those merges, exactly how
    the reference's HF tokenizer drives HybridChunker boundaries
    (src/lib/documents.py:67-90). The committed table trained on the
    testdata corpus lives at golden/bpe_merges.txt (tools/train_bpe.py).

    Plan shape: scan → ArrowEvalPython (one batch-encode per text) →
    posexplode → the same single doc-keyed exchange as the proxy path.
    The encoder memoizes per distinct piece for each TASK's lifetime
    (closure-level dict, shared across the task's Arrow batches), so
    encode cost is bounded by distinct vocabulary, not token count."""
    tok = bpe_costs_udf(merges=merges)
    t = docs.select(F.col(id_col), tok(F.col(text_col)).alias("_tc"))
    e = t.select(
        F.col(id_col),
        F.posexplode(F.arrays_zip("_tc.pieces", "_tc.costs")).alias("pos", "_pc"),
    ).select(
        id_col,
        "pos",
        F.col("_pc.pieces").alias("piece"),
        F.col("_pc.costs").alias("cost"),
    )
    return _pack_pieces(e, max_bpe_tokens, id_col)


def bpe_costs_udf(
    subword_len: int = BPE_SUBWORD_LEN,
    merges: list[tuple[str, str]] | None = None,
):
    """The pluggable-tokenizer slot of ``chunk_bpe``: an Arrow-batched
    pandas_udf mapping text → arrays of (piece, cost).

    With ``merges=None`` the cost model is the deterministic
    fixed-length proxy, pinned equal to the Catalyst expression in
    tests/test_chunking.py so the two paths cannot drift. With a merge
    table (since round 4) the slot runs a REAL BPE encoder
    (functions/bpe.py): cost = the piece's token count under the learned
    merges, memoized per distinct piece for each task's lifetime
    (every Arrow batch the task processes shares the memo). A HuggingFace
    tokenizer drops in the same way — replace the cost line with
    ``len(tokenizer.tokenize(piece))``; schema, batching, and the
    downstream packing contract stay identical."""
    import re as _re

    from pyspark.sql.functions import pandas_udf

    from demo_pgvector_spark.functions import bpe as _bpe

    # re.ASCII, deliberately: Spark's Java regex and DuckDB's RE2 both
    # treat \w as [0-9A-Za-z_] by default, so the engine's pre-tokenizer
    # splits CJK/accented text per character; Python's re is
    # Unicode-aware and would merge those runs, silently diverging from
    # the Catalyst path (caught by the fuzzed property test). A real
    # HF tokenizer replacing these lines brings its own Unicode rules —
    # and then defines the contract on both sides.
    pat = _re.compile(r"\w+|[^\w\s]", _re.ASCII)
    ranks = _bpe.merge_ranks(merges) if merges is not None else None
    # Closure-level, NOT inside _tok: the memo then lives for the whole
    # task (every Arrow batch the task processes), not one batch.
    memo: dict[str, int] = {}

    @pandas_udf("struct<pieces: array<string>, costs: array<long>>")
    def _tok(texts: pd.Series) -> pd.DataFrame:
        def cost_of(p: str) -> int:
            c = memo.get(p)
            if c is None:
                c = (
                    _bpe.n_tokens(p, ranks)
                    if ranks is not None
                    else -(-len(p) // subword_len)
                )
                memo[p] = c
            return c

        pieces_col, costs_col = [], []
        for t in texts:
            pieces = pat.findall(t or "")          # ← real tokenizer here
            costs = [cost_of(p) for p in pieces]   # ← and here
            pieces_col.append(pieces)
            costs_col.append(costs)
        return pd.DataFrame({"pieces": pieces_col, "costs": costs_col})

    return _tok


def chunk_numbers_windowed(
    docs: DataFrame,
    max_tokens: int = MAX_CHUNK_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``win_chunk_number``: the same 0-based enumeration derived with
    ``row_number() - 1`` over a per-document window ordered by token
    offset — the window-function form of the reference's ``enumerate()``
    (src/lib/documents.py:54). Partitioned by document, so the window
    never concentrates more than one document's chunks on a partition."""
    from pyspark.sql import Window

    split = chunk_split(docs, max_tokens, id_col, text_col).withColumn(
        "token_offset", F.col("chunk_number") * max_tokens
    )
    w = Window.partitionBy(id_col).orderBy("token_offset")
    return split.select(
        "*",
        (F.row_number().over(w) - 1).alias("chunk_number_w"),
        F.count(F.lit(1)).over(Window.partitionBy(id_col)).alias("n_chunks"),
    )
