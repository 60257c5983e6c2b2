"""RAG prompt assembly (reference cli/generate_text.py:68-142).

The reference folds the top-5 retrieved chunks into one prompt string with
Python ``+=`` in similarity order; the generation step itself is an external
nondeterministic sink (vLLM) and stays out of the engine (SURVEY §2.9).
Everything up to and including the final prompt string is deterministic and
re-expressed here as DataFrame ops:

- per-row excerpt template (``format_string``),
- ordered string aggregation: ``array_join(transform(array_sort(
  collect_list(struct(rank, s))), x -> x.s), '')`` — a single partial-
  aggregable fold, no window, no driver-side loop. At scale this aggregates
  k rows (k=5), so the "shuffle" is one tiny exchange regardless of corpus
  size: the heavy lifting happened in the top-k retrieval.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from demo_pgvector_spark.functions.text import excerpt_template

# Reference templates (cli/generate_text.py:104-140), byte-exact.
PROMPT_PREAMBLE = (
    "\nYou are a helpful assistant with a library that you refer to as "
    '"the Archives"\ndesigned to be helpful for the sorts\n'
    "of questions whose investigations you are likely to be asked to contribute to.\n"
)

NO_CONTEXT_TEMPLATE = (
    PROMPT_PREAMBLE
    + '\nHowever, when you consulted the library for information related to the prompt\n'
    '"%s", you found no relevant information.\n\n'
    "Please respond to the following prompt with a disclaimer that notes the lack of\n"
    "information and, if you can appropriately determine the category, genre,\n"
    "author, etc. for information that might prove helpful, suggest how the library\n"
    "might be expanded to include more information.\n\n"
    'The prompt to which you must respond is:\n    "%s"\n'
)

WITH_CONTEXT_TEMPLATE = (
    PROMPT_PREAMBLE
    + '\nWhen you consulted the library for information related to the prompt\n'
    '"%s", you found the following relevant information:\n'
    "'''\n%s\n'''\n\n"
    "Please respond to the following prompt and, if the information from the library\n"
    "is relevant, use the information to respond to the prompt. Include references\n"
    "to the source data by including the few lines of text from\n"
    "the source data that contain the information you are referring to along with the\n"
    "author, title of the work and the publication date.\n\n"
    'The prompt to which you must respond is:\n    "%s"\n'
)


def ordered_concat(df: DataFrame, order_col: str, text_col: str) -> DataFrame:
    """Concatenate ``text_col`` in ``order_col`` order into one row
    (column ``agg_chunk_text``) — the Spark form of the ``+=`` loop at
    cli/generate_text.py:70-84."""
    return df.agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col(order_col), F.col(text_col)))),
                lambda s: s[text_col],
            ),
            "",
        ).alias("agg_chunk_text")
    )


def aggregated_excerpts(
    hits: DataFrame,
    rank_col: str = "rank",
    title: str = "title",
    author: str = "author",
    pub: str = "publication_date",
    text: str = "chunk_text",
) -> DataFrame:
    """Top-k hits → one ``agg_chunk_text`` string (cli/generate_text.py:68-85)."""
    pieces = hits.select(
        F.col(rank_col),
        excerpt_template(F.col(title), F.col(author), F.col(pub), F.col(text)).alias(
            "piece"
        ),
    )
    return ordered_concat(pieces, rank_col, "piece")


def contextualized_prompt(agg: DataFrame, prompt: str) -> DataFrame:
    """Choose the with-context vs no-context template based on whether any
    context was aggregated (cli/generate_text.py:100-142)."""
    p = F.lit(prompt)
    ctx: Column = F.coalesce(F.col("agg_chunk_text"), F.lit(""))
    return agg.select(
        F.when(ctx == "", F.format_string(NO_CONTEXT_TEMPLATE, p, p))
        .otherwise(F.format_string(WITH_CONTEXT_TEMPLATE, p, ctx, p))
        .alias("prompt")
    )


# ---------------------------------------------------------------------------
# Generation sink (reference cli/generate_text.py:162-191 + src/lib/llms.py:
# 14-30): the reference drives ONE prompt through a vLLM singleton on the
# driver. The engine's scale shape is batch inference over a DataFrame of
# prompts — mapInPandas, with the (heavyweight, unpicklable) client built
# once per PARTITION from a factory and fed whole Arrow batches, so model
# load is amortized and nothing but strings crosses the Arrow boundary.
# ---------------------------------------------------------------------------


class DeterministicLLMClient:
    """The pluggable stand-in where vLLM would bind (interfaces.LLMClient).

    Real sampling is external by design (GPU, nondeterministic — SURVEY
    §2.9 scopes it out of the correctness surface); this client makes the
    END-TO-END generate path executable and testable by emitting a
    deterministic completion: a fixed header plus a sha256-derived tag of
    the prompt, truncated to ``max_tokens`` whitespace tokens. Swapping in
    a real client changes no engine code — only the factory passed to
    ``generate_batch`` / ``cli.generate_text``."""

    def __init__(self, model_name: str = "deterministic-echo"):
        self.model_name = model_name

    def generate(
        self,
        prompts: list[str],
        max_tokens: int = 5000,
        temperature: float = 0.8,  # noqa: ARG002 — parity with the reference signature
    ) -> list[str]:
        import hashlib

        out = []
        for p in prompts:
            tag = hashlib.sha256(p.encode("utf-8")).hexdigest()[:12]
            text = f"[{self.model_name}:{tag}] response to a {len(p)}-char prompt"
            out.append(" ".join(text.split()[: int(max_tokens)]))
        return out


def generate_batch(
    prompts: DataFrame,
    client_factory=DeterministicLLMClient,
    prompt_col: str = "prompt",
    max_tokens: int = 5000,
    temperature: float = 0.8,
) -> DataFrame:
    """Distributed generation: one ``generated`` string per prompt row.

    ``client_factory`` is called once per partition (NOT per row, NOT
    pickled as an instance) — the pattern for executor-resident model
    state: a vLLM/HTTP client constructed lazily where the work runs.
    Per-row map work over Arrow batches; no shuffle."""
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in prompts.schema)

    def gen(batches):
        client = client_factory()
        for pdf in batches:
            pdf = pdf.copy()
            pdf["generated"] = pd.Series(
                client.generate(
                    list(pdf[prompt_col]), max_tokens=max_tokens, temperature=temperature
                ),
                index=pdf.index,
                dtype="object",
            )
            yield pdf

    return prompts.mapInPandas(gen, f"{fields}, generated string")
