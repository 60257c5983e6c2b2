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
