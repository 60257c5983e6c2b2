"""API-surface conformance: the engine's concrete providers must satisfy
the protocols mirroring the reference's (planned) extension interfaces."""

from __future__ import annotations

from demo_pgvector_spark import interfaces, pipeline
from demo_pgvector_spark.functions import embedding
from demo_pgvector_spark.operators import rag


def test_embedding_generator_conformance():
    assert isinstance(embedding.hash_embed, interfaces.EmbeddingGenerator)


def test_llm_client_conformance():
    client = rag.DeterministicLLMClient()
    assert isinstance(client, interfaces.LLMClient)
    out = client.generate(["prompt one", "prompt two"], max_tokens=4)
    assert len(out) == 2 and out[0] != out[1]  # prompt-dependent
    assert out == client.generate(["prompt one", "prompt two"], max_tokens=4)
    assert all(len(c.split()) <= 4 for c in out)


def test_ingestor_conformance():
    assert isinstance(pipeline.import_documents, interfaces.EmbeddingIngestor)


def test_query_provider_conformance():
    assert isinstance(pipeline.search_chunks, interfaces.EmbeddingQueryProvider)


def test_settings_defaults_match_reference():
    s = interfaces.EngineSettings()
    # the reference's two retrieval parameter sets (SURVEY Q2)
    assert (s.search_top_k, s.search_threshold) == (10, 0.7)
    assert (s.rag_top_k, s.rag_threshold) == (5, 0.01)
    assert s.max_chunk_tokens == 512
