"""Embedding client with the reference's fallback chain (SURVEY.md
§2.12), as Spark-side plumbing.

Reference semantics being mirrored (not the transport):

- remote-if-configured, else local
  (``src/core/embedding_client.py:59-74``);
- any remote failure falls back to the local model
  (``src/core/embedding_client.py:126-148``);
- dimension introspection follows the active backend
  (``src/core/embedding_client.py:150-160``): 768 for the remote
  (Nomic default), 384 for the local fallback (MiniLM-L6-v2).

The HTTP transport is **injectable and stubbed**: this container has
no network/model deps, so the default remote transport raises
``NotImplementedError`` (clearly marked), which exercises the
fallback path deterministically. The Spark plumbing — one client per
executor, Arrow-batched encode, schema — is real; swapping in a
requests-based transport changes nothing else.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .embed import _HashModel

REMOTE_DIM = 768  # Nomic default (src/core/embedding_client.py:150-160)
LOCAL_DIM = 384  # MiniLM-L6-v2 fallback


def _stub_transport(texts: list[str], dim: int) -> list[list[float]]:
    """STUB for the remote embedding POST (texts[] → embeddings[][]).
    Deliberately unimplemented — no network in this environment; the
    client's fallback chain handles the failure."""
    raise NotImplementedError("remote embedding transport not available here")


class EmbeddingClient:
    """Fallback-chain embedding client: remote if configured, local
    hash model otherwise or on any remote failure. Picklable with
    module-level transports, so one instance is constructed per
    executor by :func:`embed_with_client_udf`."""

    def __init__(
        self,
        remote_url: str | None = None,
        *,
        remote_dim: int = REMOTE_DIM,
        local_dim: int = LOCAL_DIM,
        transport: Callable[[list[str], int], list[list[float]]] | None = None,
    ):
        self.remote_url = remote_url
        self.remote_dim = remote_dim
        self.local_dim = local_dim
        self.transport = transport if transport is not None else _stub_transport
        self._local: _HashModel | None = None
        self.used_fallback = False

    def dimension(self) -> int:
        """Dimension of the backend that will serve the next call —
        remote when configured and healthy so far, else local."""
        if self.remote_url is not None and not self.used_fallback:
            return self.remote_dim
        return self.local_dim

    def _local_model(self) -> _HashModel:
        if self._local is None:
            self._local = _HashModel(self.local_dim)
        return self._local

    def encode_batch(self, texts: list[str]) -> list[list[float]]:
        if self.remote_url is not None and not self.used_fallback:
            try:
                return self.transport(texts, self.remote_dim)
            except Exception:
                # reference behavior: failure → local, silently healthy
                self.used_fallback = True
        return self._local_model().encode_batch(texts)

    def health(self) -> dict:
        return {
            "backend": "remote" if (self.remote_url and not self.used_fallback) else "local",
            "dimension": self.dimension(),
            "remote_configured": self.remote_url is not None,
            "fell_back": self.used_fallback,
        }


def embed_with_client_udf(client_factory: Callable[[], EmbeddingClient]):
    """Iterator pandas UDF over the text column: the factory runs once
    per executor (client + model construction outside the batch loop),
    every Arrow batch reuses it. Rate-limited remote calls batch at
    Arrow granularity — the ``mapInPandas``-equivalent shape SURVEY
    §2.12 calls for, with no shuffle anywhere."""

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        client = client_factory()  # per-executor construction
        for texts in batches:
            yield pd.Series(client.encode_batch(texts.tolist()))

    return embed
