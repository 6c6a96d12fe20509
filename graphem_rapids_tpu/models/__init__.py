"""Embedding engines: the TPU engine and the numpy parity oracle."""

from .embedder import GraphEmbedderTPU

__all__ = ["GraphEmbedderTPU"]
