"""Dataset IO and synthetic data (reference layer 1 utils-I/O + NodeReplayer role)."""

from . import synthetic

__all__ = ["synthetic"]
