"""Minimal torch_geometric import shim (see ../README.md)."""

from . import data, nn, utils  # noqa: F401

__version__ = "0.0-refcompat"
