"""Datasets and samplers: MovieLens loading, splits, and batch iterators."""

from stargcn_tpu.data.movielens import LoadData
from stargcn_tpu.data.iterators import DataIterator, NegEdgeGenerator

__all__ = ["LoadData", "DataIterator", "NegEdgeGenerator"]
