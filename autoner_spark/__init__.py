"""autoner_spark — PySpark-native KG-construction pipeline.

A from-scratch re-expression of AutoNER's (shangjingbo1226/AutoNER)
deterministic distant-supervision tagger as a distributed pipeline:
broadcast dictionary trie -> per-turn maximal-span DP segmentation inside
vectorized Arrow UDFs -> mention typing / entity linking -> connected-
components canonicalization -> (subj, pred, obj) triple materialization,
with explicit partitioning/skew handling and per-partition lineage.
"""

__version__ = "0.1.0"
