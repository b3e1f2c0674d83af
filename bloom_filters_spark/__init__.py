"""PySpark-native near-duplicate detection & probabilistic-sketch engine.

A real (non-namespace) package so it imports from a --py-files zip.
"""

__version__ = "0.1.0"
