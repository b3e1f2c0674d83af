"""Count-Min Sketch as a numpy counter-matrix monoid.

Semantics match the reference ``CountMinSketch``
(``/root/reference/src/sketch/count-min-sketch.ts``):

* sizing ``w = ceil(e/eps)``, ``d = ceil(ln(1/delta))`` — as written,
  including the quirk that delta=0.999 yields d=1
  (``count-min-sketch.ts:56-61``),
* ``update``: d indexes from getIndexes(e, w, d, seed), ``M[i][idx_i]+=c``
  and ``_allSums += c`` (``count-min-sketch.ts:112-123``),
* ``count``: min over the d counters (``count-min-sketch.ts:130-143``),
* ``merge``: elementwise matrix add (``count-min-sketch.ts:168-183``),
* JSON format compatible with ``saveAsJSON`` (``count-min-sketch.ts:196-204``).
"""

from __future__ import annotations

import math

import numpy as np

from bloom_filters_spark.hashing import DEFAULT_SEED, get_indexes_batch, get_indexes_u64
from bloom_filters_spark.sketches.base import SketchBase, export_bigint, import_bigint


class CountMinSketch(SketchBase):
    def __init__(self, columns: int, rows: int, seed: int = DEFAULT_SEED):
        super().__init__(seed)
        self.columns = columns
        self.rows = rows
        self.matrix = np.zeros((rows, columns), dtype=np.int64)
        self.all_sums = 0

    @classmethod
    def create(cls, error_rate: float, accuracy: float = 0.999, seed: int = DEFAULT_SEED):
        columns = math.ceil(math.e / error_rate)
        rows = math.ceil(math.log(1 / accuracy))
        return cls(columns, rows, seed)

    @classmethod
    def from_items(cls, items, error_rate: float, accuracy: float = 0.999,
                   seed: int = DEFAULT_SEED):
        f = cls.create(error_rate, accuracy, seed)
        f.update_batch(list(items))
        return f

    def _indexes(self, elements) -> np.ndarray:
        if isinstance(elements, np.ndarray) and elements.dtype in (
            np.dtype(np.uint64),
            np.dtype(np.int64),
        ):
            return get_indexes_u64(
                elements.astype(np.uint64), self.columns, self.rows, self.seed
            )
        return get_indexes_batch(elements, self.columns, self.rows, self.seed)

    def update(self, element, count: int = 1):
        self.update_batch([element], np.array([count], dtype=np.int64))

    def update_batch(self, elements, counts: np.ndarray | None = None):
        if len(elements) == 0:
            return
        if counts is None:
            counts = np.ones(len(elements), dtype=np.int64)
        idx = self._indexes(elements)  # (n, d)
        rows = np.broadcast_to(np.arange(self.rows), idx.shape)
        np.add.at(self.matrix, (rows.ravel(), idx.ravel()),
                  np.repeat(counts, self.rows))
        self.all_sums += int(counts.sum())

    def count(self, element) -> int:
        return int(self.count_batch([element])[0])

    def count_batch(self, elements) -> np.ndarray:
        if len(elements) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._indexes(elements)  # (n, d)
        rows = np.broadcast_to(np.arange(self.rows), idx.shape)
        return self.matrix[rows, idx].min(axis=1)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if self.columns != other.columns or self.rows != other.rows:
            raise ValueError("cannot merge CMS with different dimensions")
        out = CountMinSketch(self.columns, self.rows, self.seed)
        out.matrix = self.matrix + other.matrix
        out.all_sums = self.all_sums + other.all_sums
        return out

    def clone(self) -> "CountMinSketch":
        out = CountMinSketch(self.columns, self.rows, self.seed)
        out.matrix = self.matrix.copy()
        out.all_sums = self.all_sums
        return out

    def to_json_obj(self) -> dict:
        return {
            "_allSums": self.all_sums,
            "_matrix": self.matrix.tolist(),
            "_rows": self.rows,
            "_columns": self.columns,
            "_seed": export_bigint(self.seed),
        }

    @classmethod
    def from_json_obj(cls, obj: dict) -> "CountMinSketch":
        f = cls(obj["_columns"], obj["_rows"], import_bigint(obj["_seed"]))
        f.matrix = np.array(obj["_matrix"], dtype=np.int64)
        f.all_sums = obj["_allSums"]
        return f
