"""TopK = Count-Min Sketch + sorted min-heap.

Semantics match the reference ``TopK`` (``/root/reference/src/sketch/
topk.ts:140-260``): ``add`` updates the CMS, point-queries the estimated
frequency, and maintains an array sorted ascending by frequency
(lodash ``sortedIndexBy`` → insert at the lowest index among equal
frequencies, ``topk.ts:60-80``), evicting the min when > k.

``values()`` walks the heap from the top: descending frequency with
rank 1..k (``topk.ts:211-222``).  The heap tie-break depends on
insertion order — the reference is sequential; the Spark engine's exact
batch equivalent is ``groupBy().count() + row_number`` with an explicit
secondary sort key for determinism.
"""

from __future__ import annotations

import bisect

from bloom_filters_spark.hashing import DEFAULT_SEED
from bloom_filters_spark.sketches.base import SketchBase, export_bigint, import_bigint
from bloom_filters_spark.sketches.cms import CountMinSketch


class TopK(SketchBase):
    def __init__(self, k: int, error_rate: float, accuracy: float = 0.999,
                 seed: int = DEFAULT_SEED):
        super().__init__(seed)
        self.k = k
        self.error_rate = error_rate
        self.accuracy = accuracy
        self.sketch = CountMinSketch.create(error_rate, accuracy, seed)
        # heap: list of [frequency, value] sorted ascending by frequency
        self.heap: list[list] = []

    def add(self, element: str, count: int = 1):
        if count <= 0:
            raise ValueError(f"count must be > 0 (was {count})")
        self.sketch.update(element, count)
        frequency = self.sketch.count(element)
        if len(self.heap) < self.k or frequency >= self.heap[0][0]:
            for i, (_, v) in enumerate(self.heap):
                if v == element:
                    del self.heap[i]
                    break
            bisect.insort_left(self.heap, [frequency, element],
                               key=lambda e: e[0])
            if len(self.heap) > self.k:
                self.heap.pop(0)

    def add_batch(self, elements):
        for e in elements:
            self.add(e)

    def values(self) -> list[dict]:
        out = []
        n = len(self.heap)
        for i in range(n - 1, -1, -1):
            f, v = self.heap[i]
            out.append({"value": v, "frequency": int(f), "rank": n - i})
        return out

    def clear(self):
        self.sketch = CountMinSketch.create(self.error_rate, self.accuracy, self.seed)
        self.heap = []

    def to_json_obj(self) -> dict:
        return {
            "_seed": export_bigint(self.seed),
            "_accuracy": self.accuracy,
            "_errorRate": self.error_rate,
            "_heap": {
                "_content": [
                    {"value": v, "frequency": int(f)} for f, v in self.heap
                ]
            },
            "_k": self.k,
            "_sketch": self.sketch.to_json_obj(),
        }

    @classmethod
    def from_json_obj(cls, obj: dict) -> "TopK":
        f = cls(obj["_k"], obj["_errorRate"], obj["_accuracy"],
                import_bigint(obj["_seed"]))
        f.sketch = CountMinSketch.from_json_obj(obj["_sketch"])
        f.heap = [[e["frequency"], e["value"]] for e in obj["_heap"]["_content"]]
        return f
