"""Custom Python data source (Spark 4 DataSource API) — a
deterministic synthetic-document generator.

The API seam the reference fills with "fetch objects from a public
bucket" (SURVEY.md §1) generalizes in Spark 4 to user-defined sources
that participate in normal planning: ``schema()`` feeds the analyzer,
``partitions()`` declares the parallelism (one ``InputPartition`` per
slice, so a 10^12-row synthetic corpus generates on 1000 executors
with zero driver data movement), and each ``read(partition)``
produces only its slice.

Generation is pure arithmetic on the row id (multiplicative hashing
into a fixed vocabulary) — no ``random`` module state, so any slice
is reproducible in isolation: the property that makes synthetic-data
backfills and golden tests stable across retries, re-partitionings,
and speculative re-execution.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_VOCAB = (
    "spark data table row batch stream merge join filter scan sort key "
    "value column vector hash agg window group query part small big fast "
    "slow dup line customer order"
).split()

#: Knuth multiplicative constant (2^64 golden-ratio) — the same
#: portable-hash discipline as functions.columns.portable_bucket.
_MIX = 0x9E3779B97F4A7C15
_MASK = (1 << 64) - 1


def _word(doc_id: int, i: int) -> str:
    h = ((doc_id * 1_000_003 + i) * _MIX) & _MASK
    return _VOCAB[(h >> 33) % len(_VOCAB)]


def doc_text(doc_id: int, n_words: int = 24) -> str:
    """Deterministic pseudo-text for one doc id (pure function)."""
    return " ".join(_word(doc_id, i) for i in range(n_words))


class _Slice(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SynthDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.n_words = int(options.get("words_per_doc", 24))

    def partitions(self):
        step = max(1, -(-self.rows // self.n_parts))
        return [
            _Slice(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _Slice):
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, doc_text(doc_id, self.n_words))


class SynthDocsDataSource(DataSource):
    """``spark.read.format("synth_docs").option("rows", N).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synth_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string"

    def reader(self, schema) -> SynthDocsReader:
        return SynthDocsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SynthDocsDataSource)
