"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic-documents generator.

Demonstrates the full custom-source surface the reference has no analog for
(its ingest is fixed CSV/Postgres, `to_bronze.py:17-50`): a `DataSource` +
`DataSourceReader` with explicit input partitions, registered via
``spark.dataSource.register`` and read with ``spark.read.format(...)``.

Two properties make this more than a toy:

- **Arrow-batched**: ``read`` yields ``pyarrow.RecordBatch`` chunks, not
  per-row tuples, so rows cross the Python/JVM boundary in columnar batches
  (same transport discipline as the engine's pandas-UDF paths).
- **Deterministic generation contract**: every field derives from md5 of
  ``{seed}:{doc_id}`` (and ``{seed}:{doc_id}:{j}`` per token), so an
  independent engine can regenerate the dataset bit-for-bit — the DuckDB
  oracle for `pydatasource_docs` rebuilds the corpus in pure SQL and the
  driver hash-pins the whole source, not just its row count.

Partitions split the id range evenly: N docs over P partitions, each reader
task generating its slice independently — the same contract a real
partitioned source (JDBC ranges, Kafka partitions, file splits) satisfies,
so the plan parallelizes without any shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_HEX = "0123456789abcdef"
_LANGS = ["de", "en", "es", "fr", "zh"]
_BATCH_ROWS = 1024


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


def _gen_doc(seed: str, i: int) -> tuple[int, str, str, str]:
    h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
    lang = _LANGS[_HEX.index(h[0]) % 5]
    source = "src" + str(_HEX.index(h[1]) % 4)
    n_toks = 5 + (_HEX.index(h[2]) * 16 + _HEX.index(h[3])) % 20
    toks = [
        hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:4]
        for j in range(1, n_toks + 1)
    ]
    return i, " ".join(toks), lang, source


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_docs = int(options.get("n_docs", "1000"))
        self.n_partitions = int(options.get("n_partitions", "8"))
        self.seed = options.get("seed", "42")

    def partitions(self) -> list[InputPartition]:
        step = -(-self.n_docs // self.n_partitions)  # ceil div
        return [
            _IdRange(lo, min(lo + step, self.n_docs))
            for lo in range(0, self.n_docs, step)
        ]

    def read(self, partition: _IdRange) -> Iterator:
        import pyarrow as pa

        for lo in range(partition.start, partition.end, _BATCH_ROWS):
            hi = min(lo + _BATCH_ROWS, partition.end)
            rows = [_gen_doc(self.seed, i) for i in range(lo, hi)]
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                    "lang": pa.array([r[2] for r in rows], pa.string()),
                    "source": pa.array([r[3] for r in rows], pa.string()),
                }
            )


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs")`` — options: n_docs, n_partitions,
    seed."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, lang string, source string"

    def reader(self, schema) -> SyntheticDocsReader:  # noqa: ARG002
        return SyntheticDocsReader(self.options)
