"""A Spark 4 Python DataSource modeling the reference's API "get" stage
(cartography/intel/aws/ec2/instances.py:95-109 and 700+ analogues: paginate
a provider API into row batches).

The reference fetches pages serially on one machine and hands dict lists
to the loader. Spark-native, pagination IS the partitioning: each input
partition owns a page range, executors fetch pages concurrently, and the
rows enter the plan as a real scan — no driver-side accumulation, no
``createDataFrame`` staging. This is the idiomatic Spark 4 shape for
"ingest from a paged REST API" (``pyspark.sql.datasource.DataSource``,
registered with ``spark.dataSource.register``).

The bundled endpoint is DETERMINISTIC (a seeded arithmetic sequence in
place of HTTP — the sandbox has no network), so a DuckDB oracle can
recompute the exact rows; a real deployment swaps ``_fetch_page`` for the
provider SDK call and keeps everything else, including the
pages-per-partition math and the typed schema.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

PAGE_SIZE_DEFAULT = 500
KNUTH = 2654435761  # Knuth multiplicative hash constant — reproducible in SQL


def _fetch_page(page: int, page_size: int):
    """Stand-in for one provider-API page call: deterministic asset rows.
    asset_id is dense; region cycles over 5 regions; value is a Knuth-hash
    pseudo-metric, exactly (id * 2654435761) % 1000 in bigint arithmetic."""
    lo = page * page_size
    for i in range(lo, lo + page_size):
        yield (i, i % 5, (i * KNUTH) % 1000)


class PagedApiReader(DataSourceReader):
    def __init__(self, options):
        self.n_pages = int(options.get("n_pages", 4))
        self.page_size = int(options.get("page_size", PAGE_SIZE_DEFAULT))
        self.pages_per_partition = int(options.get("pages_per_partition", 1))

    def partitions(self):
        step = self.pages_per_partition
        return [InputPartition(p) for p in range(0, self.n_pages, step)]

    def read(self, partition):
        first = partition.value
        for page in range(first, min(first + self.pages_per_partition, self.n_pages)):
            yield from _fetch_page(page, self.page_size)


class PagedApiDataSource(DataSource):
    """``spark.read.format("paged_api").option("n_pages", 8).load()``."""

    @classmethod
    def name(cls) -> str:
        return "paged_api"

    def schema(self) -> str:
        return "asset_id bigint, region int, value bigint"

    def reader(self, schema) -> PagedApiReader:
        return PagedApiReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(PagedApiDataSource)
