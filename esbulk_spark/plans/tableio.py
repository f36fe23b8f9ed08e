"""Pluggable table storage for the index table set (SURVEY.md §1.1,
M4): the index is a set of tables (docs / postings / dictionary /
norms / positions) plus a JSON spec. How those tables are stored and
committed is a backend concern:

* ``ParquetDirIO`` (default, zero dependencies): one parquet directory
  per table under the index dir, committed by write-to-tmp + atomic
  rename — exactly the layout every existing index uses (this module is
  the factored-out home of the old ``build._atomic_write``). Readers
  racing a rebuild must ``refresh()``; there is no snapshot isolation.
* ``IcebergIO`` (activated when the Iceberg Spark runtime jars are on
  the classpath — feature-probed like PIL in operators/multimodal.py):
  one Iceberg table per index table, committed via DataFrameWriterV2
  ``createOrReplace`` — a single atomic metadata swap, which buys what
  a real deployment asks for first: snapshot isolation, concurrent
  readers during rebuild, and time travel on the index tables.

The engine talks ONLY to the interface; backends are chosen per index
(``for_index_dir`` picks Iceberg when the location is a table-ident
string like ``iceberg:catalog.db.myindex`` AND the jars are present).

Reference parity: the reference's index lifecycle is ES's
create/delete/settings dance (/root/reference/indexing.go:461-518,
administration.go:51-93); this interface is that lifecycle mapped onto
table storage.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """Feature probe: True when the Iceberg Spark runtime is on the JVM
    classpath (no-op import check, the PIL-probe pattern)."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class TableIO:
    """Storage backend interface for one index's table set."""

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        options: dict | None = None,
    ) -> None:
        """Atomically (re)place table ``name`` with ``df``'s rows.
        Concurrent readers must see either the old or the new table,
        never a partial write. ``options`` are backend writer options
        (e.g. parquet.block.size for the postings row-group layout);
        backends may ignore options they have no equivalent for."""
        raise NotImplementedError

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        raise NotImplementedError

    def exists(self, name: str) -> bool:
        raise NotImplementedError

    def refresh(self, spark: SparkSession, name: str) -> None:
        """Invalidate any cached listing/metadata for ``name``."""
        raise NotImplementedError


class ParquetDirIO(TableIO):
    """Parquet-directory backend: ``<root>/<name>`` per table, committed
    by tmp-dir + atomic rename (POSIX rename is the commit point)."""

    def __init__(self, root: str):
        self.root = root

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        options: dict | None = None,
    ) -> None:
        path = self._path(name)
        tmp = path + ".__tmp__"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        if options:
            w = w.options(**options)
        w.parquet(tmp)
        has_data = any(
            f.endswith(".parquet")
            for _dp, _dn, files in os.walk(tmp)
            for f in files
        )
        if not has_data:
            # a zero-row/zero-partition plan (AQE over an empty exchange,
            # or an empty partitioned write) leaves NO part files, making
            # the directory unreadable (no schema to infer); rewrite one
            # empty, schema-bearing unpartitioned file — the partition
            # column then rides as a regular column with the identical
            # read schema
            df.sparkSession.createDataFrame([], df.schema).write.mode(
                "overwrite"
            ).parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))

    def refresh(self, spark: SparkSession, name: str) -> None:
        if self.exists(name):
            spark.catalog.refreshByPath(self._path(name))


class IcebergIO(TableIO):
    """Iceberg-catalog backend: table ``<namespace>.<prefix>_<name>`` per
    index table. ``createOrReplace`` commits a new snapshot atomically —
    readers holding the previous snapshot keep a consistent view through
    a full rebuild (the concurrent-rebuild story ParquetDirIO lacks).

    Only constructed when ``iceberg_available``; all calls go through
    the public DataFrameWriterV2 / catalog APIs, so any Spark-supported
    Iceberg catalog (Hive, Hadoop, REST, Glue) works unchanged."""

    def __init__(self, catalog: str, namespace: str, prefix: str):
        self.catalog = catalog
        self.namespace = namespace
        self.prefix = prefix

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{self.prefix}_{name}"

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: list[str] | None = None,
        options: dict | None = None,
    ) -> None:
        from pyspark.sql import functions as F

        # options are parquet writer hints (row-group sizing); Iceberg
        # governs file layout through table properties
        # (write.parquet.row-group-size-bytes), left to deployment config
        w = df.writeTo(self._ident(name)).using("iceberg")
        if partition_by:
            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.table(self._ident(name))

    def exists(self, name: str) -> bool:
        from pyspark.sql import SparkSession as _S

        spark = _S.getActiveSession()
        return bool(spark and spark.catalog.tableExists(self._ident(name)))

    def refresh(self, spark: SparkSession, name: str) -> None:
        spark.sql(f"REFRESH TABLE {self._ident(name)}")


def for_index_dir(index_dir: str, spark: SparkSession | None = None) -> TableIO:
    """Backend selection: an ``iceberg:catalog.namespace.prefix`` index
    location selects IcebergIO (requires the runtime jars — explicit
    error otherwise, not a silent parquet fallback); any filesystem path
    selects ParquetDirIO."""
    if index_dir.startswith("iceberg:"):
        ident = index_dir[len("iceberg:"):]
        parts = ident.split(".")
        if len(parts) != 3:
            raise ValueError(
                f"iceberg index location must be 'iceberg:catalog.namespace.prefix': {index_dir!r}"
            )
        if spark is not None and not iceberg_available(spark):
            raise RuntimeError(
                "index location requests Iceberg but the Iceberg Spark "
                "runtime jars are not on the classpath"
            )
        return IcebergIO(*parts)
    return ParquetDirIO(index_dir)
