"""Shared physical-file plumbing for the table-format sinks.

Both from-scratch lakehouse formats (the Delta-shaped log and the
Iceberg-shaped metadata tree) write data the same way — immutable
bucket-partitioned parquet under an attempt-scoped directory, with
per-file column bounds peeked from parquet footers — and differ only
in the METADATA shape those facts are recorded in (add actions vs
manifest entries). This module holds the common physics; each sink
maps the neutral per-file records into its own protocol."""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

STAT_COLS = ("key", "last_seq", "op")


@dataclass(frozen=True)
class DataFileInfo:
    """Format-neutral facts about one written data file."""

    rel_path: str
    bucket: int
    size_bytes: int
    num_rows: int
    mins: dict
    maxs: dict


def write_bucketed_files(
    bucketed: DataFrame, table_path: str, rel_dir: str
) -> list[DataFileInfo]:
    """Write one commit ATTEMPT's data files (immutable, attempt-scoped
    dir — the caller embeds a uuid so a crashed or race-losing attempt
    can never collide with a retry) and collect their footer-derived
    stats: a driver-side parquet-metadata peek, not a data scan.
    repartition("bucket") puts each bucket in one task, so every
    (bucket, commit) pair yields exactly one file."""
    import pyarrow.parquet as pq

    out = os.path.join(table_path, rel_dir)
    (
        bucketed.repartition("bucket")
        .write.mode("error")
        .partitionBy("bucket")
        .parquet(out)
    )
    infos: list[DataFileInfo] = []
    for bdir in sorted(os.listdir(out)):
        if not bdir.startswith("bucket="):
            continue
        b = int(bdir.split("=", 1)[1])
        for fn in sorted(os.listdir(os.path.join(out, bdir))):
            if not fn.endswith(".parquet"):
                continue
            full = os.path.join(out, bdir, fn)
            md = pq.ParquetFile(full).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            mins: dict = {}
            maxs: dict = {}
            for rg in range(md.num_row_groups):
                for col in STAT_COLS:
                    if col not in names:
                        continue
                    st = md.row_group(rg).column(names[col]).statistics
                    if st is None or not st.has_min_max:
                        continue
                    if col in mins:
                        mins[col] = min(mins[col], st.min)
                        maxs[col] = max(maxs[col], st.max)
                    else:
                        mins[col], maxs[col] = st.min, st.max
            infos.append(
                DataFileInfo(
                    rel_path=os.path.join(rel_dir, bdir, fn),
                    bucket=b,
                    size_bytes=os.path.getsize(full),
                    num_rows=md.num_rows,
                    mins=mins,
                    maxs=maxs,
                )
            )
    return infos


def empty_frame(spark, schema_json: str) -> DataFrame:
    """Zero-row frame in the table schema: typed null casts behind
    WHERE FALSE fold to a LocalRelation — zero Spark jobs (the
    createDataFrame([], schema) trap, CLAUDE.md)."""
    schema = StructType.fromJson(json.loads(schema_json))
    cols = [F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields]
    return spark.range(1).select(*cols).where(F.lit(False))
