"""Z-order clustering evidence: footer min/max stats must prune files
in BOTH dimensions, where a linear sort prunes only its own column.
Measured on real parquet footers (pyarrow), not plan strings."""

import os
import shutil
import tempfile
import uuid

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dynamodb_pitr_restore_cdc_spark.operators.layout import (
    zorder_layout,
    zvalue_expr,
)
from dynamodb_pitr_restore_cdc_spark.sources import table

from .conftest import SF_SMOKE


def _file_stats(path, cols):
    """[(min, max) per col] for each parquet data file under path
    (recursive: the z-ordered layout writes one file per zb= range
    directory)."""
    files = []
    for root, _dirs, names in os.walk(path):
        files.extend(
            os.path.join(root, f) for f in names if f.endswith(".parquet")
        )
    out = []
    for f in sorted(files):
        md = pq.ParquetFile(f).metadata
        lo = {c: None for c in cols}
        hi = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    s = col.statistics
                    lo[name] = s.min if lo[name] is None else min(lo[name], s.min)
                    hi[name] = s.max if hi[name] is None else max(hi[name], s.max)
        out.append({c: (lo[c], hi[c]) for c in cols})
    return out


def _overlap_fraction(stats, col, box):
    hit = sum(1 for s in stats if not (s[col][1] < box[0] or s[col][0] > box[1]))
    return hit / len(stats)


def test_zvalue_is_the_morton_interleave(spark):
    import random

    random.seed(7)
    pairs = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 1), (123456, 654321)] + [
        (random.randrange(1 << 21), random.randrange(1 << 21)) for _ in range(20)
    ]
    df = spark.createDataFrame(pairs, "x long, y long").select(
        "x", "y", zvalue_expr("x", "y").alias("z")
    )
    for r in df.collect():
        want = 0
        for i in range(21):
            want |= ((r.x >> i) & 1) << (2 * i)
            want |= ((r.y >> i) & 1) << (2 * i + 1)
        assert r.z == want, (r.x, r.y, r.z, want)


def test_zorder_prunes_both_dimensions_linear_sort_only_one(spark):
    zpath, pk, sk = zorder_layout(spark, SF_SMOKE)
    li = table(spark, SF_SMOKE, "lineitem")
    pk_box = (pk // 4, pk // 2)
    sk_box = (sk // 4, sk // 2)
    cols = ["l_partkey", "l_suppkey"]

    # comparison layout: same file count, linearly sorted on partkey
    lin = os.path.join(
        tempfile.gettempdir(), f"zorder_lin_{uuid.uuid4().hex[:8]}"
    )
    (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .repartitionByRange(8, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lin)
    )
    try:
        z_stats = _file_stats(zpath, cols)
        l_stats = _file_stats(lin, cols)
        assert len(z_stats) == 8 and len(l_stats) == 8

        # the sorted dimension prunes in both layouts
        assert _overlap_fraction(l_stats, "l_partkey", pk_box) <= 0.5
        assert _overlap_fraction(z_stats, "l_partkey", pk_box) <= 0.75
        # the OFF-sort dimension: z-order still prunes, linear cannot
        assert _overlap_fraction(l_stats, "l_suppkey", sk_box) == 1.0
        assert _overlap_fraction(z_stats, "l_suppkey", sk_box) <= 0.75
    finally:
        shutil.rmtree(lin, ignore_errors=True)


def test_zorder_layout_is_session_cached(spark):
    assert zorder_layout(spark, SF_SMOKE) == zorder_layout(spark, SF_SMOKE)


def test_zorder_bucket_ids_bounded_for_non_divisor_n_files(spark):
    # floor width overflowed to a (n_files+1)-th zb range whenever
    # n_files didn't divide 2^(2*bits) — ceil width caps the id at
    # n_files-1 for every n_files (round-11 review finding)
    from dynamodb_pitr_restore_cdc_spark.operators.layout import (
        _ZORDER_CACHE,
        zorder_layout,
    )

    _ZORDER_CACHE.clear()  # bypass the session cache for the n_files probe
    try:
        zpath, _pk, _sk = zorder_layout(spark, SF_SMOKE, n_files=6)
        zbs = sorted(
            int(d.split("=")[1])
            for d in os.listdir(zpath)
            if d.startswith("zb=")
        )
        assert zbs and zbs[-1] <= 5, zbs
    finally:
        _ZORDER_CACHE.clear()  # don't leak the 6-file layout to other tests
