"""Z-order layout (sources/layout.py): per-file min-max boxes must be
narrow in every Z column, which is what makes stats-based file
pruning fire for filters on any of them."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq

from node_etl_spark.sources.layout import zorder_write
from node_etl_spark.tables import table

COLS = ["l_partkey", "l_suppkey"]
N_FILES = 8


def _file_ranges(path: str, cols: list[str]) -> list[dict[str, tuple]]:
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo: dict[str, float] = {}
        hi: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    st = col.statistics
                    lo[name] = min(lo.get(name, st.min), st.min)
                    hi[name] = max(hi.get(name, st.max), st.max)
        out.append({c: (lo[c], hi[c]) for c in cols})
    return out


def _mean_box_area(ranges, spans) -> float:
    areas = []
    for r in ranges:
        a = 1.0
        for c, (lo, hi) in r.items():
            a *= (hi - lo) / spans[c]
        areas.append(a)
    return sum(areas) / len(areas)


def test_zorder_narrows_file_boxes(spark, sf_dir, tmp_path):
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", *COLS)
    naive = str(tmp_path / "naive")
    li.repartition(N_FILES).write.mode("overwrite").parquet(naive)
    zpath = str(tmp_path / "zorder")
    zorder_write(li, zpath, COLS, n_files=N_FILES)

    stats = {
        c: (r[f"min({c})"], r[f"max({c})"])
        for c in COLS
        for r in [li.selectExpr(*[f"min({c})", f"max({c})"]).first()]
    }
    spans = {c: hi - lo for c, (lo, hi) in stats.items()}

    naive_area = _mean_box_area(_file_ranges(naive, COLS), spans)
    z_area = _mean_box_area(_file_ranges(zpath, COLS), spans)
    # round-robin files span nearly the full box (area ~1); z-ordered
    # files must be dramatically tighter in the 2-D volume
    assert z_area < naive_area * 0.5, (z_area, naive_area)
    # and the rewrite is lossless
    a = spark.read.parquet(zpath)
    assert a.count() == li.count()
    assert a.exceptAll(li).isEmpty()
