"""Krona export writer.

The reference serializes taxonomy-rollup abundances into Krona's input
format for its interactive hierarchical chart (public path
``bpaotu/otu/krona.py``: builds per-rank lineage rows, then shells out
to ktImportText). The Spark-side analogue is the text serialization —
one tab-delimited line per full lineage path::

    <magnitude>\\t<level1>\\t<level2>\\t...\\t<levelN>

which is exactly what ``ktImportText`` consumes (Krona aggregates the
internal nodes itself, so only leaf paths are emitted). Rendering the
HTML requires the Krona tool binary, which does not ship here; the
serialization is the engine's job and is fully tested.

Scale: the line build is a codegen'd concat projection over the leaf
rows of the rollup — no shuffle beyond the rollup itself; the write is
a parallel text sink unless the caller asks for a single file.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def krona_text_lines(
    rollup: DataFrame,
    magnitude_col: str,
    path_cols: tuple[str, ...],
) -> DataFrame:
    """Leaf rows of a ROLLUP result → one-column DataFrame of Krona
    text lines.

    ``rollup`` is the output of a hierarchical rollup (e.g.
    ``krona_rollup``) whose null-padded prefix rows are the internal
    nodes; leaves are the rows where every path column is non-null.
    Magnitudes are rendered without a trailing ``.0`` when integral so
    the file matches what a Python writer would emit.
    """
    leaf = rollup
    for c in path_cols:
        leaf = leaf.filter(F.col(c).isNotNull())
    mag = F.col(magnitude_col)
    # printf %f never renders scientific notation (a raw double→string
    # cast would emit 1.23E8 for large sums, which ktImportText does
    # not parse as a magnitude); trim trailing zeros after the point.
    fixed = F.regexp_replace(
        F.regexp_replace(F.format_string("%.6f", mag), "0+$", ""), "\\.$", ""
    )
    mag_str = F.when(
        mag == F.floor(mag), F.floor(mag).cast("bigint").cast("string")
    ).otherwise(fixed)
    return leaf.select(
        F.concat_ws("\t", mag_str, *[F.col(c) for c in path_cols]).alias("value")
    )


def write_krona_text(
    rollup: DataFrame,
    path: str,
    magnitude_col: str,
    path_cols: tuple[str, ...],
    single_file: bool = False,
) -> None:
    """Serialize rollup leaves to a Krona ktImportText input file."""
    lines = krona_text_lines(rollup, magnitude_col, path_cols)
    out = lines.coalesce(1) if single_file else lines
    out.write.mode("overwrite").text(path)
