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


def write_krona_html(
    rollup: DataFrame,
    magnitude_col: str,
    path_cols: tuple[str, ...],
    path: str,
    title: str = "Krona export",
) -> dict:
    """Self-contained interactive HTML rendering of a hierarchical
    rollup — the download the reference produces by shelling out to the
    Krona ``ktImportText`` binary (absent here), replaced by a
    dependency-free static page: the lineage tree embeds as JSON and
    renders with nested ``<details>`` elements plus share bars (plain
    HTML/CSS, ~no JS), so the file opens anywhere.

    Input contract matches :func:`krona_text_lines` (leaf rows of a
    rollup). The tree is a user-download of an already-aggregated,
    dimension-bounded rollup — leaves stream to the driver via
    ``toLocalIterator`` exactly like the BIOM writer. Returns the root
    node for convenience.
    """
    import html as _html
    import json

    leaf = rollup
    for c in path_cols:
        leaf = leaf.filter(F.col(c).isNotNull())
    leaves = leaf.select(
        F.col(magnitude_col).cast("double").alias("m"),
        *[F.col(c).cast("string") for c in path_cols],
    ).orderBy(*path_cols)

    root = {"name": title, "mag": 0.0, "children": {}}
    for row in leaves.toLocalIterator():
        node = root
        root["mag"] += row.m
        for c in path_cols:
            node = node["children"].setdefault(
                row[c], {"name": row[c], "mag": 0.0, "children": {}}
            )
            node["mag"] += row.m

    def render(node, total) -> str:
        share = 0.0 if total <= 0 else node["mag"] / total
        bar = (
            f'<span class="bar" style="width:{share * 100:.2f}%"></span>'
        )
        label = (
            f'{_html.escape(str(node["name"]))}'
            f' <span class="mag">{node["mag"]:.4g}'
            f" ({share * 100:.1f}%)</span>{bar}"
        )
        kids = sorted(
            node["children"].values(), key=lambda k: (-k["mag"], k["name"])
        )
        if not kids:
            return f'<div class="leaf">{label}</div>'
        inner = "".join(render(k, total) for k in kids)
        return (
            f"<details open><summary>{label}</summary>"
            f'<div class="kids">{inner}</div></details>'
        )

    body = render(root, root["mag"])
    doc = f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{_html.escape(title)}</title>
<style>
body {{ font: 13px/1.5 sans-serif; margin: 1.5em; }}
.kids {{ margin-left: 1.4em; }}
summary, .leaf {{ position: relative; padding: 1px 4px; }}
.mag {{ color: #666; font-size: 11px; }}
.bar {{ position: absolute; left: 0; bottom: 0; height: 2px;
        background: #4a90d9; display: inline-block; }}
</style></head><body>
<h1>{_html.escape(title)}</h1>
{body}
<script type="application/json" id="krona-data">
{json.dumps(root, sort_keys=True)}
</script>
</body></html>
"""
    with open(path, "w") as f:
        f.write(doc)
    return root
