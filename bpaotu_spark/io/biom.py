"""BIOM v1 (JSON) export writer.

The reference assembles an actual BIOM-format document for download
(public path ``bpaotu/otu/biom.py``: ids + shape + sparse data built
from the filtered abundance selection). Spark-side split of labor:

- the EXPENSIVE part — filtering, cell aggregation, dense row/col
  index assignment — is the distributed ``export_biom_triplets``
  operator (operators/bpaotu.py), which stays shuffle-parallel at any
  corpus size;
- this writer serializes those triplets into the BIOM v1 JSON
  envelope. A BIOM v1 document is BY DEFINITION a single JSON object
  (the v2 HDF5 variant needs h5py, absent here), and the reference
  emits it for a user's *filtered selection* download — a
  dimension-bounded result, not the full fact table — so a single
  writer is the format's own constraint, not a scale bug. The data
  array still streams through ``toLocalIterator`` so the driver never
  holds more than one partition of cells in memory.

Format per the published BIOM 1.0 spec (biom-format.org): ``rows`` /
``columns`` id+metadata records, ``shape`` [n_rows, n_cols],
``matrix_type`` "sparse", ``data`` [[row, col, value], ...].
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

BIOM_FORMAT = "Biological Observation Matrix 1.0.0"
BIOM_FORMAT_URL = "http://biom-format.org/documentation/format_versions/biom-1.0.html"


def write_biom_v1(
    triplets: DataFrame,
    path: str,
    table_id: str = "bpaotu_spark export",
    table_type: str = "OTU table",
    generated_by: str = "bpaotu_spark",
    date: str = "1970-01-01T00:00:00",
) -> dict:
    """Serialize an ``export_biom_triplets``-shaped DataFrame
    (``row_idx, col_idx, sample_id, otu_id, v``) to a BIOM v1 JSON
    file at ``path``.

    ``date`` defaults to a fixed epoch string so exports are
    byte-deterministic (callers wanting a real timestamp pass one).
    Returns the header (everything except ``data``) for convenience.
    """
    rows_df = (
        triplets.select("row_idx", "sample_id").distinct().orderBy("row_idx")
    )
    cols_df = (
        triplets.select("col_idx", "otu_id").distinct().orderBy("col_idx")
    )
    # shape needs counts up front (JSON key order); counts are cheap
    # map-combined aggregates, never a driver materialization
    n_rows = rows_df.count()
    n_cols = cols_df.count()
    header = {
        "id": table_id,
        "format": BIOM_FORMAT,
        "format_url": BIOM_FORMAT_URL,
        "type": table_type,
        "generated_by": generated_by,
        "date": date,
        "matrix_type": "sparse",
        "matrix_element_type": "float",
        "shape": [n_rows, n_cols],
    }

    def _stream_array(f, df, render) -> None:
        # one partition of rows in driver memory at a time — the same
        # toLocalIterator discipline as the data array, so no
        # collect-shaped call remains anywhere in the writer
        first = True
        for r in df.toLocalIterator():
            if not first:
                f.write(", ")
            f.write(render(r))
            first = False

    with open(path, "w") as f:
        f.write(json.dumps(header)[:-1])
        f.write(', "rows": [')
        _stream_array(
            f, rows_df,
            lambda r: json.dumps({"id": str(r.sample_id), "metadata": None}),
        )
        f.write('], "columns": [')
        _stream_array(
            f, cols_df,
            lambda c: json.dumps({"id": str(c.otu_id), "metadata": None}),
        )
        f.write('], "data": [')
        _stream_array(
            f,
            triplets.select("row_idx", "col_idx", "v").orderBy(
                "row_idx", "col_idx"
            ),
            lambda cell: f"[{cell.row_idx}, {cell.col_idx}, {json.dumps(cell.v)}]",
        )
        f.write("]}")
    return header
