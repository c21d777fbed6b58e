"""GeoJSON export for the map layer.

The reference serves binned sample markers to its Leaflet map as JSON
(public path ``bpaotu/otu/views.py`` map endpoints). The distributed
work — filtering + 2-D grid binning — is the ``map_binning_2d``
operator; this writer serializes its bounded cell grid into a standard
GeoJSON ``FeatureCollection`` of cell-center Points (RFC 7946), the
format every web map ingests directly.

The grid is dimension-bounded (lat/lon cells at fixed resolution), so
the features stream through ``toLocalIterator`` like every other
driver-side writer here; nothing unbounded is collected.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def write_geojson_points(
    cells: DataFrame,
    path: str,
    lon_col: str,
    lat_col: str,
    property_cols: tuple[str, ...],
) -> int:
    """Serialize a bounded cell/marker DataFrame into a GeoJSON
    FeatureCollection file; returns the feature count."""
    n = 0
    with open(path, "w") as f:
        f.write('{"type": "FeatureCollection", "features": [')
        first = True
        it = cells.select(
            lon_col, lat_col, *property_cols
        ).orderBy(lat_col, lon_col)
        for row in it.toLocalIterator():
            feature = {
                "type": "Feature",
                "geometry": {
                    "type": "Point",
                    "coordinates": [row[lon_col], row[lat_col]],
                },
                "properties": {c: row[c] for c in property_cols},
            }
            if not first:
                f.write(", ")
            f.write(json.dumps(feature, sort_keys=True))
            first = False
            n += 1
        f.write("]}")
    return n
