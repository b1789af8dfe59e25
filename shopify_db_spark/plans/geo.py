"""Shipping heatmap export (reference S9, ``utils.py:7-23``).

The point-set extraction (filter nulls, project lat/lon, find the
map center) is distributed Spark work; only the final HTML render
runs on the driver. folium is optional — absent it, a minimal
self-contained HTML fallback embeds the points (same information,
no tile layer), so the engine has no hard viz dependency.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heatmap_points(shipping: DataFrame) -> DataFrame:
    """(latitude, longitude) rows with nulls dropped (reference
    ``utils.py:14``)."""
    return (
        shipping.select(
            F.col("latitude").cast("double"), F.col("longitude").cast("double")
        )
        .na.drop(subset=["latitude", "longitude"])
    )


def render_heatmap(shipping: DataFrame, out_path: str) -> str:
    """Render the order-location heatmap to HTML. The aggregation
    (center = mean lat/lon, reference ``utils.py:17``) happens in
    Spark; points are collected only for rendering."""
    pts = heatmap_points(shipping)
    center_row = pts.agg(
        F.avg("latitude").alias("lat"), F.avg("longitude").alias("lon")
    ).collect()[0]
    pdf = pts.toPandas()
    coords = pdf[["latitude", "longitude"]].values.tolist()
    try:
        import folium
        from folium.plugins import HeatMap

        fmap = folium.Map(
            location=[center_row["lat"] or 0.0, center_row["lon"] or 0.0],
            zoom_start=4,
        )
        HeatMap(coords).add_to(fmap)
        fmap.save(out_path)
    except ImportError:
        html = (
            "<html><head><title>Order heatmap</title></head><body>"
            f"<h1>Order locations ({len(coords)} points)</h1>"
            f"<p>center: {center_row['lat']}, {center_row['lon']}</p>"
            f"<script>var points = {json.dumps(coords)};</script>"
            "<p>(folium not installed — raw point export)</p>"
            "</body></html>"
        )
        with open(out_path, "w") as fh:
            fh.write(html)
    return out_path
