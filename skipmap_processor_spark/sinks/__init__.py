"""Final-artifact sinks: GeoPackage (S13), Mapbox vector tiles (S14),
3D Tiles point clouds (S15) — the reference's geo export surface
re-expressed without geospatial libraries (stdlib sqlite3 + hand-rolled
WKB / protobuf wire format / quantized binary buffers)."""
